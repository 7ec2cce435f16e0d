package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables._
import graft.functions.TextFunctions._
import Relational.Q

/** Composite corpus-curation pipeline — the flagship composition of the
  * training-data operators (quality scoring → near-dup removal →
  * partition stats), the shape of a real pretraining data job:
  *
  *   1. quality gate: token/length band filters;
  *   2. near-dup removal: exact word-trigram Jaccard >= 0.8 pairs
  *      (the fixture has natural near-dups), keep the smaller doc_id of
  *      each pair (drop every doc that appears as the larger id);
  *   3. per-(lang, source) survivor stats.
  *
  * Everything is one lazy plan of already-oracled building blocks, so
  * the whole pipeline is hash-checked against DuckDB end-to-end. At
  * scale the Jaccard stage is the one to swap for MinHash+LSH
  * (Dedup.qDedupMinhash) — identical output contract, subquadratic.
  */
object Curation {

  /** Quality gate shared by query and oracle: 100..500 chars and at
    * least 20 tokens. Non-vacuous on the fixture (drops short/long
    * tails) without being corpus-specific.
    */
  private def qualityGate(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"), col("lang"), col("source"), col("text"),
        tokens(col("text")).as("toks"))
      .filter(length(col("text")).between(100, 500) &&
        size(col("toks")) >= 20)

  val qCorpusCuration: Q = (s, d) => {
    val gated = qualityGate(documents(s, d)).persist()
    // the shingle index feeds jaccardPairs' three branches — persist it
    // too (Dedup.jaccardPairs doc), not just the gated corpus
    val sh = gated.select(col("doc_id"), col("toks"))
      .select(col("doc_id"),
        explode(array_distinct(shinglesFromTokens(col("toks"), 3))).as("g"))
      .persist()
    val dupIds = Dedup.jaccardPairs(sh, 0.8)
      .select(col("id_b").as("doc_id")).distinct()
    val out = gated
      .join(dupIds, Seq("doc_id"), "left_anti")
      .groupBy("lang", "source")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(size(col("toks")).cast("long")).as("n_tokens"))
      .orderBy("lang", "source")
      .localCheckpoint(true)
    sh.unpersist()
    gated.unpersist()
    out
  }

  val qCorpusCurationSql: String =
    """WITH gated AS (
      |  SELECT doc_id, lang, source,
      |    list_filter(string_split_regex(trim(text), '\s+'),
      |                t -> t <> '') AS l
      |  FROM documents
      |  WHERE len(text) BETWEEN 100 AND 500
      |    AND len(list_filter(string_split_regex(trim(text), '\s+'),
      |            t -> t <> '')) >= 20),
      |mx AS (SELECT max(len(l)) + 1 AS m FROM gated),
      |sh AS (SELECT DISTINCT doc_id,
      |         l[CAST(i AS INT)] || ' ' || l[CAST(i AS INT)+1] || ' ' ||
      |           l[CAST(i AS INT)+2] AS g
      |       FROM gated CROSS JOIN
      |         (SELECT unnest(range(1, (SELECT m FROM mx))) AS i) r
      |       WHERE CAST(i AS INT) + 2 <= len(l)),
      |sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
      |inter AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS i
      |          FROM sh a JOIN sh b ON a.g = b.g AND a.doc_id < b.doc_id
      |          GROUP BY 1, 2),
      |dup AS (SELECT DISTINCT id_b AS doc_id
      |        FROM inter
      |        JOIN sizes na ON id_a = na.doc_id
      |        JOIN sizes nb ON id_b = nb.doc_id
      |        WHERE CAST(i AS DOUBLE) / (na.n + nb.n - i) >= 0.8)
      |SELECT lang, source, count(*) AS n_docs,
      |  CAST(sum(len(l)) AS BIGINT) AS n_tokens
      |FROM gated
      |WHERE doc_id NOT IN (SELECT doc_id FROM dup)
      |GROUP BY lang, source
      |ORDER BY lang, source""".stripMargin

  val queries: Map[String, Q] = Map(
    "q_corpus_curation" -> qCorpusCuration)

  val oracles: Map[String, String] = Map(
    "q_corpus_curation" -> qCorpusCurationSql)
}
