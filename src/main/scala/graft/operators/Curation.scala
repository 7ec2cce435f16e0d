package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
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
  * the whole pipeline is hash-checked against DuckDB end-to-end. Both
  * near-dup stages are registered: exact Jaccard
  * (`q_corpus_curation`) and the subquadratic MinHash+LSH swap-in
  * (`q_corpus_curation_minhash`) — identical output contract, same
  * oracle (banding recall ≈ 1 at this threshold).
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

  /** Memoized gated corpus + its fingerprint shingle index — the shared
    * first stages of all four curation rows (exact, minhash, clusters,
    * dsir), computed once per (context, dataset) under the
    * [[graft.plans.Memo]] discipline (r15; deterministic in doc_id +
    * xxhash64, so memoized ≡ recomputed). The PAIR FINDERS deliberately
    * stay per-row — the exact/minhash twins exist to price their own
    * pair algorithms. Production analogue: a curation pipeline gates
    * the corpus once per ingest and hands the gated frame + its
    * fingerprint index to every downstream selection/dedup stage —
    * single-consumer stages (e.g. the DSIR-selected subset) stay
    * per-row so the bench keeps pricing them.
    */
  private def gatedCorpus(s: SparkSession, d: String): DataFrame =
    graft.plans.Memo.frame(s, d, "curation_gated")(
      qualityGate(documents(s, d)))

  private def gatedShingles(s: SparkSession, d: String): DataFrame =
    graft.plans.Memo.frame(s, d, "curation_sh3") {
      val gated = gatedCorpus(s, d)
      gated.select(col("doc_id"),
        explode(graft.functions.ShingleFps.fps(
          gated.sparkSession, col("toks"), 3)).as("g"))
    }

  /** The pipeline, parameterized on the near-dup pair finder (a function
    * of the hashed shingle index → (id_a, id_b, …) pairs).
    */
  private def curate(
      s: SparkSession, d: String,
      pairFinder: DataFrame => DataFrame): DataFrame = {
    // both shared stages arrive memoized + checkpointed — no per-row
    // persist/unpersist ceremony, and the row's one action reads blocks
    val gated = gatedCorpus(s, d)
    val sh = gatedShingles(s, d)
    val dupIds = pairFinder(sh)
      .select(col("id_b").as("doc_id")).distinct()
    gated
      .join(dupIds, Seq("doc_id"), "left_anti")
      .groupBy("lang", "source")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(size(col("toks")).cast("long")).as("n_tokens"))
      .orderBy("lang", "source")
  }

  val qCorpusCuration: Q = (s, d) =>
    curate(s, d, sh => Dedup.jaccardPairs(sh, 0.8))

  /** The scale path the class doc promises: MinHash banding generates
    * candidates, exact Jaccard verifies — subquadratic in corpus size.
    * At threshold 0.8 with 24 bands of r=2 the per-pair miss probability
    * is (1 − 0.8²)²⁴ ≈ 2e-11, so the output deterministically equals the
    * exact pipeline on these fixtures (PipelineOpsSpec asserts it) and
    * the query carries the same DuckDB oracle.
    */
  val qCorpusCurationMinhash: Q = (s, d) =>
    curate(s, d, sh => Dedup.verifyJaccard(
      Dedup.lshCandidates(Dedup.minhashSignatures(sh, 48), bands = 24, r = 2),
      sh, 0.8))

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

  /** Cluster-canonical curation — the composite upgraded with the
    * round-3 clustering stage. The pairwise pipeline drops every doc
    * that ever appears as a pair's LARGER id; on a duplicate chain
    * A~B~C (B bridges two pairs, A~C never scored) that keeps only A —
    * correct here — but on a chain where the middle doc is the best
    * representative, pair-greedy can't choose it. The cluster form
    * computes components and keeps ONE canonical doc per cluster by an
    * explicit rule (longest text, ties to smallest id), which is what a
    * production pipeline actually wants from its dedup stage.
    */
  val qCorpusCurationClusters: Q = (s, d) => {
    val gated = gatedCorpus(s, d)
    val pairs = Dedup.jaccardPairs(gatedShingles(s, d), 0.8)
    val clusters = Clustering.connectedComponents(pairs, "id_a", "id_b")
      .withColumnRenamed("node", "doc_id")
    val pick = org.apache.spark.sql.expressions.Window
      .partitionBy("cluster_id")
      .orderBy(length(col("text")).desc, col("doc_id").asc)
    val drop = gated.select("doc_id", "text").join(clusters, "doc_id")
      .withColumn("rn", row_number().over(pick))
      .filter(col("rn") > 1)
      .select("doc_id")
    gated
      .join(drop, Seq("doc_id"), "left_anti")
      .groupBy("lang", "source")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(size(col("toks")).cast("long")).as("n_tokens"))
      .orderBy("lang", "source")
  }

  val qCorpusCurationClustersSql: String =
    """WITH RECURSIVE gated AS (
      |  SELECT doc_id, lang, source, text,
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
      |pairs AS (SELECT id_a, id_b FROM inter
      |          JOIN sizes na ON id_a = na.doc_id
      |          JOIN sizes nb ON id_b = nb.doc_id
      |          WHERE CAST(i AS DOUBLE) / (na.n + nb.n - i) >= 0.8),
      |edges AS (SELECT id_a AS u, id_b AS v FROM pairs
      |          UNION SELECT id_b, id_a FROM pairs),
      |reach(node, r) AS (
      |  SELECT u, v FROM edges
      |  UNION
      |  SELECT reach.node, e.v FROM reach JOIN edges e ON e.u = reach.r),
      |labels AS (SELECT node AS doc_id, least(node, min(r)) AS cluster_id
      |           FROM reach GROUP BY node),
      |dropped AS (
      |  SELECT doc_id FROM (
      |    SELECT g.doc_id,
      |      row_number() OVER (PARTITION BY lb.cluster_id
      |        ORDER BY length(g.text) DESC, g.doc_id ASC) AS rn
      |    FROM gated g JOIN labels lb USING (doc_id))
      |  WHERE rn > 1)
      |SELECT lang, source, count(*) AS n_docs,
      |  CAST(sum(len(l)) AS BIGINT) AS n_tokens
      |FROM gated
      |WHERE doc_id NOT IN (SELECT doc_id FROM dropped)
      |GROUP BY lang, source
      |ORDER BY lang, source""".stripMargin

  /** The composite extended with a DATA-SELECTION stage: quality gate →
    * DSIR importance selection (keep docs whose tokens are more likely
    * under the target-slice model than the rest-of-corpus model —
    * [[TextAnalysis.dsirWeights]]) → near-dup removal among the
    * survivors → per-(lang, source) stats. The order matters and is the
    * production order: selection runs BEFORE pair-finding so the
    * quadratic-prone stage sees only the selected subset, and the DSIR
    * models are fit on the gated corpus (garbage the gate drops must
    * not vote in either model).
    */
  val qCurationDsir: Q = (s, d) => {
    val gated = gatedCorpus(s, d)
    val selected = TextAnalysis.dsirWeightsTokenized(
      gated.select("doc_id", "lang", "toks"),
      col("lang") === TextAnalysis.DsirTargetLang)
      .filter(col("selected")).select("doc_id")
    // dsirWeights returns an eager checkpoint, so `selected` is a plain
    // small frame; the join keeps gated's columns for the stats below.
    // `kept` (the DSIR-selected subset) is ROW-SPECIFIC — it persists
    // for its two consumers (shingle build + final agg) and the result
    // checkpoints before the unpersists, exactly as before; only the
    // shared gated stage moved to the memo.
    val kept = gated.join(selected, "doc_id").persist()
    val sh = kept.select(col("doc_id"),
      explode(graft.functions.ShingleFps.fps(
        kept.sparkSession, col("toks"), 3)).as("g"))
      .persist()
    val dupIds = Dedup.jaccardPairs(sh, 0.8)
      .select(col("id_b").as("doc_id")).distinct()
    val out = kept
      .join(dupIds, Seq("doc_id"), "left_anti")
      .groupBy("lang", "source")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(size(col("toks")).cast("long")).as("n_tokens"))
      .orderBy("lang", "source")
      .localCheckpoint(true)
    sh.unpersist(); kept.unpersist()
    out
  }

  val qCurationDsirSql: String =
    s"""WITH gated AS (
      |  SELECT doc_id, lang, source,
      |    list_filter(string_split_regex(trim(text), '\\s+'),
      |                t -> t <> '') AS l
      |  FROM documents
      |  WHERE len(text) BETWEEN 100 AND 500
      |    AND len(list_filter(string_split_regex(trim(text), '\\s+'),
      |            t -> t <> '')) >= 20),
      |tf AS (SELECT doc_id, lang, unnest(l) AS term FROM gated),
      |tfc AS (SELECT doc_id, lang, term, count(*) AS tf
      |        FROM tf GROUP BY 1, 2, 3),
      |ct AS (SELECT term, CAST(sum(tf) AS BIGINT) AS ct FROM tfc
      |       WHERE lang = '${TextAnalysis.DsirTargetLang}' GROUP BY 1),
      |cs AS (SELECT term, CAST(sum(tf) AS BIGINT) AS cs FROM tfc
      |       WHERE lang <> '${TextAnalysis.DsirTargetLang}' GROUP BY 1),
      |tot AS (SELECT CAST(count(DISTINCT term) AS BIGINT) AS v,
      |          CAST(sum(CASE WHEN lang = '${TextAnalysis.DsirTargetLang}'
      |                        THEN tf ELSE 0 END) AS BIGINT) AS nt,
      |          CAST(sum(CASE WHEN lang <> '${TextAnalysis.DsirTargetLang}'
      |                        THEN tf ELSE 0 END) AS BIGINT) AS ns
      |        FROM tfc),
      |sel AS (
      |  SELECT doc_id
      |  FROM tfc
      |    LEFT JOIN ct USING (term)
      |    LEFT JOIN cs USING (term)
      |    CROSS JOIN tot
      |  GROUP BY doc_id
      |  HAVING round(sum(tf * ln(
      |    CAST((COALESCE(ct, 0) + 1) * (ns + v) AS DOUBLE)
      |      / ((COALESCE(cs, 0) + 1) * (nt + v)))) / sum(tf), 4) > 0),
      |kept AS (SELECT g.* FROM gated g JOIN sel USING (doc_id)),
      |mx AS (SELECT max(len(l)) + 1 AS m FROM kept),
      |sh AS (SELECT DISTINCT doc_id,
      |         l[CAST(i AS INT)] || ' ' || l[CAST(i AS INT)+1] || ' ' ||
      |           l[CAST(i AS INT)+2] AS g
      |       FROM kept CROSS JOIN
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
      |FROM kept
      |WHERE doc_id NOT IN (SELECT doc_id FROM dup)
      |GROUP BY lang, source
      |ORDER BY lang, source""".stripMargin

  // ---------------------------------------------------------------------
  // Per-source data card — the corpus-documentation composite (Datasheets
  // for Datasets, Gebru et al. CACM'21; every release ships one): for
  // each source, volume (docs, tokens), length distribution (mean +
  // exact interpolated median chars), language spread (distinct langs +
  // majority lang with deterministic tie-break), and the corpus-wide
  // exact-duplicate exposure (fraction of the source's docs whose full
  // text appears ≥2× ANYWHERE in the corpus — cross-source, so a source
  // that plagiarizes another is charged for it).
  //
  // Scale shape: one groupBy(source) carries every per-source stat
  // (partial aggregation map-side; state is O(sources)); the dup-rate
  // needs one extra hash aggregation on the text key joined back to the
  // (doc, source) pairs — the q_dedup_exact exchange family, 64-bit
  // fingerprintable at 100 TB; the majority lang is a (source, lang)
  // aggregate (≤ sources × langs rows) windowed per source. Nothing is
  // corpus-quadratic; every stage's state is dimension-bounded.
  // ---------------------------------------------------------------------
  def corpusDataCard(docs: DataFrame): DataFrame = {
    val base = docs.select(col("doc_id"), col("text"), col("lang"),
      col("source"), col("n_chars"),
      size(tokens(col("text"))).cast("long").as("n_toks"))
    val dupTexts = base.groupBy("text")
      .agg(count(lit(1)).as("copies"))
      .filter(col("copies") >= 2)
      .select("text")
    val withDup = base.join(dupTexts.withColumn("is_dup", lit(1L)),
      Seq("text"), "left")
      .withColumn("is_dup", coalesce(col("is_dup"), lit(0L)))
    val perSource = withDup.groupBy("source").agg(
      count(lit(1)).as("n_docs"),
      sum("n_toks").as("n_tokens"),
      round(avg("n_chars"), 2).as("avg_chars"),
      round(percentile(col("n_chars"), lit(0.5)), 2).as("p50_chars"),
      countDistinct("lang").as("n_langs"),
      round(sum("is_dup").cast("double") / count(lit(1)), 4)
        .as("dup_rate"))
    val wl = Window.partitionBy("source")
      .orderBy(col("cnt").desc, col("lang").asc)
    val topLang = base.groupBy("source", "lang")
      .agg(count(lit(1)).as("cnt"))
      .withColumn("rnk", row_number().over(wl))
      .filter(col("rnk") === 1)
      .select(col("source"), col("lang").as("top_lang"))
    perSource.join(topLang, Seq("source")).orderBy("source")
  }

  val qCorpusDataCard: Q = (s, d) => corpusDataCard(documents(s, d))

  val qCorpusDataCardSql: String =
    """WITH base AS (SELECT doc_id, text, lang, source, n_chars,
      |    CAST(len(list_filter(string_split_regex(trim(text), '\s+'),
      |                         x -> x <> '')) AS BIGINT) AS n_toks
      |  FROM documents),
      |dup AS (SELECT text FROM base GROUP BY 1 HAVING count(*) >= 2),
      |wd AS (SELECT b.*,
      |    CASE WHEN d.text IS NULL THEN 0 ELSE 1 END AS is_dup
      |  FROM base b LEFT JOIN dup d USING (text)),
      |per AS (SELECT source,
      |    CAST(count(*) AS BIGINT) AS n_docs,
      |    CAST(sum(n_toks) AS BIGINT) AS n_tokens,
      |    round(avg(n_chars), 2) AS avg_chars,
      |    round(quantile_cont(n_chars, 0.5), 2) AS p50_chars,
      |    CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
      |    round(CAST(sum(is_dup) AS DOUBLE) / count(*), 4) AS dup_rate
      |  FROM wd GROUP BY 1),
      |tl AS (SELECT source, lang AS top_lang FROM (
      |    SELECT source, lang,
      |      row_number() OVER (PARTITION BY source
      |        ORDER BY count(*) DESC, lang ASC) AS rnk
      |    FROM base GROUP BY source, lang)
      |  WHERE rnk = 1)
      |SELECT p.source, n_docs, n_tokens, avg_chars, p50_chars,
      |  n_langs, dup_rate, top_lang
      |FROM per p JOIN tl USING (source)
      |ORDER BY p.source""".stripMargin

  val queries: Map[String, Q] = Map(
    "q_corpus_datacard" -> qCorpusDataCard,
    "q_corpus_curation" -> qCorpusCuration,
    "q_corpus_curation_clusters" -> qCorpusCurationClusters,
    "q_corpus_curation_minhash" -> qCorpusCurationMinhash,
    "q_curation_dsir" -> qCurationDsir)

  val oracles: Map[String, String] = Map(
    "q_corpus_datacard" -> qCorpusDataCardSql,
    "q_corpus_curation" -> qCorpusCurationSql,
    "q_corpus_curation_clusters" -> qCorpusCurationClustersSql,
    // banding recall ≈ 1 − 2e-11 at j ≥ 0.8 ⇒ identical output (see
    // qCorpusCurationMinhash doc) — same oracle as the exact pipeline
    "q_corpus_curation_minhash" -> qCorpusCurationSql,
    "q_curation_dsir" -> qCurationDsirSql)
}
