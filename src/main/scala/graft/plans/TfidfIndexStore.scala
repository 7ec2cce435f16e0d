package graft.plans

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted tf-idf retrieval index — the vector-space sibling of
  * [[Bm25IndexStore]], closing the artifact family for the hybrid
  * (tf-idf + BM25 → RRF) retrieval stack: tokenize + weight the corpus
  * ONCE, save the top-k postings and per-doc norms, then serve query
  * batches from the artifact without re-touching the corpus.
  *
  * The artifact is TWO tables:
  *   - `<table>`        — postings (tkey, doc_id, w): each document's
  *                        top-k tf-idf terms (4dp-rounded weights, the
  *                        house parity regime), bucketed + sorted by
  *                        the 64-bit term fingerprint;
  *   - `<table>_norms`  — (doc_id, nrm): the vector norms the cosine
  *                        denominator needs.
  *
  * Parity: identical per-term weights to
  * [[graft.operators.TextAnalysis.tfidfRetrieval]] (both 4dp-rounded at
  * the score stage); the dot re-accumulates via a term-keyed sum
  * instead of the in-session kernel's sorted-key merge, a summation-
  * order difference of ~1e-13 — absorbed by the 4dp cosine rounding
  * that both forms rank on (the same argument the BM25 store's oracle
  * reuse rests on). So a search over the saved index reproduces the
  * in-session query row-for-row and carries the same DuckDB oracle.
  *
  * Refresh discipline: rebuild (versioned dirs, repoint-not-overwrite —
  * the [[AggStore]] rule). A frozen-stats `extend` in the
  * [[Bm25IndexStore]] style is possible (weight a batch under saved
  * df/n_docs), but tf-idf's idf couples every weight to n_docs, so the
  * family's documented knob here is the periodic rebuild.
  */
object TfidfIndexStore {

  def normsTable(table: String): String = s"${table}_norms"

  /** Build the top-`k`-term index from `docs` and save postings + norms
    * under `path`, registered as external tables.
    */
  def build(
      docs: DataFrame, k: Int, table: String, path: String,
      buckets: Int): Unit = {
    val spark = docs.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS $table")
    spark.sql(s"DROP TABLE IF EXISTS ${normsTable(table)}")
    val next = AggStore.versionPaths(spark, path).lastOption
      .map(p => new org.apache.hadoop.fs.Path(p).getName.drop(1).toInt + 1)
      .getOrElse(0)
    val vdir = s"$path/v$next"
    val postings = graft.operators.TextAnalysis.tfidfTopTerms(docs, k)
      .select(xxhash64(col("term")).as("tkey"),
        col("doc_id"), col("score").as("w"))
      .persist()
    postings.groupBy("doc_id")
      .agg(sqrt(sum(col("w") * col("w"))).as("nrm"))
      .write.option("path", s"$vdir/norms").mode("overwrite")
      .format("parquet").saveAsTable(normsTable(table))
    postings
      .write.bucketBy(buckets, "tkey").sortBy("tkey")
      .option("path", s"$vdir/postings").mode("overwrite")
      .format("parquet").saveAsTable(table)
    postings.unpersist()
  }

  /** Top-`topN` cosine matches per query id, served ENTIRELY from the
    * saved index — query vectors are the queries' own saved postings
    * rows (queries are corpus members, the doc-as-query retrieval
    * shape), so not even the query batch re-tokenizes. Self-matches
    * excluded; pairs sharing zero terms never surface (no join row) —
    * both mirroring the in-session form.
    */
  def search(spark: SparkSession, table: String, queryIds: DataFrame,
      topN: Int): DataFrame = {
    val post = spark.table(table)
    val norms = spark.table(normsTable(table))
    val qn = norms.join(broadcast(queryIds), "doc_id")
      .select(col("doc_id").as("query_id"), col("nrm").as("nq"))
    val q = post.join(broadcast(queryIds), "doc_id")
      .select(col("tkey"), col("doc_id").as("query_id"),
        col("w").as("wq"))
    post
      .join(broadcast(q), "tkey")
      .filter(col("doc_id") =!= col("query_id"))
      .groupBy("query_id", "doc_id")
      .agg(sum(col("wq") * col("w")).as("dot"))
      .join(norms, "doc_id")
      .join(broadcast(qn), "query_id")
      .withColumn("cos4", round(col("dot") / (col("nq") * col("nrm")), 4))
      .groupBy("query_id")
      .agg(graft.functions.TopKAgg
        .topK(topN, col("cos4"), col("doc_id")).as("top"))
      .select(col("query_id"), posexplode(col("top")).as(Seq("pos", "row")))
      .select(
        col("query_id"),
        (col("pos") + 1).cast("int").as("rnk"),
        col("row._2").as("neighbor_id"),
        col("row._1").as("cosine"))
      .orderBy("query_id", "rnk")
  }
}
