package graft.plans

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions.tokens

/** Persisted BM25 search index — the production serving shape of
  * [[graft.operators.TextAnalysis.bm25Retrieval]], completing the
  * artifact family (shingle / LM / IVF / agg-state stores): tokenize +
  * weight the corpus ONCE, save the inverted index, then serve query
  * batches and fold new document batches in without ever re-tokenizing
  * the corpus.
  *
  * The artifact is THREE tables:
  *   - `<table>`        — postings (tkey, doc_id, w): per-(doc, term)
  *                        BM25 weights under build-time stats, bucketed
  *                        + sorted by the 64-bit term fingerprint so
  *                        term-keyed consumers scan pre-partitioned
  *                        buckets (the [[ShingleIndexStore]] argument);
  *   - `<table>_df`     — (tkey, df): the document frequencies the
  *                        weights were built with — extension needs
  *                        them to weight NEW terms consistently;
  *   - `<table>_stats`  — one row (n_docs, avgdl): the corpus-level
  *                        constants of the weight formula.
  *
  * `extend` weights an arriving batch under the FROZEN stats (df,
  * n_docs, avgdl stay build-time) and appends per-bucket files — the
  * same frozen-model discipline as [[IvfIndexStore]]'s quantizer and
  * [[LmStore]]'s denominators-at-load: scores stay comparable across
  * the whole index (a verbatim copy of a corpus doc ties its
  * original's score EXACTLY, spec-pinned), at the cost of the stats
  * drifting from the true corpus as batches accumulate — the
  * documented knob is a periodic rebuild, exactly like IVF re-training.
  * Unseen batch terms get the df=0 idf ln(1 + (N+0.5)/0.5) from the
  * frozen stats row.
  *
  * Parity: identical arithmetic to `bm25Retrieval` (per-term 4dp
  * rounding, Lucene idf, k1/b defaults), so a search over the saved
  * index reproduces the in-session query row-for-row and carries the
  * same DuckDB oracle.
  */
object Bm25IndexStore {

  def dfTable(table: String): String = s"${table}_df"
  def statsTable(table: String): String = s"${table}_stats"

  /** Per-(doc, term) BM25 weights from a precomputed (doc_id, term,
    * tf) frame under the GIVEN corpus stats — shared by build (stats
    * from the corpus itself, tf tokenized once and reused for df/dl/
    * weights) and extend (frozen stats from the artifact). Terms
    * absent from `dfreq` weight with df = 0.
    */
  private def weigh(
      tf: DataFrame, dfreq: DataFrame, stats: DataFrame,
      k1: Double, b: Double): DataFrame = {
    val dl = tf.groupBy("doc_id").agg(sum("tf").as("dl"))
    tf.join(dfreq.withColumnRenamed("tkey", "tk"),
        xxhash64(col("term")) === col("tk"), "left")
      .withColumn("df", coalesce(col("df"), lit(0L)))
      .join(dl, "doc_id")
      .crossJoin(broadcast(stats))
      .withColumn("idf", log(
        (col("n_docs") - col("df") + 0.5) / (col("df") + 0.5) + 1.0))
      .withColumn("w", round(
        col("idf") * (col("tf") * lit(k1 + 1.0)) /
          (col("tf") + lit(k1) *
            (lit(1.0 - b) + lit(b) * col("dl") / col("avgdl"))), 4))
      .select(xxhash64(col("term")).as("tkey"), col("doc_id"), col("w"))
  }

  /** Build the index from `docs` and save postings + df + stats under
    * `path`, registered as external tables.
    */
  def build(docs: DataFrame, table: String, path: String, buckets: Int,
      k1: Double = 1.2, b: Double = 0.75): Unit = {
    val spark = docs.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS $table")
    spark.sql(s"DROP TABLE IF EXISTS ${dfTable(table)}")
    spark.sql(s"DROP TABLE IF EXISTS ${statsTable(table)}")
    // versioned save, the AggStore discipline: a rebuild must never
    // overwrite a directory a live plan may have listed
    val next = AggStore.versionPaths(spark, path).lastOption
      .map(p => new org.apache.hadoop.fs.Path(p).getName.drop(1).toInt + 1)
      .getOrElse(0)
    val vdir = s"$path/v$next"
    val tf = docs
      .select(col("doc_id"), tokens(col("text")).as("toks"))
      .select(col("doc_id"), explode(col("toks")).as("term"))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
      .persist()
    val dfreq = tf.groupBy("term")
      .agg(count(lit(1)).as("df"))
      .select(xxhash64(col("term")).as("tkey"), col("df"))
    val stats = tf.groupBy("doc_id").agg(sum("tf").as("dl"))
      .agg(count(lit(1)).as("n_docs"), avg("dl").as("avgdl"))
    dfreq.write.option("path", s"$vdir/df").mode("overwrite")
      .format("parquet").saveAsTable(dfTable(table))
    stats.write.option("path", s"$vdir/stats").mode("overwrite")
      .format("parquet").saveAsTable(statsTable(table))
    weigh(tf, spark.table(dfTable(table)),
        spark.table(statsTable(table)), k1, b)
      .write.bucketBy(buckets, "tkey").sortBy("tkey")
      .option("path", s"$vdir/postings").mode("overwrite")
      .format("parquet").saveAsTable(table)
    tf.unpersist()
  }

  /** Top-`topN` BM25 matches per query doc, served ENTIRELY from the
    * saved index — the corpus is never re-read or re-tokenized; the
    * query batch (small by definition) tokenizes, broadcasts, and
    * probes the postings. Self-matches (query id present in the index)
    * are excluded, mirroring `bm25Retrieval`.
    */
  def search(spark: SparkSession, table: String, queryDocs: DataFrame,
      topN: Int): DataFrame = {
    val q = queryDocs
      .select(col("doc_id").as("query_id"), tokens(col("text")).as("toks"))
      .select(col("query_id"), explode(col("toks")).as("term"))
      .distinct()
      .select(col("query_id"), xxhash64(col("term")).as("tkey"))
    spark.table(table)
      .join(broadcast(q), "tkey")
      .filter(col("doc_id") =!= col("query_id"))
      .groupBy("query_id", "doc_id")
      .agg(round(sum("w"), 4).as("score"))
      .groupBy("query_id")
      .agg(graft.functions.TopKAgg
        .topK(topN, col("score"), col("doc_id")).as("top"))
      .select(col("query_id"), posexplode(col("top")).as(Seq("pos", "row")))
      .select(
        col("query_id"),
        (col("pos") + 1).cast("int").as("rnk"),
        col("row._2").as("neighbor_id"),
        col("row._1").as("score"))
      .orderBy("query_id", "rnk")
  }

  /** Fold a new document batch in under the FROZEN stats: weight ONLY
    * the batch (one tokenize pass over the batch), append per-bucket
    * files — existing postings are untouched.
    */
  def extend(batch: DataFrame, table: String, buckets: Int,
      k1: Double = 1.2, b: Double = 0.75): Unit = {
    val spark = batch.sparkSession
    val tf = batch
      .select(col("doc_id"), tokens(col("text")).as("toks"))
      .select(col("doc_id"), explode(col("toks")).as("term"))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    weigh(tf, spark.table(dfTable(table)),
        spark.table(statsTable(table)), k1, b)
      .localCheckpoint(true)
      .write.bucketBy(buckets, "tkey").sortBy("tkey")
      .mode("append").format("parquet")
      .saveAsTable(table)
  }
}
