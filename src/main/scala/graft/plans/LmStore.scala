package graft.plans

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.TextAnalysis

/** Persisted, incrementally-extensible Stupid Backoff language model —
  * the LM sibling of [[ShingleIndexStore]]/[[IvfIndexStore]]/the
  * Count-Min artifact: fit the model once over the reference corpus,
  * save it as two parquet count tables, score every arriving batch
  * against the FROZEN artifact, and fold new corpora in by counter
  * addition instead of rescanning old text.
  *
  * Why counts and not probabilities: the model IS its two integer count
  * tables (bigrams `(g, c_bg)`, unigrams `(w2, c_u)`) — counts are
  * LINEAR, so `merge(model(A), model(B)) == model(A ∪ B)` exactly
  * (counter-for-counter, same law the Count-Min artifact exploits),
  * while stored probabilities would be frozen to the wrong denominators
  * the moment a batch arrives. Prefix counts and the (N, V) totals
  * recompute from the tables as vocab-sized aggregations at load time.
  *
  * Scale shape: both tables are vocab-bounded (vocab² worst-case for
  * bigrams), i.e. MB-scale however many TB of text they were fit on;
  * scoring joins broadcast them over the batch side. Extension scans
  * ONLY the new batch's text — the old corpus is never re-tokenized.
  */
object LmStore {

  def bigramsTable(table: String): String = s"${table}_bigrams"
  def unigramsTable(table: String): String = s"${table}_unigrams"

  private def save(
      df: DataFrame, table: String, path: String): Unit = {
    df.sparkSession.sql(s"DROP TABLE IF EXISTS $table")
    df.write.option("path", path).mode("overwrite")
      .format("parquet").saveAsTable(table)
  }

  /** Fit the model on `corpus` (doc_id, text) and save both count
    * tables under `path`, registered as external tables.
    */
  def build(corpus: DataFrame, table: String, path: String): Unit = {
    val toks = corpus.select(col("doc_id"),
      graft.functions.TextFunctions.tokens(col("text")).as("toks"))
    val (cbg, cu) = TextAnalysis.backoffModel(toks)
    save(cbg, bigramsTable(table), s"$path/bigrams")
    save(cu, unigramsTable(table), s"$path/unigrams")
  }

  /** Score `docs` (doc_id, text) against the SAVED model. The count
    * tables broadcast (vocab-bounded); only the batch is tokenized.
    */
  def score(spark: SparkSession, docs: DataFrame, table: String)
      : DataFrame = {
    val toks = docs.select(col("doc_id"),
      graft.functions.TextFunctions.tokens(col("text")).as("toks"))
    TextAnalysis.backoffScore(
      toks,
      broadcast(spark.table(bigramsTable(table))),
      broadcast(spark.table(unigramsTable(table))))
  }

  /** Fold `batch` (doc_id, text) into the saved model by counter
    * addition: tokenize ONLY the batch, sum its counts into the loaded
    * tables, rewrite. The merged frames are materialized via
    * `localCheckpoint` BEFORE the overwrite — the merge plan reads the
    * very tables the write replaces, and a lazy plan would scan
    * truncated files mid-overwrite.
    */
  def extend(batch: DataFrame, table: String, path: String): Unit = {
    val spark = batch.sparkSession
    val toks = batch.select(col("doc_id"),
      graft.functions.TextFunctions.tokens(col("text")).as("toks"))
    val (bBg, bU) = TextAnalysis.backoffModel(toks)
    val mBg = spark.table(bigramsTable(table)).unionByName(bBg)
      .groupBy("g").agg(sum("c_bg").as("c_bg"))
      .localCheckpoint(true)
    val mU = spark.table(unigramsTable(table)).unionByName(bU)
      .groupBy("w2").agg(sum("c_u").as("c_u"))
      .localCheckpoint(true)
    save(mBg, bigramsTable(table), s"$path/bigrams")
    save(mU, unigramsTable(table), s"$path/unigrams")
  }
}
