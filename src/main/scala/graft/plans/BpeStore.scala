package graft.plans

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.TextAnalysis

/** Persisted BPE tokenizer artifact — the serving split for
  * [[graft.operators.TextAnalysis.bpeLearn]], following the house
  * frozen-model discipline ([[LmStore]]/[[Bm25IndexStore]]/
  * [[IvfIndexStore]]): train the merge table ONCE over the reference
  * corpus (the expensive corpus pass), save it, and encode every
  * arriving batch against the FROZEN list. The artifact is the ordered
  * merge table itself — numMerges rows, KB-scale however many TB it was
  * trained on — so "loading the tokenizer" is a driver-side collect and
  * every batch encode is corpus-independent.
  *
  * Unseen words are the point: serving applies the merges in rank order
  * to the BATCH's own distinct words (the standard BPE inference rule),
  * which provably reproduces the training loop's segmentation on
  * trained words and extends to any new word — no out-of-vocabulary
  * failure mode, the property that makes BPE the production tokenizer
  * family. Re-training (to let new corpora influence the merges
  * themselves) is the documented rebuild knob, exactly like the IVF
  * quantizer and the BM25 stats.
  */
object BpeStore {

  def mergesTable(table: String): String = s"${table}_bpe_merges"

  /** Train on `corpus` (doc_id, text) and save the ordered merge table
    * (rnk, lhs, rhs, freq) under `path`, registered as an external
    * table.
    */
  def build(
      corpus: DataFrame, numMerges: Int, table: String,
      path: String): Unit = {
    val merges = TextAnalysis.bpeLearn(corpus, numMerges)
    val spark = corpus.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS ${mergesTable(table)}")
    merges.write.option("path", path).mode("overwrite")
      .format("parquet").saveAsTable(mergesTable(table))
  }

  /** The saved merge list in rank order — numMerges rows by
    * construction, so the collect is the artifact's defining size.
    */
  def loadMerges(spark: SparkSession, table: String): Seq[(String, String)] =
    spark.table(mergesTable(table)).orderBy("rnk")
      .collect().map(r => (r.getString(1), r.getString(2))).toSeq

  /** Encode `docs` (doc_id, text) under the frozen artifact: segment
    * the batch's DISTINCT words by ordered merge application (vocab-
    * sized work), then the shared broadcast-join counting tail. Output
    * shape equals [[TextAnalysis.bpeEncode]], and on the training
    * corpus the results are identical (IndexStoreSpec pins it).
    */
  def encode(
      spark: SparkSession, docs: DataFrame, table: String): DataFrame = {
    val merges = loadMerges(spark, table)
    val vocabSyms = docs
      .select(explode(
        graft.functions.TextFunctions.tokens(col("text"))).as("w"))
      .distinct()
      .select(col("w"),
        TextAnalysis.bpeSegmentWord(col("w"), merges).as("syms"))
    TextAnalysis.bpeEncodeWithVocab(docs, vocabSyms)
  }

  def statsTable(table: String): String = s"${table}_bpe_stats"

  /** Freq-weighted symbol-usage distribution + totals of `docs` under
    * the frozen merges — the measurement both the build baseline and
    * [[staleness]] share (one definition).
    */
  private def usage(
      spark: SparkSession, docs: DataFrame,
      merges: Seq[(String, String)]): (Map[String, Long], Long, Long) = {
    val words = docs
      .select(explode(
        graft.functions.TextFunctions.tokens(col("text"))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("freq"))
      .localCheckpoint(true)
    val uses = words
      .select(col("freq"),
        explode(TextAnalysis.bpeSegmentWord(col("w"), merges)).as("sym"))
      .groupBy("sym").agg(sum("freq").as("uses"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val nWords = words.agg(coalesce(sum("freq"),
        org.apache.spark.sql.functions.lit(0L)))
      .collect()(0).getLong(0)
    (uses, nWords, uses.valuesIterator.sum)
  }

  /** Persist the build-time usage baseline for [[staleness]] —
    * call after [[build]] (kept separate so existing callers that
    * never measure staleness pay nothing).
    */
  def saveStats(
      corpus: DataFrame, table: String, path: String): Unit = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val (uses, nWords, _) =
      usage(spark, corpus, loadMerges(spark, table))
    spark.sql(s"DROP TABLE IF EXISTS ${statsTable(table)}")
    // the word-observation total rides a NULL-key row — no reserved
    // string a pathological corpus symbol could collide with
    (uses.toSeq.map { case (k, v) => (Option(k), v) } :+
        (Option.empty[String] -> nWords))
      .toDF("sym", "uses")
      .coalesce(1)
      .write.option("path", path + "_stats").mode("overwrite")
      .format("parquet").saveAsTable(statsTable(table))
  }

  /** Measured drift of the frozen merge table against its build-time
    * baseline — [[UnigramStore.staleness]]'s semantics for the BPE
    * family: residualGrowth = batch fertility (symbols per word) over
    * build fertility (unseen words segment into more, shorter symbols
    * — BPE needs no UNK tier, novel characters surface as themselves);
    * occupancySkew = TV distance between build-time and batch
    * symbol-usage distributions.
    */
  def staleness(
      spark: SparkSession, batch: DataFrame, table: String): Staleness = {
    val builtRows = spark.table(statsTable(table))
      .collect().map(r =>
        (if (r.isNullAt(0)) None else Some(r.getString(0))) ->
          r.getLong(1)).toMap
    val builtWords = builtRows.getOrElse(None, 0L)
    val builtUses = builtRows.collect {
      case (Some(k), v) => k -> v
    }
    val builtSyms = builtUses.valuesIterator.sum
    val (uses, nWords, nSyms) =
      usage(spark, batch, loadMerges(spark, table))
    if (builtWords == 0L || nWords == 0L)
      return Staleness(1.0, 0.0, builtWords, nWords)
    val skew = 0.5 * (builtUses.keySet ++ uses.keySet).toSeq.map { k =>
      math.abs(
        builtUses.getOrElse(k, 0L).toDouble / builtSyms -
          uses.getOrElse(k, 0L).toDouble / nSyms)
    }.sum
    Staleness(
      (nSyms.toDouble / nWords) /
        math.max(builtSyms.toDouble / builtWords, 1e-12),
      skew, builtWords, nWords)
  }

  /** Re-train from `corpus` when either signal clears its ceiling. */
  def rebuildIfStale(
      corpus: DataFrame, numMerges: Int, table: String, path: String,
      residualMax: Double = 1.25, skewMax: Double = 0.25)
      : (Staleness, Boolean) = {
    val spark = corpus.sparkSession
    val st = staleness(spark, corpus, table)
    if (st.isStale(residualMax, skewMax)) {
      build(corpus, numMerges, table, path + "_rb")
      saveStats(corpus, table, path + "_rb")
      (st, true)
    } else (st, false)
  }
}
