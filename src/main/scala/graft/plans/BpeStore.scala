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
}
