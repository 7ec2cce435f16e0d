package graft.plans

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators.Unigram

/** Persisted unigram-tokenizer artifact — the serving split for
  * [[graft.operators.Unigram.train]], the [[BpeStore]] discipline for
  * the second tokenizer family: fit the piece table ONCE over the
  * reference corpus (the expensive pass), save it, and encode every
  * arriving batch against the FROZEN (piece, score) table. The
  * artifact is the pruned vocabulary itself — chars +
  * [[graft.operators.Unigram.VocabMultiCap]] rows, KB-scale however
  * many TB it was trained on — so "loading the tokenizer" is a
  * driver-side collect and every batch encode is corpus-independent.
  *
  * Unseen words segment through the same Viterbi: every single
  * character of the training corpus stays in the vocabulary (the
  * coverage invariant), so any word over the training alphabet has a
  * segmentation; genuinely novel characters are a loud error, not a
  * silent drop — the standard unigram-tokenizer OOV contract (real
  * deployments add a byte-fallback tier; the documented extension).
  * Re-training (to let new corpora move the piece probabilities) is
  * the documented rebuild knob, exactly like the BPE merges and the
  * IVF quantizer.
  */
object UnigramStore {

  def piecesTable(table: String): String = s"${table}_unigram_pieces"

  /** Save a trained vocabulary under `path`, registered as an external
    * table (piece, cnt, score).
    */
  def save(
      spark: SparkSession, pieces: Seq[Unigram.Piece], table: String,
      path: String): Unit = {
    import spark.implicits._
    spark.sql(s"DROP TABLE IF EXISTS ${piecesTable(table)}")
    pieces.toDF("piece", "cnt", "score")
      .coalesce(1)
      .write.option("path", path).mode("overwrite")
      .format("parquet").saveAsTable(piecesTable(table))
  }

  /** Train on `corpus` (doc_id, text) and save. */
  def build(
      corpus: DataFrame, table: String, path: String): Unit =
    save(corpus.sparkSession,
      Unigram.train(Unigram.wordFreq(corpus)), table, path)

  /** The frozen score map — vocab-sized by construction. */
  def loadScores(
      spark: SparkSession, table: String): Map[String, Long] =
    spark.table(piecesTable(table))
      .select("piece", "score")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  /** Encode `docs` (doc_id, text) under the frozen artifact — output
    * shape equals [[graft.operators.Unigram.encodeWithVocab]], and on
    * the training corpus the results are identical (the store
    * round-trips (piece, score) exactly; UnigramSpec pins it).
    */
  def encode(
      spark: SparkSession, docs: DataFrame, table: String): DataFrame =
    Unigram.encodeWithVocab(docs, loadScores(spark, table))
}
