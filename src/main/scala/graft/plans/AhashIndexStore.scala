package graft.plans

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted AUDIO-fingerprint index — the perceptual-dedup sibling of
  * [[ShingleIndexStore]] (text) and [[IvfIndexStore]] (embeddings),
  * completing the incremental-admission family across modalities: the
  * corpus is decoded and fingerprinted ONCE
  * ([[graft.functions.AHash64]] — the expensive per-clip Goertzel
  * pass), the (doc_id, simhash) table persists, and each arriving
  * batch fingerprints ONLY itself, probes the saved fingerprints via
  * cross-frame Hamming banding ([[graft.operators.Dedup.hammingMatch]]
  * — pigeonhole-complete, exact bit_count verify), and appends exactly
  * the admitted rows. Admitted rows MATERIALIZE before the append so
  * admission never races its own write (the [[IvfIndexStore]]
  * discipline); undecodable payloads are dropped at fingerprint time
  * like every AHash64 consumer.
  *
  * Scale shape: the index side is one long per clip; banding keeps the
  * cross join at chunk-bucket volume, never batch × index; the batch's
  * decode cost is batch-bounded.
  */
object AhashIndexStore {

  /** The banding gate shared with q_dedup_ahash — pitched/gain-shifted
    * near-dup copies land within it (spec-pinned), distinct clips far
    * outside.
    */
  val Radius = 4

  /** (doc_id, simhash) fingerprint rows of a clips frame — ONE
    * definition shared by build, admission, and the in-plan
    * q_dedup_ahash family so the fingerprint pipeline cannot drift
    * between the index and the pair queries.
    */
  def fingerprints(clips: DataFrame): DataFrame =
    clips.select(col("doc_id"),
      graft.functions.AHash64.fp(clips.sparkSession, col("payload"))
        .as("simhash"))
      .filter(col("simhash") =!=
        lit(graft.functions.AHash64.Undecodable))

  def build(clips: DataFrame, table: String, path: String): Unit =
    buildFromFingerprints(fingerprints(clips), table, path)

  /** Build from ALREADY-FINGERPRINTED (doc_id, simhash) rows — for
    * callers that share one corpus fingerprint pass across consumers
    * (the memoized q_dedup_ahash family).
    */
  def buildFromFingerprints(
      fps: DataFrame, table: String, path: String): Unit = {
    val spark = fps.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS $table")
    Retire.reset(spark, table)
    fps.write.option("path", path).mode("overwrite")
      .format("parquet").saveAsTable(table)
  }

  /** Tombstone `ids` (doc_id rows) — deleted clips stop matching (and
    * stop blocking admission) immediately; [[compact]] drops their
    * fingerprints physically. See [[Retire]].
    */
  def delete(spark: SparkSession, table: String, ids: DataFrame): Unit =
    Retire.delete(spark, table, ids, "doc_id")

  /** File-granular physical removal of tombstoned fingerprints. */
  def compact(spark: SparkSession, table: String): Unit =
    Retire.compact(spark, table, Seq(table -> "doc_id"))

  /** Doc_ids of fingerprinted batch rows with a banded near-dup among
    * the saved (surviving) fingerprints — the probe shared by
    * [[admitAndExtend]] and the streaming admission gate
    * ([[graft.streaming.DocStreams.admitByAudioFingerprint]]).
    */
  def matchFingerprints(fps: DataFrame, table: String,
      maxHamming: Int = Radius): DataFrame = {
    val spark = fps.sparkSession
    graft.operators.Dedup
      .hammingMatch(fps,
        Retire.survivors(spark, table, spark.table(table), "doc_id"),
        maxHamming)
      .select(col("batch_id").as("doc_id")).distinct()
  }

  /** [[matchFingerprints]] over raw clip payloads. */
  def matchBatch(batch: DataFrame, table: String,
      maxHamming: Int = Radius): DataFrame =
    matchFingerprints(fingerprints(batch), table, maxHamming)

  /** Admit the batch clips with NO banded near-dup in the saved index
    * (radius [[Radius]]), fold exactly them in, and return their
    * (doc_id, simhash) rows. Batch-internal duplicates are admitted
    * together (the admission contract matches the text/embedding
    * stores: the index is the authority, the batch is one ingest
    * unit).
    */
  def admitAndExtend(batch: DataFrame, table: String,
      maxHamming: Int = Radius): DataFrame = {
    val fps = fingerprints(batch).localCheckpoint(true)
    val admitted = fps
      .join(matchFingerprints(fps, table, maxHamming),
        Seq("doc_id"), "left_anti")
      .localCheckpoint(true) // materialize BEFORE the append below
    admitted.write.mode("append").format("parquet").saveAsTable(table)
    admitted
  }
}
