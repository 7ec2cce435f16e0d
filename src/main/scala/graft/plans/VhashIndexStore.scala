package graft.plans

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted VIDEO-fingerprint index — the clip-level member of the
  * incremental-admission family, completing it across ALL FOUR
  * modalities (text shingles — [[ShingleIndexStore]]; embeddings —
  * [[IvfIndexStore]]; audio — [[AhashIndexStore]]; video — this). The
  * corpus is decoded and fingerprinted ONCE
  * ([[graft.functions.VHashFrames]] — the expensive per-clip AVI DIB
  * decode + 8 per-frame DCT hashes), the (doc_id, j, simhash) frame
  * table persists, and each arriving batch fingerprints ONLY itself,
  * probes the saved frames via frame-aligned Hamming banding with the
  * exact lower-median verify ([[graft.operators.Dedup.vhashMatch]] —
  * pigeonhole-complete for the median gate), and appends exactly the
  * admitted clips' frame rows. Admitted rows MATERIALIZE before the
  * append so admission never races its own write (the
  * [[AhashIndexStore]] discipline); undecodable payloads drop at
  * fingerprint time like every [[graft.functions.VHashFrames]]
  * consumer.
  *
  * Scale shape: the index side is ≤ 8 longs per clip; banding keeps
  * the probe at (j, chunk, value)-bucket volume, never batch × index;
  * the batch's decode cost is batch-bounded. Retirement rides
  * [[Retire]] unchanged — the doc key masks ALL of a clip's frame rows
  * at once, so delete/compact semantics are identical to the
  * single-fingerprint stores.
  */
object VhashIndexStore {

  /** The lower-median gate shared with q_dedup_vhash — re-encoded
    * brightness-shifted copies land within it (the image family's
    * measured ≤ 4-bits-per-frame bound, spec-pinned), distinct clips
    * far outside.
    */
  val Radius = 4

  /** (doc_id, j, simhash) per-frame fingerprint rows of a clips frame
    * — ONE definition shared by build, admission, and the in-plan
    * q_dedup_vhash family so the fingerprint pipeline cannot drift
    * between the index and the pair queries.
    */
  def frames(clips: DataFrame): DataFrame =
    clips.select(col("doc_id"),
      graft.functions.VHashFrames.fps(clips.sparkSession, col("payload"))
        .as("fps"))
      .filter(col("fps").isNotNull)
      .select(col("doc_id"),
        posexplode(col("fps")).as(Seq("j", "simhash")))

  def build(clips: DataFrame, table: String, path: String): Unit =
    buildFromFrames(frames(clips), table, path)

  /** Build from ALREADY-FINGERPRINTED (doc_id, j, simhash) frame rows —
    * for callers that share one corpus fingerprint pass across
    * consumers (the memoized q_dedup_vhash family).
    */
  def buildFromFrames(fr: DataFrame, table: String, path: String): Unit = {
    val spark = fr.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS $table")
    Retire.reset(spark, table)
    fr.write.option("path", path).mode("overwrite")
      .format("parquet").saveAsTable(table)
  }

  /** Tombstone `ids` (doc_id rows) — deleted clips stop matching (and
    * stop blocking admission) immediately; [[compact]] drops all their
    * frame rows physically. See [[Retire]].
    */
  def delete(spark: SparkSession, table: String, ids: DataFrame): Unit =
    Retire.delete(spark, table, ids, "doc_id")

  /** File-granular physical removal of tombstoned clips' frame rows. */
  def compact(spark: SparkSession, table: String): Unit =
    Retire.compact(spark, table, Seq(table -> "doc_id"))

  /** Doc_ids of fingerprinted batch clips with a median-gate near-dup
    * among the saved (surviving) frames — the probe shared by
    * [[admitAndExtend]] and the streaming admission gate
    * ([[graft.streaming.DocStreams.admitByVideoFingerprint]]).
    */
  def matchFrames(fps: DataFrame, table: String,
      maxHamming: Int = Radius): DataFrame = {
    val spark = fps.sparkSession
    graft.operators.Dedup
      .vhashMatch(fps,
        Retire.survivors(spark, table, spark.table(table), "doc_id"),
        maxHamming)
      .select(col("batch_id").as("doc_id")).distinct()
  }

  /** [[matchFrames]] over raw clip payloads. */
  def matchBatch(batch: DataFrame, table: String,
      maxHamming: Int = Radius): DataFrame =
    matchFrames(frames(batch), table, maxHamming)

  /** Admit the batch clips with NO median-gate near-dup in the saved
    * index (radius [[Radius]]), fold exactly their frame rows in, and
    * return them. Batch-internal duplicates are admitted together (the
    * family's admission contract: the index is the authority, the
    * batch is one ingest unit).
    */
  def admitAndExtend(batch: DataFrame, table: String,
      maxHamming: Int = Radius): DataFrame = {
    val fps = frames(batch).localCheckpoint(true)
    val admitted = fps
      .join(matchFrames(fps, table, maxHamming), Seq("doc_id"), "left_anti")
      .localCheckpoint(true) // materialize BEFORE the append below
    admitted.write.mode("append").format("parquet").saveAsTable(table)
    admitted
  }
}
