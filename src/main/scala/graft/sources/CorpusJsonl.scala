package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.{StringType, StructType}

/** JSON-Lines corpus IO — the interchange format raw text corpora
  * usually arrive in (one JSON object per line). JSONL is splittable,
  * so a 100 TB dump parallelizes by line ranges exactly like CSV/text;
  * gzip members are the usual non-splittable trap and stay the
  * uploader's problem, not this reader's.
  *
  * The reader REQUIRES an explicit schema: Spark's schema inference is
  * a full extra pass over the data before the real one — at corpus
  * scale the inference scan costs as much as the job (the same
  * discipline as the CSV dims in SURVEY S1). Malformed lines follow
  * Spark's standard triage, chosen per call: PERMISSIVE routes the raw
  * line into `_corrupt_record` so bad lines can be counted/quarantined
  * in the same pass (the audit-friendly default for crawled data),
  * DROPMALFORMED silently discards, FAILFAST aborts — the reference's
  * fail-fast-vs-permissive split (SURVEY S9) applied to file ingest.
  */
object CorpusJsonl {

  val CorruptCol = "_corrupt_record"

  def read(
      spark: SparkSession, path: String, schema: StructType,
      mode: String = "PERMISSIVE"): DataFrame = {
    // PERMISSIVE only materializes the raw line if the schema carries
    // the corrupt-record column — add it so callers always can audit
    val s =
      if (mode.equalsIgnoreCase("PERMISSIVE") &&
        !schema.fieldNames.contains(CorruptCol))
        schema.add(CorruptCol, StringType)
      else schema
    spark.read.schema(s).option("mode", mode).json(path)
  }

  /** Streaming form: tail a landing directory for new JSONL dumps — the
    * production corpus ingest source (crawl batches land as files; the
    * file source tracks processed files in the checkpoint, so each dump
    * is ingested exactly once across restarts). Same explicit-schema
    * discipline; malformed-line mode applies per file. Compose with the
    * DocStreams gates (prepare / gopherFilter / admitAgainstSignatureIndex)
    * for the full ingest pipeline.
    */
  def readStream(
      spark: SparkSession, path: String, schema: StructType,
      mode: String = "PERMISSIVE"): DataFrame = {
    val s =
      if (mode.equalsIgnoreCase("PERMISSIVE") &&
        !schema.fieldNames.contains(CorruptCol))
        schema.add(CorruptCol, StringType)
      else schema
    spark.readStream.schema(s).option("mode", mode).json(path)
  }

  /** One JSON object per line, parallel part files — the corpus export
    * twin of the reader (pair with Layout.writeTrainingShards when the
    * consumer needs fixed-size shards instead of whatever partitioning
    * the upstream plan left).
    */
  def write(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").json(path)
}
