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
  *
  * PERMISSIVE caveat (a Spark restriction since 2.3, not this module's
  * choice): a query that references ONLY `_corrupt_record` on a raw
  * JSON scan is disallowed — to audit bad lines, select at least one
  * data column alongside, or cache the frame first
  * (FileSourcesSpec's audit does the latter).
  */
object CorpusJsonl {

  val CorruptCol = "_corrupt_record"

  /** PERMISSIVE only materializes the raw line if the schema carries
    * the corrupt-record column — add it so callers always can audit.
    * One definition shared by the batch and streaming readers so the
    * triage behavior can't diverge between them.
    */
  private def withCorruptCol(
      schema: StructType, mode: String): StructType =
    if (mode.equalsIgnoreCase("PERMISSIVE") &&
      !schema.fieldNames.contains(CorruptCol))
      schema.add(CorruptCol, StringType)
    else schema

  def read(
      spark: SparkSession, path: String, schema: StructType,
      mode: String = "PERMISSIVE"): DataFrame =
    spark.read.schema(withCorruptCol(schema, mode))
      .option("mode", mode).json(path)

  /** Streaming form: tail a landing directory for new JSONL dumps — the
    * production corpus ingest source (crawl batches land as files; the
    * file source tracks processed files in the checkpoint, so each dump
    * is ingested exactly once across restarts). Same explicit-schema
    * discipline; malformed-line mode applies per file. Compose with the
    * DocStreams gates (prepare / gopherFilter / admitAgainstSignatureIndex)
    * for the full ingest pipeline.
    *
    * Producer contract: dumps must land ATOMICALLY (write to a temp
    * name outside the directory, then rename in). The file source
    * records a file as processed the moment it lists it — a producer
    * writing in place can be listed mid-write, ingested truncated, and
    * never re-read.
    */
  def readStream(
      spark: SparkSession, path: String, schema: StructType,
      mode: String = "PERMISSIVE"): DataFrame =
    spark.readStream.schema(withCorruptCol(schema, mode))
      .option("mode", mode).json(path)

  /** One JSON object per line, parallel part files — the corpus export
    * twin of the reader (pair with Layout.writeTrainingShards when the
    * consumer needs fixed-size shards instead of whatever partitioning
    * the upstream plan left). `saveMode` defaults to "overwrite" — the
    * export-job idiom where the target IS the job's output directory —
    * and that default REPLACES existing data at `path`; pass "append"
    * (accumulating landing dir) or "error" to change the disposition.
    */
  def write(
      df: DataFrame, path: String, saveMode: String = "overwrite"): Unit =
    df.write.mode(saveMode).json(path)
}
