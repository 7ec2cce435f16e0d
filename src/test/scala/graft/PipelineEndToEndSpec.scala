package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Dedup, Quality, Sampling, TextAnalysis}
import graft.plans.Layout

/** The whole library composed the way a user would: one corpus in, gate
  * → exact dedup → LM tiering → per-language budget → shard export, each
  * stage the registered operator, with cross-stage invariants asserted
  * on the seams. Individual operators are oracled/spec'd elsewhere; this
  * pins that their frames actually COMPOSE (column contracts, row
  * conservation, determinism end to end).
  */
class PipelineEndToEndSpec extends AnyFunSuite {

  private val dir = "/root/testdata/sf0.001"

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-e2e-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("gate -> dedup -> tiers -> budget -> shards composes end to end") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val nRaw = docs.count()

    // stage 1: quality gate (the battery's conjunction, column-preserving)
    val gated = Quality.gopherFilter(docs).persist()
    val nGated = gated.count()
    assert(nGated > 0 && nGated < nRaw, "gate must bite but not empty")
    assert(gated.columns.toSeq === docs.columns.toSeq,
      "gate preserves the caller's schema")

    // stage 2: exact dedup survivors (fingerprint min-id winners)
    val survivors = gated
      .withColumn("fp", graft.functions.TextFunctions.fingerprint(col("text")))
      .groupBy("fp").agg(min("doc_id").as("doc_id"))
      .select("doc_id")
    val deduped = gated.join(survivors, "doc_id").persist()
    val nDeduped = deduped.count()
    assert(nDeduped <= nGated)

    // stage 3: LM tiers over the deduped corpus — every survivor tiered
    val tiers = TextAnalysis.lmBuckets(deduped)
    assert(tiers.agg(sum("n_docs")).first.getLong(0) === nDeduped,
      "tiering partitions exactly the deduped corpus")

    // stage 4: per-language budget over the same corpus — allocation
    // spends one epoch of the surviving tokens
    val budget = Sampling.langBudget(deduped).collect()
    val totalToks = budget.map(_.getLong(1)).sum.toDouble
    assert(math.abs(budget.map(_.getDouble(2)).sum - totalToks) <
      0.05 * budget.length, "waterfill spends the whole surviving budget")

    // stage 4b: weighted downsample of the survivors — selection
    // pressure by document length, exact E-S without-replacement law,
    // deterministic across replays (seeded hash keys)
    val k = (nDeduped / 2).toInt
    val sampled = Sampling
      .weightedSample(deduped, "doc_id", "n_chars", k, seed = 42)
    assert(sampled.count() === k.toLong)
    val sampledIds = sampled.select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(sampledIds.subsetOf(
      deduped.select("doc_id").collect().map(_.getLong(0)).toSet))
    val replay = Sampling
      .weightedSample(deduped, "doc_id", "n_chars", k, seed = 42)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(replay === sampledIds, "sample is replay-deterministic")

    // stage 5: shard export of the deduped corpus; manifest covers it
    val out = java.nio.file.Files
      .createTempDirectory("graft-e2e-shards").toString
    val manifest = Layout
      .writeTrainingShards(deduped, "doc_id", out, rowsPerShard = 32L)
    assert(manifest.count() === nDeduped)
    val back = spark.read.parquet(out)
    assert(back.count() === nDeduped,
      "every surviving document lands in a shard")
    assert(back.select("doc_id").distinct().count() === nDeduped,
      "no document is duplicated by the export")

    // end-to-end determinism: replaying the whole pipeline reproduces
    // the same survivor set and the same shard assignment
    val survivors2 = Quality.gopherFilter(docs)
      .withColumn("fp", graft.functions.TextFunctions.fingerprint(col("text")))
      .groupBy("fp").agg(min("doc_id").as("doc_id"))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(survivors2 ===
      deduped.select("doc_id").collect().map(_.getLong(0)).toSet)
    val manifest2 = Layout.writeTrainingShards(
      deduped, "doc_id", java.nio.file.Files
        .createTempDirectory("graft-e2e-shards2").toString, 32L)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toMap
    assert(manifest.collect().map(r => (r.getLong(0), r.getLong(2))).toMap
      === manifest2)

    deduped.unpersist(); gated.unpersist()
  }
}
