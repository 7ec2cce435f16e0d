package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.multimodal.Multimodal

/** Multimodal plumbing: synthetic media table, stubbed decode kernels,
  * partition-batched feature extraction, payload-rewriting resize,
  * frame-sample fan-out.
  */
class MultimodalSpec extends AnyFunSuite {

  private val dir = "/root/testdata/sf0.001"

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-multimodal-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("media table covers all docs with valid headers") {
    val media = Multimodal.mediaTable(spark, dir).cache()
    assert(media.count() === 500)
    val feats = Multimodal.extractFeatures(media).cache()
    assert(feats.filter(col("header_ok") === false).count() === 0)
    // payload = 8-byte header + ascii text
    val joined = feats.join(
      Tables.documents(spark, dir).select(
        col("doc_id").as("media_id"), col("n_chars")), "media_id")
    assert(joined.filter(col("byte_len") =!= col("n_chars") + 8).count() === 0)
    feats.unpersist(); media.unpersist()
  }

  test("feature kernel: entropy bounded, histogram support sane") {
    val feats = Multimodal
      .extractFeatures(Multimodal.mediaTable(spark, dir)).cache()
    assert(feats.filter(col("entropy") < 0 || col("entropy") > 8).count() === 0)
    assert(feats.filter(
      col("histogram_nonzero") < 1 || col("histogram_nonzero") > 256)
      .count() === 0)
    // deterministic across runs
    val a = feats.orderBy("media_id").collect()
    val b = Multimodal.extractFeatures(Multimodal.mediaTable(spark, dir))
      .orderBy("media_id").collect()
    assert(a.toSeq === b.toSeq)
    feats.unpersist()
  }

  test("resize clamps header dims and meta consistently") {
    val resized = Multimodal
      .resize(Multimodal.mediaTable(spark, dir), maxDim = 256).cache()
    assert(resized
      .filter(col("meta.width") > 256 || col("meta.height") > 256)
      .count() === 0)
    // header and meta must agree after rewrite
    val feats = Multimodal.extractFeatures(resized)
    assert(feats.filter(col("header_ok") === false).count() === 0)
    resized.unpersist()
  }

  test("frame sample plan emits offsets within duration") {
    val media = Multimodal.mediaTable(spark, dir).toDF()
    val frames = Multimodal.frameSamplePlan(media, everyMs = 10000).cache()
    assert(frames.count() > 0)
    val bad = frames.join(media, "media_id")
      .filter(col("offset_ms") > col("meta.durationMs"))
    assert(bad.count() === 0)
    frames.unpersist()
  }
}
