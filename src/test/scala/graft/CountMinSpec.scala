package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.CountMin
import graft.operators.Reshape

/** Count-Min sketch: the one-sided error guarantee (estimate never
  * under-counts, for EVERY key — the property the 2-pass exact
  * heavy-hitter query is built on), total conservation, and the
  * end-to-end query against a direct groupBy/HAVING on skewed data the
  * uniform driver fixture can't produce.
  */
class CountMinSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-countmin-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  /** Zipf-ish skewed key stream: key k appears ~4000/k times — a head
    * of genuine heavy hitters over a long light tail, the shape the
    * sketch exists for (and deliberately absent from the uniform
    * synthetic fixture, where candidates ≈ all keys).
    */
  private def skewed = {
    import spark.implicits._
    (1 to 200).flatMap(k => Seq.fill(4000 / k)(k.toLong))
      .toDF("user_id").repartition(7)
  }

  test("estimate >= true count for every key, even colliding tails") {
    val df = skewed
    // deliberately tiny width so tail keys DO collide in buckets —
    // the guarantee must hold through collisions, not in their absence
    val cms = CountMin.build(df, "user_id", depth = 3, width = 32)
    val rows = df.groupBy("user_id").agg(count(lit(1)).as("n"))
      .withColumn("est", cms.estimate(col("user_id")))
      .collect()
    assert(rows.length === 200)
    rows.foreach { r =>
      assert(r.getAs[Long]("est") >= r.getAs[Long]("n"),
        s"key ${r.get(0)} under-counted")
    }
  }

  test("each sketch row conserves the total key count") {
    val df = skewed
    val n = df.count()
    val cms = CountMin.build(df, "user_id", depth = 3, width = 32)
    cms.rows.foreach(row => assert(row.sum === n))
    assert(cms.total === n)
  }

  test("candidate filter is a superset of the true frequent set") {
    val df = skewed
    val threshold = 100L
    val cms = CountMin.build(df, "user_id", depth = 3, width = 32)
    val candidates = df
      .where(cms.estimate(col("user_id")) >= threshold)
      .select("user_id").distinct()
      .collect().map(_.getLong(0)).toSet
    val truly = df.groupBy("user_id").agg(count(lit(1)).as("n"))
      .where(col("n") >= threshold)
      .collect().map(_.getLong(0)).toSet
    assert(truly.subsetOf(candidates))
    // and the width=512 default keeps false candidates near zero here
    val wide = CountMin.build(df, "user_id")
    val candWide = df
      .where(wide.estimate(col("user_id")) >= threshold)
      .select("user_id").distinct().count()
    assert(candWide === truly.size.toLong)
  }

  test("2-pass heavy-hitter pipeline equals direct groupBy/HAVING") {
    val df = skewed
    val threshold = 150L
    val cms = CountMin.build(df, "user_id", depth = 4, width = 64)
    val candidates = df
      .where(cms.estimate(col("user_id")) >= threshold)
      .distinct()
    val got = df.join(broadcast(candidates), Seq("user_id"), "left_semi")
      .groupBy("user_id").agg(count(lit(1)).as("n"))
      .where(col("n") >= threshold)
      .orderBy("user_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val want = df.groupBy("user_id").agg(count(lit(1)).as("n"))
      .where(col("n") >= threshold)
      .orderBy("user_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got === want)
    assert(got.nonEmpty)
  }

  test("sketch linearity: merged batch sketches equal the corpus sketch") {
    val df = skewed
    val Array(b1, b2) = df.randomSplit(Array(0.5, 0.5), seed = 7)
    val whole = CountMin.build(df, "user_id", depth = 3, width = 64)
    val merged = CountMin.merge(
      CountMin.build(b1, "user_id", depth = 3, width = 64),
      CountMin.build(b2, "user_id", depth = 3, width = 64))
    // linearity is counter-EXACT, not approximate
    whole.rows.zip(merged.rows).foreach { case (w, m) =>
      assert(w.toSeq === m.toSeq)
    }
    // and a shape mismatch is refused, not silently mis-merged
    intercept[IllegalArgumentException] {
      CountMin.merge(whole, CountMin.build(df, "user_id", 3, 32))
    }
  }

  test("sketch artifact round-trips through parquet save/load") {
    val df = skewed
    val cms = CountMin.build(df, "user_id", depth = 3, width = 64)
    val dir = java.nio.file.Files
      .createTempDirectory("graft-cms").toString + "/sketch"
    CountMin.save(spark, cms, dir)
    val back = CountMin.load(spark, dir)
    assert(back.depth === cms.depth && back.width === cms.width)
    cms.rows.zip(back.rows).foreach { case (a, b) =>
      assert(a.toSeq === b.toSeq)
    }
    // incremental corpus pattern: extend the saved artifact with a new
    // batch's sketch and query candidates without touching old batches
    val extended = CountMin.merge(back, CountMin.build(
      skewed, "user_id", depth = 3, width = 64))
    assert(extended.total === cms.total * 2)
  }

  test("q_heavy_hitters matches the direct form on the fixture") {
    val dir = "/root/testdata/sf0.001"
    val got = Reshape.qHeavyHitters(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val want = Tables.events(spark, dir)
      .groupBy("user_id").agg(count(lit(1)).as("n_events"))
      .where(col("n_events") >= 80)
      .orderBy("user_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got === want)
    assert(got.nonEmpty)
  }

  test("batch click attribution matches an independent as-of recompute") {
    val dir = "/root/testdata/sf0.001"
    val got = Reshape.qClickAttribution(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSeq
    // independent formulation: raw filtered join, no shared helper
    val ev = Tables.events(spark, dir)
    val c = ev.filter(col("event_type") === "click")
      .select(col("event_id").as("cid"), col("user_id").as("cu"),
        col("ts").as("cts"))
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("pid"), col("user_id").as("pu"),
        col("ts").as("pts"))
    val want = c.join(p, col("cu") === col("pu"))
      .where(col("pts") >= col("cts") &&
        col("pts") <= col("cts") + expr("INTERVAL 1 HOUR"))
      .select(col("cid"), col("pid"), col("cu"))
      .orderBy("pid", "cid")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSeq
    assert(got === want)
    assert(got.nonEmpty)
  }
}
