package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.plans.Layout

/** Physical-layout utilities: bucketed joins must not shuffle; salted
  * joins must equal their plain equivalents on skewed data.
  */
class LayoutSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-layout-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.warehouse.dir",
      Files.createTempDirectory("graft-wh").toString)
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  /** Drop the table and its location — a shared-JVM session from another
    * suite may use the default warehouse where an earlier run left
    * orphaned directories (in-memory catalog forgets tables across runs,
    * so overwrite alone hits LOCATION_ALREADY_EXISTS).
    */
  private def dropHard(table: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS $table")
    val wh = java.net.URI.create(
      spark.conf.get("spark.sql.warehouse.dir")).getPath
    val dir = new java.io.File(wh, table)
    if (dir.exists()) {
      dir.listFiles().foreach(_.delete())
      dir.delete()
    }
  }

  test("bucketed tables join without a shuffle exchange") {
    import spark.implicits._
    dropHard("b_orders"); dropHard("b_lineitem")
    val orders = Tables.orders(spark, "/root/testdata/sf0.001")
    val lineitem = Tables.lineitem(spark, "/root/testdata/sf0.001")
    Layout.writeBucketed(orders, "b_orders", "o_orderkey", 8)
    Layout.writeBucketed(
      lineitem.withColumnRenamed("l_orderkey", "o_orderkey"),
      "b_lineitem", "o_orderkey", 8)
    val joined = spark.sql(
      """SELECT /*+ MERGE(b_orders) */ o.o_orderkey, l.l_quantity
        |FROM b_orders o JOIN b_lineitem l USING (o_orderkey)""".stripMargin)
    joined.collect() // finalize AQE
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"),
      s"bucketed join must not shuffle:\n${plan.take(3000)}")
    assert(joined.count() === lineitem.count())
  }

  test("salted join equals plain join on skewed keys") {
    import spark.implicits._
    // 90% of the large side lands on one hot key
    val large = (1 to 5000).map(i =>
      (if (i % 10 == 0) i.toLong % 40 else 7L, s"row$i")).toDF("k", "payload")
    val small = (0L to 40L).map(k => (k, s"dim$k")).toDF("k", "name")
    val plain = large.join(small, Seq("k"), "inner")
      .collect().map(_.toSeq).toSet
    val salted = Layout.saltedJoin(large, small, "k", 8)
      .collect().map(_.toSeq).toSet
    assert(salted === plain)
    assert(plain.nonEmpty)
  }

  test("salted join preserves a user column named _salt0") {
    import spark.implicits._
    // the working column must dodge existing names, not overwrite them
    val large = (1 to 100).map(i => (i.toLong % 5, s"u$i"))
      .toDF("k", "_salt0")
    val small = (0L to 4L).map(k => (k, s"dim$k")).toDF("k", "name")
    val out = Layout.saltedJoin(large, small, "k", 4)
    assert(out.columns.toSeq.sorted === Seq("_salt0", "k", "name"))
    assert(out.count() === 100)
  }

  test("runtime bloom filter prunes the probe side of a selective join") {
    // The 100 TB lever this pins: a selective dimension filter induces a
    // bloom filter on the fact side BEFORE the join shuffle, so the
    // exchange carries only probable matches. Spark injects it when the
    // application side is big enough — thresholds are lowered here so
    // the fixture-sized join demonstrates the same plan the full-size
    // job would get.
    val confs = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100MB",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val d = "/root/testdata/sf0.001"
      val li = Tables.lineitem(spark, d)
      val ord = Tables.orders(spark, d)
        .filter(col("o_orderpriority") === "1-URGENT")
      val joined = li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderpriority").count()
      val physical = joined.queryExecution.executedPlan.toString
      assert(physical.contains("might_contain"),
        "fact-side scan must carry the runtime bloom probe")
      // and the filter must not change results vs the plain join
      spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "false")
      val plain = li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderpriority").count().collect().toSet
      spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
      assert(joined.collect().toSet === plain)
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("AQE splits a skewed partition at runtime (skew=true in final plan)") {
    import spark.implicits._
    // The other 100 TB skew lever: salting rewrites the QUERY; AQE skew
    // join rewrites the RUNTIME plan from actual shuffle sizes. Pinned
    // here with thresholds scaled to fixture data — the full-size job
    // gets the same split from the same mechanics.
    val confs = Seq(
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1.0",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "8KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "8KB",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val pad = "x" * 200
      val large = (1 to 20000).map(i =>
        (if (i % 20 == 0) i.toLong % 40 else 7L, s"$pad$i"))
        .toDF("k", "payload")
      val small = (0L to 40L).map(k => (k, s"dim$k")).toDF("k", "name")
      // keep the payload alive through the join so column pruning can't
      // shrink the skewed shuffle below the detection threshold
      val joined = large.join(small, Seq("k"))
        .groupBy("name")
        .agg(count(lit(1)).as("n"), max(length(col("payload"))).as("w"))
      val rows = joined.collect()
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"AQE must mark the skewed join:\n${plan.take(3000)}")
      assert(rows.map(_.getLong(1)).sum === 20000L)
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("hive-partitioned write prunes partitions at the scan") {
    // The layout decision that matters first at 100 TB: partition the
    // corpus on the column queries filter by, and the scan never lists
    // the other partitions' files. Pinned end to end: write
    // partitionBy(lang), read with a lang filter, assert the filter
    // lands in PartitionFilters (metadata pruning) rather than as a
    // row-level PushedFilter.
    val dir = Files.createTempDirectory("graft-part").toString
    Tables.documents(spark, "/root/testdata/sf0.001")
      .write.mode("overwrite").partitionBy("lang").parquet(dir)
    val scan = spark.read.parquet(dir).filter(col("lang") === "en")
    val plan = scan.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") &&
      plan.replaceAll("\\s+", " ")
        .matches("(?s).*PartitionFilters: \\[[^\\]]*lang[^\\]]* = en[^\\]]*\\].*"),
      s"lang filter must prune partitions:\n${plan.take(2000)}")
    val expected = Tables.documents(spark, "/root/testdata/sf0.001")
      .filter(col("lang") === "en").count()
    assert(scan.count() === expected)
  }

  test("training shards: fixed sizes, one file each, reproducible order") {
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "text")
    val out = java.nio.file.Files
      .createTempDirectory("graft-shards").toString
    val manifest = Layout
      .writeTrainingShards(docs, "doc_id", out, rowsPerShard = 64L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val n = docs.count()
    assert(manifest.length === n)
    // shard = pos div 64; sizes are exactly 64 with one remainder shard
    manifest.foreach { case (_, pos, sid) => assert(sid === pos / 64) }
    val sizes = manifest.groupBy(_._3).view.mapValues(_.length).toMap
    val full = sizes.values.count(_ == 64)
    assert(full >= sizes.size - 1, s"at most one ragged shard: $sizes")
    assert(sizes.values.sum === n.toInt)
    // exactly one parquet file per shard directory
    val shardDirs = new java.io.File(out).listFiles()
      .filter(_.getName.startsWith("shard_id="))
    assert(shardDirs.length === sizes.size)
    shardDirs.foreach { dir =>
      val files = dir.listFiles().filter(_.getName.endsWith(".parquet"))
      assert(files.length === 1, s"${dir.getName} must hold one file")
    }
    // round trip: the written corpus is the corpus, shuffled not lost
    val back = spark.read.parquet(out)
    assert(back.count() === n)
    assert(back.select("doc_id").collect().map(_.getLong(0)).sorted
      === docs.select("doc_id").collect().map(_.getLong(0)).sorted)
    // determinism: a second export yields the identical manifest
    val out2 = java.nio.file.Files
      .createTempDirectory("graft-shards2").toString
    val again = Layout
      .writeTrainingShards(docs, "doc_id", out2, rowsPerShard = 64L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(again.sortBy(_._1).toSeq === manifest.sortBy(_._1).toSeq)
  }

  test("salted join spreads a hot key of IDENTICAL rows across salts") {
    import spark.implicits._
    // all rows byte-identical — a value-hash salt would collapse to one
    val large = (1 to 2000).map(_ => (7L, "same")).toDF("k", "payload")
      .repartition(4)
    val salts = large
      .withColumn("_salt", pmod(monotonically_increasing_id(), lit(8L)))
      .select("_salt").distinct().count()
    assert(salts === 8, s"expected the hot key spread over 8 salts, got $salts")
  }

  test("z-order collapses per-file spans on BOTH columns; single sort on one") {
    val li = Tables.lineitem(spark, "/root/testdata/sf0.001")
      .select("l_orderkey", "l_partkey", "l_quantity")
    // per-file min/max span of a column, averaged over files — the
    // quantity parquet footer pruning keys on: a reader filtering
    // `col = x` skips every file whose [min,max] misses x
    def avgSpan(path: String, c: String): Double = {
      val spans = spark.read.parquet(path)
        .groupBy(input_file_name().as("f"))
        .agg((max(c) - min(c)).cast("double").as("span"))
        .collect().map(_.getAs[Double]("span"))
      spans.sum / spans.length
    }
    val full = li.agg(
      (max("l_orderkey") - min("l_orderkey")).cast("double"),
      (max("l_partkey") - min("l_partkey")).cast("double")).collect()(0)
    val (okRange, pkRange) = (full.getDouble(0), full.getDouble(1))

    val zDir = Files.createTempDirectory("graft-zorder").toString
    val sDir = Files.createTempDirectory("graft-singlesort").toString
    Layout.writeZOrdered(li, zDir, "l_orderkey", "l_partkey", files = 16)
    li.repartitionByRange(16, col("l_orderkey"))
      .sortWithinPartitions("l_orderkey")
      .write.mode("overwrite").parquet(sDir)

    // same rows either way
    assert(spark.read.parquet(zDir).count() === li.count())
    // single sort: near-perfect on the sort key, NO clustering on the
    // other (every file spans ~the full partkey range)
    assert(avgSpan(sDir, "l_orderkey") < okRange / 8)
    assert(avgSpan(sDir, "l_partkey") > pkRange * 0.8)
    // z-order: BOTH columns clustered — every file covers a fraction of
    // each range, so either predicate prunes most files
    assert(avgSpan(zDir, "l_orderkey") < okRange / 2)
    assert(avgSpan(zDir, "l_partkey") < pkRange / 2)
  }
}
