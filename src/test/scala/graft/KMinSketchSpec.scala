package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{KMinSketch, TextFunctions}

/** Typed Aggregator: k-min sketch correctness (exact bottom-k per
  * group, mergeable across partitions) and Jaccard estimation accuracy
  * against exact set similarity.
  */
class KMinSketchSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-kmin-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("sketch equals exact bottom-k per group across partitions") {
    import spark.implicits._
    val agg = new KMinSketch(8).toColumn
    val data = (1 to 4000).map(i => (i % 5, (i.toLong * 2654435761L) % 100003))
    val got = data.toDF("g", "h").repartition(7)
      .as[(Int, Long)]
      .groupByKey(_._1)
      .mapValues(_._2)
      .agg(agg.name("sketch"))
      .collect().toMap
    val expected = data.groupBy(_._1).map { case (g, rows) =>
      g -> rows.map(_._2).distinct.sorted.take(8).toArray
    }
    got.foreach { case (g, sk) =>
      assert(sk.toSeq === expected(g).toSeq, s"group $g")
    }
  }

  test("bottom-k jaccard estimate tracks exact jaccard on doc sources") {
    import spark.implicits._
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
      .select(col("source"), col("doc_id"), TextFunctions.tokens(col("text")).as("toks"))
      .select(col("source"),
        explode(TextFunctions.shinglesFromTokens(col("toks"), 2)).as("g"))
      .distinct()
    val hashed = docs.select(col("source"), xxhash64(col("g")).as("h"))
    val k = 256
    val sketches = hashed.as[(String, Long)]
      .groupByKey(_._1).mapValues(_._2)
      .agg(new KMinSketch(k).toColumn.name("sketch"))
      .collect().toMap
    val exact = docs.collect().groupBy(_.getString(0))
      .map { case (s, rows) => s -> rows.map(_.getString(1)).toSet }
    val sources = sketches.keys.toSeq.sorted
    var checked = 0
    for (a <- sources; b <- sources if a < b) {
      val est = KMinSketch.estimateJaccard(sketches(a), sketches(b), k)
      val ex = exact(a).intersect(exact(b)).size.toDouble /
        exact(a).union(exact(b)).size
      assert(math.abs(est - ex) < 0.12,
        s"$a vs $b: est $est exact $ex")
      checked += 1
    }
    assert(checked > 0)
  }

  test("registered sketch query tracks registered exact query per pair") {
    val dir = "/root/testdata/sf0.001"
    def keyed(df: org.apache.spark.sql.DataFrame, v: String) =
      df.collect()
        .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    val est = keyed(
      graft.operators.TextAnalysis.qSourceOverlap(spark, dir), "jaccard_est")
    val exact = keyed(
      graft.operators.TextAnalysis.qSourceOverlapExact(spark, dir), "jaccard")
    assert(est.keySet === exact.keySet,
      "both queries must emit the same source pairs")
    est.foreach { case (pair, e) =>
      assert(math.abs(e - exact(pair)) < 0.12, s"$pair: est $e vs ${exact(pair)}")
    }
  }
}
