package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{CosineSimilarity, VectorFunctions}

/** The session-extensions surface: the RewriteHofCosine optimizer rule
  * (declarative HOF cosine → codegen'd kernel, result-identical) and the
  * SQL-function registry.
  */
class ExtensionsSpec extends AnyFunSuite {

  private val dir = "/root/testdata/sf0.001"

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-ext-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("hof cosine rewrites to the native expression, results bit-equal") {
    val emb = Tables.embeddings(spark, dir)
      .select("vec_id", "embedding").limit(100).cache()
    def plan = {
      val a = emb.toDF("ida", "va")
      val b = emb.toDF("idb", "vb")
      a.join(b, col("ida") === col("idb") + 1)
        .select(col("ida"),
          VectorFunctions.cosine(col("va"), col("vb")).as("sim"))
    }
    val baseline = plan.collect().map(r => r.getLong(0) -> r.getDouble(1))
      .toMap
    spark.experimental.extraOptimizations =
      Seq(graft.plans.RewriteHofCosine)
    try {
      val rewritten = plan
      assert(rewritten.queryExecution.optimizedPlan.expressions
        .exists(_.exists(_.isInstanceOf[CosineSimilarity])),
        "optimized plan must contain the native cosine expression")
      val got = rewritten.collect().map(r => r.getLong(0) -> r.getDouble(1))
        .toMap
      assert(got === baseline, "rewrite must be bit-identical here")
      // conf gate: rule present but disabled → HOF tree survives
      spark.conf.set("spark.graft.cosineRewrite", "false")
      assert(!plan.queryExecution.optimizedPlan.expressions
        .exists(_.exists(_.isInstanceOf[CosineSimilarity])))
    } finally {
      spark.conf.unset("spark.graft.cosineRewrite")
      spark.experimental.extraOptimizations = Nil
      emb.unpersist()
    }
  }

  test("registerAll exposes every custom expression to SQL") {
    GraftExtensions.registerAll(spark)
    assert(spark.sql(
      "SELECT cosine_sim_native(array(cast(1.0 as float)), " +
        "array(cast(1.0 as float)))").head.getDouble(0) === 1.0)
    assert(spark.sql("SELECT size(lsh_buckets(array(cast(0.5 as float), " +
      "cast(-0.5 as float)), 4, 3))").head.getInt(0) === 4)
    assert(spark.sql("SELECT size(minhash_signature(array(1L, 2L, 3L), 8))")
      .head.getInt(0) === 8)
    assert(spark.sql(
      "SELECT simhash_fingerprint(array(5L)) = simhash_fingerprint(array(5L, 5L))")
      .head.getBoolean(0), "duplicate tokens keep the same sign pattern")
    val nbr = spark.sql("SELECT deletion_neighborhood('ab', 1)")
      .head.getSeq[String](0).toSet
    assert(nbr === Set("ab", "a", "b"))
  }
}
