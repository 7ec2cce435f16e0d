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

  test("look-alike HOF trees over the wrong variables do NOT rewrite") {
    import org.apache.spark.sql.Column
    val emb = Tables.embeddings(spark, dir)
      .select("vec_id", "embedding").limit(10)
      .toDF("ida", "va")
      .withColumn("vb", col("va"))
    // same quotient shape as cosine, but the numerator multiplies x*x
    // (sum of a's squares) — silently rewriting this to cosine(a,b)
    // would return a different number
    def sumSq(a: Column, b: Column): Column =
      aggregate(zip_with(a, b, (x, _) => x.cast("double") * x.cast("double")),
        lit(0.0), (acc, v) => acc + v)
    // and a merge lambda folding v+v instead of acc+v
    def badMerge(a: Column, b: Column): Column =
      aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
        lit(0.0), (_, v) => v + v)
    spark.experimental.extraOptimizations =
      Seq(graft.plans.RewriteHofCosine)
    try {
      // scan EVERY node's expressions: the optimizer pushes this Project
      // below the GlobalLimit, and root-only `.expressions` misses it
      def rewritten(c: Column): Boolean =
        emb.select(c.as("r")).queryExecution.optimizedPlan
          .collect { case p => p.expressions }.flatten
          .exists(_.exists(_.isInstanceOf[CosineSimilarity]))
      val norms = VectorFunctions.norm(col("va")) *
        VectorFunctions.norm(col("vb"))
      // positive control first — the genuine tree must rewrite, so the
      // negative assertions below can't pass vacuously
      assert(rewritten(VectorFunctions.cosine(col("va"), col("vb"))))
      assert(!rewritten(sumSq(col("va"), col("vb")) / norms),
        "x*x numerator must not rewrite")
      assert(!rewritten(badMerge(col("va"), col("vb")) / norms),
        "v+v merge must not rewrite")
    } finally {
      spark.experimental.extraOptimizations = Nil
    }
  }

  test("deletion neighborhood deletes by code point, not UTF-16 unit") {
    GraftExtensions.registerAll(spark)
    val s = "a😀b" // a😀b — the emoji is one surrogate PAIR
    val nbr = spark.sql(s"SELECT deletion_neighborhood('$s', 1)")
      .head.getSeq[String](0).toSet
    // one deletion removes the WHOLE astral char (matching levenshtein's
    // code-point counting); unit-stepping would emit lone surrogates
    assert(nbr === Set(s, "😀b", "ab", "a😀"))
  }

  test("ann top-k rewrite injects a bucket filter, opt-in, recall bounded") {
    import graft.functions.LshBucketMatch
    import org.apache.spark.sql.catalyst.plans.logical
    val emb = Tables.embeddings(spark, dir)
      .select("vec_id", "embedding").cache()
    val queryVec = emb.filter(col("vec_id") === 0)
      .select("embedding").head.getSeq[Float](0).toArray
    // the withColumn + orderBy(attr).limit shape users actually write
    def q = emb
      .withColumn("sim", graft.functions.CosineSimilarity.cosineNative(
        spark, col("embedding"), lit(queryVec)))
      .orderBy(col("sim").desc).limit(10)
    def bucketFiltered(p: org.apache.spark.sql.DataFrame): Boolean =
      p.queryExecution.optimizedPlan
        .collect { case f: logical.Filter => f.condition }
        .exists(_.exists(_.isInstanceOf[LshBucketMatch]))
    val exact = q.collect().map(_.getLong(0))
    spark.experimental.extraOptimizations = Seq(graft.plans.RewriteAnnTopK)
    try {
      // default-off: approximate rewrites must be explicit opt-ins
      assert(!bucketFiltered(q), "rule must be inert without the conf")
      spark.conf.set("spark.graft.annRewrite", "true")
      assert(bucketFiltered(q), "bucket filter must appear under the sort")
      val approx = q.collect().map(_.getLong(0))
      // the query vector itself shares every bucket with itself
      assert(approx.head === 0L, "self-match must survive pruning")
      val recall = approx.toSet.intersect(exact.toSet).size.toDouble /
        exact.length
      assert(recall >= 0.3, s"recall $recall below the 16x6 OR-floor")
      // inline-expression sort key (no alias) must also rewrite
      def qInline = emb.orderBy(graft.functions.CosineSimilarity
        .cosineNative(spark, col("embedding"), lit(queryVec)).desc).limit(5)
      assert(bucketFiltered(qInline))
      // fixed-point safety, directly: re-applying the rule to an
      // already-rewritten plan must be the identity (the optimizer runs
      // custom rules inside a fixed-point batch)
      val once = q.queryExecution.optimizedPlan
      assert(graft.plans.RewriteAnnTopK(once) === once,
        "second application must not inject a second filter")
    } finally {
      spark.conf.unset("spark.graft.annRewrite")
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
    // jaro: the textbook record-linkage values (Winkler's own examples).
    // Expected values follow the kernel's (m/|a| + m/|b| + (m-t)/m)/3
    // evaluation order — one ulp off the correctly-rounded rational,
    // exactly as DuckDB's implementation also computes them (the parity
    // property the driver hash check relies on)
    assert(spark.sql("SELECT jaro_sim('martha', 'marhta')")
      .head.getDouble(0) === (1.0 + 1.0 + 5.0 / 6.0) / 3.0)
    assert(spark.sql("SELECT jaro_sim('dixon', 'dicksonx')")
      .head.getDouble(0) === (4.0 / 5.0 + 4.0 / 8.0 + 1.0) / 3.0)
    assert(spark.sql("SELECT jaro_sim('abc', 'abc')").head.getDouble(0) === 1.0)
    assert(spark.sql("SELECT jaro_sim('abc', '')").head.getDouble(0) === 0.0)
    assert(spark.sql("SELECT jaro_sim('abc', 'xyz')").head.getDouble(0) === 0.0)
    assert(spark.sql("SELECT jaro_sim('crate', 'trace') = " +
      "jaro_sim('trace', 'crate')").head.getBoolean(0), "jaro is symmetric")
    // 32-bit md5 variant: high 32 bits clear, single-token fp equals
    // the big-endian packing of the token's first 4 digest bytes
    val md5fp = spark.sql("SELECT simhash_md5_fingerprint(array('x'))")
      .head.getLong(0)
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest("x".getBytes("UTF-8"))
    val expected = (((d(0) & 0xff) << 24) | ((d(1) & 0xff) << 16) |
      ((d(2) & 0xff) << 8) | (d(3) & 0xff)).toLong & 0xFFFFFFFFL
    assert(md5fp === expected)
    // 6-slot counter array: "a a" → 2 tokens, 1 distinct, 1 bigram
    // occurring once (ppm 1e6)
    assert(spark.sql("SELECT repetition_stats(array('a', 'a'))")
      .head.getSeq[Long](0) === Seq(2L, 1L, 1L, 0L, 1L, 1000000L))
    // NFC: decomposed e + U+0301 collapses to one codepoint; already-NFC
    // input is the identity. Literal codepoints, not chr(): Spark's chr
    // is mod-256 ASCII, unlike DuckDB's full-unicode chr
    assert(spark.sql("SELECT length(graft_nfc('é'))")
      .head.getInt(0) === 1)
    assert(spark.sql("SELECT graft_nfc('plain') = 'plain'")
      .head.getBoolean(0))
    assert(spark.sql("SELECT graft_nfc('é') = 'é'")
      .head.getBoolean(0), "must produce the precomposed form")
  }
}
