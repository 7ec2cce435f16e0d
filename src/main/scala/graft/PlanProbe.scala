package graft
import org.apache.spark.sql.SparkSession

/** Plan diagnostics for one registered query: prints the formatted
  * physical plan (PushedFilters / ReadSchema / Exchange / codegen stage
  * markers) and three timed executions. Usage:
  *
  * {{{ sbt "runMain graft.PlanProbe q_dedup_minhash [/root/testdata/sf0.1]" }}}
  */
object PlanProbe {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: PlanProbe <query-name> [sfDir]")
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val fn = SparkEntry.queries.getOrElse(name,
      throw new IllegalArgumentException(
        s"unknown query $name; known: ${SparkEntry.queries.keys.toSeq.sorted}"))
    val df = fn(spark, sfDir)
    println(s"=== $name @ $sfDir ===")
    df.explain("formatted")
    val rows = df.count()
    (1 to 3).foreach { i =>
      val t0 = System.nanoTime()
      // full materialization, same as Bench — count() would let Catalyst
      // prune projection-only columns and under-time kernel queries
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      println(
        f"[probe] run $i: ${(System.nanoTime() - t0) / 1e9}%.2f s ($rows rows)")
    }
    spark.stop()
  }
}
