package graft
import org.apache.spark.sql.SparkSession

/** Batch `explain("formatted")` dump for the optimization-round plan
  * receipts: one file per query under the given directory. Usage:
  *
  * {{{ sbt "runMain graft.PlansDump plans/r16 _after q_a q_b ..." }}}
  *
  * Diagnostic tool only — never run by the driver. Queries with side
  * effects (store builds, snapshot commits) execute them while the
  * plan is constructed, exactly as Bench/Verify would.
  */
object PlansDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3,
      "usage: PlansDump <outDir> <suffix> <query> [<query>…]")
    val outDir = java.nio.file.Paths.get(args(0))
    val suffix = args(1)
    java.nio.file.Files.createDirectories(outDir)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
      "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    args.drop(2).foreach { name =>
      val fn = SparkEntry.queries.getOrElse(name,
        throw new IllegalArgumentException(s"unknown query $name"))
      val df = fn(spark, sfDir)
      val txt = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      java.nio.file.Files.writeString(
        outDir.resolve(s"$name$suffix.txt"), txt)
      println(s"[plans] wrote $name$suffix.txt (${txt.length} chars)")
    }
    spark.stop()
  }
}
