package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // SPARK_GRAFT_ONLY: comma-separated name filter for local iteration
    // (also filters the oracle dump so check_parity sees a closed set);
    // unset = the full registry, which is what the driver runs
    SparkEntry.queries
      .filter { case (name, _) => SparkEntry.onlySelected(name) }
      .foreach { case (name, fn) =>
        try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
          .parquet(s"$outDir/$name")
        catch { case e: Throwable =>
          System.err.println(s"[verify] $name failed: ${e.getMessage}")
          // A failed query must surface as an explicit red row in the
          // driver's correctness report, not vanish from it (round 5
          // silently dropped 6 regressed queries this way): write a
          // 1-row marker whose schema can never match any oracle, so
          // the compare records rows/schema/hash = false for this name.
          try {
            import spark.implicits._
            Seq(("" + e.getMessage).take(500)).toDF("__query_failed")
              .coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name")
          } catch { case _: Throwable => () }
        }
      }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    // {GRAFT_OUT_DIR} → this dump directory: lets an oracle join against
    // results materialized by THIS run (q_knn_recall reads the ANN lists
    // it scores — the lists are Spark-specific, the recall arithmetic is
    // what DuckDB verifies). Absolute path so the checker's cwd is moot.
    val outAbs = Paths.get(outDir).toAbsolutePath.toString
    val json = SparkEntry.oracleSql
      .filter { case (k, _) => SparkEntry.onlySelected(k) }
      .map { case (k, v) =>
        s"${q(k)}: ${q(v.replace("{GRAFT_OUT_DIR}", outAbs))}"
      }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
