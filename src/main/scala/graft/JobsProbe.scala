package graft
import org.apache.spark.sql.SparkSession

/** Jobs-per-query census: for every registered query (or the
  * SPARK_GRAFT_ONLY subset) run one warm-up execution, then one counted
  * execution with a listener tallying Spark JOBS (driver-sequenced
  * actions + their side jobs) and the wall clock. Every job launched
  * during the counted window is charged to the query — broadcast and
  * subquery jobs included — because each one is a driver-sequenced
  * latency point that multiplies under host load (the r14 verdict's
  * loaded-window balloon mechanism).
  *
  * Output: one JSON line per query to stdout +
  * SPARK_GRAFT_JOBS_OUT (default jobs_per_query.json) with
  * {"name": {"jobs": N, "sec": w}} — the optimization round's
  * action-count ledger. Diagnostic tool only: never run by the driver,
  * no effect on the Bench contract.
  */
object JobsProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val outPath = sys.env.getOrElse("SPARK_GRAFT_JOBS_OUT",
      "jobs_per_query.json")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.read.parquet(s"$sfDir/lineitem.parquet").count()
    val jobs = new java.util.concurrent.atomic.AtomicLong
    // SPARK_GRAFT_JOBS_SITES=1: also record each job's submission
    // call site (short form) so a hot row's job count can be broken
    // down to the driver actions that caused it — the §1 "where do the
    // sync points come from" question the count alone can't answer
    val dumpSites = sys.env.get("SPARK_GRAFT_JOBS_SITES").contains("1")
    val sites = java.util.Collections.synchronizedList(
      new java.util.ArrayList[String])
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        jobs.incrementAndGet()
        if (dumpSites) {
          // the result stage's name IS the action's call site (e.g.
          // "head at Classifier.scala:179"); job properties don't
          // carry it
          val cs = j.stageInfos.lastOption.map(_.name).getOrElse("?")
          sites.add(cs.takeWhile(_ != '\n')); ()
        }
      }
    }
    spark.sparkContext.addSparkListener(listener)
    def drain(): Unit = {
      // the listener bus is async and private[spark]; a short settle
      // sleep is plenty for a ±1-job census
      Thread.sleep(300)
    }
    val results = scala.collection.mutable.LinkedHashMap
      .empty[String, (Long, Double)]
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      if (SparkEntry.onlySelected(name)) {
        try {
          // warm-up: store builds / codegen / memoized fixtures land here
          fn(spark, sfDir).write.format("noop").mode("overwrite").save()
          drain()
          if (dumpSites) sites.clear()
          val j0 = jobs.get()
          val t0 = System.nanoTime()
          fn(spark, sfDir).write.format("noop").mode("overwrite").save()
          val sec = (System.nanoTime() - t0) / 1e9
          drain()
          val n = jobs.get() - j0
          results(name) = (n, sec)
          println(f"[jobs] $name%-36s jobs=$n%3d sec=$sec%7.2f")
          if (dumpSites) {
            import scala.jdk.CollectionConverters._
            sites.asScala.groupBy(identity).toSeq
              .map { case (s, xs) => (xs.size, s) }.sortBy(-_._1)
              .foreach { case (c, s) => println(f"[site] $c%3d  $s") }
          }
        } catch {
          case e: Throwable =>
            results(name) = (-1L, -1.0)
            System.err.println(s"[jobs] $name failed: ${e.getMessage}")
        }
      }
    }
    def num(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    val json = results.map { case (k, (n, s)) =>
      "\"" + k + "\":{\"jobs\":" + n + ",\"sec\":" + num(s) + "}"
    }.mkString("{", ",", "}")
    java.nio.file.Files.write(java.nio.file.Paths.get(outPath),
      (json + "\n").getBytes("UTF-8"))
    println(json.take(800))
    spark.stop()
  }
}
