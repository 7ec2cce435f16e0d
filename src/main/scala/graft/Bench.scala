package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main: times every SparkEntry query on SPARK_GRAFT_SF_DIR and
  * prints ONE JSON line (also written to SPARK_GRAFT_BENCH_OUT — the
  * stdout line gets buried in sbt [info] noise, so the file is the
  * machine-durable copy).
  *
  * Env knobs:
  *  - SPARK_GRAFT_SF_DIR   data dir (default sf0.1)
  *  - SPARK_GRAFT_CPUS     local[N] parallelism (default 32 — the
  *                         driver contract benches at local[32])
  *  - SPARK_GRAFT_ITERS    iterations per query (default 3; the
  *                         reported per-query number is the median,
  *                         which cancels this shared host's 2-3× noise)
  *  - SPARK_GRAFT_ONLY     comma-separated query-name filter (local
  *                         iteration aid; unset = full suite)
  *  - SPARK_GRAFT_BENCH_OUT file for the JSON line (default
  *                         bench_latest.json in the cwd)
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val iters = sys.env.getOrElse("SPARK_GRAFT_ITERS", "3").toInt
    val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT",
      "bench_latest.json")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // session warm-up (parquet footers, scan codegen, JIT) so the first
    // timed query isn't charged ~5s of one-time session cost
    spark.read.parquet(s"$sfDir/lineitem.parquet").count()
    def time(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame)
        : Double = {
      val t0 = System.nanoTime()
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    // Fixed noise anchor: a trivial groupBy-sum untouched since round 1,
    // timed every run regardless of the ONLY filter. The shared bench
    // host shows 2-3× load swings between rounds; cross-round comparisons
    // divide by the anchor to normalize a loaded-host sample instead of
    // adjudicating it by probe.
    val AnchorQuery = "q_agg_sum"
    val anchorSamples = SparkEntry.queries.get(AnchorQuery).toSeq
      .flatMap(fn => (1 to math.max(iters, 3)).flatMap(_ =>
        // a broken anchor must not take the whole bench down — the suite
        // numbers still matter without it (anchor clause just drops out)
        scala.util.Try(time(fn)).toOption))
    val queries = SparkEntry.queries
      .filter { case (name, _) => SparkEntry.onlySelected(name) }
    // iteration 1 is cold (fresh codegen per plan); medians over
    // `iters` runs are the reported numbers
    val samples: Map[String, Seq[Double]] = queries.map { case (name, fn) =>
      name -> (1 to iters).map { _ =>
        // a failed query must be visible in the JSON, not reported as a
        // fast success: -1 marks failure (stderr carries the cause)
        try {
          // Materialize EVERY output column: `count()` lets Catalyst prune
          // projection-only expressions (a per-row-kernel query like the
          // PII scrub measured 0.28 s via count() vs 1.98 s end-to-end),
          // so the timed action is a noop-format write — full execution,
          // zero sink cost, same thing Verify's parquet write exercises.
          time(fn)
        } catch {
          case e: Throwable =>
            System.err.println(s"[bench] $name failed: ${e.getMessage}")
            -1.0
        }
      }
    }
    def median(xs: Seq[Double]): Double = {
      val s = xs.sorted
      s(s.length / 2)
    }
    val meds = samples.map { case (k, v) =>
      k -> (if (v.exists(_ < 0)) -1.0 else median(v))
    }
    // with 3 iters on a noisy shared host, min is the stabler point
    // estimate — report it alongside the median, never instead of it
    val mins = samples.map { case (k, v) =>
      k -> (if (v.exists(_ < 0)) -1.0 else v.min)
    }
    // Locale.ROOT: the default-locale `f` interpolator renders a comma
    // decimal separator on e.g. German JVMs — invalid JSON
    def num(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    val qs = meds.map { case (k, v) => "\"" + k + "\":" + num(v) }
      .mkString("{", ",", "}")
    val colds = samples.map { case (k, v) => "\"" + k + "\":" + num(v.head) }
      .mkString("{", ",", "}")
    // -1 sentinels mark failures; keep them out of the headline total
    // and surface the failure count instead of shrinking the metric
    val ok = meds.values.filter(_ >= 0)
    val total = if (ok.nonEmpty) ok.sum else 0.0
    val coldTotal = samples.values.map(_.head).filter(_ >= 0).sum
    val minTotal = mins.values.filter(_ >= 0).sum
    val failed = meds.values.count(_ < 0)
    val anchorClause =
      if (anchorSamples.isEmpty) ""
      else s""""anchor":{"query":"$AnchorQuery",""" +
        s""""median":${num(median(anchorSamples))},""" +
        s""""min":${num(anchorSamples.min)}},"""
    // stdout gets ONLY the contract fields, and within a hard byte budget:
    // the driver keeps a 2000-char tail of the output (BENCH_r01/r02 both
    // show tail len == 2000) and sbt appends its own ~80-char [success]
    // line after ours, so any stdout line over ~1.9 KB loses its HEAD —
    // exactly the "parsed": null failure of rounds 1 and 2 (an 80-query
    // map alone is ~2.3 KB). Emit the biggest-cost queries first and fold
    // the remainder into an "elided" summary once the budget is reached;
    // the full per-query map (and cold samples) goes to the file, which
    // has no size constraint.
    val budget = 1600
    // stdout carries only the sf basename — an arbitrarily long data-dir
    // path would inflate the fixed header past the 2000-char tail even
    // with zero kept entries; the full path is in the file JSON
    val sfName = java.nio.file.Paths.get(sfDir).getFileName.toString
    val header =
      s"""{"metric":"total","value":${num(total)},"unit":"sec",""" +
        s""""min_total":${num(minTotal)},$anchorClause""" +
        s""""failed":$failed,"iters":$iters,"sf":"$sfName","queries":{"""
    val trailerMax = // worst-case elided clause + closing braces
      s""""},"elided":{"count":${meds.size},"sec":${num(total)}}}""".length
    val entries = meds.toSeq.sortBy { case (_, v) => -v }
      .map { case (k, v) => ("\"" + k + "\":" + num(v), v) }
    var used = header.length + trailerMax
    val kept = entries.takeWhile { case (e, _) =>
      val fits = used + e.length + 1 <= budget
      if (fits) used += e.length + 1
      fits
    }
    val elided = entries.drop(kept.size)
    // count and sec both cover successes only — failures are already
    // surfaced by the top-level "failed" field, and a -1 sentinel inside
    // either aggregate would misstate the elided cost
    val elidedOk = elided.filter(_._2 >= 0)
    val elidedClause =
      if (elided.isEmpty) ""
      else s""","elided":{"count":${elidedOk.size},""" +
        s""""sec":${num(elidedOk.map(_._2).sum)}}"""
    val json = header + kept.map(_._1).mkString(",") + "}" +
      elidedClause + "}"
    val minsJson = mins.map { case (k, v) => "\"" + k + "\":" + num(v) }
      .mkString("{", ",", "}")
    // tie the artifact to the code revision that produced it (file copy
    // only — stdout has a byte budget); absent git → field omitted
    val commitClause = (try {
      val p = new ProcessBuilder("git", "rev-parse", "HEAD").start()
      val out = new String(p.getInputStream.readAllBytes(), "UTF-8").trim
      if (p.waitFor() == 0 && out.matches("[0-9a-f]{7,40}")) Some(out)
      else None
    } catch { case _: Throwable => None })
      .map(h => s""""commit":"$h",""").getOrElse("")
    val fileJson =
      s"""{"metric":"total","value":${num(total)},"unit":"sec",""" +
        s""""min_total":${num(minTotal)},$anchorClause$commitClause""" +
        s""""failed":$failed,"iters":$iters,"cold_total":${num(coldTotal)},""" +
        s""""cold":$colds,"queries":$qs,"mins":$minsJson,"sf":"$sfDir"}"""
    println(json)
    java.nio.file.Files.write(java.nio.file.Paths.get(outPath),
      (fileJson + "\n").getBytes("UTF-8"))
    spark.stop()
  }
}
