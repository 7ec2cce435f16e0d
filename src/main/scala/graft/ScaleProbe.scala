package graft
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** 10x scale probe: replicate sf0.1 inputs in-memory (ids offset per
  * replica so keys stay distinct where needed) and run the heaviest
  * plan shapes. Not a fixture generator — evidence for the scale-up
  * claims in BASELINE.md.
  */
object ScaleProbe {
  // substring filter via args: `runMain graft.ScaleProbe editdist` runs
  // only matching probes (empty args = all)
  private var only: Array[String] = Array.empty
  def t[A](name: String)(f: => A): Unit =
    if (only.isEmpty || only.exists(name.contains)) {
      val t0 = System.nanoTime(); val r = f
      println(f"[scale] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s -> $r")
    }
  def replicate(df: DataFrame, n: Int, idCols: Seq[String], offset: Long): DataFrame =
    (0 until n).map { i =>
      idCols.foldLeft(df)((d, c) => d.withColumn(c, col(c) + lit(i * offset)))
    }.reduce(_ unionByName _)

  /** Shared probe plumbing — the stage-attribution pattern every scale
    * probe repeats (one instance per probe block, added/removed around
    * the timed work): (stageId, duration) per task so a straggler
    * attributes to its stage, plus the stage's name and its graft
    * call-site line where one exists ("skew 52.7" alone says nothing
    * about where the long pole lives).
    */
  private final class TaskStatsListener
      extends org.apache.spark.scheduler.SparkListener {
    val tasks = new java.util.concurrent.ConcurrentLinkedQueue[(Int, Long)]()
    val stages = new java.util.concurrent.ConcurrentHashMap[Int, String]()
    override def onTaskEnd(
        te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
      if (te.taskInfo != null)
        tasks.add((te.stageId, te.taskInfo.duration))
      ()
    }
    override def onStageSubmitted(
        ss: org.apache.spark.scheduler.SparkListenerStageSubmitted): Unit = {
      stages.put(ss.stageInfo.stageId,
        ss.stageInfo.name.takeWhile(_ != '(').trim + " " +
          ss.stageInfo.details.linesIterator
            .find(_.contains("graft")).getOrElse("").trim)
      ()
    }
    def clear(): Unit = { tasks.clear(); stages.clear() }
  }

  /** Listener delivery is async (r13 ADVICE low — a fixed sleep both
    * inflated timed walls and dropped stragglers): poll until `size`
    * has been stable for three 200 ms ticks.
    */
  private def drainStable(size: () => Int): Unit = {
    var last = -1; var stable = 0
    while (stable < 3) {
      Thread.sleep(200)
      val c = size()
      if (c == last) stable += 1 else { stable = 0; last = c }
    }
  }

  /** The `top` worst stages by max task: (stageId, max, med, n). */
  private def worstStages(l: TaskStatsListener, top: Int)
      : Seq[(Int, Long, Long, Int)] = {
    import scala.jdk.CollectionConverters._
    l.tasks.asScala.toSeq.groupBy(_._1).map { case (sid, ts) =>
      val s = ts.map(_._2).sorted
      (sid, s.last, s(s.length / 2), s.length)
    }.toSeq.sortBy(-_._2).take(top)
  }

  /** Window-quality stamp for the explicit probes' receipts — the
    * same Spark-free cpu spin + 64 MB page-cache parquet read the
    * bench anchors use (quiet bands on this host: cpu ≈ 0.10-0.12 s,
    * io ≈ 0.02-0.05 s; see Bench.scala). A probe wall means little
    * without the window it ran in (the ann1m brute-force baseline
    * measured 23.2 s and 46.6 s across two runs of IDENTICAL code) —
    * stamping start AND end lets a reader discount a loaded run the
    * way the sweep's anchor tracks do. First call self-warms (JIT +
    * page cache), mirroring the bench's discarded cold samples.
    */
  @volatile private var stampSink = 0L
  private def cpuStamp(): Double = {
    val t0 = System.nanoTime()
    var h = 1125899906842597L
    var i = 0
    while (i < 100000000) { h = h * 31 + i; i += 1 }
    stampSink = h
    (System.nanoTime() - t0) / 1e9
  }
  private def ioStamp(): Option[Double] = {
    val d = new java.io.File("/root/testdata/sf0.1")
    val entries = Option(d.listFiles()).getOrElse(Array.empty)
    val file = (entries.filter(f =>
      f.isFile && f.getName.endsWith(".parquet") && f.length() > 0) ++
      entries.filter(f => f.isDirectory && f.getName.endsWith(".parquet"))
        .flatMap(dir => Option(dir.listFiles()).getOrElse(Array.empty))
        .filter(f => f.isFile && f.getName.endsWith(".parquet") &&
          f.length() > 0)).sortBy(-_.length()).headOption
    file.map { f =>
      val t0 = System.nanoTime()
      val ch = java.nio.channels.FileChannel.open(f.toPath,
        java.nio.file.StandardOpenOption.READ)
      try {
        val buf = java.nio.ByteBuffer.allocate(1 << 20)
        var left = 64L << 20
        var acc = 0L
        while (left > 0) {
          buf.clear()
          val n = ch.read(buf)
          if (n < 0) ch.position(0L) // wrap: always price a full 64 MB
          else {
            var i = 0
            while (i < n) { acc ^= buf.get(i).toLong << (i % 8); i += 8 }
            left -= n
          }
        }
        stampSink ^= acc
      } finally ch.close()
      (System.nanoTime() - t0) / 1e9
    }
  }
  private lazy val stampWarm: Unit = {
    cpuStamp(); scala.util.Try(ioStamp()); ()
  }
  private def windowStamp(tag: String): Unit = {
    stampWarm
    val cpu = cpuStamp()
    val io = scala.util.Try(ioStamp()).toOption.flatten
    // single-threaded latency stamps are BLIND to aggregate-bandwidth
    // contention (a co-runner eating half the cores leaves them in
    // band while a 32-thread probe runs ~2× slow — observed on the
    // minhash5m validation run: quiet stamps, 15.0 loadavg); the
    // 1/5/15-min load averages carry that signal
    val load = scala.util.Try(
      java.nio.file.Files.readString(
        java.nio.file.Path.of("/proc/loadavg"))
        .split(" ").take(3).mkString("/")).getOrElse("n/a")
    println(f"[scale] window $tag: cpu=${cpu}%.3fs io=${
      io.map(v => f"$v%.3fs").getOrElse("n/a")} loadavg=$load/${
      Runtime.getRuntime.availableProcessors}cores")
  }

  /** The shared receipt shape: drain, pooled stats line, then the
    * worst stages. Pooled skew is CROSS-stage (tiny planning jobs vs
    * the heavy scan) — the per-stage lines carry the real skew claim.
    */
  private def printTaskStats(label: String, l: TaskStatsListener,
      top: Int = 3): Unit = {
    drainStable(() => l.tasks.size())
    import scala.jdk.CollectionConverters._
    val ds = l.tasks.asScala.map(_._2).toSeq.sorted
    val med = if (ds.isEmpty) 0L else ds(ds.length / 2)
    val mx = if (ds.isEmpty) 0L else ds.last
    println(f"[scale] $label task stats: tasks=${ds.length} " +
      f"task_med=${med}ms task_max=${mx}ms " +
      f"skew=${if (med > 0) mx.toDouble / med else 0.0}%.1f")
    worstStages(l, top).foreach { case (sid, sMax, sMed, n) =>
      println(f"[scale]   stage $sid: max=${sMax}ms med=${sMed}ms " +
        f"tasks=$n  ${l.stages.getOrDefault(sid, "?").take(120)}")
    }
  }

  def main(args: Array[String]): Unit = {
    only = args
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.1"
    val li = replicate(Tables.lineitem(spark, d), 10, Seq("l_orderkey"), 100000000L)
    val ord = replicate(Tables.orders(spark, d), 10, Seq("o_orderkey", "o_custkey"), 100000000L)
    t("agg 6M rows")(li.groupBy("l_returnflag", "l_linestatus")
      .agg(sum("l_quantity"), count(lit(1))).count())
    t("join 6M x 1.5M + agg")(li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderpriority").agg(sum("l_extendedprice")).count())
    t("window 1.5M")(ord.withColumn("rn",
      row_number().over(org.apache.spark.sql.expressions.Window
        .partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")))
      .filter(col("rn") === 1).count())
    val docs = replicate(
      Tables.documents(spark, d).select("doc_id", "text"), 10, Seq("doc_id"), 10000000L)
    // the three round-5 curation-report operators: gopher battery +
    // funnel are single-scan shapes (linear by construction — the probe
    // documents that no hidden shuffle appears at 10×); lm tiers carry
    // the unigram-LM aggregation plus the two-level global rank, the
    // shape whose scaling the multi-key prefix sum must protect
    val docsSrc = replicate(
      Tables.documents(spark, d).select("doc_id", "source", "lang", "text"),
      10, Seq("doc_id"), 10000000L)
    // force every output column through an aggregate — a bare count()
    // would let column pruning delete the very kernels being measured
    // (the repetition/shuffle-order probes set the same convention)
    t("gopher rule battery 50k docs (per-row flags)")(
      operators.Quality.gopherRules(docs)
        .agg(sum(col("keep") + col("r_word_count") + col("r_mean_word_len")
          + col("r_symbol_ratio") + col("r_stopwords") + col("r_dup_tokens")),
          sum("n_tokens")).first)
    t("quality funnel 50k docs (one agg)")(
      operators.Quality.qualityFunnel(docsSrc)
        .agg(sum(col("n_total") + col("n_len") + col("n_rep")
          + col("n_kept")), sum("keep_frac")).first)
    t("lm tiers 50k docs (unigram LM + two-level rank)")(
      operators.TextAnalysis.lmBuckets(docsSrc)
        .agg(sum("n_docs"), sum("avg_logprob")).first)
    t("unimax allocation 50k docs (one agg + #langs-row windows)")(
      operators.Sampling.langBudget(docsSrc)
        .agg(sum(col("toks") + col("alloc_tokens") + col("epochs")
          + col("budget_share"))).first)
    t("training shard export 50k docs, 1024 rows/shard (one keyed exchange + write)") {
      val dir = java.nio.file.Files
        .createTempDirectory("graft-probe-shards").toString
      plans.Layout.writeTrainingShards(docs, "doc_id", dir, 1024L).count()
    }
    // snapshot table format: 25 commits of 2k docs each, then the three
    // read paths — the log replay is driver-side (#commits tiny JSONs),
    // so read cost tracks the GROUP COUNT until compaction resets it
    // the 25-commit fixture builds ONCE: inside the timed build probe
    // when it runs, else on demand from whichever read probe needs it
    // first (a filtered run naming only a read probe must still run
    // it — its timed number then includes the one-time build, which
    // the probe name can't hide, so prefer running the build probe too)
    var snapRoot: Option[String] = None
    def snapFixture(): String = snapRoot.getOrElse {
      val root = java.nio.file.Files
        .createTempDirectory("graft-probe-snap").toString
      (0 until 25).foreach(i => plans.SnapshotStore.append(
        docs.filter(col("doc_id") % 25 === i), root))
      snapRoot = Some(root)
      root
    }
    t("snapshot store: 25 append commits of 2k docs (write + stats " +
      "sidecar each)")(snapFixture())
    t("snapshot store: latest read over 25 groups (log replay + scan)")(
      plans.SnapshotStore.read(spark, snapFixture()).count())
    t("snapshot store: pruned ranged read (stats exclude 24/25 groups)")(
      plans.SnapshotStore.readWhere(
        spark, snapFixture(), "doc_id", 0.0, 0.0).count())
    t("snapshot store: compact 25 groups -> 1, then latest read") {
      plans.SnapshotStore.compact(spark, snapFixture())
      plans.SnapshotStore.read(spark, snapFixture()).count()
    }
    // the protocol under REAL contention: 8 racing appender threads x
    // 10 commits each, with a compactor looping against them — every
    // loser of the version-slot CAS re-reads and retries, so the law
    // is (a) no lost updates (final row count = Σ appended rows even
    // though compaction rewrote the table mid-race) and (b) retry
    // count stays a small multiple of the commit count. Retry COST is
    // asymmetric by design: an append loser re-publishes one tiny
    // JSON (its data group is already safely invisible-or-added), and
    // a compactor loser ALSO only re-publishes — the "compact" commit
    // removes exactly the groups it rewrote, so concurrent appends
    // commute and never invalidate the rewrite (only a rival
    // compactor/overwrite forces a data rewrite). Spec covers the
    // protocol; this row prices it.
    t("snapshot store: 8 racing appenders x 10 commits + looping " +
      "compactor (no lost updates; commits/s + CAS retries)") {
      val root = java.nio.file.Files
        .createTempDirectory("graft-probe-snapc").toString
      val retries0 = plans.SnapshotStore.casRetries.get()
      val writers = 8; val per = 10; val rows = 2000L
      val pool = java.util.concurrent.Executors
        .newFixedThreadPool(writers + 1)
      val stopC = new java.util.concurrent.atomic.AtomicBoolean(false)
      val compactions = new java.util.concurrent.atomic.AtomicInteger(0)
      val t0 = System.nanoTime()
      val appenders = (0 until writers).map { w =>
        pool.submit(new Runnable {
          def run(): Unit = (0 until per).foreach { i =>
            plans.SnapshotStore.append(
              spark.range(rows).select(
                (col("id") + (w.toLong * per + i) * rows).as("doc_id")),
              root)
          }
        })
      }
      val compactor = pool.submit(new Runnable {
        def run(): Unit = while (!stopC.get()) {
          // only the expected pre-first-commit window is tolerated —
          // any other failure is a real protocol break and must fail
          // the probe, not be silently retried
          try {
            plans.SnapshotStore.compact(spark, root)
            compactions.incrementAndGet()
          } catch {
            case e: IllegalArgumentException
              if e.getMessage != null &&
                e.getMessage.contains("nothing to compact") => ()
          }
          Thread.sleep(100)
        }
      })
      appenders.foreach(_.get())
      stopC.set(true); compactor.get(); pool.shutdown()
      val secs = (System.nanoTime() - t0) / 1e9
      val n = plans.SnapshotStore.read(spark, root).count()
      require(n == writers.toLong * per * rows,
        s"lost updates under contention: read $n rows, " +
          s"expected ${writers.toLong * per * rows}")
      val commits = writers * per + compactions.get()
      f"$commits commits (${compactions.get()} compactions) in " +
        f"$secs%.1f s = ${commits / secs}%.1f commits/s, " +
        f"${plans.SnapshotStore.casRetries.get() - retries0} CAS retries, " +
        f"rows=$n (law holds)"
    }
    // the SAME race at 10x the commit count: without commit-log
    // checkpointing every action replays O(#commits) driver-side JSON
    // records and the CAS retry loop multiplies that — this row's law
    // is that commits/s holds FLAT vs the 80-commit row (replay cost
    // is bounded by checkpoint + ≤interval-sized suffix, so the
    // per-commit cost is the parquet write, not the log length).
    // Structural receipt alongside wall-clock (page-cached /tmp hides
    // I/O): the count of checkpoint records the run published.
    t("snapshot store: contention at 10x commits (8 appenders x 100 " +
      "+ looping compactor) — checkpointed replay keeps commits/s flat") {
      val root = java.nio.file.Files
        .createTempDirectory("graft-probe-snapc10").toString
      val retries0 = plans.SnapshotStore.casRetries.get()
      val writers = 8; val per = 100; val rows = 2000L
      val pool = java.util.concurrent.Executors
        .newFixedThreadPool(writers + 1)
      val stopC = new java.util.concurrent.atomic.AtomicBoolean(false)
      val compactions = new java.util.concurrent.atomic.AtomicInteger(0)
      val t0 = System.nanoTime()
      val appenders = (0 until writers).map { w =>
        pool.submit(new Runnable {
          def run(): Unit = (0 until per).foreach { i =>
            plans.SnapshotStore.append(
              spark.range(rows).select(
                (col("id") + (w.toLong * per + i) * rows).as("doc_id")),
              root)
          }
        })
      }
      val compactor = pool.submit(new Runnable {
        def run(): Unit = while (!stopC.get()) {
          try {
            plans.SnapshotStore.compact(spark, root)
            compactions.incrementAndGet()
          } catch {
            case e: IllegalArgumentException
              if e.getMessage != null &&
                e.getMessage.contains("nothing to compact") => ()
          }
          Thread.sleep(100)
        }
      })
      appenders.foreach(_.get())
      stopC.set(true); compactor.get(); pool.shutdown()
      val secs = (System.nanoTime() - t0) / 1e9
      val n = plans.SnapshotStore.read(spark, root).count()
      require(n == writers.toLong * per * rows,
        s"lost updates under contention: read $n rows, " +
          s"expected ${writers.toLong * per * rows}")
      val ckptStream = java.nio.file.Files.list(
        java.nio.file.Paths.get(root, "_commits"))
      val nCkpt = try {
        import scala.jdk.CollectionConverters._
        ckptStream.iterator().asScala
          .count(_.getFileName.toString.endsWith(".ckpt"))
      } finally ckptStream.close()
      val commits = writers * per + compactions.get()
      f"$commits commits (${compactions.get()} compactions, $nCkpt " +
        f"checkpoints) in $secs%.1f s = ${commits / secs}%.1f commits/s, " +
        f"${plans.SnapshotStore.casRetries.get() - retries0} CAS retries, " +
        f"rows=$n (law holds)"
    }
    // keyed MERGE / ranged DELETE with the stats-pruned touch set: the
    // 32-group key-clustered table means a narrow-key batch rewrites
    // ~1 group (survivors + batch in one new group) while the other
    // 31 keep their files untouched — the production MERGE cost
    // shape. The full-width control batch rewrites everything: the
    // describeHistory arithmetic in each row's result is the claim.
    locally {
      val root = java.nio.file.Files
        .createTempDirectory("graft-probe-snapm").toString
      // wide payload so rewrite cost is real I/O, not job overhead
      val big = spark.range(20000000)
        .select(col("id"), (col("id") % 997).as("v"),
          md5(col("id").cast("string")).as("payload"))
      t("snapshot store: clustered 20M-row base for merge probes " +
        "(32 groups)")(
        plans.SnapshotStore.appendClustered(big, root, "id", 32))
      // ONLY the operation is timed — the row-count verification
      // reads outside the timer (its cost depends on group count,
      // which would mask the rewrite asymmetry being measured)
      def cow(v: Int): String = {
        val (_, _, adds, removes) =
          plans.SnapshotStore.describeHistory(root).find(_._1 == v).get
        s"v$v rewrote $removes group(s) into $adds"
      }
      // a filtered run may select a mutation row without the build row
      // — ensure the base outside the timer then (and the row-count
      // laws only assert after the row that establishes them ran)
      def sel(name: String) = only.isEmpty || only.exists(name.contains)
      val narrowRow = "snapshot store: upsert 100k NARROW-key rows " +
        "into 20M/32 groups (stats prune -> ~1 group rewritten)"
      val deleteRow = "snapshot store: ranged delete [0, 50000] from " +
        "20M (stats prune -> ~1 group rewritten)"
      val controlRow = "snapshot store: upsert 100k FULL-WIDTH-key " +
        "rows (control — every group touched, whole table rewritten)"
      if ((sel(narrowRow) || sel(deleteRow) || sel(controlRow)) &&
        plans.SnapshotStore.describeHistory(root).isEmpty)
        plans.SnapshotStore.appendClustered(big, root, "id", 32)
      t(narrowRow)(
        cow(plans.SnapshotStore.upsert(spark,
          big.filter(col("id") < 100000).withColumn("v", col("v") + 1),
          root, "id")))
      if (sel(narrowRow))
        require(plans.SnapshotStore.read(spark, root).count() == 20000000L)
      t(deleteRow)(
        cow(plans.SnapshotStore.deleteWhere(
          spark, root, "id", 0.0, 50000.0)))
      if (sel(deleteRow))
        require(plans.SnapshotStore.read(spark, root).count() == 19949999L)
      t(controlRow)(
        cow(plans.SnapshotStore.upsert(spark,
          big.filter(col("id") % 200 === 0).withColumn("v", col("v") + 1),
          root, "id")))
    }
    // checkpoint payload headroom: a 100k-live-group checkpoint (the
    // wide-table regime) must neither produce one multi-MB JSON file
    // (sharded write caps each file) nor re-parse per action (the
    // newest-checkpoint cache makes repeat state() calls O(suffix)).
    // Groups are synthesized — state() never touches payloads, so this
    // prices the replay path without 10⁴ real commits.
    t("snapshot state() at 100k live groups (sharded ckpt: cold parse " +
      "once, then cached replays)") {
      val root = java.nio.file.Files
        .createTempDirectory("graft-ckpt-probe").toString
      val groups = (0 until 100000).map(i => "data/" + f"$i%032x")
      plans.SnapshotStore.probeWriteCheckpoint(root, 10, groups)
      plans.SnapshotStore.probeEvictCkptCache()
      val t0 = System.nanoTime()
      require(plans.SnapshotStore.probeStateLiveCount(root) == 100000)
      val cold = (System.nanoTime() - t0) / 1e6
      val t1 = System.nanoTime()
      var i = 0
      while (i < 100) {
        require(plans.SnapshotStore.probeStateLiveCount(root) == 100000)
        i += 1
      }
      val warm = (System.nanoTime() - t1) / 1e6 / 100
      f"cold parse $cold%.1f ms; cached state() $warm%.3f ms/call x100"
    }
    t("shingle index 50k docs")(Dedup.shingleIndex(docs, 3).count())
    val sh = Dedup.shingleIndex(docs, 3).persist()
    sh.count()
    t("jaccard pairs 50k docs")(Dedup.jaccardPairs(sh, 0.5).count())
    // prefix filtering vs the full self-join above: SAME output pairs,
    // candidates generated from only the rarest-(1−θ) prefix postings —
    // the exact-complete alternative to minhash banding
    t("jaccard pairs 50k docs (prefix-filtered)")(
      Dedup.verifyJaccard(
        Dedup.prefixFilterCandidates(sh, 0.5), sh, 0.5).count())
    // asymmetric containment over the same persisted index; output-driven
    // on this all-replicas corpus like every pair row here
    t("containment pairs 50k docs")(
      Dedup.containmentPairs(sh, 0.9).count())
    // signature columns must be referenced or pruning deletes the very
    // aggregator/kernel being measured (same fix as the round-5 probes)
    t("minhash sigs 50k docs (bounded-state agg)")(
      Dedup.minhashSignatures(sh, 64)
        .agg(max(element_at(col("sig"), 1))).first)
    t("minhash sigs 50k docs (collect+kernel)")(
      Dedup.minhashSignaturesKernel(sh, 64)
        .agg(max(element_at(col("sig"), 1))).first)
    sh.unpersist()
    // ~100× FLAGSHIP PROBE (r12 verdict ask #5): the full MinHash+LSH
    // near-dup pipeline (shingle → 48-hash signatures → 24×2 banding →
    // exact verify) at ≥5M docs — 1000 id-offset replicas of the sf0.1
    // corpus, each replica's TOKENS salted with its replica tag so
    // replicas are distinct texts (unchanged payloads would make every
    // base doc a 1000-clique of verbatim dups: C(1000,2) output pairs
    // per doc, a quadratic artifact of the fixture, not the algorithm —
    // the image-probe lesson). Near-dup structure is planted per
    // replica: doc_id % 17 == 0 gains a drop-3-leading-words copy, so
    // candidate and output volume scale LINEARLY with the corpus.
    // EXPLICIT-ONLY (runMain graft.ScaleProbe minhash5m): ~10 min of
    // wall is too heavy for the default sweep. Records max/median task
    // time + skew factor (max/median) + peak JVM heap alongside the
    // wall number — the evidence the 100 TB extrapolation rests on.
    if (only.exists(o => o.contains("minhash5m"))) {
      windowStamp("minhash5m start")
      val reps = 1000
      // repartition BEFORE the 1000× explode: the base corpus is one
      // parquet file (1-2 input partitions), so without this the whole
      // 530M-row generation runs in two tasks
      val base5 = Tables.documents(spark, d).select("doc_id", "text")
        .repartition(64)
      val docs5m = base5
        .select(col("doc_id"), col("text"),
          explode(expr(s"sequence(0, ${reps - 1})")).as("rep"))
        .select((col("doc_id") + col("rep") * 10000000L).as("doc_id"),
          concat_ws(" ", expr(
            "transform(split(text, ' '), w -> concat('r', rep, '_', w))"))
            .as("text"))
      val copies = docs5m.filter(pmod(col("doc_id"), lit(17)) === 0)
        .select((col("doc_id") + lit(100000000000L)).as("doc_id"),
          concat_ws(" ",
            slice(split(col("text"), " "), 4, 1000000)).as("text"))
      val corpus = docs5m.unionByName(copies)
      val tl = new TaskStatsListener
      spark.sparkContext.addSparkListener(tl)
      // STAGED timings (each stage its own [scale] row): a failure
      // names its stage, and the per-stage costs are the evidence the
      // 100 TB extrapolation actually needs. try/finally: a failing
      // stage must not leak the listener onto every later probe.
      try {
      t("minhash5m: corpus materialize (5.3M docs)")(corpus.count())
      val sh5 = Dedup.shingleIndex(corpus, 3)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      t("minhash5m: shingle index rows")(sh5.count())
      val sigs = Dedup.minhashSignatures(sh5, 48)
      t("minhash5m: 48-hash signatures (agg only)")(
        sigs.agg(max(element_at(col("sig"), 1))).first)
      val cand = Dedup.lshCandidates(sigs, bands = 24, r = 2)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      t("minhash5m: lsh banded candidates")(cand.count())
      t("minhash5m: exact verify -> pairs")(
        Dedup.verifyJaccard(cand, sh5, 0.5).count())
      // task stats OUTSIDE the timed block (r13 ADVICE low): shared
      // drain + print, plus the heap line this probe alone carries
      // (the provisioning finding lives in its BASELINE section)
      printTaskStats("minhash5m (untimed)", tl)
      println(f"[scale] minhash5m heap_used=${
        (Runtime.getRuntime.totalMemory -
          Runtime.getRuntime.freeMemory) / (1L << 20)}MB")
      sh5.unpersist(); cand.unpersist()
      windowStamp("minhash5m end")
      } finally spark.sparkContext.removeSparkListener(tl)
    }
    t("simhash fingerprints 50k docs (per-row kernel)")(
      Dedup.simhashFingerprints(docs)
        .agg(max(col("simhash"))).first)
    // perceptual image near-dup at 10×: ~50k 64×64 PPM payloads —
    // the ID SPACE is replicated 8× and each replica's image RENDERS
    // from its offset doc_id (the corpus is a pure function of id), so
    // replicas are distinct images carrying their own planted near-dup
    // copies. Replicating payloads unchanged would make every base
    // image yield 8 identical fingerprints and C(8,2)=28 hamming-0
    // cross-replica pairs per doc — quadratic in replica count and
    // swamping the planted structure this row prices. Pair volume now
    // tracks planted copies × replicas; the decode+DCT kernel is a
    // pure per-row map (zero shuffle), so the row prices kernel
    // throughput + banding join.
    t("phash 50k images (decode+DCT kernel) + hamming<=4 banded pairs") {
      import spark.implicits._
      val imgs = replicate(
        Tables.documents(spark, d).select("doc_id"), 8,
        Seq("doc_id"), 100000000L)
        .as[Long].flatMap { id =>
          val base =
            (id, graft.multimodal.Multimodal.renderImage(id, copy = false))
          if (id % 4 == 0)
            Seq(base, (id + 1000000L,
              graft.multimodal.Multimodal.renderImage(id, copy = true)))
          else Seq(base)
        }.toDF("doc_id", "payload")
      val fps = imgs.select(col("doc_id"),
        graft.functions.PHash64.fp(spark, col("payload")).as("simhash"))
        .filter(col("simhash") =!=
          lit(graft.functions.PHash64.Undecodable))
      Dedup.hammingPairs(fps, 4).count()
    }
    // audio perceptual near-dup at 10×: same discipline as the phash
    // row — replicate the ID SPACE and render each replica's clip from
    // its offset doc_id, so replicas are distinct clips carrying their
    // own planted pitched/gain-shifted copies and pair volume tracks
    // planted copies × replicas. The decode+Goertzel kernel is a pure
    // per-row map (zero shuffle); the row prices kernel throughput +
    // the banded Hamming join.
    t("ahash 50k clips (decode+Goertzel kernel) + hamming<=4 banded pairs") {
      import spark.implicits._
      val clips = replicate(
        Tables.documents(spark, d).select("doc_id"), 8,
        Seq("doc_id"), 100000000L)
        .as[Long].flatMap { id =>
          val base =
            (id, graft.multimodal.Multimodal.renderClip(id, copy = false))
          if (id % 4 == 2)
            Seq(base, (id + 1000000L,
              graft.multimodal.Multimodal.renderClip(id, copy = true)))
          else Seq(base)
        }.toDF("doc_id", "payload")
      val fps = clips.select(col("doc_id"),
        graft.functions.AHash64.fp(spark, col("payload")).as("simhash"))
        .filter(col("simhash") =!=
          lit(graft.functions.AHash64.Undecodable))
      Dedup.hammingPairs(fps, 4).count()
    }
    // video perceptual near-dup at 10×: same replicate-the-id-space
    // discipline; each replica renders an 8-frame DIB clip from its
    // offset doc_id with its own planted brightness-shifted copy. The
    // row prices container decode + 8 DCT hashes per clip (pure
    // per-row map) plus the frame-aligned banded join + median verify.
    t("vhash 50k clips (AVI DIB decode + 8 frame pHashes) + " +
      "median-hamming<=4 banded pairs") {
      import spark.implicits._
      val clips = replicate(
        Tables.documents(spark, d).select("doc_id"), 8,
        Seq("doc_id"), 100000000L)
        .as[Long].flatMap { id =>
          val base =
            (id, graft.multimodal.Multimodal.renderVideo(id, copy = false))
          if (id % 4 == 1)
            Seq(base, (id + 1000000L,
              graft.multimodal.Multimodal.renderVideo(id, copy = true)))
          else Seq(base)
        }.toDF("doc_id", "payload")
      val fps = clips.select(col("doc_id"),
        graft.functions.VHashFrames.fps(spark, col("payload")).as("fps"))
        .filter(col("fps").isNotNull)
        .select(col("doc_id"),
          posexplode(col("fps")).as(Seq("j", "simhash")))
      Dedup.vhashPairs(fps, 4).count()
    }
    val emb = replicate(
      Tables.embeddings(spark, d).select("vec_id", "embedding"), 10, Seq("vec_id"), 10000000L)
    t("ann 20k vectors")(operators.Similarity.annKnn(
      emb, col("vec_id") % 997 === 0, 5).count())
    // semantic decontamination at 10×: the round-12 plan (map-side
    // max(struct) over the broadcast-expanded frame) must scale
    // LINEARLY in the corpus at fixed eval size — the partial
    // aggregate collapses the expansion inside each scan partition,
    // so the only exchange carries corpus-cardinality rows; the
    // row_number-window plan it replaced shuffled the full product
    // and was session-pressure-sensitive (11.3 s vs 0.8 s across r11
    // sweeps at ONE sf). Eval side = the %10 slice of the BASE ids
    // only (replicas keep the eval set fixed as the corpus grows,
    // the production shape: benchmarks don't grow with the crawl).
    t("semantic decontamination 20k vectors x fixed 200-row eval " +
      "(max-struct aggregate, no window)")(
      operators.Similarity.semanticContamination(
        emb, col("vec_id") % 10 === 0 && col("vec_id") < 10000000L,
        operators.Similarity.SemanticContamThreshold)
        .agg(sum(col("sim") + col("flagged")),
          sum("nearest_eval_id")).first)
    t("embedding near-dup 20k vectors (lsh)")(
      operators.Similarity.embeddingNearDupPairs(emb, 0.9).count())
    // nlist tracks √n (10× data → ~3× cells); candidates/query stay
    // ~(nprobe/nlist)·n — the explicit dial the class doc describes
    t("cluster-balanced sample 20k vectors (nlist=48)")(
      operators.Similarity.clusterBalancedSample(emb, 48, 25)
        .agg(sum(col("cell") + col("rnk") + col("kept"))).first)
    t("ann 20k vectors (ivf nlist=48)")(operators.Similarity.ivfKnn(
      emb, col("vec_id") % 997 === 0, 5, nlist = 48, nprobe = 6).count())
    // the compressed-domain path: train+encode are the build cost; the
    // ADC scan scores every candidate at m=8 lookups against 8-code
    // rows (vs 64-float rows — the 32× memory factor is the point)
    t("ann 20k vectors (pq m=8 k=64 + exact re-rank)")(
      operators.Similarity.pqKnn(
        emb, col("vec_id") % 997 === 0, 5).count())
    t("ann 20k vectors (ivf-pq nlist=48 nprobe=6, the composed path)")(
      operators.Similarity.ivfPqKnn(
        emb, col("vec_id") % 997 === 0, 5, nlist = 48, nprobe = 6).count())
    // the nprobe SWEEP behind the registered ivfpq row's nprobe=8: the
    // composite had hit plain IVF's cell-pruning ceiling at equal
    // nprobe; since its per-survivor cost is m byte-lookups (not d
    // float multiplies) it affords more probes in the same envelope —
    // the sweep documents where each extra probe lands and that the
    // composite passes IVF's recall between 1× and 2× its probe budget
    t("ivf-pq nprobe sweep vs ivf@6 recall (nlist=48; the equal-cost " +
      "escape from the cell-pruning ceiling)") {
      val qf = col("vec_id") % 997 === 0
      val exact = operators.Similarity
        .bruteForceKnn(emb, emb.filter(qf), 5)
        .select("query_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      def recallOf(df: org.apache.spark.sql.DataFrame): Double = {
        val got = df.select("query_id", "neighbor_id").collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSet
        (got & exact).size.toDouble / exact.size
      }
      val rIvf = recallOf(operators.Similarity.ivfKnn(
        emb, qf, 5, nlist = 48, nprobe = 6))
      val sweep = Seq(3, 6, 12, 24).map { p =>
        f"p$p=${recallOf(operators.Similarity.ivfPqKnn(
          emb, qf, 5, nlist = 48, nprobe = p))}%.3f"
      }.mkString(" ")
      f"ivf@6=$rIvf%.3f ivfpq: $sweep"
    }
    // sampled index build: Lloyd over the 4096 smallest-hash vectors
    // instead of all 20k. Full-corpus scans drop 3 -> 1 (seed+2 passes
    // vs one TakeOrdered); recall vs the exact top-5 must hold
    t("ivf sampled-build recall parity (nlist=48, cap=4096)") {
      val qf = col("vec_id") % 997 === 0
      val exact = operators.Similarity
        .bruteForceKnn(emb, emb.filter(qf), 5)
        .select("query_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      def recall(cap: Int): Double = {
        val got = operators.Similarity
          .ivfKnn(emb, qf, 5, nlist = 48, nprobe = 6, sampleCap = cap)
          .select("query_id", "neighbor_id").collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSet
        (got & exact).size.toDouble / exact.size
      }
      f"full=${recall(0)}%.3f sampled=${recall(4096)}%.3f"
    }
    // the re-train policy's evidence rows: a drifted extend — a NEW
    // out-of-support cluster (translation + per-vector hash noise: the
    // "new topic" shape, with natural within-cluster spacing) — must
    // move the persisted store's staleness signal IN THE SAME EVENT
    // that degrades its serving, and rebuildIfStale at the DEFAULT
    // ceilings must fire and recover. The degradation mode differs by
    // store and both are probed on their own physics: IVF's frozen
    // quantizer funnels the whole new cluster into the few cells that
    // point its way, so RECALL stays high while CANDIDATES/QUERY
    // explodes (the scan-cost regression); PQ's frozen codebooks
    // quantize the shifted support coarsely, so ADC fidelity — and
    // with it RECALL — drops. Two rival drift fixtures were measured
    // and rejected: pure isotropic noise halves recall while moving
    // the residual only 1.05× — but no rebuild recovers isotropic
    // noise either, so it is not a staleness scenario at all; and
    // noiseless translation leaves every drifted vector with 9
    // IDENTICAL replica twins whose codes match under ANY books, so
    // recall reads 1.0 both sides and measures nothing. See PLANS.md.
    val driftedEmb = emb.select(
      (col("vec_id") + 500000000L).as("vec_id"),
      expr("transform(embedding, (x, i) -> cast(x + 0.25 + " +
        "(pmod(xxhash64(vec_id, i), 101) / 50.5 - 1.0) * 0.1 as float))")
        .as("embedding")).localCheckpoint(true)
    def driftRecall(
        served: => org.apache.spark.sql.DataFrame,
        exact: Set[(Long, Long)]): Double = {
      val got = served.select("query_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      (got & exact).size.toDouble / exact.size
    }
    t("ivf staleness vs recall under drifted extend (signal + recall " +
      "co-move; default-threshold rebuild recovers)") {
      import graft.plans.IvfIndexStore
      Seq("probe_ivf_stale", "probe_ivf_stale_cells", "probe_ivf_stale_stats")
        .foreach(tb => spark.sql(s"DROP TABLE IF EXISTS $tb"))
      val path = java.nio.file.Files
        .createTempDirectory("graft-probe-ivfstale").toString + "/ivf"
      IvfIndexStore.build(emb, nlist = 48, "probe_ivf_stale", path, buckets = 8)
      val sFresh = IvfIndexStore.staleness(spark, "probe_ivf_stale")
      IvfIndexStore.extend(driftedEmb, "probe_ivf_stale", buckets = 8)
      val sDrift = IvfIndexStore.staleness(spark, "probe_ivf_stale")
      val union = emb.unionByName(driftedEmb).localCheckpoint(true)
      val q = driftedEmb.filter(col("vec_id") % 997 === 0)
      val exact = operators.Similarity.bruteForceKnn(union, q, 5)
        .select("query_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      // mean candidate rows a drifted query's probe join scans — the
      // cost the frozen quantizer can no longer bound (recall itself
      // stays high: the funneled cluster is co-located, so the probed
      // cells contain the true neighbors — along with EVERYTHING else)
      def candidatesPerQuery(): Double = {
        val centroids = IvfIndexStore.loadCentroids(spark, "probe_ivf_stale")
        val probed = q.select(explode(graft.functions.IvfCells.cells(
          spark, col("embedding"), centroids, 6)).as("cell"))
        val nQ = q.count().toDouble
        probed.join(
            spark.table("probe_ivf_stale_cells").groupBy("cell")
              .agg(count(lit(1)).as("occ")), "cell")
          .agg(sum("occ")).first.getLong(0) / nQ
      }
      val recallDrifted = driftRecall(IvfIndexStore.knn(
        q, k = 5, nprobe = 6, "probe_ivf_stale"), exact)
      val candDrifted = candidatesPerQuery()
      val rebuilt = IvfIndexStore.rebuildIfStale(
        spark, "probe_ivf_stale", path, buckets = 8)
      val recallRebuilt = driftRecall(IvfIndexStore.knn(
        q, k = 5, nprobe = 6, "probe_ivf_stale"), exact)
      val candRebuilt = candidatesPerQuery()
      f"fresh=(${sFresh.residualGrowth}%.3f,${sFresh.occupancySkew}%.3f) " +
        f"drifted=(${sDrift.residualGrowth}%.3f,${sDrift.occupancySkew}%.3f) " +
        f"recall drifted=$recallDrifted%.3f rebuilt($rebuilt)=$recallRebuilt%.3f " +
        f"cand/query drifted=$candDrifted%.0f rebuilt=$candRebuilt%.0f"
    }
    t("pq staleness vs recall under drifted extend (frozen codebooks " +
      "mis-quantize the new cluster; default-threshold rebuild recovers)") {
      import graft.plans.PqStore
      Seq("probe_pq_stale", "probe_pq_stale_codes", "probe_pq_stale_rot",
        "probe_pq_stale_stats")
        .foreach(tb => spark.sql(s"DROP TABLE IF EXISTS $tb"))
      val path = java.nio.file.Files
        .createTempDirectory("graft-probe-pqstale").toString + "/pq"
      PqStore.build(emb, 8, 64, "probe_pq_stale", path)
      val sFresh = PqStore.staleness(spark, "probe_pq_stale", emb)
      PqStore.extend(driftedEmb, "probe_pq_stale")
      val union = emb.unionByName(driftedEmb).localCheckpoint(true)
      val sDrift = PqStore.staleness(spark, "probe_pq_stale", union)
      val qf = col("vec_id") >= 500000000L && col("vec_id") % 997 === 0L
      val exact = operators.Similarity.bruteForceKnn(
          union, union.filter(qf), 5)
        .select("query_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val recallDrifted = driftRecall(PqStore.search(
        spark, "probe_pq_stale", union, qf, 5), exact)
      val rebuilt = PqStore.rebuildIfStale(
        spark, "probe_pq_stale", path, union, iters = 6)
      val recallRebuilt = driftRecall(PqStore.search(
        spark, "probe_pq_stale", union, qf, 5), exact)
      f"fresh=(${sFresh.residualGrowth}%.3f,${sFresh.occupancySkew}%.3f) " +
        f"drifted=(${sDrift.residualGrowth}%.3f,${sDrift.occupancySkew}%.3f) " +
        f"recall drifted=$recallDrifted%.3f rebuilt($rebuilt)=$recallRebuilt%.3f"
    }
    // (brand, length)-blocked levenshtein: 10x parts should grow the
    // pair count ~100x within blocks but wall-clock far less than 100x
    // of the sf0.1 single-block time thanks to the banded DP + spread
    val parts = replicate(
      Tables.part(spark, d).select("p_partkey", "p_name", "p_brand"),
      10, Seq("p_partkey"), 10000000L)
    t("editdist 200k parts") {
      val a = parts.toDF("id_a", "name_a", "brand")
        .withColumn("len", explode(sequence(length(col("name_a")) - 2,
          length(col("name_a")) + 2)))
        .repartition(64, col("brand"), col("len"))
      val b = parts.toDF("id_b", "name_b", "brand")
        .withColumn("len", length(col("name_b")))
      a.join(b, Seq("brand", "len"))
        .filter(col("id_a") < col("id_b"))
        .withColumn("dist", levenshtein(col("name_a"), col("name_b"), 2))
        .filter(col("dist") >= 0).count()
    }
    t("editdist 200k parts (symspell deletes)")(
      Dedup.editDistancePairsDeletes(
        parts, "p_partkey", "p_name", Seq("p_brand"), 2).count())
    // jaro admits no variant index — blocking granularity is the scale
    // dial: at 10× the registered query's brand-only blocks go quadratic
    // (800 → 8,000 rows each), so the probe demonstrates the finer
    // (brand, first-word) key that keeps within-block pair counts flat
    t("jaro fuzzy 200k parts (brand+firstword-blocked)") {
      val w0 = split(col("p_name"), " ").getItem(0)
      val a = parts.select(col("p_partkey").as("id_a"),
        col("p_name").as("name_a"), col("p_brand").as("brand"),
        w0.as("w0")).repartition(64, col("brand"), col("w0"))
      val b = parts.select(col("p_partkey").as("id_b"),
        col("p_name").as("name_b"), col("p_brand").as("brand"),
        w0.as("w0"))
      a.join(b, Seq("brand", "w0"))
        .filter(col("id_a") < col("id_b"))
        .withColumn("s", graft.functions.JaroSimilarity.sim(
          spark, col("name_a"), col("name_b")))
        .filter(col("s") >= 0.92).count()
    }
    // per-row kernel: must scale linearly (zero shuffle)
    t("repetition stats 50k docs (per-row kernel)")(
      docs.select(col("doc_id"),
        graft.functions.RepetitionStats.stats(spark,
          graft.functions.TextFunctions.tokens(col("text"))).as("st"))
        .select(element_at(col("st"), 4).as("x")).agg(sum("x"))
        .collect()(0).getLong(0))
    // broadcast benchmark index vs 10x corpus — corpus side never shuffles
    t("decontamination 50k docs")(
      operators.Quality.contamination(docs, col("doc_id") % 10 === 0, 5)
        .count())
    // bloom-gated twin: clean docs are dropped scan-side by the
    // membership kernel and never reach the gram explode/join — at
    // TB scale the exchange-volume difference IS the operator
    t("decontamination 50k docs (bloom gate + exact verify)")(
      operators.Quality.contaminationBloom(
        docs, col("doc_id") % 10 === 0, 5).count())
    // within-cell pairs at nlist tracking √n (10× vectors → 3× cells)
    t("semantic dedup 20k vectors (ivf cells nlist=48)")(
      operators.Similarity.semanticDedupPairs(emb, 0.9, nlist = 48).count())
    // two corpus-keyed aggs + vocab join + WindowGroupLimit top-3 —
    // the same operator body the registered query runs
    t("tfidf top terms 50k docs")(
      operators.TextAnalysis.tfidfTopTerms(docs, 3).count())
    // per-doc window (many partitions) + inverted-index self-join;
    // output-driven on this all-replicas probe corpus like the other
    // dedup rows
    t("winnow pair dedup 50k docs") {
      val fps = operators.Quality.winnowIndex(docs).persist()
      val n = fps.toDF("id_a", "fp")
        .join(fps.toDF("id_b", "fp"), Seq("fp"))
        .filter(col("id_a") < col("id_b"))
        .groupBy("id_a", "id_b").agg(count(lit(1)).as("ns"))
        .filter(col("ns") >= 3).count()
      fps.unpersist(); n
    }
    // the parallel budget fill: window over (lang, ppm) classes only
    t("token budget by ppm class 50k docs")(
      operators.Quality.tokenBudgetByPpmClass(
        docs.withColumn("lang", lit("xx")), 100000L).count())
    // persisted-index cycle: the batch step must cost like the BATCH,
    // not like the corpus — match+extend against the saved artifact vs
    // rebuilding the corpus index from scratch
    t("incremental index 50k docs (build once)") {
      val wh = java.nio.file.Files.createTempDirectory("graft-idx").toString
      spark.sql("DROP TABLE IF EXISTS probe_idx")
      spark.sql("DROP TABLE IF EXISTS probe_idx_sizes")
      spark.sql("DROP TABLE IF EXISTS probe_idx_sigs")
      graft.plans.ShingleIndexStore.build(
        docs, 3, "probe_idx", s"$wh/idx", buckets = 32)
      spark.table("probe_idx").count()
    }
    val idxBatch = docs.filter(col("doc_id") % 10 === 0)
      .select((col("doc_id") + 900000000L).as("doc_id"),
        substring(col("text"), 21, 1000000).as("text"))
    t("incremental index: batch-2 match (5k docs vs saved 50k)")(
      graft.plans.ShingleIndexStore
        .matchBatch(idxBatch, 3, "probe_idx", 0.5).count())
    t("incremental index: extend (append 5k docs)") {
      graft.plans.ShingleIndexStore.extend(
        idxBatch, 3, "probe_idx", buckets = 32)
      spark.table("probe_idx_sizes").count()
    }
    // the twin WITHOUT the artifact: re-shingle the whole corpus to
    // serve the same batch — the per-batch cost the store amortizes away
    t("incremental index: batch-2 match (from-scratch corpus re-shingle)")(
      Dedup.crossJaccardMatches(
        Dedup.shingleIndex(idxBatch, 3).localCheckpoint(true),
        Dedup.shingleIndex(docs, 3), 0.5).count())
    // BM25 serving split: the corpus-sized tokenize+weigh lives in
    // build; a query batch served from the saved postings must cost
    // like the batch, not like the corpus
    t("bm25 index: build 50k docs (tokenize+weigh+save)") {
      val wh = java.nio.file.Files.createTempDirectory("graft-bm25").toString
      spark.sql("DROP TABLE IF EXISTS probe_bm25")
      spark.sql("DROP TABLE IF EXISTS probe_bm25_df")
      spark.sql("DROP TABLE IF EXISTS probe_bm25_stats")
      graft.plans.Bm25IndexStore.build(
        docs, "probe_bm25", s"$wh/bm25", buckets = 32)
      spark.table("probe_bm25").count()
    }
    // NOTE the regime boundary this row exposes: on this CLOSED-vocab
    // replica corpus every query shares terms with ~every doc, so the
    // postings join emits Σ_term(queries×docs) ≈ 570M rows — the same
    // structural blowup the cosine inverted-index hit. Posting-list
    // search is the right shape for Heaps-law vocabularies (selective
    // terms ⇒ short lists); for dense-overlap corpora this naive join
    // is the WORST CASE — kept as the baseline the WAND row below is
    // measured against.
    t("bm25 index: search 500 queries vs saved 50k (closed-vocab " +
      "worst case — see comment)")(
      graft.plans.Bm25IndexStore.search(spark, "probe_bm25",
        docs.filter(col("doc_id") % 100 === 0), 5).count())
    // the same 500-query batch with MaxScore impact-ordered serving:
    // prefix candidates + exact θ + per-term tail cutoffs replace the
    // Σ-postings join with candidate-bounded scans — identical top-k
    // output (spec-pinned, oracled via q_bm25_wand), and the row pair
    // IS the measured claim that early termination removes the
    // dense-overlap blowup
    t("bm25 index: WAND search 500 queries vs saved 50k (same output " +
      "as the row above)")(
      graft.plans.Bm25IndexStore.wandSearch(spark, "probe_bm25",
        docs.filter(col("doc_id") % 100 === 0), 5).count())
    // round-7: the fused retrieval pipelines (tf-idf + BM25 → RRF /
    // RBO) at 50k docs — in-plan (shared-tokenize broadcast kernels:
    // query side broadcasts, corpus streams ONCE through both rankers,
    // TopKAgg bounds reduction state) vs served from the persisted
    // artifacts. The served searches inherit the closed-vocab postings
    // caveat above (every query shares terms with ~every doc), so they
    // run a 50-query batch — per-query serving cost is the number the
    // build-vs-serve split is about, and it must track the batch, not
    // the corpus.
    t("hybrid rrf 50k docs, 500 queries (in-plan, shared tf)")(
      operators.TextAnalysis.hybridRrf(
        docs, col("doc_id") % 100 === 0, 10, 10, 5).count())
    t("ranker agreement 50k docs, 500 queries (in-plan, shared tf)") {
      val tf = operators.TextAnalysis.termFreq(docs).persist()
      val nDocs = docs.agg(count(lit(1)).as("n_docs"))
      val qids = docs.filter(col("doc_id") % 100 === 0).select("doc_id")
      val a = operators.TextAnalysis.tfidfRetrievalFromVecs(
        operators.TextAnalysis.tfidfVectorsFromTf(tf, nDocs, 10), qids, 3)
      val b = operators.TextAnalysis
        .bm25RetrievalFromTf(tf, qids, 3, 1.2, 0.75)
      val n = operators.TextAnalysis.rankerAgreement(a, b).count()
      tf.unpersist(); n
    }
    t("tfidf index: build 50k docs (tokenize+weigh+save)") {
      val wh = java.nio.file.Files.createTempDirectory("graft-tfx").toString
      spark.sql("DROP TABLE IF EXISTS probe_tfx")
      spark.sql("DROP TABLE IF EXISTS probe_tfx_norms")
      graft.plans.TfidfIndexStore.build(
        docs, 10, "probe_tfx", s"$wh/tfx", buckets = 32)
      spark.table("probe_tfx").count()
    }
    t("tfidf index: search 500 queries vs saved 50k (naive postings " +
      "join baseline)")(
      graft.plans.TfidfIndexStore.search(spark, "probe_tfx",
        docs.filter(col("doc_id") % 100 === 0).select("doc_id"), 5)
        .count())
    t("tfidf index: WAND search 500 queries vs saved 50k (same " +
      "output)")(
      graft.plans.TfidfIndexStore.wandSearch(spark, "probe_tfx",
        docs.filter(col("doc_id") % 100 === 0).select("doc_id"), 5)
        .count())
    // WAND's NATIVE regime — a ZIPFIAN vocabulary. The replica corpus
    // above is impact-ordering's adversarial case (every doc has 9
    // verbatim copies, so the P-th impact of every list ≈ its max, the
    // cap sum swamps θ, and nothing is prunable — WAND must merely TIE
    // the naive join there). Real corpora are Zipf-distributed: rare
    // high-idf terms carry the score mass while low-impact stopword
    // tails dominate the naive join volume — exactly what the per-term
    // cutoff skips. 16 frequency octaves × 120 tokens each,
    // hash-synthesized (deterministic), 50k docs × 60 tokens.
    val zipfDocs = spark.range(50000).select(col("id").as("doc_id"),
      concat_ws(" ", expr(
        "transform(sequence(0, 59), i -> concat('w', " +
          "CAST(floor(log2(pmod(xxhash64(id * 100 + i), 65536) + 1)) " +
          "AS INT), '_', pmod(xxhash64(id * 100 + i + 7), 120)))"))
        .as("text"))
      .localCheckpoint(true)
    t("bm25 zipf: build 50k zipf docs") {
      val wh = java.nio.file.Files.createTempDirectory("graft-bm25z").toString
      Seq("probe_bm25z", "probe_bm25z_df", "probe_bm25z_stats")
        .foreach(tb => spark.sql(s"DROP TABLE IF EXISTS $tb"))
      graft.plans.Bm25IndexStore.build(
        zipfDocs, "probe_bm25z", s"$wh/bm25z", buckets = 32)
      spark.table("probe_bm25z").count()
    }
    t("bm25 zipf: search 500 doc-as-query (60-term) queries (naive " +
      "Σ-postings join)")(
      graft.plans.Bm25IndexStore.search(spark, "probe_bm25z",
        zipfDocs.filter(col("doc_id") % 100 === 0), 5).count())
    // doc-as-query is MaxScore's structural blind spot: a 60-term
    // query spreads its score over so many terms that θ never clears
    // the cap sum and nothing prunes (measured ~4x WORSE than naive —
    // the regime note on wandSearch). The workload impact ordering
    // exists for is SHORT SELECTIVE queries (keyword search): the
    // rare terms carry θ past the cap sum, the per-term cutoffs then
    // drop the common terms' list tails that dominate the naive join.
    // 500 5-token queries: 3 rare-to-mid + 2 stopword-class tokens.
    val zipfQueries = spark.range(500).select(
      (col("id") + 10000000L).as("doc_id"),
      concat_ws(" ",
        expr("concat('w', CAST(pmod(xxhash64(id), 8) AS INT), '_', " +
          "pmod(xxhash64(id + 1), 120))"),
        expr("concat('w', CAST(8 + pmod(xxhash64(id + 2), 4) AS INT), " +
          "'_', pmod(xxhash64(id + 3), 120))"),
        expr("concat('w', CAST(12 + pmod(xxhash64(id + 4), 3) AS INT), " +
          "'_', pmod(xxhash64(id + 5), 120))"),
        expr("concat('w15_', pmod(xxhash64(id + 6), 120))"),
        expr("concat('w15_', pmod(xxhash64(id + 7), 120))")).as("text"))
      .localCheckpoint(true)
    t("bm25 zipf: 500 SHORT keyword queries (naive Σ-postings join)")(
      graft.plans.Bm25IndexStore.search(spark, "probe_bm25z",
        zipfQueries, 5).count())
    t("bm25 zipf: 500 SHORT keyword queries (WAND — impact-ordered " +
      "early termination, same output)")(
      graft.plans.Bm25IndexStore.wandSearch(spark, "probe_bm25z",
        zipfQueries, 5).count())
    // the canonical selective case — "jaguar car": one rare term
    // carries θ past the cap sum, the stopword-class term's 12k-doc
    // tail drops entirely (empty candB or essential-split to the rare
    // list alone)
    val zipfQueries2 = spark.range(10000).select(
      (col("id") + 20000000L).as("doc_id"),
      concat_ws(" ",
        expr("concat('w', CAST(4 + pmod(xxhash64(id), 6) AS INT), " +
          "'_', pmod(xxhash64(id + 1), 120))"),
        expr("concat('w15_', pmod(xxhash64(id + 2), 120))")).as("text"))
      .localCheckpoint(true)
    t("bm25 zipf: 10k TWO-term (rare+stopword) queries (naive)")(
      graft.plans.Bm25IndexStore.search(spark, "probe_bm25z",
        zipfQueries2, 5).count())
    t("bm25 zipf: 10k TWO-term (rare+stopword) queries (WAND, same " +
      "output)")(
      graft.plans.Bm25IndexStore.wandSearch(spark, "probe_bm25z",
        zipfQueries2, 5).count())
    // amortization at serving scale: WAND's ~10-job orchestration cost
    // is FIXED per batch while the naive join volume is linear in it —
    // the 50k-query row is where the asymptotic win shows (the 500-
    // query short row above deliberately documents the other end)
    val zipfQueries3 = spark.range(50000).select(
      (col("id") + 30000000L).as("doc_id"),
      concat_ws(" ",
        expr("concat('w', CAST(4 + pmod(xxhash64(id), 6) AS INT), " +
          "'_', pmod(xxhash64(id + 1), 120))"),
        expr("concat('w15_', pmod(xxhash64(id + 2), 120))")).as("text"))
      .localCheckpoint(true)
    t("bm25 zipf: 50k TWO-term (rare+stopword) queries (naive)")(
      graft.plans.Bm25IndexStore.search(spark, "probe_bm25z",
        zipfQueries3, 5).count())
    t("bm25 zipf: 50k TWO-term (rare+stopword) queries (WAND, same " +
      "output)")(
      graft.plans.Bm25IndexStore.wandSearch(spark, "probe_bm25z",
        zipfQueries3, 5).count())
    // stopword-heavy selective queries — the workload WAND exists for:
    // one rare term carries θ, THREE stopword-class tails (~12.5k docs
    // each) dominate the naive join and drop entirely under the
    // cutoffs. The naive volume triples vs the two-term row while the
    // WAND volume barely moves — the gap is the early-termination win.
    val zipfQueries4 = spark.range(20000).select(
      (col("id") + 40000000L).as("doc_id"),
      concat_ws(" ",
        expr("concat('w', CAST(4 + pmod(xxhash64(id), 6) AS INT), " +
          "'_', pmod(xxhash64(id + 1), 120))"),
        expr("concat('w15_', pmod(xxhash64(id + 2), 120))"),
        expr("concat('w15_', pmod(xxhash64(id + 3), 120))"),
        expr("concat('w14_', pmod(xxhash64(id + 4), 120))")).as("text"))
      .localCheckpoint(true)
    t("bm25 zipf: 20k FOUR-term (1 rare + 3 stopword) queries (naive)")(
      graft.plans.Bm25IndexStore.search(spark, "probe_bm25z",
        zipfQueries4, 5).count())
    t("bm25 zipf: 20k FOUR-term (1 rare + 3 stopword) queries (WAND, " +
      "same output)")(
      graft.plans.Bm25IndexStore.wandSearch(spark, "probe_bm25z",
        zipfQueries4, 5).count())
    // the bm25 artifact may be absent when this chunk runs alone
    // (substring-filtered probe runs) — ensure it outside the timer
    if (!spark.catalog.tableExists("probe_bm25")) {
      val wh = java.nio.file.Files.createTempDirectory("graft-bm25").toString
      graft.plans.Bm25IndexStore.build(
        docs, "probe_bm25", s"$wh/bm25", buckets = 32)
    }
    t("rrf fusion served: 50-query batch vs saved 50k (search only)")(
      operators.TextAnalysis.rrfFusion(Seq(
        graft.plans.TfidfIndexStore.search(spark, "probe_tfx",
          docs.filter(col("doc_id") % 1000 === 0).select("doc_id"), 10),
        graft.plans.Bm25IndexStore.search(spark, "probe_bm25",
          docs.filter(col("doc_id") % 1000 === 0), 10)), 5).count())
    t("ranker agreement served: 50-query batch vs saved 50k " +
      "(search only)")(
      operators.TextAnalysis.rankerAgreement(
        graft.plans.TfidfIndexStore.search(spark, "probe_tfx",
          docs.filter(col("doc_id") % 1000 === 0).select("doc_id"), 3),
        graft.plans.Bm25IndexStore.search(spark, "probe_bm25",
          docs.filter(col("doc_id") % 1000 === 0), 3)).count())
    // hot-shingle skew: one gram planted in HALF of the natural 5k docs
    // (df 2,500 — 5x over the 500 cap, yet its ~6M join rows ≈ 150 MB
    // sit UNDER AQE's 256 MB skewedPartitionThreshold, so AQE will NOT
    // split the bucket — this is exactly the medium-hot key the df cap
    // exists for). Evidence is TASK-level: max/median task time of the
    // pair-join job, capped vs uncapped.
    def taskSkew(label: String, maxDf: Long): Unit = t(
      s"hot-shingle pair join ($label)") {
      val hotDocs = Tables.documents(spark, d).select(col("doc_id"),
        when(col("doc_id") % 2 === 0,
          concat(col("text"), lit(" hotgramaa hotgrambb hotgramcc")))
          .otherwise(col("text")).as("text"))
      val sh = Dedup.capDocFrequency(
        Dedup.shingleIndex(hotDocs, 3), maxDf).persist()
      sh.count() // materialize OUTSIDE the measured window
      val taskMs = scala.collection.mutable.ArrayBuffer[Long]()
      val listener = new org.apache.spark.scheduler.SparkListener {
        override def onTaskEnd(
            e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
          taskMs.synchronized { taskMs += e.taskInfo.duration }
      }
      spark.sparkContext.addSparkListener(listener)
      val n = Dedup.jaccardPairs(sh, 0.5).count()
      Thread.sleep(1000) // let the (async) listener bus drain
      spark.sparkContext.removeSparkListener(listener)
      sh.unpersist()
      val s = taskMs.synchronized(taskMs.sorted.toIndexedSeq)
      val med = math.max(s(s.length / 2), 1L)
      f"pairs=$n tasks=${s.length} med=${med}ms max=${s.last}ms " +
        f"skew=${s.last.toDouble / med}%.1f"
    }
    taskSkew("df cap 500 + AQE", Dedup.ShingleDfCap)
    // the uncapped twin: the hot bucket survives to the join — AQE alone
    // must absorb it; expect a larger max task and wall-clock
    taskSkew("no cap, AQE only", Long.MaxValue)
    // adversarial shape (naive propagation would need 100 rounds); round
    // count must stay ~log(diameter) and per-round cost is edge-bound
    t("connected components 1M edges (10k chains of 100, distributed path)") {
      val e = spark.range(1000000L).toDF("u")
        .withColumn("v", col("u") + 1)
        .filter(col("v") % 100 =!= 0)
      // driverFinishEdges = 0 forces the alternating-star rounds — the
      // probe measures the distributed path, not the driver finish
      operators.Clustering.connectedComponents(e, "u", "v", 0L).count()
    }
    // peel shape: 10-node chains die from both ends in ~5 rounds while
    // every triangle survives — per-round cost tracks the SHRINKING edge
    // list, so the chain mass is gone after round one's degree pass
    t("k-core 2 peel: 90k chain edges + 30k triangle edges") {
      val chains = spark.range(100000L).toDF("u")
        .withColumn("v", col("u") + 1).filter(col("v") % 10 =!= 0)
      val tris = spark.range(10000L)
        .select((col("id") * 3 + 5000000L).as("b"))
        .select(explode(array(
          struct(col("b").as("u"), (col("b") + 1).as("v")),
          struct((col("b") + 1).as("u"), (col("b") + 2).as("v")),
          struct(col("b").as("u"), (col("b") + 2).as("v")))).as("e"))
        .select(col("e.u"), col("e.v"))
      operators.Clustering.kCore(
        chains.unionByName(tris), "u", "v", 2).count()
    }
    // salient-term cosine: the scale claim is "salient ⇒ low df, so the
    // term-keyed join never fans out" — which presumes a Heaps-law
    // vocabulary (vocab grows with corpus; real text). The synthetic
    // fixture's ~60-word vocabulary VIOLATES that premise (every term's
    // postings are O(n) and the probe would go output-quadratic like the
    // all-replica jaccard rows), so this probe builds a corpus with
    // realistic vocabulary statistics instead: 20 filler tokens from a
    // 50-word pool (high df — never salient) + 10 doc-group tokens from
    // a 12,500-term pool (df 4 — always salient). TF-IDF selection must
    // pick the rare ten, and the pair join's fan-out is then bounded by
    // the rare terms' postings (4 each) however many docs exist.
    t("tfidf cosine pairs 50k docs (Heaps-vocab synth, top-10 terms)") {
      val synth = spark.range(50000).select(col("id").as("doc_id"),
        concat_ws(" ",
          (0 until 20).map(i =>
            concat(lit("w"), pmod(col("id") * (i * 7 + 3), lit(50)))) ++
            (0 until 10).map(i =>
              concat(lit("r"), pmod(col("id"), lit(12500)),
                lit("_"), lit(i))): _*).as("text"))
      operators.TextAnalysis.tfidfCosinePairs(synth, 10, 2, 0.7)
        .agg(count(lit(1)), sum(col("shared_terms"))).first
    }
    // two-level prefix sum: per-partition windows + a #partitions-row
    // driver scan — must scale linearly, no single-task global sort
    t("sequence packing 50k docs (two-level prefix sum)") {
      val toks = docs.select(col("doc_id"),
        size(graft.functions.TextFunctions.tokens(col("text")))
          .cast("long").as("n_tokens"))
      operators.Sampling
        .exclusivePrefixSum(toks, "doc_id", "n_tokens", 64, "cum")
        .agg(max("cum")).collect()(0).getLong(0)
    }
    // 10x events in the same wall-clock window = 10x per-bin density,
    // so qualifying pairs grow ~100x — output-driven like the dedup rows
    t("range join 1M events (binned)") {
      val evs = replicate(
        Tables.events(spark, d).select("event_id", "event_type", "ts"),
        10, Seq("event_id"), 100000000L)
      val W = 600000L
      val ev = evs.withColumn("ms", unix_millis(col("ts")))
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("ms").as("cms"))
        .withColumn("bin", expr(s"cms div $W"))
      val errors = ev.filter(col("event_type") === "error")
        .select(col("event_id"), col("ms"))
        .withColumn("bin",
          explode(array(expr(s"(ms div $W) - 1"), expr(s"ms div $W"))))
      errors.join(clicks, Seq("bin"), "left")
        .groupBy("event_id")
        .agg(sum(when(col("cms").isNotNull &&
            col("cms") >= col("ms") - W && col("cms") < col("ms"),
          1L).otherwise(0L)).as("n")).count()
    }
    // gram-keyed df aggregation + join back on the same key; the probe
    // corpus is 10 exact replicas so every gram is hot — worst-case
    // join-probe volume for the operator
    t("boilerplate fraction 50k docs (gram df agg + join)")(
      operators.Quality.boilerplateFractions(docs).count())
    // replicated corpus ⇒ every gram hot ⇒ every position covered —
    // worst-case coverage explode for the span scrub
    t("duplicated-span scrub 50k docs (gram df + coverage agg)")(
      Dedup.duplicatedSpanScrub(docs, 5).count())
    // deterministic shuffle: range exchange on the md5 key + parallel
    // per-partition scans — the no-single-task global sort claim
    t("shuffle order 50k docs (range-partitioned prefix sum)")(
      operators.Sampling.shuffledPositions(
        docs.select("doc_id"), "doc_id", 42, 64)
        .agg(max("pos")).collect()(0).getLong(0))
    // one stats agg + one range exchange on the z-value + per-partition
    // sort — the global-sort cost floor; spans checked by LayoutSpec,
    // this measures the write at 6M rows
    t("z-order write 6M rows -> 64 files (stats agg + range exchange)") {
      val dir = java.nio.file.Files
        .createTempDirectory("graft-zprobe").toString
      plans.Layout.writeZOrdered(
        li.select("l_orderkey", "l_partkey", "l_quantity"),
        dir, "l_orderkey", "l_partkey", files = 64)
      val n = spark.read.parquet(dir).count()
      org.apache.commons.io.FileUtils
        .deleteDirectory(new java.io.File(dir))
      n
    }
    // CMS exchange is depth x width per task however many distinct keys
    // exist; the probe replicates users DISTINCT (15k keys) so the
    // candidate distinct + recount stay key-bounded, and cross-checks
    // the 2-pass result against the direct groupBy on the same replica
    t("heavy hitters 1M events / 15k users (CMS 2-pass vs direct)") {
      val evs = replicate(
        Tables.events(spark, d).select("event_id", "user_id"),
        10, Seq("event_id", "user_id"), 100000000L)
      val keys = evs.select("user_id")
      val cms = functions.CountMin.build(keys, "user_id")
      val cand = keys.where(cms.estimate(col("user_id")) >= 80L).distinct()
      val two = evs.join(broadcast(cand), Seq("user_id"), "left_semi")
        .groupBy("user_id").agg(count(lit(1)).as("n"))
        .where(col("n") >= 80L)
        .agg(count(lit(1)), sum("n")).collect()(0)
      val direct = evs.groupBy("user_id").agg(count(lit(1)).as("n"))
        .where(col("n") >= 80L)
        .agg(count(lit(1)), sum("n")).collect()(0)
      require(two == direct, s"$two != $direct")
      two
    }
    // fixed-iteration fixpoint: each of the 5 rounds is one join of the
    // checkpointed 1M-edge list against the 100k-row rank frame plus a
    // partial+final agg by dst — wall-clock must stay ~linear in |E|,
    // and rank mass (sum) stays ≤ 1 (dangling leak only)
    t("pagerank 1M edges / 100k nodes, 5 iters") {
      val e = spark.range(1000000L).toDF("id")
        .select((col("id") % 100000L).as("src"),
          pmod(col("id") * 2654435761L, lit(100000L)).as("dst"))
      val mass = operators.Clustering.pageRank(e)
        .agg(sum("rank")).collect()(0).getDouble(0)
      require(mass <= 1.000001, s"rank mass $mass exceeds 1")
      f"mass=$mass%.4f"
    }
    // vocab²-bounded pair aggregation: the replicated corpus has 10×
    // docs over the SAME vocabulary, so the (t1,t2) key space is
    // constant and only per-doc work scales — expect ~linear
    t("token pmi 50k docs (distinct + co-occurrence self-join)")(
      operators.TextAnalysis.tokenPmi(docs, 500L).count())
    // centroid state is labels x dim regardless of corpus size; scoring
    // is a per-row map over the broadcast centroids
    t("embedding outliers 20k vectors (label-dim agg)") {
      val embL = replicate(
        Tables.embeddings(spark, d).select("vec_id", "embedding", "label"),
        10, Seq("vec_id"), 10000000L)
      operators.Similarity.embeddingOutliers(embL, 5).count()
    }
    // keep-first line dedup: 10 replicas make EVERY segment 10-hot —
    // worst-case probe volume for the seg-keyed join; the agg side still
    // collapses each distinct segment to one keeper row before the join
    t("line dedup 50k docs (seg-key agg + join, all segments hot)")(
      Dedup.lineDedup(docs, Dedup.LineSegTokens)
        .agg(sum("n_segs"), sum("n_dropped")).first)
    // BPE: the replicated corpus has 10x docs over the SAME word set, so
    // the first aggregation collapses it to the IDENTICAL vocab table
    // (freqs x10) and every merge iteration costs exactly what the 1x
    // run costs — the corpus-size-independence claim, measured
    t("bpe learn 50k docs, 10 merges (corpus pass + vocab-bounded loop)")(
      operators.TextAnalysis.bpeLearn(docs, 10).count())
    t("bpe encode 50k docs (broadcast vocab join + per-doc agg)")(
      operators.TextAnalysis.bpeEncode(docs, 10)
        .agg(sum("n_bpe_tokens"), sum("n_chars")).first)
    // the batched trainer at a PRODUCTION merge budget: 1k merges in
    // far fewer corpus-vocab passes — the amortization claim measured
    // beyond the fixtures' small budgets (spec proves batched ≡
    // sequential; this row prices it). The natural-docs corpus
    // EXHAUSTS at ~89 merges (small closed word vocab — every word
    // fully merges), so the budget rows run on the zipf corpus
    // (1,920 distinct 5-7-char words — ~9k merges available, rich
    // digit-sharing for batch interaction). The sequential anchor
    // below prices one-merge-per-pass on the same vocab — #merges ×
    // its per-merge cost is the extrapolation the batched row beats.
    val bpeZipfDocs = zipfDocs
    t("bpe batched: 1000 merges on 50k zipf docs (passes recorded — " +
      "sequential would take 1000)") {
      val (m, _) =
        operators.TextAnalysis.bpeVocabLoopBatched(
          operators.TextAnalysis.bpeWordVocab(bpeZipfDocs), 1000)
      s"${m.size} merges in ${operators.TextAnalysis.bpeLastPasses.get()}" +
        " corpus-vocab passes"
    }
    t("bpe sequential: 32 merges on 50k zipf docs (per-merge " +
      "extrapolation anchor for the batched row)")(
      operators.TextAnalysis.bpeVocabLoopSequential(
        operators.TextAnalysis.bpeWordVocab(bpeZipfDocs), 32)
        ._1.size)
    t("bpe batched exhaustion: natural 50k docs, budget 1000 " +
      "(closed word vocab merges out)") {
      val (m, _) = operators.TextAnalysis.bpeVocabLoopBatched(
        operators.TextAnalysis.bpeWordVocab(docs), 1000)
      s"${m.size} merges (exhausted) in " +
        s"${operators.TextAnalysis.bpeLastPasses.get()} passes"
    }
    // the PRODUCTION budget on the driver-local trainer: 32k merges
    // over a ~1M-word synthetic vocab (the BpeDriverVocabCap regime's
    // worst case). The incremental pair-count/index/heap structure
    // makes this O(affected adjacencies · log P) — the re-sweeping
    // form was O(vocab × merges) ≈ 10¹¹ driver ops (hours); this row
    // prices the claim that the cap's routing is safe at any budget.
    // shared generator for the tokenizer-trainer probes: n ids → 5-12
    // char splitmix64 words with a zipf-ish frequency head, collapsed
    // to a distinct (w, freq) table (ONE definition — the BPE and
    // unigram probes must price the same word distribution)
    def syntheticVocab(n: Long): DataFrame = {
      import spark.implicits._
      spark.range(n).map { id =>
        def mx(z0: Long): Long = {
          var z = z0 + 0x9e3779b97f4a7c15L
          z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
          z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
          z ^ (z >>> 31)
        }
        val h1 = mx(id); val h2 = mx(id + 7777777L)
        val len = 5 + (h1 & 7L).toInt
        val sb = new StringBuilder
        var i = 0
        while (i < len) {
          val bits = if (i < 8) h1 >>> (8 + i * 7) else h2 >>> ((i - 8) * 7)
          sb += ('a' + ((bits & 63L) % 26).toInt).toChar
          i += 1
        }
        (sb.toString, 1L + 1000000L / (id + 1L)) // zipf-ish head
      }.toDF("w", "freq")
        .groupBy("w").agg(max("freq").as("freq"))
        .localCheckpoint(true)
    }
    t("bpe incremental local: 32768 merges on ~1M-word synthetic vocab " +
      "(driver pair-count maintenance)") {
      val vocab = syntheticVocab(1000000L)
        .select(col("w"), col("freq"),
          filter(split(col("w"), ""), x => x =!= "").as("syms"))
        .localCheckpoint(true)
      val (m, _) = operators.TextAnalysis.bpeVocabLoopLocal(vocab, 32768)
      s"${m.size} merges over ${vocab.count()} words"
    }
    // unigram hard-EM trainer: the corpus collapses to (word, freq)
    // exactly like BPE, so the 10x-replica corpus yields the IDENTICAL
    // word table (freqs x10) and identical rounds; each EM round is a
    // distributed Viterbi over the word table with the vocab-sized
    // piece map broadcast. zipf corpus = 1,920 distinct 5-7-char words
    // with rich substring sharing (the seed cap and the prune both
    // bite, unlike the 31-word natural fixture vocab).
    t("unigram hard-EM: seed + 2 rounds + prune on 50k zipf docs " +
      "(corpus pass + vocab-bounded rounds)")(
      operators.Unigram.train(operators.Unigram.wordFreq(zipfDocs)).size)
    // round cost scales with the WORD TABLE, not the corpus: a 200k-
    // distinct-word synthetic vocab prices the per-round Viterbi map at
    // two orders past the fixture vocab
    t("unigram hard-EM: 200k-distinct-word synthetic vocab " +
      "(per-round Viterbi cost at production vocab scale)") {
      operators.Unigram.train(syntheticVocab(200000L)).size
    }
    // unigram ENCODE (the production read path, q_unigram_encode_served
    // minus the store round-trip): at a FIXED frozen vocab, cost must
    // scale ~linearly with the corpus — the distinct-word Viterbi seed
    // is vocab-bounded and the encode join streams the exploded corpus
    // through a broadcast (PlanShapeSpec pins no word-key exchange on
    // the probe side), so the 10x row should land near 10x the 1x row
    // (modulo the fixed seed cost), never super-linear
    locally {
      val sc = operators.Unigram
        .train(operators.Unigram.wordFreq(
          Tables.documents(spark, d).select("doc_id", "text")))
        .map(p => p.piece -> p.score).toMap
      val base = Tables.documents(spark, d).select("doc_id", "text")
      t("unigram encode 5k docs under frozen vocab (1x corpus)")(
        operators.Unigram.encodeWithVocab(base, sc)
          .agg(sum("n_words"), sum("n_pieces"),
            sum(length(col("seg")))).first)
      t("unigram encode 50k docs under frozen vocab (10x corpus, " +
        "same vocab — linear-in-corpus claim)")(
        operators.Unigram.encodeWithVocab(docs, sc)
          .agg(sum("n_words"), sum("n_pieces"),
            sum(length(col("seg")))).first)
    }
    // whole-doc shelf packing at 10×: the only window partitions by
    // pack cell, so 10× docs = 10× rows through the SAME 8 cells —
    // per-cell sort state grows linearly but stays a per-cell local
    // sort (production dials PackCells up with the corpus; the probe
    // pins that nothing beyond the cell window appears at 10×)
    t("whole-doc packing 50k docs (cell-partitioned shelf window)")(
      operators.Sampling.packWholeDocs(docs, 4096L, 8L)
        .agg(sum(col("n_docs") + col("doc_tokens") + col("n_truncated")),
          sum("fill")).first)
    // data card: per-source state is O(sources); the text-key dup agg is
    // the only corpus-sized exchange, and 10 replicas make every text
    // 10-hot — worst case for it
    t("corpus data card 50k docs (source agg + text-key dup agg)")(
      operators.Curation.corpusDataCard(
        replicate(Tables.documents(spark, d), 10, Seq("doc_id"),
          10000000L))
        .agg(sum("n_tokens"), sum("n_docs")).first)
    // classifier: 16 full-batch GD passes over the persisted 7-double
    // feature projection + one scoring pass — train cost is iters x one
    // agg with O(#features) partial state; the replicated corpus 10x's
    // each pass but the iteration count, weight state, and driver
    // traffic (6 longs per pass) stay constant
    t("quality classifier 50k docs (16 GD passes + score)")(
      operators.Classifier.scoreCorpus(docs)
        .agg(sum("score"), sum("pred"), sum("y")).first)
    // serving split: scoring under frozen weights is ONE stateless pass
    // — the recurring-ingest cost after build pays the 16 passes once
    t("classifier frozen-weights scoring 50k docs (1 pass)") {
      val w = operators.Classifier.train(
        operators.Classifier.features(
          Tables.documents(spark, d).select("doc_id", "text")))
      operators.Classifier.scoreWith(operators.Classifier.features(docs), w)
        .agg(sum("score"), sum("pred")).first
    }
    // dispersion: one labels x dim x 2-level agg over the normalized
    // posexplode — state is labels x dim cells regardless of corpus size
    t("embedding dispersion 20k vectors (labels x dim agg)") {
      val embL = replicate(
        Tables.embeddings(spark, d).select("vec_id", "embedding", "label"),
        10, Seq("vec_id"), 10000000L)
      operators.Similarity.embeddingDispersion(embL)
        .agg(sum("dispersion"), sum("n")).first
    }
    // tokenizer fertility: the grouped report over the encode — state is
    // sources x langs cells; the encode's broadcast vocab join dominates
    // (same plan shape as qTokenizerFertility, over the replicas)
    t("tokenizer fertility 50k docs (encode + sources x langs agg)")(
      operators.TextAnalysis.bpeEncode(docsSrc, 10)
        .join(docsSrc.select("doc_id", "source", "lang"), "doc_id")
        .groupBy("source", "lang")
        .agg(count(lit(1)), sum("n_bpe_tokens"), sum("n_words"))
        .count())
    // ===== SERVING-path scale probe (r13 VERDICT #1 — the build-side
    // minhash5m probe's missing twin). EXPLICIT-ONLY (runMain
    // graft.ScaleProbe wandserve): a 10× zipf corpus (500k docs) and
    // query batches up to 100k. Per serve it records wall, Spark jobs
    // (broadcast/subquery side jobs split out — the same exclusion
    // rule as IndexStoreSpec's ≤2/≤3 pin), WandKernel counter deltas
    // (boundedCollect calls/refusals, driver-planned serves vs
    // refusals, chunked-scoring fallbacks), and stage-attributed task
    // stats. Three batch sizes span the cap boundaries ON PURPOSE:
    //   1k   — stays DRIVER-PLANNED single-chunk (pair cells ≈ 0.13M
    //          ≪ 8M; priced scoring volume ≈ 2M ≤ the 4M single-chunk
    //          budget): the spec-pinned job budget, now at 10× the
    //          corpus the spec pins it on;
    //   10k  — pair cells fit but the priced broadcast volume overruns
    //          the single-chunk budget (≈ 23M > 4M): serves
    //          DRIVER-PLANNED with CHUNKED exact scoring (r14 — this
    //          regime refused to the distributed cascade before, at
    //          42 s / 14+94 jobs on this exact probe), executor state
    //          still bounded at one live chunk;
    //   100k — refuses on PAIR CELLS (≈ 13M > 8M driver memory) and
    //          serves through the distributed orchestration; candidate
    //          volume must stay LINEAR in the batch and the heavy
    //          stages skew-free.
    // Every refusal here is the cap DOING ITS JOB — the fallback is a
    // performance path, never a correctness one (iff-law + equality
    // specs), so no cap needs raising unless the wall says so.
    if (only.exists(_.contains("wandserve"))) {
      windowStamp("wandserve start")
      import graft.plans.{Bm25IndexStore, WandKernel}
      val zipf10 = spark.range(500000).select(col("id").as("doc_id"),
        concat_ws(" ", expr(
          "transform(sequence(0, 59), i -> concat('w', " +
            "CAST(floor(log2(pmod(xxhash64(id * 100 + i), 65536) + 1)) " +
            "AS INT), '_', pmod(xxhash64(id * 100 + i + 7), 120)))"))
          .as("text"))
      t("wandserve: build 500k-doc zipf BM25 index (10× corpus)") {
        val wh = java.nio.file.Files
          .createTempDirectory("graft-bm25z10").toString
        Seq("probe_bm25z10", "probe_bm25z10_df", "probe_bm25z10_stats")
          .foreach(tb => spark.sql(s"DROP TABLE IF EXISTS $tb"))
        Bm25IndexStore.build(zipf10, "probe_bm25z10", s"$wh/bm25z10",
          buckets = 32)
        spark.table("probe_bm25z10").count()
      }
      // the registered rows' two-term (rare + stopword) keyword shape
      def twoTermQueries(n: Long, off: Long): DataFrame =
        spark.range(n).select((col("id") + off).as("doc_id"),
          concat_ws(" ",
            expr("concat('w', CAST(4 + pmod(xxhash64(id), 6) AS INT), " +
              "'_', pmod(xxhash64(id + 1), 120))"),
            expr("concat('w15_', pmod(xxhash64(id + 2), 120))"))
            .as("text"))
          .localCheckpoint(true)
      val jobNames = new java.util.concurrent.ConcurrentLinkedQueue[String]()
      val jl = new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
          // stage name + job description: which one marks a Spark-side
          // broadcast/subquery job is version-dependent (IndexStoreSpec
          // countJobs filters BOTH; this probe must apply the same
          // rule or its jobs= receipt overstates the pinned count)
          val desc = Option(j.properties)
            .flatMap(p => Option(p.getProperty("spark.job.description")))
            .getOrElse("")
          jobNames.add(j.stageInfos.lastOption.map(_.name).getOrElse("?") +
            s" [${desc.take(40)}]"); ()
        }
      }
      val tsl = new TaskStatsListener
      val counters = Seq(
        "bounded_calls" -> WandKernel.statBoundedCalls,
        "bounded_refused" -> WandKernel.statBoundedRefusals,
        "driver_planned" -> WandKernel.statDriverPlannedServes,
        "plan_refused" -> WandKernel.statDriverPlanningRefusals,
        "chunked_fallbacks" -> WandKernel.statChunkedScoreFallbacks)
      def serveProbe(label: String, nq: Long, off: Long): Unit = {
        val q = twoTermQueries(nq, off)
        val c0 = counters.map(_._2.get())
        jobNames.clear(); tsl.clear()
        spark.sparkContext.addSparkListener(jl)
        spark.sparkContext.addSparkListener(tsl)
        try {
          t(s"wandserve: $label") {
            val n = Bm25IndexStore
              .wandSearch(spark, "probe_bm25z10", q, 5).count()
            require(n == nq * 5, s"expected ${nq * 5} result rows, got $n")
            n
          }
          drainStable(() => jobNames.size())
          drainStable(() => tsl.tasks.size())
        } finally {
          spark.sparkContext.removeSparkListener(jl)
          spark.sparkContext.removeSparkListener(tsl)
        }
        import scala.jdk.CollectionConverters._
        val all = jobNames.asScala.toSeq
        val counted = all.filterNot(n =>
          n.contains("withThreadLocalCaptured") ||
            n.contains("broadcast exchange"))
        val deltas = counters.map(_._2.get()).zip(c0).map(p => p._1 - p._2)
        val stats = counters.map(_._1).zip(deltas)
          .map(p => s"${p._1}=${p._2}").mkString(" ")
        val ds = tsl.tasks.asScala.map(_._2).toSeq.sorted
        val med = if (ds.isEmpty) 0L else ds(ds.length / 2)
        val mx = if (ds.isEmpty) 0L else ds.last
        println(f"[scale]   $label: jobs=${counted.size} " +
          f"(+${all.size - counted.size} bcast/subq) $stats " +
          f"tasks=${ds.length} task_med=${med}ms task_max=${mx}ms " +
          f"skew=${if (med > 0) mx.toDouble / med else 0.0}%.1f")
        worstStages(tsl, 3).foreach { case (sid, sMax, sMed, n) =>
          println(f"[scale]     stage $sid: max=${sMax}ms med=${sMed}ms " +
            f"tasks=$n  ${tsl.stages.getOrDefault(sid, "?").take(120)}")
        }
      }
      serveProbe("1k two-term queries vs 500k docs (driver-planned " +
        "regime at 10× corpus)", 1000L, 60000000L)
      serveProbe("10k two-term queries (over-budget priced volume -> " +
        "driver-planned CHUNKED scoring, r14 flow)", 10000L, 70000000L)
      serveProbe("100k two-term queries (pair-cells refusal -> " +
        "distributed; linear-in-batch claim)", 100000L, 80000000L)
      // controlled same-session A/B for the 10k chunked regime (the
      // r14 flow change: over-budget volume now serves driver-planned
      // chunked instead of refusing to the distributed orchestration).
      // Single cross-run walls on this host swing ±25%, so the only
      // sound comparison is interleaved ABAB in ONE session: each arm
      // warms once (codegen), then 3 alternating pairs; report
      // min/median per arm. The seam is the spec's own
      // driverPlanningEnabled flag — both arms are output-identical
      // (equality law), this prices them.
      t("wandserve: 10k-query A/B — driver-planned CHUNKED vs " +
        "distributed orchestration (interleaved, min/med per arm)") {
        val qAb = twoTermQueries(10000L, 90000000L)
        def once(planned: Boolean): Double = {
          graft.plans.Bm25IndexStore.driverPlanningEnabled = planned
          try {
            val t0 = System.nanoTime()
            val n = Bm25IndexStore
              .wandSearch(spark, "probe_bm25z10", qAb, 5).count()
            require(n == 50000L, s"A/B serve returned $n rows")
            (System.nanoTime() - t0) / 1e9
          } finally
            graft.plans.Bm25IndexStore.driverPlanningEnabled = true
        }
        once(true); once(false) // discard: per-plan codegen warm-up
        val walls = (1 to 3).flatMap(_ =>
          Seq(true -> once(true), false -> once(false)))
        def arm(p: Boolean): String = {
          val xs = walls.collect { case (`p`, w) => w }.sorted
          f"min=${xs.head}%.1fs med=${xs(xs.length / 2)}%.1fs"
        }
        s"planned-chunked ${arm(true)} | distributed ${arm(false)}"
      }
      windowStamp("wandserve end")
    }
    // ===== PPJoin/prefix-filter probe at 1M docs with ZIPF dfs (r13
    // VERDICT #3). EXPLICIT-ONLY (runMain graft.ScaleProbe ppjoin1m).
    // The registered sf0.1 fixture's near-uniform shingle dfs
    // understate the rarest-prefix pruning; this corpus has genuinely
    // Zipf token (hence shingle) frequencies, and near-dup structure
    // is PLANTED (doc_id % 17 → drop-3-leading-words copy) so
    // candidate and output volume are linear in the corpus by
    // construction. The receipt: candidate count vs the quadratic
    // bound n(n−1)/2, plus stage-attributed task stats (the skew
    // question — rarest-prefix postings must not concentrate).
    if (only.exists(_.contains("ppjoin1m"))) {
      windowStamp("ppjoin1m start")
      val zipf1m = spark.range(1000000).select(col("id").as("doc_id"),
        concat_ws(" ", expr(
          "transform(sequence(0, 59), i -> concat('w', " +
            "CAST(floor(log2(pmod(xxhash64(id * 100 + i), 65536) + 1)) " +
            "AS INT), '_', pmod(xxhash64(id * 100 + i + 7), 120)))"))
          .as("text"))
        .repartition(64)
      val copies1m = zipf1m.filter(pmod(col("doc_id"), lit(17)) === 0)
        .select((col("doc_id") + 100000000L).as("doc_id"),
          concat_ws(" ",
            slice(split(col("text"), " "), 4, 1000000)).as("text"))
      val corpus1m = zipf1m.unionByName(copies1m)
      val pl = new TaskStatsListener
      spark.sparkContext.addSparkListener(pl)
      try {
        var nDocs1m = 0L
        t("ppjoin1m: corpus materialize (1.06M zipf docs, planted " +
          "near-dups)")({ nDocs1m = corpus1m.count(); nDocs1m })
        val sh1m = Dedup.shingleIndex(corpus1m, 3)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        t("ppjoin1m: shingle index rows")(sh1m.count())
        val cand1m = Dedup.prefixFilterCandidates(sh1m, 0.5)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        var nCand = 0L
        t("ppjoin1m: rarest-prefix candidates (exact-complete at " +
          "θ=0.5)")({ nCand = cand1m.count(); nCand })
        t("ppjoin1m: exact verify -> pairs")(
          Dedup.verifyJaccard(cand1m, sh1m, 0.5).count())
        sh1m.unpersist(); cand1m.unpersist()
        // subquadratic receipt: candidates per doc vs the quadratic
        // bound — printed OUTSIDE any timed row
        val quad = nDocs1m.toDouble * (nDocs1m - 1) / 2
        println(f"[scale] ppjoin1m: candidates=$nCand " +
          f"(${nCand.toDouble / nDocs1m}%.2f/doc) vs quadratic bound " +
          f"${quad}%.3g — ratio ${nCand / quad}%.2e")
        // task stats OUTSIDE the timers — shared drain + print
        printTaskStats("ppjoin1m", pl)
        windowStamp("ppjoin1m end")
      } finally spark.sparkContext.removeSparkListener(pl)
    }
    // ===== Streaming admission SOAK (r13 VERDICT #6): the r13
    // per-micro-batch persist/unpersist fix has a spec but no
    // long-run receipt. EXPLICIT-ONLY (runMain graft.ScaleProbe
    // docsoak): ~100 micro-batches through the audio fingerprint
    // gate, recording the executor STORAGE curve (cached-RDD count +
    // bytes after every batch) — the law is FLAT (bounded per batch),
    // where the pre-fix localCheckpoint shape grew monotonically
    // until a driver GC. Wall per batch is recorded first-10 vs
    // last-10 as the no-slowdown twin.
    if (only.exists(_.contains("docsoak"))) {
      windowStamp("docsoak start")
      import spark.implicits._
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
      val aTable = "probe_soak_ahash"
      spark.sql(s"DROP TABLE IF EXISTS $aTable")
      val aPath = java.nio.file.Files
        .createTempDirectory("graft-soak-ahash").toString + "/idx"
      t("docsoak: build 2k-clip audio fingerprint index") {
        val baseClips = spark.range(2000).as[Long]
          .map(id => (id, graft.multimodal.Multimodal
            .renderClip(id, copy = false)))
          .toDF("doc_id", "payload")
        graft.plans.AhashIndexStore.build(baseClips, aTable, aPath)
        spark.table(aTable).count()
      }
      t("docsoak: 100 micro-batches x 200 clips through the audio " +
        "admission gate (storage curve must stay flat)") {
        // the law is NO GROWTH OVER THE PRE-STREAM BASELINE: this
        // probe file's own top-level fixtures hold a constant set of
        // localCheckpoints/persists (6 when run standalone), and the
        // per-batch fps.unpersist is non-blocking, so a snapshot may
        // transiently see one extra entry — what must NOT happen is
        // the monotone climb the pre-r13 localCheckpoint shape showed
        // (one pinned frame per micro-batch until a driver GC)
        val baseCached = spark.sparkContext.getRDDStorageInfo.length
        val in = org.apache.spark.sql.execution.streaming.runtime
          .MemoryStream[(Long, Array[Byte])]
        val admitted = new java.util.concurrent.atomic.AtomicLong(0)
        val q = graft.streaming.DocStreams.admitByAudioFingerprint(
          in.toDF().toDF("doc_id", "payload"), aTable) { (out, _) =>
          admitted.addAndGet(out.count()); ()
        }.start()
        val storageCurve = scala.collection.mutable.ArrayBuffer
          .empty[(Int, Long)] // (cached RDDs, bytes) per batch
        val batchWall = scala.collection.mutable.ArrayBuffer.empty[Double]
        try {
          (0 until 100).foreach { b =>
            // 100 fresh clips + 100 pitched copies of indexed ones —
            // every batch exercises both the admit and reject sides
            val rows = (0 until 100).map { i =>
              val id = 1000000L + b * 100L + i
              (id, graft.multimodal.Multimodal.renderClip(id, copy = false))
            } ++ (0 until 100).map { i =>
              val src = (b * 100L + i) % 2000L
              (2000000L + b * 100L + i,
                graft.multimodal.Multimodal.renderClip(src, copy = true))
            }
            val tb = System.nanoTime()
            in.addData(rows: _*)
            q.processAllAvailable()
            batchWall += (System.nanoTime() - tb) / 1e9
            val infos = spark.sparkContext.getRDDStorageInfo
            storageCurve += ((infos.length,
              infos.map(i => i.memSize + i.diskSize).sum))
          }
        } finally q.stop()
        val maxCached = if (storageCurve.isEmpty) 0
          else storageCurve.map(_._1).max
        val maxBytes = if (storageCurve.isEmpty) 0L
          else storageCurve.map(_._2).max
        val head10 = batchWall.take(10).sum / 10
        val tail10 = batchWall.takeRight(10).sum / 10
        require(maxCached <= baseCached + 2 &&
          storageCurve.last._1 <= baseCached + 1,
          s"executor storage must stay flat across the soak — baseline " +
            s"$baseCached cached RDDs, saw max $maxCached, " +
            s"ended at ${storageCurve.last._1} " +
            s"(curve tail: ${storageCurve.takeRight(5).mkString(", ")})")
        f"admitted=${admitted.get()} batches=100 baseline=$baseCached " +
          f"max_cached_rdds=$maxCached end=${storageCurve.last._1} " +
          f"max_cached_bytes=$maxBytes " +
          f"wall/batch head10=${head10}%.2fs tail10=${tail10}%.2fs"
      }
      windowStamp("docsoak end")
    }
    // ===== ANN at 1M vectors (r14): the EMBEDDING-side twin of the
    // minhash5m build probe. EXPLICIT-ONLY (runMain graft.ScaleProbe
    // ann1m). The registered ANN rows run at 20k vectors; the 100 TB
    // claim ("IVF cells, nlist-bounded driver state, no cartesian")
    // deserves a direct receipt at ~50× that. Corpus: 1.0M dim-64
    // vectors in 512 PLANTED clusters (centroid by cluster-keyed
    // xxhash64, ±0.35 uniform noise per component — deterministic, no
    // RNG), so exact ground truth has real cluster structure for IVF
    // to find instead of the degenerate replicate-the-fixture shape
    // where every query's true neighbors are its own clones. Laws:
    //   (a) nlist=√N sampled-cap build — driver state is nlist×64
    //       doubles + one 65,536-row train sample, NOT corpus-sized;
    //   (b) the serve scans a measured FRACTION of the corpus
    //       (Σ probed-cell sizes / (nQ × N) ≈ nprobe/nlist, the
    //       explicit scan-vs-recall dial) — required ≤ 0.15 at
    //       nprobe=32;
    //   (c) recall@10 vs the exact brute-force baseline ≥ 0.8 at
    //       nprobe=32 on this clustered corpus (measured alongside
    //       the honest brute-force wall the dial exists to avoid);
    //   (d) the heavy stages stay skew-free (task stats attributed).
    if (only.exists(_.contains("ann1m"))) {
      windowStamp("ann1m start")
      import spark.implicits._
      val nVec = 1000000L
      val vecs1m = spark.range(nVec).select(col("id").as("vec_id"),
        expr("transform(sequence(0, 63), j -> CAST(" +
          "(pmod(xxhash64(pmod(id, 512) * 64 + j), 2001) - 1000) / 1000.0" +
          " + (pmod(xxhash64(id * 64 + j + 31), 2001) - 1000) / 2857.0" +
          " AS FLOAT))").as("embedding"))
        .repartition(64)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val al = new TaskStatsListener
      spark.sparkContext.addSparkListener(al)
      val annTable = "probe_ann1m"
      val annPath = java.nio.file.Files
        .createTempDirectory("graft-ann1m").toString + "/ivf"
      try {
        t("ann1m: corpus materialize (1.0M dim-64 vectors, 512 " +
          "planted clusters)")(vecs1m.count())
        // nlist = 1024 ≈ √N (the textbook setting); train on a 65,536-
        // row hash-ordered sample (the sampled-build path whose recall
        // parity the 20k probe pins) — the full-corpus cost here is the
        // ONE assignment pass, linear and codegen'd
        t("ann1m: IVF build nlist=1024 (sampled train 65,536 rows, " +
          "assign 1M, bucketed save)")(
          plans.IvfIndexStore.build(vecs1m, 1024, annTable, annPath,
            buckets = 32, iters = 2, sampleCap = 65536))
        val queries1m = vecs1m.filter(col("vec_id") % 3907 === 0)
          .localCheckpoint(true) // 256 queries, pinned off the persist
        var gt: DataFrame = null
        t("ann1m: exact brute-force top-10 (256 queries × 1M — the " +
          "honest baseline the IVF dial exists to avoid)") {
          gt = operators.Similarity
            .bruteForceKnn(vecs1m, queries1m, 10)
            .select("query_id", "neighbor_id").localCheckpoint(true)
          gt.count()
        }
        def serveAndRecall(nprobe: Int): (Long, Double) = {
          var ann: DataFrame = null
          t(f"ann1m: store knn nprobe=$nprobe (broadcast queries × " +
            f"bucketed cells)") {
            ann = plans.IvfIndexStore
              .knn(queries1m, 10, nprobe, annTable)
              .select("query_id", "neighbor_id").localCheckpoint(true)
            ann.count()
          }
          val hits = ann.join(gt, Seq("query_id", "neighbor_id"))
            .count()
          val tot = gt.count()
          (hits, hits.toDouble / tot)
        }
        // nprobe=1 exists to show the dial has a GRADIENT: a cluster
        // that k-means split across cells loses the mates outside the
        // query's single home cell, so recall must dip below the
        // saturated nprobe=8/32 arms (no floor required — the dip IS
        // the receipt)
        val r1 = serveAndRecall(1)
        val r8 = serveAndRecall(8)
        val r32 = serveAndRecall(32)
        // the scan-fraction receipt: Σ probed-cell sizes over the
        // query batch vs nQ × N — the dial's measured position, from
        // the SAME centroids/cells the serve read (small driver jobs:
        // nlist-row group counts + a 256-row probe explode)
        val cents = plans.IvfIndexStore.loadCentroids(spark, annTable)
        val cellSizes = spark
          .table(plans.IvfIndexStore.cellsTable(annTable))
          .groupBy("cell").agg(count(lit(1)).as("n"))
        val nQ = queries1m.count()
        def scanFraction(nprobe: Int): Double = {
          val probed = queries1m.select(col("vec_id").as("query_id"),
            explode(graft.functions.IvfCells.cells(
              spark, col("embedding"), cents, nprobe)).as("cell"))
          val cand = probed.join(cellSizes, "cell")
            .agg(sum("n")).first.getLong(0)
          cand.toDouble / (nQ.toDouble * nVec)
        }
        val f1 = scanFraction(1)
        val f8 = scanFraction(8)
        val f32 = scanFraction(32)
        println(f"[scale] ann1m: recall@10 nprobe=1 ${r1._2}%.4f " +
          f"(scan ${f1 * 100}%.2f%%) | nprobe=8 ${r8._2}%.4f " +
          f"(scan ${f8 * 100}%.2f%%) | nprobe=32 " +
          f"${r32._2}%.4f (scan ${f32 * 100}%.2f%%) — " +
          f"${nQ} queries, hits ${r1._1}/${r8._1}/${r32._1}")
        require(r32._2 >= 0.8,
          f"nprobe=32 recall@10 must reach 0.8 on the planted-cluster " +
            f"corpus, got ${r32._2}%.4f")
        require(f32 <= 0.15,
          f"nprobe=32 must scan ≤ 15%% of the corpus per query " +
            f"(nprobe/nlist ≈ 3%%), got ${f32 * 100}%.2f%%")
        require(r8._2 >= r1._2 - 1e-9 && r32._2 >= r8._2 - 1e-9,
          "more probes must never lose recall")
        // task stats OUTSIDE the timers — shared drain + print
        printTaskStats("ann1m", al, top = 4)
        windowStamp("ann1m end")
      } finally {
        spark.sparkContext.removeSparkListener(al)
        vecs1m.unpersist()
      }
    }
    // ===== Sequence packing at 1M docs (r14): the two packing paths'
    // scale receipt. EXPLICIT-ONLY (runMain graft.ScaleProbe pack1m).
    // The registered rows and the 10× probe run ≤50k docs; the scale
    // claims are structural — exclusivePrefixSum's driver state is
    // O(#partitions) (a 64-row collect + broadcast offsets, never
    // corpus rows), and packWholeDocs' only window partitions by pack
    // CELL, dialed here from the fixture's 8 to 64 (the production
    // move: cells track executor memory, sort state stays per-cell).
    // Laws (require'd): token CONSERVATION through both paths — the
    // prefix sum's max(cum)+last = Σ n_tokens computed independently,
    // and the shelf manifest's Σ doc_tokens / Σ n_docs equal the
    // corpus totals exactly — plus a skew receipt on the cell window.
    if (only.exists(_.contains("pack1m"))) {
      windowStamp("pack1m start")
      val docs1m = replicate(
        Tables.documents(spark, d).select("doc_id", "text"),
        200, Seq("doc_id"), 10000000L)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val pkl = new TaskStatsListener
      spark.sparkContext.addSparkListener(pkl)
      try {
        var nDocs = 0L
        t("pack1m: corpus materialize (200 replicas of sf0.1 docs)")(
          { nDocs = docs1m.count(); nDocs })
        val toks1m = docs1m.select(col("doc_id"),
          size(graft.functions.TextFunctions.tokens(col("text")))
            .cast("long").as("n_tokens"))
        val totTokens = toks1m.agg(sum("n_tokens")).first.getLong(0)
        t("pack1m: two-level exclusive prefix sum (64 range " +
          "partitions, driver state = 64 offsets)") {
          val ps = operators.Sampling
            .exclusivePrefixSum(toks1m, "doc_id", "n_tokens", 64, "cum")
          val tail = ps.orderBy(col("cum").desc).limit(1)
            .select(col("cum") + col("n_tokens")).first.getLong(0)
          require(tail == totTokens,
            s"prefix-sum conservation: last cum+n ($tail) must equal " +
              s"Σ n_tokens ($totTokens)")
          tail
        }
        t("pack1m: whole-doc shelf packing (budget 4096, cells " +
          "dialed 8 → 64 for the 20× corpus)") {
          val m = operators.Sampling.packWholeDocs(docs1m, 4096L, 64L)
            .agg(sum("n_docs").as("nd"), sum("doc_tokens").as("dt"),
              count(lit(1)).as("shelves"), avg("fill").as("mean_fill"))
            .first
          require(m.getLong(0) == nDocs && m.getLong(1) == totTokens,
            s"shelf-manifest conservation: ${m.getLong(0)} docs / " +
              s"${m.getLong(1)} tokens vs corpus $nDocs / $totTokens")
          f"shelves=${m.getLong(2)} mean_fill=${m.getDouble(3)}%.4f"
        }
        // skew receipt OUTSIDE the timers — shared drain + print
        printTaskStats("pack1m", pkl)
        windowStamp("pack1m end")
      } finally {
        spark.sparkContext.removeSparkListener(pkl)
        docs1m.unpersist()
      }
    }
    spark.stop()
  }
}
