package graft.plans

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The store-agnostic half of MaxScore/WAND serving, shared by
  * [[Bm25IndexStore.wandSearch]] and [[TfidfIndexStore.wandSearch]]:
  * the df-only pre-route, the essential-terms split, the per-query
  * Σ-df pricing/routing, the hash-chunked exact-scoring loop, and the
  * final top-k assembly. The stores keep what genuinely differs —
  * impact column and units (BM25 `w` vs norm-scaled `wn`), query-side
  * derivation (tokenized text vs index-resident weights), candidate
  * scoring arithmetic, and cutoff algebra — and delegate the rest
  * here so a bound or routing fix lands in exactly one place.
  */
private[graft] object WandKernel {

  /** One 4dp rounding quantum: candidate thresholds step down by this
    * so a doc whose RAW score sits just under θ but ROUNDS to θ is
    * still captured — rounding can then never flip a miss into a
    * should-have-been tie.
    */
  val RoundEps = 1e-4

  /** Hard row budget for ONE scoring-broadcast chunk (candidate pairs
    * × their query's terms; tens of bytes per hashed-relation row, so
    * 4M rows is a couple hundred MB of executor state — far under the
    * default broadcast and driver-result limits the unchunked form
    * was measured to blow through on dense corpora).
    */
  val BroadcastRows = 4000000L

  /** Driver PAIR-STATE budget for [[serveDriverPlanned]]: the expanded
    * per-(query, doc) partial/cap cells, bounded above by
    * Σ_queries Σ_terms min(P, df). A cell is a boxed map entry
    * (~120 B), so 8M cells is ~1 GB of transient driver state — heavy
    * but inside the session heap, and DISTINCT from the prefix COLLECT
    * cap: since the collect now prices distinct terms, a
    * shared-vocabulary batch can expand to 2× the old pair budget
    * while collecting a fraction of it. Past this, the distributed
    * orchestration serves.
    */
  val DriverPairCells = 8000000L

  /** Probe counters — the serving-path scale probe's structural
    * evidence (ScaleProbe `wandserve`): how often the one-job bounded
    * fetch refused, how often driver planning served vs refused to the
    * distributed orchestration, and how often exact scoring left the
    * single-chunk fast path. Plain AtomicLong increments on already-
    * driver-side code paths (never per row), never read by production
    * logic — the probe snapshots deltas around a serve loop.
    */
  private[graft] val statBoundedCalls =
    new java.util.concurrent.atomic.AtomicLong
  private[graft] val statBoundedRefusals =
    new java.util.concurrent.atomic.AtomicLong
  private[graft] val statDriverPlannedServes =
    new java.util.concurrent.atomic.AtomicLong
  private[graft] val statDriverPlanningRefusals =
    new java.util.concurrent.atomic.AtomicLong
  private[graft] val statChunkedScoreFallbacks =
    new java.util.concurrent.atomic.AtomicLong

  /** Test seam (InvariantProps' refusal-boundary law): when set,
    * replaces [[DriverPairCells]] inside [[serveDriverPlanned]] so the
    * law can place the cap BETWEEN the frozen-df estimate and the
    * true rank-0-extended expansion and pin the refusal either side.
    * ThreadLocal, not a plain var: driver planning runs on the calling
    * thread, and a process-global override would leak a tiny test cap
    * into any concurrently-served production query (and a concurrent
    * call would race the law's read of the refusal flag below).
    * Production never touches it.
    */
  private[graft] val pairCellsCapOverride =
    new ThreadLocal[Option[Long]] {
      override def initialValue(): Option[Long] = None
    }

  /** Test seam: whether this THREAD's last [[serveDriverPlanned]]
    * call refused (returned None — the store falls back to the
    * distributed orchestration). Observable evidence for the refusal
    * law; not read by production code.
    */
  private[graft] val lastRefusedDriverPlanning =
    new ThreadLocal[java.lang.Boolean] {
      override def initialValue(): java.lang.Boolean = false
    }

  /** Test seam: this THREAD's last driver-planned ROUTE SPLIT —
    * (batch queries, pre-route-eligible, wand-routed). The regime-
    * selector spec reads it to pin that the in-kernel per-query
    * routing — the data-computable dense-vs-sparse rule the served
    * retrieval rows rely on — sends dense doc-as-query batches to the
    * naive kernel (wand-routed = 0) and selective keyword batches to
    * WAND (wand-routed > 0). Not read by production code.
    */
  private[graft] val lastRouteStats =
    new ThreadLocal[(Int, Int, Int)] {
      override def initialValue(): (Int, Int, Int) = (0, 0, 0)
    }

  /** ONE-job bounded collect — the driver-planned paths' query-batch
    * fetch. The previous shape (eager checkpoint → `count` → `collect`)
    * cost THREE driver-sequenced actions before any serving work, and
    * the obvious `limit(cap+1).collect()` replacement is no better:
    * executeTake scales partitions up incrementally (1 → 4 → 16 → …),
    * each step its own sequential job. Every small action pays a fixed
    * scheduler latency that multiplies under host contention — the
    * measured 3-6× loaded-window balloon on the serving rows — so this
    * fetches AND bounds in ONE job, with three hard guarantees:
    *
    *   - refusal is EXACTLY `count > cap` — no partitioning-shape
    *     sensitivity (the prefix scan is BUCKETED by term, so a
    *     term-concentrated batch legitimately packs one partition;
    *     an even-share-based per-task budget would falsely refuse it);
    *   - driver memory is bounded at ~cap rows: results stream through
    *     an incremental handler that stops buffering the moment the
    *     running total refuses, instead of collecting every task's
    *     rows first and checking after;
    *   - refusal work is bounded: a task stops scanning at its
    *     (cap+1)-th row (a single over-cap partition already decides
    *     the global verdict), and the driver CANCELS the job as soon
    *     as the running total crosses the cap, so an over-cap fetch
    *     never pays a full scan before falling back.
    *
    * ROW ORDER IS UNSPECIFIED — rows arrive in task-COMPLETION order,
    * unlike the partition-ordered `collect()` this replaced. Every
    * current consumer folds the rows into hash maps (and the θ-seed
    * fp-sum reordering is covered by the ulp/seed-set argument); a
    * future caller that needs collect-like ordering must sort or use
    * plain `collect`. A non-refusal task FAILURE propagates exactly as
    * `collect` would (the await rethrows the job's SparkException; the
    * poll loop observes the failed future and terminates — spec-pinned
    * in IndexStoreSpec).
    *
    * Returns None to refuse — the caller's distributed path serves;
    * the fallback is a performance path, never a correctness one.
    */
  def boundedCollect[T: scala.reflect.ClassTag](
      ds: org.apache.spark.sql.Dataset[T], cap: Long): Option[Array[T]] = {
    statBoundedCalls.incrementAndGet()
    def refusedResult: Option[Array[T]] = {
      statBoundedRefusals.incrementAndGet()
      None
    }
    val rdd = ds.rdd
    if (rdd.getNumPartitions == 0) return Some(Array.empty[T])
    val sc = ds.sparkSession.sparkContext
    val buf = scala.collection.mutable.ArrayBuffer.empty[T]
    @volatile var refused = false
    var total = 0L
    val lock = new Object
    val action = sc.submitJob[T, (Long, Array[T]), Unit](
      rdd,
      (it: Iterator[T]) => {
        val b = scala.collection.mutable.ArrayBuffer.empty[T]
        var cnt = 0L
        var over = false
        while (!over && it.hasNext) {
          val r = it.next(); cnt += 1L
          // cap+1 in ONE partition decides the global refusal — stop
          // scanning and ship the verdict, not the rows
          if (cnt > cap) over = true else b += r
        }
        (cnt, if (over) null else b.toArray)
      },
      0 until rdd.getNumPartitions,
      (_: Int, res: (Long, Array[T])) => lock.synchronized {
        if (!refused) {
          total += res._1
          if (res._2 == null || total > cap) refused = true
          else buf ++= res._2
        }
      },
      ())
    // await completion, cancelling the remaining tasks the moment the
    // running total refuses (the poll interval only delays the CANCEL,
    // never the accept path — completion is observed immediately)
    try {
      while (!action.isCompleted && !refused) Thread.sleep(2)
      if (refused) {
        action.cancel()
        refusedResult
      } else {
        // completed un-refused: surface task failures as the plain
        // collect would, then hand back the buffered rows
        scala.concurrent.Await.result(
          action, scala.concurrent.duration.Duration.Inf)
        lock.synchronized {
          if (refused) refusedResult else Some(buf.toArray)
        }
      }
    } catch {
      case e: Throwable if refused =>
        // cancellation surfacing through the future after we refused
        refusedResult
    }
  }

  /** Volume advantage WAND must show before a query routes to it:
    * use_wand ⇔ vol × RouteVolFactor < estn. r14 set 2 ("pruning must
    * at least halve the volume") when the naive kernel shuffled the
    * EXPANDED pair stream; the r15 doc_id co-location made naive
    * rows ~an order of magnitude cheaper than WAND's exact-scoring
    * broadcast rows, so the 2× bar systematically mis-priced wall
    * clock (measured, 50k-doc zipf corpus, estn/vol ≈ 10 workloads:
    * naive 2.95 s vs WAND 7.10 s at 500 queries; 44.2 vs 61.4 s at
    * 50k — WAND lost every probed scale it was routed to). 16 is the
    * measured breakeven from those receipts (c_score ≈ 10-16× c_naive
    * per priced row, plus the fixed driver-planning actions): WAND now
    * engages only where pruning shrinks the volume by an order of
    * magnitude and a half — the needle-in-haystack keyword regime
    * where its candidate-bounded volume is corpus-independent
    * insurance — and every shallower batch takes the co-located naive
    * kernel that measurably wins there. Output-invariant by the
    * pruning-exactness laws (IndexStoreSpec pins wandSearch ≡ search
    * on both regimes).
    */
  val RouteVolFactor = 16L

  /** PRE-ROUTE on the df table alone (no postings scan): even in a
    * query's optimistic best case — every prefix slot a distinct
    * candidate, zero tail rows — its WAND volume is Σ min(P, df)
    * candidates × (1 + nt) scoring rows; a query that already fails
    * the [[RouteVolFactor]] bar there can never WAND-serve, so it
    * skips the entire θ/cap/cutoff pipeline. On dense-overlap corpora
    * NO query is eligible and WAND's whole overhead collapses to this
    * one df-table aggregation in front of the naive kernel.
    *
    * ONE checkpointed frame carries everything per-query the later
    * stages read — `eligible` (the pre-route verdict), `estn` (the
    * naive Σ-df price), `nt` (term count, the broadcast-volume
    * factor) — so the pre-route, the pricing, and the chunk budget
    * share a single driver-sequenced job instead of three.
    * `qdf` is one (query_id, tkey, df) row per matched query term.
    */
  def queryStats(qdf: DataFrame, prefixP: Int): DataFrame =
    qdf.groupBy("query_id")
      .agg(sum(least(col("df"), lit(prefixP.toLong))).as("estpre"),
        sum("df").as("estn"), count(lit(1)).as("nt"))
      .withColumn("eligible",
        col("estpre") * (lit(1L) + col("nt")) * RouteVolFactor <
          col("estn"))
      .select("query_id", "estn", "nt", "eligible")
      .localCheckpoint(true)

  /** The MaxScore essential split — the SECOND sound tail rule: order
    * a query's terms by ascending contribution cap and mark the
    * maximal low-cap suffix whose cap sum stays under θ as
    * NON-ESSENTIAL; a doc outside the prefix with no essential-term
    * posting scores at most that sum < θ. Candidates under this rule
    * are ALL tail rows of essential terms (no weight cutoff — a
    * sub-cutoff essential row can still combine with others past θ,
    * which is exactly where per-term cutoffs are unsound to stack).
    * The rules prune complementary shapes: cutoffs win when θ clears
    * the whole cap sum (selective queries — tails drop entirely); the
    * split wins when a few high-cap terms carry θ and the huge
    * low-impact lists become non-essential.
    * `caps` must have (query_id, tkey, <capCol>); returns the
    * essential (query_id, tkey) pairs.
    */
  def essentialSplit(
      caps: DataFrame, capCol: String, theta: DataFrame): DataFrame = {
    val wAsc = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy(col(capCol).asc, col("tkey"))
    caps.join(theta, "query_id")
      .withColumn("cum", sum(capCol).over(wAsc))
      .filter(col("cum") >= col("theta") - lit(RoundEps))
      .select("query_id", "tkey")
  }

  /** ROUTE: tail rule by price, then WAND only when the FULL pruned
    * volume beats the naive one by [[RouteVolFactor]] (the measured
    * per-row cost ratio between the exact-scoring broadcast and the
    * co-located naive kernel). The pruned volume is est
    * (tail rows emitted) PLUS the exact-scoring broadcast, ≤
    * (est + npref) candidates × nt terms — the nt factor is what a
    * Σ-df-only price missed, measured as 25+ CONCURRENT 4M-row chunk
    * broadcasts OOMing the driver on the dense replica corpus
    * (candidates ≈ queries × docs there; the bucketed join is both
    * cheaper AND bounded, so that regime must route naive).
    * Returns (query_id, use_ess, use_wand, vol) for the ELIGIBLE
    * queries — `vol` is the priced upper bound on the query's scoring-
    * broadcast rows ((tail-rule Σ df + prefix pairs) × (1 + nt)), kept
    * in the output so [[chunkedScores]] can size its chunking WITHOUT
    * first materializing the candidate set. Checkpointed (three
    * consumers — chosen cutoffs, the wand-id semi join, the naive
    * remainder — would otherwise recompute it).
    */
  def routes(qstats: DataFrame, est1: DataFrame, est2: DataFrame,
      nPref: DataFrame): DataFrame =
    qstats.filter(col("eligible"))
      .select("query_id", "estn", "nt")
      .join(est1, Seq("query_id"), "left")
      .join(est2, Seq("query_id"), "left")
      .join(nPref, Seq("query_id"), "left")
      .select(col("query_id"),
        (coalesce(col("est2"), lit(0L)) <
          coalesce(col("est1"), lit(0L))).as("use_ess"),
        ((least(coalesce(col("est1"), lit(0L)),
            coalesce(col("est2"), lit(0L)))
          + coalesce(col("npref"), lit(0L)))
          * (lit(1L) + coalesce(col("nt"), lit(0L)))).as("vol"),
        col("estn"))
      .select(col("query_id"), col("use_ess"), col("vol"),
        (col("vol") * RouteVolFactor < col("estn")).as("use_wand"))
      .localCheckpoint(true)

  /** The wand-routed batch's total priced scoring volume — a tiny
    * local aggregation over the checkpointed routes frame; an UPPER
    * bound on the exact broadcast rows (vol over-counts tail rows by
    * the cutoffs' slack), which is what lets the single-chunk fast
    * path below skip materializing the candidates.
    */
  def pricedRows(routes: DataFrame): Long =
    routes.filter(col("use_wand"))
      .agg(coalesce(sum("vol"), lit(0L))).first.getLong(0)

  /** The chosen tail-probe rows: per-term cutoffs for wand-routed
    * queries priced onto rule 1, whole essential lists (cut = −∞) for
    * rule 2 — a single (query_id, tkey, cut) frame the store joins
    * against its tail postings. Not checkpointed: one consumer (the
    * tail scan's broadcast), and every input is batch-sized off
    * checkpointed frames — its subplan rides the tail scan's job
    * instead of costing its own.
    */
  def chosenCutoffs(cutoffs: DataFrame, essential: DataFrame,
      routes: DataFrame): DataFrame =
    cutoffs.join(routes, "query_id")
      .filter(col("use_wand") && !col("use_ess"))
      .select("query_id", "tkey", "cut")
      .unionByName(essential.join(routes, "query_id")
        .filter(col("use_wand") && col("use_ess"))
        .select(col("query_id"), col("tkey"),
          lit(Double.MinValue).as("cut")))

  /** Chunk the exact-scoring broadcast under the hard budget; the
    * selective regime this path serves fits one chunk, and each extra
    * chunk costs one more bounded postings scan — bounded state over
    * scan count, deliberately. Each chunk reduces to its own
    * per-query top-k and is EAGERLY materialized: chunks are
    * (query, doc)-hash disjoint, so any pair a chunk's top-k drops is
    * dominated by k pairs that survive into the union and the global
    * top-k is exact — and the materialization forces chunks to
    * execute one at a time, so exactly ONE chunk broadcast is live at
    * any moment (a lazy union holds every chunk's broadcast
    * simultaneously, which is the unbounded state the budget exists
    * to prevent). `score` maps a candidate (query_id, doc_id) frame
    * to exact (query_id, doc_id, score) rows.
    */
  def chunkedScores(cand: DataFrame, qCnt: DataFrame,
      broadcastRows: Long, topN: Int, estRows: Long)(
      score: DataFrame => DataFrame): DataFrame = {
    import graft.functions.TopKAgg
    def reduceChunk(c: DataFrame): DataFrame =
      score(c)
        .groupBy("query_id")
        .agg(TopKAgg.topK(topN, col("score"), col("doc_id")).as("top"))
        .select(col("query_id"), explode(col("top")).as("r"))
        .select(col("query_id"), col("r._2").as("doc_id"),
          col("r._1").as("score"))
    // FAST PATH — the selective regime WAND exists for: when even the
    // priced UPPER bound fits one chunk, the candidate set needs no
    // materialization and no exact count — its subplan (tail scan +
    // prefix pairs) rides the one scoring job, two driver-sequenced
    // jobs fewer than the general path
    if (estRows <= broadcastRows) return reduceChunk(cand)
    statChunkedScoreFallbacks.incrementAndGet()
    val candM = cand.localCheckpoint(true)
    val bRows = candM.join(broadcast(qCnt), "query_id")
      .agg(coalesce(sum("nt"), lit(0L))).first.getLong(0)
    val nChunks =
      math.max(1L, (bRows + broadcastRows - 1) / broadcastRows).toInt
    (0 until nChunks).map { i =>
      val part = reduceChunk(
        if (nChunks == 1) candM
        else candM.filter(pmod(
          xxhash64(col("query_id"), col("doc_id")), lit(nChunks)) === i))
      if (nChunks == 1) part else part.localCheckpoint(true)
    }.reduce(_ unionByName _)
  }

  /** Driver-planned WAND serving for collectable batches — the
    * store-generic orchestration behind both stores' fast path. The
    * θ/caps/cutoffs/essential/routing state is QUERY-BATCH-sized, yet
    * the distributed orchestration pays a driver-sequenced Spark
    * action (and its AQE stage cascade) per stage — measured ~60 jobs
    * per call, which swamps the pruning win whenever the corpus side
    * is not enormous. Here the SAME algebra runs locally between at
    * most FOUR Spark actions:
    *
    *   1. ONE bounded job fetches the query rows — the caller's
    *      [[boundedCollect]]; no eager checkpoint, no separate count
    *      action (the r12 shape paid three driver-sequenced actions
    *      here, which is where the loaded-window latency multiplied);
    *      eligibility/pricing arithmetic is local (an all-ineligible
    *      batch returns the naive plan immediately — one scan);
    *   2. ONE prefix scan, collected (bounded by Σ min(P, df), checked
    *      before the scan; `limit` is the HARD bound — see below);
    *   3. ONE candidate-bounded scan exact-scores the θ seeds (only
    *      when the free partial θ lets too much volume through);
    *   4. ONE final plan (tail scan + exact scoring + naive remainder
    *      + top-k) — the only action whose output is the result.
    *
    * Generic over the stores' scoring algebra: `qf` is the
    * per-(query, term) query factor (1 for BM25's additive weights,
    * wq/‖q‖ for tf-idf cosine) and `impact` is whatever per-posting
    * column the closures expose (BM25 `w`; tf-idf `wn` = w/‖d‖) — a
    * pair's score is Σ qf·impact in both stores, so caps (qf · P-th
    * impact), per-term tail cutoffs (re-expressed in impact units by
    * dividing by qf; qf ≤ 0 terms cannot lift a doc and emit none),
    * the essential split, the per-pair bound, and the Σ-df routing all
    * run unchanged.
    *
    * Soundness under local float jitter: partial prefix sums pick the
    * SEED SET only, and θ is the topN-th of the seeds' SPARK-computed
    * exact 4dp scores — any seed set gives a valid lower bound, so the
    * pruning proof is unchanged; caps are exact mins; the RoundEps
    * slack absorbs summation-order noise in the cutoff algebra (the
    * same argument the distributed form relies on). Output therefore
    * matches the store's `search` row-for-row. Returns None when a
    * DRIVER-STATE cap trips (the pair-cells expansion or a collect
    * budget) — the distributed orchestration serves those. A priced
    * scoring volume past the single-chunk budget is NOT a refusal
    * (r14): the serve runs the same hash-disjoint [[chunkedScores]]
    * loop driver-planned, since the overrun lives in executor-side
    * broadcast state the chunking already bounds, not in driver
    * memory.
    *
    * `qRows`: one (query_id, tkey, qf, df) row per matched query term.
    * `scanPrefix`: the DISTINCT eligible (tkey) keys → the LAZY prefix
    * frame (tkey, doc_id, impact, rnk_w) — per-query expansion happens
    * on the driver, so shared terms are scanned and collected once;
    * the kernel fetches it in ONE job under [[boundedCollect]]'s
    * per-task hard budget — the Σ min(P, df) pre-check is an early
    * refusal, NOT the memory bound:
    * rank-0 extended postings all pass `rnk_w <= P` while the frozen
    * df table never counts them, so a heavily extended artifact can
    * exceed the estimate arbitrarily; an overrun falls back to the
    * distributed path, which keeps these rows in executors.
    * `scanTail`: chosen (query_id, tkey, cut) rows (cut in impact
    * units; −∞ = whole essential list) → tail candidate
    * (query_id, doc_id) pairs, self-matches already excluded.
    * `naivePlan`: (query_id, doc_id, score) rows for a query-id set —
    * the store's Σ-postings kernel restricted to those ids. May return
    * PARTIAL rows (per-partition top-`topN`, the
    * [[naivePartialTopK]] contract) as long as each query's exact
    * top-`topN` is present — every consumer reduces through
    * [[finalTopK]] at the same `topN`.
    * `scoreCand`: candidate (query_id, doc_id) pairs → exact
    * (query_id, doc_id, score) rows — the store's `search` arithmetic.
    */
  def serveDriverPlanned(
      spark: SparkSession,
      qRows: Array[(Long, Long, Double, Long)],
      topN: Int, prefixP: Int, broadcastRows: Long,
      prefixCollectCap: Long,
      scanPrefix: DataFrame => DataFrame,
      scanTail: DataFrame => DataFrame,
      naivePlan: Set[Long] => DataFrame,
      scoreCand: DataFrame => DataFrame,
      scoreName: String,
      pairCellsCap: Long = DriverPairCells,
      isDead: Long => Boolean = _ => false): Option[DataFrame] = {
    import spark.implicits._
    lastRefusedDriverPlanning.set(false)
    def refuse(): Option[DataFrame] = {
      lastRefusedDriverPlanning.set(true)
      statDriverPlanningRefusals.incrementAndGet()
      None
    }
    def served(df: DataFrame): Option[DataFrame] = {
      statDriverPlannedServes.incrementAndGet()
      Some(df)
    }
    val cellsCap = pairCellsCapOverride.get().getOrElse(pairCellsCap)
    val byQ = qRows.groupBy(_._1)
    val estn = byQ.map { case (k, rs) => k -> rs.map(_._4).sum }
    val estpre = byQ.map { case (k, rs) =>
      k -> rs.map(r => math.min(prefixP.toLong, r._4)).sum }
    val nt = byQ.map { case (k, rs) => k -> rs.length.toLong }
    val dfOf = qRows.map(r => (r._1, r._2) -> r._4).toMap
    val qfOf = qRows.map(r => (r._1, r._2) -> r._3).toMap
    val eligible = byQ.keysIterator
      .filter(k =>
        estpre(k) * (1L + nt(k)) * RouteVolFactor < estn(k)).toSet
    val allQ = byQ.keySet
    // route-split default (everything naive); the serve() returns
    // below overwrite the wand-routed count — see [[lastRouteStats]]
    lastRouteStats.set((allQ.size, eligible.size, 0))
    if (eligible.isEmpty)
      return served(finalTopK(naivePlan(allQ), topN, scoreName))
    // two distinct refusals: the EXPANDED pair-state volume (driver
    // memory for the per-(query, doc) cells — [[DriverPairCells]]) and,
    // below, the distinct-term COLLECT volume (Spark→driver transfer —
    // `prefixCollectCap`). They were one check when the collect was
    // per-(query, term); splitting them is what lets shared-vocabulary
    // batches twice as large stay driver-planned.
    if (eligible.iterator.map(estpre).sum > cellsCap) return refuse()
    // action 2: the ONE prefix scan, hard-bounded by the limit — over
    // DISTINCT ELIGIBLE TERMS, not (query, term) pairs: queries
    // sharing a term (the stopword slots of a keyword batch) would
    // otherwise each pull the same P prefix rows through the scan join
    // AND the driver collect — on the 20k-query zipf batch the
    // distinct-term form collects ~600k rows where the joined form
    // collected ~2.5M, and the collect CAP now prices distinct terms,
    // so shared-vocabulary batches several times larger stay eligible
    // for driver planning. The per-query expansion runs driver-locally
    // over the tkey → queries index below, whose volume the estpre
    // pre-check above already bounds (wall-clock on the zipf row is
    // unchanged — the expanded pair state, not the collect, dominates).
    val queriesOfTerm: Map[Long, Seq[Long]] =
      qRows.iterator.filter(r => eligible(r._1)).toSeq.groupBy(_._2)
        .map { case (t, rs) => t -> rs.map(_._1) }
    val dfOfTerm = qRows.iterator.map(r => r._2 -> r._4).toMap
    if (queriesOfTerm.keysIterator.map(t =>
        math.min(prefixP.toLong, dfOfTerm(t))).sum > prefixCollectCap)
      return refuse()
    // ONE bounded job, not limit(cap+1).collect(): executeTake scales
    // partitions up incrementally (1 → 4 → 16 → …), each step its own
    // sequential job — the per-action latency the loaded-window
    // balloon multiplies. boundedCollect keeps the hard driver bound
    // (≤ ~4·cap rows transiently even on rank-0-extended overruns —
    // the frozen-df estimate never counts those rows) and refuses in
    // the same cases the limit-then-recheck shape did.
    val prefixT = boundedCollect(
      scanPrefix(queriesOfTerm.keysIterator.toSeq.toDF("tkey"))
        .as[(Long, Long, Double, Int)], prefixCollectCap) match {
      case None => return refuse()
      case Some(rows) => rows
    }
    // EXACT expansion re-check, now that the true prefix row counts
    // are known: the estpre pre-check above prices frozen df, which
    // rank-0 EXTENDED postings evade (extend never rewrites df), so a
    // heavily extended artifact with shared query terms can expand to
    // rows_t × |Q_t| cells far past the estimate. Refuse driver
    // planning here — before any capb/pair map is built — and fall
    // back to the distributed orchestration, whose state is per-batch
    // bounded.
    locally {
      val rowsOfTerm =
        scala.collection.mutable.HashMap.empty[Long, Long]
      prefixT.foreach { case (t, _, _, _) =>
        rowsOfTerm.update(t, rowsOfTerm.getOrElse(t, 0L) + 1L) }
      val expanded = rowsOfTerm.iterator.map { case (t, n) =>
        n * queriesOfTerm(t).size }.sum
      if (expanded > cellsCap) return refuse()
    }
    // θ-independent state: partial pair scores (self excluded), caps
    // over TRUE ranks (rank-0 extended rows are always candidates),
    // and each pair's matched-cap sum (the per-pair bound's input).
    // Caps are computed once per TERM (the P-th impact is query-
    // independent) and fanned out to (query, term) via qf; the pair
    // pass expands term-major — same multiset of updates as the old
    // joined form, so the algebra is unchanged (summation order inside
    // a pair's partial may differ in ulps, which only moves the SEED
    // SET — any seed set yields a valid θ, the documented argument).
    val capStatsT =
      scala.collection.mutable.HashMap.empty[Long, Double]
    prefixT.foreach { case (t, _, imp, r) =>
      if (r >= 1 && imp < capStatsT.getOrElse(t, Double.MaxValue))
        capStatsT.update(t, imp)
    }
    // GAP-TOLERANT cap rule — compaction removes retired docs' rows
    // WITHOUT re-ranking, so a term's prefix can hold fewer than P
    // surviving rows while a tail still exists. "No tail" therefore
    // comes from the FROZEN df alone (df ≤ P ⇒ the build-time list fit
    // in the prefix; deletion only shrinks it — sound), never from the
    // surviving row count (the pre-fix rule priced such tails at cap 0
    // and silently dropped their score mass — caught by the
    // q_bm25_index_delete tri-SF sweep). When a tail exists the cap is
    // the min surviving prefix impact: every surviving prefix row has
    // rank ≤ P so impact ≥ the original P-th, which bounds every tail
    // row. A tailed term with ZERO surviving prefix rows leaves no
    // sound cap at all — its queries route to the naive kernel.
    val uncappable: Set[Long] = queriesOfTerm.iterator.collect {
      case (t, qs) if dfOfTerm(t) > prefixP && !capStatsT.contains(t) =>
        qs
    }.flatten.toSet
    val cappable = eligible -- uncappable
    if (cappable.isEmpty)
      return served(finalTopK(naivePlan(allQ), topN, scoreName))
    val capImp =
      scala.collection.mutable.HashMap.empty[(Long, Long), Double]
    val capb =
      scala.collection.mutable.HashMap.empty[(Long, Long), Double]
    capStatsT.foreach { case (t, minImp) =>
      val ci = if (dfOfTerm(t) <= prefixP) 0.0 else minImp
      queriesOfTerm(t).foreach { k =>
        capImp.update((k, t), ci)
        capb.update((k, t), qfOf.getOrElse((k, t), 0.0) * ci)
      }
    }
    val capTotal = {
      val m = scala.collection.mutable.HashMap.empty[Long, Double]
      capb.foreach { case ((k, _), cb) =>
        m.update(k, m.getOrElse(k, 0.0) + cb) }
      m.withDefaultValue(0.0)
    }
    // pair cell: (partial score sum, matched-cap sum). Tombstoned docs
    // (isDead — see [[Retire]]) never become candidates or θ-seeds; they
    // DO stay in capStats above, where a dead doc's weight only loosens
    // an upper bound (compaction restores tightness, the same story as
    // rank-0 extended postings).
    val pair =
      scala.collection.mutable.HashMap.empty[(Long, Long), Array[Double]]
    prefixT.foreach { case (t, doc, imp, _) =>
      queriesOfTerm(t).foreach { k =>
        if (doc != k && !isDead(doc)) {
          val cell = pair.getOrElseUpdate((k, doc), Array(0.0, 0.0))
          cell(0) += qfOf.getOrElse((k, t), 0.0) * imp
          cell(1) += capb.getOrElse((k, t), 0.0)
        }
      }
    }
    // per-query pair lists, built once, reused by θ selection + seeds
    // — CAPPABLE queries only: an uncappable query routes naive
    // unconditionally, so seeding/scoring θ for it would be one dead
    // exact-scoring action's worth of work per batch
    val pairsByQ = scala.collection.mutable.HashMap
      .empty[Long, scala.collection.mutable.ArrayBuffer[(Long, Double)]]
    pair.foreach { case ((k, doc), cell) =>
      if (cappable(k))
        pairsByQ.getOrElseUpdate(k,
          scala.collection.mutable.ArrayBuffer.empty) += ((doc, cell(0)))
    }

    /** The whole cutoff/essential/candidate/pricing algebra as a
      * function of θ — run twice at most: once under the FREE partial
      * θ (the k-th best prefix-partial score lower-bounds the true
      * k-th: pointwise partial ≤ true), and only if that volume
      * overruns the budget, again under the exact-seed θ (one more
      * Spark action buying a tighter bound — the flat-impact regime
      * where partial θ lets whole tails through).
      */
    case class Algebra(
        cutoffs: Seq[(Long, Long, Double)], essential: Seq[(Long, Long)],
        candPairs: Seq[(Long, Long)], useEss: Map[Long, Boolean],
        wandIds: Set[Long], volSum: Long)
    def algebra(thetaOf: Long => Double): Algebra = {
      val cutoffs = capb.iterator.flatMap { case ((k, t), cb) =>
        val qf = qfOf.getOrElse((k, t), 0.0)
        if (qf <= 0.0) None // a zero-weight term cannot lift any doc
        else {
          val cut = (thetaOf(k) - RoundEps - capTotal(k) + cb) / qf
          if (cut <= capImp((k, t))) Some((k, t, cut)) else None
        }
      }.toSeq
      val essential = capb.toSeq.groupBy(_._1._1).iterator.flatMap {
        case (k, cs) =>
          val sorted = cs.sortBy { case ((_, t), cb) => (cb, t) }
          var cum = 0.0
          sorted.flatMap { case ((_, t), cb) =>
            cum += cb
            if (cum >= thetaOf(k) - RoundEps) Some((k, t))
            else None
          }
      }.toSeq
      // the per-PAIR candidate bound the driver-planned path gets free
      // (the distributed form would pay another batch join for it): a
      // prefix doc's full score is ≤ its partial score + Σ capb of the
      // query terms it did NOT match in the prefix (each is either a
      // tail posting ≤ capb or absent = 0), so pairs provably below
      // θ − ε never enter the scoring broadcast — on stopword-heavy
      // queries this is most of the prefix candidates (docs touching
      // only a stopword slot)
      val candPairs = pair.iterator.filter { case ((k, _), cell) =>
        cell(0) + capTotal(k) - cell(1) >= thetaOf(k) - RoundEps
      }.map(_._1).toSeq
      val est1 = cutoffs.groupBy(_._1).map { case (k, cs) =>
        k -> cs.map(c => dfOf.getOrElse((k, c._2), 0L)).sum }
      val est2 = essential.groupBy(_._1).map { case (k, es) =>
        k -> es.map(e => dfOf.getOrElse((k, e._2), 0L)).sum }
      val npref = candPairs.groupBy(_._1)
        .map { case (k, ps) => k -> ps.length.toLong }
      val useEss = cappable.iterator.map { k =>
        k -> (est2.getOrElse(k, 0L) < est1.getOrElse(k, 0L)) }.toMap
      val vol = cappable.iterator.map { k =>
        k -> (math.min(est1.getOrElse(k, 0L), est2.getOrElse(k, 0L)) +
          npref.getOrElse(k, 0L)) * (1L + nt(k)) }.toMap
      val wandIds = cappable.filter(k =>
        vol(k) * RouteVolFactor < estn(k))
      Algebra(cutoffs, essential, candPairs, useEss, wandIds,
        wandIds.iterator.map(vol).sum)
    }

    def serve(a: Algebra): DataFrame = {
      val chosen =
        a.cutoffs.filter(c => a.wandIds(c._1) && !a.useEss(c._1)) ++
          a.essential.filter(e => a.wandIds(e._1) && a.useEss(e._1))
            .map(e => (e._1, e._2, Double.MinValue))
      // final action: tail probe + exact scoring + naive remainder +
      // top-k — with the DEAD subplans dropped up front (locally known):
      // an empty chosen set means no tail scan at all, and an all-wand
      // batch means no naive remainder scan
      val candA = a.candPairs.filter(p => a.wandIds(p._1))
        .toDF("query_id", "doc_id")
      val cand =
        if (chosen.isEmpty) candA
        else candA.unionByName(
          scanTail(chosen.toDF("query_id", "tkey", "cut"))).distinct()
      // exact scoring under the hard chunk budget. The selective
      // regime fits one chunk and keeps the previous inline plan; a
      // MID-SIZE batch whose priced volume overruns the budget now
      // serves CHUNKED from the driver-planned path (r14) instead of
      // refusing to the distributed orchestration — the chunks are
      // the SAME [[chunkedScores]] machinery (hash-disjoint, per-chunk
      // top-k, lossless — spec-pinned), executor state stays bounded
      // at one live chunk broadcast either way, and the serve pays
      // ~nChunks eager actions instead of the distributed planning
      // cascade (measured on the 10k-query × 500k-doc probe: the
      // distributed route cost 42 s / 14 driver-sequenced + 94 side
      // jobs; see BASELINE round-14).
      val wandScores =
        if (a.volSum <= broadcastRows) scoreCand(cand)
        else chunkedScores(cand,
          a.wandIds.iterator.map(k => (k, nt(k))).toSeq.toDF("query_id", "nt"),
          broadcastRows, topN, a.volSum)(scoreCand)
      val naiveIds = allQ -- a.wandIds
      val scores =
        if (naiveIds.isEmpty) wandScores
        else wandScores.unionByName(naivePlan(naiveIds))
      finalTopK(scores, topN, scoreName)
    }

    // FREE θ first: k-th best partial prefix score per query
    val thetaPartial = pairsByQ.map { case (k, ps) =>
      val ss = ps.map(_._2).sortBy(-_)
      k -> (if (ss.length >= topN) ss(topN - 1) else Double.MinValue)
    }
    val aPartial =
      algebra(k => thetaPartial.getOrElse(k, Double.MinValue))
    if (aPartial.wandIds.isEmpty)
      return served(finalTopK(naivePlan(allQ), topN, scoreName))
    if (aPartial.volSum <= broadcastRows) {
      lastRouteStats.set((allQ.size, eligible.size, aPartial.wandIds.size))
      return served(serve(aPartial))
    }
    // partial θ let too much through — pay ONE candidate-bounded scan
    // for the exact-seed θ (always ≥ the partial θ, so strictly fewer
    // candidates) and retry
    val seeds = pairsByQ.iterator.flatMap { case (k, ps) =>
      ps.sortBy { case (doc, s) => (-s, doc) }
        .take(4 * topN).map { case (doc, _) => (k, doc) }
    }.toSeq
    val theta: Map[Long, Double] =
      if (seeds.isEmpty) Map.empty
      else scoreCand(seeds.toDF("query_id", "doc_id"))
        .select("query_id", "doc_id", "score")
        .as[(Long, Long, Double)].collect()
        .groupBy(_._1).map { case (k, ss) =>
          val sorted = ss.sortBy { case (_, doc, s) => (-s, doc) }
          k -> (if (sorted.length >= topN) sorted(topN - 1)._3
                else Double.MinValue)
        }
    val aExact = algebra(k => theta.getOrElse(k, Double.MinValue))
    if (aExact.wandIds.isEmpty)
      return served(finalTopK(naivePlan(allQ), topN, scoreName))
    // still over the single-chunk budget under the tighter θ: serve
    // CHUNKED (inside serve() above) — driver state is already
    // pair-cells-bounded, so nothing here needs the distributed
    // orchestration's per-stage Spark planning
    lastRouteStats.set((allQ.size, eligible.size, aExact.wandIds.size))
    served(serve(aExact))
  }

  /** Per-partition top-`topN` of summed pair weights over CO-LOCATED
    * naive pair rows — the r15 rewrite of the Σ-postings kernel's
    * aggregation tail. Input: (query_id, doc_id, w) rows whose
    * partitioning CO-LOCATES every (query_id, doc_id) pair (the stores
    * repartition the MATCHED POSTINGS by doc_id before the pair-
    * expanding broadcast join, so the exchange carries Σ-distinct-term
    * df rows — always ≤ the pair volume the previous shape shuffled
    * through its (query, doc) aggregation: each matched posting row
    * expands into ≥ 1 pair row). The kernel sorts within partitions,
    * streams group sums, and keeps a bounded per-query top-`topN`
    * buffer — replacing two hash-aggregation passes plus the object
    * TopKAgg update per pair row (measured on the 20k-query zipf
    * batch: 18-20 s → 4.0 s for the full serve).
    *
    * Output: (query_id, doc_id, score) PARTIAL rows — each partition's
    * per-query top-`topN` — to be reduced by [[finalTopK]] (or unioned
    * with other score rows first). Sound because pairs are partition-
    * complete and any dropped pair is dominated within its partition
    * by `topN` emitted pairs under the exact (score desc, id asc)
    * final order, so it can never enter the global top-`topN`.
    *
    * Score = round(Σ w, 4) with the HALF_UP BigDecimal kernel the
    * in-plan retrieval kernels already use (spec-pinned ≡ Spark's
    * `round(col, 4)`). Summation-order freedom is the house 4dp
    * argument: the summands are 4dp-rounded weights, whose exact sum
    * is itself a 4dp decimal, so the ~1e-13 float-order jitter can
    * never cross a HALF_UP boundary (the nearest boundary is 5e-5
    * away).
    */
  def naivePartialTopK(pairRows: DataFrame, topN: Int): DataFrame = {
    val spark = pairRows.sparkSession
    import spark.implicits._
    pairRows
      .sortWithinPartitions("query_id", "doc_id")
      .as[(Long, Long, Double)]
      .mapPartitions { it =>
        val tops = new java.util.HashMap[Long, Array[(Double, Long)]]()
        def push(q: Long, d: Long, raw: Double): Unit = {
          val s = BigDecimal(raw)
            .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
          val buf = tops.getOrDefault(q, Array.empty)
          val full = buf.length >= topN
          if (!(full && {
            val last = buf(buf.length - 1)
            last._1 > s || (last._1 == s && last._2 < d)
          })) {
            val i = buf.indexWhere(x => s > x._1 || (s == x._1 && d < x._2))
            val at = if (i < 0) buf.length else i
            tops.put(q,
              ((buf.take(at) :+ ((s, d))) ++ buf.drop(at)).take(topN))
          }
        }
        var curQ = 0L; var curD = 0L; var acc = 0.0; var open = false
        while (it.hasNext) {
          val r = it.next()
          if (!open) { curQ = r._1; curD = r._2; acc = r._3; open = true }
          else if (r._1 == curQ && r._2 == curD) acc += r._3
          else { push(curQ, curD, acc); curQ = r._1; curD = r._2; acc = r._3 }
        }
        if (open) push(curQ, curD, acc)
        import scala.jdk.CollectionConverters._
        tops.entrySet().iterator().asScala.flatMap { e =>
          e.getValue.iterator.map { case (s, d) =>
            (e.getKey.longValue, d, s) }
        }
      }
      .toDF("query_id", "doc_id", "score")
  }

  /** Global top-`topN` per query over the unioned wand + naive score
    * rows, in the stores' output shape (query_id, rnk, neighbor_id,
    * <scoreName>) with the house (score desc, id asc) tie-break.
    */
  def finalTopK(scores: DataFrame, topN: Int,
      scoreName: String): DataFrame = {
    import graft.functions.TopKAgg
    scores
      .groupBy("query_id")
      .agg(TopKAgg.topK(topN, col("score"), col("doc_id")).as("top"))
      .select(col("query_id"), posexplode(col("top")).as(Seq("pos", "row")))
      .select(
        col("query_id"),
        (col("pos") + 1).cast("int").as("rnk"),
        col("row._2").as("neighbor_id"),
        col("row._1").as(scoreName))
      .orderBy("query_id", "rnk")
  }
}
