package graft.plans

import org.apache.spark.sql.DataFrame
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
private[plans] object WandKernel {

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

  /** PRE-ROUTE on the df table alone (no postings scan): even in a
    * query's optimistic best case — every prefix slot a distinct
    * candidate, zero tail rows — its WAND volume is Σ min(P, df)
    * candidates × (1 + nt) scoring rows; a query that already fails
    * the 2× bar there can never WAND-serve, so it skips the entire
    * θ/cap/cutoff pipeline. On dense-overlap corpora NO query is
    * eligible and WAND's whole overhead collapses to this one
    * df-table aggregation in front of the naive kernel.
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
        col("estpre") * (lit(1L) + col("nt")) * 2 < col("estn"))
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
    * volume at least halves the naive one. The pruned volume is est
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
        (col("vol") * 2 < col("estn")).as("use_wand"))
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
