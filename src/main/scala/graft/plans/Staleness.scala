package graft.plans

/** Measured drift of a frozen-geometry ANN artifact against its
  * build-time baseline — the re-train policy the extend contract on
  * [[IvfIndexStore]] / [[PqStore]] has always documented ("centroids /
  * codebooks drift as the corpus does, rebuild periodically") but
  * until now left unmeasured. Two complementary signals, both computed
  * from per-bucket (n, sum_err) statistics persisted at build time:
  *
  *   - `residualGrowth` — current mean quantization gap over the live
  *     set divided by the build-time mean (IVF: 1 − cos(v, home
  *     centroid); PQ: squared L2 reconstruction error of the
  *     l2-normalized vector against its nearest codewords). Grows when
  *     arriving vectors live far from every frozen centroid/codeword —
  *     the classic "new topic cluster" drift, which can leave cell
  *     OCCUPANCY near-uniform while recall quietly decays.
  *   - `occupancySkew` — total-variation distance between the
  *     build-time and current bucket-occupancy distributions
  *     (cells for IVF; (subspace, codeword) usage for PQ, where the
  *     joint TV equals the per-subspace TV averaged over subspaces).
  *     Grows when arriving vectors pile into few buckets — the
  *     "everything hashes to one cell" drift, which inflates probe
  *     cost even when residuals look fine.
  *
  * This is the artifact-level counterpart of the representation-level
  * monitors already in the registry (`q_embedding_drift` /
  * `q_embedding_dispersion` watch the EMBEDDING distribution move;
  * this watches a frozen INDEX stop fitting it). Thresholds are the
  * caller's dial: `isStale` is a pure comparison so policies stay
  * testable, and `rebuildIfStale` on each store wires it to a
  * rebuild-from-survivors.
  */
case class Staleness(
    residualGrowth: Double, occupancySkew: Double,
    builtVecs: Long, liveVecs: Long) {

  /** True when either signal clears its ceiling. The defaults on the
    * stores' `rebuildIfStale` (residual ×1.25, skew 0.25) are starting
    * points, not physics — recall-vs-signal curves are workload
    * properties (the ScaleProbe drift row measures one).
    */
  def isStale(residualMax: Double, skewMax: Double): Boolean =
    residualGrowth > residualMax || occupancySkew > skewMax
}

object Staleness {

  /** Fold build-time vs current per-bucket stats into the two signals.
    * Keys are (group, bucket) — IVF passes (0, cell), PQ passes
    * (subspace, codeword). `obsPerVec` converts stat observations back
    * to vector counts (PQ emits m observations per vector).
    *
    * Degenerate inputs are defined, not thrown: an empty live set has
    * no drift to measure (1.0 / 0.0 — there is nothing the frozen
    * geometry could be failing to fit), and a zero build-time residual
    * (every vector WAS a centroid) makes any nonzero current residual
    * effectively infinite growth via the 1e-12 floor — always stale,
    * which is the honest answer.
    */
  def of(
      built: Seq[((Int, Int), (Long, Double))],
      now: Seq[((Int, Int), (Long, Double))],
      obsPerVec: Int = 1): Staleness = {
    val builtN = built.map(_._2._1).sum
    val nowN = now.map(_._2._1).sum
    val builtVecs = builtN / math.max(obsPerVec, 1)
    val liveVecs = nowN / math.max(obsPerVec, 1)
    if (builtN == 0L || nowN == 0L)
      return Staleness(1.0, 0.0, builtVecs, liveVecs)
    val builtMean = built.map(_._2._2).sum / builtN
    val nowMean = now.map(_._2._2).sum / nowN
    val bm = built.toMap
    val nm = now.toMap
    val skew = 0.5 * (bm.keySet ++ nm.keySet).toSeq.map { k =>
      math.abs(
        bm.get(k).map(_._1).getOrElse(0L).toDouble / builtN -
          nm.get(k).map(_._1).getOrElse(0L).toDouble / nowN)
    }.sum
    Staleness(
      nowMean / math.max(builtMean, 1e-12), skew, builtVecs, liveVecs)
  }
}
