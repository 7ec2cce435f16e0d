package graft.plans

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Session-scoped memo table for small derived frames shared by
  * several registered rows of one family — the hybrid-ranking
  * discipline (see TextAnalysis's ranking pair) factored out: a
  * family's expensive corpus-sized subtree (a render+fingerprint pass,
  * an ANN train+search, a pair mining) is computed ONCE per
  * (context, dataset, tag) and every consumer row reads the
  * materialized result. This is the production shape — rankings /
  * pair lists are computed once, diagnostics and ledgers are
  * independent consumers — and it is only sound because every memoized
  * producer here is DETERMINISTIC (pure in doc_id / seeded hashes /
  * seeded Lloyd), so a memoized value is identical to a recomputation
  * and ledger rows stay valid oracles over the outputs Verify
  * materializes in the same session.
  *
  * Entries are localCheckpoint'd (lineage truncated, blocks
  * session-local) and keyed by applicationId, so nothing leaks across
  * Spark applications; on a real cluster an executor loss invalidates
  * the blocks — re-derive, don't recover.
  *
  * LIFETIME: the map is unbounded and application-scoped — sized for
  * the bench/verify lifecycle (one application, a handful of
  * datasets; each entry is a small checkpointed frame). A long-lived
  * session serving many datasets should call [[clear]] between
  * tenants (or on a cadence) — there is deliberately no LRU, because
  * silent eviction would turn the "memoized ≡ recomputed" contract
  * into a latency lottery.
  */
object Memo {

  private val cache =
    new java.util.concurrent.ConcurrentHashMap[String, DataFrame]

  /** Drop every memoized frame (and its checkpoint blocks become
    * unreferenced for GC) — the eviction hook for long-lived
    * applications; also clears the tokenizer memo
    * ([[graft.operators.Unigram.clearTrainedCache]]), keeping the two
    * application-scoped memo stores on one lifecycle.
    */
  def clear(): Unit = {
    cache.clear()
    graft.operators.Unigram.clearTrainedCache()
  }

  /** The memoized frame for (session, dataset, tag), computing and
    * eagerly materializing `f` on first use.
    *
    * Deliberately NOT `computeIfAbsent`: memoized producers nest
    * (a family's pair list derives from its memoized fingerprint
    * frame), and a nested `computeIfAbsent` on the same
    * ConcurrentHashMap throws IllegalStateException("Recursive
    * update") whenever the two keys hash into the same bin — a
    * run-dependent crash, since the applicationId prefix reshuffles
    * bins per session. Two-phase get → compute OUTSIDE the map →
    * putIfAbsent instead: a racing duplicate computation is possible
    * but harmless (producers are deterministic; the losing value is
    * dropped), and recursion is always safe.
    *
    * A cached entry is PROBED before reuse (the hybridRankings
    * discipline): the frames are small, so `isEmpty` costs ~ms and
    * proves the truncated-lineage checkpoint blocks are still
    * fetchable — on a real cluster an executor loss poisons them, and
    * the probe converts "every later consumer fails all session" into
    * one re-derivation.
    */
  def frame(s: SparkSession, d: String, tag: String)(
      f: => DataFrame): DataFrame = {
    val key = s.sparkContext.applicationId + "|" + AggStore.artifactId(d) +
      "|" + tag
    def derive(): DataFrame = {
      val v = f.localCheckpoint(true)
      val prev = cache.putIfAbsent(key, v)
      if (prev != null) prev else v
    }
    cache.get(key) match {
      case null => derive()
      case hit =>
        // The probe exists for CLUSTER block loss (an executor death
        // poisons truncated-lineage blocks). In local mode there is no
        // executor to lose — MEMORY_AND_DISK blocks survive memory
        // pressure via disk — so the ~ms probe job is a pure
        // per-consumer driver-sequenced latency point (r15: it ran once
        // per memoized-row execution, ~10 rows × 3 bench iterations);
        // skip it there, keep it wherever loss is possible.
        if (s.sparkContext.isLocal) hit
        else {
          // NonFatal only: a lost checkpoint block surfaces as a Spark
          // job failure (re-derive); OOM/interrupt must propagate, not
          // masquerade as a cache miss that re-derives forever
          try { hit.isEmpty; hit }
          catch {
            case scala.util.control.NonFatal(_) =>
              cache.remove(key, hit)
              derive()
          }
        }
    }
  }
}
