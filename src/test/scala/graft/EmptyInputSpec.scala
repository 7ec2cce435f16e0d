package graft

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.scalatest.funsuite.AnyFunSuite

import graft.jobs._

/** Degenerate-input robustness: every job must return an EMPTY frame
  * with the right columns (not throw) when all sources are empty — the
  * election-night t0 state, and the property that distinguishes
  * fail-fast-on-error from fail-on-no-data.
  */
class EmptyInputSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-empty-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def empty(s: org.apache.spark.sql.types.StructType): DataFrame =
    spark.createDataFrame(new java.util.ArrayList[Row](), s)

  private def emptyJson: DataFrame = {
    import spark.implicits._
    Seq.empty[String].toDF("body")
  }

  object EmptySources extends ElectionSources {
    import ElectionSchemas._
    def wards: DataFrame = empty(ElectionSchemas.wards)
    def munis: DataFrame = empty(ElectionSchemas.munis)
    def councilWinners: DataFrame = empty(ElectionSchemas.councilWinners)
    def parties: DataFrame = empty(ElectionSchemas.parties)
    def votingDistricts: DataFrame = empty(ElectionSchemas.votingDistricts)
    def displayVotingDistricts: DataFrame =
      empty(ElectionSchemas.displayVotingDistricts)
    def vdStats: DataFrame = empty(ElectionSchemas.vdStats)
    def displayWard: DataFrame = empty(ElectionSchemas.displayWard)
    def wardCandidates: DataFrame = empty(ElectionSchemas.wardCandidates)
    def ballotResultsJson: DataFrame = emptyJson
    def councilorsJson: DataFrame = emptyJson
    def seatResultsJson: DataFrame = emptyJson
  }

  test("every job yields an empty, correctly-shaped frame on empty inputs") {
    SanefJobs.all.foreach { spec =>
      val got = SanefJobs.run(spark, EmptySources, spec.name)
      assert(got.count() === 0, spec.name)
      assert(got.columns.nonEmpty, spec.name)
    }
  }

  test("completedWards is empty on empty inputs") {
    assert(SanefJobs.completedWards(EmptySources, JobConfig()).count() === 0)
  }

  test("corpus operators yield empty, correctly-shaped frames on empty corpora") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val docs = Seq.empty[(Long, String, String, String)]
      .toDF("doc_id", "text", "lang", "source")
    val emb = Seq.empty[(Long, Array[Float])].toDF("vec_id", "embedding")

    val contamination =
      operators.Quality.contamination(docs, col("doc_id") % 10 === 0, 5)
    assert(contamination.count() === 0)
    assert(contamination.columns.toSeq ===
      Seq("doc_id", "n_shared_grams", "n_eval_docs"))

    val tfidf = operators.TextAnalysis.tfidfTopTerms(docs, 3)
    assert(tfidf.count() === 0)
    assert(tfidf.columns.toSeq === Seq("doc_id", "rnk", "term", "score"))

    // zero vectors → zero k-means seeds → empty centroid matrix; the
    // kernels never evaluate on zero rows, so the plan must still build
    val sem = operators.Similarity.semanticDedupPairs(emb, 0.9)
    assert(sem.count() === 0)
    assert(sem.columns.toSeq === Seq("id_a", "id_b"))

    val prep = streaming.DocStreams.prepare(
      docs.withColumn("ingest_ts", org.apache.spark.sql.functions
        .current_timestamp()).drop("lang"))
    assert(prep.count() === 0)
    assert(prep.columns.toSeq ===
      Seq("doc_id", "source", "ingest_ts", "text", "n_tokens", "fp"))

    // round-12: whole-doc packing over nothing = an empty manifest
    val pack = operators.Sampling.packWholeDocs(docs, 4096L, 8L)
    assert(pack.count() === 0)
    assert(pack.columns.toSeq === Seq("cell", "seq_id", "n_docs",
      "doc_tokens", "n_truncated", "fill"))

    // round-12: semantic contamination with an empty corpus keeps the
    // output contract (the aggregate path must not need a seed row)
    val semc = operators.Similarity.semanticContamination(
      emb, col("vec_id") % 10 === 0, 0.4)
    assert(semc.count() === 0)
    assert(semc.columns.toSeq ===
      Seq("doc_id", "nearest_eval_id", "sim", "flagged"))

    // round-3 operators
    val toks = Seq.empty[(Long, Long)].toDF("doc_id", "n_tokens")
    val ps = operators.Sampling.exclusivePrefixSum(
      toks, "doc_id", "n_tokens", 4, "cum")
    assert(ps.count() === 0)
    assert(ps.columns.toSeq === Seq("doc_id", "n_tokens", "cum"))

    val out = operators.Similarity.embeddingOutliers(
      Seq.empty[(Long, Array[Float], Int)]
        .toDF("vec_id", "embedding", "label"), 5)
    assert(out.count() === 0)
    assert(out.columns.toSeq ===
      Seq("label", "rnk", "vec_id", "centroid_sim"))

    val boiler = operators.Quality.boilerplateFractions(docs)
    assert(boiler.count() === 0)
    assert(boiler.columns.toSeq ===
      Seq("doc_id", "n_grams", "n_hot", "boiler_frac"))

    val shuffled = operators.Sampling.shuffledPositions(docs, "doc_id", 7, 4)
    assert(shuffled.count() === 0)
    assert(shuffled.columns.toSeq === Seq("doc_id", "pos"))

    val scrub = operators.Dedup.duplicatedSpanScrub(docs, 5)
    assert(scrub.count() === 0)
    assert(scrub.columns.toSeq ===
      Seq("doc_id", "n_tokens", "n_removed", "clean_text"))

    // empty pair set → empty clustering (driver union-find path)
    val cc = operators.Clustering.connectedComponents(
      Seq.empty[(Long, Long)].toDF("id_a", "id_b"), "id_a", "id_b")
    assert(cc.count() === 0)
    assert(cc.columns.toSeq === Seq("node", "cluster_id"))

    // round-4: empty corpus → both models empty, totals row still
    // builds (countDistinct 0 / null sums), zero score rows, no throw
    val dsir = operators.TextAnalysis.dsirWeights(
      docs, col("lang") === operators.TextAnalysis.DsirTargetLang)
    assert(dsir.count() === 0)
    assert(dsir.columns.toSeq ===
      Seq("doc_id", "lang", "dsir_logratio", "selected"))

    // round-5: rule battery / gate / funnel are per-row maps (empty in,
    // empty out); tiers + waterfill aggregate to zero groups; the
    // cluster sample must survive an EMPTY centroid matrix (zero seeds)
    val rules = operators.Quality.gopherRules(docs)
    assert(rules.count() === 0)
    assert(rules.columns.toSeq === Seq("doc_id", "n_tokens",
      "r_word_count", "r_mean_word_len", "r_symbol_ratio", "r_stopwords",
      "r_dup_tokens", "keep"))
    assert(operators.Quality.gopherFilter(docs).count() === 0)
    val funnel = operators.Quality.qualityFunnel(docs)
    assert(funnel.count() === 0)
    assert(funnel.columns.toSeq ===
      Seq("source", "n_total", "n_len", "n_rep", "n_kept", "keep_frac"))
    val tiers = operators.TextAnalysis.lmBuckets(docs)
    assert(tiers.count() === 0)
    assert(tiers.columns.toSeq ===
      Seq("source", "bucket", "n_docs", "avg_logprob"))
    val budget = operators.Sampling.langBudget(docs)
    assert(budget.count() === 0)
    assert(budget.columns.toSeq ===
      Seq("lang", "toks", "alloc_tokens", "epochs", "budget_share"))
    val cs = operators.Similarity.clusterBalancedSample(emb, 8, 5)
    assert(cs.count() === 0)
    assert(cs.columns.toSeq === Seq("vec_id", "cell", "rnk", "kept"))
  }

  test("round-5-late event/sampling newcomers survive empty inputs") {
    import org.apache.spark.sql.functions.{broadcast, col, count, lit}
    import spark.implicits._
    val events = Seq.empty[(Long, java.sql.Timestamp, Long, String, Double)]
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val docs = Seq.empty[(Long, Long)].toDF("doc_id", "n_chars")

    // CMS over an empty frame: all-zero counters, zero candidates —
    // the 2-pass pipeline ends empty instead of throwing
    val cms = functions.CountMin.build(events, "user_id", 3, 32)
    assert(cms.total === 0L && cms.rows.forall(_.forall(_ == 0L)))
    val cand = events.select("user_id")
      .where(cms.estimate(col("user_id")) >= 80L).distinct()
    val hh = events.join(broadcast(cand), Seq("user_id"), "left_semi")
      .groupBy("user_id").agg(count(lit(1)).as("n_events"))
    assert(hh.count() === 0)

    val rc = streaming.EventStreams.clickAttribution(
      events.filter(col("event_type") === "click"),
      events.filter(col("event_type") === "purchase"))
    assert(rc.count() === 0)
    assert(rc.columns.toSeq === Seq("click_id", "purchase_id", "user_id",
      "click_ts", "purchase_ts", "value"))

    // weighted sample of an empty frame is empty, k notwithstanding
    val ws = operators.Sampling.weightedSample(docs, "doc_id", "n_chars",
      10, seed = 1)
    assert(ws.count() === 0)

    // z-order write of an empty frame produces a readable empty dataset
    val zdir = java.nio.file.Files
      .createTempDirectory("graft-empty-z").toString
    plans.Layout.writeZOrdered(
      Seq.empty[(Long, Long)].toDF("a", "b"), zdir, "a", "b", files = 4)
    assert(spark.read.parquet(zdir).count() === 0)
  }

  test("graph/analysis newcomers survive empty inputs") {
    import spark.implicits._
    val docs = Seq.empty[(Long, String)].toDF("doc_id", "text")
    val pmi = operators.TextAnalysis.tokenPmi(docs, 1L)
    assert(pmi.count() === 0)
    assert(pmi.columns.toSeq === Seq("t1", "t2", "c_xy", "pmi"))

    val events = Seq.empty[(Long, java.sql.Timestamp, String)]
      .toDF("event_id", "ts", "event_type")
    val ra = operators.Reshape.rateAnomaly(events)
    assert(ra.count() === 0)
    assert(ra.columns.toSeq === Seq("event_type", "day", "n", "z", "spike"))
    assert(operators.Reshape.rateStats(events).count() === 0)
  }

  test("round-5 similarity/merge newcomers survive empty inputs") {
    import org.apache.spark.sql.functions.{col, lit, to_date}
    import spark.implicits._
    val sh = Seq.empty[(Long, Long)].toDF("doc_id", "g")

    val cont = operators.Dedup.containmentPairs(sh, 0.9)
    assert(cont.count() === 0)
    assert(cont.columns.toSeq ===
      Seq("id_a", "id_b", "inter", "n_small", "containment"))

    val pf = operators.Dedup.prefixFilterCandidates(sh, 0.5)
    assert(pf.count() === 0)
    assert(pf.columns.toSeq === Seq("id_a", "id_b"))

    val docs = Seq.empty[(Long, String)].toDF("doc_id", "text")
    val cos = operators.TextAnalysis.tfidfCosinePairs(docs, 10, 2, 0.7)
    assert(cos.count() === 0)
    assert(cos.columns.toSeq ===
      Seq("id_a", "id_b", "shared_terms", "cosine"))

    val cosB =
      operators.TextAnalysis.tfidfCosinePairsBroadcast(docs, 10, 2, 0.7)
    assert(cosB.count() === 0)
    assert(cosB.columns.toSeq ===
      Seq("id_a", "id_b", "shared_terms", "cosine"))

    val ret = operators.TextAnalysis
      .tfidfRetrieval(docs, col("doc_id") % 25 === 0, 10, 3)
    assert(ret.count() === 0)
    assert(ret.columns.toSeq ===
      Seq("query_id", "rnk", "neighbor_id", "cosine"))

    val bm = operators.TextAnalysis
      .bm25Retrieval(docs, col("doc_id") % 25 === 0, 3)
    assert(bm.count() === 0)
    assert(bm.columns.toSeq ===
      Seq("query_id", "rnk", "neighbor_id", "score"))

    val kc = operators.Clustering.kCore(
      Seq.empty[(Long, Long)].toDF("a", "b"), "a", "b", 2)
    assert(kc.count() === 0)
    assert(kc.columns.toSeq === Seq("node", "core_degree"))

    // scd2: empty base + empty batch → empty table, right shape; empty
    // base + real batch → pure inserts, all current
    val eBase = Seq.empty[(Long, String, java.sql.Date, java.sql.Date)]
      .toDF("k", "attr", "valid_from", "valid_to")
    val eBatch = Seq.empty[(Long, String)].toDF("k", "attr")
    val m0 = operators.Reshape.scd2Merge(
      eBase, eBatch, "k", Seq("attr"), to_date(lit("2000-01-01")))
    assert(m0.count() === 0)
    assert(m0.columns.toSeq ===
      Seq("k", "attr", "valid_from", "valid_to", "is_current"))
    val m1 = operators.Reshape.scd2Merge(
      eBase, Seq((1L, "x")).toDF("k", "attr"), "k", Seq("attr"),
      to_date(lit("2000-01-01")))
    assert(m1.count() === 1)
    assert(m1.filter(col("is_current")).count() === 1)

    // jaro kernel on a frame with zero rows still builds its plan
    val jj = docs.select(graft.functions.JaroSimilarity
      .sim(spark, col("text"), col("text")).as("j"))
    assert(jj.count() === 0)

    // round-6 continuation operators
    val fullDocs = Seq.empty[(Long, String, String, String, Long)]
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val ld = operators.Dedup.lineDedup(docs, 8)
    assert(ld.count() === 0)
    assert(ld.columns.toSeq ===
      Seq("doc_id", "n_segs", "n_dropped", "clean_text"))

    val lsc = operators.Dedup.lineScrubAgainstCorpus(
      docs, Seq.empty[String].toDF("seg"), 8)
    assert(lsc.count() === 0)
    assert(lsc.columns.toSeq ===
      Seq("doc_id", "n_segs", "n_dropped", "clean_text"))

    // empty corpus → zero merges, right schema; encode joins nothing
    val bpe = operators.TextAnalysis.bpeLearn(docs, 10)
    assert(bpe.count() === 0)
    assert(bpe.columns.toSeq === Seq("rnk", "lhs", "rhs", "freq"))
    val enc = operators.TextAnalysis.bpeEncode(docs, 10)
    assert(enc.count() === 0)
    assert(enc.columns.toSeq === Seq("doc_id", "n_words", "n_chars",
      "n_bpe_tokens", "chars_per_token"))

    val dcard = operators.Curation.corpusDataCard(fullDocs)
    assert(dcard.count() === 0)
    assert(dcard.columns.toSeq === Seq("source", "n_docs", "n_tokens",
      "avg_chars", "p50_chars", "n_langs", "dup_rate", "top_lang"))

    val bt = operators.Similarity.bitextMarginMine(
      Seq.empty[(Long, Array[Float])].toDF("vec_id", "embedding"), 4, 1.05)
    assert(bt.count() === 0)
    assert(bt.columns.toSeq === Seq("x_id", "y_id", "margin", "mined"))

    val cal = operators.Quality.qualityCalibration(fullDocs)
    assert(cal.count() === 0)
    assert(cal.columns.toSeq === Seq("doc_id", "source", "score",
      "pct_src", "pct_global", "keep_cal", "keep_raw"))

    val drift = operators.Quality.corpusDrift(fullDocs, 100L)
    assert(drift.count() === 0)
    assert(drift.columns.toSeq === Seq("source", "n_a", "n_b", "tv_dist"))
  }

  test("classifier/monitor newcomers survive empty inputs") {
    import spark.implicits._
    val docs = Seq.empty[(Long, String)].toDF("doc_id", "text")

    val scored = operators.Classifier.scoreCorpus(docs)
    assert(scored.count() === 0)
    assert(scored.columns.toSeq === Seq("doc_id", "y", "score", "pred"))

    val cal = operators.Classifier.calibrationSweep(scored)
    // empty corpus → no (row × threshold) pairs → empty sweep
    assert(cal.count() === 0)
    assert(cal.columns.toSeq === Seq("tau", "tp", "fp", "fn", "tn",
      "precision", "recall"))

    val ed = operators.Similarity.embeddingDrift(
      Seq.empty[(Long, Array[Float], Int)]
        .toDF("vec_id", "embedding", "label"))
    assert(ed.count() === 0)
    assert(ed.columns.toSeq === Seq("label", "n_a", "n_b", "drift"))
  }

  test("round-7 newcomers survive empty inputs") {
    import spark.implicits._
    val emb = Seq.empty[(Long, Array[Float])].toDF("vec_id", "embedding")
    // ANN bitext on an empty collection: empty buckets, empty
    // candidates, empty tail — right schema throughout
    val ann = operators.Similarity.bitextMarginMineAnn(emb, 4, 1.05)
    assert(ann.count() === 0)
    assert(ann.columns.toSeq === Seq("x_id", "y_id", "margin", "mined"))

    // the regime selector on an empty corpus: stats are (0, 0), the
    // rule picks the broadcast side vacuously (0 ≥ 0 under the cap) and
    // the kernel emits nothing
    val docs = Seq.empty[(Long, String)].toDF("doc_id", "text")
    val auto = operators.TextAnalysis.tfidfCosinePairsAuto(docs, 10, 2, 0.7)
    assert(auto.count() === 0)
    assert(auto.columns.toSeq ===
      Seq("id_a", "id_b", "shared_terms", "cosine"))

    // batched BPE trainer: zero words → exhaustion on the first pass
    val (merges, vocab) =
      operators.TextAnalysis.bpeVocabLoopBatched(
        operators.TextAnalysis.bpeWordVocab(docs), 10)
    assert(merges.isEmpty)
    assert(vocab.count() === 0)

    // snapshot CDC between identical versions of a 1-row table
    val root = java.nio.file.Files
      .createTempDirectory("graft-snap-empty").toString
    graft.plans.SnapshotStore.append(
      Seq((1L, "x")).toDF("id", "tag"), root)
    val feed = graft.plans.SnapshotStore.changes(spark, root, 0, 0)
    assert(feed.count() === 0)
    assert(feed.columns.toSeq === Seq("id", "tag", "_change"))

    // PQ / IVF-PQ on an empty collection: no codebooks can train —
    // empty knn-shaped output, never an error
    val pq = operators.Similarity.pqKnn(
      emb, org.apache.spark.sql.functions.col("vec_id") % 2 === 0, 5)
    assert(pq.count() === 0)
    assert(pq.columns.toSeq === Seq("query_id", "rnk", "neighbor_id"))
    val ipq = operators.Similarity.ivfPqKnn(
      emb, org.apache.spark.sql.functions.col("vec_id") % 2 === 0, 5)
    assert(ipq.count() === 0)
    assert(ipq.columns.toSeq === Seq("query_id", "rnk", "neighbor_id"))

    // OPQ variants: the empty guard fires BEFORE the rotation learner
    // (which, like pqTrain, throws an explicit error on nothing)
    val opq = operators.Similarity.opqPqKnn(
      emb, org.apache.spark.sql.functions.col("vec_id") % 2 === 0, 5)
    assert(opq.count() === 0)
    assert(opq.columns.toSeq === Seq("query_id", "rnk", "neighbor_id"))
    val oipq = operators.Similarity.opqIvfPqKnn(
      emb, org.apache.spark.sql.functions.col("vec_id") % 2 === 0, 5)
    assert(oipq.count() === 0)
    val eOpq = intercept[IllegalArgumentException](
      operators.Similarity.opqRotation(emb, 8, 64))
    assert(eOpq.getMessage.contains("empty corpus"))
  }
}
