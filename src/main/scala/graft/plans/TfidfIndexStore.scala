package graft.plans

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted tf-idf retrieval index — the vector-space sibling of
  * [[Bm25IndexStore]], closing the artifact family for the hybrid
  * (tf-idf + BM25 → RRF) retrieval stack: tokenize + weight the corpus
  * ONCE, save the top-k postings and per-doc norms, then serve query
  * batches from the artifact without re-touching the corpus.
  *
  * The artifact is TWO tables:
  *   - `<table>`        — postings (tkey, doc_id, w): each document's
  *                        top-k tf-idf terms (4dp-rounded weights, the
  *                        house parity regime), bucketed + sorted by
  *                        the 64-bit term fingerprint;
  *   - `<table>_norms`  — (doc_id, nrm): the vector norms the cosine
  *                        denominator needs.
  *
  * Parity: identical per-term weights to
  * [[graft.operators.TextAnalysis.tfidfRetrieval]] (both 4dp-rounded at
  * the score stage); the dot re-accumulates via a term-keyed sum
  * instead of the in-session kernel's sorted-key merge, a summation-
  * order difference of ~1e-13 — absorbed by the 4dp cosine rounding
  * that both forms rank on (the same argument the BM25 store's oracle
  * reuse rests on). So a search over the saved index reproduces the
  * in-session query row-for-row and carries the same DuckDB oracle.
  *
  * Refresh discipline: rebuild (versioned dirs, repoint-not-overwrite —
  * the [[AggStore]] rule), with a frozen-stats [[extend]] in the
  * [[Bm25IndexStore]] style for continual ingest between rebuilds:
  * the batch weights under the SAVED raw df + n_docs (persisted at
  * build exactly for this), so existing postings never rewrite.
  * tf-idf's idf couples every weight to n_docs, so extension drifts
  * as the corpus grows — the same staleness contract as the whole
  * frozen-stats family, reset by the periodic rebuild.
  */
object TfidfIndexStore {

  def normsTable(table: String): String = s"${table}_norms"
  def dfTable(table: String): String = s"${table}_df"
  def rawDfTable(table: String): String = s"${table}_rawdf"
  def statsTable(table: String): String = s"${table}_stats"
  def byDocTable(table: String): String = s"${table}_bydoc"

  /** Build the top-`k`-term index from `docs` and save postings + norms
    * under `path`, registered as external tables.
    */
  def build(
      docs: DataFrame, k: Int, table: String, path: String,
      buckets: Int): Unit = {
    val spark = docs.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS $table")
    spark.sql(s"DROP TABLE IF EXISTS ${normsTable(table)}")
    spark.sql(s"DROP TABLE IF EXISTS ${dfTable(table)}")
    spark.sql(s"DROP TABLE IF EXISTS ${rawDfTable(table)}")
    spark.sql(s"DROP TABLE IF EXISTS ${statsTable(table)}")
    spark.sql(s"DROP TABLE IF EXISTS ${byDocTable(table)}")
    Retire.reset(spark, table)
    val next = AggStore.versionPaths(spark, path).lastOption
      .map(p => new org.apache.hadoop.fs.Path(p).getName.drop(1).toInt + 1)
      .getOrElse(0)
    val vdir = s"$path/v$next"
    // the FROZEN idf inputs [[extend]] folds new batches in under:
    // raw per-term document frequency (over the whole corpus, BEFORE
    // top-k selection — the idf the build's weights actually used)
    // and the corpus size
    val tf0 = graft.operators.TextAnalysis.termFreq(docs).persist()
    tf0.groupBy(xxhash64(col("term")).as("tkey"))
      .agg(count(lit(1)).as("df"))
      .write.option("path", s"$vdir/rawdf").mode("overwrite")
      .format("parquet").saveAsTable(rawDfTable(table))
    docs.agg(count(lit(1)).as("n_docs"))
      .write.option("path", s"$vdir/stats").mode("overwrite")
      .format("parquet").saveAsTable(statsTable(table))
    // w > 0 filter: top-k selection KEEPS zero-score terms (df ==
    // n_docs makes log(N/df) = 0), and a doc whose every selected term
    // scores 0 would get nrm = 0 → wn = 0/0 = NaN postings that poison
    // the impact order and every cosine they touch. A zero posting
    // contributes nothing to any dot product or norm, so dropping it
    // is output-identical for every doc with a positive term; all-zero
    // docs (which could never match at nonzero cosine) drop from the
    // index instead of entering it as NaN.
    val postings = graft.operators.TextAnalysis
      .tfidfTopTermsFromTf(tf0,
        spark.table(statsTable(table)), k)
      .select(xxhash64(col("term")).as("tkey"),
        col("doc_id"), col("score").as("w"))
      .filter(col("w") > 0.0)
      .persist()
    postings.groupBy("doc_id")
      .agg(sqrt(sum(col("w") * col("w"))).as("nrm"))
      .write.option("path", s"$vdir/norms").mode("overwrite")
      .format("parquet").saveAsTable(normsTable(table))
    // `wn` is the NORM-SCALED weight w/‖d‖ — the cosine contribution a
    // posting can make per unit of query weight, i.e. the impact the
    // [[wandSearch]] bounds must order by (raw w would mis-rank long
    // documents); `rnk_w` is the impact rank within the term, the same
    // prefix/cap machinery as [[Bm25IndexStore.build]]. Zero-norm docs
    // cannot occur here BECAUSE of the w > 0 filter above (without it,
    // a doc whose every selected term has df == n_docs scores all-zero).
    // per-term selected-postings count — [[wandSearch]]'s candidate-
    // volume pricing reads it to choose its tail rule per query
    postings.groupBy("tkey").agg(count(lit(1)).as("df"))
      .write.option("path", s"$vdir/df").mode("overwrite")
      .format("parquet").saveAsTable(dfTable(table))
    val norms = spark.table(normsTable(table))
    postings.join(norms, "doc_id")
      .withColumn("wn", col("w") / col("nrm"))
      .withColumn("rnk_w", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("tkey")
          .orderBy(col("wn").desc, col("doc_id"))))
      .select("tkey", "doc_id", "w", "wn", "rnk_w")
      .write.bucketBy(buckets, "tkey").sortBy("tkey", "rnk_w")
      .option("path", s"$vdir/postings").mode("overwrite")
      .format("parquet").saveAsTable(table)
    // DOC-KEYED secondary layout for the doc-as-query fetch: the main
    // postings are clustered for the IMPACT access path ((tkey, rnk_w)
    // sorted — a doc_id probe has zero locality there and pays a full
    // 5-column scan before serving can even price a batch). This copy
    // is 3 narrow columns, range-clustered + sorted by doc_id, so a
    // query-vector fetch is a compact scan with per-file/row-group
    // doc_id stats available to push a batch hull down to.
    postings.select("doc_id", "tkey", "w")
      .repartitionByRange(buckets, col("doc_id"))
      .sortWithinPartitions("doc_id")
      .write.option("path", s"$vdir/bydoc").mode("overwrite")
      .format("parquet").saveAsTable(byDocTable(table))
    postings.unpersist()
    tf0.unpersist()
    ()
  }

  /** Fold a new document batch in under the FROZEN idf (saved raw df
    * + n_docs): tokenize ONLY the batch, weight with the build-time
    * statistics (terms unseen at build time drop — they have no idf
    * and could never match a saved posting anyway), take the same
    * top-`k` per doc, append norms + postings. Existing postings are
    * untouched; an exact copy of an indexed document weights
    * identically and so remains findable as a duplicate. Extended
    * postings carry `rnk_w = 0` — always inside [[wandSearch]]'s
    * prefix, so early-terminated serving stays exact after extension
    * (caps are computed over true ranks only), at the cost of the
    * candidate set growing with extension volume until the periodic
    * rebuild re-ranks. `k` must match the build's. The pricing df
    * table is NOT updated (same staleness contract as
    * [[Bm25IndexStore.extend]]).
    */
  def extend(batch: DataFrame, table: String, buckets: Int,
      k: Int = 10): Unit = {
    val spark = batch.sparkSession
    import org.apache.spark.sql.expressions.Window
    val rawdf = spark.table(rawDfTable(table))
    val nDocs = spark.table(statsTable(table))
    val w = Window.partitionBy("doc_id")
      .orderBy(col("score").desc, col("term"))
    val scored = graft.operators.TextAnalysis.termFreq(batch)
      .withColumn("tkey", xxhash64(col("term")))
      .join(rawdf, "tkey")
      .crossJoin(broadcast(nDocs))
      .withColumn("score",
        round(col("tf") * log(col("n_docs").cast("double") / col("df")),
          4))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("tkey"), col("doc_id"), col("score").as("w"))
      // the build's w > 0 rule (an all-zero batch doc must drop, not
      // enter the index as NaN postings)
      .filter(col("w") > 0.0)
      .localCheckpoint(true)
    val nrm = scored.groupBy("doc_id")
      .agg(sqrt(sum(col("w") * col("w"))).as("nrm"))
      .localCheckpoint(true)
    nrm.write.mode("append").format("parquet")
      .saveAsTable(normsTable(table))
    // mirror FIRST, postings second: a crash between the two appends
    // must leave the read-authoritative mirror ⊇ the main postings'
    // doc vectors — queryVectors prefers the mirror unconditionally,
    // so every doc that IS searchable keeps a complete query vector
    // (the reverse order would leave indexed docs with silently
    // truncated vectors forever); a mirror-only orphan doc merely
    // carries a vector no postings reference until the extend retries.
    // Pre-bydoc artifacts have no mirror and the readers fall back to
    // the main postings.
    // range-cluster the appended files like the build does — appending
    // under the batch's arbitrary partitioning would leave files whose
    // per-file doc_id stats span the whole id range, eroding the
    // pushdown the mirror exists for as extensions accumulate
    if (spark.catalog.tableExists(byDocTable(table)))
      scored.select("doc_id", "tkey", "w")
        .repartitionByRange(buckets, col("doc_id"))
        .sortWithinPartitions("doc_id")
        .write.mode("append").format("parquet")
        .saveAsTable(byDocTable(table))
    scored.join(nrm, "doc_id")
      .withColumn("wn", col("w") / col("nrm"))
      .withColumn("rnk_w", lit(0))
      .select("tkey", "doc_id", "w", "wn", "rnk_w")
      .write.bucketBy(buckets, "tkey").sortBy("tkey", "rnk_w")
      .mode("append").format("parquet")
      .saveAsTable(table)
  }

  /** Top-`topN` cosine matches per query id, served ENTIRELY from the
    * saved index — query vectors are the queries' own saved postings
    * rows (queries are corpus members, the doc-as-query retrieval
    * shape), so not even the query batch re-tokenizes. Self-matches
    * excluded; pairs sharing zero terms never surface (no join row) —
    * both mirroring the in-session form.
    */
  /** The query-vector fetch (queries are corpus members): the batch's
    * saved (tkey, wq) rows, read from the doc-keyed mirror when the
    * artifact has one — a compact 3-column, doc_id-clustered scan —
    * and from the main impact-ordered postings otherwise (pre-bydoc
    * artifacts keep working; they just pay the wide unclustered scan
    * this mirror exists to avoid).
    */
  private def queryVectors(spark: SparkSession, table: String,
      queryIds: DataFrame): DataFrame = {
    val src =
      if (spark.catalog.tableExists(byDocTable(table)))
        spark.table(byDocTable(table))
      else spark.table(table).select("doc_id", "tkey", "w")
    // a tombstoned doc cannot serve as a QUERY either — reading its
    // saved vector back is itself a retention violation; its query ids
    // simply return no rows (the same observable a rebuilt index gives)
    Retire.survivors(spark, table, src, "doc_id")
      .join(broadcast(queryIds), "doc_id")
      .select(col("tkey"), col("doc_id").as("query_id"),
        col("w").as("wq"))
  }

  /** Tombstone `ids` (doc_id rows) — deleted docs vanish from results,
    * candidates, θ-seeds AND the query side immediately; [[compact]]
    * drops their rows physically. See [[Retire]].
    */
  def delete(spark: SparkSession, table: String, ids: DataFrame): Unit =
    Retire.delete(spark, table, ids, "doc_id")

  /** File-granular physical removal across postings, norms and the
    * doc-keyed mirror; df/rawdf/stats stay frozen (the standing extend
    * contract — weights of surviving docs never move).
    */
  def compact(spark: SparkSession, table: String): Unit =
    Retire.compact(spark, table, Seq(
      table -> "doc_id",
      normsTable(table) -> "doc_id",
      byDocTable(table) -> "doc_id"))

  /** The naive Σ-postings cosine tail, doc-co-located (r15, the
    * [[Bm25IndexStore]] `naivePartials` discipline): a broadcast
    * semi-join restricts the postings to the batch's terms
    * (Σ-distinct-term-df rows — always ≤ the (query, doc) pair volume
    * the previous shape shuffled through its pair aggregation), those
    * rows repartition by doc_id, and the pair-expanding join plus the
    * (query, doc) dot aggregation ride that partitioning exchange-free
    * (HashPartitioning(doc_id) clusters every pair). The dot/norm
    * arithmetic is byte-identical to the r14 shape — only summation
    * order inside a pair can move, the documented ~1e-13-under-4dp
    * regime. The norms join runs after the aggregation exactly as
    * before.
    */
  private def naiveCosine(
      spark: SparkSession, post: DataFrame, norms: DataFrame,
      qpost: DataFrame, qn: DataFrame,
      mask: DataFrame => DataFrame): DataFrame = {
    val n = spark.sessionState.conf.numShufflePartitions
    val matched = post.select("tkey", "doc_id", "w")
      .join(broadcast(qpost.select("tkey")), Seq("tkey"), "left_semi")
      .repartition(n, col("doc_id"))
    // neighbor-side tombstone mask after the term join (pair-sized
    // stream) — a pair's cosine involves only its own postings + norm,
    // so masking here equals physical removal ([[Retire]])
    mask(matched.join(broadcast(qpost), "tkey"))
      .filter(col("doc_id") =!= col("query_id"))
      .groupBy("query_id", "doc_id")
      .agg(sum(col("wq") * col("w")).as("dot"))
      .join(norms, "doc_id")
      .join(broadcast(qn), "query_id")
      .select(col("query_id"), col("doc_id"),
        round(col("dot") / (col("nq") * col("nrm")), 4).as("score"))
  }

  def search(spark: SparkSession, table: String, queryIds: DataFrame,
      topN: Int): DataFrame = {
    val post = spark.table(table)
    val norms = spark.table(normsTable(table))
    val qn = norms.join(broadcast(queryIds), "doc_id")
      .select(col("doc_id").as("query_id"), col("nrm").as("nq"))
    val q = queryVectors(spark, table, queryIds)
    WandKernel.finalTopK(
      naiveCosine(spark, post, norms, q, qn,
        df => Retire.survivors(spark, table, df, "doc_id")),
      topN, "cosine")
  }

  /** Exact cosine of every candidate pair — [[search]]'s arithmetic
    * (term-keyed dot, norm division, 4dp rounding) restricted to
    * candidates via scan-side semi-joins; emitted rows track the
    * candidate set, not Σ postings.
    */
  private def scoreCandidates(
      post: DataFrame, norms: DataFrame, qpost: DataFrame,
      qn: DataFrame, cand: DataFrame): DataFrame =
    post
      .join(broadcast(cand.join(qpost, "query_id")),
        Seq("tkey", "doc_id"))
      .groupBy("query_id", "doc_id")
      .agg(sum(col("wq") * col("w")).as("dot"))
      .join(norms, "doc_id")
      .join(broadcast(qn), "query_id")
      .select(col("query_id"), col("doc_id"),
        round(col("dot") / (col("nq") * col("nrm")), 4).as("score"))


  /** Top-`topN` cosine matches served with the MaxScore machinery of
    * [[Bm25IndexStore.wandSearch]], adapted to the normalized vector-
    * space score: a pair's cosine is Σ_t (wq_t/‖q‖)·(w_t/‖d‖), so the
    * per-term impact is the saved `wn = w/‖d‖` and each query term's
    * contribution bound is (wq_t/‖q‖)·capwn_t with capwn the P-th
    * ranked `wn`. Tail cutoffs are expressed back in `wn` units
    * (divide by the positive query factor); terms with zero query
    * weight cannot lift a doc and produce no cutoff. Identical output
    * to [[search]] — same exact-scoring pipeline on the candidates,
    * and skipped docs are strictly below the k-th score by the same
    * m-term bound (spec-pinned; carries the same oracle). Per-query
    * routing and the chunked scoring broadcast follow
    * [[Bm25IndexStore.wandSearch]] step 3: a query WAND-serves only
    * when pruning at least halves its naive Σ df volume, so
    * dense-overlap batches fall back to [[search]]'s kernel instead
    * of building an unbounded candidate broadcast.
    */
  def wandSearch(spark: SparkSession, table: String, queryIds: DataFrame,
      topN: Int, prefixP: Int = 64,
      broadcastRows: Long = Bm25IndexStore.BroadcastRows): DataFrame = {
    import graft.functions.TopKAgg
    val post = spark.table(table)
    val norms = spark.table(normsTable(table))
    val qn = norms.join(broadcast(queryIds), "doc_id")
      .select(col("doc_id").as("query_id"), col("nrm").as("nq"))
    // ONE action fetches the batch's saved vectors — from the
    // doc-keyed mirror ([[queryVectors]]), not a full impact-ordered
    // postings scan — and tags each term with its pricing df, so the
    // pre-route can refuse a dense batch having touched only the
    // mirror and the df table
    // LEFT join + coalesce(0): the pricing df table counts BUILD-time
    // selected postings only, but an extend()ed doc's top-k can hold a
    // term no build doc selected — an inner join would silently DROP
    // that term from the query vector and break the 'identical to
    // search()' contract; df = 0 merely underprices that term's naive
    // volume, a routing imprecision, never a score change
    val dfT = spark.table(dfTable(table)).select(col("tkey"), col("df"))
    // nq rides along in the same frame so the driver-planned
    // orchestration fetches the whole query state in one bounded job
    val qvecPlan = queryVectors(spark, table, queryIds)
      .join(dfT, Seq("tkey"), "left")
      .join(broadcast(qn), "query_id")
      .select(col("query_id"), col("tkey"), col("wq"),
        coalesce(col("df"), lit(0L)).as("df"), col("nq"))
    // collectable batches take the DRIVER-PLANNED orchestration —
    // [[WandKernel.serveDriverPlanned]] instantiated with the cosine
    // algebra (see [[serveDriverPlanned]] below); it declines past its
    // driver-state caps (pair cells / collect budgets), which the
    // distributed orchestration below owns — an over-budget scoring
    // volume chunks in-place (r14). The all-ineligible refusal
    // (dense-overlap corpora) happens INSIDE the kernel on driver
    // arithmetic — on dense corpora the whole WAND overhead is then
    // the ONE bounded mirror-fetch job ([[WandKernel.boundedCollect]];
    // the r12 shape paid checkpoint + count + collect for the same
    // state), and an eligible batch pays at most four Spark actions
    // instead of the distributed form's driver-sequenced stage
    // cascade (the Bm25IndexStore measurement: 9.4 → 4.6 s).
    var qvecM: DataFrame = null
    if (Bm25IndexStore.driverPlanningEnabled) {
      import spark.implicits._
      WandKernel.boundedCollect(
          qvecPlan.as[(Long, Long, Double, Long, Double)],
          Bm25IndexStore.DriverBatchRows).foreach { rows =>
        serveDriverPlanned(spark, table, post, norms, rows,
          topN, prefixP, broadcastRows)
          .foreach(out => return out)
        // refused — the distributed path reuses the collected batch
        // (an over-cap batch, where boundedCollect itself refuses,
        // re-runs the mirror-fetch plan once for the checkpoint below —
        // see the Bm25 twin's tradeoff note)
        qvecM = spark.createDataset(spark.sparkContext.parallelize(
            rows.toIndexedSeq, spark.sparkContext.defaultParallelism))
          .toDF("query_id", "tkey", "wq", "df", "nq")
          .localCheckpoint(true)
      }
    }
    val qvec = if (qvecM != null) qvecM else qvecPlan.localCheckpoint(true)
    val qpost = qvec.select("tkey", "query_id", "wq")
    val qdf = qvec.select("query_id", "tkey", "df")
    def live(df: DataFrame): DataFrame =
      Retire.survivors(spark, table, df, "doc_id")
    def naiveAll(): DataFrame =
      WandKernel.finalTopK(
        naiveCosine(spark, post, norms, qpost, qn, live), topN, "cosine")
    // batch-sized intermediates are checkpointed — three postings
    // scans total (prefix, tail, final scoring), not one per
    // referencing broadcast subplan
    val qstats = WandKernel.queryStats(qdf, prefixP)
    val qCnt = qstats.select(col("query_id"), col("nt"))
    val eligible = qstats.filter(col("eligible")).select("query_id")
    if (eligible.isEmpty) return naiveAll()
    val qpostE = qpost.join(broadcast(eligible), Seq("query_id"), "left_semi")
    val prefix = post.filter(col("rnk_w") <= prefixP)
      .join(broadcast(qpostE), "tkey")
      .localCheckpoint(true)
    // tombstoned docs never become candidates or θ-seeds; `prefix`
    // still feeds the CAPS below, where a dead doc's wn only loosens
    // an upper bound (compaction restores tightness)
    val prefixLive = live(prefix)
    // contribution cap per (query, term): (wq/‖q‖) · (P-th wn),
    // GAP-TOLERANT (see [[Bm25IndexStore.wandSearch]]'s cap comment —
    // compaction leaves rank gaps): "no tail" from the FROZEN df
    // alone, cap = min SURVIVING rank-1..P impact otherwise, and a
    // tailed term with zero surviving prefix rows (and wq > 0 — a
    // zero-weight term cannot lift any doc) routes its queries naive.
    // Caps over TRUE ranks only: rank-0 extended postings are always
    // candidates and must not deflate the impact bound. Derived
    // BEFORE the θ-seed pass so uncappable queries never pay the seed
    // exact-scoring scan they cannot use.
    val capwn0 = qdf
      .join(broadcast(eligible), Seq("query_id"), "left_semi")
      .join(prefix.filter(col("rnk_w") >= 1)
          .groupBy("query_id", "tkey").agg(min("wn").as("minwn")),
        Seq("query_id", "tkey"), "left")
      .select(col("query_id"), col("tkey"),
        when(col("df") <= prefixP, lit(0.0))
          .otherwise(col("minwn")).as("capwn"))
      .localCheckpoint(true)
    val uncapped = capwn0.filter(col("capwn").isNull)
      .join(broadcast(qpost), Seq("query_id", "tkey"))
      .filter(col("wq") > 0.0)
      .select("query_id").distinct()
    val capwn = capwn0
      .join(broadcast(uncapped), Seq("query_id"), "left_anti")
      .filter(col("capwn").isNotNull)
    // θ from PARTIAL prefix cosines (prefix dot / true norms): a
    // lower bound of each pair's full cosine, so the k-th best partial
    // is a valid threshold at only the prefix rows' cost
    val pairScores = prefixLive
      .join(broadcast(uncapped), Seq("query_id"), "left_anti")
      .filter(col("doc_id") =!= col("query_id"))
      .groupBy("query_id", "doc_id")
      .agg(sum(col("wq") * col("w")).as("pdot"))
      .join(norms, "doc_id")
      .join(broadcast(qn), "query_id")
      .select(col("query_id"), col("doc_id"),
        (col("pdot") / (col("nq") * col("nrm"))).as("pscore"))
      .localCheckpoint(true)
    // live-prefix-empty queries have no θ-seed and no prefix
    // candidates: forced naive alongside the uncappable set, else the
    // routing prices them at volume 0 and wand-routes them into an
    // empty result (see [[Bm25IndexStore.wandSearch]]'s twin comment)
    val forceNaive = uncapped.unionByName(
        eligible.join(pairScores.select("query_id").distinct(),
          Seq("query_id"), "left_anti"))
      .distinct().localCheckpoint(true)
    val candA = pairScores.select("query_id", "doc_id")
    // θ = topN-th EXACT cosine of the top-4·topN partial seeds per
    // query (the Bm25IndexStore.wandSearch refinement — a partial θ
    // lets flat-impact tails under the cutoff)
    val seeds = pairScores.groupBy("query_id")
      .agg(TopKAgg.topK(4 * topN, col("pscore"), col("doc_id")).as("top"))
      .select(col("query_id"),
        explode(expr("transform(top, x -> x._2)")).as("doc_id"))
    val theta = scoreCandidates(post, norms, qpost, qn, seeds)
      .groupBy("query_id")
      .agg(TopKAgg.topK(topN, col("score"), col("doc_id")).as("top"))
      .select(col("query_id"),
        when(size(col("top")) >= topN,
          element_at(col("top"), topN).getField("_1"))
          .otherwise(lit(Double.MinValue)).as("theta"))
      .localCheckpoint(true)
    val caps = capwn
      .join(broadcast(qpost), Seq("query_id", "tkey"))
      .join(broadcast(qn), "query_id")
      .filter(col("wq") > 0.0)
      .select(col("query_id"), col("tkey"), col("capwn"),
        (col("wq") / col("nq")).as("qf"),
        (col("wq") / col("nq") * col("capwn")).as("capb"))
    val totals = caps.groupBy("query_id")
      .agg(sum("capb").as("cap_total"))
    val cutoffs = caps.join(totals, "query_id").join(theta, "query_id")
      .select(col("query_id"), col("tkey"),
        ((col("theta") - lit(WandKernel.RoundEps) - col("cap_total")
          + col("capb")) / col("qf")).as("cut"), col("capwn"))
      .filter(col("cut") <= col("capwn"))
      .select("query_id", "tkey", "cut")
    // the dual tail rule on the cosine contribution caps —
    // [[WandKernel.essentialSplit]]
    val essential = WandKernel.essentialSplit(caps, "capb", theta)
    // pricing + routing — [[Bm25IndexStore.wandSearch]]'s step 3 in
    // the same Σ df unit; the naive price and term count rode in on
    // qstats, and only eligible queries are priced
    val est1 = cutoffs.join(qdf, Seq("query_id", "tkey"))
      .groupBy("query_id").agg(sum("df").as("est1"))
    val est2 = essential.join(qdf, Seq("query_id", "tkey"))
      .groupBy("query_id").agg(sum("df").as("est2"))
    val nPref = candA.groupBy("query_id").agg(count(lit(1)).as("npref"))
    // routing + chosen tail probes — [[WandKernel.routes]] /
    // [[WandKernel.chosenCutoffs]] (the (1 + nt) broadcast pricing
    // lives there); uncappable and live-prefix-empty queries forced
    // ineligible so they reach the naive branch exactly once
    val routes = WandKernel.routes(
      qstats.join(
          broadcast(forceNaive.withColumn("fnaive", lit(true))),
          Seq("query_id"), "left")
        .withColumn("eligible", col("eligible") && col("fnaive").isNull)
        .drop("fnaive"),
      est1, est2, nPref)
    val chosen = WandKernel.chosenCutoffs(cutoffs, essential, routes)
    val candB = live(post.filter(col("rnk_w") > prefixP)
      .join(broadcast(chosen), "tkey")
      .filter(col("wn") >= col("cut") && col("doc_id") =!= col("query_id")))
      .select("query_id", "doc_id")
    val wandIds = routes.filter(col("use_wand")).select("query_id")
    val cand = candA.join(broadcast(wandIds), Seq("query_id"), "left_semi")
      .unionByName(candB).distinct()
    // bounded exact scoring — [[WandKernel.chunkedScores]]; the priced
    // volume decides up front whether the candidates even need
    // materializing (selective batches fit one chunk and skip it)
    val wandScores = WandKernel.chunkedScores(
      cand, qCnt, broadcastRows, topN, WandKernel.pricedRows(routes))(
      c => scoreCandidates(post, norms, qpost, qn, c))
    // naive-routed queries — everything NOT wand-routed (pre-route
    // ineligible + priced-out); AQE elides the scan when the whole
    // batch WAND-routes
    val naiveQ = qpost.join(broadcast(wandIds), Seq("query_id"), "left_anti")
    val naiveScores = naiveCosine(spark, post, norms, naiveQ, qn, live)
    WandKernel.finalTopK(
      wandScores.unionByName(naiveScores), topN, "cosine")
  }

  /** Driver-planned serving — [[WandKernel.serveDriverPlanned]]
    * instantiated with the cosine algebra: the query factor is
    * wq/‖q‖ and the impact column is the saved norm-scaled
    * `wn` = w/‖d‖, so a pair's cosine is exactly Σ qf·wn and the
    * shared θ/caps/cutoffs/essential/routing arithmetic runs
    * unchanged; the norm DIVISION (the only algebra delta vs BM25)
    * lives in the exact-scoring closures, which reproduce [[search]]'s
    * Σ wq·w / (‖q‖·‖d‖) summation order to the ulp so 4dp rounding
    * cannot diverge between paths.
    */
  private def serveDriverPlanned(
      spark: SparkSession, table: String, post: DataFrame,
      norms: DataFrame, rows: Array[(Long, Long, Double, Long, Double)],
      topN: Int, prefixP: Int, broadcastRows: Long): Option[DataFrame] = {
    import spark.implicits._
    // tombstones as a driver predicate; over-cap declines driver
    // planning and the distributed anti-joins take over ([[Retire]])
    val deadSet = Retire.deadSet(spark, table) match {
      case None => return None
      case Some(s) => s
    }
    // one materialized mask reused across the kernel's closure calls —
    // see the Bm25 twin site ([[Retire.liveVia]])
    val live = Retire.liveVia(spark, deadSet, "doc_id")
    // the batch arrives PRE-COLLECTED (wandSearch's one bounded job);
    // the scoring closures' query-side frames rebuild from it locally
    // — no mirror re-fetch, no query-side Spark action in this path
    val qRows = rows.map { case (k, t, wq, df, nq) => (k, t, wq / nq, df) }
    val qpost = rows.iterator.map(r => (r._2, r._1, r._3)).toSeq
      .toDF("tkey", "query_id", "wq")
    val qn = rows.iterator.map(r => (r._1, r._5)).toSeq.distinct
      .toDF("query_id", "nq")
    def naivePlan(ids: Set[Long]): DataFrame = {
      val qp = rows.iterator.filter(r => ids(r._1))
        .map(r => (r._2, r._1, r._3)).toSeq.toDF("tkey", "query_id", "wq")
      val qnIds = rows.iterator.filter(r => ids(r._1))
        .map(r => (r._1, r._5)).toSeq.distinct.toDF("query_id", "nq")
      naiveCosine(spark, post, norms, qp, qnIds, live)
    }
    WandKernel.serveDriverPlanned(
      spark, qRows, topN, prefixP, broadcastRows,
      Bm25IndexStore.PrefixCollectRows,
      scanPrefix = tk => post.filter(col("rnk_w") <= prefixP)
        .join(broadcast(tk), "tkey")
        .select(col("tkey"), col("doc_id"),
          col("wn").as("impact"), col("rnk_w")),
      scanTail = chosen => live(post.filter(col("rnk_w") > prefixP)
        .join(broadcast(chosen), "tkey")
        .filter(col("wn") >= col("cut") &&
          col("doc_id") =!= col("query_id")))
        .select("query_id", "doc_id"),
      naivePlan = naivePlan,
      scoreCand = c => scoreCandidates(post, norms, qpost, qn, c),
      scoreName = "cosine",
      isDead = deadSet.contains)
  }
}
