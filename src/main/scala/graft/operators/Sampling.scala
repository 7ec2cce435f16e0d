package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables._
import graft.functions.TextFunctions._
import Relational.Q

/** Corpus assembly operators: sequence packing (concatenate-and-chunk
  * documents into fixed token-budget training windows) and deterministic
  * stratified downsampling (rebalance a skewed corpus toward a per-class
  * target). Both are arithmetic-exact, so they oracle cleanly.
  */
object Sampling {

  /** Global running sum of `valueCol` over `orderCol` order, EXCLUSIVE of
    * the current row — without the single-partition global window.
    *
    * `Window.orderBy(...)` with no partition key collapses the whole
    * frame into ONE task (Spark warns exactly this); at corpus scale
    * that's the classic accidental serialization. The scalable shape is
    * the textbook two-level scan:
    *
    *   1. range-repartition by the order key (so partition i's keys all
    *      precede partition i+1's);
    *   2. per-partition local window (parallel — each partition sorts and
    *      scans independently);
    *   3. per-partition totals (a `#partitions`-row aggregate) are
    *      prefix-summed on the driver and broadcast back as offsets.
    *
    * Driver state is O(#partitions), not O(rows). Output is independent
    * of where the range boundaries land.
    */
  def exclusivePrefixSum(
      df: DataFrame, orderCol: String, valueCol: String,
      partitions: Int, outCol: String): DataFrame =
    exclusivePrefixSum(df, Seq(col(orderCol)), valueCol, partitions, outCol)

  /** Multi-key form: `orderCols` may carry sort direction (e.g.
    * `col("score").desc, col("doc_id")`). The range partitioner and the
    * per-partition window share the exact key list, so the global order —
    * and therefore the prefix sum — stays boundary-independent even when
    * the leading key has ties that straddle partitions (the trailing keys
    * break them identically on both levels).
    */
  def exclusivePrefixSum(
      df: DataFrame, orderCols: Seq[Column], valueCol: String,
      partitions: Int, outCol: String): DataFrame = {
    val ranged = df.repartitionByRange(partitions, orderCols: _*)
      .withColumn("_pid", spark_partition_id())
      .persist()
    val partTotals = ranged.groupBy("_pid")
      .agg(sum(col(valueCol)).as("_ptot"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val offsets = (0 until partitions).scanLeft(0L) {
      case (acc, pid) => acc + partTotals.getOrElse(pid, 0L)
    }
    val s = df.sparkSession
    val offsetDf = s.createDataFrame(
      s.sparkContext.parallelize(
        (0 until partitions).map(pid => org.apache.spark.sql.Row(pid, offsets(pid))), 1),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("_pid",
          org.apache.spark.sql.types.IntegerType, nullable = false),
        org.apache.spark.sql.types.StructField("_poff",
          org.apache.spark.sql.types.LongType, nullable = false))))
    val local = Window.partitionBy("_pid").orderBy(orderCols: _*)
      .rowsBetween(Window.unboundedPreceding, -1)
    // materialize before returning (standard release pattern — see
    // Dedup/Quality): the persisted range frame MUST feed both the
    // offsets collect above and this plan from the same materialization
    // (a recompute could land rows in different _pid ranges), so it
    // can't be unpersisted lazily. localCheckpoint pins the result,
    // then the explicit unpersist frees the window immediately instead
    // of squatting in executor storage until GC.
    val out = ranged
      .withColumn("_lb", coalesce(sum(col(valueCol)).over(local), lit(0L)))
      .join(broadcast(offsetDf), "_pid")
      .withColumn(outCol, col("_lb") + col("_poff"))
      .drop("_pid", "_lb", "_poff")
      .localCheckpoint(true)
    ranged.unpersist()
    out
  }

  /** Tokens per training window. 4096 is a typical context length; the
    * value is shared verbatim by the DuckDB oracle.
    */
  val SeqBudget = 4096L

  /** Pack documents into fixed-budget token windows in doc_id order:
    * concatenate-and-chunk semantics (a document whose tokens straddle a
    * boundary spans both windows — the standard pretraining packing that
    * wastes zero budget, as opposed to first-fit binning which can't be
    * expressed as a scan). Each doc gets the window its FIRST token lands
    * in plus its intra-window offset; the consumer slices from there.
    */
  val qSeqPacking: Q = (s, d) => {
    val toks = documents(s, d)
      .select(col("doc_id"),
        size(tokens(col("text"))).cast("long").as("n_tokens"))
    // exclusivePrefixSum materializes its result and unpersists its
    // internal range frame before returning; what remains is a cheap
    // per-row map over the checkpointed frame
    exclusivePrefixSum(toks, "doc_id", "n_tokens", 32, "cum_before")
      .withColumn("seq_id", expr(s"cum_before div $SeqBudget"))
      .withColumn("offset_in_seq", pmod(col("cum_before"), lit(SeqBudget)))
      .select("doc_id", "n_tokens", "seq_id", "offset_in_seq")
      .orderBy("doc_id")
  }

  val qSeqPackingSql: String =
    s"""WITH t AS (
      |  SELECT doc_id,
      |    CAST(len(list_filter(string_split_regex(trim(text), '\\s+'),
      |             x -> x <> '')) AS BIGINT) AS n_tokens
      |  FROM documents),
      |c AS (
      |  SELECT doc_id, n_tokens,
      |    CAST(COALESCE(sum(n_tokens) OVER (
      |      ORDER BY doc_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
      |    AS BIGINT) AS cum_before
      |  FROM t)
      |SELECT doc_id, n_tokens,
      |  cum_before // $SeqBudget AS seq_id,
      |  cum_before % $SeqBudget AS offset_in_seq
      |FROM c ORDER BY doc_id""".stripMargin

  /** Pack cells for [[qPackWholeDocs]]; shared with the oracle. */
  val PackCells = 8L

  /** Whole-document packing — the SFT/instruction-tuning shape: an
    * example must land INTACT in exactly one training sequence, unlike
    * [[qSeqPacking]]'s concatenate-and-chunk where documents straddle
    * window boundaries. Exact bin packing is inherently sequential;
    * the scan-expressible production plan is SHELF packing over a
    * length-descending order: within a pack cell, docs sort by
    * (n_tokens DESC, doc_id) and each doc joins the shelf
    * floor(cum_before / budget). Descending order places the big
    * documents first so the late (small) docs fill shelf tails — the
    * first-fit-decreasing approximation with O(1) scan state. A doc
    * longer than the budget is flagged truncated (whole-doc semantics
    * cannot split it; the consumer clips). A shelf can exceed the
    * budget by at most its last-arriving doc; `fill` reports
    * min(tokens, budget)/budget so the padding the trainer will pay is
    * visible per shelf. Output is the shelf MANIFEST (cell, seq,
    * counts, fill) — the planner artifact a packing loader consumes.
    *
    * Scale shape: the only window partitions by pack CELL (md5(doc_id)
    * band, the engine-portable hash convention) — sort state is
    * per-cell and cells scale with the corpus (production dials
    * [[PackCells]] to executor memory); packing quality is cell-local
    * and its padding loss amortizes at any corpus size. No global
    * exchange, no single-task window.
    */
  def packWholeDocs(
      docs: DataFrame, budget: Long, cells: Long): DataFrame = {
    val cell = pmod(portableHash52("packcell", col("doc_id")), lit(cells))
    val toks = docs.select(
      col("doc_id"),
      size(tokens(col("text"))).cast("long").as("n_tokens"),
      cell.as("cell"))
    val w = Window.partitionBy("cell")
      .orderBy(col("n_tokens").desc, col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    toks
      .withColumn("cum_before",
        coalesce(sum("n_tokens").over(w), lit(0L)))
      .withColumn("seq_id", expr(s"cum_before div $budget"))
      .groupBy("cell", "seq_id")
      .agg(
        count(lit(1)).as("n_docs"),
        sum("n_tokens").as("doc_tokens"),
        sum((col("n_tokens") > budget).cast("long")).as("n_truncated"))
      .select(col("cell"), col("seq_id"), col("n_docs"),
        col("doc_tokens"), col("n_truncated"),
        round(least(col("doc_tokens"), lit(budget)).cast("double") /
          budget.toDouble, 4).as("fill"))
      .orderBy("cell", "seq_id")
  }

  val qPackWholeDocs: Q = (s, d) =>
    packWholeDocs(documents(s, d), SeqBudget, PackCells)

  val qPackWholeDocsSql: String =
    s"""WITH t AS (
      |  SELECT doc_id,
      |    CAST(len(list_filter(string_split_regex(trim(text), '\\s+'),
      |             x -> x <> '')) AS BIGINT) AS n_tokens,
      |    CAST('0x' || substr(md5('packcell:' || doc_id), 1, 13)
      |      AS BIGINT) % $PackCells AS cell
      |  FROM documents),
      |c AS (
      |  SELECT cell, doc_id, n_tokens,
      |    CAST(COALESCE(sum(n_tokens) OVER (
      |      PARTITION BY cell ORDER BY n_tokens DESC, doc_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
      |    AS BIGINT) AS cum_before
      |  FROM t),
      |sh AS (
      |  SELECT cell, cum_before // $SeqBudget AS seq_id,
      |    CAST(count(*) AS BIGINT) AS n_docs,
      |    CAST(sum(n_tokens) AS BIGINT) AS doc_tokens,
      |    CAST(count(*) FILTER (WHERE n_tokens > $SeqBudget)
      |      AS BIGINT) AS n_truncated
      |  FROM c GROUP BY 1, 2)
      |SELECT cell, seq_id, n_docs, doc_tokens, n_truncated,
      |  round(least(doc_tokens, $SeqBudget) / $SeqBudget.0, 4) AS fill
      |FROM sh ORDER BY cell, seq_id""".stripMargin

  /** Per-stratum document target for rebalancing; shared with the oracle. */
  val StratumTarget = 120L

  /** Deterministic stratified downsampling: rebalance the corpus toward
    * ~StratumTarget docs per language. Selection is a pure function of
    * doc_id (an LCG step mod 10k against the stratum's admission
    * threshold), so the sample is reproducible across runs, engines, and
    * cluster layouts — no RNG state, no sampling order dependence. The
    * stratum thresholds are one broadcast-joined aggregate; the filter
    * itself is embarrassingly parallel.
    */
  val qStratifiedSample: Q = (s, d) => {
    val docs = documents(s, d).select("doc_id", "lang")
    val thresholds = docs.groupBy("lang")
      .agg(count(lit(1)).as("c"))
      .withColumn("t",
        least(lit(10000L), expr(s"(${StratumTarget} * 10000) div c")))
      .select("lang", "t")
    docs.join(broadcast(thresholds), "lang")
      .filter(pmod(col("doc_id") * 1103515245L + 12345L,
        lit(2147483648L)) % 10000L < col("t"))
      .select("doc_id", "lang")
      .orderBy("doc_id")
  }

  val qStratifiedSampleSql: String =
    s"""WITH thr AS (
      |  SELECT lang,
      |    least(10000, (${StratumTarget} * 10000) // count(*)) AS t
      |  FROM documents GROUP BY lang)
      |SELECT d.doc_id, d.lang
      |FROM documents d JOIN thr USING (lang)
      |WHERE (d.doc_id * 1103515245 + 12345) % 2147483648 % 10000 < t
      |ORDER BY d.doc_id""".stripMargin

  /** Chunk size / stride (overlap = size − stride); shared with the
    * oracle.
    */
  val ChunkSize = 200
  val ChunkStride = 160

  /** Overlapping token-window chunking — the RAG / long-context prep op:
    * split every document into ChunkSize-token windows every ChunkStride
    * tokens (trailing window keeps the remainder; a doc under one window
    * is its own chunk). Pure per-row fan-out: tokenize once, explode the
    * chunk index, slice the token array — zero shuffle until the output
    * sort, embarrassingly parallel at any corpus size.
    */
  val qDocChunks: Q = (s, d) => {
    val n = col("n")
    val nChunks = when(n <= ChunkSize, lit(1L))
      .otherwise(expr(s"(n - ${ChunkSize - ChunkStride + 1}) div $ChunkStride + 1"))
    documents(s, d)
      .select(col("doc_id"), tokens(col("text")).as("toks"))
      .withColumn("n", size(col("toks")).cast("long"))
      .filter(n > 0)
      .withColumn("chunk_id", explode(sequence(lit(0L), nChunks - 1)))
      .withColumn("start_tok", col("chunk_id") * ChunkStride)
      .withColumn("chunk_len", least(lit(ChunkSize.toLong), n - col("start_tok")))
      .withColumn("chunk_text",
        array_join(slice(col("toks"),
          (col("start_tok") + 1).cast("int"), lit(ChunkSize)), " "))
      .select("doc_id", "chunk_id", "start_tok", "chunk_len", "chunk_text")
      .orderBy("doc_id", "chunk_id")
  }

  val qDocChunksSql: String =
    s"""WITH t AS (
      |  SELECT doc_id,
      |    list_filter(string_split_regex(trim(text), '\\s+'),
      |                x -> x <> '') AS l
      |  FROM documents),
      |sized AS (SELECT doc_id, l, CAST(len(l) AS BIGINT) AS n
      |          FROM t WHERE len(l) > 0),
      |chunked AS (
      |  SELECT doc_id, l, n, CAST(i AS BIGINT) AS chunk_id
      |  FROM sized CROSS JOIN
      |    (SELECT unnest(range(0, (SELECT CAST(max(len(l)) AS BIGINT)
      |       FROM t) // $ChunkStride + 2)) AS i) r
      |  WHERE i < CASE WHEN n <= $ChunkSize THEN 1
      |                 ELSE (n - ${ChunkSize - ChunkStride + 1}) // $ChunkStride + 1 END)
      |SELECT doc_id, chunk_id,
      |  chunk_id * $ChunkStride AS start_tok,
      |  least($ChunkSize, n - chunk_id * $ChunkStride) AS chunk_len,
      |  array_to_string(l[CAST(chunk_id * $ChunkStride + 1 AS INT) :
      |    CAST(chunk_id * $ChunkStride + $ChunkSize AS INT)], ' ')
      |    AS chunk_text
      |FROM chunked
      |ORDER BY doc_id, chunk_id""".stripMargin

  /** Total-doc target for the temperature mix; shared with the oracle. */
  val MixTarget = 200.0

  /** Temperature-weighted source mixing (α = 0.5): admission rate per
    * source ∝ c^α / c — the standard LLM-mixture move that upweights
    * small sources without flattening to uniform (α=0) or keeping the
    * natural skew (α=1). Same pure-LCG admission as the stratified
    * sampler; the α-weights are one tiny aggregate broadcast back.
    * Thresholds are integers derived from doubles computed in the SAME
    * expression order in both engines, so the floor is engine-stable.
    */
  val qMixtureTemperature: Q = (s, d) => {
    val docs = documents(s, d).select("doc_id", "lang")
    val counts = docs.groupBy("lang").agg(count(lit(1)).as("c"))
      .withColumn("w", sqrt(col("c").cast("double")))
    val total = counts.agg(sum("w").as("tw"))
    val thresholds = counts.crossJoin(broadcast(total))
      .withColumn("t", floor(
        least(lit(1.0), lit(MixTarget) * col("w") / col("tw") / col("c"))
          * 10000).cast("long"))
      .select("lang", "t")
    docs.join(broadcast(thresholds), "lang")
      .filter(pmod(col("doc_id") * 1103515245L + 12345L,
        lit(2147483648L)) % 10000L < col("t"))
      .select("doc_id", "lang")
      .orderBy("doc_id")
  }

  val qMixtureTemperatureSql: String =
    s"""WITH c AS (SELECT lang, count(*) AS c FROM documents GROUP BY 1),
      |w AS (SELECT lang, c, sqrt(CAST(c AS DOUBLE)) AS w FROM c),
      |t AS (SELECT lang,
      |        CAST(floor(least(1.0,
      |          ${MixTarget} * w / (SELECT sum(w) FROM w) / c) * 10000)
      |          AS BIGINT) AS t
      |      FROM w)
      |SELECT d.doc_id, d.lang
      |FROM documents d JOIN t USING (lang)
      |WHERE (d.doc_id * 1103515245 + 12345) % 2147483648 % 10000 < t
      |ORDER BY d.doc_id""".stripMargin

  /** Per-language epoch cap for the UniMax waterfill; shared with the
    * oracle. 1.5 makes the cap bite on the fixture's smallest language
    * while the rest waterfill — both branches exercised.
    */
  val UniMaxEpochCap = 1.5

  // ---------------------------------------------------------------------
  // UniMax budget allocation (Chung et al., "UniMax: Fairer and More
  // Effective Language Sampling for Large-Scale Multilingual
  // Pretraining", ICLR 2023): waterfill a total token budget (B = one
  // epoch of the whole corpus) across languages under a per-language
  // epoch cap — low-resource languages cap at UniMaxEpochCap epochs,
  // everyone else splits the leftover equally. Closed form: sort
  // languages by capacity; the capped set is the largest k whose k-th
  // smallest capacity still sits under the water level implied by
  // capping the first k; threshold = (B − Σ capped) / (n − k).
  //
  // Scale shape: the ONLY corpus pass is the per-language token count
  // (partial+final agg). Every window after it runs over the
  // #languages-row aggregate — the dimension-sized single-partition
  // exception (state = #langs rows, never corpus rows). Parity: both
  // engines derive the same IEEE doubles from the same integer counts in
  // the same cumulative order (the sort is total: cap then lang).
  // ---------------------------------------------------------------------
  /** Allocation over any frame with (lang, text). */
  def langBudget(docs: DataFrame): DataFrame = {
    val w = Window.orderBy("cap", "lang")
    val cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val all = Window.partitionBy()
    docs
      .select(col("lang"), size(tokens(col("text"))).cast("long").as("nt"))
      .groupBy("lang").agg(sum("nt").as("toks"))
      .withColumn("cap", lit(UniMaxEpochCap) * col("toks"))
      .withColumn("rn", row_number().over(w))
      .withColumn("cum", sum("cap").over(cum))
      .withColumn("n", count(lit(1)).over(all))
      .withColumn("b", sum("toks").over(all).cast("double"))
      .withColumn("maxcap", max("cap").over(all))
      .withColumn("feasible",
        when(col("rn") < col("n"),
          col("cap") <= (col("b") - col("cum")) / (col("n") - col("rn")))
          .otherwise(col("cum") <= col("b")))
      .withColumn("kstar",
        max(when(col("feasible"), col("rn")).otherwise(0)).over(all))
      .withColumn("sk", coalesce(
        max(when(col("rn") === col("kstar"), col("cum"))).over(all),
        lit(0.0)))
      .withColumn("threshold",
        when(col("kstar") === col("n"), col("maxcap"))
          .otherwise((col("b") - col("sk")) / (col("n") - col("kstar"))))
      .select(col("lang"), col("toks"),
        round(least(col("cap"), col("threshold")), 2).as("alloc_tokens"),
        round(least(col("cap"), col("threshold")) / col("toks"), 4)
          .as("epochs"),
        round(least(col("cap"), col("threshold")) / col("b"), 4)
          .as("budget_share"))
      .orderBy("lang")
  }

  val qLangBudget: Q = (s, d) => langBudget(documents(s, d))

  val qLangBudgetSql: String =
    s"""WITH tok AS (SELECT lang,
      |    CAST(sum(len(list_filter(string_split_regex(trim(text), '\\s+'),
      |      t -> t <> ''))) AS BIGINT) AS toks
      |  FROM documents GROUP BY lang),
      |c AS (SELECT lang, toks, $UniMaxEpochCap * toks AS cap FROM tok),
      |o AS (SELECT *,
      |    row_number() OVER (ORDER BY cap, lang) AS rn,
      |    sum(cap) OVER (ORDER BY cap, lang
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
      |    count(*) OVER () AS n,
      |    CAST(sum(toks) OVER () AS DOUBLE) AS b,
      |    max(cap) OVER () AS maxcap
      |  FROM c),
      |f AS (SELECT *,
      |    CASE WHEN rn < n THEN cap <= (b - cum) / (n - rn)
      |         ELSE cum <= b END AS feasible
      |  FROM o),
      |k AS (SELECT *,
      |    max(CASE WHEN feasible THEN rn ELSE 0 END) OVER () AS kstar
      |  FROM f),
      |s AS (SELECT *,
      |    coalesce(max(CASE WHEN rn = kstar THEN cum END) OVER (), 0.0)
      |      AS sk
      |  FROM k),
      |t AS (SELECT *,
      |    CASE WHEN kstar = n THEN maxcap
      |         ELSE (b - sk) / (n - kstar) END AS threshold
      |  FROM s)
      |SELECT lang, toks,
      |  round(least(cap, threshold), 2) AS alloc_tokens,
      |  round(least(cap, threshold) / toks, 4) AS epochs,
      |  round(least(cap, threshold) / b, 4) AS budget_share
      |FROM t ORDER BY lang""".stripMargin

  /** Epoch seed for the deterministic shuffle; shared with the oracle. */
  val ShuffleSeed = 42

  /** Deterministic corpus shuffle — the training-order op: every epoch's
    * global order is a pure function of (seed, doc_id), so the order is
    * reproducible across runs, engines, and cluster layouts, and a new
    * epoch is just a new seed. The sort key is md5 of the seed-salted
    * doc_id (engine-portable, unlike xxhash64).
    *
    * Scale shape: the global position comes from [[exclusivePrefixSum]]
    * over the hash key — a range exchange on the key plus PARALLEL
    * per-partition scans — never a single-partition global window. This
    * is exactly how a 100 TB corpus gets its training order: range-sort
    * by hash, write partitions in key order, positions are partition
    * offsets plus local ranks.
    */
  def shuffledPositions(
      df: DataFrame, idCol: String, seed: Int, partitions: Int): DataFrame = {
    val keyed = df.select(col(idCol),
      md5(concat_ws(":", lit(seed), col(idCol))).as("shuffle_key"),
      lit(1L).as("one"))
    exclusivePrefixSum(keyed, "shuffle_key", "one", partitions, "pos")
      .select(idCol, "pos")
  }

  val qShuffleOrder: Q = (s, d) =>
    // exclusivePrefixSum (inside shuffledPositions) materializes and
    // releases its own range frame; nothing here needs pinning
    shuffledPositions(documents(s, d), "doc_id", ShuffleSeed, 32)
      .orderBy("pos")

  val qShuffleOrderSql: String =
    s"""SELECT doc_id,
      |  CAST(row_number() OVER (
      |    ORDER BY md5($ShuffleSeed || ':' || doc_id)) - 1 AS BIGINT)
      |    AS pos
      |FROM documents ORDER BY pos""".stripMargin

  /** Sample size for the weighted sample; shared with the oracle. */
  val WeightedSampleK = 50

  /** Efraimidis–Spirtakis weighted sampling WITHOUT replacement
    * (IPL 2006), exponential-race form: each row gets
    * `es_key = -ln(u) / w` — an Exp(w) arrival time with u derived
    * deterministically from md5(seed:id) (the [[shuffledPositions]]
    * engine-portable convention: first 13 hex chars as a 52-bit
    * integer, +0.5, /2^52 ⇒ u strictly inside (0,1)) — and the k
    * SMALLEST keys win. P(row i sampled first) = w_i/Σw exactly, and
    * the remaining draws follow the without-replacement law; a new
    * seed is a fresh independent sample, reproducible across engines.
    *
    * Scale shape: one per-row map (md5 + ln are codegen'd built-ins) +
    * a global top-k — TakeOrderedAndProject keeps k rows per map task
    * and merges k×tasks at the driver; no full sort, no shuffle of the
    * corpus.
    *
    * Rows with non-positive weight are EXCLUDED up front: w = 0 means
    * zero selection probability under the E-S law (but its +∞ key
    * would backfill an undersized sample), and w < 0 would invert the
    * ordering and deterministically force the row into every sample —
    * both silently plausible-looking, so the filter enforces the
    * precondition instead of documentation alone.
    */
  def weightedSample(
      df: DataFrame, idCol: String, weightCol: String, k: Int,
      seed: Int): DataFrame = {
    val u = (portableHash52(seed.toString, col(idCol)).cast("double") +
      lit(0.5)) / lit(4503599627370496.0)
    df.where(col(weightCol) > 0)
      .withColumn("es_key", -log(u) / col(weightCol).cast("double"))
      .orderBy("es_key")
      .limit(k)
  }

  val qWeightedSample: Q = (s, d) =>
    weightedSample(
      documents(s, d).select(col("doc_id"), col("n_chars")),
      "doc_id", "n_chars", WeightedSampleK, ShuffleSeed)
      .select(col("doc_id"), col("n_chars").as("weight"),
        round(col("es_key"), 6).as("es_key"))
      .orderBy("doc_id")

  val qWeightedSampleSql: String =
    s"""WITH keyed AS (
      |  SELECT doc_id, n_chars,
      |    -ln((CAST('0x' || substr(md5($ShuffleSeed || ':' || doc_id),
      |                             1, 13) AS BIGINT) + 0.5)
      |        / 4503599627370496.0) / n_chars AS es_key
      |  FROM documents),
      |win AS (SELECT * FROM keyed ORDER BY es_key LIMIT $WeightedSampleK)
      |SELECT doc_id, CAST(n_chars AS BIGINT) AS weight,
      |  round(es_key, 6) AS es_key
      |FROM win ORDER BY doc_id""".stripMargin

  /** Split percentages (test / val, rest train); shared with the oracle. */
  val SplitTestPct = 10L
  val SplitValPct = 10L

  /** Leakage-safe train/val/test split: assignment is a pure LCG
    * function of the document's near-dup CLUSTER anchor, not its own id
    * — near-duplicate documents land in the SAME split, so the eval
    * sets can't be contaminated by paraphrases of training docs (the
    * standard "split by group" rule; splitting i.i.d. by doc_id leaks
    * every near-dup pair that straddles the cut). Unclustered docs
    * anchor to themselves, so for a dup-free corpus this degrades to
    * the plain deterministic split. Assignment is also frozen under
    * corpus growth: new docs can't move an existing doc's anchor
    * bucket unless they genuinely join its near-dup cluster.
    *
    * Scale shape: pair finding + components are the existing subquadratic
    * ops; the split itself is a per-row map over the anchored frame.
    */
  val qSplitLeakageSafe: Q = (s, d) => {
    val anchored = Dedup.corpusNear(s, d).select("doc_id")
      .join(Clustering.nearDupClusterLabels(s, d), Seq("doc_id"), "left")
      .withColumn("anchor", coalesce(col("cluster_id"), col("doc_id")))
    val b = pmod(col("anchor") * 1103515245L + 12345L,
      lit(2147483648L)) % 100L
    anchored.select(col("doc_id"),
      when(b < SplitTestPct, "test")
        .when(b < SplitTestPct + SplitValPct, "val")
        .otherwise("train").as("split"))
      .orderBy("doc_id")
  }

  /** Same pair CTE + recursive closure as q_dedup_clusters (the shared
    * [[Clustering.clusterLabelsCtes]] chain), then the LCG bucket on the
    * cluster anchor.
    */
  // stripMargin the new lines only (Clustering.clusterLabelsCtes is
  // already stripped; re-stripping would corrupt any CTE line that ever
  // starts with '|')
  val qSplitLeakageSafeSql: String =
    Clustering.clusterLabelsCtes + "\n" +
      s"""SELECT c.doc_id,
      |  CASE
      |    WHEN b < $SplitTestPct THEN 'test'
      |    WHEN b < ${SplitTestPct + SplitValPct} THEN 'val'
      |    ELSE 'train'
      |  END AS split
      |FROM (
      |  SELECT c.doc_id,
      |    (COALESCE(l.cluster_id, c.doc_id) * 1103515245 + 12345)
      |      % 2147483648 % 100 AS b
      |  FROM corpus c LEFT JOIN labels l USING (doc_id)) c
      |ORDER BY c.doc_id""".stripMargin

  // ---------------------------------------------------------------------
  // Packing manifest — the boundary metadata the trainer consumes
  // alongside packed sequences: per packed sequence, the ordered spans
  // (which doc, which token range of it, where it sits in the
  // sequence). This is what attention-boundary resets and loss masks
  // key on; a doc straddling a sequence boundary appears once per
  // sequence it touches, with complementary doc ranges.
  //
  // Scale shape: inherits the two-level prefix sum (no single-task
  // window), then a per-doc explode over the 1–2 sequences a doc
  // touches and a per-sequence slot rank (window partitioned by seq_id
  // — parallel across sequences, each bounded by budget/min_doc_len
  // slots). Pure integer arithmetic end to end — hash-exact by
  // construction.
  // ---------------------------------------------------------------------
  def packManifest(toks: DataFrame, budget: Long): DataFrame = {
    val cum = exclusivePrefixSum(toks, "doc_id", "n_tokens", 32, "cum")
      .filter(col("n_tokens") > 0)
    val spans = cum
      .withColumn("seq_id",
        // div, not / — Column./ on longs is double division
        explode(sequence(expr(s"cum div $budget"),
          expr(s"(cum + n_tokens - 1) div $budget"))))
      .withColumn("doc_from",
        greatest(col("seq_id") * budget - col("cum"), lit(0L)))
      .withColumn("doc_to",
        least((col("seq_id") + 1) * budget - col("cum"), col("n_tokens")))
      .withColumn("start_in_seq",
        col("cum") + col("doc_from") - col("seq_id") * budget)
    val w = Window.partitionBy("seq_id").orderBy("start_in_seq")
    spans
      .withColumn("slot", row_number().over(w))
      .select(col("seq_id"), col("slot"), col("doc_id"),
        col("start_in_seq"), col("doc_from"), col("doc_to"),
        (col("doc_to") - col("doc_from")).as("span_len"))
      .orderBy("seq_id", "slot")
  }

  val qPackManifest: Q = (s, d) =>
    packManifest(
      documents(s, d).select(col("doc_id"),
        size(tokens(col("text"))).cast("long").as("n_tokens")),
      SeqBudget)

  val qPackManifestSql: String =
    s"""WITH t AS (
      |  SELECT doc_id,
      |    CAST(len(list_filter(string_split_regex(trim(text), '\\s+'),
      |             x -> x <> '')) AS BIGINT) AS n_tokens
      |  FROM documents),
      |c AS (
      |  SELECT doc_id, n_tokens,
      |    CAST(COALESCE(sum(n_tokens) OVER (
      |      ORDER BY doc_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
      |    AS BIGINT) AS cum
      |  FROM t WHERE n_tokens > 0),
      |sp AS (
      |  SELECT doc_id, n_tokens, cum, CAST(s.seq_id AS BIGINT) AS seq_id,
      |    greatest(CAST(s.seq_id AS BIGINT) * $SeqBudget - cum, 0)
      |      AS doc_from,
      |    least((CAST(s.seq_id AS BIGINT) + 1) * $SeqBudget - cum,
      |      n_tokens) AS doc_to
      |  FROM c CROSS JOIN
      |    unnest(range(cum // $SeqBudget,
      |      (cum + n_tokens - 1) // $SeqBudget + 1)) AS s(seq_id))
      |SELECT seq_id,
      |  CAST(row_number() OVER (PARTITION BY seq_id
      |    ORDER BY cum + doc_from - seq_id * $SeqBudget) AS INT) AS slot,
      |  doc_id,
      |  cum + doc_from - seq_id * $SeqBudget AS start_in_seq,
      |  doc_from, doc_to,
      |  doc_to - doc_from AS span_len
      |FROM sp
      |ORDER BY seq_id, slot""".stripMargin

  // ---------------------------------------------------------------------
  // Rendezvous (highest-random-weight) sharding — Thaler & Ravishankar
  // IEEE ToN'98, the consistent-assignment rule behind cache rings and
  // shard routers: every doc hashes against EVERY shard id and lands on
  // the max-weight shard. The property that matters for a growing
  // corpus: when a shard is ADDED, a doc either keeps its shard or
  // moves to the NEW one (its old max is still its max among the
  // survivors) — so re-sharding from k to k+1 moves ~1/(k+1) of docs
  // and nothing shuffles between existing shards (spec-pinned).
  // Mod-hashing (doc_id % k) remaps ~(k-1)/k of everything.
  //
  // Scale shape: pure per-row compute — k md5s + an array_max over a
  // k-struct array, zero shuffle, zero state (PlanShapeSpec regime);
  // the only exchange is the presentation sort. Parity: struct max ≡
  // argmax by (hash, shard) — md5 inputs are all distinct strings, so
  // ties don't arise and DuckDB's arg_max matches.
  // ---------------------------------------------------------------------
  val RendezvousShards = 10

  def rendezvousShard(id: Column, nShards: Int): Column =
    array_max(array((0 until nShards).map(i =>
      struct(
        md5(concat(id.cast("string"), lit(s":shard$i"))).as("hw"),
        lit(i).as("shard"))): _*))
      .getField("shard")

  val qRendezvousShards: Q = (s, d) =>
    documents(s, d)
      .select(col("doc_id"),
        rendezvousShard(col("doc_id"), RendezvousShards).as("shard"))
      .orderBy("doc_id")

  val qRendezvousShardsSql: String =
    s"""WITH sh AS (SELECT CAST(unnest(range(0, $RendezvousShards)) AS INT)
      |              AS shard),
      |h AS (SELECT doc_id, shard,
      |        md5(CAST(doc_id AS VARCHAR) || ':shard' ||
      |            CAST(shard AS VARCHAR)) AS hw
      |      FROM documents CROSS JOIN sh)
      |SELECT doc_id, arg_max(shard, hw) AS shard
      |FROM h GROUP BY doc_id
      |ORDER BY doc_id""".stripMargin

  val queries: Map[String, Q] = Map(
    "q_rendezvous_shards" -> qRendezvousShards,
    "q_pack_manifest" -> qPackManifest,
    "q_split_leakage_safe" -> qSplitLeakageSafe,
    "q_seq_packing" -> qSeqPacking,
    "q_pack_whole_docs" -> qPackWholeDocs,
    "q_doc_chunks" -> qDocChunks,
    "q_mixture_temperature" -> qMixtureTemperature,
    "q_lang_budget" -> qLangBudget,
    "q_stratified_sample" -> qStratifiedSample,
    "q_shuffle_order" -> qShuffleOrder,
    "q_weighted_sample" -> qWeightedSample)

  val oracles: Map[String, String] = Map(
    "q_rendezvous_shards" -> qRendezvousShardsSql,
    "q_pack_manifest" -> qPackManifestSql,
    "q_split_leakage_safe" -> qSplitLeakageSafeSql,
    "q_seq_packing" -> qSeqPackingSql,
    "q_pack_whole_docs" -> qPackWholeDocsSql,
    "q_doc_chunks" -> qDocChunksSql,
    "q_mixture_temperature" -> qMixtureTemperatureSql,
    "q_lang_budget" -> qLangBudgetSql,
    "q_stratified_sample" -> qStratifiedSampleSql,
    "q_shuffle_order" -> qShuffleOrderSql,
    "q_weighted_sample" -> qWeightedSampleSql)
}
