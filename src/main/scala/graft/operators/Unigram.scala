package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.TextFunctions.tokens
import Relational.Q

/** Unigram-LM subword tokenizer (Kudo, ACL'18 — the SentencePiece
  * trainer's model family), the production tokenizer alternative to
  * BPE ([[TextAnalysis]]'s merge loop): instead of greedily growing
  * merges, START from a large substring seed vocabulary and fit a
  * unigram language model over pieces by EM, then PRUNE to the target
  * size; encoding is the Viterbi segmentation under the fitted piece
  * log-probabilities. This implementation is the deterministic
  * HARD-EM (Viterbi-count) variant: the E-step counts each piece once
  * per occurrence on the word's single best segmentation rather than
  * fractionally over the lattice — the variant whose every quantity is
  * an integer or a once-rounded log, which is what makes the trainer
  * DuckDB-oracle-checkable end to end (the distributed-GD discipline:
  * make every cross-row reduction integral).
  *
  * Scale shape (the BPE trainer's contract): ONE corpus pass collapses
  * the text to a (word, freq) table (vocab-bounded by Heaps' law);
  * seeding is one substring-explode aggregation over that table; each
  * EM round is one distributed Viterbi map over the word table with
  * the piece table BROADCAST (vocab-sized — chars + [[SeedMultiCap]]
  * entries) plus one vocab-sized count aggregation collected to the
  * driver (the sanctioned dimension-bounded collect). Per-round cost
  * is O(words × len × [[MaxPieceLen]]), corpus-size-independent.
  *
  * Determinism / oracle parity:
  *   - Piece scores are INTEGERS: round(ln(cnt/total) × [[ScoreScale]])
  *     — the only float step is one ln + one round per piece per round,
  *     and both engines derive it from the same integer counts (a
  *     last-ulp ln divergence would need the true value within ~2e-15
  *     of a rounding boundary to flip — the suite's standard
  *     measure-zero regime, cf. the classifier's exp()).
  *   - Viterbi DP sums integers, so path scores are exact; ties break
  *     toward the LONGER final piece, a total rule (equal score and
  *     equal length at the same end position is the same piece).
  *   - All caps cut on (count DESC, piece ASC in UTF-8 byte order) —
  *     the argmax family's standard total order.
  *   - Positions/lengths are CODEPOINTS (JVM side walks
  *     `String.codePoints`), matching substr/length semantics in both
  *     SQL engines.
  *
  * The oracle ([[qUnigramVocabSql]] / [[qUnigramEncodeSql]]) is
  * machine-generated chained CTEs like the BPE oracle, with the
  * Viterbi DP expressed as a RECURSIVE CTE that carries the last
  * [[MaxPieceLen]] best scores as a list column and picks
  * `list_max([score, len])` per position (lexicographic list order =
  * the score-then-longer-piece tie rule), plus a second recursion for
  * the backtrace. Every multiply-referenced stage is MATERIALIZED
  * (DuckDB inlines plain CTEs per reference — the BPE fd-exhaustion
  * lesson).
  */
object Unigram {

  /** Longest piece considered anywhere (seeding, DP transitions). */
  val MaxPieceLen = 6

  /** Multi-char seed pieces kept after the substring count (all
    * single chars are always kept — the coverage invariant that keeps
    * every word segmentable through every round).
    */
  val SeedMultiCap = 512

  /** Hard-EM rounds before the prune. */
  val EmRounds = 2

  /** Multi-char pieces surviving the final prune. 24 < the fixture's
    * ~31 surviving multi pieces, so the cap BITES on the fixture and
    * the post-prune re-segmentation path is exercised, not just
    * compiled.
    */
  val VocabMultiCap = 24

  /** ln(p) → integer scale. 1e6 keeps scores well inside Long while
    * making a last-ulp ln() divergence (~1e-15 relative) unable to
    * move the rounded integer off a boundary except on a measure-zero
    * set.
    */
  val ScoreScale = 1e6

  final case class Piece(piece: String, cnt: Long, score: Long)

  // -------------------------------------------------------------------
  // Trainer
  // -------------------------------------------------------------------

  /** The corpus collapsed to (w, freq) — the only corpus-sized pass. */
  private[graft] def wordFreq(docs: DataFrame): DataFrame =
    docs.select(explode(tokens(col("text"))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("freq"))
      .localCheckpoint(true)

  private def cpLen(s: String): Int = s.codePointCount(0, s.length)

  /** Integer piece scores under the current counts: one ln + one round
    * per piece, from integer counts — both engines compute the same
    * division and the same ×[[ScoreScale]] rounding.
    */
  private[graft] def scores(
      pieces: collection.Map[String, Long]): Map[String, Long] = {
    val total = pieces.valuesIterator.sum.toDouble
    pieces.iterator.map { case (p, c) =>
      p -> math.round(math.log(c.toDouble / total) * ScoreScale)
    }.toMap
  }

  /** Viterbi segmentation of one word under integer piece scores —
    * codepoint-based (matches SQL substr/length), tie-break toward the
    * longer final piece. Throws if some position has no covering piece
    * (cannot happen for corpus words: all single chars stay in the
    * vocabulary through every round).
    */
  private[graft] def viterbi(
      w: String, sc: collection.Map[String, Long]): Array[String] = {
    val cps = w.codePoints.toArray
    val n = cps.length
    val best = new Array[Long](n + 1)
    val pick = new Array[Int](n + 1)
    var i = 1
    while (i <= n) {
      var bs = Long.MinValue
      var bl = 0
      val lm = math.min(MaxPieceLen, i)
      var l = 1
      while (l <= lm) {
        sc.get(new String(cps, i - l, l)) match {
          case Some(ps) =>
            val cand = best(i - l) + ps
            if (cand > bs || (cand == bs && l > bl)) { bs = cand; bl = l }
          case None =>
        }
        l += 1
      }
      require(bl > 0,
        s"unigram: no piece covers position $i of '$w'")
      best(i) = bs
      pick(i) = bl
      i += 1
    }
    var e = n
    var count = 0
    while (e > 0) { count += 1; e -= pick(e) }
    val out = new Array[String](count)
    e = n
    var k = count - 1
    while (e > 0) {
      out(k) = new String(cps, e - pick(e), pick(e))
      k -= 1
      e -= pick(e)
    }
    out
  }

  /** Score of the implicit single-codepoint UNK piece in
    * [[viterbiWithUnk]] — far below any real piece score (scores are
    * round(ln(p)·1e6) ≥ −ln(total)·1e6 ≈ −3e7 even at 10¹² corpus
    * occurrences), so real coverage always wins; a word of 1000 UNK
    * positions sums to −10¹⁵, still far from Long overflow.
    */
  private val UnkScore = -1000000000000L

  /** The usage-distribution bucket for out-of-vocabulary pieces —
    * 7 codepoints, so it can never collide with a real piece
    * ([[MaxPieceLen]] = 6).
    */
  val UnkKey = "<unk!!>"

  /** [[viterbi]] with an UNK fallback: every position additionally
    * carries an implicit single-codepoint piece at [[UnkScore]], so
    * words with characters OUTSIDE the trained alphabet still segment
    * (uncoverable positions consume one codepoint each — the
    * byte-fallback accounting every production tokenizer applies).
    * On fully-covered words the output is IDENTICAL to [[viterbi]]
    * (UNK never beats a real piece). This is the staleness-measurement
    * encoder: an uncoverable position IS the drift being measured,
    * not an error.
    */
  private[graft] def viterbiWithUnk(
      w: String, sc: collection.Map[String, Long]): Array[String] = {
    val cps = w.codePoints.toArray
    val n = cps.length
    val best = new Array[Long](n + 1)
    val pick = new Array[Int](n + 1)
    var i = 1
    while (i <= n) {
      var bs = best(i - 1) + UnkScore // the implicit UNK candidate
      var bl = 1
      val lm = math.min(MaxPieceLen, i)
      var l = 1
      while (l <= lm) {
        sc.get(new String(cps, i - l, l)) match {
          case Some(ps) =>
            val cand = best(i - l) + ps
            if (cand > bs || (cand == bs && l > bl)) { bs = cand; bl = l }
          case None =>
        }
        l += 1
      }
      best(i) = bs
      pick(i) = bl
      i += 1
    }
    var e = n
    var count = 0
    while (e > 0) { count += 1; e -= pick(e) }
    val out = new Array[String](count)
    e = n
    var k = count - 1
    while (e > 0) {
      out(k) = new String(cps, e - pick(e), pick(e))
      k -= 1
      e -= pick(e)
    }
    out
  }

  /** Freq-weighted piece-usage distribution of `words` under frozen
    * scores, out-of-vocabulary pieces bucketed under [[UnkKey]]:
    * (usage map, word observations, piece observations). The
    * staleness baseline AND its live measurement both come from here
    * (one definition, the [[graft.plans.Staleness]] discipline).
    */
  private[graft] def usage(
      words: DataFrame, sc: Map[String, Long])
      : (Map[String, Long], Long, Long) = {
    val s = words.sparkSession
    import s.implicits._
    val b = s.sparkContext.broadcast(sc)
    val rows = words.select(col("w"), col("freq")).as[(String, Long)]
      .flatMap { case (w, f) =>
        viterbiWithUnk(w, b.value)
          .map(p => (if (b.value.contains(p)) p else UnkKey, f))
      }
      .toDF("piece", "f")
      .groupBy("piece").agg(sum("f").as("uses"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val nWords = words.agg(coalesce(sum("freq"), lit(0L)))
      .collect()(0).getLong(0)
    (rows, nWords, rows.valuesIterator.sum)
  }

  /** Hard-EM E-step: freq-weighted piece counts over every word's
    * Viterbi segmentation — a distributed map over the word table with
    * the (vocab-sized) score map broadcast, aggregated and collected
    * at vocab size.
    */
  private[graft] def emCounts(
      words: DataFrame, sc: Map[String, Long]): Map[String, Long] = {
    val s = words.sparkSession
    import s.implicits._
    val b = s.sparkContext.broadcast(sc)
    words.select(col("w"), col("freq")).as[(String, Long)]
      .flatMap { case (w, f) => viterbi(w, b.value).map((_, f)) }
      .toDF("piece", "f")
      .groupBy("piece").agg(sum("f").as("cnt"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
  }

  /** Train on a (w, freq) table: seed → [[EmRounds]] hard-EM rounds →
    * prune → final scores. Returns the pruned vocabulary sorted by
    * piece (UTF-8 byte order).
    */
  private[graft] def train(words: DataFrame): Seq[Piece] = {
    val s = words.sparkSession
    import s.implicits._
    // seed: substring occurrence counts, freq-weighted — one pass over
    // the vocab-bounded word table, never the corpus
    val subs = words.select(col("w"), col("freq")).as[(String, Long)]
      .flatMap { case (w, f) =>
        val cps = w.codePoints.toArray
        for {
          e <- 1 to cps.length
          l <- 1 to math.min(MaxPieceLen, e)
        } yield (new String(cps, e - l, l), f)
      }
      .toDF("piece", "f")
      .groupBy("piece").agg(sum("f").as("cnt"))
      .localCheckpoint(true)
    val chars = subs.filter(length(col("piece")) === 1)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val multi0 = subs
      .filter(length(col("piece")) > 1)
      .orderBy(col("cnt").desc, col("piece").asc)
      .limit(SeedMultiCap)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val charSet = chars.map(_._1)
    var pieces: Map[String, Long] = (chars ++ multi0).toMap
    var r = 0
    while (r < EmRounds) {
      val cnt = emCounts(words, scores(pieces))
      // chars keep coverage with a floor of 1; multi pieces live by
      // their Viterbi counts alone (count 0 = absent = dropped)
      pieces = charSet.iterator
        .map(c => c -> math.max(cnt.getOrElse(c, 0L), 1L)).toMap ++
        cnt.filter { case (p, _) => cpLen(p) > 1 }
      r += 1
    }
    val keptMulti = pieces.iterator.filter(p => cpLen(p._1) > 1).toSeq
      .sortWith { case ((pa, ca), (pb, cb)) =>
        if (ca != cb) ca > cb else TextAnalysis.utf8Less(pa, pb)
      }
      .take(VocabMultiCap)
    val pruned =
      charSet.map(c => c -> pieces(c)) ++ keptMulti
    val sc = scores(pruned.toMap)
    pruned.map { case (p, c) => Piece(p, c, sc(p)) }
      .sortWith((a, b) => TextAnalysis.utf8Less(a.piece, b.piece))
  }

  /** Memoized trained vocabulary per (context, dataset) — the trainer
    * is deterministic (integer counts, total-order caps), so the memo
    * is identical to retraining; shared by the vocab row, the encode
    * row, and the served twin's artifact build. Unbounded and
    * application-scoped like [[graft.plans.Memo]] (entries are
    * vocab-sized, ~KB each); long-lived multi-tenant sessions evict
    * via [[clearTrainedCache]] / [[graft.plans.Memo.clear]].
    */
  private val trainedCache = new java.util.concurrent
    .ConcurrentHashMap[String, Seq[Piece]]

  /** Eviction hook for long-lived applications (see
    * [[graft.plans.Memo.clear]]).
    */
  private[graft] def clearTrainedCache(): Unit = trainedCache.clear()

  private[graft] def trained(s: SparkSession, d: String): Seq[Piece] =
    trainedCache.computeIfAbsent(
      s.sparkContext.applicationId + "|" +
        graft.plans.AggStore.artifactId(d),
      _ => train(wordFreq(Tables.documents(s, d).select("doc_id", "text"))))

  // -------------------------------------------------------------------
  // Encoder
  // -------------------------------------------------------------------

  /** Per-doc Viterbi encode under a frozen score map: segment the
    * batch's DISTINCT words once (vocab-bounded work), broadcast-join
    * back to the exploded corpus, and reassemble each document's piece
    * stream in word order (pieces joined by '·' within a word, words
    * by ' ') — a hash-checkable rendering of the exact segmentation.
    * The [[TextAnalysis.bpeEncodeWithVocab]] tail shape: the corpus is
    * never shuffled; the per-doc aggregation is the only exchange.
    */
  def encodeWithVocab(
      docs: DataFrame, sc: Map[String, Long]): DataFrame = {
    val s = docs.sparkSession
    import s.implicits._
    val b = s.sparkContext.broadcast(sc)
    // materialized like bpeWordVocab: the distinct-word + Viterbi pass
    // is the vocab-side seed (one word-keyed exchange over the corpus,
    // paid once, lineage truncated) — the encode join below then
    // streams the exploded corpus through a broadcast with no
    // word-keyed exchange on the probe side (PlanShapeSpec pins it)
    val wseg = docs.select(explode(tokens(col("text"))).as("w")).distinct()
      .as[String]
      .map { w =>
        val ps = viterbi(w, b.value)
        (w, ps.mkString("·"), ps.length.toLong)
      }
      .toDF("w", "ws", "np")
      .localCheckpoint(true)
    docs
      .select(col("doc_id"), posexplode(tokens(col("text"))).as(Seq("idx", "w")))
      .join(broadcast(wseg), Seq("w"))
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_words"),
        sum("np").as("n_pieces"),
        array_join(
          transform(
            array_sort(collect_list(struct(col("idx"), col("ws")))),
            x => x.getField("ws")),
          " ").as("seg"))
      .join(docs.select("doc_id"), Seq("doc_id"), "right")
      .select(col("doc_id"),
        coalesce(col("n_words"), lit(0L)).as("n_words"),
        coalesce(col("n_pieces"), lit(0L)).as("n_pieces"),
        coalesce(col("seg"), lit("")).as("seg"))
  }

  // -------------------------------------------------------------------
  // Driver-facing queries
  // -------------------------------------------------------------------

  /** The trained vocabulary: (piece, count, integer score). */
  val qUnigramVocab: Q = (s, d) => {
    import s.implicits._
    trained(s, d).toDF("piece", "cnt", "score").orderBy("piece")
  }

  /** Whole-corpus Viterbi encode under the trained vocabulary (the
    * presentation sort lives HERE, not in the helper — aggregation
    * consumers like [[qUnigramFertility]] discard row order).
    */
  val qUnigramEncode: Q = (s, d) =>
    encodeWithVocab(
      Tables.documents(s, d).select("doc_id", "text"),
      trained(s, d).map(p => p.piece -> p.score).toMap)
      .orderBy("doc_id")

  /** Artifact-served twin: persist the piece table
    * ([[graft.plans.UnigramStore]]), encode from the FROZEN artifact —
    * the BPE-served discipline. Identical output to [[qUnigramEncode]]
    * by construction (the store round-trips (piece, score) exactly),
    * so the row carries the same oracle.
    */
  val qUnigramEncodeServed: Q = (s, d) => {
    val id = graft.plans.AggStore.artifactId(d)
    val table = s"graft_unigram_$id"
    val path = s"${sys.props("java.io.tmpdir")}/graft_unigram_$id"
    graft.plans.UnigramStore.save(s, trained(s, d), table, path)
    graft.plans.UnigramStore.encode(
      s, Tables.documents(s, d).select("doc_id", "text"), table)
      .orderBy("doc_id")
  }

  /** Per-document mean piece log-probability under the trained
    * unigram LM — the tokenizer-native perplexity proxy (the
    * piece-level sibling of q_unigram_logprob's word-level score, and
    * what SentencePiece-style LM filtering actually computes): score =
    * Σ ln p(piece) over the doc's Viterbi pieces / n_pieces. Computed
    * from the INTEGER scores, so the cross-row reduction is an exact
    * Long sum and the only float step is one division (/1e6/n) +
    * rounding — engine-exact by the house integral-reduction
    * discipline. Segmentation work is the encode shape: distinct
    * words segment once (vocab-bounded), per-word (count, score-sum)
    * broadcast-joins back to the exploded corpus.
    */
  val qUnigramDocLogprob: Q = (s, d) => {
    import s.implicits._
    val scMap = trained(s, d).map(p => p.piece -> p.score).toMap
    val docs = Tables.documents(s, d).select("doc_id", "text")
    val b = s.sparkContext.broadcast(scMap)
    val wsc = docs.select(explode(tokens(col("text"))).as("w")).distinct()
      .as[String]
      .map { w =>
        val ps = viterbi(w, b.value)
        (w, ps.length.toLong, ps.map(b.value).sum)
      }
      .toDF("w", "np", "ssum")
      .localCheckpoint(true)
    docs.select(col("doc_id"), explode(tokens(col("text"))).as("w"))
      .join(broadcast(wsc), Seq("w"))
      .groupBy("doc_id")
      .agg(sum("np").as("n_pieces"), sum("ssum").as("ssum"))
      .join(docs.select("doc_id"), Seq("doc_id"), "right")
      .select(col("doc_id"),
        coalesce(col("n_pieces"), lit(0L)).as("n_pieces"),
        when(col("n_pieces") > 0,
          round(col("ssum").cast("double") / 1e6 / col("n_pieces"), 4))
          .as("mean_piece_logprob"))
      .orderBy("doc_id")
  }

  def qUnigramDocLogprobSql: String =
    s"""WITH RECURSIVE
      |$oraclePrelude,
      |${dpBlock("f", "sc_fin")},
      |wsc AS MATERIALIZED (
      |  SELECT s.w, CAST(count(*) AS BIGINT) AS np,
      |         CAST(sum(p.sc) AS BIGINT) AS ssum
      |  FROM seg_f s JOIN sc_fin p ON p.piece = s.piece
      |  GROUP BY s.w),
      |u AS (
      |  SELECT doc_id, l[CAST(i AS INT)] AS w
      |  FROM toks CROSS JOIN
      |    (SELECT unnest(range(1, (SELECT max(len(l)) FROM toks) + 1)) AS i) r
      |  WHERE CAST(i AS INT) <= len(l)),
      |agg AS (
      |  SELECT doc_id, CAST(sum(np) AS BIGINT) AS n_pieces,
      |         CAST(sum(ssum) AS BIGINT) AS ssum
      |  FROM u JOIN wsc USING (w) GROUP BY doc_id)
      |SELECT d.doc_id, coalesce(a.n_pieces, 0) AS n_pieces,
      |  CASE WHEN a.n_pieces > 0 THEN
      |    round(CAST(a.ssum AS DOUBLE) / 1000000.0 / a.n_pieces, 4)
      |  END AS mean_piece_logprob
      |FROM documents d LEFT JOIN agg a USING (doc_id)
      |ORDER BY d.doc_id""".stripMargin

  /** Per-(source, lang) fertility under the unigram tokenizer — the
    * [[TextAnalysis.qTokenizerFertility]] report for the second
    * tokenizer family, enabling the cross-tokenizer comparison every
    * tokenizer swap ships with (fertility = pieces per word, weighted
    * by token mass). Group sums are exact integers; the ratio is one
    * IEEE division rounded 4dp, so the report composes the encode
    * oracle wholesale as a derived table.
    */
  val qUnigramFertility: Q = (s, d) => {
    // the unsorted encode helper — the aggregation below discards any
    // row order, so qUnigramEncode's presentation sort would be waste
    // (the qTokenizerFertility precedent)
    val enc = encodeWithVocab(
      Tables.documents(s, d).select("doc_id", "text"),
      trained(s, d).map(p => p.piece -> p.score).toMap)
    Tables.documents(s, d).select("doc_id", "source", "lang")
      .join(enc, "doc_id")
      .groupBy("source", "lang")
      .agg(
        count(lit(1)).as("n_docs"),
        sum("n_words").as("n_words"),
        sum("n_pieces").as("n_pieces"))
      .withColumn("fertility",
        when(col("n_words") > 0,
          round(col("n_pieces").cast("double") / col("n_words"), 4)))
      .orderBy("source", "lang")
  }

  def qUnigramFertilitySql: String =
    s"""SELECT d.source, d.lang, count(*) AS n_docs,
      |  CAST(sum(e.n_words) AS BIGINT) AS n_words,
      |  CAST(sum(e.n_pieces) AS BIGINT) AS n_pieces,
      |  CASE WHEN sum(e.n_words) > 0 THEN
      |    round(CAST(sum(e.n_pieces) AS DOUBLE) / sum(e.n_words), 4)
      |  END AS fertility
      |FROM documents d JOIN (
      |$qUnigramEncodeSql
      |) e USING (doc_id)
      |GROUP BY d.source, d.lang
      |ORDER BY d.source, d.lang""".stripMargin

  // -------------------------------------------------------------------
  // Machine-generated oracle
  // -------------------------------------------------------------------

  /** One Viterbi round: h2 (per-(word, end) candidate piece lists),
    * dp (recursive integer DP carrying the last [[MaxPieceLen]] best
    * scores + the chosen length per position), backtrace, and the
    * chosen-piece rows. `r` names the round; `scCte` is the piece
    * score table it reads.
    */
  private def dpBlock(r: String, scCte: String): String = {
    val pick = "list_max(list_transform(h.hl, x -> " +
      "[dp.best[x.l] + x.sc, CAST(x.l AS BIGINT)]))"
    s"""h2_$r AS MATERIALIZED (
      |  SELECT w, e, list_transform(list_zip(list(l), list(sc)),
      |           z -> {'l': z[1], 'sc': z[2]}) AS hl FROM (
      |    SELECT wd.w, CAST(re.e AS INT) AS e, CAST(rl.l AS INT) AS l, p.sc
      |    FROM words wd
      |    CROSS JOIN (SELECT unnest(range(1, (SELECT mxl FROM mx) + 1)) AS e) re
      |    CROSS JOIN (SELECT unnest(range(1, $MaxPieceLen + 1)) AS l) rl
      |    JOIN $scCte p ON p.piece =
      |      substr(wd.w, CAST(re.e - rl.l + 1 AS INT), CAST(rl.l AS INT))
      |    WHERE re.e <= length(wd.w) AND rl.l <= re.e)
      |  GROUP BY w, e),
      |dp_$r AS (
      |  SELECT w, 0 AS i, [CAST(0 AS BIGINT)] AS best,
      |         CAST([] AS INT[]) AS chosen
      |  FROM words
      |  UNION ALL
      |  SELECT dp.w, dp.i + 1,
      |    list_prepend($pick[1], dp.best)[1:${MaxPieceLen + 1}],
      |    list_append(dp.chosen, CAST($pick[2] AS INT))
      |  FROM dp_$r dp JOIN h2_$r h ON h.w = dp.w AND h.e = dp.i + 1
      |  WHERE dp.i < length(dp.w)),
      |fin_$r AS MATERIALIZED (SELECT w, chosen FROM dp_$r
      |  WHERE i = length(w)),
      |bt_$r AS (
      |  SELECT w, chosen, CAST(length(w) AS INT) AS e FROM fin_$r
      |  UNION ALL
      |  SELECT w, chosen, e - chosen[e] FROM bt_$r WHERE e > 0),
      |seg_$r AS MATERIALIZED (
      |  SELECT w, e, substr(w, CAST(e - chosen[e] + 1 AS INT),
      |    CAST(chosen[e] AS INT)) AS piece
      |  FROM bt_$r WHERE e > 0)""".stripMargin
  }

  private def scCte(r: String, pCte: String): String =
    s"""sc_$r AS MATERIALIZED (
      |  SELECT piece, CAST(round(ln(CAST(cnt AS DOUBLE) /
      |      (SELECT CAST(sum(cnt) AS DOUBLE) FROM $pCte)) * ${ScoreScale.toLong})
      |    AS BIGINT) AS sc
      |  FROM $pCte)""".stripMargin

  /** Shared prelude: corpus → words → substring seed → [[EmRounds]]
    * EM rounds → pruned counts → final scores.
    */
  private def oraclePrelude: String = {
    val head =
      s"""toks AS MATERIALIZED (
        |  SELECT doc_id, list_filter(string_split_regex(trim(text), '\\s+'),
        |    t -> t <> '') AS l
        |  FROM documents),
        |words AS MATERIALIZED (
        |  SELECT w, CAST(count(*) AS BIGINT) AS freq FROM (
        |    SELECT unnest(l) AS w FROM toks) GROUP BY w),
        |mx AS MATERIALIZED (SELECT CAST(max(length(w)) AS INT) AS mxl
        |  FROM words),
        |subs AS MATERIALIZED (
        |  SELECT substr(w, CAST(e - l + 1 AS INT), CAST(l AS INT)) AS piece,
        |         CAST(sum(freq) AS BIGINT) AS cnt
        |  FROM words
        |  CROSS JOIN (SELECT unnest(range(1, (SELECT mxl FROM mx) + 1)) AS e) re
        |  CROSS JOIN (SELECT unnest(range(1, $MaxPieceLen + 1)) AS l) rl
        |  WHERE e <= length(w) AND l <= e
        |  GROUP BY 1),
        |chars0 AS MATERIALIZED (SELECT piece, cnt FROM subs
        |  WHERE length(piece) = 1),
        |p_0 AS MATERIALIZED (
        |  SELECT piece, cnt FROM chars0
        |  UNION ALL
        |  SELECT piece, cnt FROM (
        |    SELECT piece, cnt FROM subs WHERE length(piece) > 1
        |    ORDER BY cnt DESC, piece ASC LIMIT $SeedMultiCap))""".stripMargin
    val rounds = (1 to EmRounds).map { r =>
      scCte(r.toString, s"p_${r - 1}") + ",\n" +
        dpBlock(r.toString, s"sc_$r") + ",\n" +
        s"""cnt_$r AS MATERIALIZED (
          |  SELECT piece, CAST(sum(freq) AS BIGINT) AS cnt
          |  FROM seg_$r JOIN words USING (w) GROUP BY piece),
          |p_$r AS MATERIALIZED (
          |  SELECT c.piece, greatest(coalesce(n.cnt, 0), CAST(1 AS BIGINT))
          |    AS cnt
          |  FROM chars0 c LEFT JOIN cnt_$r n USING (piece)
          |  UNION ALL
          |  SELECT piece, cnt FROM cnt_$r WHERE length(piece) > 1)""".stripMargin
    }
    val prune =
      s"""pruned AS MATERIALIZED (
        |  SELECT piece, cnt FROM p_$EmRounds WHERE length(piece) = 1
        |  UNION ALL
        |  SELECT piece, cnt FROM (
        |    SELECT piece, cnt FROM p_$EmRounds WHERE length(piece) > 1
        |    ORDER BY cnt DESC, piece ASC LIMIT $VocabMultiCap))""".stripMargin
    (Seq(head) ++ rounds ++ Seq(prune, scCte("fin", "pruned")))
      .mkString(",\n")
  }

  def qUnigramVocabSql: String =
    s"""WITH RECURSIVE
      |$oraclePrelude
      |SELECT p.piece, p.cnt, s.sc AS score
      |FROM pruned p JOIN sc_fin s USING (piece)
      |ORDER BY p.piece""".stripMargin

  def qUnigramEncodeSql: String =
    s"""WITH RECURSIVE
      |$oraclePrelude,
      |${dpBlock("f", "sc_fin")},
      |wseg AS MATERIALIZED (
      |  SELECT w, array_to_string(list(piece ORDER BY e), '·') AS ws,
      |         CAST(count(*) AS BIGINT) AS np
      |  FROM seg_f GROUP BY w),
      |u AS (
      |  SELECT doc_id, CAST(i AS INT) AS idx, l[CAST(i AS INT)] AS w
      |  FROM toks CROSS JOIN
      |    (SELECT unnest(range(1, (SELECT max(len(l)) FROM toks) + 1)) AS i) r
      |  WHERE CAST(i AS INT) <= len(l)),
      |agg AS (
      |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_words,
      |         CAST(sum(np) AS BIGINT) AS n_pieces,
      |         array_to_string(list(ws ORDER BY idx), ' ') AS seg
      |  FROM u JOIN wseg USING (w) GROUP BY doc_id)
      |SELECT d.doc_id, coalesce(a.n_words, 0) AS n_words,
      |  coalesce(a.n_pieces, 0) AS n_pieces, coalesce(a.seg, '') AS seg
      |FROM documents d LEFT JOIN agg a USING (doc_id)
      |ORDER BY d.doc_id""".stripMargin

  val queries: Map[String, Q] = Map(
    "q_unigram_vocab" -> qUnigramVocab,
    "q_unigram_encode" -> qUnigramEncode,
    "q_unigram_encode_served" -> qUnigramEncodeServed,
    "q_unigram_fertility" -> qUnigramFertility,
    "q_unigram_doc_logprob" -> qUnigramDocLogprob)

  val oracles: Map[String, String] = Map(
    "q_unigram_vocab" -> qUnigramVocabSql,
    "q_unigram_encode" -> qUnigramEncodeSql,
    "q_unigram_encode_served" -> qUnigramEncodeSql,
    "q_unigram_fertility" -> qUnigramFertilitySql,
    "q_unigram_doc_logprob" -> qUnigramDocLogprobSql)
}
