package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables._
import graft.functions.RepetitionStats
import graft.functions.TextFunctions._
import Relational.Q

/** Corpus-quality and corpus-hygiene operators for the training-data
  * pipeline (SURVEY.md §7.4 north star): Gopher/C4-style repetition
  * signals, held-out-set decontamination, PII redaction, and
  * deterministic corpus mixing. All four are scale-shaped first:
  *
  *   - repetition is a per-row kernel (zero shuffle — see
  *     [[graft.functions.RepetitionStats]]);
  *   - decontamination broadcasts the (always small) benchmark n-gram
  *     index against a streaming corpus scan;
  *   - PII scrubbing is a chain of codegen'd `regexp_replace`s;
  *   - mixing samples by content-free hash threshold — no RNG state, no
  *     `sample()` nondeterminism, reproducible on any engine.
  */
object Quality {

  // ---------------------------------------------------------------------
  // Repetition signals: duplicate-token fraction, duplicate-bigram mass,
  // top-bigram mass — the "excessive repetition" quality gates from the
  // Gopher/C4 filtering recipes. One scan, no shuffle: the counters come
  // from the per-row RepetitionStats kernel; ratios are exact int/int
  // divisions rounded to 4dp (IEEE-identical in DuckDB).
  // ---------------------------------------------------------------------
  val qQualityRepetition: Q = (s, d) => {
    val st = col("st")
    def c(i: Int): Column = element_at(st, i)
    documents(s, d)
      .select(col("doc_id"), tokens(col("text")).as("toks"))
      .select(col("doc_id"), RepetitionStats.stats(s, col("toks")).as("st"))
      .select(
        col("doc_id"),
        c(1).as("n_tokens"),
        when(c(1) > 0,
          round((c(1) - c(2)).cast("double") / c(1), 4))
          .as("dup_token_frac"),
        when(c(3) > 0, round(c(4).cast("double") / c(3), 4))
          .as("dup_bigram_frac"),
        when(c(3) > 0, round(c(5).cast("double") / c(3), 4))
          .as("top_bigram_frac"))
      .orderBy("doc_id")
  }

  val qQualityRepetitionSql: String =
    """WITH t AS (SELECT doc_id,
      |    list_filter(string_split_regex(trim(text), '\s+'),
      |                x -> x <> '') AS l
      |  FROM documents),
      |mx AS (SELECT max(len(l)) AS m FROM t),
      |bg AS (SELECT doc_id,
      |         l[CAST(i AS INT)] || ' ' || l[CAST(i AS INT)+1] AS g
      |       FROM t CROSS JOIN
      |         (SELECT unnest(range(1, (SELECT m FROM mx))) AS i) r
      |       WHERE CAST(i AS INT) + 1 <= len(l)),
      |bgc AS (SELECT doc_id, g, count(*) AS c FROM bg GROUP BY 1, 2),
      |agg AS (SELECT doc_id,
      |          CAST(sum(c) AS BIGINT) AS n_bigrams,
      |          CAST(sum(CASE WHEN c > 1 THEN c ELSE 0 END) AS BIGINT)
      |            AS dup_pos,
      |          CAST(max(c) AS BIGINT) AS top_c
      |        FROM bgc GROUP BY 1)
      |SELECT t.doc_id,
      |  CAST(len(l) AS BIGINT) AS n_tokens,
      |  CASE WHEN len(l) > 0 THEN
      |    round(CAST(len(l) - len(list_distinct(l)) AS DOUBLE) / len(l), 4)
      |  END AS dup_token_frac,
      |  CASE WHEN n_bigrams > 0 THEN
      |    round(CAST(dup_pos AS DOUBLE) / n_bigrams, 4)
      |  END AS dup_bigram_frac,
      |  CASE WHEN n_bigrams > 0 THEN
      |    round(CAST(top_c AS DOUBLE) / n_bigrams, 4)
      |  END AS top_bigram_frac
      |FROM t LEFT JOIN agg USING (doc_id)
      |ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------------
  // Decontamination: flag training documents sharing any word 5-gram
  // with a held-out benchmark slice (here: doc_id % 10 == 0 stands in
  // for the eval set). Scale shape: the benchmark index is always tiny
  // relative to a pretraining corpus (MBs vs TBs), so it broadcasts and
  // the corpus streams through a map-side hash join — the corpus itself
  // is never shuffled; the only exchange is the final per-doc count
  // aggregation. Grams are compared via 64-bit xxhash64 fingerprints
  // (8-byte join keys, same trade as Dedup.shingleIndex); the oracle
  // joins the gram strings.
  // ---------------------------------------------------------------------
  /** Contamination report for `docs` split by `isEval`: one row per
    * non-eval doc sharing at least one word n-gram with the eval slice,
    * with the distinct shared-gram and touched-eval-doc counts.
    */
  def contamination(docs: DataFrame, isEval: Column, n: Int): DataFrame = {
    val grams = docs
      .select(col("doc_id"), isEval.as("is_eval"), tokens(col("text")).as("toks"))
      .select(col("doc_id"), col("is_eval"),
        explode(graft.functions.ShingleFps.fps(
          docs.sparkSession, col("toks"), n)).as("h"))
    val benchmark = grams.filter(col("is_eval"))
      .select(col("doc_id").as("eval_id"), col("h"))
    val train = grams.filter(!col("is_eval")).select("doc_id", "h")
    train.join(broadcast(benchmark), "h")
      .groupBy("doc_id")
      .agg(
        countDistinct(col("h")).as("n_shared_grams"),
        countDistinct(col("eval_id")).as("n_eval_docs"))
  }

  val qDecontaminate: Q = (s, d) =>
    contamination(documents(s, d), col("doc_id") % 10 === 0, 5)
      .orderBy("doc_id")

  /** Bloom-gated decontamination — [[contamination]] for benchmark sets
    * too large to broadcast exactly. The eval grams build a
    * [[graft.functions.GramBloom]] bit array DISTRIBUTEDLY (mergeable
    * O(numBits/64) aggregator state; the one driver collect is the bit
    * array itself — numBits/8 bytes, 512 KB at the default, independent
    * of benchmark size), the corpus pre-filters through the codegen'd
    * per-row membership kernel (zero shuffle — clean docs never leave
    * the scan), and only surviving docs enter the exact join. Bloom
    * false positives are killed by the exact verify; false negatives
    * don't exist — so the output EQUALS [[contamination]] and the query
    * carries the same DuckDB oracle.
    *
    * At 100 TB the difference is the exchange volume: the exact form
    * ships every gram of every doc into the join; here only gram arrays
    * of bloom-hit docs (contaminated + fp-rate of the rest) are
    * exploded at all.
    */
  def contaminationBloom(
      docs: DataFrame, isEval: Column, n: Int,
      numBits: Int = 1 << 22, numHashes: Int = 5): DataFrame = {
    val s = docs.sparkSession
    import s.implicits._
    // Eval side: the codegen'd explode+xxhash64 path (same as the exact
    // form), materialized once — it feeds the bloom build AND the verify
    // join, and is benchmark-sized by definition (MBs; the checkpoint
    // blocks release on GC like every other small materialization here).
    // LAZY checkpoint (r15): the bloom-bits head() below is the first
    // action over it and stores the blocks as it runs, so the query pays
    // two driver-sequenced actions (bits, verify join) instead of three
    // — same blocks, same plans, one fewer fixed-latency sync point.
    val evalGrams = docs.filter(isEval)
      .select(col("doc_id").as("eval_id"), tokens(col("text")).as("toks"))
      .select(col("eval_id"),
        explode(graft.functions.ShingleFps.fps(s, col("toks"), n)).as("h"))
      .localCheckpoint(false)
    val bits: Array[Long] = evalGrams
      .select(col("h")).as[Long]
      .select(graft.functions.GramBloom.agg(numBits, numHashes))
      .head()
    // Corpus side: ONE fully-codegen'd pipeline — tokens → distinct
    // gram-fingerprint array (ShingleFps kernel) → membership kernel →
    // survivors explode into the verify join. Clean docs never leave
    // the scan stage.
    val candidates = docs.filter(!isEval)
      .select(col("doc_id"), tokens(col("text")).as("toks"))
      .select(col("doc_id"), graft.functions.ShingleFps.fps(
        s, col("toks"), n).as("hs"))
      .filter(graft.functions.GramBloom.mightContainAny(
        s, col("hs"), bits, numHashes))
    candidates
      .select(col("doc_id"), explode(col("hs")).as("h"))
      .join(broadcast(evalGrams), "h")
      .groupBy("doc_id")
      .agg(
        countDistinct(col("h")).as("n_shared_grams"),
        countDistinct(col("eval_id")).as("n_eval_docs"))
  }

  val qDecontaminateBloom: Q = (s, d) =>
    contaminationBloom(documents(s, d), col("doc_id") % 10 === 0, 5)
      .orderBy("doc_id")

  val qDecontaminateSql: String =
    """WITH t AS (SELECT doc_id,
      |    list_filter(string_split_regex(trim(text), '\s+'),
      |                x -> x <> '') AS l
      |  FROM documents),
      |mx AS (SELECT max(len(l)) AS m FROM t),
      |sh AS (SELECT DISTINCT doc_id,
      |         l[CAST(i AS INT)] || ' ' || l[CAST(i AS INT)+1] || ' ' ||
      |         l[CAST(i AS INT)+2] || ' ' || l[CAST(i AS INT)+3] || ' ' ||
      |         l[CAST(i AS INT)+4] AS g
      |       FROM t CROSS JOIN
      |         (SELECT unnest(range(1, (SELECT m FROM mx))) AS i) r
      |       WHERE CAST(i AS INT) + 4 <= len(l)),
      |ev AS (SELECT doc_id AS eval_id, g FROM sh WHERE doc_id % 10 = 0),
      |tr AS (SELECT doc_id, g FROM sh WHERE doc_id % 10 <> 0)
      |SELECT tr.doc_id,
      |  count(DISTINCT tr.g) AS n_shared_grams,
      |  count(DISTINCT ev.eval_id) AS n_eval_docs
      |FROM tr JOIN ev ON tr.g = ev.g
      |GROUP BY tr.doc_id
      |ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------------
  // Unicode canonicalization — the parse/normalize stage every crawled
  // corpus passes through before ANY hash-based op: NFC (UAX #15) plus
  // control-character strip. Visually-identical strings with different
  // codepoint sequences (é precomposed vs e + U+0301) hash differently,
  // so exact dedup, n-gram decontamination, and blocklist joins all
  // silently miss on denormalized input. The fixture is ASCII, so the
  // query PLANTS both defect classes deterministically (combining-mark
  // tails on ≡0 mod 3, a BEL control on ≡0 mod 5 — the planted-evidence
  // discipline), scrubs controls with one codegen'd regexp, normalizes
  // with the [[graft.functions.NormalizeNfc]] kernel, and reports the
  // per-doc codepoint deltas. Oracle: DuckDB's utf8proc nfc_normalize
  // implements the same UAX #15 — which is what makes a DIFFERENTIAL
  // check of a unicode kernel possible at all.
  //
  // Scale shape: pure per-row kernels, zero shuffle; the already-NFC
  // fast path returns the input string unallocated.
  // ---------------------------------------------------------------------
  val qUnicodeNormalize: Q = (s, d) => {
    val planted = concat(
      col("text"),
      when(col("doc_id") % 3 === 0, lit(" café")).otherwise(lit("")),
      when(col("doc_id") % 5 === 0, lit("")).otherwise(lit("")))
    val noCtl = regexp_replace(col("raw"), "[\\x00-\\x08\\x0E-\\x1F]", "")
    documents(s, d)
      .select(col("doc_id"), planted.as("raw"))
      .select(col("doc_id"), col("raw"),
        graft.functions.NormalizeNfc.normalize(s, noCtl).as("clean"))
      .select(
        col("doc_id"),
        length(col("raw")).as("len_raw"),
        length(col("clean")).as("len_clean"),
        (col("clean") =!= col("raw")).cast("int").as("changed"))
      .orderBy("doc_id")
  }

  val qUnicodeNormalizeSql: String =
    """WITH p AS (SELECT doc_id,
      |    text ||
      |    CASE WHEN doc_id % 3 = 0 THEN ' cafe' || chr(769) ELSE '' END ||
      |    CASE WHEN doc_id % 5 = 0 THEN chr(7) ELSE '' END AS raw
      |  FROM documents),
      |c AS (SELECT doc_id, raw,
      |    nfc_normalize(regexp_replace(raw,
      |      '[\x00-\x08\x0E-\x1F]', '', 'g')) AS clean
      |  FROM p)
      |SELECT doc_id,
      |  CAST(length(raw) AS INTEGER) AS len_raw,
      |  CAST(length(clean) AS INTEGER) AS len_clean,
      |  CAST(clean <> raw AS INT) AS changed
      |FROM c
      |ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------------
  // HTML stripping — the extraction step upstream of every text-quality
  // op when the source is crawl data: drop script blocks, strip tags,
  // decode the common entities, collapse whitespace. The fixture is
  // plain text, so the query WRAPS each doc in a deterministic HTML
  // shell (tags + a script payload + encoded entities) and the stripper
  // must recover exactly `text` plus the decoded entity tail — the
  // whole transform is a codegen'd regexp_replace chain (zero shuffle),
  // and the entity pass decodes &amp; LAST so encoded entities don't
  // double-decode (the order both engines must share).
  // ---------------------------------------------------------------------
  def htmlStrip(html: Column): Column = {
    val noScript = regexp_replace(html,
      "(?s)<script[^>]*>.*?</script>", " ")
    val noTags = regexp_replace(noScript, "<[^>]+>", " ")
    val entities = Seq(
      "&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
      "&#39;" -> "'", "&amp;" -> "&")
    val decoded = entities.foldLeft(noTags) { case (acc, (ent, ch)) =>
      regexp_replace(acc, ent, ch)
    }
    trim(regexp_replace(decoded, "\\s+", " "))
  }

  val qHtmlStrip: Q = (s, d) => {
    val wrapped = concat(
      lit("<html><body><p class=\"doc\">"), col("text"),
      lit("</p><script type=\"text/javascript\">var x = 1 < 2;</script>"),
      lit("<div>Tom &amp; Jerry &lt;3</div></body></html>"))
    documents(s, d)
      .select(col("doc_id"), wrapped.as("html"))
      .select(col("doc_id"),
        htmlStrip(col("html")).as("clean_text"),
        regexp_count(col("html"), lit("<[^>]+>")).cast("long")
          .as("n_tags"))
      .orderBy("doc_id")
  }

  val qHtmlStripSql: String =
    """WITH w AS (SELECT doc_id,
      |    '<html><body><p class="doc">' || text ||
      |    '</p><script type="text/javascript">var x = 1 < 2;</script>' ||
      |    '<div>Tom &amp; Jerry &lt;3</div></body></html>' AS html
      |  FROM documents)
      |SELECT doc_id,
      |  trim(regexp_replace(
      |    regexp_replace(
      |    regexp_replace(
      |    regexp_replace(
      |    regexp_replace(
      |    regexp_replace(
      |    regexp_replace(
      |      regexp_replace(html, '(?s)<script[^>]*>.*?</script>', ' ', 'g'),
      |      '<[^>]+>', ' ', 'g'),
      |      '&lt;', '<', 'g'),
      |      '&gt;', '>', 'g'),
      |      '&quot;', '"', 'g'),
      |      '&#39;', CAST(chr(39) AS VARCHAR), 'g'),
      |      '&amp;', '&', 'g'),
      |      '\s+', ' ', 'g')) AS clean_text,
      |  CAST(len(regexp_extract_all(html, '<[^>]+>')) AS BIGINT) AS n_tags
      |FROM w
      |ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------------
  // Normalization-robust decontamination — the evasion-hardened form of
  // [[contamination]]: exact n-gram matching is defeated by trivial
  // surface edits (case flips, punctuation injection — exactly how
  // benchmark text ends up in crawled corpora after forum quoting or
  // PDF re-extraction), so production decontamination matches over
  // NORMALIZED text (lowercase, punctuation → space). The fixture
  // corpus is already clean, so the query PLANTS obfuscated copies of
  // eval documents (uppercased + punctuation tail, ids offset +1M) into
  // the train side — the planted-evidence discipline the PII scrubber
  // established — and the normalized matcher must flag every one of
  // them; QualitySpec additionally pins that the EXACT matcher misses
  // all of them (the vulnerability this query closes). Same broadcast
  // benchmark-index shape as the exact form.
  // ---------------------------------------------------------------------
  def normalizeText(text: Column): Column =
    regexp_replace(lower(text), "[^a-z0-9\\s]", " ")

  /** The planted-contamination corpus: every 40th doc re-enters
    * obfuscated (upper case + punctuation, id +1M). Shared by the
    * normalized query and the spec's exact-matcher counterexample.
    */
  def obfuscatedCorpus(docs: DataFrame): DataFrame = {
    val base = docs.select(col("doc_id"), col("text"))
    base.unionByName(
      base.filter(col("doc_id") % 40 === 0)
        .select((col("doc_id") + 1000000L).as("doc_id"),
          concat(upper(col("text")), lit(" !!")).as("text")))
  }

  /** Eval membership on the planted corpus: the ORIGINAL benchmark
    * docs only — planted copies are train-side contamination.
    */
  def obfuscatedIsEval: Column =
    col("doc_id") % 10 === 0 && col("doc_id") < 1000000L

  val qDecontaminateNormalized: Q = (s, d) => {
    val corpus = obfuscatedCorpus(documents(s, d))
    contamination(
      corpus.select(col("doc_id"), normalizeText(col("text")).as("text")),
      obfuscatedIsEval, 5)
      .orderBy("doc_id")
  }

  val qDecontaminateNormalizedSql: String =
    """WITH corpus AS (
      |  SELECT doc_id, text FROM documents
      |  UNION ALL
      |  SELECT doc_id + 1000000, upper(text) || ' !!' FROM documents
      |  WHERE doc_id % 40 = 0),
      |norm AS (SELECT doc_id,
      |    regexp_replace(lower(text), '[^a-z0-9\s]', ' ', 'g') AS text
      |  FROM corpus),
      |t AS (SELECT doc_id,
      |    list_filter(string_split_regex(trim(text), '\s+'),
      |                x -> x <> '') AS l
      |  FROM norm),
      |mx AS (SELECT max(len(l)) AS m FROM t),
      |sh AS (SELECT DISTINCT doc_id,
      |         l[CAST(i AS INT)] || ' ' || l[CAST(i AS INT)+1] || ' ' ||
      |         l[CAST(i AS INT)+2] || ' ' || l[CAST(i AS INT)+3] || ' ' ||
      |         l[CAST(i AS INT)+4] AS g
      |       FROM t CROSS JOIN
      |         (SELECT unnest(range(1, (SELECT m FROM mx))) AS i) r
      |       WHERE CAST(i AS INT) + 4 <= len(l)),
      |ev AS (SELECT doc_id AS eval_id, g FROM sh
      |       WHERE doc_id % 10 = 0 AND doc_id < 1000000),
      |tr AS (SELECT doc_id, g FROM sh
      |       WHERE NOT (doc_id % 10 = 0 AND doc_id < 1000000))
      |SELECT tr.doc_id,
      |  count(DISTINCT tr.g) AS n_shared_grams,
      |  count(DISTINCT ev.eval_id) AS n_eval_docs
      |FROM tr JOIN ev ON tr.g = ev.g
      |GROUP BY tr.doc_id
      |ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------------
  // PII redaction: sequential regexp_replace chain — emails, then
  // phone numbers, then IPv4 addresses, then long digit runs (ids).
  // The fixture corpus carries no PII, so the query first enriches each
  // document with a deterministic doc_id-derived contact tail (exactly
  // how a scrubber is tested: plant known PII, assert it is gone); both
  // engines build the identical input, so the driver hash-checks the
  // full redaction semantics. Patterns are RE2-and-Java compatible (no
  // backrefs/lookaround). One scan, no shuffle.
  // ---------------------------------------------------------------------
  private val piiPatterns: Seq[(String, String)] = Seq(
    "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}" -> "<EMAIL>",
    "\\+[0-9]{1,3}-[0-9]{3}-[0-9]{3,4}" -> "<PHONE>",
    "([0-9]{1,3}\\.){3}[0-9]{1,3}" -> "<IP>",
    "[0-9]{6,}" -> "<ID>")

  /** The scrubber itself: engine-agnostic sequential redaction. */
  def piiScrub(text: Column): Column =
    piiPatterns.foldLeft(text) { case (acc, (pat, tag)) =>
      regexp_replace(acc, pat, tag)
    }

  val qPiiScrub: Q = (s, d) => {
    val enriched = concat(
      col("text"),
      lit(" contact user"), col("doc_id").cast("string"),
      lit("@example.com tel +27-555-"),
      lpad((col("doc_id") * 7 % 10000).cast("string"), 4, "0"),
      lit(" ip 10.0."), (col("doc_id") % 256).cast("string"),
      lit("."), (col("doc_id") * 3 % 256).cast("string"),
      lit(" acct "),
      lpad((col("doc_id") * 37 % 1000000000).cast("string"), 9, "0"))
    val tagged = Seq("<EMAIL>", "<PHONE>", "<IP>", "<ID>")
      .map(t => regexp_count(col("scrubbed"), lit(t)))
      .reduce(_ + _)
    documents(s, d)
      .select(col("doc_id"), piiScrub(enriched).as("scrubbed"))
      .select(col("doc_id"), col("scrubbed"),
        tagged.cast("long").as("n_redactions"))
      .orderBy("doc_id")
  }

  val qPiiScrubSql: String = {
    val enriched =
      """text || ' contact user' || CAST(doc_id AS VARCHAR) ||
        |  '@example.com tel +27-555-' ||
        |  lpad(CAST(doc_id * 7 % 10000 AS VARCHAR), 4, '0') ||
        |  ' ip 10.0.' || CAST(doc_id % 256 AS VARCHAR) || '.' ||
        |  CAST(doc_id * 3 % 256 AS VARCHAR) || ' acct ' ||
        |  lpad(CAST(doc_id * 37 % 1000000000 AS VARCHAR), 9, '0')""".stripMargin
    // DuckDB single-quoted strings don't process backslashes, so the
    // Java pattern strings pass through verbatim (no quotes inside)
    val scrub = piiPatterns.foldLeft(s"($enriched)") {
      case (acc, (pat, tag)) =>
        s"regexp_replace($acc, '$pat', '$tag', 'g')"
    }
    s"""WITH s AS (SELECT doc_id, $scrub AS scrubbed FROM documents)
       |SELECT doc_id, scrubbed,
       |  CAST(len(regexp_extract_all(scrubbed, '<EMAIL>')) +
       |       len(regexp_extract_all(scrubbed, '<PHONE>')) +
       |       len(regexp_extract_all(scrubbed, '<IP>')) +
       |       len(regexp_extract_all(scrubbed, '<ID>')) AS BIGINT)
       |    AS n_redactions
       |FROM s
       |ORDER BY doc_id""".stripMargin
  }

  // ---------------------------------------------------------------------
  // Corpus mixing: per-source sampling rates applied via a content-free
  // md5 threshold on (doc_id, source) — the deterministic, engine- and
  // run-stable way to mix sources at fixed ratios (sample() would give
  // a different corpus per run/partitioning). A doc is kept iff the
  // first 8 hex chars of its md5 sort below the source's threshold;
  // rates cycle {1.0, 0.75, 0.5, 0.25} by source index. One scan + one
  // small per-source aggregation.
  // ---------------------------------------------------------------------
  val qCorpusMix: Q = (s, d) => {
    // hex thresholds for the rate cycle; "g" > every hex char = keep all
    val thresholds =
      array(lit("g"), lit("c0000000"), lit("80000000"), lit("40000000"))
    val srcNum = substring(col("source"), 4, 10).cast("int")
    val keep = substring(
      md5(concat(col("doc_id").cast("string"), lit(":"), col("source"))),
      1, 8) < element_at(thresholds, pmod(srcNum, lit(4)) + 1)
    documents(s, d)
      .select(col("source"), keep.as("keep"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_total"),
        sum(col("keep").cast("long")).as("n_kept"))
      .orderBy("source")
  }

  val qCorpusMixSql: String =
    """WITH x AS (SELECT source,
      |    substr(md5(CAST(doc_id AS VARCHAR) || ':' || source), 1, 8) AS h8,
      |    ['g','c0000000','80000000','40000000']
      |      [(CAST(substr(source, 4) AS INT) % 4) + 1] AS thr
      |  FROM documents)
      |SELECT source, count(*) AS n_total,
      |  CAST(sum(CASE WHEN h8 < thr THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
      |FROM x GROUP BY source
      |ORDER BY source""".stripMargin

  // ---------------------------------------------------------------------
  // Token-budget selection: fill a per-language token budget greedily in
  // quality order (least-repetitive first via the kernel's top-bigram
  // ppm, doc_id tie-break) — the curriculum/mixture primitive that turns
  // "rank by quality" into "an actual corpus of B tokens per language".
  // One kernel scan + one per-language running-sum window; ordering by a
  // unique key keeps RANGE/ROWS framing identical across engines. The
  // running sum is integer (token counts), so the cut is exact — no
  // float boundary risk.
  //
  // SCALE CAVEAT: partitionBy(lang) has ~languages-many partitions, so
  // the per-doc running sum is one sequential task per language — exact
  // greedy selection is inherently sequential. At corpus scale use
  // [[tokenBudgetByPpmClass]]: the window runs over the (lang, ppm)
  // AGGREGATE (≤ 10⁶+1 ppm classes per language, bounded by the ppm
  // codomain, not the corpus), and per-doc work stays fully parallel.
  // ---------------------------------------------------------------------
  val qTokenBudget: Q = (s, d) => {
    import org.apache.spark.sql.expressions.Window
    val budget = 2000L
    val w = Window.partitionBy("lang").orderBy("ppm", "doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    documents(s, d)
      .select(col("doc_id"), col("lang"),
        RepetitionStats.stats(s, tokens(col("text"))).as("st"))
      .select(col("doc_id"), col("lang"),
        element_at(col("st"), 1).as("n_tokens"),
        element_at(col("st"), 6).as("ppm"))
      .withColumn("cum_tokens", sum("n_tokens").over(w))
      .filter(col("cum_tokens") <= budget)
      .select("lang", "doc_id", "n_tokens", "cum_tokens")
      .orderBy("lang", "doc_id")
  }

  /** The 100 TB form of the token-budget fill: select whole ppm QUALITY
    * CLASSES while they fit the budget. The running sum runs over the
    * per-(lang, ppm) aggregate — at most 10⁶+1 rows per language
    * whatever the corpus size — and every per-doc step (kernel scan,
    * class agg, broadcast-join filter) is embarrassingly parallel. The
    * trade vs the exact greedy fill is the boundary class: the first
    * class that doesn't fully fit is excluded entirely (its docs are
    * interchangeable at this quality granularity; a caller that wants
    * the budget filled to the token slices just that one class — a
    * per-language frame no bigger than one class — with the greedy
    * form). QualitySpec pins the containment relation between the two.
    */
  def tokenBudgetByPpmClass(
      docs: DataFrame, budget: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val s = docs.sparkSession
    // the kernel scan feeds both the class aggregate and the join probe
    // side — persist it or the corpus tokenizes twice per action
    val perDoc = docs
      .select(col("doc_id"), col("lang"),
        RepetitionStats.stats(s, tokens(col("text"))).as("st"))
      .select(col("doc_id"), col("lang"),
        element_at(col("st"), 1).as("n_tokens"),
        element_at(col("st"), 6).as("ppm"))
      .persist()
    val w = Window.partitionBy("lang").orderBy("ppm")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val fittingClasses = perDoc
      .groupBy("lang", "ppm")
      .agg(sum("n_tokens").as("class_tokens"))
      .withColumn("cum_tokens", sum("class_tokens").over(w))
      .filter(col("cum_tokens") <= budget)
      .select("lang", "ppm")
    val out = perDoc.join(broadcast(fittingClasses), Seq("lang", "ppm"))
      .select("lang", "doc_id", "n_tokens", "ppm")
      .localCheckpoint(true)
    perDoc.unpersist()
    out
  }

  /** The registered face of the scale form, with the same deterministic
    * output contract as the greedy query (sorted, budget 2000).
    */
  val qTokenBudgetClasses: Q = (s, d) =>
    tokenBudgetByPpmClass(documents(s, d), 2000L)
      .orderBy("lang", "doc_id")

  val qTokenBudgetClassesSql: String =
    """WITH t AS (SELECT doc_id, lang,
      |    list_filter(string_split_regex(trim(text), '\s+'),
      |                x -> x <> '') AS l
      |  FROM documents),
      |mx AS (SELECT max(len(l)) AS m FROM t),
      |bg AS (SELECT doc_id,
      |         l[CAST(i AS INT)] || ' ' || l[CAST(i AS INT)+1] AS g
      |       FROM t CROSS JOIN
      |         (SELECT unnest(range(1, (SELECT m FROM mx))) AS i) r
      |       WHERE CAST(i AS INT) + 1 <= len(l)),
      |bgc AS (SELECT doc_id, g, count(*) AS c FROM bg GROUP BY 1, 2),
      |agg AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS nb,
      |          CAST(max(c) AS BIGINT) AS top FROM bgc GROUP BY 1),
      |sel AS (SELECT t.doc_id, lang, CAST(len(l) AS BIGINT) AS n_tokens,
      |          CASE WHEN nb > 0 THEN top * 1000000 // nb ELSE 0 END AS ppm
      |        FROM t LEFT JOIN agg ON t.doc_id = agg.doc_id),
      |classes AS (SELECT lang, ppm,
      |          CAST(sum(n_tokens) AS BIGINT) AS class_tokens
      |        FROM sel GROUP BY 1, 2),
      |fitting AS (SELECT lang, ppm FROM (
      |          SELECT lang, ppm,
      |            sum(class_tokens) OVER (PARTITION BY lang ORDER BY ppm
      |              ROWS UNBOUNDED PRECEDING) AS cum
      |          FROM classes)
      |        WHERE cum <= 2000)
      |SELECT sel.lang AS lang, doc_id, n_tokens, sel.ppm AS ppm
      |FROM sel JOIN fitting ON sel.lang = fitting.lang
      |  AND sel.ppm = fitting.ppm
      |ORDER BY 1, 2""".stripMargin

  val qTokenBudgetSql: String =
    """WITH t AS (SELECT doc_id, lang,
      |    list_filter(string_split_regex(trim(text), '\s+'),
      |                x -> x <> '') AS l
      |  FROM documents),
      |mx AS (SELECT max(len(l)) AS m FROM t),
      |bg AS (SELECT doc_id,
      |         l[CAST(i AS INT)] || ' ' || l[CAST(i AS INT)+1] AS g
      |       FROM t CROSS JOIN
      |         (SELECT unnest(range(1, (SELECT m FROM mx))) AS i) r
      |       WHERE CAST(i AS INT) + 1 <= len(l)),
      |bgc AS (SELECT doc_id, g, count(*) AS c FROM bg GROUP BY 1, 2),
      |agg AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS nb,
      |          CAST(max(c) AS BIGINT) AS top FROM bgc GROUP BY 1),
      |sel AS (SELECT t.doc_id, lang, CAST(len(l) AS BIGINT) AS n_tokens,
      |          CASE WHEN nb > 0 THEN top * 1000000 // nb ELSE 0 END AS ppm
      |        FROM t LEFT JOIN agg ON t.doc_id = agg.doc_id),
      |cum AS (SELECT lang, doc_id, n_tokens,
      |          CAST(sum(n_tokens) OVER (PARTITION BY lang
      |            ORDER BY ppm, doc_id
      |            ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tokens
      |        FROM sel)
      |SELECT lang, doc_id, n_tokens, cum_tokens FROM cum
      |WHERE cum_tokens <= 2000
      |ORDER BY lang, doc_id""".stripMargin

  // ---------------------------------------------------------------------
  // Winnowing fingerprints (the MOSS scheme): hash every word 4-gram,
  // keep the minimum hash of each sliding window of 4 consecutive
  // grams, distinct per doc — guaranteed to share a fingerprint with
  // any document overlapping by ≥ 7 tokens, robust to edits in between.
  // This IS SURVEY §7.4's "document fingerprinting (rolling hash)" in
  // its canonical robust form, and it is pure window algebra: no UDF,
  // no kernel — partition by doc, ROWS sliding min, distinct. Selection
  // by value makes tie policy irrelevant (tied minima dedup away).
  // md5-hex ordering is engine-identical (lowercase hex, binary
  // collation both sides); a production pipeline swaps md5 for xxhash64
  // (same plan, 64-bit keys) and gives up only the DuckDB oracle.
  // ---------------------------------------------------------------------
  /** The unsorted winnow index — (doc_id, fp) distinct. Factored so the
    * pair query can persist THIS form: persisting the query's sorted
    * output would materialize a useless range-exchange + total sort that
    * the self-join immediately destroys (and the persist boundary stops
    * EliminateSorts from dropping it).
    */
  def winnowIndex(docs: DataFrame, n: Int = 4, w: Int = 4): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val grams = docs
      .select(col("doc_id"), tokens(col("text")).as("toks"))
      .select(col("doc_id"),
        posexplode(shinglesFromTokens(col("toks"), n)).as(Seq("pos", "g")))
      .select(col("doc_id"), col("pos"), md5(col("g")).as("h"))
    val win = Window.partitionBy("doc_id").orderBy("pos")
      .rowsBetween(-(w - 1), Window.currentRow)
    grams
      .withColumn("wmin", min("h").over(win))
      .filter(col("pos") >= w - 1) // only full windows select
      .select(col("doc_id"), col("wmin").as("fp"))
      .distinct()
  }

  val qDocWinnow: Q = (s, d) =>
    winnowIndex(documents(s, d)).orderBy("doc_id", "fp")

  val qDocWinnowSql: String =
    """WITH t AS (SELECT doc_id,
      |    list_filter(string_split_regex(trim(text), '\s+'),
      |                x -> x <> '') AS l
      |  FROM documents),
      |mx AS (SELECT max(len(l)) AS m FROM t),
      |gr AS (SELECT doc_id, CAST(i AS INT) - 1 AS pos,
      |         md5(l[CAST(i AS INT)] || ' ' || l[CAST(i AS INT)+1] || ' ' ||
      |             l[CAST(i AS INT)+2] || ' ' || l[CAST(i AS INT)+3]) AS h
      |       FROM t CROSS JOIN
      |         (SELECT unnest(range(1, (SELECT m FROM mx))) AS i) r
      |       WHERE CAST(i AS INT) + 3 <= len(l)),
      |wm AS (SELECT doc_id, pos,
      |         min(h) OVER (PARTITION BY doc_id ORDER BY pos
      |           ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS fp
      |       FROM gr)
      |SELECT DISTINCT doc_id, fp FROM wm
      |WHERE pos >= 3
      |ORDER BY doc_id, fp""".stripMargin

  // ---------------------------------------------------------------------
  // Winnow-based near-dup pairs: documents sharing ≥ m selected
  // fingerprints. This is what the winnow index is FOR — overlap
  // detection that survives edits between the overlapping spans (the
  // guarantee: any ≥ 7-token contiguous overlap shares a fingerprint).
  // Same inverted-index shape as the Jaccard family: self-join on the
  // fingerprint key, pair-count aggregate, threshold. Winnowing keeps
  // ~1/w of grams, so the index (and the join) is ~4× smaller than the
  // all-shingles index — the point of the scheme at corpus scale; a df
  // cap composes exactly as in Dedup.capDocFrequency for boilerplate
  // fingerprints.
  // ---------------------------------------------------------------------
  val qDedupWinnow: Q = (s, d) => {
    // the index feeds both join sides — persist it, or the md5 + per-doc
    // window subtree runs twice (measured 7.2 s median vs 2.6 s at
    // sf0.1); boilerplate-heavy corpora additionally compose
    // Dedup.capDocFrequency here (max fingerprint df is 6 on this
    // fixture, so no cap is needed for the oracle)
    val fps = winnowIndex(documents(s, d)).persist()
    val out = fps.toDF("id_a", "fp")
      .join(fps.toDF("id_b", "fp"), Seq("fp"))
      .filter(col("id_a") < col("id_b"))
      .groupBy("id_a", "id_b")
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= 3)
      .orderBy("id_a", "id_b")
      .localCheckpoint(true)
    fps.unpersist()
    out
  }

  val qDedupWinnowSql: String = {
    // the winnow CTE body, reused verbatim from qDocWinnowSql
    val winnow = qDocWinnowSql
      .replace("ORDER BY doc_id, fp", "")
    s"""WITH sel AS ($winnow)
       |SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_shared
       |FROM sel a JOIN sel b ON a.fp = b.fp AND a.doc_id < b.doc_id
       |GROUP BY 1, 2
       |HAVING count(*) >= 3
       |ORDER BY id_a, id_b""".stripMargin
  }

  // ---------------------------------------------------------------------
  // Cross-document boilerplate fraction — the corpus-level complement to
  // the per-row repetition kernel: how much of a document's distinct
  // n-gram set is corpus-hot (appears in >= BoilerDf documents). High
  // fractions flag templated/mirrored pages (nav bars, license footers,
  // scraped listings) that per-document quality gates can't see.
  //
  // Scale shape: one hash aggregation on the gram key for document
  // frequency, then a join BACK to the per-doc gram set on the same key —
  // the df aggregate's output is already hash-partitioned on `g`, so the
  // join adds one exchange on the grams side only — and a final per-doc
  // count. At 100 TB the gram strings collapse to 64-bit fingerprints at
  // the source exactly as Dedup's shingle index does (the string form
  // here is what makes the DuckDB oracle expressible).
  // ---------------------------------------------------------------------
  val BoilerN = 3
  val BoilerDf = 3

  def boilerplateFractions(docs: DataFrame): DataFrame = {
    val grams = docs
      .select(col("doc_id"), tokens(col("text")).as("toks"))
      .select(col("doc_id"),
        explode(array_distinct(shinglesFromTokens(col("toks"), BoilerN)))
          .as("g"))
      .persist() // feeds both the df aggregate and the join probe
    val df = grams.groupBy("g").agg(count(lit(1)).as("df"))
    val out = grams.join(df, "g")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_grams"),
        sum(when(col("df") >= BoilerDf, 1L).otherwise(0L)).as("n_hot"))
      .withColumn("boiler_frac",
        round(col("n_hot").cast("double") / col("n_grams"), 4))
      .localCheckpoint(true)
    grams.unpersist()
    out
  }

  val qBoilerplate: Q = (s, d) =>
    boilerplateFractions(documents(s, d)).orderBy("doc_id")

  val qBoilerplateSql: String =
    s"""WITH t AS (SELECT doc_id,
      |    list_filter(string_split_regex(trim(text), '\\s+'),
      |                x -> x <> '') AS l
      |  FROM documents),
      |mx AS (SELECT max(len(l)) AS m FROM t),
      |gr AS (SELECT DISTINCT doc_id,
      |         array_to_string(
      |           l[CAST(i AS INT):CAST(i + ${BoilerN - 1} AS INT)], ' ') AS g
      |       FROM t CROSS JOIN
      |         (SELECT unnest(range(1, (SELECT m FROM mx))) AS i) r
      |       WHERE CAST(i AS INT) + ${BoilerN - 1} <= len(l)),
      |d AS (SELECT g, count(*) AS df FROM gr GROUP BY 1),
      |j AS (SELECT doc_id, df FROM gr JOIN d USING (g))
      |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_grams,
      |  CAST(count(*) FILTER (df >= $BoilerDf) AS BIGINT) AS n_hot,
      |  round(CAST(count(*) FILTER (df >= $BoilerDf) AS DOUBLE)
      |    / count(*), 4) AS boiler_frac
      |FROM j GROUP BY 1 ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------------
  // Gopher-style heuristic rule battery (Rae et al., "Scaling Language
  // Models: Methods, Analysis & Insights from Training Gopher",
  // arXiv 2112.11446 §A1.1): per-document boolean diagnostics for the
  // classic pretraining filter rules — word-count bounds, mean word
  // length, symbol-to-word ratio, stopword presence, duplicate-token
  // fraction — plus the conjunctive keep verdict. Emitting PER-RULE flags
  // rather than just the verdict is the production shape: filter-rate
  // dashboards and rule ablations need to know WHICH rule fired.
  //
  // Scale shape: one corpus scan, zero shuffle (PlanShapeSpec regime —
  // every signal is a per-row Column over one tokenize); the only sort is
  // the presentation orderBy. Parity: flags are exact comparisons on
  // int/int or long/int IEEE divisions, so no rounding regime is needed.
  // ---------------------------------------------------------------------
  val GopherMinTokens = 20
  val GopherMaxTokens = 1000
  val GopherMinMeanLen = 3.0
  val GopherMaxMeanLen = 10.0
  val GopherMaxSymbolRatio = 0.1
  val GopherMinStopwords = 2
  val GopherMaxDupFrac = 0.6
  val GopherStopwords = Seq("the", "a", "and", "of", "to", "in", "is")

  /** The five raw rule signals (n_tokens, mean_len, sym_ratio, n_stop,
    * dup_frac) off one (text, tokens) pair — THE single definition every
    * gopher surface derives from: the per-doc battery, the per-source
    * funnel, and the streaming gate all call this, so the three can't
    * drift (the spec-pinned equivalences then check the derivations, not
    * parallel copies of the expressions). n > 0 is guaranteed upstream by
    * the fixture contract (min n_chars 48) — divisions stay unguarded for
    * exact engine parity.
    */
  private[operators] def gopherSignalCols(
      text: Column, toks: Column): Seq[Column] = {
    val n = size(toks)
    Seq(
      n.cast("long"),
      aggregate(toks, lit(0L), (acc, t) => acc + length(t))
        .cast("double") / n,
      regexp_count(text, lit("[^A-Za-z0-9\\s]")).cast("double") / n,
      size(filter(toks, t => t.isin(GopherStopwords.map(lit): _*))),
      (n - size(array_distinct(toks))).cast("double") / n)
  }

  /** The five per-rule pass predicates over the same signal list. */
  private[operators] def gopherPredicates(
      text: Column, toks: Column): Seq[Column] = {
    val Seq(n, meanLen, symRatio, nStop, dupFrac) =
      gopherSignalCols(text, toks)
    Seq(
      n.between(GopherMinTokens, GopherMaxTokens),
      meanLen.between(GopherMinMeanLen, GopherMaxMeanLen),
      symRatio <= GopherMaxSymbolRatio,
      nStop >= GopherMinStopwords,
      dupFrac <= GopherMaxDupFrac)
  }

  /** Per-document rule flags over any frame with (doc_id, text). */
  def gopherRules(docs: DataFrame): DataFrame = {
    val ps = gopherPredicates(col("text"), col("toks"))
    docs
      .select(col("doc_id"), col("text"), tokens(col("text")).as("toks"))
      .select(
        col("doc_id"),
        size(col("toks")).cast("long").as("n_tokens"),
        ps(0).cast("int").as("r_word_count"),
        ps(1).cast("int").as("r_mean_word_len"),
        ps(2).cast("int").as("r_symbol_ratio"),
        ps(3).cast("int").as("r_stopwords"),
        ps(4).cast("int").as("r_dup_tokens"),
        ps.reduce(_ && _).cast("int").as("keep"))
  }

  val qGopherRules: Q = (s, d) =>
    gopherRules(documents(s, d)).orderBy("doc_id")

  /** The ingest-gate form of the battery: admit only rule-passing
    * documents, preserving the caller's columns. Stateless per-row, so
    * it composes into a structured stream unchanged (DocStreamsSpec pins
    * stream-admitted ≡ battery keep=1 on the same rows). The predicate
    * compares the same signal expressions against the same thresholds as
    * [[gopherRules]].
    */
  def gopherFilter(docs: DataFrame): DataFrame =
    docs.withColumn("_gtoks", tokens(col("text")))
      .filter(gopherPredicates(col("text"), col("_gtoks")).reduce(_ && _))
      .drop("_gtoks")

  val qGopherRulesSql: String =
    s"""WITH t AS (SELECT doc_id,
      |    list_filter(string_split_regex(trim(text), '\\s+'),
      |                x -> x <> '') AS l,
      |    text
      |  FROM documents),
      |st AS (SELECT doc_id,
      |    len(l) AS n_tokens,
      |    CAST(list_sum(list_transform(l, x -> len(x))) AS DOUBLE) / len(l)
      |      AS mean_len,
      |    CAST(len(regexp_extract_all(text, '[^A-Za-z0-9\\s]')) AS DOUBLE)
      |      / len(l) AS sym_ratio,
      |    len(list_filter(l, x -> x IN (${GopherStopwords
             .map(w => s"'$w'").mkString(",")}))) AS n_stop,
      |    CAST(len(l) - len(list_distinct(l)) AS DOUBLE) / len(l) AS dup_frac
      |  FROM t)
      |SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
      |  CAST(n_tokens BETWEEN $GopherMinTokens AND $GopherMaxTokens AS INT)
      |    AS r_word_count,
      |  CAST(mean_len BETWEEN $GopherMinMeanLen AND $GopherMaxMeanLen AS INT)
      |    AS r_mean_word_len,
      |  CAST(sym_ratio <= $GopherMaxSymbolRatio AS INT) AS r_symbol_ratio,
      |  CAST(n_stop >= $GopherMinStopwords AS INT) AS r_stopwords,
      |  CAST(dup_frac <= $GopherMaxDupFrac AS INT) AS r_dup_tokens,
      |  CAST(n_tokens BETWEEN $GopherMinTokens AND $GopherMaxTokens
      |    AND mean_len BETWEEN $GopherMinMeanLen AND $GopherMaxMeanLen
      |    AND sym_ratio <= $GopherMaxSymbolRatio
      |    AND n_stop >= $GopherMinStopwords
      |    AND dup_frac <= $GopherMaxDupFrac AS INT) AS keep
      |FROM st ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------------
  // PII detection report — the per-source incidence dashboard that runs
  // BEFORE the scrubber: how much of each ingest stream carries each PII
  // type, the number a data-governance review asks for first (scrub
  // handles remediation; this is measurement). The fixture corpus is
  // PII-free, so the query plants each type on a doc_id-derived SUBSET
  // (emails on ≡0 mod 3, phones mod 5, IPs mod 7, account ids mod 11 —
  // distinct small primes so the per-source mix genuinely varies),
  // then detects with the same patterns the scrubber redacts — the
  // planted-evidence discipline qPiiScrub established.
  //
  // Scale shape: per-row regexp_count chain (codegen'd) + one
  // partial+final groupBy(source) — a #sources-row result, no joins.
  // Parity: integer match counts, one int/int IEEE division rounded 4dp.
  // ---------------------------------------------------------------------
  val qPiiReport: Q = (s, d) => {
    val enriched = concat(
      col("text"),
      when(col("doc_id") % 3 === 0, concat(
        lit(" contact user"), col("doc_id").cast("string"),
        lit("@example.com"))).otherwise(lit("")),
      when(col("doc_id") % 5 === 0, concat(
        lit(" tel +27-555-"),
        lpad((col("doc_id") * 7 % 10000).cast("string"), 4, "0")))
        .otherwise(lit("")),
      when(col("doc_id") % 7 === 0, concat(
        lit(" ip 10.0."), (col("doc_id") % 256).cast("string"),
        lit("."), (col("doc_id") * 3 % 256).cast("string")))
        .otherwise(lit("")),
      when(col("doc_id") % 11 === 0, concat(
        lit(" acct "),
        lpad((col("doc_id") * 37 % 1000000000).cast("string"), 9, "0")))
        .otherwise(lit("")))
    val counts = piiPatterns.map { case (pat, tag) =>
      regexp_count(col("enriched"), lit(pat)).cast("long")
        .as("n_" + tag.stripPrefix("<").stripSuffix(">").toLowerCase)
    }
    documents(s, d)
      .select(col("source"), enriched.as("enriched"))
      .select(col("source") +: counts: _*)
      .groupBy("source")
      .agg(
        count(lit(1)).as("n_docs"),
        sum("n_email").as("n_email"),
        sum("n_phone").as("n_phone"),
        sum("n_ip").as("n_ip"),
        sum("n_id").as("n_id"),
        sum(when(col("n_email") + col("n_phone") + col("n_ip") +
          col("n_id") > 0, 1L).otherwise(0L)).as("n_docs_with_pii"))
      .withColumn("pii_rate",
        round(col("n_docs_with_pii").cast("double") / col("n_docs"), 4))
      .orderBy("source")
  }

  val qPiiReportSql: String = {
    val enriched =
      """text ||
        |  CASE WHEN doc_id % 3 = 0 THEN ' contact user' ||
        |    CAST(doc_id AS VARCHAR) || '@example.com' ELSE '' END ||
        |  CASE WHEN doc_id % 5 = 0 THEN ' tel +27-555-' ||
        |    lpad(CAST(doc_id * 7 % 10000 AS VARCHAR), 4, '0')
        |    ELSE '' END ||
        |  CASE WHEN doc_id % 7 = 0 THEN ' ip 10.0.' ||
        |    CAST(doc_id % 256 AS VARCHAR) || '.' ||
        |    CAST(doc_id * 3 % 256 AS VARCHAR) ELSE '' END ||
        |  CASE WHEN doc_id % 11 = 0 THEN ' acct ' ||
        |    lpad(CAST(doc_id * 37 % 1000000000 AS VARCHAR), 9, '0')
        |    ELSE '' END""".stripMargin
    val cnt = piiPatterns.map { case (pat, tag) =>
      val nm = "n_" + tag.stripPrefix("<").stripSuffix(">").toLowerCase
      s"len(regexp_extract_all(enriched, '$pat')) AS $nm"
    }.mkString(",\n|    ")
    s"""WITH e AS (SELECT source, ($enriched) AS enriched FROM documents),
       |c AS (SELECT source,
       |    $cnt
       |  FROM e)
       |SELECT source,
       |  CAST(count(*) AS BIGINT) AS n_docs,
       |  CAST(sum(n_email) AS BIGINT) AS n_email,
       |  CAST(sum(n_phone) AS BIGINT) AS n_phone,
       |  CAST(sum(n_ip) AS BIGINT) AS n_ip,
       |  CAST(sum(n_id) AS BIGINT) AS n_id,
       |  CAST(sum(CASE WHEN n_email + n_phone + n_ip + n_id > 0
       |    THEN 1 ELSE 0 END) AS BIGINT) AS n_docs_with_pii,
       |  round(CAST(sum(CASE WHEN n_email + n_phone + n_ip + n_id > 0
       |    THEN 1 ELSE 0 END) AS DOUBLE) / count(*), 4) AS pii_rate
       |FROM c GROUP BY source
       |ORDER BY source""".stripMargin
  }

  // ---------------------------------------------------------------------
  // Filter-funnel report: per-source survival counts through the staged
  // gate chain (length → repetition → stopwords) — the attrition
  // dashboard every corpus-curation run publishes. Stages are CUMULATIVE
  // (a doc counts at stage k only if it passed 1..k-1), so columns are
  // monotone non-increasing left to right; QualitySpec pins that and the
  // consistency with the per-doc battery above.
  //
  // Scale shape: per-row predicates + one partial+final groupBy(source)
  // — conditional sums, a #sources-row result. No joins, no second scan.
  // ---------------------------------------------------------------------
  /** Per-source cascade report over any frame with (source, text). The
    * three stage gates are the battery's word-count, duplicate-token and
    * stopword predicates, taken from the shared [[gopherPredicates]]
    * list.
    */
  def qualityFunnel(docs: DataFrame): DataFrame = {
    val tokenized = docs.select(col("source"), col("text"),
      tokens(col("text")).as("toks"))
    val preds = gopherPredicates(col("text"), col("toks"))
    tokenized
      .select(
        col("source"),
        preds(0).as("p1"),
        preds(4).as("p2"),
        preds(3).as("p3"))
      .groupBy("source")
      .agg(
        count(lit(1)).as("n_total"),
        sum(when(col("p1"), 1L).otherwise(0L)).as("n_len"),
        sum(when(col("p1") && col("p2"), 1L).otherwise(0L)).as("n_rep"),
        sum(when(col("p1") && col("p2") && col("p3"), 1L).otherwise(0L))
          .as("n_kept"))
      .withColumn("keep_frac",
        round(col("n_kept").cast("double") / col("n_total"), 4))
  }

  val qQualityFunnel: Q = (s, d) =>
    qualityFunnel(documents(s, d)).orderBy("source")

  val qQualityFunnelSql: String =
    s"""WITH t AS (SELECT source,
      |    list_filter(string_split_regex(trim(text), '\\s+'),
      |                x -> x <> '') AS l
      |  FROM documents),
      |g AS (SELECT source,
      |    (len(l) BETWEEN $GopherMinTokens AND $GopherMaxTokens) AS p1,
      |    (CAST(len(l) - len(list_distinct(l)) AS DOUBLE) / len(l) <=
      |      $GopherMaxDupFrac) AS p2,
      |    (len(list_filter(l, x -> x IN (${GopherStopwords
             .map(w => s"'$w'").mkString(",")}))) >= $GopherMinStopwords)
      |      AS p3
      |  FROM t)
      |SELECT source,
      |  CAST(count(*) AS BIGINT) AS n_total,
      |  CAST(sum(CASE WHEN p1 THEN 1 ELSE 0 END) AS BIGINT) AS n_len,
      |  CAST(sum(CASE WHEN p1 AND p2 THEN 1 ELSE 0 END) AS BIGINT) AS n_rep,
      |  CAST(sum(CASE WHEN p1 AND p2 AND p3 THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_kept,
      |  round(CAST(sum(CASE WHEN p1 AND p2 AND p3 THEN 1 ELSE 0 END)
      |    AS DOUBLE) / count(*), 4) AS keep_frac
      |FROM g GROUP BY source ORDER BY source""".stripMargin

  // ---------------------------------------------------------------------
  // Cross-source quality calibration — the fix for "one global threshold
  // over heterogeneous sources": a quality classifier's raw scores are
  // not comparable across domains (a mid-tier academic page outscores a
  // top-tier forum post), so production filters threshold at a PER-
  // SOURCE percentile, not a global score (the CCNet per-language-bucket
  // and Llama-era per-domain practice). Score here is the type-token
  // ratio (distinct/total tokens — deterministic, engine-neutral);
  // output carries the raw score, both percentiles, and the two keep
  // flags at the 50th percentile so the calibrated-vs-raw disagreement
  // is directly inspectable.
  //
  // Scale shape: the per-source percentile is a window partitioned by
  // source (parallel across sources; a hot source is one AQE-splittable
  // partition); the GLOBAL percentile reuses the two-level prefix sum —
  // a range exchange + parallel local ranks + #partitions-row driver
  // scan, never a single-task global window. Ranks order on the ROUNDED
  // score with doc_id tie-break, so rank order is engine-exact.
  // ---------------------------------------------------------------------
  def qualityCalibration(docs: DataFrame): DataFrame = {
    val scored = docs.select(col("doc_id"), col("source"),
      tokens(col("text")).as("toks"))
      .select(col("doc_id"), col("source"),
        round(size(array_distinct(col("toks"))).cast("double") /
          greatest(size(col("toks")), lit(1)), 4).as("score"))
      .persist()
    val nTot = scored.agg(count(lit(1)).as("n"))
    val wSrc = Window.partitionBy("source")
      .orderBy(col("score").desc, col("doc_id"))
    val nSrc = scored.groupBy("source").agg(count(lit(1)).as("n_src"))
    val ranked = Sampling.exclusivePrefixSum(
      scored.withColumn("one", lit(1L)),
      Seq(col("score").desc, col("doc_id")), "one", 32, "rank0")
    val out = ranked
      .join(broadcast(nSrc), Seq("source"))
      .crossJoin(broadcast(nTot))
      .withColumn("rn_src", row_number().over(wSrc))
      .select(col("doc_id"), col("source"), col("score"),
        round((col("rn_src") - 1).cast("double") /
          greatest(col("n_src") - 1, lit(1)), 6).as("pct_src"),
        round(col("rank0").cast("double") /
          greatest(col("n") - 1, lit(1)), 6).as("pct_global"))
      .withColumn("keep_cal", (col("pct_src") <= 0.5).cast("int"))
      .withColumn("keep_raw", (col("pct_global") <= 0.5).cast("int"))
      .orderBy("doc_id")
      .localCheckpoint(true)
    scored.unpersist()
    out
  }

  val qQualityCalibration: Q = (s, d) => qualityCalibration(documents(s, d))

  val qQualityCalibrationSql: String =
    """WITH scored AS (SELECT doc_id, source,
      |    round(CAST(len(list_distinct(l)) AS DOUBLE) /
      |          greatest(len(l), 1), 4) AS score
      |  FROM (SELECT doc_id, source,
      |          list_filter(string_split_regex(trim(text), '\s+'),
      |                      x -> x <> '') AS l
      |        FROM documents)),
      |r AS (SELECT doc_id, source, score,
      |    round(CAST(row_number() OVER (PARTITION BY source
      |        ORDER BY score DESC, doc_id) - 1 AS DOUBLE) /
      |      greatest(count(*) OVER (PARTITION BY source) - 1, 1), 6)
      |      AS pct_src,
      |    round(CAST(row_number() OVER (
      |        ORDER BY score DESC, doc_id) - 1 AS DOUBLE) /
      |      greatest(count(*) OVER () - 1, 1), 6) AS pct_global
      |  FROM scored)
      |SELECT doc_id, source, score, pct_src, pct_global,
      |  CAST(pct_src <= 0.5 AS INT) AS keep_cal,
      |  CAST(pct_global <= 0.5 AS INT) AS keep_raw
      |FROM r ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------------
  // Corpus drift report — snapshot-over-snapshot distribution monitoring
  // (the data-quality twin of the rate-anomaly control chart): per
  // source, the total-variation distance between the two snapshots'
  // doc-length histograms. TV = 0.5·Σ|p_A − p_B| over fixed-width
  // buckets: bounded [0,1], zero iff identical, and — unlike KS on raw
  // values — computable as ONE aggregation over (source, bucket) cells.
  // The snapshot split here is md5(doc_id) parity — engine-neutral and
  // ~50/50 WITHIN every source (the fixture assigns sources cyclically,
  // so raw doc_id parity is constant per source and would put each
  // source wholly in one half); production keys the halves on ingest
  // date.
  //
  // Scale shape: state is sources × buckets cells however large the
  // corpus — one groupBy with map-side partials, then a sources-sized
  // second agg. Nothing row-scale leaves the first exchange.
  // ---------------------------------------------------------------------
  def corpusDrift(docs: DataFrame, bucketWidth: Long): DataFrame = {
    val cells = docs.select(col("source"),
      (col("n_chars").cast("long") / lit(bucketWidth)).cast("long")
        .as("bucket"),
      (substring(md5(col("doc_id").cast("string")), 1, 1) < "8")
        .as("in_a"))
      .groupBy("source", "bucket")
      .agg(sum(when(col("in_a"), 1L).otherwise(0L)).as("c_a"),
        sum(when(col("in_a"), 0L).otherwise(1L)).as("c_b"))
    val tot = cells.groupBy("source")
      .agg(sum("c_a").as("n_a"), sum("c_b").as("n_b"))
    // greatest(n, 1): a half can be empty on a tiny source — TV then
    // degenerates to 1 (total drift) instead of a division error
    cells.join(tot, Seq("source"))
      .groupBy("source")
      .agg(max("n_a").as("n_a"), max("n_b").as("n_b"),
        round(lit(0.5) * sum(abs(
          col("c_a").cast("double") / greatest(col("n_a"), lit(1L)) -
            col("c_b").cast("double") / greatest(col("n_b"), lit(1L)))),
          4).as("tv_dist"))
      .orderBy("source")
  }

  /** Histogram bucket width (chars); shared with the oracle. */
  val DriftBucketChars = 100L

  val qCorpusDrift: Q = (s, d) =>
    corpusDrift(documents(s, d), DriftBucketChars)

  val qCorpusDriftSql: String =
    s"""WITH cells AS (SELECT source, n_chars // $DriftBucketChars AS bucket,
      |    CAST(sum(CASE WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 1)
      |               < '8' THEN 1 ELSE 0 END) AS BIGINT) AS c_a,
      |    CAST(sum(CASE WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 1)
      |               < '8' THEN 0 ELSE 1 END) AS BIGINT) AS c_b
      |  FROM documents GROUP BY 1, 2),
      |tot AS (SELECT source, CAST(sum(c_a) AS BIGINT) AS n_a,
      |    CAST(sum(c_b) AS BIGINT) AS n_b
      |  FROM cells GROUP BY 1)
      |SELECT source, n_a, n_b,
      |  round(0.5 * sum(abs(CAST(c_a AS DOUBLE) / greatest(n_a, 1) -
      |                      CAST(c_b AS DOUBLE) / greatest(n_b, 1))), 4)
      |    AS tv_dist
      |FROM cells JOIN tot USING (source)
      |GROUP BY source, n_a, n_b
      |ORDER BY source""".stripMargin

  val queries: Map[String, Q] = Map(
    "q_quality_calibration" -> qQualityCalibration,
    "q_corpus_drift" -> qCorpusDrift,
    "q_gopher_rules" -> qGopherRules,
    "q_quality_funnel" -> qQualityFunnel,
    "q_boilerplate" -> qBoilerplate,
    "q_quality_repetition" -> qQualityRepetition,
    "q_decontaminate" -> qDecontaminate,
    "q_decontaminate_bloom" -> qDecontaminateBloom,
    "q_decontaminate_normalized" -> qDecontaminateNormalized,
    "q_unicode_normalize" -> qUnicodeNormalize,
    "q_html_strip" -> qHtmlStrip,
    "q_pii_scrub" -> qPiiScrub,
    "q_pii_report" -> qPiiReport,
    "q_corpus_mix" -> qCorpusMix,
    "q_token_budget" -> qTokenBudget,
    "q_token_budget_classes" -> qTokenBudgetClasses,
    "q_doc_winnow" -> qDocWinnow,
    "q_dedup_winnow" -> qDedupWinnow)

  val oracles: Map[String, String] = Map(
    "q_quality_calibration" -> qQualityCalibrationSql,
    "q_corpus_drift" -> qCorpusDriftSql,
    "q_gopher_rules" -> qGopherRulesSql,
    "q_quality_funnel" -> qQualityFunnelSql,
    "q_boilerplate" -> qBoilerplateSql,
    "q_quality_repetition" -> qQualityRepetitionSql,
    "q_decontaminate" -> qDecontaminateSql,
    // bloom gate + exact verify: no false negatives, fps exact-killed —
    // identical output to the exact form (see contaminationBloom doc)
    "q_decontaminate_bloom" -> qDecontaminateSql,
    "q_decontaminate_normalized" -> qDecontaminateNormalizedSql,
    "q_unicode_normalize" -> qUnicodeNormalizeSql,
    "q_html_strip" -> qHtmlStripSql,
    "q_pii_scrub" -> qPiiScrubSql,
    "q_pii_report" -> qPiiReportSql,
    "q_corpus_mix" -> qCorpusMixSql,
    "q_token_budget" -> qTokenBudgetSql,
    "q_token_budget_classes" -> qTokenBudgetClassesSql,
    "q_doc_winnow" -> qDocWinnowSql,
    "q_dedup_winnow" -> qDedupWinnowSql)
}
