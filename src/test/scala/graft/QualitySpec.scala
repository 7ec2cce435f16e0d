package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.RepetitionStats
import graft.operators.{Quality, Similarity}

/** Corpus-quality operators: kernel-level counter checks, redaction
  * semantics, contamination on hand-built frames, and the
  * cluster-dedup-equals-exact property — everything the DuckDB
  * differential can't pin down at the unit level.
  */
class QualitySpec extends AnyFunSuite {

  private val dir = "/root/testdata/sf0.001"

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-quality-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def stats(tokens: Seq[String]): Seq[Long] = {
    import spark.implicits._
    Seq(Tuple1(tokens)).toDF("toks")
      .select(RepetitionStats.stats(spark, col("toks")).as("st"))
      .collect()(0).getSeq[Long](0)
  }

  test("repetition kernel counts tokens, bigrams, dups and top mass") {
    // "a b a b c": bigrams ab, ba, ab, bc → ab twice (dup mass 2, top 2,
    // ppm 2e6/4)
    assert(stats(Seq("a", "b", "a", "b", "c")) ===
      Seq(5L, 3L, 4L, 2L, 2L, 500000L))
    // no repetition at all — top bigram still counts once (ppm 1e6/2)
    assert(stats(Seq("x", "y", "z")) === Seq(3L, 3L, 2L, 0L, 1L, 500000L))
    // total repetition: "a a a a" → bigram aa three times (ppm 1e6)
    assert(stats(Seq("a", "a", "a", "a")) ===
      Seq(4L, 1L, 3L, 3L, 3L, 1000000L))
  }

  test("repetition kernel degenerate inputs: empty and single-token") {
    assert(stats(Seq.empty) === Seq(0L, 0L, 0L, 0L, 0L, 0L))
    assert(stats(Seq("only")) === Seq(1L, 1L, 0L, 0L, 0L, 0L))
  }

  test("pii scrub redacts emails, phones, ips and long ids; keeps text") {
    import spark.implicits._
    val got = Seq(
      "reach bob.smith+x@corp.example.org or +27-555-0199 now",
      "host 192.168.0.1 acct 123456789 pin 42",
      "nothing sensitive here 42 times").toDF("text")
      .select(Quality.piiScrub(col("text")).as("s"))
      .as[String].collect()
    assert(got(0) === "reach <EMAIL> or <PHONE> now")
    assert(got(1) === "host <IP> acct <ID> pin 42")
    assert(got(2) === "nothing sensitive here 42 times")
  }

  test("contamination flags only docs sharing an n-gram with the eval set") {
    import spark.implicits._
    val docs = Seq(
      (0L, "the quick brown fox jumps over the lazy dog"), // eval
      (1L, "a quick brown fox jumps over me today"), // shares 1 5-gram
      (2L, "completely different words in this one here"), // clean
      (3L, "the quick brown fox jumps over the lazy dog") // verbatim
    ).toDF("doc_id", "text")
    val got = Quality.contamination(docs, col("doc_id") === 0, 5)
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // doc 1 shares exactly "quick brown fox jumps over"; doc 3 shares
    // all five 5-grams of the eval doc; doc 2 is absent
    assert(got === Array((1L, 1L, 1L), (3L, 5L, 1L)))
  }

  test("bloom-gated contamination equals the exact form") {
    import spark.implicits._
    // fixture corpus: bloom gate + exact verify must reproduce the
    // exact pipeline row-for-row (no false negatives; fps exact-killed)
    val docs = Tables.documents(spark, dir).select("doc_id", "text")
    val exact = Quality.contamination(docs, col("doc_id") % 10 === 0, 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val bloom = Quality.contaminationBloom(docs, col("doc_id") % 10 === 0, 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(bloom === exact)
    assert(bloom.nonEmpty, "fixture must contain contaminated docs")
    // a DELIBERATELY undersized filter (worst-case fp rate ~1) must
    // still be exact — the verify join owns correctness, the bloom only
    // sheds work
    val tiny = Quality.contaminationBloom(
      docs, col("doc_id") % 10 === 0, 5, numBits = 64, numHashes = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(tiny === exact)
  }

  test("gram bloom kernel: inserted keys always hit, fp rate is sane") {
    import graft.functions.GramBloom
    val bits = new Array[Long](1 << 14) // 2^20 bits
    val keys = (1L to 5000L).map(_ * 0x9e3779b97f4a7c15L)
    keys.foreach(GramBloom.add(bits, 5, _))
    assert(keys.forall(GramBloom.contains(bits, 5, _)),
      "bloom filters have no false negatives")
    // ~5k keys in 2^20 bits at 5 hashes: theoretical fp ~1e-6 — accept
    // anything under 1% to stay timing-stable
    val probes = (1L to 10000L).map(k => -k)
    val fps = probes.count(GramBloom.contains(bits, 5, _))
    assert(fps < 100, s"fp rate too high: $fps/10000")
  }

  test("corpus mix keeps every doc of rate-1.0 sources, is deterministic") {
    val mix = Quality.qCorpusMix(spark, dir).cache()
    // sources with index % 4 == 0 carry threshold "g" → rate 1.0
    val full = mix.filter(
      pmod(substring(col("source"), 4, 10).cast("int"), lit(4)) === 0)
    assert(full.count() > 0)
    assert(full.filter(col("n_kept") =!= col("n_total")).count() === 0,
      "rate-1.0 sources must keep every doc")
    // sampled sources drop something at this corpus size but never all
    val sampled = mix.filter(
      pmod(substring(col("source"), 4, 10).cast("int"), lit(4)) =!= 0)
    assert(sampled.filter(col("n_kept") === col("n_total")).count()
      < sampled.count())
    val again = Quality.qCorpusMix(spark, dir).collect()
    assert(again === mix.orderBy("source").collect(),
      "hash-threshold sampling must be run-stable")
    mix.unpersist()
  }

  test("ppm-class budget fill is the greedy fill minus the boundary class") {
    import spark.implicits._
    val docs = Tables.documents(spark, dir)
    val budget = 2000L
    val greedy = Quality.qTokenBudget(spark, dir)
      .select("lang", "doc_id")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val byClass = Quality.tokenBudgetByPpmClass(docs, budget).cache()
    val classSet = byClass.select("lang", "doc_id")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(classSet.nonEmpty)
    assert(classSet.subsetOf(greedy),
      "whole fitting classes are exactly the greedy prefix up to the boundary")
    // budget is respected per language
    val overs = byClass.groupBy("lang")
      .agg(sum("n_tokens").as("t")).filter(col("t") > budget).count()
    assert(overs === 0)
    byClass.unpersist()
  }

  test("boilerplate fraction equals a driver-side brute-force recount") {
    val got = Quality.qBoilerplate(spark, dir)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toMap
    // independent recount in plain Scala from the raw text
    val docs = graft.Tables.documents(spark, dir)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1))
    val gramSets = docs.map { case (id, text) =>
      id -> text.trim.split("\\s+").filter(_.nonEmpty)
        .sliding(Quality.BoilerN).filter(_.length == Quality.BoilerN)
        .map(_.mkString(" ")).toSet
    }
    val dfCount = gramSets.flatMap(_._2).groupBy(identity)
      .view.mapValues(_.length.toLong).toMap
    assert(got.keySet === gramSets.filter(_._2.nonEmpty).map(_._1).toSet)
    gramSets.filter(_._2.nonEmpty).foreach { case (id, gs) =>
      val hot = gs.count(g => dfCount(g) >= Quality.BoilerDf).toLong
      val (nGrams, nHot, frac) = got(id)
      assert(nGrams === gs.size.toLong, s"doc $id gram count")
      assert(nHot === hot, s"doc $id hot count")
      assert(frac ===
        BigDecimal(hot.toDouble / gs.size)
          .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble,
        s"doc $id fraction")
    }
    // the threshold must bite on this fixture: some docs hot, none all-hot
    assert(got.values.exists(_._2 > 0) && got.values.exists(_._2 == 0))
  }

  test("gopher battery flags each rule violation independently") {
    import spark.implicits._
    // one doc per violated rule, plus one clean doc that passes all five.
    // Token budget: clean doc needs >=20 tokens, 2 stopwords, mean len
    // in [3,10], no symbols, dup fraction <= 0.6.
    val cleanToks =
      Seq("the", "quick", "brown", "fox", "jumps", "over", "lazy", "dog",
        "while", "many", "other", "animal", "walks", "through", "green",
        "field", "near", "of", "old", "river", "bank") // 21 distinct, 2 stops
    val docs = Seq(
      (0L, cleanToks.mkString(" ")),                        // passes all
      (1L, "too short a doc the end"),                      // word count
      (2L, cleanToks.map(_ => "x").mkString(" ")),          // mean len < 3
      (3L, cleanToks.map(t => s"$t!!!").mkString(" ")),     // symbols
      (4L, cleanToks.map(_.capitalize).mkString(" ")),      // no stopwords
      (5L, ("the a " + Seq.fill(19)("dup").mkString(" ")))  // dup tokens
    ).toDF("doc_id", "text")
    val got = Quality.gopherRules(docs).orderBy("doc_id")
      .collect().map(r => r.getLong(0) ->
        (r.getInt(2), r.getInt(3), r.getInt(4), r.getInt(5), r.getInt(6),
          r.getInt(7))).toMap
    assert(got(0L) === ((1, 1, 1, 1, 1, 1)), "clean doc passes every rule")
    assert(got(1L)._1 === 0 && got(1L)._6 === 0, "word-count rule fires")
    assert(got(2L)._2 === 0, "mean-word-length rule fires")
    assert(got(3L)._3 === 0, "symbol-ratio rule fires")
    assert(got(4L)._4 === 0, "stopword rule fires")
    assert(got(5L)._5 === 0, "duplicate-token rule fires")
    // every violation doc is rejected overall
    (1L to 5L).foreach(id => assert(got(id)._6 === 0, s"doc $id rejected"))
  }

  test("funnel stages are monotone and agree with the per-doc battery") {
    import org.apache.spark.sql.functions.col
    val funnel = Quality.qQualityFunnel(spark, dir).collect()
    assert(funnel.nonEmpty)
    funnel.foreach { r =>
      val (total, len, rep, kept) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      assert(total >= len && len >= rep && rep >= kept,
        s"${r.getString(0)}: cascade must shrink monotonically")
    }
    // the funnel's final kept count per source == docs whose battery
    // flags pass the funnel's three rules (word count, dup, stopwords)
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val battery = Quality.gopherRules(docs)
      .join(docs.select("doc_id", "source"), "doc_id")
      .filter(col("r_word_count") === 1 && col("r_dup_tokens") === 1 &&
        col("r_stopwords") === 1)
      .groupBy("source").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    funnel.foreach { r =>
      assert(r.getLong(4) === battery.getOrElse(r.getString(0), 0L),
        s"${r.getString(0)}: funnel kept != battery-passing docs")
    }
    // the gates genuinely bite on the fixture
    assert(funnel.exists(r => r.getLong(4) < r.getLong(1)))
  }

  test("semantic cluster dedup equals exact all-pairs on the fixture") {
    val exact = Similarity.qDedupEmbedding(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val sem = Similarity.qDedupSemantic(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty)
    assert(sem === exact,
      "copies share a cell, so cluster-local compare must find all pairs")
  }

  test("quality calibration keeps a balanced half per source; raw does not") {
    val got = Quality.qQualityCalibration(spark, dir).cache()
    assert(got.count() === 500)
    assert(got.filter(col("pct_src") < 0 || col("pct_src") > 1 ||
      col("pct_global") < 0 || col("pct_global") > 1).count() === 0)
    // per-source calibrated keep rate is pinned to ~half by construction
    val perSrc = got.groupBy("source")
      .agg(count(lit(1)).as("n"), sum("keep_cal").as("k"))
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    perSrc.foreach { case (n, k) =>
      assert(k >= n / 2 && k <= n / 2 + 1, s"keep_cal $k of $n")
    }
    // the top-ranked doc of every source sits at source percentile 0
    assert(got.filter(col("pct_src") === 0.0).count() >= 20)
    got.unpersist()
  }

  test("corpus drift equals a driver-side TV recount") {
    val docs = graft.Tables.documents(spark, dir)
      .select("doc_id", "source", "n_chars")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    def md5EvenHalf(id: Long): Boolean = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
      ((d(0) >> 4) & 0xf) < 8
    }
    val want = docs.groupBy(_._2).map { case (src, rows) =>
      val a = rows.filter(r => md5EvenHalf(r._1))
      val b = rows.filter(r => !md5EvenHalf(r._1))
      val buckets = rows.map(_._3 / 100).distinct
      val tv = 0.5 * buckets.map { bk =>
        math.abs(
          a.count(_._3 / 100 == bk).toDouble / math.max(a.length, 1) -
            b.count(_._3 / 100 == bk).toDouble / math.max(b.length, 1))
      }.sum
      src -> ((a.length.toLong, b.length.toLong,
        BigDecimal(tv).setScale(4, BigDecimal.RoundingMode.HALF_UP)
          .toDouble))
    }
    val got = Quality.qCorpusDrift(spark, dir).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(got === want)
    assert(got.values.forall { case (_, _, tv) => tv >= 0.0 && tv <= 1.0 })
  }

  test("normalized decontamination catches what exact matching misses") {
    import org.apache.spark.sql.functions.col
    val docs = graft.Tables.documents(spark, dir)
    val planted = docs.filter(col("doc_id") % 40 === 0)
      .collect().map(_.getLong(0) + 1000000L).toSet
    assert(planted.nonEmpty)
    // the exact matcher on the obfuscated corpus: planted docs invisible
    // (case flip changes every 5-gram)
    val exactHits = Quality.contamination(
      Quality.obfuscatedCorpus(docs), Quality.obfuscatedIsEval, 5)
      .collect().map(_.getLong(0)).toSet
    assert(planted.intersect(exactHits).isEmpty,
      "upper-cased copies must evade exact n-gram matching")
    // the normalized matcher: every planted copy flagged, with enough
    // shared grams to be unambiguous
    val norm = Quality.qDecontaminateNormalized(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    planted.foreach { id =>
      assert(norm.contains(id), s"planted doc $id must be flagged")
      assert(norm(id) >= 5L, s"planted doc $id shared-gram count")
    }
  }

  test("pii report counts exactly the planted per-type subsets") {
    val ids = graft.Tables.documents(spark, dir)
      .select("doc_id", "source")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val want = ids.groupBy(_._2).map { case (src, rows) =>
      val d = rows.map(_._1)
      src -> ((d.length.toLong,
        d.count(_ % 3 == 0).toLong, d.count(_ % 5 == 0).toLong,
        d.count(_ % 7 == 0).toLong, d.count(_ % 11 == 0).toLong,
        d.count(i => i % 3 == 0 || i % 5 == 0 || i % 7 == 0 ||
          i % 11 == 0).toLong))
    }
    val got = Quality.qPiiReport(spark, dir).collect().map(r =>
      r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))).toMap
    assert(got === want)
  }
}
