package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Dedup, Similarity, TextAnalysis}

/** Training-data pipeline operators: recall/exactness properties that the
  * DuckDB differential suite can't express (xxhash64-based sketches are
  * Spark-specific).
  */
class PipelineOpsSpec extends AnyFunSuite {

  private val dir = "/root/testdata/sf0.001"

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-pipeline-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("exact dedup keeps originals and counts copies") {
    val got = Dedup.qDedupExact(spark, dir).cache()
    // corpus = 500 docs + copies of the 100 ids divisible by 5
    assert(got.count() === 500)
    assert(got.filter(col("doc_id") >= 1000000).count() === 0,
      "survivor must be the min id (the original)")
    assert(got.filter(col("n_copies") === 2).count() === 100)
    got.unpersist()
  }

  test("minhash LSH recall >= 0.95 vs exact jaccard pairs") {
    val exact = Dedup.qDedupNgramJaccard(spark, dir)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1)))
      .toSet
    val lsh = Dedup.qDedupMinhash(spark, dir)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1)))
      .toSet
    assert(exact.nonEmpty)
    assert(lsh.subsetOf(exact), "verified LSH pairs must be exact pairs")
    val recall = lsh.size.toDouble / exact.size
    assert(recall >= 0.95, s"recall $recall (${lsh.size}/${exact.size})")
  }

  test("containment dominates jaccard and catches the truncated copies") {
    val sh = Dedup.capDocFrequency(
      Dedup.shingleIndex(Dedup.corpusNear(spark, dir), 3),
      Dedup.ShingleDfCap).cache()
    def pairSet(df: org.apache.spark.sql.DataFrame) = df
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val cont = Dedup.containmentPairs(sh, 0.9)
    val contPairs = pairSet(cont)
    // C = i/min(na,nb) >= i/(na+nb-i) = J pointwise, so the high-Jaccard
    // pairs are a subset of the containment pairs at the same threshold
    assert(pairSet(Dedup.jaccardPairs(sh, 0.9)).subsetOf(contPairs))
    // each injected truncated copy is a NEAR-subset of its original (the
    // character-level cut can mint up to n-1 artifact shingles from the
    // split word, so very short copies may fall under the threshold):
    // containment must still flag the vast majority, many at exactly 1.0
    val copies = contPairs.filter { case (a, b) => b == a + 1000000L }
    val copyIds = sh.select("doc_id").distinct().collect()
      .map(_.getLong(0)).filter(_ >= 1000000L).toSet
    assert(copies.map(_._2).subsetOf(copyIds))
    assert(copies.size >= (copyIds.size * 9) / 10,
      s"flagged ${copies.size} of ${copyIds.size} truncated copies")
    assert(cont.filter(col("id_b") === col("id_a") + 1000000L)
      .filter(col("containment") === 1.0).count() > 0L,
      "clean-cut copies must surface at containment exactly 1.0")
    sh.unpersist()
  }

  test("tfidf cosine pairs surface the truncated copies at high score") {
    val out = operators.TextAnalysis
      .tfidfCosinePairs(Dedup.corpusNear(spark, dir), 10, 2, 0.7).cache()
    val rows = out.collect()
    assert(rows.nonEmpty)
    // cosine of nonnegative tf-idf vectors is in [0, 1] (+rounding slack)
    assert(rows.forall(r => r.getAs[Double]("cosine") <= 1.0001))
    assert(rows.forall(r => r.getAs[Long]("shared_terms") >= 2L))
    // a truncated copy keeps its original's salient terms: copy pairs
    // must appear, and score strictly above the population median
    val copies = out.filter(col("id_b") === col("id_a") + 1000000L)
    assert(copies.count() > 0)
    val medAll = out.stat.approxQuantile("cosine", Array(0.5), 0.0).head
    val medCopies = copies.stat.approxQuantile("cosine", Array(0.5), 0.0).head
    assert(medCopies > medAll,
      s"copy median $medCopies must exceed population median $medAll")
    out.unpersist()
  }

  test("tfidf retrieval ≡ join+window reference; no self, ranks dense") {
    import org.apache.spark.sql.expressions.Window
    val docs = graft.Tables.documents(spark, dir)
    val out = TextAnalysis
      .tfidfRetrieval(docs, col("doc_id") % 25 === 0, 10, 3).cache()
    val rows = out.collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r =>
      r.getAs[Long]("query_id") != r.getAs[Long]("neighbor_id")))
    // ranks are 1..n per query with no gaps
    val byQ = rows.groupBy(_.getAs[Long]("query_id"))
    assert(byQ.values.forall { rs =>
      val ranks = rs.map(_.getAs[Int]("rnk")).sorted.toSeq
      ranks == (1 to ranks.size) && ranks.size <= 3
    })
    // reference formulation: sparse term join + row_number window (the
    // oracle's shape) must produce identical rows
    val v = TextAnalysis.tfidfTopTerms(docs, 10)
      .select("doc_id", "term", "score")
    val norms = v.groupBy("doc_id")
      .agg(sqrt(sum(col("score") * col("score"))).as("nrm"))
    val dots = v.toDF("query_id", "term", "w_a")
      .filter(col("query_id") % 25 === 0)
      .join(v.toDF("neighbor_id", "term", "w_b"), "term")
      .filter(col("query_id") =!= col("neighbor_id"))
      .groupBy("query_id", "neighbor_id")
      .agg(sum(col("w_a") * col("w_b")).as("dot"))
    val ref = dots
      .join(norms.toDF("query_id", "na"), "query_id")
      .join(norms.toDF("neighbor_id", "nb"), "neighbor_id")
      .withColumn("cosine", round(col("dot") / (col("na") * col("nb")), 4))
      .withColumn("rnk", row_number().over(Window.partitionBy("query_id")
        .orderBy(col("cosine").desc, col("neighbor_id"))).cast("int"))
      .filter(col("rnk") <= 3)
      .select("query_id", "rnk", "neighbor_id", "cosine")
    def asSet(rs: Array[org.apache.spark.sql.Row]) = rs.map(r =>
      (r.getAs[Long]("query_id"), r.getAs[Int]("rnk"),
        r.getAs[Long]("neighbor_id"), r.getAs[Double]("cosine"))).toSet
    assert(asSet(rows) === asSet(ref.collect()))
    out.unpersist()
  }

  test("bm25 retrieval ≡ join+window reference") {
    import org.apache.spark.sql.expressions.Window
    val docs = graft.Tables.documents(spark, dir)
    val out = TextAnalysis
      .bm25Retrieval(docs, col("doc_id") % 25 === 0, 3).cache()
    val rows = out.collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r =>
      r.getAs[Long]("query_id") != r.getAs[Long]("neighbor_id")))
    // reference: per-(doc,term) BM25 weights summed over the query's
    // distinct-term set via a term join, ranked by a window — the
    // oracle's shape
    val tf = docs.select(col("doc_id"),
        graft.functions.TextFunctions.tokens(col("text")).as("toks"))
      .select(col("doc_id"), explode(col("toks")).as("term"))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val dl = tf.groupBy("doc_id").agg(sum("tf").as("dl"))
    val stats = dl.agg(count(lit(1)).as("n_docs"), avg("dl").as("avgdl"))
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val w = tf.join(dfreq, "term").join(dl, "doc_id")
      .crossJoin(broadcast(stats))
      .withColumn("w", round(
        log((col("n_docs") - col("df") + 0.5) / (col("df") + 0.5) + 1.0) *
          (col("tf") * lit(2.2)) /
          (col("tf") + lit(1.2) *
            (lit(0.25) + lit(0.75) * col("dl") / col("avgdl"))), 4))
      .select(col("doc_id").as("neighbor_id"), col("term"), col("w"))
    val q = tf.filter(col("doc_id") % 25 === 0)
      .select(col("doc_id").as("query_id"), col("term"))
    val ref = q.join(w, "term")
      .filter(col("query_id") =!= col("neighbor_id"))
      .groupBy("query_id", "neighbor_id")
      .agg(round(sum("w"), 4).as("score"))
      .withColumn("rnk", row_number().over(Window.partitionBy("query_id")
        .orderBy(col("score").desc, col("neighbor_id"))).cast("int"))
      .filter(col("rnk") <= 3)
      .select("query_id", "rnk", "neighbor_id", "score")
    def asSet(rs: Array[org.apache.spark.sql.Row]) = rs.map(r =>
      (r.getAs[Long]("query_id"), r.getAs[Int]("rnk"),
        r.getAs[Long]("neighbor_id"), r.getAs[Double]("score"))).toSet
    assert(asSet(rows) === asSet(ref.collect()))
    out.unpersist()
  }

  test("rrf fusion: vote law on hand-built rankings") {
    import spark.implicits._
    // query 1: ranker A says (10,20,30), ranker B says (20,10,40).
    // doc 20: 1/62 + 1/61; doc 10: 1/61 + 1/62 (tie with 20, id wins);
    // doc 30: 1/63; doc 40: 1/63 (tie, id wins)
    val a = Seq((1L, 1, 10L), (1L, 2, 20L), (1L, 3, 30L))
      .toDF("query_id", "rnk", "neighbor_id")
    val b = Seq((1L, 1, 20L), (1L, 2, 10L), (1L, 3, 40L))
      .toDF("query_id", "rnk", "neighbor_id")
    val out = TextAnalysis.rrfFusion(Seq(a, b), 4).collect()
      .map(r => (r.getInt(1), r.getLong(2), r.getDouble(3)))
    val both = BigDecimal(1.0 / 61 + 1.0 / 62)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val one3 = BigDecimal(1.0 / 63)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out.toSeq === Seq(
      (1, 10L, both), (2, 20L, both), (3, 30L, one3), (4, 40L, one3)))
  }

  test("broadcast all-pairs tfidf cosine ≡ inverted-index form") {
    // the registered query runs the broadcast shape (closed-vocabulary
    // fixture — see tfidfCosinePairsBroadcast's doc); this pins the two
    // formulations row-identical so either can carry the oracle
    val corpus = Dedup.corpusNear(spark, dir)
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .orderBy("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3))).toSeq
    val sparse = rows(operators.TextAnalysis
      .tfidfCosinePairs(corpus, 10, 2, 0.7))
    val dense = rows(operators.TextAnalysis
      .tfidfCosinePairsBroadcast(corpus, 10, 2, 0.7))
    assert(sparse.nonEmpty)
    assert(dense === sparse)
  }

  test("tfidf cosine regime selector: rule maps each vocabulary shape " +
    "to the right form, and Auto matches both direct forms") {
    import spark.implicits._
    val T = operators.TextAnalysis
    // pure rule: near-closed vocab (df² blowup) → broadcast; Heaps-law
    // vocab → inverted index; over the driver cap → inverted index
    // regardless of df shape
    assert(T.tfidfRegimePrefersBroadcast(6250L, 3.4e8))
    assert(!T.tfidfRegimePrefersBroadcast(50L, 500.0))
    assert(!T.tfidfRegimePrefersBroadcast(
      T.TfidfBroadcastDocCap + 1, Double.MaxValue))
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .orderBy("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3))).toSeq
    // the fixture's near-closed vocabulary maps to the broadcast branch
    val closed = Dedup.corpusNear(spark, dir)
    val closedStats = T.tfidfRegimeStats(
      T.tfidfTopTerms(closed, 10).select("doc_id", "term", "score"))
    assert(T.tfidfRegimePrefersBroadcast(
      closedStats._1, closedStats._2.toDouble))
    assert(rows(T.tfidfCosinePairsAuto(closed, 10, 2, 0.7)) ===
      rows(T.tfidfCosinePairsBroadcast(closed, 10, 2, 0.7)))
    // a Heaps-law corpus (per-doc-unique vocab + a few shared salient
    // terms) maps to the inverted-index branch
    val open = (0L until 60L).map { i =>
      // consecutive docs are near-twins: 8 shared salient terms (df=2)
      // + 2 per-doc unique (df=1) → pair cosine ≈ 0.73, everything
      // else disjoint; Σ df² = 30·8·4 + 120 = 1080 < 60² = 3600
      val shared = (0 until 8).map(j => s"s${i / 2}x$j").mkString(" ")
      val unique = s"u${i}a u${i}b"
      (i, s"$shared $unique")
    }.toDF("doc_id", "text")
    val openStats = T.tfidfRegimeStats(
      T.tfidfTopTerms(open, 10).select("doc_id", "term", "score"))
    assert(!T.tfidfRegimePrefersBroadcast(
      openStats._1, openStats._2.toDouble))
    val autoOpen = rows(T.tfidfCosinePairsAuto(open, 10, 2, 0.7))
    assert(autoOpen.nonEmpty)
    assert(autoOpen === rows(T.tfidfCosinePairs(open, 10, 2, 0.7)))
  }

  test("prefix filtering is complete: candidates cover every exact pair " +
    "from a strictly smaller index") {
    val sh = Dedup.capDocFrequency(
      Dedup.shingleIndex(Dedup.corpusNear(spark, dir), 3),
      Dedup.ShingleDfCap).cache()
    def pairSet(df: org.apache.spark.sql.DataFrame) = df
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = pairSet(Dedup.jaccardPairs(sh, 0.5))
    val cands = pairSet(Dedup.prefixFilterCandidates(sh, 0.5))
    assert(exact.nonEmpty)
    assert(exact.subsetOf(cands),
      "prefix-filter candidates must be COMPLETE at the threshold")
    // verified output is then exactly the full self-join's pairs
    assert(pairSet(Dedup.verifyJaccard(
      Dedup.prefixFilterCandidates(sh, 0.5), sh, 0.5)) === exact)
    // and the candidate index is genuinely smaller than the full one:
    // prefixes hold ~(1-θ) of the postings
    val full = sh.count().toDouble
    val pref = {
      import org.apache.spark.sql.expressions.Window
      val dfreq = sh.groupBy("g").agg(count(lit(1)).as("df"))
      val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("n"))
      val w = Window.partitionBy("doc_id").orderBy(col("df"), col("g"))
      sh.join(dfreq, "g").withColumn("rnk", row_number().over(w))
        .join(sizes, "doc_id")
        .filter(col("rnk") <= col("n") - ceil(col("n") * 0.5) + 1)
        .count().toDouble
    }
    assert(pref < 0.62 * full,
      s"prefix index $pref should be ~half of full $full")
    sh.unpersist()
  }

  test("minhash aggregator signatures are bit-identical to the kernel form") {
    val sh = Dedup.shingleIndex(Dedup.corpusNear(spark, dir), 3).cache()
    def toMap(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val agg = toMap(Dedup.minhashSignatures(sh, 48))
    val kern = toMap(Dedup.minhashSignaturesKernel(sh, 48))
    assert(agg.nonEmpty)
    assert(agg === kern,
      "O(numHashes)-state aggregator must reproduce collect-then-kernel")
    sh.unpersist()
  }

  test("simhash token-array kernel is bit-compatible with xxhash64") {
    // the per-row kernel hashes tokens internally; it must equal the
    // explicit explode → xxhash64 → collect_list → kernel pipeline,
    // which pins the internal hash to Spark's xxhash64 bit-for-bit
    val corpus = Dedup.corpusNear(spark, dir)
    val perRow = Dedup.simhashFingerprints(corpus).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val explicit = corpus
      .select(col("doc_id"),
        explode(graft.functions.TextFunctions.tokens(col("text"))).as("t"))
      .select(col("doc_id"), xxhash64(col("t")).as("h"))
      .groupBy("doc_id").agg(collect_list(col("h")).as("hs"))
      .select(col("doc_id"),
        graft.functions.SimHashFingerprint.fp(spark, col("hs")).as("fp"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(perRow.nonEmpty)
    assert(perRow === explicit)
  }

  test("lm buckets cut the corpus into three near-equal tiers") {
    val out = TextAnalysis.qLmBuckets(spark, dir).collect()
    val sizes = out.groupBy(_.getString(1))
      .view.mapValues(_.map(_.getLong(2)).sum).toMap
    assert(sizes.keySet === Set("head", "middle", "tail"))
    val total = sizes.values.sum
    val nDocs = spark.read.parquet(s"$dir/documents.parquet").count()
    assert(total === nDocs, "every document lands in exactly one tier")
    // ntile cuts: tier sizes differ by at most one document
    assert(sizes.values.max - sizes.values.min <= 1,
      s"tiers must be balanced, got $sizes")
  }

  test("dsir importance weights rank the target slice above the rest") {
    val rows = TextAnalysis.qDsirWeights(spark, dir).collect()
      .map(r => (r.getString(1), r.getDouble(2), r.getBoolean(3)))
    val (tgt, rest) = rows.partition(_._1 == TextAnalysis.DsirTargetLang)
    assert(tgt.nonEmpty && rest.nonEmpty)
    def mean(xs: Array[(String, Double, Boolean)]) =
      xs.map(_._2).sum / xs.length
    // the target model is trained ON the target slice: its docs must
    // out-score the rest-of-corpus on average, or the weighting is inert
    assert(mean(tgt) > mean(rest),
      s"target mean ${mean(tgt)} must exceed rest mean ${mean(rest)}")
    // selection is exactly the positive-logratio rule
    rows.foreach { case (_, s, sel) => assert(sel === (s > 0)) }
    // no persisted-RDD leak from the shared tf frame
    assert(spark.sparkContext.getPersistentRDDs.values
      .filterNot(_.isCheckpointed).isEmpty)
  }

  test("md5 simhash kernel matches the hex-nibble definition the " +
    "DuckDB oracle uses") {
    // independent recomputation straight from the md5 HEX STRING (the
    // form the oracle SQL derives bits from), vs the kernel's
    // first-4-digest-bytes big-endian packing — pins the two
    // conventions to each other
    val corpus = Dedup.corpusNear(spark, dir)
    val kernel = Dedup.simhashMd5Fingerprints(corpus).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val docs = corpus.select("doc_id", "text").collect()
      .map(r => r.getLong(0) ->
        r.getString(1).trim.split("\\s+").filter(_.nonEmpty).toSeq)
      .filter(_._2.nonEmpty)
    val hexDigits = "0123456789abcdef"
    val expected = docs.map { case (id, toks) =>
      val counts = new Array[Int](32)
      toks.foreach { t =>
        val hex = java.security.MessageDigest.getInstance("MD5")
          .digest(t.getBytes("UTF-8"))
          .map(b => f"$b%02x").mkString.substring(0, 8)
        for (k <- 0 until 8; j <- 3 to 0 by -1) {
          val nib = hexDigits.indexOf(hex(k))
          val p = k * 4 + (3 - j)
          if (((nib >> j) & 1) == 1) counts(31 - p) += 1
          else counts(31 - p) -= 1
        }
      }
      id -> (0 until 32).map(b =>
        if (counts(b) > 0) 1L << b else 0L).sum
    }.toMap
    assert(kernel.nonEmpty)
    assert(kernel === expected)
  }

  test("simhash banding equals brute-force hamming <= 3") {
    val fps = Dedup.simhashFingerprints(Dedup.corpusNear(spark, dir)).cache()
    val banded = Dedup.simhashPairs(fps, 3)
      .select("id_a", "id_b", "hamming").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val all = fps.collect().map(r => (r.getLong(0), r.getLong(1)))
    val brute = (for {
      (ia, fa) <- all; (ib, fb) <- all if ia < ib
      h = java.lang.Long.bitCount(fa ^ fb) if h <= 3
    } yield (ia, ib, h)).toSet
    assert(banded === brute)
    assert(brute.nonEmpty, "corpus with near-copies must yield pairs")
    fps.unpersist()
  }

  test("embedding near-dup finds exactly the injected copies") {
    val got = Similarity.qDedupEmbedding(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    // copies exist for vec_id % 7 == 0 (ids 0..499 → 72 copies)
    assert(got.length === 72)
    assert(got.forall { case (a, b) => b === a + 1000000L })
  }

  test("symspell deletion blocking equals length-blocked editdist") {
    val sym = graft.operators.Dedup.editDistancePairsDeletes(
      graft.Tables.part(spark, dir).select("p_partkey", "p_name", "p_brand"),
      "p_partkey", "p_name", Seq("p_brand"), 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val blocked = Dedup.qDedupEditDistance(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(blocked.nonEmpty, "fixture must yield pairs (19 at sf0.001)")
    assert(sym === blocked,
      "deletion-neighborhood candidates must verify to the exact pair set")
  }

  test("shingle df cap: no-op at default cap, drops hot shingles at cap 1") {
    val sh = Dedup.shingleIndex(Dedup.corpusNear(spark, dir), 3).cache()
    val total = sh.count()
    // default cap is a no-op on the fixture: left_anti can only remove
    // rows, so equal counts ⇒ identical index ⇒ identical pair output
    assert(Dedup.capDocFrequency(sh, Dedup.ShingleDfCap).count() === total)
    // a cap of 1 must drop the shared trigrams the near-copies create
    val capped1 = Dedup.capDocFrequency(sh, 1).count()
    assert(capped1 < total, s"cap 1 kept all $total rows")
    sh.unpersist()
  }

  test("source overlap estimates are sane and self-consistent") {
    val got = TextAnalysis.qSourceOverlap(spark, dir).collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val est = r.getDouble(2)
      assert(est >= 0.0 && est <= 1.0, s"estimate $est out of range")
    }
    // deterministic: same sketches, same estimates
    val again = TextAnalysis.qSourceOverlap(spark, dir).collect()
    assert(got.map(_.toSeq).toSeq === again.map(_.toSeq).toSeq)
  }

  test("embedding lsh near-dup equals brute-force all-pairs") {
    val base = graft.Tables.embeddings(spark, dir)
      .select("vec_id", "embedding")
    val corpus = base.unionByName(
      base.filter(col("vec_id") % 7 === 0)
        .select((col("vec_id") + 1000000L).as("vec_id"), col("embedding")))
      .cache()
    val lsh = Similarity.embeddingNearDupPairs(corpus, 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val a = corpus.toDF("id_a", "va")
    val b = corpus.toDF("id_b", "vb")
    val brute = a.join(b, col("id_a") < col("id_b"))
      .filter(graft.functions.CosineSimilarity
        .cosineNative(spark, col("va"), col("vb")) >= 0.9)
      .select("id_a", "id_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(brute.nonEmpty)
    assert(lsh === brute,
      "exact copies collide in every table, so LSH recall is 1 here")
    corpus.unpersist()
  }

  test("lsh bucketing plans as a pure scan-side map — zero exchanges") {
    val emb = graft.Tables.embeddings(spark, dir)
    val plan = Similarity.lshBuckets(emb, 16, 6)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"bucketing must not shuffle:\n${plan.take(2000)}")
  }

  test("ann lsh is a subset of brute force; duplicate neighbors always found") {
    val emb = graft.Tables.embeddings(spark, dir)
    // corpus with exact copies: the copy is the true top-1 of each query
    val corpus = emb.select("vec_id", "embedding").unionByName(
      emb.filter(col("vec_id") % 40 === 0)
        .select((col("vec_id") + 1000000L).as("vec_id"), col("embedding")))
    val ann = Similarity
      .annKnn(corpus, col("vec_id") % 40 === 0 && col("vec_id") < 1000000, 5)
      .cache()
    val top1 = ann.filter(col("rnk") === 1).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toMap
    val queries = emb.filter(col("vec_id") % 40 === 0)
      .select("vec_id").collect().map(_.getLong(0))
    queries.foreach { q =>
      assert(top1.get(q).contains(q + 1000000L),
        s"query $q: exact copy must be rank-1 (colliding in every table)")
    }
    // and ann results are drawn from the true candidate set: spot-check
    // that every (query, neighbor) is a real vector pair with sim computed
    assert(ann.filter(col("rnk") > 5).count() === 0)
    ann.unpersist()
  }

  test("ann lsh recall@5 against brute force is usable on natural data") {
    val emb = graft.Tables.embeddings(spark, dir)
    val qf = col("vec_id") % 40 === 0
    val brute = Similarity.bruteForceKnn(emb, emb.filter(qf), 5)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val ann = Similarity.annKnn(emb, qf, 5)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (ann & brute).size.toDouble / brute.size
    // natural top-5 sims here are ~0.3-0.5 — hard regime for LSH (theory
    // ~0.5 at 16 tables × 6 bits); this bound is a regression floor
    assert(recall >= 0.35, s"recall@5 $recall")
  }

  test("cluster-balanced sample caps dense cells, keeps sparse whole") {
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val out = Similarity
      .clusterBalancedSample(emb, nlist = 16, perCell = 25)
      .collect().map(r =>
        (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3)))
    assert(out.length === emb.count(), "every vector gets annotated")
    val byCell = out.groupBy(_._2)
    byCell.foreach { case (cell, rows) =>
      val kept = rows.count(_._4 == 1)
      assert(kept === math.min(25, rows.length),
        s"cell $cell keeps min(perCell, size)")
      // ranks are a permutation of 1..size within the cell
      assert(rows.map(_._3).sorted.toSeq === (1 to rows.length),
        s"cell $cell ranks")
    }
    // selection genuinely bites somewhere and every cell is represented
    assert(out.count(_._4 == 1) < out.length, "cap must bite")
    assert(byCell.keySet === out.filter(_._4 == 1).map(_._2).toSet,
      "every non-empty cell survives into the sample")
    // deterministic: a second build reproduces the exact annotation
    val again = Similarity
      .clusterBalancedSample(emb, nlist = 16, perCell = 25)
      .collect().map(r =>
        (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3)))
    assert(again.sortBy(_._1).toSeq === out.sortBy(_._1).toSeq)
  }

  test("ivf ann: exact-copy neighbors are always rank-1") {
    val emb = graft.Tables.embeddings(spark, dir)
    val corpus = emb.select("vec_id", "embedding").unionByName(
      emb.filter(col("vec_id") % 40 === 0)
        .select((col("vec_id") + 1000000L).as("vec_id"), col("embedding")))
    val ivf = Similarity.ivfKnn(corpus,
      col("vec_id") % 40 === 0 && col("vec_id") < 1000000, 5)
    val top1 = ivf.filter(col("rnk") === 1).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toMap
    val queries = emb.filter(col("vec_id") % 40 === 0)
      .select("vec_id").collect().map(_.getLong(0))
    queries.foreach { q =>
      // an identical embedding assigns to the same cell, and a query's
      // own cell is always its first probe → the copy cannot be missed
      assert(top1.get(q).contains(q + 1000000L),
        s"query $q: exact copy must be rank-1")
    }
  }

  test("ivf ann recall@5 floor; more probes never lose recall") {
    val emb = graft.Tables.embeddings(spark, dir)
    val qf = col("vec_id") % 40 === 0
    val brute = Similarity.bruteForceKnn(emb, emb.filter(qf), 5)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    def recall(nprobe: Int): Double = {
      val got = Similarity.ivfKnn(emb, qf, 5, nlist = 16, nprobe = nprobe)
        .select("query_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      (got & brute).size.toDouble / brute.size
    }
    val r4 = recall(4)
    // measured 0.585 at the default nprobe=4/nlist=16 on this fixture's
    // natural low-similarity regime (~0.3-0.5 top-5 sims)
    assert(r4 >= 0.5, s"recall@5 $r4 at nprobe=4")
    // top-8 probe cells are a superset of top-4 → candidates grow
    // monotonically, and exact-cosine ranking can only improve
    val r8 = recall(8)
    assert(r8 >= r4, s"recall fell with more probes: $r4 -> $r8")
  }

  test("pq-adc with exact re-rank: recall floor, a deeper shortlist " +
    "never loses recall, and codes are m small ints") {
    val emb = graft.Tables.embeddings(spark, dir)
    val qf = col("vec_id") % 40 === 0
    val brute = Similarity.bruteForceKnn(emb, emb.filter(qf), 5)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    def recall(rerank: Int): Double = {
      val got = Similarity.pqKnn(emb, qf, 5, rerank = rerank)
        .select("query_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      (got & brute).size.toDouble / brute.size
    }
    val r8 = recall(8)
    // measured 0.877 at m=8/64 codewords/rerank=8 on this fixture
    assert(r8 >= 0.7, s"pq recall@5 $r8 at rerank=8")
    // a deeper ADC shortlist is a superset; exact re-ranking can only
    // improve on it
    assert(recall(16) >= r8)
    // the index really is compressed: m codes per vector, each within
    // the codebook range
    val books = Similarity.pqTrain(emb, 8, 64)
    val codes = Similarity.pqEncode(emb, books)
      .select("codes").collect().map(_.getSeq[Int](0))
    assert(codes.forall(c => c.length == 8 && c.forall(x =>
      x >= 0 && x < 64)))
  }

  test("ivf-pq composite: recall floor, and the PQ stage loses little " +
    "over plain ivf's candidate set") {
    val emb = graft.Tables.embeddings(spark, dir)
    val qf = col("vec_id") % 40 === 0
    val brute = Similarity.bruteForceKnn(emb, emb.filter(qf), 5)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    def recallOf(df: org.apache.spark.sql.DataFrame): Double = {
      val got = df.select("query_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      (got & brute).size.toDouble / brute.size
    }
    val rIvfPq = recallOf(Similarity.ivfPqKnn(emb, qf, 5))
    val rIvf = recallOf(Similarity.ivfKnn(emb, qf, 5))
    // ivf ranks the SAME probed-cell candidate set exactly, so its
    // recall is ivf-pq's structural ceiling; residual-space codes plus
    // the 16k-deep ADC shortlist reach that ceiling on the fixture
    // (sf0.01 ledger: both 0.60)
    assert(rIvfPq >= 0.45, s"ivf-pq recall@5 $rIvfPq")
    assert(rIvfPq >= rIvf - 0.05,
      s"residual ADC shortlist must cover ivf's exact ranking of the " +
        s"shared candidate set: $rIvfPq vs $rIvf")
    // the composite's escape from that shared ceiling: its per-survivor
    // cost is m byte-lookups, not d float multiplies, so it affords a
    // BIGGER probe budget in the same cost envelope — at nprobe 8
    // (~1/16 of ivf@4's scanned bytes) it must beat plain ivf@4, which
    // is exactly how the registered q_knn_ann_ivfpq row is configured
    val rIvfPq8 = recallOf(Similarity.ivfPqKnn(emb, qf, 5, nprobe = 8))
    assert(rIvfPq8 > rIvf,
      s"ivfpq@8 must beat ivf@4: $rIvfPq8 vs $rIvf")
  }

  test("opq rotation: orthogonal by construction; opq+ivfpq beats plain " +
    "ivfpq at equal (m, nprobe); opq-pq never loses to pq") {
    val emb = graft.Tables.embeddings(spark, dir)
    val qf = col("vec_id") % 40 === 0
    // the rotation is a real orthogonal matrix — RᵀR = I to solver
    // tolerance (the Procrustes step returns U·Vᵀ of an SVD, and the
    // rank-deficiency completion is Gram–Schmidt-orthonormal)
    val r = Similarity.opqRotation(emb, 8, 64)
    val d = r.length
    for (i <- 0 until d; j <- i until d) {
      val dot = (0 until d).map(t => r(t)(i) * r(t)(j)).sum
      val want = if (i == j) 1.0 else 0.0
      assert(math.abs(dot - want) < 1e-8,
        s"RtR[$i][$j] = $dot, want $want")
    }
    val brute = Similarity.bruteForceKnn(emb, emb.filter(qf), 5)
      .select("query_id", "neighbor_id").collect()
      .map(r2 => (r2.getLong(0), r2.getLong(1))).toSet
    def recallOf(df: org.apache.spark.sql.DataFrame): Double = {
      val got = df.select("query_id", "neighbor_id").collect()
        .map(r2 => (r2.getLong(0), r2.getLong(1))).toSet
      (got & brute).size.toDouble / brute.size
    }
    // the fixture embeddings are near-ISOTROPIC (component variances
    // within ~1.3× of each other, cross-correlations ≈ 0 — measured in
    // DuckDB), so in RAW space a variance-balancing rotation has
    // nothing to balance and opq-pq's honest outcome is a tie with pq
    // (sf0.01 ledger: both 0.8769). The anisotropy OPQ exists for
    // lives in the IVF RESIDUAL space, where the composite must win
    // strictly at equal (m, nprobe) — the registered-row configuration.
    val rPq = recallOf(Similarity.pqKnn(emb, qf, 5))
    val rOpqPq = recallOf(Similarity.opqPqKnn(emb, qf, 5))
    assert(rOpqPq >= rPq, s"opq-pq must not lose to pq: $rOpqPq vs $rPq")
    val rIvfPq8 = recallOf(Similarity.ivfPqKnn(emb, qf, 5, nprobe = 8))
    val rOpqIvfPq8 =
      recallOf(Similarity.opqIvfPqKnn(emb, qf, 5, nprobe = 8))
    assert(rOpqIvfPq8 > rIvfPq8,
      s"opq+ivfpq@8 must beat ivfpq@8: $rOpqIvfPq8 vs $rIvfPq8")
  }

  test("over-cap ANN query batches serve in chunks with results " +
    "identical to one pass (pq and ivf-pq)") {
    val emb = graft.Tables.embeddings(spark, dir)
      .select("vec_id", "embedding")
    val qf = col("vec_id") % 40 === 0
    def triples(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "rnk", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    // cap=3 forces ~n/120 chunks; per-query independence makes the
    // union bit-identical to the single-broadcast pass
    val pqOne = triples(Similarity.pqKnn(emb, qf, 5))
    val pqChunked = triples(Similarity.pqKnn(emb, qf, 5, queryBatchCap = 3))
    assert(pqOne.nonEmpty)
    assert(pqChunked === pqOne)
    val ivfpqOne = triples(Similarity.ivfPqKnn(emb, qf, 5))
    val ivfpqChunked = triples(
      Similarity.ivfPqKnn(emb, qf, 5, queryBatchCap = 3))
    assert(ivfpqChunked === ivfpqOne)
  }

  test("ivf sampled build holds recall at a fraction of the train set") {
    val emb = graft.Tables.embeddings(spark, dir)
    val qf = col("vec_id") % 40 === 0
    val brute = Similarity.bruteForceKnn(emb, emb.filter(qf), 5)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    def recall(cap: Int): Double = {
      val got = Similarity
        .ivfKnn(emb, qf, 5, nlist = 16, nprobe = 4, sampleCap = cap)
        .select("query_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      (got & brute).size.toDouble / brute.size
    }
    val full = recall(0)
    // train Lloyd on ~1/4 of the fixture corpus: seeds are identical (a
    // hash-prefix sample contains the nlist smallest hashes), so only
    // the refinement votes change — recall must stay in the full
    // build's neighborhood, not collapse
    val sampled = recall(128)
    assert(sampled >= full - 0.1,
      s"sampled-build recall $sampled collapsed vs full $full")
    // determinism: same cap, same result set
    assert(recall(128) === sampled)
  }

  test("paper-faithful span scrub also strips within-document repeats") {
    import spark.implicits._
    // "a b c" repeats WITHIN doc 1 only; no gram is shared across docs
    val docs = Seq(
      (1L, "a b c x y a b c z w"),
      (2L, "p q r s t u v")).toDF("doc_id", "text")
    def run(withinDoc: Boolean): Map[Long, (Long, String)] =
      Dedup.duplicatedSpanScrub(docs, 3, withinDoc).collect()
        .map(r => r.getLong(0) -> (r.getLong(2), r.getString(3))).toMap
    // default (distinct-doc df) rule: nothing qualifies, both intact
    val dfRule = run(withinDoc = false)
    assert(dfRule(1L) === ((0L, "a b c x y a b c z w")))
    assert(dfRule(2L) === ((0L, "p q r s t u v")))
    // Lee-et-al rule: both occurrences of the self-repeated gram go
    // (positions 1-3 and 6-8), the unique doc is untouched
    val paper = run(withinDoc = true)
    assert(paper(1L) === ((6L, "x y z w")))
    assert(paper(2L) === ((0L, "p q r s t u v")))
  }

  test("duplicated-span scrub equals a driver-side brute-force recount") {
    val n = Dedup.SpanN
    val got = Dedup.qDedupSpans(spark, dir).collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getString(3))).toMap
    val docs = Tables.documents(spark, dir)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) ->
        r.getString(1).trim.split("\\s+").filter(_.nonEmpty).toSeq)
    // brute force: grams per doc with start positions, df over distinct
    // docs, union of covered positions, filter tokens by position
    val gramDocs = docs.flatMap { case (id, ts) =>
      ts.sliding(n).filter(_.length == n).map(_.mkString(" "))
        .toSet[String].map(g => (g, id))
    }
    val hot = gramDocs.groupBy(_._1).filter(_._2.map(_._2).distinct.length >= 2)
      .keySet
    assert(got.keySet === docs.map(_._1).toSet)
    docs.foreach { case (id, ts) =>
      val covered = ts.sliding(n).zipWithIndex
        .filter { case (w, _) => w.length == n && hot(w.mkString(" ")) }
        .flatMap { case (_, i) => i until i + n }
        .toSet
      val clean = ts.zipWithIndex.filterNot(t => covered(t._2)).map(_._1)
      val (nTok, nRm, text) = got(id)
      assert(nTok === ts.length.toLong, s"doc $id token count")
      assert(nRm === covered.size.toLong, s"doc $id removed count")
      assert(text === clean.mkString(" "), s"doc $id clean text")
    }
    // the op must bite without nuking the corpus: some docs scrubbed,
    // some untouched, and the injected full duplicates scrub to empty
    assert(got.values.exists(_._2 > 0) && got.values.exists(_._2 == 0L))
  }

  test("curation via minhash equals curation via exact jaccard") {
    // sf0.01: the near-dup stage is known non-vacuous there (500→419→399)
    val d01 = "/root/testdata/sf0.01"
    val exact = graft.operators.Curation.qCorpusCuration(spark, d01)
      .collect().map(_.toSeq).toSeq
    val mh = graft.operators.Curation.qCorpusCurationMinhash(spark, d01)
      .collect().map(_.toSeq).toSeq
    assert(exact.nonEmpty)
    assert(mh === exact,
      "banding recall ~1 at j>=0.8 must reproduce the exact pipeline")
  }

  test("shingle-fps kernel equals the HOF array_distinct+xxhash64 chain") {
    // the fused codegen'd kernel must be bit-compatible with the
    // composed definition it replaced inside shingleIndex
    import graft.functions.{ShingleFps, TextFunctions}
    val docs = Tables.documents(spark, dir).select("doc_id", "text")
      .limit(200)
      .select(col("doc_id"), TextFunctions.tokens(col("text")).as("toks"))
    for (n <- Seq(1, 3, 5)) {
      val kernel = docs.select(col("doc_id"),
          explode(ShingleFps.fps(spark, col("toks"), n)).as("h"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val hof = docs.select(col("doc_id"),
          explode(array_distinct(
            TextFunctions.shinglesFromTokens(col("toks"), n))).as("g"))
        .select(col("doc_id"), xxhash64(col("g")).as("h"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(kernel === hof, s"n=$n")
      assert(kernel.nonEmpty, s"n=$n must produce shingles")
    }
    // short-doc guard: fewer tokens than n → empty, never throws
    import spark.implicits._
    val tiny = Seq((1L, "only two")).toDF("doc_id", "text")
      .select(col("doc_id"), TextFunctions.tokens(col("text")).as("toks"))
    assert(tiny.select(explode(ShingleFps.fps(spark, col("toks"), 3)))
      .count() === 0)
  }

  test("charShingles: empty for short text, sliding n-grams otherwise") {
    import spark.implicits._
    val got = Seq("ab", "abcd").toDF("t")
      .select(graft.functions.TextFunctions.charShingles(col("t"), 3).as("g"))
      .collect().map(_.getSeq[String](0))
    assert(got(0) === Seq.empty,
      "text shorter than n must shingle to [], not [1,0]-artifacts")
    assert(got(1) === Seq("abc", "bcd"))
  }

  test("length histogram: shares sum to 1 per language, counts conserve") {
    val rows = TextAnalysis.qLengthHistogram(spark, dir)
      .collect().map(r =>
        (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(rows.nonEmpty)
    val perLang = rows.groupBy(_._1)
    perLang.foreach { case (lang, bs) =>
      assert(math.abs(bs.map(_._4).sum - 1.0) < 0.002,
        s"$lang shares must sum to ~1 (4dp rounding tolerance)")
      assert(bs.forall(_._2 >= 0L), s"$lang bucket indexes non-negative")
    }
    assert(rows.map(_._3).sum ===
      graft.Tables.documents(spark, dir).count(), "every doc binned once")
  }

  test("text stats ratios are in range and tokens positive") {
    val got = TextAnalysis.qTextStats(spark, dir).cache()
    assert(got.filter(col("n_tokens") <= 0).count() === 0)
    Seq("punct_ratio", "stopword_ratio", "digit_ratio").foreach { c =>
      assert(got.filter(col(c) < 0 || col(c) > 1).count() === 0, c)
    }
    got.unpersist()
  }

  test("lang id predicts a known label and is deterministic") {
    val got = TextAnalysis.qLangId(spark, dir)
    val langs = got.select("pred_lang").distinct().collect()
      .map(_.getString(0)).toSet
    assert(langs.subsetOf(Set("en", "de", "es", "fr", "zh", "und")))
    val again = TextAnalysis.qLangId(spark, dir).collect()
    assert(got.collect().toSeq === again.toSeq)
  }

  test("cross-corpus matches equal cross-restricted self-join pairs") {
    // the asymmetric batch-vs-corpus matcher must find exactly the
    // cross pairs the symmetric pair finder would on the unioned corpus
    val base = Tables.documents(spark, dir).select("doc_id", "text")
    val batch = base.filter(col("doc_id") % 3 === 0)
      .select((col("doc_id") + 2000000L).as("doc_id"),
        when(col("doc_id") % 2 === 0, substring(col("text"), 21, 1000000))
          .otherwise(substring(col("text"), 1, 80)).as("text"))
    val shOld = Dedup.shingleIndex(base, 3).persist()
    val shNew = Dedup.shingleIndex(batch, 3).persist()
    val cross = Dedup.crossJaccardMatches(shNew, shOld, 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val viaSelf = Dedup
      .jaccardPairs(shOld.unionByName(shNew), 0.5)
      .filter(col("id_a") < 2000000L && col("id_b") >= 2000000L)
      .collect().map(r => (r.getLong(1), r.getLong(0))).toSet
    shOld.unpersist(); shNew.unpersist()
    assert(cross === viaSelf)
    assert(cross.nonEmpty, "rejected batch docs must exist")
    // admitted docs must exist too (bimodal fixture, see qIncrementalDedup)
    val admitted = Dedup.qIncrementalDedup(spark, dir).count()
    assert(admitted > 0)
  }

  test("tokenPmi matches a driver-side recount and ranks correlation") {
    import spark.implicits._
    // 8 docs: x and y always co-occur (4 docs), p and q never, z alone
    val docs = Seq(
      (1L, "x y"), (2L, "x y"), (3L, "x y z"), (4L, "x y"),
      (5L, "p z"), (6L, "q z"), (7L, "p z"), (8L, "q p")
    ).toDF("doc_id", "text")
    val got = TextAnalysis.tokenPmi(docs, 1L)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getDouble(3)))).toMap
    // brute force over the same corpus
    val sets = Map(1L -> Set("x", "y"), 2L -> Set("x", "y"),
      3L -> Set("x", "y", "z"), 4L -> Set("x", "y"),
      5L -> Set("p", "z"), 6L -> Set("q", "z"), 7L -> Set("p", "z"),
      8L -> Set("q", "p"))
    val n = sets.size.toDouble
    val cx = sets.values.flatten.groupBy(identity).view
      .mapValues(_.size).toMap
    val want = (for {
      t1 <- cx.keys; t2 <- cx.keys if t1 < t2
      cxy = sets.values.count(s => s(t1) && s(t2)) if cxy >= 1
    } yield (t1, t2) -> ((cxy.toLong, BigDecimal(
      math.log(cxy * n / (cx(t1) * cx(t2))))
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble))).toMap
    assert(got === want)
    // perfectly-correlated (x,y) must outrank the never-pair's absence
    // and any cross pair: pmi(x,y) = ln(8·4/(4·4)) = ln 2
    assert(math.abs(got(("x", "y"))._2 - math.log(2.0)) < 1e-4)
    assert(got(("x", "y"))._2 > got(("x", "z"))._2,
      "correlated pair must outrank the incidental one")
  }

  test("line dedup: keep-first across docs, within docs, ragged tails") {
    import spark.implicits._
    def seg(p: String) = (1 to 8).map(p + _).mkString(" ")
    val a = seg("a"); val b = seg("b"); val c = seg("c")
    val docs = Seq(
      (1L, s"$a $b"),            // first user of a and b: keeps both
      (2L, s"$a $c"),            // a drops (doc 1 owns it), c survives
      (3L, s"$b $b"),            // cross-doc dup AND within-doc repeat
      (4L, "t1 t2 t3"),          // ragged 3-token tail segment
      (5L, "")                   // empty doc must still appear
    ).toDF("doc_id", "text")
    val got = Dedup.lineDedup(docs, 8).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(got(1L) === ((2L, 0L, s"$a $b")))
    assert(got(2L) === ((2L, 1L, c)))
    assert(got(3L) === ((2L, 2L, "")), "both b copies lose to doc 1's")
    assert(got(4L) === ((1L, 0L, "t1 t2 t3")))
    assert(got(5L) === ((0L, 0L, "")))
  }

  test("line dedup on the copy corpus: copies lose everything to originals") {
    val got = Dedup.qLineDedup(spark, dir).cache()
    assert(got.count() === 600)
    // every injected copy shares every segment with its (smaller-id)
    // original, so keep-first scrubs it whole
    val copies = got.filter(col("doc_id") >= 1000000)
    assert(copies.count() === 100)
    assert(copies.filter(col("clean_text") =!= "" ||
      col("n_dropped") =!= col("n_segs")).count() === 0)
    // conservation: exactly one survivor per distinct segment string
    val kept = got.agg(sum(col("n_segs") - col("n_dropped")))
      .head.getLong(0)
    import spark.implicits._
    val distinctSegs = Dedup.corpusExact(spark, dir)
      .select(col("doc_id"), col("text"))
      .as[(Long, String)].flatMap { case (_, t) =>
        t.split("\\s+").filter(_.nonEmpty).grouped(8).map(_.mkString(" "))
      }.distinct().count()
    assert(kept === distinctSegs)
    got.unpersist()
  }

  test("bitext margin mining matches a naive driver-side computation") {
    val emb = graft.Tables.embeddings(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    def cos(u: Array[Float], v: Array[Float]): Double = {
      var d = 0.0; var nu = 0.0; var nv = 0.0; var i = 0
      while (i < u.length) {
        d += u(i).toDouble * v(i); nu += u(i).toDouble * u(i)
        nv += v(i).toDouble * v(i); i += 1
      }
      d / (math.sqrt(nu) * math.sqrt(nv))
    }
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    def r4(x: Double) =
      BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    val xs = emb.keys.filter(_ % 2 == 0).toSeq.sorted
    val ys = emb.keys.filter(_ % 2 == 1).toSeq.sorted
    val sim = (for (x <- xs; y <- ys)
      yield (x, y) -> r6(cos(emb(x), emb(y)))).toMap
    def topk(sims: Seq[(Long, Double)], k: Int): Seq[Double] =
      sims.sortBy { case (id, s) => (-s, id) }.take(k).map(_._2)
    val mx = xs.map(x =>
      x -> topk(ys.map(y => y -> sim((x, y))), Similarity.BitextK)).toMap
    val my = ys.map(y =>
      y -> topk(xs.map(x => x -> sim((x, y))), Similarity.BitextK)).toMap
    val want = (for {
      x <- xs
      bestY = ys.minBy(y => (-sim((x, y)), y))
      bestX = xs.minBy(x2 => (-sim((x2, bestY)), x2)) if bestX == x
      margin = r4(sim((x, bestY)) /
        ((mx(x).sum / mx(x).size + my(bestY).sum / my(bestY).size) / 2))
    } yield (x, bestY, margin,
      if (margin >= Similarity.BitextMargin) 1 else 0)).toSet
    val got = Similarity.qBitextMargin(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
      .toSet
    assert(got === want)
    assert(got.nonEmpty)
    assert(got.map(_._1).size === got.size, "each x mined at most once")
  }

  private def refBpe(
      words: Map[String, Long], n: Int): Seq[(Int, String, String, Long)] = {
    def applyMerge(
        syms: Vector[String], a: String, b: String): Vector[String] =
      syms.foldLeft(Vector.empty[String]) { (acc, x) =>
        if (acc.nonEmpty && acc.last == a && x == b) acc.init :+ (a + b)
        else acc :+ x
      }
    var vocab = words.toSeq.map { case (w, f) =>
      (w.split("").filter(_.nonEmpty).toVector, f)
    }
    val out = scala.collection.mutable.ArrayBuffer
      .empty[(Int, String, String, Long)]
    var rank = 1
    var done = false
    while (rank <= n && !done) {
      val counts = vocab.flatMap { case (syms, f) =>
        syms.sliding(2).collect { case Seq(a, b) => (a, b) -> f }
      }.groupMapReduce(_._1)(_._2)(_ + _)
      if (counts.isEmpty) done = true
      else {
        val ((a, b), c) = counts.minBy { case ((a, b), c) => (-c, a, b) }
        out += ((rank, a, b, c))
        vocab = vocab.map { case (syms, f) => (applyMerge(syms, a, b), f) }
        rank += 1
      }
    }
    out.toSeq
  }

  test("bpe merges: hand corpus with overlap runs and tie-breaks") {
    import spark.implicits._
    // freq: "aaaa"×3, "abab"×2, "cd"×2 — (a,a) counts overlapping
    // positions (3 per word) but merges non-overlapping (2 per word)
    val docs = Seq(
      (1L, "aaaa abab cd"), (2L, "aaaa abab cd"), (3L, "aaaa")
    ).toDF("doc_id", "text")
    val got = TextAnalysis.bpeLearn(docs, 4).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
      .toSeq
    val want = refBpe(Map("aaaa" -> 3L, "abab" -> 2L, "cd" -> 2L), 4)
    assert(got === want)
    // iteration 1 must be (a,a) with overlapping count 9 (3 words × 3)
    assert(got.head === ((1, "a", "a", 9L)))
    // after merging, "aaaa" = [aa, aa] so (aa, aa) carries 3
    assert(got.exists { case (_, a, b, c) => a == "aa" && b == "aa" && c == 3L })
  }

  test("batched bpe trainer replays the sequential merge sequence " +
    "exactly, on interaction-heavy and batch-friendly corpora") {
    import spark.implicits._
    def compare(docs: org.apache.spark.sql.DataFrame, n: Int): Unit = {
      val vocab0 = TextAnalysis.bpeWordVocab(docs)
      val (ms, vs) = TextAnalysis.bpeVocabLoopSequential(vocab0, n)
      val (mb, vb) = TextAnalysis.bpeVocabLoopBatched(vocab0, n)
      assert(mb === ms)
      def segs(v: org.apache.spark.sql.DataFrame) =
        v.select("w", "syms").as[(String, Seq[String])].collect().toMap
      assert(segs(vb) === segs(vs))
      // the driver-local trainer (the under-cap regime bpeLearn/
      // bpeEncode actually take on these vocabularies) replays the
      // same sequence and final segmentation too
      val (ml, vl) = TextAnalysis.bpeVocabLoopLocal(vocab0, n)
      assert(ml === ms)
      assert(segs(vl) === segs(vs))
    }
    // interaction-heavy: overlapping pairs + created-pair dominance
    // ((aa,aa) is born mid-sequence) — batching must stop early and
    // still replay the exact sequence
    compare(Seq((1L, "aaaa abab cd"), (2L, "aaaa abab cd"), (3L, "aaaa"))
      .toDF("doc_id", "text"), 6)
    // batch-friendly: 13 equal-count symbol-disjoint pairs with no
    // trigrams (newbound 0) — one pass takes them all, then exhaustion
    compare(Seq.tabulate(40)(i =>
      (i.toLong, "ab cd ef gh ij kl mn op qr st uv wx yz"))
      .toDF("doc_id", "text"), 20)
  }

  test("bpe merges on the fixture equal the driver-side reference") {
    import spark.implicits._
    val words = graft.Tables.documents(spark, dir)
      .select(explode(split(trim(col("text")), "\\s+")).as("w"))
      .filter(col("w") =!= "")
      .groupBy("w").count()
      .as[(String, Long)].collect().toMap
    val want = refBpe(words, TextAnalysis.BpeMerges)
    val got = TextAnalysis.qBpeMerges(spark, dir).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
      .toSeq
    assert(got === want)
    assert(got.size === TextAnalysis.BpeMerges)
    // the learned table must contain at least one composed (multi-char)
    // merge, i.e. iteration genuinely feeds forward
    assert(got.exists { case (_, a, b, _) => a.length > 1 || b.length > 1 })
  }

  test("bpe encode: token counts bounded by chars and words, and compress") {
    val got = TextAnalysis.qBpeEncode(spark, dir).cache()
    assert(got.count() === 500)
    // chars >= bpe tokens >= words for every doc, strictly fewer tokens
    // than chars overall (10 merges must compress a natural corpus)
    assert(got.filter(col("n_bpe_tokens") > col("n_chars") ||
      col("n_bpe_tokens") < col("n_words")).count() === 0)
    val totals = got.agg(sum("n_chars"), sum("n_bpe_tokens")).head
    assert(totals.getLong(1) < totals.getLong(0))
    // conservation against the raw corpus: summed word chars match
    val rawChars = graft.Tables.documents(spark, dir)
      .select(explode(split(trim(col("text")), "\\s+")).as("w"))
      .filter(col("w") =!= "")
      .agg(sum(length(col("w")))).head.getLong(0)
    assert(got.agg(sum("n_chars")).head.getLong(0) === rawChars)
    got.unpersist()
  }

  test("ann bitext mining: mined pairs track the exact form at a recall floor") {
    val exact = Similarity.qBitextMargin(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ann = Similarity.bitextMarginMineAnn(
      graft.Tables.embeddings(spark, dir),
      Similarity.BitextK, Similarity.BitextMargin)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(ann.map(_._1).distinct.length === ann.length,
      "each x mined at most once")
    val annSet = ann.toSet
    val recall = annSet.intersect(exact).size.toDouble / exact.size
    assert(recall >= 0.5,
      s"candidate-pruned mining recall $recall vs ${exact.size} exact pairs")
  }

  test("ranker agreement equals a driver-side RBO recount") {
    def ranks(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
      .groupBy(_._1).view.mapValues(_.map(t => t._3 -> t._2).toMap).toMap
    val a = ranks(TextAnalysis.qTfidfRetrieval(spark, dir)
      .select("query_id", "rnk", "neighbor_id"))
    val b = ranks(TextAnalysis.qBm25Retrieval(spark, dir)
      .select("query_id", "rnk", "neighbor_id"))
    val want = a.keys.map { q =>
      def ov(d: Int) = a(q).keys.count(doc =>
        a(q)(doc) <= d && b.getOrElse(q, Map.empty).getOrElse(doc, 99) <= d)
      val rbo = 0.5 * ov(1) / 1.0 + 0.25 * ov(2) / 2.0 + 0.125 * ov(3) / 3.0
      q -> ((ov(1).toLong, ov(2).toLong, ov(3).toLong,
        BigDecimal(rbo).setScale(4, BigDecimal.RoundingMode.HALF_UP)
          .toDouble))
    }.toMap
    val got = TextAnalysis.qRankerAgreement(spark, dir).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    assert(got === want)
    // non-degenerate: the two lexical rankers agree somewhere and
    // disagree somewhere on this corpus
    assert(got.values.exists(_._4 > 0.0))
    assert(got.values.exists(_._4 < 0.875), "0.875 = full agreement at k=3")
  }

  test("semantic decontamination matches a driver-side nearest-eval scan") {
    val emb = graft.Tables.embeddings(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    def cos(u: Array[Float], v: Array[Float]): Double = {
      var d = 0.0; var nu = 0.0; var nv = 0.0; var i = 0
      while (i < u.length) {
        d += u(i).toDouble * v(i); nu += u(i).toDouble * u(i)
        nv += v(i).toDouble * v(i); i += 1
      }
      d / (math.sqrt(nu) * math.sqrt(nv))
    }
    def r4(x: Double) =
      BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    val evals = emb.keys.filter(_ % 10 == 0).toSeq.sorted
    val want = emb.keys.filter(_ % 10 != 0).map { d =>
      val (eid, s) = evals.map(e => e -> r4(cos(emb(d), emb(e))))
        .minBy { case (e, s) => (-s, e) }
      d -> ((eid, s,
        if (s >= Similarity.SemanticContamThreshold) 1 else 0))
    }.toMap
    val got = Similarity.qDecontaminateSemantic(spark, dir).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getDouble(2), r.getInt(3)))).toMap
    assert(got === want)
    // the threshold separates a real minority — both classes present
    val flags = got.values.map(_._3).toSeq
    assert(flags.contains(1) && flags.contains(0))
  }

  test("langid confusion: fractions row-normalize; counts conserve docs") {
    val got = TextAnalysis.qLangIdConfusion(spark, dir).cache()
    assert(got.agg(sum("n")).head.getLong(0) === 500L)
    // per true lang, fractions sum to ~1 (rounding jitter ≤ cells×5e-5)
    got.groupBy("lang").agg(sum("frac").as("s")).collect().foreach { r =>
      assert(math.abs(r.getDouble(1) - 1.0) < 1e-3, r.getString(0))
    }
    // the cross-tab must agree with joining the prediction row-wise
    val viaJoin = graft.Tables.documents(spark, dir)
      .select("doc_id", "lang")
      .join(TextAnalysis.qLangId(spark, dir), "doc_id")
      .groupBy("lang", "pred_lang").count()
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val cells = got.collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(cells === viaJoin)
    got.unpersist()
  }

  test("data card totals reconcile with direct corpus aggregates") {
    val docs = graft.Tables.documents(spark, dir).cache()
    val card = graft.operators.Curation.corpusDataCard(docs).cache()
    assert(card.agg(sum("n_docs")).head.getLong(0) === docs.count())
    assert(card.filter(col("dup_rate") < 0 || col("dup_rate") > 1)
      .count() === 0)
    // top_lang must be a lang the source actually uses
    val pairs = docs.select("source", "lang").distinct()
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(card.select("source", "top_lang").collect()
      .forall(r => pairs((r.getString(0), r.getString(1)))))
    // one source recomputed end to end
    val src = card.orderBy("source").head
    val s0 = src.getString(src.fieldIndex("source"))
    val mine = docs.filter(col("source") === s0)
    assert(src.getLong(src.fieldIndex("n_docs")) === mine.count())
    assert(src.getLong(src.fieldIndex("n_langs")) ===
      mine.select("lang").distinct().count())
    card.unpersist(); docs.unpersist()
  }

  test("bpeLearnFromWords over the shared word table replays bpeLearn " +
    "exactly (the rebuildIfStale threading contract)") {
    val dir = "/root/testdata/sf0.001"
    val docs = graft.Tables.documents(spark, dir)
      .select("doc_id", "text").limit(200)
    val viaDocs = TextAnalysis.bpeLearn(docs, 12)
      .collect().map(_.toString).toSeq
    val viaWords = TextAnalysis.bpeLearnFromWords(
        graft.operators.Unigram.wordFreq(docs), 12)
      .collect().map(_.toString).toSeq
    assert(viaWords === viaDocs,
      "one word collapse must yield the byte-identical merge table")
  }
}
