package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Unigram

/** Unigram-LM tokenizer: Viterbi exactness and tie rule (seeded
  * random cases here; the ScalaCheck law lives in InvariantProps),
  * hard-EM conservation invariants, coverage through pruning, and the
  * artifact-served twin identity.
  */
class UnigramSpec extends AnyFunSuite {

  private val dir = "/root/testdata/sf0.001"

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-unigram-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.warehouse.dir",
      java.nio.file.Files.createTempDirectory("graft-uni-wh").toString)
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def cpLen(s: String): Int = s.codePointCount(0, s.length)

  /** Exhaustive best segmentation — the spec's independent oracle for
    * the DP: enumerate ALL segmentations (words are short), score, and
    * apply the same (score, longer-final-piece…) preference by
    * comparing (score, piece-length vector from the END). The DP's
    * local longest-last-piece tie rule is exactly lexicographic
    * preference on (score, len(last), len(2nd-last), …), which this
    * enumeration reproduces globally.
    */
  private def bruteBest(
      w: String, sc: Map[String, Long]): Option[(Long, List[String])] = {
    val cps = w.codePoints.toArray
    // preference = lexicographic max over (score, [len(last),
    // len(2nd-last), …]) — exactly the DP's backward tie rule (longer
    // final piece, recursing into the shorter prefix); equal length
    // vectors sum to the same total, so they ARE the same segmentation
    // and the order is total
    def go(i: Int): Seq[(Long, List[String])] =
      if (i == 0) Seq((0L, Nil))
      else (1 to math.min(Unigram.MaxPieceLen, i)).flatMap { l =>
        val p = new String(cps, i - l, l)
        sc.get(p) match {
          case Some(ps) =>
            go(i - l).map { case (s, rest) => (s + ps, rest :+ p) }
          case None => Seq.empty
        }
      }
    val all = go(cps.length) // forward order (rest :+ p appends at the end)
    if (all.isEmpty) None
    else {
      implicit val seqOrd: Ordering[Seq[Long]] =
        Ordering.Implicits.seqOrdering[Seq, Long]
      val best = all.maxBy { case (s, ps) =>
        (s, ps.reverse.map(p => cpLen(p).toLong): Seq[Long])
      }
      Some(best)
    }
  }

  test("viterbi: equals exhaustive enumeration (score + tie rule) on " +
    "200 seeded random words and vocabularies — a small alphabet " +
    "forces shared substrings and genuine score ties") {
    val rnd = new scala.util.Random(20260816L)
    for (_ <- 1 to 200) {
      val w = (1 to (1 + rnd.nextInt(10)))
        .map(_ => ('a' + rnd.nextInt(3)).toChar).mkString
      val subs = (for {
        e <- 1 to w.length
        l <- 2 to math.min(Unigram.MaxPieceLen, e)
      } yield w.substring(e - l, e)).distinct
      val picked = rnd.shuffle(subs).take(6)
      val chars = w.toCharArray.map(_.toString).distinct.toSeq
      // coarse scores (multiples of a small grid) make exact ties common
      val sc = (chars ++ picked)
        .map(p => p -> (-(rnd.nextInt(5) + 1).toLong * 100L)).toMap
      val got = Unigram.viterbi(w, sc)
      assert(got.mkString === w, "pieces must tile the word")
      val (bs, bp) = bruteBest(w, sc).get
      assert(got.map(sc).sum === bs,
        s"'$w': DP score ${got.map(sc).sum} != brute $bs")
      assert(got.toList === bp,
        s"'$w': DP ${got.toList} != brute-preferred $bp")
    }
  }

  test("hard-EM counts conserve codepoint mass: sum(cnt * len(piece)) " +
    "= sum(freq * len(w)) each round; trained vocab respects caps and " +
    "keeps every char") {
    val docs = Tables.documents(spark, dir).select("doc_id", "text")
    val words = Unigram.wordFreq(docs)
    val rows = words.collect().map(r => (r.getString(0), r.getLong(1)))
    val mass = rows.map { case (w, f) => f * cpLen(w) }.sum
    // one E-step at seed scores
    val chars = rows.flatMap(_._1.toCharArray.map(_.toString)).distinct
    val seedSc = Unigram.scores(
      chars.map(c => c -> 1L).toMap)
    val cnt = Unigram.emCounts(words, seedSc)
    assert(cnt.map { case (p, c) => c * cpLen(p) }.sum === mass,
      "segmentation tiles every word exactly")
    val vocab = Unigram.trained(spark, dir)
    val vChars = vocab.filter(p => cpLen(p.piece) == 1).map(_.piece)
    assert(chars.toSet.subsetOf(vChars.toSet),
      "every corpus char survives training (coverage invariant)")
    assert(vocab.count(p => cpLen(p.piece) > 1) <= Unigram.VocabMultiCap)
    assert(vocab.forall(_.cnt >= 1))
    // scores are the integer ln of cnt/total over the pruned table
    val total = vocab.map(_.cnt).sum.toDouble
    vocab.foreach { p =>
      assert(p.score ===
        math.round(math.log(p.cnt / total) * Unigram.ScoreScale))
    }
  }

  test("empty corpus: train yields an empty vocab, encode an empty " +
    "frame — no division/log blowups") {
    import spark.implicits._
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    val vocab = Unigram.train(Unigram.wordFreq(empty))
    assert(vocab.isEmpty)
    assert(Unigram.encodeWithVocab(empty, Map.empty).count() === 0)
  }

  test("tokenizer staleness: exactly flat on the training corpus, " +
    "fires on an alphabet-drifted batch, rebuild flattens it — " +
    "unigram and BPE stores") {
    import spark.implicits._
    import graft.plans.{BpeStore, UnigramStore}
    val docs = Tables.documents(spark, dir).select("doc_id", "text")
    // drifted batch: digit words — entirely outside the training
    // alphabet, so unigram degrades to per-character UNKs and BPE's
    // merges never apply
    val drifted = (1L to 300L)
      .map(i => (i, s"${i * 97} ${i * 13} ${i * 7919}"))
      .toDF("doc_id", "text")

    val p1 = java.nio.file.Files
      .createTempDirectory("graft-unistale").toString + "/idx"
    UnigramStore.build(docs, "uni_stale_spec", p1)
    val flat = UnigramStore.staleness(spark, docs, "uni_stale_spec")
    assert(math.abs(flat.residualGrowth - 1.0) < 1e-9 &&
      flat.occupancySkew < 1e-9,
      s"same-corpus staleness must be exactly flat: $flat")
    val st = UnigramStore.staleness(spark, drifted, "uni_stale_spec")
    assert(st.isStale(1.25, 0.25), s"drift must fire: $st")
    assert(st.residualGrowth > 2.0,
      "digit words degrade to per-character UNKs — maximal fertility")
    assert(st.occupancySkew > 0.5,
      "usage mass moves onto the UNK bucket")
    val (_, rebuilt) =
      UnigramStore.rebuildIfStale(drifted, "uni_stale_spec", p1)
    assert(rebuilt)
    val post = UnigramStore.staleness(spark, drifted, "uni_stale_spec")
    assert(math.abs(post.residualGrowth - 1.0) < 1e-9 &&
      post.occupancySkew < 1e-9,
      s"post-rebuild staleness must be flat: $post")

    val p2 = java.nio.file.Files
      .createTempDirectory("graft-bpestale").toString + "/idx"
    // build BUNDLES the baseline write — no separate saveStats step
    BpeStore.build(docs, 10, "bpe_stale_spec", p2)
    val bflat = BpeStore.staleness(spark, docs, "bpe_stale_spec")
    assert(math.abs(bflat.residualGrowth - 1.0) < 1e-9 &&
      bflat.occupancySkew < 1e-9)
    val bst = BpeStore.staleness(spark, drifted, "bpe_stale_spec")
    assert(bst.isStale(1.25, 0.25), s"BPE drift must fire: $bst")
    val (_, brebuilt) =
      BpeStore.rebuildIfStale(drifted, 10, "bpe_stale_spec", p2)
    assert(brebuilt)
    val bpost = BpeStore.staleness(spark, drifted, "bpe_stale_spec")
    assert(math.abs(bpost.residualGrowth - 1.0) < 1e-9 &&
      bpost.occupancySkew < 1e-9)
  }

  test("encode tiles documents and the served twin is identical") {
    val docs = Tables.documents(spark, dir).select("doc_id", "text")
    val sc = Unigram.trained(spark, dir)
      .map(p => p.piece -> p.score).toMap
    val enc = Unigram.encodeWithVocab(docs, sc).collect()
      .sortBy(_.getLong(0))
    val byId = docs.collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    enc.foreach { r =>
      val text = byId(r.getLong(0))
      val rebuilt = r.getString(3).replace("·", "")
      assert(rebuilt === text.trim.split("\\s+").filter(_.nonEmpty)
        .mkString(" "), s"doc ${r.getLong(0)}: seg must tile the text")
      assert(r.getLong(2) >= r.getLong(1),
        "a word is at least one piece")
    }
    // artifact round trip
    val table = "unigram_spec_store"
    val path = java.nio.file.Files
      .createTempDirectory("graft-unistore").toString + "/idx"
    graft.plans.UnigramStore.save(
      spark, Unigram.trained(spark, dir), table, path)
    val served = graft.plans.UnigramStore.encode(spark, docs, table)
      .collect().sortBy(_.getLong(0))
    assert(served.toSeq === enc.toSeq,
      "served encode ≡ in-plan encode, row for row")
  }
}
