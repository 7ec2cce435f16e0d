package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Sampling

/** Sequence packing + stratified sampling: the scalable two-level prefix
  * sum must equal the single-window reference, packing arithmetic must be
  * self-consistent, and the sample must be a deterministic function of
  * doc_id with per-stratum counts near the target.
  */
class SamplingSpec extends AnyFunSuite {

  private val dir = "/root/testdata/sf0.001"

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-sampling-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("two-level prefix sum equals the single-window reference") {
    import spark.implicits._
    // ragged values incl. zeros; ids deliberately non-contiguous
    val df = (1 to 997).map(i => (i.toLong * 3 + (i % 7), (i % 13).toLong))
      .toDF("id", "v")
    val scalable = Sampling
      .exclusivePrefixSum(df, "id", "v", partitions = 7, outCol = "ps")
      .select("id", "ps")
    val reference = df.withColumn("ps",
      coalesce(sum(col("v")).over(
        Window.orderBy("id").rowsBetween(Window.unboundedPreceding, -1)),
        lit(0L)))
      .select("id", "ps")
    assert(scalable.exceptAll(reference).count() === 0)
    assert(reference.exceptAll(scalable).count() === 0)
  }

  test("unimax waterfill exhausts the budget under the epoch cap") {
    val rows = Sampling.qLangBudget(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    assert(rows.length >= 2)
    val budget = rows.map(_._2).sum.toDouble
    // allocation spends the whole budget (2dp rounding per language)
    assert(math.abs(rows.map(_._3).sum - budget) < 0.05 * rows.length)
    // nobody exceeds the epoch cap (4dp-rounded epochs)
    rows.foreach { case (lang, _, _, ep) =>
      assert(ep <= Sampling.UniMaxEpochCap + 1e-9, s"$lang over the cap")
    }
    // every uncapped language gets the same water level
    val free = rows.filter(_._4 < Sampling.UniMaxEpochCap)
    assert(free.nonEmpty, "someone must stay under the cap")
    assert(free.map(_._3).distinct.length === 1,
      "uncapped languages share one water level")
  }

  test("unimax cap bites on a skewed corpus; leftover splits equally") {
    import spark.implicits._
    // 'lo' has 40 tokens capacity 60; the other two have 400 each.
    // Budget = 840 tokens: water level without caps = 280 > 60, so lo
    // caps at 1.5 epochs and hi1/hi2 split the remaining 780 evenly.
    def doc(lang: String, words: Int) =
      (lang, Seq.tabulate(words)(i => s"w$i").mkString(" "))
    val docs = (Seq.fill(4)(doc("lo", 10)) ++
      Seq.fill(10)(doc("hi1", 40)) ++ Seq.fill(10)(doc("hi2", 40)))
      .toDF("lang", "text")
    val got = Sampling.langBudget(docs).collect()
      .map(r => r.getString(0) -> (r.getDouble(2), r.getDouble(3))).toMap
    assert(got("lo") === ((60.0, 1.5)), "small language pins to the cap")
    assert(got("hi1") === ((390.0, 0.975)))
    assert(got("hi2") === ((390.0, 0.975)))
  }

  test("multi-key prefix sum matches the window reference under heavy ties") {
    import spark.implicits._
    // score has only 5 distinct values over 800 rows, so ties straddle
    // every range-partition boundary; id must break them identically in
    // the partitioner and the local window
    val df = (1 to 800).map(i => ((i % 5).toDouble / 10, i.toLong, 1L))
      .toDF("score", "id", "one")
    val scalable = Sampling
      .exclusivePrefixSum(df, Seq(col("score").desc, col("id")), "one",
        partitions = 7, outCol = "rk")
      .select("score", "id", "rk")
    val reference = df.withColumn("rk",
      coalesce(sum(col("one")).over(
        Window.orderBy(col("score").desc, col("id"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select("score", "id", "rk")
    assert(scalable.exceptAll(reference).count() === 0)
    assert(reference.exceptAll(scalable).count() === 0)
  }

  test("packing: offsets advance by token counts, windows cover budget") {
    val rows = Sampling.qSeqPacking(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty)
    val b = Sampling.SeqBudget
    var cum = 0L
    rows.foreach { case (_, n, seqId, off) =>
      assert(seqId === cum / b, "window = floor(cum_before / budget)")
      assert(off === cum % b, "offset = cum_before mod budget")
      cum += n
    }
    // every window except the last is fully used (concatenate-and-chunk
    // wastes nothing)
    assert(rows.last._3 === (cum - rows.last._2) / b)
  }

  test("chunks tile every document with the declared overlap") {
    val rows = Sampling.qDocChunks(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4)))
    assert(rows.nonEmpty)
    val stride = Sampling.ChunkStride
    val size = Sampling.ChunkSize
    rows.groupBy(_._1).foreach { case (doc, cs) =>
      val sorted = cs.sortBy(_._2)
      // chunk ids contiguous from 0; starts advance by the stride
      sorted.zipWithIndex.foreach { case ((_, cid, start, len, text), i) =>
        assert(cid === i.toLong, s"doc $doc chunk ids")
        assert(start === i.toLong * stride, s"doc $doc starts")
        assert(len >= 1 && len <= size, s"doc $doc len bounds")
        assert(text.split("\\s+").count(_.nonEmpty) === len,
          s"doc $doc chunk text token count")
      }
      // the last chunk reaches the end of the doc; a doc longer than one
      // window never leaves a tail of more than (size - stride) uncovered
      val (_, _, lastStart, lastLen, _) = sorted.last
      val n = lastStart + lastLen
      if (sorted.length > 1)
        assert(n - (lastStart + stride) < stride,
          s"doc $doc trailing coverage")
    }
  }

  test("temperature mix upweights rare strata (admission-rate ordering)") {
    val kept = Sampling.qMixtureTemperature(spark, dir)
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val totals = graft.Tables.documents(spark, dir)
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(kept.nonEmpty && kept.values.sum < totals.values.sum,
      "mix must actually downsample")
    // alpha = 0.5 ⇒ admission rate ∝ c^-0.5: strictly higher for rarer
    // strata (compare the extreme pair, robust to LCG noise)
    val biggest = totals.maxBy(_._2)._1
    val smallest = totals.minBy(_._2)._1
    val rBig = kept.getOrElse(biggest, 0L).toDouble / totals(biggest)
    val rSmall = kept.getOrElse(smallest, 0L).toDouble / totals(smallest)
    assert(rSmall > rBig,
      s"rare stratum $smallest rate $rSmall must exceed $biggest rate $rBig")
  }

  test("shuffle order: a deterministic permutation, equal to the " +
    "single-window reference") {
    val out = Sampling.qShuffleOrder(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val n = graft.Tables.documents(spark, dir).count()
    assert(out.length.toLong === n)
    // positions are exactly 0..n-1 (a permutation, no gaps or ties)
    assert(out.map(_._2).sorted.toSeq === (0L until n))
    // scalable two-level form ≡ the naive global window over the same key
    def naive(seed: Int): Seq[(Long, Long)] =
      graft.Tables.documents(spark, dir)
        .select(col("doc_id"),
          md5(concat_ws(":", lit(seed), col("doc_id"))).as("k"))
        .withColumn("pos",
          (row_number().over(Window.orderBy("k")) - 1).cast("long"))
        .select("doc_id", "pos")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(out.sortBy(_._1).toSeq === naive(Sampling.ShuffleSeed).sortBy(_._1))
    // different seed ⇒ different order (the epoch property)
    assert(naive(Sampling.ShuffleSeed + 1).sortBy(_._1).map(_._2) !==
      out.sortBy(_._1).map(_._2).toSeq)
  }

  test("leakage-safe split: clusters never straddle a split boundary") {
    import graft.operators.{Clustering, Dedup}
    val splits = Sampling.qSplitLeakageSafe(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val corpus = Dedup.corpusNear(spark, dir)
    assert(splits.size.toLong === corpus.count())
    assert(Set("train", "val", "test").subsetOf(splits.values.toSet),
      "all three splits populated")
    assert(splits.values.count(_ == "train") > splits.size / 2,
      "train is the bulk split")
    // every near-dup cluster lands wholly in ONE split
    val sh = Dedup.capDocFrequency(
      Dedup.shingleIndex(corpus, 3), Dedup.ShingleDfCap).persist()
    val pairs = Dedup.jaccardPairs(sh, 0.5).localCheckpoint(true)
    sh.unpersist()
    val clusters = Clustering.connectedComponents(pairs, "id_a", "id_b")
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    assert(clusters.nonEmpty)
    clusters.groupBy(_._2).foreach { case (cid, members) =>
      val ss = members.map(m => splits(m._1)).distinct
      assert(ss.length === 1, s"cluster $cid split across $ss")
    }
    // the rule is not vacuous here: an i.i.d. split by OWN doc_id would
    // put at least one near-dup pair on both sides of a boundary
    def ownBucket(id: Long): Long =
      math.floorMod(id * 1103515245L + 12345L, 2147483648L) % 100L
    def ownSplit(id: Long): String = {
      val b = ownBucket(id)
      if (b < Sampling.SplitTestPct) "test"
      else if (b < Sampling.SplitTestPct + Sampling.SplitValPct) "val"
      else "train"
    }
    val pairRows = pairs.collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairRows.exists { case (a, b) => ownSplit(a) != ownSplit(b) },
      "fixture must contain a pair an i.i.d. split would leak")
  }

  test("cache hygiene: no plain-persisted RDD survives a Sampling query") {
    // exclusivePrefixSum persists its range frame internally; the release
    // pattern (localCheckpoint result, unpersist frame) must leave no
    // explicitly-persisted RDD behind. localCheckpoint RDDs legitimately
    // stay registered until GC (ContextCleaner drops their blocks), so
    // the assertion is: every surviving persistent RDD is a
    // materialized checkpoint (isCheckpointed covers local checkpoints),
    // never a leaked .persist().
    def leakedPersists(): Seq[String] =
      spark.sparkContext.getPersistentRDDs.values.toSeq
        .filterNot(_.isCheckpointed)
        .map(r => s"RDD ${r.id} ${r.name} ${r.getStorageLevel}")
    for (q <- Seq(Sampling.qSeqPacking, Sampling.qShuffleOrder)) {
      q(spark, dir).collect()
      val leaked = leakedPersists()
      assert(leaked.isEmpty, s"leaked persists: $leaked")
    }
  }

  test("stratified sample: deterministic, near-target per stratum") {
    val a = Sampling.qStratifiedSample(spark, dir).collect()
    val b = Sampling.qStratifiedSample(spark, dir).collect()
    assert(a.toSeq === b.toSeq, "sample must be run-deterministic")
    val perLang = a.groupBy(_.getString(1)).view.mapValues(_.length)
    val totals = graft.Tables.documents(spark, dir)
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    perLang.foreach { case (lang, kept) =>
      val total = totals(lang)
      assert(kept <= total)
      if (total <= Sampling.StratumTarget)
        assert(kept === total.toInt, s"under-target stratum $lang kept whole")
      else
        // LCG-mod selection is uniform enough for a generous 2x band
        assert(kept <= Sampling.StratumTarget * 2,
          s"over-target stratum $lang should be downsampled, kept=$kept")
    }
  }

  /** Driver-side reference of the E-S key for one (seed, id, weight). */
  private def esKeyRef(seed: Int, id: Long, w: Double): Double = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s"$seed:$id".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    val h = java.lang.Long.parseLong(hex.take(13), 16)
    -math.log((h + 0.5) / 4503599627370496.0) / w
  }

  test("weighted sample equals the exact driver-side E-S reference") {
    import spark.implicits._
    val rows = (1L to 500L).map(i => (i, (i % 7 + 1).toDouble))
    val got = Sampling
      .weightedSample(rows.toDF("id", "w").repartition(7), "id", "w",
        20, seed = 99)
      .select("id").collect().map(_.getLong(0)).toSet
    val want = rows.sortBy { case (i, w) => esKeyRef(99, i, w) }
      .take(20).map(_._1).toSet
    assert(got === want)
  }

  test("weighted sample excludes non-positive weights instead of mis-ranking") {
    import spark.implicits._
    // w=0 would backfill via a +Infinity key; w<0 would sort FIRST and
    // force inclusion — both must be excluded, not silently sampled
    val df = Seq((1L, 5.0), (2L, 0.0), (3L, -2.0), (4L, 1.0))
      .toDF("id", "w")
    val got = Sampling.weightedSample(df, "id", "w", 4, seed = 5)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(got === Set(1L, 4L))
  }

  test("weighted sample inclusion tracks the weight law across seeds") {
    import spark.implicits._
    // two items, weights 9:1, k=1 — P(heavy) = 0.9 exactly (E-S law);
    // the md5-derived u stream should land inside a generous band
    val picks = (1 to 400).count { seed =>
      esKeyRef(seed, 1L, 9.0) < esKeyRef(seed, 2L, 1.0)
    }
    assert(picks > 320 && picks < 400, s"heavy item picked $picks/400")
    // and the distributed form agrees with the reference on a few seeds
    (1 to 3).foreach { seed =>
      val got = Sampling
        .weightedSample(
          Seq((1L, 9.0), (2L, 1.0)).toDF("id", "w"), "id", "w", 1, seed)
        .select("id").collect()(0).getLong(0)
      val want =
        if (esKeyRef(seed, 1L, 9.0) < esKeyRef(seed, 2L, 1.0)) 1L else 2L
      assert(got === want, s"seed $seed")
    }
  }

  test("pack manifest: spans tile sequences exactly and conserve docs") {
    val rows = Sampling.qPackManifest(spark, dir).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))
    assert(rows.nonEmpty)
    // per doc: spans cover [0, n_tokens) without gap or overlap
    val toks = graft.Tables.documents(spark, dir)
      .select(col("doc_id"),
        size(graft.functions.TextFunctions.tokens(col("text")))
          .cast("long").as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    rows.groupBy(_._3).foreach { case (doc, sp) =>
      val sorted = sp.sortBy(_._5)
      assert(sorted.head._5 === 0L, s"doc $doc must start at 0")
      assert(sorted.last._6 === toks(doc), s"doc $doc must end at n_tokens")
      sorted.sliding(2).foreach {
        case Array(a, b) => assert(a._6 === b._5,
          s"doc $doc spans must be contiguous")
        case _ =>
      }
    }
    // per sequence: slots tile [0, budget) contiguously; every sequence
    // except the last is exactly full
    val bySeq = rows.groupBy(_._1)
    val lastSeq = bySeq.keys.max
    bySeq.foreach { case (seq, sp) =>
      val sorted = sp.sortBy(_._2)
      assert(sorted.head._4 === 0L, s"seq $seq slot 1 must start at 0")
      sorted.sliding(2).foreach {
        case Array(a, b) => assert(a._4 + a._7 === b._4,
          s"seq $seq spans must tile with no gap")
        case _ =>
      }
      val filled = sorted.map(_._7).sum
      if (seq != lastSeq)
        assert(filled === Sampling.SeqBudget, s"seq $seq must be full")
      else assert(filled <= Sampling.SeqBudget)
    }
    // split docs exist on this fixture (the case the manifest is for)
    assert(rows.groupBy(_._3).values.exists(_.size > 1),
      "at least one doc must straddle a sequence boundary")
  }

  test("rendezvous sharding: adding a shard only moves docs to it") {
    import org.apache.spark.sql.functions.col
    val docs = graft.Tables.documents(spark, dir).select("doc_id")
    def assign(k: Int): Map[Long, Int] = docs
      .select(col("doc_id"),
        Sampling.rendezvousShard(col("doc_id"), k).as("shard"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val at10 = assign(10)
    val at11 = assign(11)
    assert(at10.values.toSet.size === 10, "all shards populated")
    val moved = at10.keys.filter(id => at10(id) != at11(id)).toSeq
    // the HRW property: every reassigned doc lands on the NEW shard
    moved.foreach(id => assert(at11(id) === 10,
      s"doc $id moved ${at10(id)}→${at11(id)}, not to the new shard"))
    // expected movement 1/11 ≈ 0.091 of 500 docs; 3σ band
    val frac = moved.size.toDouble / at10.size
    assert(frac > 0.03 && frac < 0.17, s"moved fraction $frac")
    // balance sanity: no shard holds more than 3x its fair share
    val maxLoad = at10.values.groupBy(identity).values.map(_.size).max
    assert(maxLoad <= 3 * at10.size / 10, s"max shard load $maxLoad")
  }

  test("whole-doc packing: conservation, intactness, fill bounds, " +
    "and the shelf-overflow bound") {
    import spark.implicits._
    import graft.functions.TextFunctions.tokens
    val docs = graft.Tables.documents(spark, dir)
    val budget = Sampling.SeqBudget
    val manifest = Sampling
      .packWholeDocs(docs, budget, Sampling.PackCells).collect()
    val totalTokens = docs
      .agg(sum(size(tokens(col("text"))).cast("long")))
      .first.getLong(0)
    // conservation: every token of every doc lands in exactly one
    // shelf (docs never straddle — the defining SFT property)
    assert(manifest.map(_.getLong(3)).sum === totalTokens)
    assert(manifest.map(_.getLong(2)).sum === docs.count())
    // fill is capped at 1 and positive; a truncated doc only appears
    // where the doc itself exceeds the budget
    manifest.foreach { r =>
      val fill = r.getDouble(5)
      assert(fill > 0.0 && fill <= 1.0)
    }
    // shelf-overflow bound: length-descending order means a shelf
    // exceeds the budget by LESS than its own smallest (= last) doc,
    // which is itself <= budget unless flagged truncated; so any
    // untruncated shelf holds < 2x budget
    manifest.filter(_.getLong(4) === 0L).foreach { r =>
      assert(r.getLong(3) < 2 * budget,
        s"untruncated shelf ${r.getLong(0)}/${r.getLong(1)} " +
          s"holds ${r.getLong(3)} tokens")
    }
    // determinism: a second run is byte-identical (pure in doc_id)
    val again = Sampling
      .packWholeDocs(docs, budget, Sampling.PackCells).collect()
    assert(manifest.toSeq === again.toSeq)
  }
}
