package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.multimodal.Multimodal

/** Multimodal plumbing: synthetic media table, stubbed decode kernels,
  * partition-batched feature extraction, payload-rewriting resize,
  * frame-sample fan-out.
  */
class MultimodalSpec extends AnyFunSuite {

  private val dir = "/root/testdata/sf0.001"

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-multimodal-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("pHash: near-identical images (exposure shift + corner edit) " +
    "land within hamming 4, distinct images far; undecodable payloads " +
    "hash to the sentinel; the pair gate finds every planted copy") {
    import graft.functions.PHash64
    import graft.multimodal.{Multimodal => MM}
    def ham(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)
    // kernel-level: the perturbed copy is perceptually the same image.
    // Median-centered DCT bits flip in PAIRS (one coefficient crossing
    // the median pushes another back across), so the gate is 4, not 3
    val ids = Seq(0L, 4L, 8L, 12L, 40L, 100L, 2020L)
    for (id <- ids) {
      val base = PHash64.compute(MM.renderImage(id, copy = false))
      val near = PHash64.compute(MM.renderImage(id, copy = true))
      assert(base !== PHash64.Undecodable)
      assert(ham(base, near) <= 4,
        s"doc $id: perturbed copy at hamming ${ham(base, near)}")
    }
    // distinct documents' images are far apart (random 64-bit points
    // sit at expected hamming 32; anything ≤ 4 would poison precision)
    for (Seq(a, b) <- ids.combinations(2)) {
      val fa = PHash64.compute(MM.renderImage(a, copy = false))
      val fb = PHash64.compute(MM.renderImage(b, copy = false))
      assert(ham(fa, fb) > 4, s"docs $a/$b collide at ${ham(fa, fb)}")
    }
    // a payload the codec rejects hashes to the sentinel, not a throw
    assert(PHash64.compute("not a ppm".getBytes) === PHash64.Undecodable)
    // end to end: every planted (id, id+1e6) pair surfaces, recall 1.0
    // on this fixture (hash-checked at sf0.01 by the driver ledger)
    val planted = Tables.documents(spark, dir)
      .filter(col("doc_id") % 4 === 0).count()
    val rec = MM.qPhashRecall(spark, dir).collect().head
    assert(rec.getAs[Long]("n_truth") === planted)
    assert(rec.getAs[Long]("n_hit") === rec.getAs[Long]("n_truth"))
    assert(rec.getAs[Double]("recall") === 1.0)
  }

  test("aHash: pitched (+2%) and gain-shifted (x0.7) audio copies land " +
    "within hamming 4, distinct clips far; undecodable payloads hash " +
    "to the sentinel; the pair gate finds every planted copy") {
    import graft.functions.AHash64
    import graft.multimodal.{Multimodal => MM, WavCodec}
    def ham(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)
    val ids = Seq(2L, 6L, 10L, 14L, 42L, 102L, 2022L)
    for (id <- ids) {
      val base = AHash64.compute(MM.renderClip(id, copy = false))
      val near = AHash64.compute(MM.renderClip(id, copy = true))
      assert(base !== AHash64.Undecodable)
      assert(ham(base, near) <= 4,
        s"doc $id: pitched/gain-shifted copy at hamming ${ham(base, near)}")
    }
    // distinct documents' clips are far apart (random band orderings
    // sit near expected hamming 32; anything ≤ 4 poisons precision)
    for (Seq(a, b) <- ids.combinations(2)) {
      val fa = AHash64.compute(MM.renderClip(a, copy = false))
      val fb = AHash64.compute(MM.renderClip(b, copy = false))
      assert(ham(fa, fb) > 4, s"docs $a/$b collide at ${ham(fa, fb)}")
    }
    // a pure gain change (no pitch) is exactly invariant up to int16
    // quantization near-ties — the energy-ORDER bit design's claim
    for (id <- ids.take(3)) {
      val clip = WavCodec.decode(MM.renderClip(id, copy = false)).get
      val scaled = clip.copy(samples =
        clip.samples.map(s => (s * 0.5).toShort))
      val d = ham(AHash64.compute(WavCodec.encode(clip)),
        AHash64.compute(WavCodec.encode(scaled)))
      assert(d <= 2, s"doc $id: gain-only copy at hamming $d")
    }
    // the resample path: the same clip delivered at 8 kHz (sample-
    // doubled) fingerprints within the gate of its 4 kHz original
    for (id <- ids.take(3)) {
      val clip = WavCodec.decode(MM.renderClip(id, copy = false)).get
      val up = WavCodec.Clip(8000, 1,
        clip.samples.flatMap(s => Array(s, s)))
      val d = ham(AHash64.compute(WavCodec.encode(clip)),
        AHash64.compute(WavCodec.encode(up)))
      assert(d <= 4, s"doc $id: 8 kHz delivery at hamming $d")
    }
    // a payload the codec rejects hashes to the sentinel, not a throw
    assert(AHash64.compute("not a wav".getBytes) === AHash64.Undecodable)
    // a COMPUTED fingerprint can never equal the sentinel (all 64 bit
    // positions are legitimately reachable, so bit-63-only clips are
    // remapped one bit away instead of vanishing from every
    // `=!= Undecodable` consumer)
    assert(AHash64.sealFp(Long.MinValue) === Long.MinValue + 1)
    assert(AHash64.sealFp(0L) === 0L)
    assert(AHash64.sealFp(-1L) === -1L)
    assert(graft.functions.PHash64.sealFp(Long.MinValue) ===
      Long.MinValue + 1)
    assert(graft.functions.PHash64.sealFp(Long.MinValue + 1) ===
      Long.MinValue + 1)
    // end to end: every planted (id, id+1e6) pair surfaces, recall 1.0
    // on this fixture (hash-checked at sf0.01 by the driver ledger)
    val planted = Tables.documents(spark, dir)
      .filter(col("doc_id") % 4 === 2).count()
    val rec = MM.qAhashRecall(spark, dir).collect().head
    assert(rec.getAs[Long]("n_truth") === planted)
    assert(rec.getAs[Long]("n_hit") === rec.getAs[Long]("n_truth"))
    assert(rec.getAs[Double]("recall") === 1.0)
  }

  test("ahash index store: admission rejects exactly the near-dup " +
    "copies, admits fresh clips, grows the index by the admitted set, " +
    "and re-admission of admitted clips is a no-op") {
    import graft.multimodal.{Multimodal => MM}
    import graft.plans.AhashIndexStore
    import spark.implicits._
    val table = "ahash_idx_spec"
    spark.sql(s"DROP TABLE IF EXISTS $table")
    val path = java.nio.file.Files
      .createTempDirectory("graft-ahashidx").toString + "/idx"
    AhashIndexStore.build(MM.audioCorpus(spark, dir), table, path)
    val pre = spark.table(table).count()
    val ids = Tables.documents(spark, dir).select("doc_id")
      .as[Long].collect()
    val batch = ids.flatMap { id =>
      val copies =
        if (id % 8 == 1) Seq((id + 2000000L, MM.renderClip(id, true)))
        else Nil
      val fresh =
        if (id % 8 == 5)
          Seq((id + 3000000L, MM.renderClip(id + 3000000L, false)))
        else Nil
      copies ++ fresh
    }.toSeq.toDF("doc_id", "payload")
    val admitted = AhashIndexStore.admitAndExtend(batch, table)
      .select("doc_id").as[Long].collect().sorted
    val wantFresh = ids.filter(_ % 8 == 5).map(_ + 3000000L).sorted
    assert(admitted === wantFresh,
      "exactly the fresh clips admitted; every near-dup copy rejected")
    assert(admitted.nonEmpty)
    assert(spark.table(table).count() === pre + admitted.length,
      "the index grows by exactly the admitted set")
    // incremental property: verbatim copies of JUST-ADMITTED clips now
    // reject against the extended index (hamming 0 to their originals)
    val replay = ids.filter(_ % 8 == 5).map { id =>
      (id + 4000000L, MM.renderClip(id + 3000000L, copy = false))
    }.toSeq.toDF("doc_id", "payload")
    assert(AhashIndexStore.admitAndExtend(replay, table).count() === 0)
  }

  test("vhash index store: admission rejects exactly the re-encoded " +
    "copies via the median gate against the BASE clips, admits fresh " +
    "clips, grows the index by the admitted frame rows, and " +
    "re-admission of admitted clips is a no-op") {
    import graft.multimodal.{Multimodal => MM}
    import graft.plans.VhashIndexStore
    import spark.implicits._
    val table = "vhash_idx_spec"
    spark.sql(s"DROP TABLE IF EXISTS $table")
    val path = java.nio.file.Files
      .createTempDirectory("graft-vhashidx").toString + "/idx"
    // a base-only index (no planted +1e6 copies): every rejection below
    // must come from the perceptual gate against the BASE rendering
    val ids = Tables.documents(spark, dir).select("doc_id")
      .as[Long].collect().filter(_ % 16 == 0).take(24).toSeq
    val clips = ids.map(id => (id, MM.renderVideo(id, copy = false)))
      .toDF("doc_id", "payload").localCheckpoint(true)
    VhashIndexStore.build(clips, table, path)
    val pre = spark.table(table).count()
    val batch = ids.flatMap { id =>
      Seq((id + 2000000L, MM.renderVideo(id, copy = true))) ++
        (if (id % 32 == 16)
           Seq((id + 3000000L, MM.renderVideo(id + 3000000L, copy = false)))
         else Nil)
    }.toDF("doc_id", "payload")
    val admitted = VhashIndexStore.admitAndExtend(batch, table)
    val admittedIds = admitted.select("doc_id").distinct()
      .as[Long].collect().sorted
    val wantFresh = ids.filter(_ % 32 == 16).map(_ + 3000000L).sorted
    assert(admittedIds === wantFresh,
      "exactly the fresh clips admitted; every re-encoded copy rejected")
    assert(admittedIds.nonEmpty)
    assert(spark.table(table).count() === pre + admitted.count(),
      "the index grows by exactly the admitted frame rows")
    // incremental property: re-encoded copies of JUST-ADMITTED clips
    // now reject against the extended index
    val replay = ids.filter(_ % 32 == 16).map { id =>
      (id + 4000000L, MM.renderVideo(id + 3000000L, copy = true))
    }.toDF("doc_id", "payload")
    assert(VhashIndexStore.admitAndExtend(replay, table).count() === 0)
  }

  test("media table covers all docs with valid headers") {
    val media = Multimodal.mediaTable(spark, dir).cache()
    assert(media.count() === 500)
    val feats = Multimodal.extractFeatures(media).cache()
    assert(feats.filter(col("header_ok") === false).count() === 0)
    // payload = 8-byte header + ascii text
    val joined = feats.join(
      Tables.documents(spark, dir).select(
        col("doc_id").as("media_id"), col("n_chars")), "media_id")
    assert(joined.filter(col("byte_len") =!= col("n_chars") + 8).count() === 0)
    feats.unpersist(); media.unpersist()
  }

  test("feature kernel: entropy bounded, histogram support sane") {
    val feats = Multimodal
      .extractFeatures(Multimodal.mediaTable(spark, dir)).cache()
    assert(feats.filter(col("entropy") < 0 || col("entropy") > 8).count() === 0)
    assert(feats.filter(
      col("histogram_nonzero") < 1 || col("histogram_nonzero") > 256)
      .count() === 0)
    // deterministic across runs
    val a = feats.orderBy("media_id").collect()
    val b = Multimodal.extractFeatures(Multimodal.mediaTable(spark, dir))
      .orderBy("media_id").collect()
    assert(a.toSeq === b.toSeq)
    feats.unpersist()
  }

  test("resize clamps header dims and meta consistently") {
    val resized = Multimodal
      .resize(Multimodal.mediaTable(spark, dir), maxDim = 256).cache()
    assert(resized
      .filter(col("meta.width") > 256 || col("meta.height") > 256)
      .count() === 0)
    // header and meta must agree after rewrite
    val feats = Multimodal.extractFeatures(resized)
    assert(feats.filter(col("header_ok") === false).count() === 0)
    resized.unpersist()
  }

  // ---- real PPM codec path (hand-built images, no fixture) ----

  import graft.multimodal.PpmCodec

  /** 4x2 P6 with a header comment: top row solid red/green/blue/white,
    * bottom row black/gray/red/blue.
    */
  private def ppm4x2: Array[Byte] = {
    val header = "P6\n# hand-built\n4 2\n255\n".getBytes("US-ASCII")
    val px = Array(
      255, 0, 0, 0, 255, 0, 0, 0, 255, 255, 255, 255,
      0, 0, 0, 128, 128, 128, 255, 0, 0, 0, 0, 255
    ).map(_.toByte)
    header ++ px
  }

  test("PPM codec: decodes dims and pixels from a hand-built image") {
    val img = PpmCodec.decode(ppm4x2).getOrElse(fail("decode failed"))
    assert(img.width === 4 && img.height === 2)
    assert(img.rgb.length === 24)
    // pixel (0,0) is red, pixel (3,1) is blue
    assert((img.rgb(0) & 0xff, img.rgb(1) & 0xff, img.rgb(2) & 0xff) ===
      ((255, 0, 0)))
    assert((img.rgb(21) & 0xff, img.rgb(22) & 0xff, img.rgb(23) & 0xff) ===
      ((0, 0, 255)))
    // encode-decode round trip is byte-faithful on the raster
    val again = PpmCodec.decode(PpmCodec.encode(img)).get
    assert(again.width === 4 && again.height === 2)
    assert(again.rgb.toSeq === img.rgb.toSeq)
    // corrupt magic / truncated raster both refuse, never throw
    assert(PpmCodec.decode("P5\n4 2\n255\n".getBytes ++
      new Array[Byte](24)).isEmpty)
    assert(PpmCodec.decode(ppm4x2.dropRight(1)).isEmpty)
    // an unbounded digit run in the header must refuse, not throw
    // NumberFormatException from .toInt
    assert(PpmCodec.decode(
      "P6 99999999999999999999 2 255 ".getBytes("US-ASCII") ++
        new Array[Byte](24)).isEmpty)
  }

  test("PPM resize: real nearest-neighbor pixel mapping") {
    val img = PpmCodec.decode(ppm4x2).get
    val half = PpmCodec.resize(img, 2, 1)
    assert(half.width === 2 && half.height === 1)
    // nearest-neighbor with floor index map: (0,0)<-src(0,0)=red,
    // (1,0)<-src(2,0)=blue
    assert((half.rgb(0) & 0xff, half.rgb(1) & 0xff, half.rgb(2) & 0xff) ===
      ((255, 0, 0)))
    assert((half.rgb(3) & 0xff, half.rgb(4) & 0xff, half.rgb(5) & 0xff) ===
      ((0, 0, 255)))
  }

  test("kernels run the real codec end-to-end on PPM payloads") {
    import spark.implicits._
    val rows = Seq(
      Multimodal.MediaRow(1L, "image", ppm4x2,
        Multimodal.MediaMeta(4, 2, 0, 0, "ppm")),
      // undecodable payload: byte-histogram fallback, header not ok
      Multimodal.MediaRow(2L, "image", Array[Byte](1, 2, 3),
        Multimodal.MediaMeta(0, 0, 0, 0, "bin")))
    val ds = spark.createDataset(rows)
    val feats = Multimodal.extractFeatures(ds)
      .collect().map(f => f.media_id -> f).toMap
    assert(feats(1L).header_ok)
    // luminance histogram of the 8 known pixels: 8 distinct-ish levels —
    // compute the expectation with the same fixed-point weights
    val lums = PpmCodec.decode(ppm4x2).get.rgb.grouped(3).map { p =>
      (77 * (p(0) & 0xff) + 150 * (p(1) & 0xff) + 29 * (p(2) & 0xff)) >> 8
    }.toSeq
    assert(feats(1L).histogram_nonzero === lums.distinct.size)
    val expEntropy = {
      val n = lums.size.toDouble
      -lums.groupBy(identity).values
        .map(g => g.size / n)
        .map(p => p * math.log(p) / math.log(2)).sum
    }
    assert(math.abs(feats(1L).entropy - expEntropy) < 1e-9)
    assert(!feats(2L).header_ok)
    // resize: a 4x2 PPM under maxDim=2 becomes a VALID 2x1 PPM whose
    // pixels match the codec-level resize
    val resized = Multimodal.resize(ds, maxDim = 2)
      .collect().find(_.media_id == 1L).get
    assert(resized.meta.width === 2 && resized.meta.height === 1)
    val out = PpmCodec.decode(resized.payload).getOrElse(
      fail("resized payload must be valid PPM"))
    assert(out.rgb.toSeq ===
      PpmCodec.resize(PpmCodec.decode(ppm4x2).get, 2, 1).rgb.toSeq)
  }

  test("AVI codec: parses container metadata from a hand-built RIFF " +
    "and round-trips it") {
    import graft.multimodal.AviCodec
    val meta = AviCodec.VideoMeta(
      width = 640, height = 480, nFrames = 300,
      microSecPerFrame = 33333, handler = "MJPG")
    val avi = AviCodec.encodeMeta(meta)
    val got = AviCodec.decodeMeta(avi).getOrElse(fail("decode failed"))
    assert(got === meta)
    assert(got.durationMs === 33333L * 300 / 1000) // ~10s at ~30fps
    // malformed containers refuse, never throw
    assert(AviCodec.decodeMeta(avi.dropRight(1)).isEmpty)
    assert(AviCodec.decodeMeta("RIFFxxxxWAVE".getBytes).isEmpty)
    assert(AviCodec.decodeMeta(Array[Byte](1, 2, 3)).isEmpty)
    // chunk size near Int.MaxValue must not wrap the bounds check
    val overflow = "RIFFxxxxAVI ".getBytes ++ "LIST".getBytes ++
      Array[Byte](0xf8.toByte, 0xff.toByte, 0xff.toByte, 0x7f)
    assert(AviCodec.decodeMeta(overflow).isEmpty)
    // a WAV payload is a RIFF but not an AVI; an AVI is not a WAV
    val wav = graft.multimodal.WavCodec.encode(
      graft.multimodal.WavCodec.Clip(8000, 1, Array[Short](1, -1)))
    assert(AviCodec.decodeMeta(wav).isEmpty)
    assert(graft.multimodal.WavCodec.decode(avi).isEmpty)
  }

  test("AVI DIB frames: encode/decode round-trips every raster " +
    "byte-exactly; non-DIB handlers and torn frame chunks refuse") {
    import graft.multimodal.{AviCodec, PpmCodec}
    // a 5×3 frame exercises the 4-byte row padding (stride 16 ≠ 15)
    val f0 = PpmCodec.Image(5, 3,
      Array.tabulate(5 * 3 * 3)(i => ((i * 37 + 11) & 0xff).toByte))
    val f1 = PpmCodec.Image(5, 3,
      Array.tabulate(5 * 3 * 3)(i => ((i * 101 + 5) & 0xff).toByte))
    val avi = AviCodec.encodeFrames(5, 3, Seq(f0, f1))
    val (meta, frames) = AviCodec.decodeFrames(avi)
      .getOrElse(fail("frame decode failed"))
    assert(meta.width === 5 && meta.height === 3 && meta.nFrames === 2)
    assert(meta.handler === "DIB")
    assert(frames.size === 2)
    assert(frames(0).rgb.toSeq === f0.rgb.toSeq)
    assert(frames(1).rgb.toSeq === f1.rgb.toSeq)
    // decodeMeta still reads the same container (honest single parse)
    assert(AviCodec.decodeMeta(avi).get === meta)
    // a non-DIB container parses metadata but refuses frame decode
    val mjpg = AviCodec.encodeMeta(AviCodec.VideoMeta(5, 3, 2, 100, "MJPG"))
    assert(AviCodec.decodeMeta(mjpg).isDefined)
    assert(AviCodec.decodeFrames(mjpg).isEmpty)
    // a torn frame chunk (wrong byte count for the raster) refuses
    val torn = avi.clone()
    // shrink the first 00db chunk's declared size by one row
    val idx = torn.indexOfSlice("00db".getBytes)
    assert(idx > 0)
    torn(idx + 4) = (torn(idx + 4) - 16).toByte
    assert(AviCodec.decodeFrames(torn).isEmpty)
    assert(AviCodec.decodeFrames(avi.dropRight(1)).isEmpty)
    // a frame chunk crossing its movi LIST's declared end must refuse
    // even when the bytes are still inside the payload (a truncated
    // list size with a following chunk would otherwise copy the NEXT
    // chunk's bytes into the raster)
    val crossed = avi ++ Array.fill[Byte](64)(0x7f)
    val mv = crossed.indexOfSlice("movi".getBytes)
    assert(mv > 8)
    crossed(mv - 4) = (crossed(mv - 4) - 16).toByte // shrink LIST size
    assert(AviCodec.decodeFrames(crossed).isEmpty)
  }

  test("vHash: brightness-shifted re-encoded clip copies land within " +
    "median hamming 4 per frame, distinct clips far; the clip gate " +
    "finds every planted copy at recall/precision 1.0") {
    import graft.functions.{PHash64, VHashFrames}
    import graft.multimodal.{AviCodec, Multimodal => MM}
    def ham(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)
    def frameHashes(payload: Array[Byte]): Seq[Long] = {
      val arr = VHashFrames.compute(payload)
      assert(arr != null, "fixture clip must decode")
      arr.toLongArray().toSeq
    }
    val ids = Seq(1L, 5L, 13L, 101L, 2021L)
    for (id <- ids) {
      val base = frameHashes(MM.renderVideo(id, copy = false))
      val near = frameHashes(MM.renderVideo(id, copy = true))
      assert(base.size === 8 && near.size === 8)
      // every aligned frame pair within the image family's bound
      base.zip(near).zipWithIndex.foreach { case ((a, b), j) =>
        assert(ham(a, b) <= 4,
          s"doc $id frame $j: copy at hamming ${ham(a, b)}")
      }
      // frames of ONE clip are distinct (the motion band moves)
      assert(base.distinct.size > 1, s"doc $id: static clip")
    }
    // distinct clips' aligned frames are far apart
    for (Seq(a, b) <- ids.combinations(2)) {
      val fa = frameHashes(MM.renderVideo(a, copy = false))
      val fb = frameHashes(MM.renderVideo(b, copy = false))
      val aligned = fa.zip(fb).map { case (x, y) => ham(x, y) }.sorted
      assert(aligned(aligned.size / 2) > 4,
        s"docs $a/$b: median ${aligned(aligned.size / 2)}")
    }
    // undecodable payloads are null, not a throw; frame hashes equal
    // the image kernel on the same raster (one function of the pixels)
    assert(VHashFrames.compute("not an avi".getBytes) == null)
    val (_, fs) = AviCodec.decodeFrames(MM.renderVideo(7L, copy = false)).get
    assert(frameHashes(MM.renderVideo(7L, copy = false)).head ===
      PHash64.computeImage(fs.head))
    // end to end on the fixture corpus: every planted (id, id+1e6)
    // pair surfaces and nothing else (hash-checked by the driver
    // ledger at sf0.01)
    val rec = MM.qVhashRecall(spark, dir).collect().head
    val planted = Tables.documents(spark, dir)
      .filter(col("doc_id") % 4 === 1).count()
    assert(rec.getAs[Long]("n_truth") === planted)
    assert(rec.getAs[Long]("n_hit") === planted)
    assert(rec.getAs[Double]("recall") === 1.0)
    assert(rec.getAs[Double]("precision") === 1.0)
  }

  test("videoMeta kernel parses AVI payloads end-to-end; frame sampling " +
    "runs on parsed duration") {
    import spark.implicits._
    import graft.multimodal.AviCodec
    val meta = AviCodec.VideoMeta(320, 240, 90, 33333, "MJPG")
    val avi = AviCodec.encodeMeta(meta)
    val rows = Seq(
      Multimodal.MediaRow(1L, "video", avi,
        Multimodal.MediaMeta(0, 0, 0, 0, "avi")),
      Multimodal.MediaRow(2L, "video", Array[Byte](9, 9, 9),
        Multimodal.MediaMeta(0, 0, 0, 0, "bin")))
    val ds = spark.createDataset(rows)
    val got = Multimodal.videoMeta(ds).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(got(1L).getInt(1) === 320 && got(1L).getInt(2) === 240)
    assert(got(1L).getInt(3) === 90)
    assert(got(1L).getLong(4) === 33333L * 90 / 1000)
    assert(got(1L).getString(5) === "MJPG")
    assert(got(2L).getInt(1) === 0, "unparsable rows come back zeroed")
    // header_ok now recognizes the real container too
    val feats = Multimodal.extractFeatures(ds).collect()
      .map(f => f.media_id -> f.header_ok).toMap
    assert(feats(1L) && !feats(2L))
    // relational frame sampling driven by PARSED duration: 2999 ms at
    // 1000 ms cadence → offsets 0,1000,2000
    val parsed = Multimodal.videoMeta(ds)
    val media = parsed.filter(col("width") > 0)
      .select(col("media_id"), lit("video").as("modality"),
        struct(col("width"), col("height"),
          lit(0).as("sampleRate"),
          col("duration_ms").cast("int").as("durationMs"),
          col("handler").as("format")).as("meta"))
    val frames = Multimodal.frameSamplePlan(media, everyMs = 1000)
      .collect().map(_.getInt(1).toLong).sorted
    assert(frames === Array(0L, 1000L, 2000L))
  }

  test("WAV codec: decodes a hand-built PCM clip and round-trips it") {
    import graft.multimodal.WavCodec
    // 8 kHz mono, 8 frames: a square wave crossing zero every 2 frames
    val samples = Array[Short](
      1000, 1000, -1000, -1000, 1000, 1000, -1000, -1000)
    val wav = WavCodec.encode(WavCodec.Clip(8000, 1, samples))
    val clip = WavCodec.decode(wav).getOrElse(fail("decode failed"))
    assert(clip.sampleRate === 8000 && clip.channels === 1)
    assert(clip.samples.toSeq === samples.toSeq)
    assert(clip.durationMs === 1L) // 8 frames / 8000 Hz = 1 ms
    assert(WavCodec.zeroCrossings(clip) === 3)
    // amplitude histogram buckets by high byte: 1000 -> 3, -1000 -> 252
    val hist = WavCodec.amplitudeHistogram(clip)
    assert(hist(3) === 4 && hist(252) === 4 && hist.sum === 8)
    // malformed containers refuse, never throw
    assert(WavCodec.decode(wav.dropRight(1)).isEmpty)
    assert(WavCodec.decode("RIFFxxxxWAVE".getBytes).isEmpty)
    assert(WavCodec.decode(Array[Byte](1, 2, 3)).isEmpty)
    // a chunk size near Int.MaxValue must not wrap the bounds check
    // negative (body + size overflow) — refuse, don't throw/allocate
    val overflow = "RIFFxxxxWAVE".getBytes ++ "data".getBytes ++
      Array[Byte](0xf8.toByte, 0xff.toByte, 0xff.toByte, 0x7f) // 0x7ffffff8
    assert(WavCodec.decode(overflow).isEmpty)
  }

  test("kernels run the real audio codec end-to-end on WAV payloads") {
    import spark.implicits._
    import graft.multimodal.WavCodec
    val samples = Array[Short](100, -100, 200, -200, 300, -300)
    val wav = WavCodec.encode(WavCodec.Clip(16000, 1, samples))
    val rows = Seq(
      Multimodal.MediaRow(1L, "audio", wav,
        Multimodal.MediaMeta(0, 0, 16000, 0, "wav")),
      Multimodal.MediaRow(2L, "audio", Array[Byte](9, 9, 9),
        Multimodal.MediaMeta(0, 0, 0, 0, "bin")))
    val ds = spark.createDataset(rows)
    val feats = Multimodal.extractFeatures(ds)
      .collect().map(f => f.media_id -> f).toMap
    // header_ok through the WAV path; histogram over sample high bytes
    assert(feats(1L).header_ok)
    val expectedSupport = samples.map(s => (s >> 8) & 0xff).distinct.length
    assert(feats(1L).histogram_nonzero === expectedSupport)
    assert(!feats(2L).header_ok)
    val audio = Multimodal.audioFeatures(ds)
      .collect().map(r => r.getLong(0) -> r).toMap
    val a = audio(1L)
    assert(a.getInt(1) === 16000 && a.getInt(2) === 1)
    val expRms = math.round(math.sqrt(
      samples.map(s => s.toDouble * s).sum / samples.length) * 100) / 100.0
    assert(a.getDouble(4) === expRms)
    assert(a.getLong(5) === 5) // sign alternates at every step
    assert(audio(2L).getInt(1) === 0, "undecodable row stays zeroed")
  }

  test("audio resample: nearest-neighbor halving, duration preserved") {
    import spark.implicits._
    import graft.multimodal.WavCodec
    // 16 kHz stereo ramp: frame f carries (2f, 2f+1) so the source frame
    // of every output sample is recoverable from its value
    val frames = 16
    val samples = Array.tabulate[Short](frames * 2)(i => i.toShort)
    val clip = WavCodec.Clip(16000, 2, samples)
    val down = WavCodec.resample(clip, 8000)
    assert(down.sampleRate === 8000 && down.channels === 2)
    assert(down.nFrames === frames / 2)
    assert(down.durationMs === clip.durationMs)
    // output frame f == source frame 2f, both channels
    (0 until down.nFrames).foreach { f =>
      assert(down.samples(2 * f) === (4 * f).toShort)
      assert(down.samples(2 * f + 1) === (4 * f + 1).toShort)
    }
    // same-rate resample is the identity on samples
    val same = WavCodec.resample(clip, 16000)
    assert(same.samples.toSeq === clip.samples.toSeq)
    // kernel end-to-end: WAV rows re-encode at the target rate with
    // consistent meta; unclaimed rows pass through untouched
    val rows = Seq(
      Multimodal.MediaRow(1L, "audio", WavCodec.encode(clip),
        Multimodal.MediaMeta(0, 0, 16000, 1, "wav")),
      Multimodal.MediaRow(2L, "audio", Array[Byte](9, 9, 9),
        Multimodal.MediaMeta(0, 0, 0, 0, "bin")))
    val out = Multimodal.resampleAudio(spark.createDataset(rows), 8000)
      .collect().map(r => r.media_id -> r).toMap
    val dec = WavCodec.decode(out(1L).payload).getOrElse(fail("re-decode"))
    assert(dec.sampleRate === 8000 && dec.nFrames === frames / 2)
    assert(out(1L).meta.sampleRate === 8000)
    assert(out(2L).payload.toSeq === Seq[Byte](9, 9, 9))
  }

  test("frame sample plan emits offsets within duration") {
    val media = Multimodal.mediaTable(spark, dir).toDF()
    val frames = Multimodal.frameSamplePlan(media, everyMs = 10000).cache()
    assert(frames.count() > 0)
    val bad = frames.join(media, "media_id")
      .filter(col("offset_ms") > col("meta.durationMs"))
    assert(bad.count() === 0)
    frames.unpersist()
  }
}
