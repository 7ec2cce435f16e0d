package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}

/** 64-bit perceptual AUDIO fingerprint of a binary WAV payload — the
  * chromaprint-shaped spectral near-dup hash completing the family
  * next to [[PHash64]] (images) and [[SimHashFingerprint]] (text):
  * decode → mono mixdown → nearest-neighbor resample to the canonical
  * 4 kHz analysis rate (so bands are absolute Hz regardless of source
  * rate) → 16 equal TIME FRAMES (equal fractions of the clip, so a
  * duration change rescales rather than shifts the grid) → per frame
  * the energy of 5 OCTAVE BANDS (62.5·2^b .. 125·2^b Hz, b ∈ 0..4),
  * each the SUM of its DFT bins' powers, one Goertzel recurrence per
  * bin (the frame-banded DFT: ~⌊N/2⌋ recurrences of O(N), no FFT
  * machinery) → one bit per band b ∈ 0..3, set iff that band's energy
  * exceeds the frame's across-band MEAN. 16 frames × 4 bands =
  * 64 bits.
  *
  * Why occupancy-vs-mean bits over full-bin energies: a gain change
  * scales every band's energy AND the mean by the same factor, so the
  * comparison is exactly gain-invariant (modulo 16-bit quantization
  * noise); a small pitch shift moves a tone across BINS but not
  * BANDS, and summing whole bins makes band energy Parseval-stable
  * under that movement — unlike adjacent-band energy ORDERING on a
  * sparse probe grid, whose scalloping and empty-vs-empty leakage
  * comparisons flip bits under ±2% shifts (measured: hamming 6 with a
  * Haar cascade, 5 with sparse probes, ≤ 4 with this design on the
  * planted fixture). These are the transposition + level-change
  * perturbations an audio near-dup pipeline must see through while
  * byte-level hashes cannot. Same per-row, zero-shuffle shape as
  * [[PHash64]]: a codegen'd kernel over the payload bytes; the
  * fingerprints then flow through the SAME generalized Hamming
  * banding ([[graft.operators.Dedup.hammingPairs]]) as the rest of
  * the family.
  *
  * A payload the WAV codec cannot decode (or too short to frame)
  * hashes to [[AHash64.Undecodable]] (Long.MinValue) — callers filter
  * it out, keeping the kernel on the primitive-long codegen path.
  */
case class AHash64Expr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects binary, got ${other.catalogString}")
  }

  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any =
    AHash64.compute(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.AHash64$$.MODULE$$.compute($a);")

  override protected def withNewChildInternal(
      newChild: Expression): AHash64Expr = copy(child = newChild)
}

object AHash64 {

  val functionName = "ahash64"

  /** Sentinel for payloads the codec rejects (see class doc). */
  val Undecodable: Long = Long.MinValue

  private val TargetRate = 4000
  private val Frames = 16
  private val Bands = 5
  private val BandLow = 62.5 // Hz; band b spans [BandLow·2^b, BandLow·2^(b+1))

  /** Kernel shared by interpreted eval and generated code. */
  def compute(payload: Array[Byte]): Long =
    graft.multimodal.WavCodec.decode(payload) match {
      case None => Undecodable
      case Some(clip) => fingerprint(clip)
    }

  private def fingerprint(clip: graft.multimodal.WavCodec.Clip): Long = {
    val n0 = clip.nFrames
    if (n0 < Frames * 2) return Undecodable
    // mono mixdown: channel average, double-precision
    val mono = new Array[Double](n0)
    var f = 0
    while (f < n0) {
      var s = 0.0
      var c = 0
      while (c < clip.channels) {
        s += clip.samples(f * clip.channels + c); c += 1
      }
      mono(f) = s / clip.channels
      f += 1
    }
    // nearest-neighbor resample to the canonical analysis rate — the
    // [[graft.multimodal.WavCodec.resample]] rule on the mono array
    val x =
      if (clip.sampleRate == TargetRate) mono
      else {
        val n = math.max(Frames * 2,
          (n0.toLong * TargetRate / clip.sampleRate).toInt)
        val out = new Array[Double](n)
        var i = 0
        while (i < n) {
          out(i) = mono(math.min(
            (i.toLong * clip.sampleRate / TargetRate).toInt, n0 - 1))
          i += 1
        }
        out
      }
    val flen = x.length / Frames
    if (flen < 2) return Undecodable
    // the frame's DFT grid: every bin whose frequency k·fs/N falls in
    // some octave band is measured by one Goertzel recurrence, and a
    // band's energy is the SUM over its bins — Parseval makes that
    // nearly invariant to where a tone sits relative to the grid, so a
    // ±2% pitch shift (which moves the tone across bins but not bands)
    // barely moves the band energy; a sparse probe grid's scalloping
    // (measured: 1-2 extra planted-pair bit flips) is eliminated
    val kMin = math.max(1, math.ceil(BandLow * flen / TargetRate).toInt)
    val kMax = math.min(flen / 2 - 1,
      math.floor(BandLow * 32 * flen / TargetRate).toInt)
    if (kMax < kMin) return Undecodable
    val nk = kMax - kMin + 1
    val coeff = new Array[Double](nk)
    val bandOf = new Array[Int](nk)
    var k = kMin
    while (k <= kMax) {
      coeff(k - kMin) = 2.0 * math.cos(2.0 * math.Pi * k / flen)
      val f = k.toDouble * TargetRate / flen
      var b = 0
      while (b < Bands - 1 && f >= BandLow * (1 << (b + 1))) b += 1
      bandOf(k - kMin) = b
      k += 1
    }
    val e = new Array[Double](Bands)
    var fp = 0L
    var fr = 0
    while (fr < Frames) {
      val off = fr * flen
      java.util.Arrays.fill(e, 0.0)
      var total = 0.0
      var j = 0
      while (j < nk) {
        val c = coeff(j)
        var s1 = 0.0
        var s2 = 0.0
        var i = 0
        while (i < flen) {
          val s0 = x(off + i) + c * s1 - s2
          s2 = s1; s1 = s0
          i += 1
        }
        val pw = s1 * s1 + s2 * s2 - c * s1 * s2
        e(bandOf(j)) += pw
        total += pw
        j += 1
      }
      var bb = 0
      while (bb < Bands - 1) {
        if (e(bb) * Bands > total) fp |= 1L << (fr * (Bands - 1) + bb)
        bb += 1
      }
      fr += 1
    }
    sealFp(fp)
  }

  /** All 64 bit positions are reachable (frame 15, band 3 is bit 63),
    * so a clip whose ONLY above-mean bit is that one would hash to the
    * Undecodable sentinel and be silently dropped by every
    * `=!= Undecodable` consumer — the same collision as the
    * image/video family; delegate to the CANONICAL remap in
    * [[PHash64.sealFp]] so the modalities cannot drift apart on
    * sentinel handling.
    */
  private[graft] def sealFp(fp: Long): Long = PHash64.sealFp(fp)

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      functionName,
      exprs => AHash64Expr(exprs(0)),
      "built-in")

  /** Column API: bigint perceptual hash of a binary WAV payload. */
  def fp(spark: SparkSession, payload: Column): Column = {
    register(spark)
    org.apache.spark.sql.functions.call_function(functionName, payload)
  }
}
