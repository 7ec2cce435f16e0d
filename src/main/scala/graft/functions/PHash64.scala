package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}

/** 64-bit perceptual image hash (pHash) of a binary PPM payload — the
  * standard LLM-pipeline near-dup fingerprint for image columns
  * (resize-, recompression- and brightness-tolerant, unlike the exact
  * byte hash): decode → luma → 32×32 average-map → 2D DCT-II → the
  * low-frequency 8×8 block → one bit per coefficient, set iff it
  * exceeds the median of the 63 AC coefficients. The DC term tracks
  * global brightness and is excluded from the median, so a uniform
  * exposure shift flips (at most) only bit 0 — the invariance a
  * perceptual hash exists for. Same per-row, zero-shuffle shape as
  * [[SimHashFingerprint]]: a codegen'd kernel over the payload bytes;
  * the fingerprints then flow through the SAME 4-chunk Hamming banding
  * (pigeonhole-exact at distance ≤ 3) as the text SimHash family.
  *
  * A payload the PPM codec cannot decode hashes to [[PHash64.Undecodable]]
  * (Long.MinValue) — callers filter it out; the alternative (a nullable
  * kernel) would force the fingerprint out of the primitive-long
  * codegen path for a case the pipeline filters anyway.
  */
case class PHash64Expr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects binary, got ${other.catalogString}")
  }

  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any =
    PHash64.compute(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.PHash64$$.MODULE$$.compute($a);")

  override protected def withNewChildInternal(
      newChild: Expression): PHash64Expr = copy(child = newChild)
}

object PHash64 {

  val functionName = "phash64"

  /** Sentinel for payloads the codec rejects (see class doc). */
  val Undecodable: Long = Long.MinValue

  private val N = 32

  // DCT-II basis, cosT(k)(n) = cos(π/N · (n + ½) · k) — only the first
  // 8 frequencies are ever read (the perceptual low-frequency block)
  private val cosT: Array[Array[Double]] =
    Array.tabulate(8, N)((k, n) => math.cos(math.Pi / N * (n + 0.5) * k))

  /** Kernel shared by interpreted eval and generated code. */
  def compute(payload: Array[Byte]): Long =
    graft.multimodal.PpmCodec.decode(payload) match {
      case None => Undecodable
      case Some(img0) => computeImage(img0)
    }

  /** The raster-level half of [[compute]] — also the per-frame kernel
    * of the video fingerprint ([[VHashFrames]]), which decodes its own
    * container and hands each frame here so clip and image hashes are
    * the SAME function of the pixels.
    */
  private[graft] def computeImage(
      img0: graft.multimodal.PpmCodec.Image): Long = {
    val img = graft.multimodal.PpmCodec.resize(img0, N, N)
    val g = new Array[Double](N * N)
    var i = 0
    while (i < N * N) {
      g(i) = 0.299 * (img.rgb(i * 3) & 0xff) +
        0.587 * (img.rgb(i * 3 + 1) & 0xff) +
        0.114 * (img.rgb(i * 3 + 2) & 0xff)
      i += 1
    }
    // separable DCT, truncated to the 8×8 block actually used:
    // rows for u < 8 (N·8·N mults), then columns for v < 8 (8·8·N)
    val rowT = new Array[Double](N * 8)
    var y = 0
    while (y < N) {
      var u = 0
      while (u < 8) {
        var s = 0.0
        var x = 0
        while (x < N) { s += g(y * N + x) * cosT(u)(x); x += 1 }
        rowT(y * 8 + u) = s
        u += 1
      }
      y += 1
    }
    val f = new Array[Double](64)
    var v = 0
    while (v < 8) {
      var u = 0
      while (u < 8) {
        var s = 0.0
        var yy = 0
        while (yy < N) { s += rowT(yy * 8 + u) * cosT(v)(yy); yy += 1 }
        f(v * 8 + u) = s
        u += 1
      }
      v += 1
    }
    val ac = java.util.Arrays.copyOfRange(f, 1, 64)
    java.util.Arrays.sort(ac)
    val med = ac(31) // median of the 63 AC coefficients
    var fp = 0L
    var j = 0
    while (j < 64) {
      if (f(j) > med) fp |= 1L << j
      j += 1
    }
    sealFp(fp)
  }

  /** Bit 63 is a legitimate position, so a fingerprint whose only set
    * bit is 63 equals the Undecodable sentinel and would be silently
    * dropped; remap one bit away (single-bit Hamming noise, inside the
    * near-dup radius gate). CANONICAL remap for every fingerprint
    * family that shares the Long.MinValue sentinel ([[AHash64]]
    * delegates here) — one definition so the modalities cannot drift
    * apart on sentinel handling.
    */
  private[graft] def sealFp(fp: Long): Long =
    if (fp == Undecodable) Undecodable + 1 else fp

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      functionName,
      exprs => PHash64Expr(exprs(0)),
      "built-in")

  /** Column API: bigint perceptual hash of a binary PPM payload. */
  def fp(spark: SparkSession, payload: Column): Column = {
    register(spark)
    org.apache.spark.sql.functions.call_function(functionName, payload)
  }
}
