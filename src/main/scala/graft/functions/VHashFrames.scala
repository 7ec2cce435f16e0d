package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, LongType}

/** Per-frame perceptual VIDEO fingerprints of a binary AVI payload —
  * the clip-level member of the near-dup family next to [[PHash64]]
  * (images) and [[AHash64]] (audio): decode the container's
  * uncompressed-DIB frames ([[graft.multimodal.AviCodec.decodeFrames]]
  * — pure-JVM raw-BGR, no codec dependency), sample
  * [[VHashFrames.Frames]] frames EVENLY across the clip (equal
  * fractions of the frame count, so a re-timed delivery samples the
  * same visual positions), and hash each sampled frame with EXACTLY
  * [[PHash64.computeImage]] — clip and image fingerprints are the same
  * function of the pixels, so the video family inherits the image
  * family's measured perturbation bounds (brightness shift + small
  * repaint stays within Hamming 4 per frame).
  *
  * The result is `array<bigint>` of the sampled frames' hashes in
  * order. Clip DISTANCE is defined downstream as the MEDIAN of the
  * per-index frame Hammings ([[graft.operators.Dedup.vhashPairs]]) —
  * the banding argument lives there. A payload the codec rejects
  * (non-AVI, non-DIB handler, torn frame chunk) evaluates to NULL —
  * arrays have no spare sentinel, and consumers filter `isNotNull`
  * exactly as the scalar family filters its Undecodable.
  */
case class VHashFramesExpr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects binary, got ${other.catalogString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any =
    VHashFrames.compute(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"""
         |${ev.value} = graft.functions.VHashFrames$$.MODULE$$.compute($a);
         |${ev.isNull} = ${ev.value} == null;
       """.stripMargin)

  override protected def withNewChildInternal(
      newChild: Expression): VHashFramesExpr = copy(child = newChild)
}

object VHashFrames {

  val functionName = "vhash_frames"

  /** Frames sampled per clip. 8 is the family's granularity sweet
    * spot: the median gate needs enough samples that one edited frame
    * cannot flip the verdict, while per-clip work stays 8 DCT hashes.
    */
  val Frames = 8

  /** Kernel shared by interpreted eval and generated code: the sampled
    * frames' pHashes, or null when the payload has no decodable DIB
    * frames. Sampling is by equal fractions — frame ⌊i·n/k⌋ for
    * i ∈ 0..k−1 — and clips shorter than k frames hash every frame
    * (distance then medians over the shorter aligned prefix).
    */
  def compute(payload: Array[Byte]): ArrayData =
    graft.multimodal.AviCodec.decodeFrames(payload) match {
      case None => null
      case Some((_, frames)) =>
        val n = frames.length
        val k = math.min(Frames, n)
        val out = new Array[Long](k)
        var i = 0
        while (i < k) {
          out(i) = PHash64.computeImage(frames((i.toLong * n / k).toInt))
          i += 1
        }
        new GenericArrayData(out)
    }

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      functionName,
      exprs => VHashFramesExpr(exprs(0)),
      "built-in")

  /** Column API: array<bigint> of per-frame perceptual hashes of a
    * binary AVI payload (null when undecodable).
    */
  def fps(spark: SparkSession, payload: Column): Column = {
    register(spark)
    org.apache.spark.sql.functions.call_function(functionName, payload)
  }
}
