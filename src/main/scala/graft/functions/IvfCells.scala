package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions.{call_function, lit, typedLit}
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, IntegerType}

/** The `nprobe` IVF cells nearest to a vector — cell ids of the
  * centroids with the highest cosine similarity, best first (ties by
  * smaller cell id).
  *
  * One codegen'd kernel serves both sides of an IVF search: corpus
  * assignment is `nprobe = 1` (each vector's single home cell) and query
  * probing is `nprobe = p` — both pure scan-side maps, no shuffle, same
  * shape as [[LshBuckets]]. Centroids arrive L2-NORMALIZED (the builder
  * normalizes), so ranking by raw dot product equals ranking by cosine —
  * the row's own norm is a common positive factor and cancels, saving a
  * sqrt per centroid per row.
  *
  * The centroid matrix is baked into the expression as a literal
  * (`nlist × dim` doubles — IVF practice keeps nlist ≈ √n, comfortably
  * broadcast-sized even at corpus scale).
  */
case class IvfCells(
    child: Expression, centroids: Array[Array[Double]], nprobe: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<float>, got ${other.catalogString}")
  }

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    IvfCells.computeCells(input.asInstanceOf[ArrayData], centroids, nprobe)

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cRef = ctx.addReferenceObj("ivfCentroids", centroids, "double[][]")
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.IvfCells$$.MODULE$$" +
        s".computeCells($a, $cRef, $nprobe);")
  }

  override protected def withNewChildInternal(
      newChild: Expression): IvfCells = copy(child = newChild)
}

object IvfCells {

  val functionName = "ivf_cells"

  /** Kernel shared by interpreted eval and generated code: nlist dot
    * products, then a selection pass per probe slot (nprobe is small, so
    * O(nlist × nprobe) selection beats a heap).
    */
  def computeCells(
      vec: ArrayData, centroids: Array[Array[Double]],
      nprobe: Int): ArrayData = {
    val nlist = centroids.length
    val dim = vec.numElements()
    val scores = new Array[Double](nlist)
    var c = 0
    while (c < nlist) {
      val ctr = centroids(c)
      val n = math.min(dim, ctr.length)
      var s = 0.0
      var i = 0
      while (i < n) { s += vec.getFloat(i) * ctr(i); i += 1 }
      scores(c) = s
      c += 1
    }
    val k = math.min(nprobe, nlist)
    val out = new Array[Int](k)
    val taken = new Array[Boolean](nlist)
    var slot = 0
    while (slot < k) {
      var best = -1
      var bestScore = Double.NegativeInfinity
      var j = 0
      while (j < nlist) {
        if (!taken(j) && scores(j) > bestScore) { best = j; bestScore = scores(j) }
        j += 1
      }
      taken(best) = true
      out(slot) = best
      slot += 1
    }
    new GenericArrayData(out)
  }

  private def foldMatrix(e: Expression): Array[Array[Double]] = {
    val ad = e.eval().asInstanceOf[ArrayData]
    Array.tabulate(ad.numElements())(i => ad.getArray(i).toDoubleArray())
  }

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      functionName,
      exprs => IvfCells(exprs(0), foldMatrix(exprs(1)),
        ExprArgs.literalInt(exprs(2), s"$functionName nprobe")),
      "built-in")

  /** Column API: `array<int>` of the nprobe nearest cell ids. */
  def cells(
      spark: SparkSession, v: Column,
      centroids: Array[Array[Double]], nprobe: Int): Column = {
    register(spark)
    call_function(functionName, v,
      typedLit(centroids.map(_.toSeq).toSeq), lit(nprobe))
  }
}
