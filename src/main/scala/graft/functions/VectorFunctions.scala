package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `array<float>` embedding columns as pure Column
  * expressions (higher-order functions). A codegen'd Catalyst Expression
  * variant lives in graft.functions.expressions and is benchmarked against
  * these — HOFs allocate per-element lambdas and stay outside whole-stage
  * codegen, which is exactly the hot-path cost the native expression
  * removes.
  */
object VectorFunctions {

  /** Dot product in double precision (inputs may be float32 — promote
    * before multiplying so accumulation error stays at double ulp).
    */
  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))
}
