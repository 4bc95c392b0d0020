package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `array<float|double>` embedding columns.
  *
  * The pair-wise hot path (dot/norm/cosine — executed once per candidate
  * PAIR in ANN and near-dup operators) runs on the native codegen'd
  * [[DotProduct]] expression: one fused multiply-accumulate loop inside
  * WholeStageCodegen, no per-pair array allocation, float arrays accepted
  * directly (no interpreted `transform(cast)` pre-pass). The sequential
  * accumulation order is identical to the higher-order-function left fold
  * it replaced, so results are bit-equal and engine-portable.
  */
object VectorFunctions {

  def toDouble(v: Column): Column = transform(v, x => x.cast("double"))

  def dot(a: Column, b: Column): Column = DotProduct.dot_product(a, b)

  def norm2(a: Column): Column = sqrt(dot(a, a))

  def cosineSimilarity(a: Column, b: Column): Column =
    dot(a, b) / (norm2(a) * norm2(b))

  /** L2 over the (tiny) centroid-ranking path; the HOF form is fine there
    * and keeps the subtract-square accumulation order explicit.
    */
  def l2Distance(a: Column, b: Column): Column =
    sqrt(aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)), lit(0.0), (acc, x) => acc + x))
}
