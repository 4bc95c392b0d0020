package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `array<float>` embedding columns, as pure Catalyst
  * higher-order-function expressions (`zip_with` + `aggregate`), which
  * codegen and need no UDF. Elements are cast to double first so the
  * sequential left-fold is bit-deterministic and engine-portable.
  */
object VectorFunctions {

  def toDouble(v: Column): Column = transform(v, x => x.cast("double"))

  /** Sequential left-fold sum — deterministic IEEE order. */
  private def fsum(v: Column): Column =
    aggregate(v, lit(0.0), (acc, x) => acc + x)

  def dot(a: Column, b: Column): Column =
    fsum(zip_with(a, b, (x, y) => x * y))

  def norm2(a: Column): Column = sqrt(fsum(zip_with(a, a, (x, y) => x * y)))

  def cosineSimilarity(a: Column, b: Column): Column =
    dot(a, b) / (norm2(a) * norm2(b))

  def l2Distance(a: Column, b: Column): Column =
    sqrt(fsum(zip_with(a, b, (x, y) => (x - y) * (x - y))))
}
