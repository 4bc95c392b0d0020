package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions.{DotProduct, FnvHash64, WordNGrams}

/** Spark extension entry point: registers graft's native expressions as
  * permanent SQL functions in every session, so a cluster configured with
  *
  *   spark.sql.extensions=graft.GraftExtensions
  *
  * can call `fnv_hash64(text)` / `dot_product(a, b)` from pure SQL (JDBC,
  * thrift, notebooks) without any Scala import — the standard way a Spark
  * library ships custom Catalyst expressions. The per-session
  * `createOrReplaceTempFunction` registration in each object remains for
  * programmatic use.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("fnv_hash64"),
      new ExpressionInfo(classOf[FnvHash64].getName, "fnv_hash64"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 1,
          s"fnv_hash64 expects 1 argument, got ${exprs.length}")
        FnvHash64(exprs.head)
      }))
    ext.injectFunction((
      new FunctionIdentifier("dot_product"),
      new ExpressionInfo(classOf[DotProduct].getName, "dot_product"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 2,
          s"dot_product expects 2 arguments, got ${exprs.length}")
        DotProduct(exprs(0), exprs(1))
      }))
    ext.injectFunction((
      new FunctionIdentifier("word_ngrams"),
      new ExpressionInfo(classOf[WordNGrams].getName, "word_ngrams"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 2,
          s"word_ngrams expects 2 arguments, got ${exprs.length}")
        require(exprs(1).foldable,
          "word_ngrams n must be a literal")
        WordNGrams(exprs(0), exprs(1).eval().asInstanceOf[Number].intValue())
      }))
  }
}
