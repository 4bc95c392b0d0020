package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions.{DotProduct, FnvHash64, IntersectSize, WordNGrams}
import graft.functions.PqFunctions.{L2Normalize, PqAdc, PqEncode, PqTable}

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
    ext.injectFunction((
      new FunctionIdentifier("intersect_size"),
      new ExpressionInfo(classOf[IntersectSize].getName, "intersect_size"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 2,
          s"intersect_size expects 2 arguments, got ${exprs.length}")
        IntersectSize(exprs(0), exprs(1))
      }))
    ext.injectFunction((
      new FunctionIdentifier("l2_normalize"),
      new ExpressionInfo(classOf[L2Normalize].getName, "l2_normalize"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 1,
          s"l2_normalize expects 1 argument, got ${exprs.length}")
        L2Normalize(exprs.head)
      }))
    // pq_encode/pq_table carry their geometry (m, ksub) as constructor
    // parameters baked into codegen — the SQL surface takes them as
    // literal arguments, the word_ngrams pattern
    def litInt(e: Expression, fn: String, arg: String): Int = {
      require(e.foldable, s"$fn $arg must be a literal")
      e.eval().asInstanceOf[Number].intValue()
    }
    ext.injectFunction((
      new FunctionIdentifier("pq_encode"),
      new ExpressionInfo(classOf[PqEncode].getName, "pq_encode"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 4,
          s"pq_encode expects (vec, codebooks, m, ksub), got ${exprs.length} args")
        PqEncode(exprs(0), exprs(1),
          litInt(exprs(2), "pq_encode", "m"), litInt(exprs(3), "pq_encode", "ksub"))
      }))
    ext.injectFunction((
      new FunctionIdentifier("pq_table"),
      new ExpressionInfo(classOf[PqTable].getName, "pq_table"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 4,
          s"pq_table expects (vec, codebooks, m, ksub), got ${exprs.length} args")
        PqTable(exprs(0), exprs(1),
          litInt(exprs(2), "pq_table", "m"), litInt(exprs(3), "pq_table", "ksub"))
      }))
    ext.injectFunction((
      new FunctionIdentifier("pq_adc"),
      new ExpressionInfo(classOf[PqAdc].getName, "pq_adc"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 2,
          s"pq_adc expects (code, table), got ${exprs.length} args")
        PqAdc(exprs(0), exprs(1))
      }))
  }
}
