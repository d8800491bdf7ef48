package graft

import graft.functions.CharFoldHash
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SparkSessionExtensions entry point: registers graft's custom Catalyst
  * expressions as SQL functions, so `spark.sql("SELECT char_fold_hash(text)")`
  * works cluster-wide via
  * `--conf spark.sql.extensions=graft.GraftExtensions`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftExtensions.functions.foreach { case (ident, info, builder) =>
      ext.injectFunction((ident, info, builder))
    }
    ext.injectOptimizerRule(_ => graft.plans.CharFoldRewrite)
  }
}

object GraftExtensions {
  private val functions: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] =
    Seq(
      (FunctionIdentifier("char_fold_hash"),
        new ExpressionInfo(classOf[CharFoldHash].getName, "char_fold_hash"),
        (args: Seq[Expression]) => CharFoldHash(args.head)),
      (FunctionIdentifier("vector_dot"),
        new ExpressionInfo(classOf[graft.functions.VectorDot].getName, "vector_dot"),
        (args: Seq[Expression]) => graft.functions.VectorDot(args(0), args(1))),
      (FunctionIdentifier("span_hashes"),
        new ExpressionInfo(classOf[graft.functions.SpanHashes].getName, "span_hashes"),
        (args: Seq[Expression]) => graft.functions.SpanHashes(args(0),
          args(1).eval().asInstanceOf[Int])))

  /** Imperative registration for an already-built session (tests, REPL). */
  def register(spark: SparkSession): Unit =
    functions.foreach { case (ident, info, builder) =>
      spark.sessionState.functionRegistry.registerFunction(ident, info, builder)
    }
}
