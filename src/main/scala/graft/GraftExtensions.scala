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
  /** A clear AnalysisException (USER_RAISED_EXCEPTION carries the message
    * verbatim) instead of the raw ClassCastException/IndexOutOfBounds a bad
    * SQL call would otherwise surface from inside the builder. */
  private def analysisError(msg: String): Nothing =
    throw new org.apache.spark.sql.AnalysisException(
      errorClass = "USER_RAISED_EXCEPTION",
      messageParameters = Map("errorMessage" -> msg))

  private def requireArity(name: String, args: Seq[Expression], n: Int): Unit =
    if (args.length != n)
      analysisError(s"$name takes exactly $n argument(s), got ${args.length}")

  /** `width` must be a foldable integral (INT or BIGINT) literal — accept
    * `span_hashes(text, 10)` and `span_hashes(text, 10L)`, reject strings,
    * NULLs, and non-foldable expressions with an analysis error. */
  private def foldableInt(name: String, arg: String, e: Expression): Int = {
    if (!e.foldable)
      analysisError(s"$name: $arg must be a constant integer, got non-foldable ${e.sql}")
    val v = e.eval() match {
      case i: java.lang.Integer => i.intValue()
      case l: java.lang.Long if l.longValue().isValidInt => l.intValue()
      case other =>
        analysisError(s"$name: $arg must be an INT or BIGINT literal, got " +
          (if (other == null) "NULL" else s"${e.dataType.sql} ($other)"))
    }
    // range-check here too: a raw require() from the expression's
    // constructor would otherwise escape the builder un-wrapped.
    // Upper bound: these parameters size per-row work and struct width
    // (min_hash_sig builds a k-field struct and does O(k) per shingle) — an
    // unbounded SQL literal like k = 100000000 would hang or OOM execution
    // from a single query string. 1024 is far above any real signature.
    if (v < 1) analysisError(s"$name: $arg must be >= 1, got $v")
    if (v > 1024) analysisError(s"$name: $arg must be <= 1024, got $v")
    v
  }

  private val functions: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] =
    Seq(
      (FunctionIdentifier("char_fold_hash"),
        new ExpressionInfo(classOf[CharFoldHash].getName, "char_fold_hash"),
        (args: Seq[Expression]) => {
          requireArity("char_fold_hash", args, 1)
          CharFoldHash(args.head)
        }),
      (FunctionIdentifier("vector_dot"),
        new ExpressionInfo(classOf[graft.functions.VectorDot].getName, "vector_dot"),
        (args: Seq[Expression]) => {
          requireArity("vector_dot", args, 2)
          graft.functions.VectorDot(args(0), args(1))
        }),
      (FunctionIdentifier("span_hashes"),
        new ExpressionInfo(classOf[graft.functions.SpanHashes].getName, "span_hashes"),
        (args: Seq[Expression]) => {
          requireArity("span_hashes", args, 2)
          graft.functions.SpanHashes(args(0),
            foldableInt("span_hashes", "width", args(1)))
        }),
      (FunctionIdentifier("min_hash_sig"),
        new ExpressionInfo(classOf[graft.functions.MinHashSig].getName, "min_hash_sig"),
        (args: Seq[Expression]) => {
          requireArity("min_hash_sig", args, 3)
          graft.functions.MinHashSig(args(0),
            foldableInt("min_hash_sig", "width", args(1)),
            foldableInt("min_hash_sig", "k", args(2)))
        }))

  /** Imperative registration for an already-built session (tests, REPL). */
  def register(spark: SparkSession): Unit =
    functions.foreach { case (ident, info, builder) =>
      spark.sessionState.functionRegistry.registerFunction(ident, info, builder)
    }
}
