package graft.plans

import graft.functions.CharFoldHash
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{LongType, StringType}

/** Optimizer rule: recognize the engine-portable char-fold written with
  * public functions —
  *   `aggregate(split(s, ""), 7L, (acc, c) -> (acc * 31 + ascii(c)) % 1000000007)`
  * — and replace it with the native codegen'd [[CharFoldHash]] expression.
  *
  * Users (and the DuckDB-oracle-parity docs) write the portable form; the
  * engine runs the fast form. The match is structural and exact: any other
  * fold constants or shapes are left untouched.
  */
object CharFoldRewrite extends Rule[LogicalPlan] {

  private object LongLit {
    def unapply(e: Expression): Option[Long] = e match {
      case Literal(v: Long, LongType) => Some(v)
      case _ => None
    }
  }

  /** `ascii(ch)` possibly wrapped in an implicit cast to long. */
  private object AsciiOf {
    def unapply(e: Expression): Option[Expression] = e match {
      case Cast(Ascii(ch), LongType, _, _) => Some(ch)
      case Ascii(ch) => Some(ch)
      case _ => None
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case ArrayAggregate(
            StringSplit(str, Literal(pat, StringType), _),
            LongLit(7L),
            LambdaFunction(
              Remainder(
                Add(Multiply(acc: NamedLambdaVariable, LongLit(31L), _),
                    AsciiOf(ch: NamedLambdaVariable), _),
                LongLit(1000000007L), _),
              Seq(a1: NamedLambdaVariable, a2: NamedLambdaVariable), _),
            LambdaFunction(fin: NamedLambdaVariable, Seq(f1: NamedLambdaVariable), _))
          if pat != null && pat.toString.isEmpty &&
            acc.exprId == a1.exprId && ch.exprId == a2.exprId &&
            fin.exprId == f1.exprId =>
        CharFoldHash(str)
    }
}
