package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Hashed-bag-of-words linear classifier inference in ONE compiled pass —
  * the fastText-style model-based quality filter modern curation stacks run
  * over every document (FineWeb/DCLM shape): tokenize, hash each token into
  * `buckets` feature slots, accumulate the slot's weight, emit the integer
  * score. Weights are a deterministic pseudo-model
  * `w(b) = ((b * 2654435761) mod 2001) - 1000 ∈ [-1000, 1000]` so the
  * operator is oracle-checkable end to end; swapping in a trained weight
  * vector changes one line, not the plan.
  *
  * Tokenizer and per-token hash are IDENTICAL to [[CharFoldHash]] /
  * [[SpanHashes]] (single-space split, empties kept, acc=7;
  * acc=(acc·31+cp) mod 1e9+7 over code points), so the whole pass is
  * bit-identical to the composable HOF form
  * `aggregate(transform(split(text,' '), t -> w(char_fold_hash(t))), 0L,
  * (a,x) -> a+x)` and to the DuckDB
  * `list_sum(list_transform(string_split(text,' '), t -> w(hash(t))))`
  * twin — with ONE caveat both twins share repo-wide: an EMPTY token
  * hashes to 7 here (CharFoldHash/SpanHashes convention: no characters
  * folded), while a split("")+ascii() re-derivation of the hash folds one
  * phantom ascii-0 char (217). Irrelevant under the corpus contract
  * (single-space tokenization, no empty tokens), spec-pinned either way. Exists as a fused expression for the same reason [[SpanHashes]]
  * does: HOF lambdas evaluate interpreted per element, and model scoring
  * runs over EVERY token of a 100 TB corpus — here it is one compiled
  * loop per row with zero intermediate arrays. All arithmetic is integer,
  * hence engine-portable.
  */
case class HashedLinearScore(child: Expression, buckets: Int)
    extends UnaryExpression with CodegenFallback {
  require(buckets >= 1, s"bucket count must be >= 1, got $buckets")
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    val M = 1000000007L
    var score = 0L
    var acc = 7L
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      if (cp == ' ') { score += HashedLinearScore.weight(acc, buckets); acc = 7L }
      else acc = (acc * 31L + cp) % M
      i += Character.charCount(cp)
    }
    score + HashedLinearScore.weight(acc, buckets)
  }

  override protected def withNewChildInternal(newChild: Expression): HashedLinearScore =
    copy(child = newChild)
}

object HashedLinearScore {
  /** Deterministic pseudo-weight for feature slot `h mod buckets`. */
  def weight(h: Long, buckets: Int): Long =
    ((h % buckets) * 2654435761L) % 2001L - 1000L

  import org.apache.spark.sql.GraftBridge
  def apply(c: Column, buckets: Int): Column =
    GraftBridge.column(HashedLinearScore(GraftBridge.expression(c), buckets))
}
