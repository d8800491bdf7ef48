package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** All `width`-token sliding-span signatures of a text in ONE pass:
  * tokenize on single spaces (split semantics: limit -1, empty tokens kept),
  * char-fold each token ([[CharFoldHash]]: acc=7; acc=(acc·31+cp) mod 1e9+7
  * over code points), then fold each window of `width` consecutive token
  * hashes with the same polynomial (init = first hash).
  *
  * Bit-identical to the composable form
  * `transform(sequence(1, size(th)-width+1), i -> aggregate(slice(th, i+1,
  * width-1), element_at(th, i), (a,x) -> (a*31+x) % 1000000007))` over
  * `th = transform(split(text,' '), t -> char_fold_hash(t))` — and to the
  * DuckDB list_transform/list_reduce oracle. Exists because that HOF chain
  * evaluates INTERPRETED per element: ~300 M tokens at 100× data made span
  * construction CPU-bound (measured: the corpus exchange was not the
  * bottleneck, the lambda evaluation was). Here the whole pass is one
  * compiled Scala loop per ROW — CodegenFallback's per-row virtual call is
  * noise at document granularity, so a doGenCode would buy nothing.
  */
case class SpanHashes(child: Expression, width: Int)
    extends UnaryExpression with CodegenFallback {
  require(width >= 1, s"span width must be >= 1, got $width")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    val M = 1000000007L
    // pass 1: per-token char-fold hashes (single-space tokenizer, empties kept)
    val th = scala.collection.mutable.ArrayBuffer.empty[Long]
    var acc = 7L
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      if (cp == ' ') { th += acc; acc = 7L }
      else acc = (acc * 31L + cp) % M
      i += Character.charCount(cp)
    }
    th += acc
    // pass 2: polynomial fold over each window of `width` token hashes
    val n = th.length
    val m = n - width + 1
    if (m <= 0) new GenericArrayData(Array.emptyLongArray)
    else {
      val out = new Array[Long](m)
      var w0 = 0
      while (w0 < m) {
        var a = th(w0)
        var j = 1
        while (j < width) { a = (a * 31L + th(w0 + j)) % M; j += 1 }
        out(w0) = a
        w0 += 1
      }
      new GenericArrayData(out)
    }
  }

  override protected def withNewChildInternal(newChild: Expression): SpanHashes =
    copy(child = newChild)
}

object SpanHashes {
  import org.apache.spark.sql.GraftBridge
  def apply(c: Column, width: Int): Column =
    GraftBridge.column(SpanHashes(GraftBridge.expression(c), width))
}
