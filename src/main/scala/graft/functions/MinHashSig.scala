package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{DataType, LongType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** The complete k-permutation MinHash signature of a text in ONE compiled
  * pass: tokenize on single spaces, char-fold each token
  * ([[CharFoldHash]]), fold each `width`-token window ([[SpanHashes]]
  * semantics), and maintain the k running minima of (a_j·h + b_j) mod P
  * over the span hashes — without ever materializing the span array,
  * exploding rows, or shuffling.
  *
  * Output: struct<sig0..sig{k-1}> of longs, NULL when the text has fewer
  * than `width` tokens (the row simply has no shingles — matches the
  * exploded formulation where such docs vanish and the oracle's
  * `WHERE len(hs) > 0`).
  *
  * Bit-identical to `min((h·a_j + b_j) % P)` over
  * `explode(SpanHashes(text, width))` — same arithmetic, same a/b/P
  * ([[MinHashSig.a]]/[[MinHashSig.b]]/[[MinHashSig.P]]) — so the DuckDB
  * oracle is unchanged. Exists because the exploded form multiplies rows
  * by span count and pays a doc_id exchange (small but real); here the
  * signature is a narrow per-row projection — the scan-only plan shape.
  * Evaluated once per row even though callers extract k fields:
  * CollapseProject does not inline non-cheap multi-referenced producers.
  */
case class MinHashSig(child: Expression, width: Int, k: Int)
    extends UnaryExpression with CodegenFallback {
  require(width >= 1, s"span width must be >= 1, got $width")
  require(k >= 1, s"signature size must be >= 1, got $k")

  override def dataType: DataType =
    StructType((0 until k).map(j => StructField(s"sig$j", LongType, nullable = false)))
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    val M = MinHashSig.P
    // pass 1: per-token char-fold hashes (single-space split, empties kept)
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
    val n = th.length
    val m = n - width + 1
    if (m <= 0) null // no shingles: the doc has no signature
    else {
      val sig = Array.fill(k)(Long.MaxValue)
      var w0 = 0
      while (w0 < m) {
        var h = th(w0)
        var j = 1
        while (j < width) { h = (h * 31L + th(w0 + j)) % M; j += 1 }
        var p = 0
        while (p < k) {
          val v = (h * MinHashSig.a(p) + MinHashSig.b(p)) % M
          if (v < sig(p)) sig(p) = v
          p += 1
        }
        w0 += 1
      }
      InternalRow.fromSeq(sig.toSeq)
    }
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

object MinHashSig {
  /** MinHash permutation family: k independent affine maps (a·h + b) mod P.
    * Fixed odd multipliers/offsets; P = 1e9+7 — the single source of truth
    * (graft.queries.Util delegates here for the oracle SQL). */
  val P: Long = 1000000007L
  def a(j: Int): Long = 2L * j + 3
  def b(j: Int): Long = 1000L * j + 7

  import org.apache.spark.sql.GraftBridge
  def apply(c: Column, width: Int, k: Int): Column =
    GraftBridge.column(MinHashSig(GraftBridge.expression(c), width, k))
}
