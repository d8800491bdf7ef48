package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType, LongType}

/** Nearest-codebook-entry lookup for product quantization, as one codegen'd
  * expression over a CONSTANT per-subspace codebook: for subspace `m` and an
  * `array<double>` subvector, return either the nearest centroid's cid
  * (`emitD2 = false`, LongType) or its squared L2 distance (`emitD2 = true`,
  * DoubleType). Ties go to the lowest cid; `cids(m)`/`cents(m)` must be
  * cid-ascending (enforced in apply).
  *
  * This is the PQ assignment inner loop of `embed_pq` / `ann_pq_rerank`.
  * The declarative form it replaces — explode ×16 codebook candidates via a
  * broadcast join, interpreted `aggregate(zip_with(...))` distance per
  * candidate, then `min(struct(dist2, cid))` — pays three scale costs the
  * expression does not: a ×K row expansion per subvector, per-element lambda
  * interpretation (HOFs never codegen), and a SORT-based aggregate (struct
  * min has no hash-aggregate buffer) over the expanded rows. Here each row
  * does K·dims double ops inside whole-stage codegen — no expansion, no
  * shuffle, no sort.
  *
  * Distance accumulation is left-to-right over ascending dims — the exact
  * IEEE sequence of `aggregate(zip_with(a, b, (x,y) -> (x-y)*(x-y)), 0d, +)`
  * and of the DuckDB oracle's `list_sum(list_transform(list_zip(...)))`, so
  * doubles stay bit-comparable. The strict `<` keeps the first (lowest-cid)
  * minimum, identical to the lexicographic struct-min tie-break.
  */
case class PqNearest(left: Expression, right: Expression,
    cids: Array[Array[Long]], cents: Array[Array[Array[Double]]], emitD2: Boolean)
    extends BinaryExpression {
  require(cids.length == cents.length && cids.nonEmpty, "empty codebook")
  override def dataType: DataType = if (emitD2) DoubleType else LongType
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(mAny: Any, svAny: Any): Any = {
    val m = mAny.asInstanceOf[Int]
    val sv = svAny.asInstanceOf[ArrayData]
    val cs = cents(m)
    val ids = cids(m)
    var best = Double.MaxValue
    var bcid = -1L
    var k = 0
    while (k < cs.length) {
      val c = cs(k)
      val n = math.min(sv.numElements(), c.length)
      var acc = 0.0
      var i = 0
      while (i < n) {
        val d = sv.getDouble(i) - c(i)
        acc += d * d
        i += 1
      }
      if (acc < best) { best = acc; bcid = ids(k) }
      k += 1
    }
    if (emitD2) best else bcid
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val centsRef = ctx.addReferenceObj("pqCents", cents, "double[][][]")
    val cidsRef = ctx.addReferenceObj("pqCids", cids, "long[][]")
    nullSafeCodeGen(ctx, ev, (m, sv) =>
      code"""
        double[][] _pq_cs = $centsRef[$m];
        long[] _pq_ids = $cidsRef[$m];
        double _pq_best = Double.MAX_VALUE;
        long _pq_bcid = -1L;
        for (int _pq_k = 0; _pq_k < _pq_cs.length; _pq_k++) {
          double[] _pq_c = _pq_cs[_pq_k];
          int _pq_n = java.lang.Math.min($sv.numElements(), _pq_c.length);
          double _pq_acc = 0.0;
          for (int _pq_i = 0; _pq_i < _pq_n; _pq_i++) {
            double _pq_d = $sv.getDouble(_pq_i) - _pq_c[_pq_i];
            _pq_acc += _pq_d * _pq_d;
          }
          if (_pq_acc < _pq_best) { _pq_best = _pq_acc; _pq_bcid = _pq_ids[_pq_k]; }
        }
        ${ev.value} = ${if (emitD2) "_pq_best" else "_pq_bcid"};
      """.toString)
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): PqNearest =
    copy(left = l, right = r)
}

object PqNearest {
  /** `codebook`: (m, cid, centroid subvector) rows, any order. */
  private def tables(codebook: Seq[(Int, Long, Seq[Double])])
      : (Array[Array[Long]], Array[Array[Array[Double]]]) = {
    val byM = codebook.groupBy(_._1)
    val maxM = byM.keys.max
    val cids = Array.tabulate(maxM + 1)(m =>
      byM.getOrElse(m, Nil).map(_._2).sorted.toArray)
    val cents = Array.tabulate(maxM + 1) { m =>
      byM.getOrElse(m, Nil).sortBy(_._2).map(_._3.toArray).toArray
    }
    (cids, cents)
  }

  def cid(m: Column, sv: Column, codebook: Seq[(Int, Long, Seq[Double])]): Column = {
    val (ids, cs) = tables(codebook)
    GraftBridge.column(PqNearest(GraftBridge.expression(m),
      GraftBridge.expression(sv), ids, cs, emitD2 = false))
  }

  def d2(m: Column, sv: Column, codebook: Seq[(Int, Long, Seq[Double])]): Column = {
    val (ids, cs) = tables(codebook)
    GraftBridge.column(PqNearest(GraftBridge.expression(m),
      GraftBridge.expression(sv), ids, cs, emitD2 = true))
  }
}
