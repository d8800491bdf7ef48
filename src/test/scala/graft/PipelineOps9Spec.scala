package graft

import org.apache.spark.sql.functions._
import graft.queries.{TextOps, VectorOps}

/** Semantics pins for the round-9 additions (domain-level curation, label
  * propagation communities, the BPE training loop, ANN recall evaluation).
  * Cross-engine value equality is the oracle gate's job; these pin the
  * operator INVARIANTS the oracle can't express. */
class PipelineOps9Spec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  test("label propagation: two cliques over one bridge are TWO communities") {
    // CC would merge them through the bridge; LPA's density bias must not.
    val s = spark
    import s.implicits._
    val nodes = Seq(1L, 2L, 3L, 4L, 5L, 6L).toDF("id")
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L), (4L, 5L), (4L, 6L), (5L, 6L),
      (3L, 4L)).toDF("src", "dst")
    val out = graft.operators.LabelPropagation.run(nodes, edges, iterations = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out(1L) == out(2L) && out(2L) == out(3L))
    assert(out(4L) == out(5L) && out(5L) == out(6L))
    assert(out(1L) != out(4L), "bridge edge must not merge the cliques")
  }

  test("label propagation: communities partition the nodes and respect CC") {
    val nNodes = spark.read.parquet(s"$dir/documents.parquet")
      .filter(col("doc_id") < 400).count()
    val comms = TextOps.labelPropagation(spark, dir).cache()
    assert(comms.agg(sum(col("n_members"))).head.getLong(0) == nNodes)
    // a label spreads only along edges, so every LPA community must sit
    // inside ONE connected component
    val labels = {
      val edges = TextOps.dedupNgramJaccard(spark, dir)
        .select(col("a_id").as("src"), col("b_id").as("dst"))
      val nodes = spark.read.parquet(s"$dir/documents.parquet")
        .filter(col("doc_id") < 400).select(col("doc_id").as("id"))
      graft.operators.LabelPropagation.run(nodes, edges, iterations = 3)
        .join(graft.operators.ConnectedComponents.run(nodes, edges), Seq("id"))
    }
    val split = labels.groupBy(col("label"))
      .agg(countDistinct(col("comp")).as("ncc")).filter(col("ncc") > 1).count()
    assert(split == 0, "an LPA community crossed a connected component")
    // LPA refines (or equals) CC: at least as many communities as components
    val nComms = comms.count()
    val nCCs = labels.select(col("comp")).distinct().count()
    assert(nComms >= nCCs)
    comms.unpersist()
  }

  test("bpe training: three merges, token totals fall consistently") {
    val rows = TextOps.bpeTrainMerges(spark, dir).orderBy(col("iter")).collect()
    assert(rows.map(_.getInt(0)).toSeq == Seq(1, 2, 3))
    val total0 = spark.read.parquet(s"$dir/documents.parquet")
      .select(size(split(col("text"), " ")).cast("long").as("k"))
      .agg(sum(col("k"))).head.getLong(0)
    var before = total0
    rows.foreach { r =>
      val (pairN, after) = (r.getLong(3), r.getLong(4))
      assert(pairN >= 1)
      val replaced = before - after
      // greedy leftmost: replaces at most every counted pair, at least every
      // other one (overlaps like "a a a" count 2 pairs but merge once)
      assert(replaced >= 1 && replaced <= pairN && 2 * replaced >= pairN,
        s"iter ${r.getInt(0)}: replaced=$replaced of pair_n=$pairN")
      before = after
    }
  }

  test("bpe training: replace is greedy-leftmost on overlapping pairs") {
    // the padded-double-space invariant the merge application relies on
    val s = spark
    import s.implicits._
    val out = Seq(" a  a  a ", " x  a  b  a  b  x ").toDF("s")
      .select(expr("replace(s, ' a  a ', ' a~a ')").as("r1"),
        expr("replace(s, ' a  b ', ' a~b ')").as("r2"))
      .collect()
    assert(out(0).getString(0) == " a~a  a ") // greedy: one merge, not two
    assert(out(1).getString(1) == " x  a~b  a~b  x ") // adjacent both fire
  }

  test("domain stats: both gates bite and bounds hold") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val out = TextOps.domainStats(spark, dir).cache()
    assert(out.agg(sum(col("n_docs"))).head.getLong(0) == docs.count())
    assert(out.filter(col("n_kept") > col("n_docs")).count() == 0)
    // every kept doc has >= 50 chars, so kept_chars >= 50 * n_kept
    assert(out.filter(col("kept_chars") < col("n_kept") * 50).count() == 0)
    // the domain-level gate actually blocks something at this SF
    assert(out.agg(sum(col("n_kept"))).head.getLong(0) < docs.count())
    out.unpersist()
  }

  test("rank fusion: rrf arithmetic consistent, both arms represented") {
    val rows = VectorOps.rankFusion(spark, dir).collect()
    assert(rows.length == 10)
    rows.foreach { r =>
      val tr = if (r.isNullAt(1)) None else Some(r.getInt(1))
      val vr = if (r.isNullAt(2)) None else Some(r.getInt(2))
      assert(tr.nonEmpty || vr.nonEmpty)
      assert(tr.forall(x => x >= 1 && x <= 10) && vr.forall(x => x >= 1 && x <= 10))
      val expected = tr.map(x => 1000000L / (60 + x)).getOrElse(0L) +
        vr.map(x => 1000000L / (60 + x)).getOrElse(0L)
      assert(r.getLong(3) == expected)
    }
    // fused order is rrf desc with id tie-break
    val rrfs = rows.map(_.getLong(3))
    assert(rrfs.zip(rrfs.tail).forall { case (a, b) => a >= b })
    // a doc ranked first in BOTH arms would dominate; at minimum the
    // global top fused doc must sit in some arm's top-3
    val top = rows.head
    assert((!top.isNullAt(1) && top.getInt(1) <= 3) ||
      (!top.isNullAt(2) && top.getInt(2) <= 3))
  }

  test("audio fingerprint: content-keyed, gain-invariant, garbage-safe") {
    import graft.functions.Wav
    val a = Wav.synthPcmWavSeeded(16000, 160, 7L)
    val b = Wav.synthPcmWavSeeded(16000, 160, 7L)
    assert(Wav.pcm16Fingerprint(a) == Wav.pcm16Fingerprint(b), "same content, same print")
    assert(Wav.pcm16Fingerprint(a) != -1L)
    // halve every sample (uniform gain change): energy ORDER is preserved,
    // so the delta-bit fingerprint must not move
    val halved = a.clone()
    val bb = java.nio.ByteBuffer.wrap(halved).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    (0 until 160).foreach { i =>
      val v = bb.getShort(44 + 2 * i)
      bb.putShort(44 + 2 * i, (v / 2).toShort)
    }
    assert(Wav.pcm16Fingerprint(halved) == Wav.pcm16Fingerprint(a),
      "fingerprint must survive uniform gain change")
    // different content (seed) should move SOME energy delta on this data
    assert(Wav.pcm16Fingerprint(Wav.synthPcmWavSeeded(16000, 160, 8L)) !=
      Wav.pcm16Fingerprint(a))
    assert(Wav.pcm16Fingerprint("not a wav".getBytes) == -1L)
    // dedup groups partition the 300-doc slice: group sizes + singletons
    val out = graft.queries.MultimodalOps.audioFingerprint(spark, dir)
      .agg(sum(col("n_copies"))).head.getLong(0)
    assert(out <= 300 && out >= 250, s"expected near-total coverage, got $out")
  }

  test("ann recall eval: agrees with the independent brute-force baseline") {
    val recall = VectorOps.annRecallEval(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(recall.keySet == Set(0L, 1L, 2L))
    assert(recall.values.forall(h => h >= 0 && h <= 3))
    // expected hits: IVF top-3 ∩ brute top-3 (annBruteCosine@k=5 truncated)
    val ivf = VectorOps.annIvfTopk(spark, dir)
      .select(col("q_id"), col("c_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val brute = VectorOps.annBruteCosine(spark, dir)
      .filter(col("q_id") < 3 && col("rank") <= 3)
      .select(col("q_id"), col("c_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val expected = brute.groupBy(_._1).map { case (q, s) =>
      q -> s.count(ivf.contains).toLong
    }
    assert(recall == expected)
  }
}
