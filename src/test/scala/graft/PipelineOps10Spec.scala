package graft

import org.apache.spark.sql.functions._
import graft.queries.{TextOps, VectorOps}

/** Semantics pins for the round-10 additions (MMR diversity reranking,
  * exactly-k reservoir sampling). Cross-engine value equality is the oracle
  * gate's job; these pin the operator INVARIANTS the oracle can't express —
  * the diversity inversion MMR exists for, greedy-score monotonicity, and
  * bottom-k's "exactly the k smallest priorities" contract. */
class PipelineOps10Spec extends SparkSpec {

  /** 64-dim fixture engineered so pure relevance ranks (a, b, c) but MMR
    * must invert to (a, c, b): b is EXACTLY a/2 (same direction — float
    * halving is exact, so rel_b ≡ rel_a bit-for-bit and sim(a,b) ≈ 1), and
    * c has rel 0.85 with sim(a,c) ≈ 0.765, so at λ=0.7 the near-clone's
    * redundancy penalty (0.3·1) outweighs its relevance edge (0.7·0.05). */
  private def mmrFixtureDir: String = {
    val d = tmpDir("graft_mmr_fix").getAbsolutePath
    def v(entries: (Int, Float)*): Seq[Float] = {
      val arr = Array.fill(64)(0.0f)
      entries.foreach { case (i, x) => arr(i) = x }
      arr.toSeq
    }
    import spark.implicits._
    Seq(
      (0L, v(0 -> 1.0f), 0),                       // the probed query
      (1L, v(50 -> 1.0f), 0),                      // far-off extra queries
      (2L, v(51 -> 1.0f), 0),
      (3L, v(0 -> 0.9f, 1 -> 0.436f), 1),          // a: rel ≈ .9
      (4L, v(0 -> 0.45f, 1 -> 0.218f), 1),         // b = a/2: clone direction
      (5L, v(0 -> 0.85f, 2 -> 0.5268f), 1))        // c: rel ≈ .85, diverse
      .toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$d/embeddings.parquet")
    d
  }

  test("rank_mmr: near-clone demoted below a diverse doc; greedy order pinned") {
    val rows = VectorOps.rankMmr(spark, mmrFixtureDir)
      .filter(col("q_id") === 0).orderBy(col("sel_rank")).collect()
    assert(rows.map(_.getLong(2)).toSeq == Seq(3L, 5L, 4L, 1L, 2L),
      "expected MMR order a, c, b(clone), then the two zero-rel fillers")
    // pure relevance would have picked the clone second — pin the inversion
    val scores = rows.map(_.getDouble(3))
    assert(scores.zip(scores.tail).forall { case (x, y) => x >= y },
      "greedy MMR scores must be non-increasing in selection rank")
    // rel tie between a and its exact half-scale clone broke by id: a first
    assert(rows.head.getLong(2) == 3L)
  }

  test("rank_mmr: picks are 5 distinct members of the cosine top-10") {
    val dir = "/root/testdata/sf0.001"
    val picks = VectorOps.rankMmr(spark, dir).collect()
      .groupBy(_.getLong(0)).view.mapValues(_.sortBy(_.getInt(1))).toMap
    assert(picks.keySet == Set(0L, 1L, 2L))
    val brute = VectorOps.annBruteCosine(spark, dir) // top-5 by pure relevance
      .collect().groupBy(_.getLong(0))
    picks.foreach { case (q, rs) =>
      assert(rs.map(_.getInt(1)).toSeq == (1 to 5), s"q=$q ranks not 1..5")
      val ids = rs.map(_.getLong(2))
      assert(ids.distinct.length == ids.length, s"q=$q repeated a pick")
      val scores = rs.map(_.getDouble(3))
      assert(scores.zip(scores.tail).forall { case (x, y) => x >= y })
      // step 1 is pure relevance: must equal the brute top-1
      assert(ids.head == brute(q).minBy(_.getInt(2)).getLong(1),
        s"q=$q first MMR pick is not the relevance top-1")
    }
  }

  test("dedup_minhash_incremental: batch screens against the store only") {
    val dir = "/root/testdata/sf0.01"
    val rows = TextOps.dedupMinhashIncremental(spark, dir).collect()
    assert(rows.nonEmpty, "sf0.01 fixture should surface at least one near-dup")
    rows.foreach { r =>
      assert(r.getLong(0) >= 400, "left side must be a batch doc")
      assert(r.getLong(1) < 400, "dup_of must come from the store")
      assert(r.getInt(2) >= 6 && r.getInt(2) <= 8)
      assert(r.getLong(3) >= 1)
    }
    // consistency with the full-corpus LSH: each reported (dup_of, batch)
    // is a pair the full query also finds (it reports a_id < b_id, and
    // dup_of < 400 <= batch_id)
    val full = graft.queries.TextOps.dedupMinhashLsh(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    rows.foreach { r =>
      assert(full.contains((r.getLong(1), r.getLong(0))),
        s"incremental pair (${r.getLong(1)}, ${r.getLong(0)}) unknown to the full LSH")
    }
  }

  test("events_watermark_audit: lateness buckets are nested and bounded") {
    val rows = graft.queries.Analytics.eventsWatermarkAudit(
      spark, "/root/testdata/sf0.01").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, l5, l1, l6, mx) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
      assert(l5 >= l1 && l1 >= l6, "a longer watermark can only drop fewer")
      assert(l5 <= n && l6 >= 0)
      assert(mx >= 0)
      if (l5 > 0) assert(mx > 300L * 1000000, "max lateness must witness the bucket")
    }
  }

  test("sample_reservoir: exactly the k smallest priorities, deterministic") {
    val dir = "/root/testdata/sf0.01" // 500 docs > k=100
    val got = TextOps.sampleReservoir(spark, dir).collect()
    assert(got.length == 100)
    // independent bottom-k: full-corpus priorities, smallest 100 by (prio, id)
    val all = graft.queries.Util.table(spark, dir, "documents")
      .select(col("doc_id"),
        pmod(graft.queries.Util.charFoldHash(
          concat(col("doc_id").cast("string"), lit("#"), col("text"))),
          lit(1000000007L)).as("prio"))
      .collect().map(r => (r.getLong(1), r.getLong(0))).sorted.take(100)
    assert(got.map(r => (r.getLong(2), r.getLong(0))).sorted.toSeq == all.toSeq)
    // content-keyed ⇒ bit-stable across invocations
    val again = TextOps.sampleReservoir(spark, dir).collect()
    assert(got.map(_.toSeq).toSeq == again.map(_.toSeq).toSeq)
    // k larger than the corpus degrades to "the whole corpus"
    val tiny = TextOps.sampleReservoir(spark, "/root/testdata/sf0.001").collect()
    val nTiny = graft.queries.Util.table(spark, "/root/testdata/sf0.001", "documents").count()
    assert(tiny.length == math.min(100L, nTiny))
  }
}
