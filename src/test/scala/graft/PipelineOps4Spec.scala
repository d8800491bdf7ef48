package graft

import org.apache.spark.sql.functions._
import graft.queries.{TextOps, VectorOps}

/** Semantics pins for the round-4 LLM-pipeline operators (block-level
  * boilerplate dedup, BM25, LM surprise, URL canonicalization, PQ codes).
  * Cross-engine value equality is the oracle gate's job; these tests pin the
  * operator INVARIANTS that the oracle can't express. */
class PipelineOps4Spec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  test("block dedup: reassembly is the identity for boilerplate-free docs") {
    val out = TextOps.textBlockDedup(spark, dir)
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val joined = out.join(docs, Seq("doc_id")).cache()
    // counts are consistent
    assert(joined.filter(col("n_boilerplate") > col("n_blocks")).count() == 0)
    // no boilerplate removed -> text survives byte-for-byte
    val clean = joined.filter(col("n_boilerplate") === 0)
    assert(clean.count() > 0)
    assert(clean.filter(col("cleaned_text") =!= col("text")).count() == 0)
    // everything removed -> null, never empty string
    assert(joined.filter(col("n_boilerplate") === col("n_blocks"))
      .filter(col("cleaned_text").isNotNull).count() == 0)
    // exact duplicate docs exist in the corpus, so SOME boilerplate is found
    assert(joined.filter(col("n_boilerplate") > 0).count() > 0)
    joined.unpersist()
  }

  test("bm25: top-10, scores ordered, hits contain a query term") {
    val rows = TextOps.textBm25(spark, dir).collect()
    assert(rows.length == 10)
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .filter(col("doc_id").isin(rows.map(_.getLong(0)): _*))
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    rows.foreach { r =>
      val toks = docs(r.getLong(0)).split(" ").toSet
      assert(Seq("data", "table", "scan").exists(toks.contains))
      assert(r.getLong(1) >= 1 && r.getLong(1) <= 3) // n_terms_hit
    }
    val scores = rows.map(_.getDouble(2))
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
  }

  test("lm score: bounds and token-count consistency") {
    val out = TextOps.textLmScore(spark, dir)
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), size(split(col("text"), " ")).cast("long").as("nt"))
    val j = out.join(docs, Seq("doc_id")).cache()
    assert(j.filter(col("n_tokens") =!= col("nt")).count() == 0)
    // every token occurs at least once, so surprise in [1, 1e9] per token
    assert(j.filter(col("avg_surprise") < 1 || col("avg_surprise") > 1000000000L).count() == 0)
    assert(j.count() == spark.read.parquet(s"$dir/documents.parquet").count())
    j.unpersist()
  }

  test("url canonicalization: normalization strips params, keeps host+path") {
    val out = TextOps.textUrls(spark, dir)
    val bad = out.filter(
      col("url_normalized") =!= concat(lit("https://"), col("host"), col("path")) ||
        not(col("url").startsWith(col("url_normalized"))) ||
        col("url_normalized").contains("?"))
    assert(bad.count() == 0)
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    assert(out.join(docs, Seq("doc_id"))
      .filter(col("lang_param") =!= col("lang")).count() == 0)
  }

  test("bloom decontamination: superset of the exact n-gram overlap op") {
    val exact = TextOps.textDecontaminate(spark, dir)
      .withColumnRenamed("n_shared", "exact_hits")
    val bloom = TextOps.decontaminateBloom(spark, dir)
    // negatives are exact: every exact-flagged doc is bloom-flagged, and
    // per doc the bloom count can only exceed the true overlap count
    val j = exact.join(bloom, Seq("doc_id"), "left").cache()
    assert(j.filter(col("bloom_hits").isNull).count() == 0)
    assert(j.filter(col("bloom_hits") < col("exact_hits")).count() == 0)
    j.unpersist()
  }

  test("bpe pair counts: top-20, ordered, counts match a direct recount") {
    val rows = TextOps.bpePairCounts(spark, dir).collect()
    assert(rows.length == 20)
    val ns = rows.map(_.getLong(1))
    assert(ns.zip(ns.tail).forall { case (a, b) => a >= b })
    // recount the top pair directly from the corpus
    val top = rows.head.getString(0).split(" ")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("pos"))
    val n = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), posexplode(split(col("text"), " ")).as(Seq("pos", "tok")))
      .withColumn("nxt", lead(col("tok"), 1).over(w))
      .filter(col("tok") === top(0) && col("nxt") === top(1)).count()
    assert(n == rows.head.getLong(1))
  }

  test("quality-weighted sampling: kept counts bounded by weights") {
    val out = sampleQW.cache()
    assert(out.filter(col("n_kept") > col("n_docs")).count() == 0)
    // weights in [1,100] -> weight_sum within [n_docs, 100*n_docs]
    assert(out.filter(col("weight_sum") < col("n_docs")
      || col("weight_sum") > col("n_docs") * 100).count() == 0)
    out.unpersist()
  }
  private def sampleQW = TextOps.sampleQualityWeighted(spark, dir)

  test("prefix dedup: exact duplicates appear, prefix relation is real") {
    val pairs = TextOps.dedupPrefix(spark, dir).cache()
    // the synthetic corpus has strict prefix-extension pairs (28 at sf0.001)
    assert(pairs.count() > 0)
    // mutual prefixes are exactly the equal-length (identical) pairs
    assert(pairs.filter(col("exact_equal") && col("len_a") =!= col("len_b")).count() == 0)
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val checked = pairs
      .join(docs.select(col("doc_id").as("a_id"), col("text").as("ta")), Seq("a_id"))
      .join(docs.select(col("doc_id").as("b_id"), col("text").as("tb")), Seq("b_id"))
      .filter(not(expr("substring(tb, 1, length(ta)) = ta")
        || expr("substring(ta, 1, length(tb)) = tb")))
    assert(checked.count() == 0)
    pairs.unpersist()
  }

  test("funnel: stage counts are monotone non-increasing") {
    val r = graft.queries.Analytics.eventsFunnel(spark, dir).collect()
    assert(r.length == 1)
    val (a, b, c) = (r.head.getLong(0), r.head.getLong(1), r.head.getLong(2))
    assert(a >= b && b >= c && c >= 0)
  }

  test("retention: offset-0 count equals cohort size and dominates") {
    val out = graft.queries.Analytics.eventsRetention(spark, dir).cache()
    val perCohort = out.groupBy(col("cohort_day"))
      .agg(max(col("n_users")).as("mx"),
        max(when(col("day_offset") === 0, col("n_users"))).as("d0"))
    assert(perCohort.filter(col("d0").isNull || col("d0") =!= col("mx")).count() == 0)
    assert(out.filter(col("day_offset") < 0).count() == 0)
    out.unpersist()
  }

  test("scd2 merge: exactly one current version per key; updates doubled") {
    val out = graft.queries.Analytics.mergeScd2(spark, dir).cache()
    val perKey = out.groupBy(col("c_custkey"))
      .agg(sum(when(col("is_current"), 1).otherwise(0)).as("cur"),
        count(lit(1)).as("n"))
    assert(perKey.filter(col("cur") =!= 1).count() == 0)
    assert(perKey.filter(col("c_custkey") % 10 === 0 && col("n") =!= 2).count() == 0)
    assert(perKey.filter(col("c_custkey") % 10 =!= 0 && col("n") =!= 1).count() == 0)
    out.unpersist()
  }

  test("distribution windows: pr and cd bounded, cd never below pr") {
    val out = graft.queries.Analytics.windowDistribution(spark, dir)
    assert(out.filter(col("pr") < 0 || col("pr") > 1
      || col("cd") <= 0 || col("cd") > 1 || col("cd") < col("pr")).count() == 0)
  }

  test("pq re-rank: 3 ranked hits per query, cosines ordered and bounded") {
    val rows = VectorOps.annPqRerank(spark, dir)
      .orderBy(col("q_id"), col("rank")).collect()
    assert(rows.length == 9)
    rows.groupBy(_.getLong(0)).foreach { case (_, rs) =>
      assert(rs.map(_.getInt(2)).toSeq == Seq(1, 2, 3))
      val cs = rs.sortBy(_.getInt(2)).map(_.getDouble(3))
      assert(cs.zip(cs.tail).forall { case (a, b) => a >= b })
      assert(cs.forall(c => c >= -1.0001 && c <= 1.0001))
    }
  }

  test("pmi: top-15 collocations, frequency floor respected, ordered") {
    val rows = TextOps.textPmi(spark, dir).collect()
    assert(rows.length == 15)
    assert(rows.forall(_.getLong(2) >= 5))
    val ps = rows.map(_.getLong(3))
    assert(ps.zip(ps.tail).forall { case (a, b) => a >= b })
  }

  test("rate anomaly: flagged rows actually exceed 1.5x trailing average") {
    val out = graft.queries.Analytics.eventsRateAnomaly(spark, dir)
    assert(out.filter(col("trail_hours") < 12
      || col("n") * col("trail_hours") * 2 <= col("trail_sum") * 3).count() == 0)
  }

  test("kmeans: 8 centroids partition the full corpus after two rounds") {
    val out = VectorOps.kmeansQuantized(spark, dir).cache()
    assert(out.count() == 8)
    val total = out.agg(sum(col("n"))).head.getLong(0)
    assert(total == spark.read.parquet(s"$dir/embeddings.parquet").count())
    assert(out.filter(col("n") <= 0 || col("coord_checksum") <= 0).count() == 0)
    out.unpersist()
  }

  test("diversity: bounded in [0, 1e6) and maximal iff all tokens distinct") {
    val out = TextOps.textDiversity(spark, dir).cache()
    assert(out.filter(col("diversity_micro") < 0
      || col("diversity_micro") >= 1000000).count() == 0)
    // all-distinct docs hit exactly (n²−n)/n² — check the closed form
    val allDistinct = out.filter(col("n_distinct") === col("n_tokens"))
    assert(allDistinct.filter(col("diversity_micro") =!=
      expr("(n_tokens * n_tokens - n_tokens) * 1000000 div (n_tokens * n_tokens)"))
      .count() == 0)
    out.unpersist()
  }

  test("spans: duplicated fraction bounded; exact text reuse is detected") {
    val out = TextOps.dedupSpans(spark, dir).cache()
    assert(out.filter(col("n_dup_spans") > col("n_spans")).count() == 0)
    assert(out.filter(col("dup_micro") < 0 || col("dup_micro") > 1000000).count() == 0)
    // the corpus has prefix-extension pairs (>=8 shared leading tokens),
    // which share 10-token spans whenever the overlap reaches 10 — some
    // duplication must surface at sf0.001
    assert(out.agg(sum(col("n_dup_spans"))).head.getLong(0) > 0)
    out.unpersist()
  }

  test("markov: per-from probabilities sum to ~1e6 and counts are consistent") {
    val out = graft.queries.Analytics.eventsMarkov(spark, dir).cache()
    val sums = out.groupBy(col("from_type"))
      .agg(sum(col("p_micro")).as("p"), count(lit(1)).as("k"))
    // integer division loses < 1 micro per row
    assert(sums.filter(col("p") > 1000000 || col("p") < lit(1000000) - col("k")).count() == 0)
    assert(out.filter(col("n") <= 0).count() == 0)
    out.unpersist()
  }

  test("pq: codebook vectors quantize to zero error; codes are length 8") {
    val out = VectorOps.embedPq(spark, dir).cache()
    assert(out.filter(col("vec_id") < 16).filter(col("err_micro") =!= 0).count() == 0)
    assert(out.filter(col("err_micro") < 0).count() == 0)
    val codes = out.select(col("vec_id"),
      from_json(col("codes"),
        org.apache.spark.sql.types.DataTypes.createArrayType(
          org.apache.spark.sql.types.DataTypes.LongType)).as("cs"))
    assert(codes.filter(size(col("cs")) =!= 8).count() == 0)
    assert(codes.filter(exists(col("cs"), c => c < 0 || c > 15)).count() == 0)
    assert(out.count() == spark.read.parquet(s"$dir/embeddings.parquet").count())
    out.unpersist()
  }

  test("triangles: degree-ordered count equals brute force on known graphs") {
    val s = spark
    import s.implicits._
    def tri(edges: Seq[(Long, Long)]): Long =
      graft.operators.Triangles.countDf(edges.toDF("u", "v"))
        .head().getLong(0)
    // K4: C(4,3) = 4 triangles; path: 0; two triangles sharing an edge: 2
    assert(tri(Seq((1L,2L),(1L,3L),(1L,4L),(2L,3L),(2L,4L),(3L,4L))) == 4)
    assert(tri(Seq((1L,2L),(2L,3L),(3L,4L))) == 0)
    assert(tri(Seq((1L,2L),(1L,3L),(2L,3L),(2L,4L),(3L,4L))) == 2)
    // deterministic pseudo-random graph vs the brute-force triple join
    val rnd = (for (i <- 0 until 400) yield {
      val a = (i * 7919) % 30; val b = (i * 104729 + 13) % 30
      if (a < b) Some((a.toLong, b.toLong)) else if (b < a) Some((b.toLong, a.toLong)) else None
    }).flatten.distinct
    val e = rnd.toDF("u", "v").cache()
    val brute = e.as("e1")
      .join(e.as("e2"), col("e2.u") === col("e1.u") && col("e2.v") > col("e1.v"))
      .join(e.as("e3"), col("e3.u") === col("e1.v") && col("e3.v") === col("e2.v"))
      .count()
    assert(tri(rnd) == brute)
    e.unpersist()
  }

  test("attribution: composite (ts, event_id) ordering breaks same-ts ties") {
    val out = graft.queries.Analytics.eventsAttribution(spark, dir).cache()
    // every purchasing user lands in exactly one channel bucket
    val ev = graft.queries.Util.eventsWithTs(spark, dir)
    val buyers = ev.filter(col("event_type") === "purchase")
      .select(col("user_id")).distinct().count()
    assert(out.agg(sum(col("n_users"))).head().getLong(0) == buyers)
    // 'direct' = first event IS the purchase; never negative, never all
    assert(out.filter(col("n_users") <= 0).count() == 0)
    out.unpersist()
  }

  test("fuzzy link: bounded levenshtein agrees with unbounded within threshold") {
    val out = TextOps.linkFuzzyEdit(spark, dir).cache()
    assert(out.filter(col("edit_dist") < 0 || col("edit_dist") > 12).count() == 0)
    assert(out.filter(col("doc_a") >= col("doc_b")).count() == 0)
    out.unpersist()
  }

  test("concurrency sweep: bounded, ends at zero, peak covers the busiest instant") {
    val out = graft.queries.Analytics.eventsConcurrency(spark, dir).cache()
    val n = spark.read.parquet(s"$dir/events.parquet").count()
    assert(out.count() == 2 * n)
    // running concurrency is always in [0, n]; the final point closes to 0
    assert(out.filter(col("conc") < 0 || col("conc") > n).count() == 0)
    val last = out.orderBy(col("t").desc, col("delta").desc, col("event_id").desc)
      .limit(1).head()
    assert(last.getLong(last.fieldIndex("conc")) == 0)
    out.unpersist()
  }

  test("dq audit: clean snapshot — every referential/pk/null check is zero") {
    val out = graft.queries.Analytics.dqAudit(spark, dir).cache()
    assert(out.count() == 17)
    assert(out.filter(col("n_bad") =!= 0).count() == 0) // testdata is clean
    out.unpersist()
  }

  test("hll: per-type and merged estimates land within the 5pct gate") {
    val out = graft.queries.Analytics.hllDistinct(spark, dir).cache()
    assert(out.filter(!col("within_5pct")).count() == 0)
    assert(out.filter(col("event_type") === "__all__").count() == 1)
    out.unpersist()
  }

  test("phrase search: posting-list intersection equals a contains() scan") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val expect = docs
      .filter(concat(lit(" "), col("text"), lit(" ")).contains(" hash join "))
      .select(col("doc_id"))
    val got = TextOps.phraseSearch(spark, dir)
    assert(got.exceptAll(expect).count() == 0 && expect.exceptAll(got).count() == 0)
  }

  test("array hof: fixed-point folds match a driver-side recompute") {
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      .orderBy("vec_id").limit(5).collect()
    val out = graft.queries.VectorOps.arrayHof(spark, dir)
      .orderBy("vec_id").limit(5).collect()
    emb.zip(out).foreach { case (e, o) =>
      val v = e.getSeq[Float](e.fieldIndex("embedding"))
        .map(x => math.floor(x.toDouble * 1000 + 0.5).toLong)
      assert(o.getLong(o.fieldIndex("n_pos")) == v.count(_ > 0))
      assert(o.getLong(o.fieldIndex("l1_mili")) == v.map(math.abs).sum)
      assert(o.getLong(o.fieldIndex("argmax_pos")) == v.indexOf(v.max) + 1)
      assert(o.getLong(o.fieldIndex("rev_dot")) ==
        v.zip(v.reverse).map { case (x, y) => x * y }.sum)
    }
  }
}
