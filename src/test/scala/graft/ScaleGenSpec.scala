package graft

import org.apache.spark.sql.functions._

/** Pins the workload-shape-preserving properties of the ScaleGen blow-up
  * (SCALING.md): key disjointness across copies, referential integrity
  * within a copy, and the per-copy text bijection (within-copy structure
  * mirrored, cross-copy shingles distinct). The properties are what make
  * the 10×/100× bench runs an honest scaling measurement instead of a
  * pathological everything-matches-everything variant.
  */
class ScaleGenSpec extends SparkSpec {

  private val factor = 3
  private lazy val outDir = {
    val d = tmpDir("graft_scalegen").getAbsolutePath
    ScaleGen.generate(spark, "/root/testdata/sf0.001", d, factor)
    d
  }

  test("scaled tables: exact Nx row counts; fixed dims verbatim") {
    val src = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    val out = spark.read.parquet(s"$outDir/lineitem.parquet")
    assert(out.count() == factor * src.count())
    assert(spark.read.parquet(s"$outDir/nation.parquet").count() ==
      spark.read.parquet("/root/testdata/sf0.001/nation.parquet").count())
  }

  test("referential integrity holds within every copy; keys disjoint across copies") {
    val li = spark.read.parquet(s"$outDir/lineitem.parquet")
    val ord = spark.read.parquet(s"$outDir/orders.parquet")
    // no dangling foreign keys after re-keying
    assert(li.join(ord, li("l_orderkey") === ord("o_orderkey"), "left_anti").count() == 0)
    // offsets keep keys unique (disjoint ranges, no collisions)
    assert(ord.select("o_orderkey").distinct().count() == ord.count())
  }

  test("text bijection: per-copy lengths and duplicate structure mirror copy 0; cross-copy text differs") {
    val src = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val n = src.count()
    val docs = spark.read.parquet(s"$outDir/documents.parquet")
    val k1 = docs.filter(col("doc_id") >= n && col("doc_id") < 2 * n)
      .select((col("doc_id") - n).as("doc_id"), col("text").as("t1"))
    val joined = src.select(col("doc_id"), col("text").as("t0")).join(k1, "doc_id")
    assert(joined.count() == n)
    // bijection preserves length, changes content
    assert(joined.filter(length(col("t0")) =!= length(col("t1"))).count() == 0)
    assert(joined.filter(col("t0") === col("t1")).count() == 0)
    // equality relations inside the copy mirror copy 0 exactly: the number
    // of distinct texts (duplicate-group structure) is identical
    assert(docs.filter(col("doc_id") < n).select("text").distinct().count() ==
      k1.select("t1").distinct().count())
  }

  test("provenance: fresh generation writes the chain marker; class math is exact") {
    val chain = ScaleGen.readChain(outDir)
    assert(chain == Seq(factor), s"marker must record the generation chain: $chain")
    // the rotation-composition algebra the guard rests on (SCALING.md r15):
    // direct x100 engages all 100 bijection classes; the accidental x10x10
    // folds to 10 (Alpha2 never engages); the canonical x100 -> x10 chain
    // keeps 100 classes with 10-way clones on top
    assert(ScaleGen.classSet(Seq(100)).size == 100)
    assert(ScaleGen.classSet(Seq(10, 10)).size == 10)
    assert(ScaleGen.classSet(Seq(100, 10)).size == 100)
    assert(ScaleGen.classSet(Nil).size == 1)
  }

  test("provenance: re-chaining from a non-x100 base refuses; --stress keeps it reachable") {
    val d2 = tmpDir("graft_scalegen_chain").getAbsolutePath
    // outDir is a x3 corpus — chaining from it folds bijection classes, the
    // exact r15 accident: must refuse loudly
    val e = intercept[IllegalArgumentException] {
      ScaleGen.generate(spark, outDir, d2, 2)
    }
    assert(e.getMessage.contains("refusing to chain"), e.getMessage)
    assert(e.getMessage.contains("--stress"), "the message must name the escape hatch")
    // the deliberate clone-regime path stays available by flag, and the
    // resulting marker records the full chain so a THIRD generation still
    // sees the truth
    ScaleGen.generate(spark, outDir, d2, 2, stress = true)
    assert(ScaleGen.readChain(d2) == Seq(factor, 2))
    assert(spark.read.parquet(s"$d2/lineitem.parquet").count() ==
      2 * spark.read.parquet(s"$outDir/lineitem.parquet").count())
  }

  test("provenance: a marker-less NON-testdata base refuses; testdata root and --stress stay accepted") {
    // the round-16 hole: readChain treated ANY marker-less dir as pristine
    // base data, so a pre-marker chained corpus (or a crashed generation's
    // half-corpus) under target/scale silently defeated the chain guard
    val d3 = tmpDir("graft_scalegen_nomarker").getAbsolutePath
    ScaleGen.generate(spark, "/root/testdata/sf0.001", d3, 1)
    assert(new java.io.File(d3, ScaleGen.MarkerName).delete())
    val d4 = tmpDir("graft_scalegen_nomarker_out").getAbsolutePath
    val e = intercept[IllegalArgumentException] {
      ScaleGen.generate(spark, d3, d4, 2)
    }
    assert(e.getMessage.contains("marker-less"), e.getMessage)
    assert(e.getMessage.contains("--stress"), "the message must name the escape hatch")
    // the escape hatch still works, and the result is marked as stress
    ScaleGen.generate(spark, d3, d4, 2, stress = true)
    assert(ScaleGen.readChain(d4) == Seq(2))
    // the driver testdata root itself needs no marker (generation above
    // already proves it; pin the predicate too)
    assert(ScaleGen.readChain("/root/testdata/sf0.001").isEmpty)
  }

  test("provenance: a crashed generation leaves NO marker (delete-first, write-last)") {
    // stale-marker hygiene: re-generating over an existing corpus must
    // remove the old marker before touching tables, so a crash cannot
    // leave the old chain beside partially-overwritten data
    val src = tmpDir("graft_scalegen_emptysrc").getAbsolutePath // no tables
    val out = tmpDir("graft_scalegen_crash").getAbsolutePath
    val stale = new java.io.File(out, ScaleGen.MarkerName)
    java.nio.file.Files.write(stale.toPath,
      """{"factors":[100],"stress":false}""".getBytes("UTF-8"))
    intercept[Exception] { // region.parquet missing -> read fails mid-run
      ScaleGen.generate(spark, src, out, 2, stress = true)
    }
    assert(!stale.isFile,
      "a crashed generation must not leave a (stale) provenance marker")
  }

  test("provenance: an unremovable stale marker refuses generation LOUDLY, before any table write") {
    // round-17 advice: File.delete()'s discarded false return let
    // generation proceed with the old marker still in place. The failure
    // mode needs the marker to be undeletable — a non-empty directory at
    // the marker path makes both delete() and deleteIfExists fail, and the
    // generation must throw BEFORE overwriting anything.
    val out = tmpDir("graft_scalegen_baddel").getAbsolutePath
    val stale = new java.io.File(out, ScaleGen.MarkerName)
    assert(stale.mkdirs() && new java.io.File(stale, "occupant").createNewFile())
    intercept[java.io.IOException] {
      ScaleGen.generate(spark, "/root/testdata/sf0.001", out, 1)
    }
    assert(stale.isDirectory, "the undeletable marker is still there (loud, not silent)")
    assert(!new java.io.File(out, "region.parquet").exists,
      "generation must refuse before touching any table")
  }

  test("embedding isometry: copies share coordinate multisets up to sign, not raw vectors") {
    // the vector twin of the text-bijection property: rotation+negation is
    // an exact isometry (same floats, reordered/sign-flipped), so the
    // |coordinate| multiset is bit-identical per copy — but the raw vector
    // must differ, or capless embedding dedup benches go quadratic on
    // cross-copy exact clones
    val src = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val n = src.count()
    val emb = spark.read.parquet(s"$outDir/embeddings.parquet")
    val k1 = emb.filter(col("vec_id") >= n && col("vec_id") < 2 * n)
      .select((col("vec_id") - n).as("vec_id"), col("embedding").as("e1"))
    val joined = src.select(col("vec_id"), col("embedding").as("e0")).join(k1, "vec_id")
    assert(joined.count() == n)
    def absSorted(c: org.apache.spark.sql.Column) =
      sort_array(transform(c, x => abs(x)))
    assert(joined.filter(absSorted(col("e0")) =!= absSorted(col("e1"))).count() == 0)
    assert(joined.filter(col("e0") === col("e1")).count() == 0)
  }
}
