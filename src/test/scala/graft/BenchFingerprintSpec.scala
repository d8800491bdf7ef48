package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the EXACT staleness contract of the bench run-series key (round-16
  * verdict task 3): "-stale" is driven by comparing the source hash
  * build.sbt recorded at compile time (target/scala-2.13/graft-src.fp)
  * against the same hash recomputed at run time — content, never mtimes.
  * So `touch` and edit-then-revert keep a run clean, while any real source
  * difference (compile-time record ≠ current tree) marks it.
  */
class BenchFingerprintSpec extends AnyFunSuite {

  test("build.sbt's compile-time record matches Bench's run-time hash (same function, byte-identical trees)") {
    val recorded = Bench.recordedSrcFp()
    assert(recorded.nonEmpty,
      "target/scala-2.13/graft-src.fp must exist after a compile under the r17 build definition")
    // this test RUNS from the classes that compile produced, so the
    // recorded hash must equal the recomputed one — this is the equality
    // the whole mechanism rests on (it fails loudly if the two
    // implementations of the hash ever drift)
    assert(recorded.contains(Bench.codeFingerprint()),
      s"recorded=$recorded recomputed=${Bench.codeFingerprint()} — " +
        "build.sbt's graftSrcFingerprint drifted from Bench.codeFingerprint " +
        "(or the source tree changed since the compile)")
  }

  test("touch-without-change stays clean: staleness ignores mtimes when a record exists") {
    // bump the mtime of a real source file — the pre-r17 heuristic
    // (sources newer than classes) would have marked the run -stale
    val src = new java.io.File("src/main/scala/graft/Bench.scala")
    assert(src.isFile)
    assert(src.setLastModified(System.currentTimeMillis()))
    val fp = Bench.codeFingerprint()
    assert(!Bench.staleAgainst(Bench.recordedSrcFp(), fp),
      "mtime churn must not evict a content-identical run from its median series")
  }

  test("a real source difference marks stale; an identical tree does not") {
    val fp = Bench.codeFingerprint()
    assert(!Bench.staleAgainst(Some(fp), fp))
    // the recorded hash describing ANY other tree content => stale
    assert(Bench.staleAgainst(Some("0123456789abcdef"), fp),
      "a compile-time record differing from the current tree means the " +
        "running classes are not this fingerprint — must mark -stale")
  }
}
