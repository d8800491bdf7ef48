package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property check for the fixed-point GD trainer: over RANDOM small corpora,
  * the full Spark path (parquet round-trip → featurization with ANSI
  * semantics and HOF stopword filter → codegen'd fixed-point scoring →
  * map-side-combined gradient → driver update) must reproduce a plain-Scala
  * reference of the same integer algebra EXACTLY, round by round. This is
  * the determinism claim the oracle relies on, tested beyond the one fixture
  * corpus: any divergence in division truncation, HOF evaluation, overflow
  * handling, or feature arithmetic fails here first.
  */
class TrainLogRegPropertySpec extends SparkSpec {

  private def forSamples[A](g: Gen[A], n: Int)(check: A => Unit): Unit =
    (0 until n).foreach { i => g.apply(Gen.Parameters.default, Seed(i.toLong)).foreach(check) }

  // vocabulary exercises both stopwords and the length/token-count ranges
  private val word = Gen.oneOf("the", "a", "data", "table", "row", "fast",
    "zebra", "quantization", "x", "deduplication")
  private val doc = Gen.chooseNum(1, 80).flatMap(k => Gen.listOfN(k, word)).map(_.mkString(" "))
  private val corpus = Gen.chooseNum(1, 25).flatMap(n => Gen.listOfN(n, doc))

  /** Plain-Scala reference of the integer GD algebra (mirrors the scaladoc
    * contract of TextOps.trainLogregQuality; Long./ truncates toward zero). */
  private def reference(texts: Seq[String]): Seq[(Long, Long, Long, Long, Long, Long, Long)] = {
    val S = 1000000L
    val feats = texts.map { t =>
      val toks = t.split(" ", -1)
      val sw = toks.count(w => w == "the" || w == "a")
      (1L, t.length.toLong / 50L - 6L, toks.length.toLong / 10L - 5L, sw.toLong - 3L,
        if (t.length >= 300) 1L else 0L)
    }
    var w = Array(0L, 0L, 0L, 0L)
    (1 to 3).map { i =>
      var g = Array(0L, 0L, 0L, 0L); var sse = 0L; var correct = 0L
      feats.foreach { case (x0, x1, x2, x3, y) =>
        val z = w(0) * x0 + w(1) * x1 + w(2) * x2 + w(3) * x3
        val p = math.max(0L, math.min(S, S / 2 + z / 4))
        val d = p - y * S
        g = Array(g(0) + x0 * d, g(1) + x1 * d, g(2) + x2 * d, g(3) + x3 * d)
        sse += (d / 1000) * (d / 1000)
        if ((if (p > S / 2) 1L else 0L) == y) correct += 1
      }
      val lrDenom = math.max(feats.size.toLong, 1L) * 5L
      w = Array.tabulate(4)(j => w(j) - g(j) / lrDenom)
      (i.toLong, w(0), w(1), w(2), w(3), sse, correct)
    }
  }

  test("random corpora: Spark trajectory == plain-Scala integer reference, bit for bit") {
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType),
      StructField("lang", StringType), StructField("source", StringType),
      StructField("n_chars", LongType)))
    val dir = tmpDir("graft_tlq_prop").getAbsolutePath
    var sample = 0
    forSamples(corpus, n = 6) { texts =>
      sample += 1
      val rows = texts.zipWithIndex.map { case (t, i) =>
        Row(i.toLong, t, "en", "web", t.length.toLong)
      }
      spark.createDataFrame(spark.sparkContext.parallelize(rows, 2), schema)
        .write.mode("overwrite").parquet(s"$dir/$sample/documents.parquet")
      val got = SparkEntry.queries("train_logreg_quality")(spark, s"$dir/$sample")
        .orderBy("iter").collect().map { r =>
          (r.getAs[Long]("iter"), r.getAs[Long]("w0"), r.getAs[Long]("w1"),
            r.getAs[Long]("w2"), r.getAs[Long]("w3"), r.getAs[Long]("sse"),
            r.getAs[Long]("n_correct"))
        }.toSeq
      assert(got == reference(texts),
        s"sample $sample (${texts.size} docs): $got != ${reference(texts)}")
    }
  }
}
