package graft

import graft.streaming.EventStream
import graft.streaming.EventStream.{Event, Session}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Structured Streaming specs: MemoryStream-driven, results compared to the
  * batch twins of the same transforms. */
class StreamingSpec extends SparkSpec {

  // base offset keeps event times away from the epoch-0 initial watermark
  private val Base = 86400000L
  private def ts(minutes: Long) = new java.sql.Timestamp(Base + minutes * 60000L)

  test("streaming tumbling window agg matches the batch computation") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, java.sql.Timestamp, Long, String, Double, String)]
    val events = mem.toDF().toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val q = EventStream.tumblingCounts(events)
      .writeStream.format("memory").queryName("tumbling").outputMode("complete").start()
    try {
      mem.addData(
        (1L, ts(10), 1L, "click", 1.0, "{}"),
        (2L, ts(20), 1L, "click", 2.0, "{}"),
        (3L, ts(70), 2L, "view", 5.0, "{}"),
        (4L, ts(80), 2L, "click", 7.0, "{}"))
      q.processAllAvailable()
      val got = spark.table("tumbling")
        .orderBy("hour", "event_type")
        .collect().map(r => ((r.getTimestamp(0).getTime - Base) / 60000, r.getString(1), r.getLong(2), r.getDouble(3)))
      assert(got.toSeq == Seq(
        (0L, "click", 2L, 3.0), (60L, "click", 1L, 7.0), (60L, "view", 1L, 5.0)))
    } finally q.stop()
  }

  test("file-source streaming: events parquet dir through tumbling agg matches batch") {
    val dir = tmpDir("graft-stream-src")
    // stage the testdata events as a stream source dir (ts normalized to µs)
    val batch = graft.queries.Util.eventsWithTs(spark, "/root/testdata/sf0.001")
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
    batch.write.mode("overwrite").parquet(dir.getAbsolutePath)
    val streamed = graft.streaming.EventStream.readEvents(spark, dir.getAbsolutePath)
    val q = graft.streaming.EventStream.tumblingCounts(streamed)
      .writeStream.format("memory").queryName("file_tumbling").outputMode("complete").start()
    try {
      q.processAllAvailable()
      val got = spark.table("file_tumbling")
        .orderBy("hour", "event_type").collect()
        .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSeq
      val expect = graft.streaming.EventStream.tumblingCounts(batch)
        .orderBy("hour", "event_type").collect()
        .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSeq
      assert(got.nonEmpty && got == expect)
    } finally q.stop()
  }

  test("streaming dedup drops repeated event ids within the watermark") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, java.sql.Timestamp, Long, String, Double, String)]
    val events = mem.toDF().toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val q = graft.streaming.EventStream.streamingDedup(events)
      .writeStream.format("memory").queryName("deduped").outputMode("append").start()
    try {
      mem.addData(
        (1L, ts(1), 1L, "click", 1.0, "{}"),
        (1L, ts(2), 1L, "click", 1.0, "{}"), // duplicate id, same batch
        (2L, ts(3), 1L, "view", 2.0, "{}"))
      q.processAllAvailable()
      mem.addData((1L, ts(4), 1L, "click", 1.0, "{}")) // duplicate id, later batch
      q.processAllAvailable()
      val ids = spark.table("deduped").select("event_id").collect().map(_.getLong(0)).sorted
      assert(ids.toSeq == Seq(1L, 2L))
    } finally q.stop()
  }

  test("foreachBatch bridge writes exact-name shards per micro-batch; typed facade reads back") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext
    val outDir = tmpDir("graft-stream-sink")
    val mem = MemoryStream[(String, Int, String, Double, String)]
    val records = mem.toDF().toDF("bytes_s", "sr", "path", "duration", "transcription")
      .select(
        struct(encode(col("bytes_s"), "UTF-8").as("bytes"), col("sr").as("sampling_rate"),
          col("path")).as("audio"),
        col("duration"), col("transcription"))
    val q = graft.streaming.EventStream
      .shardSinkQuery(records, outDir.getAbsolutePath, filesPerShard = 2)
      .option("checkpointLocation", tmpDir("graft-ckpt").getAbsolutePath)
      .start()
    try {
      mem.addData(
        ("aa", 8000, "a.wav", 1.0, "ta"), ("bb", 8000, "b.wav", 2.0, "tb"),
        ("cc", 8000, "c.wav", 3.0, "tc"))
      q.processAllAvailable()
      val batch0 = new java.io.File(outDir, "batch=0")
      val files = batch0.list().filterNot(_.startsWith(".")).sorted.toSeq
      assert(files == Seq("0.parquet", "1.parquet"))
      val typed = graft.core.AudioRecord.fromFrame(
        spark.read.parquet(batch0.getAbsolutePath))
      val recs = typed.collect().sortBy(_.audio.path)
      assert(recs.map(_.audio.path).toSeq == Seq("a.wav", "b.wav", "c.wav"))
      assert(recs.head.transcription == "ta" && recs.head.duration == 1.0)
    } finally q.stop()
  }

  test("stream-static enrich: broadcast dim joins onto the stream per batch") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, java.sql.Timestamp, Long, String, Double, String)]
    val events = mem.toDF().toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val dim = Seq((1L, "gold"), (2L, "basic")).toDF("user_id", "tier")
    val q = graft.streaming.EventStream.enrich(events, dim, "user_id")
      .writeStream.format("memory").queryName("enriched").outputMode("append").start()
    try {
      mem.addData((1L, ts(1), 1L, "click", 1.0, "{}"), (2L, ts(2), 3L, "view", 2.0, "{}"))
      q.processAllAvailable()
      val got = spark.table("enriched").orderBy("event_id")
        .collect().map(r => (r.getAs[Long]("event_id"), r.getAs[String]("tier")))
      assert(got.toSeq == Seq((1L, "gold"), (2L, null))) // left join keeps unmatched
    } finally q.stop()
  }

  test("stream-stream interval join pairs clicks with preceding views in-window") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext
    val memC = MemoryStream[(Long, java.sql.Timestamp, Long, String, Double, String)]
    val memV = MemoryStream[(Long, java.sql.Timestamp, Long, String, Double, String)]
    val cols = Seq("event_id", "ts", "user_id", "event_type", "value", "props")
    val q = graft.streaming.EventStream.correlate(
        memC.toDF().toDF(cols: _*), memV.toDF().toDF(cols: _*))
      .writeStream.format("memory").queryName("correlated").outputMode("append").start()
    try {
      memV.addData((10L, ts(0), 1L, "view", 0.0, "{}"),   // in window for click@20
        (11L, ts(100), 2L, "view", 0.0, "{}"))            // AFTER click@25 → no pair
      memC.addData((20L, ts(20), 1L, "click", 1.0, "{}"),
        (21L, ts(25), 2L, "click", 2.0, "{}"),
        (22L, ts(55), 1L, "click", 3.0, "{}"))            // view@0 is 55min old → outside 30min
      q.processAllAvailable()
      val got = spark.table("correlated").select("click_id", "view_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).sorted
      assert(got.toSeq == Seq((20L, 10L)))
    } finally q.stop()
  }

  test("streaming sessionization closes sessions on gap and emits exact aggregates") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    val q = EventStream.sessionize(mem.toDS())
      .writeStream.format("memory").queryName("sessions").outputMode("append").start()
    try {
      // user 1: events at t=0,10 then a 60-min gap then t=70 → first session closes
      mem.addData(
        Event(1, ts(0), 1, "click", 1.0),
        Event(2, ts(10), 1, "click", 2.0))
      q.processAllAvailable()
      mem.addData(Event(3, ts(70), 1, "click", 4.0))
      q.processAllAvailable()
      val got = spark.table("sessions").as[Session].collect().toSeq
      assert(got == Seq(Session(1, Base, Base + 10 * 60000, 2, 3.0)))
    } finally q.stop()
  }
}
