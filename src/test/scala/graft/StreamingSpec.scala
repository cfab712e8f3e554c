package graft

import graft.streaming.EventStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Streaming/batch twin equivalence: the same tumbling-window aggregation
  * expressions run over the events parquet as a stream must produce exactly
  * the batch result (file source + memory sink + processAllAvailable).
  */
class StreamingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("streaming tumbling agg equals batch twin") {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // file stream source needs a directory, not a bare parquet file
    val dir = java.nio.file.Files.createTempDirectory("events-stream").toString
    java.nio.file.Files.copy(
      java.nio.file.Paths.get("/root/testdata/sf0.001/events.parquet"),
      java.nio.file.Paths.get(dir, "events.parquet"))
    val raw = spark.read.parquet(dir)
    val batch = EventStream.tumblingCounts(
      raw.withColumn("ts", expr("timestamp_micros(ts div 1000)")))
      .orderBy("window_start", "event_type").collect()

    val q = EventStream.streamingTumblingCounts(spark, dir, raw.schema)
      .writeStream.format("memory").queryName("stream_out")
      .outputMode("complete").start()
    try {
      q.processAllAvailable()
      val stream = spark.table("stream_out")
        .orderBy("window_start", "event_type").collect()
      assert(stream.length == batch.length && stream.length > 0)
      assert(stream.toSeq == batch.toSeq)
    } finally q.stop()
  }

  test("session_window boundary: exact-gap event merges (strict-gap SQL twin)") {
    import spark.implicits._
    // Events exactly gap apart MERGE into one session — pins the semantics
    // the stream_session_agg oracle twin encodes with its strict
    // `ts - lag(ts) > gap` predicate.
    val ev = Seq(
      (1L, java.sql.Timestamp.valueOf("2026-01-01 00:00:00"), 1.0),
      (1L, java.sql.Timestamp.valueOf("2026-01-01 00:30:00"), 1.0),
      (1L, java.sql.Timestamp.valueOf("2026-01-01 01:00:01"), 1.0)
    ).toDF("user_id", "ts", "value")
    val sessions = EventStream.sessionCounts(ev).orderBy("session_start").collect()
    assert(sessions.length == 2, s"got ${sessions.toSeq}")
    assert(sessions(0).getLong(2) == 2L) // 00:00 + 00:30 merged
    assert(sessions(1).getLong(2) == 1L) // 01:00:01 is > gap after 00:30
  }
}
