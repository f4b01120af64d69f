package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** Streaming semantics verified against the equivalent batch queries:
  * the windowed/sessionized/deduped streaming results on a bounded file
  * stream must equal the batch computation on the same data. */
class EventStreamsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private lazy val batchEvents = {
    val df = spark.read.parquet(s"${TestSpark.sfDir}/events.parquet")
    if (df.schema("ts").dataType == org.apache.spark.sql.types.LongType)
      df.withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
    else df
  }

  /** Append mode only emits windows already past the watermark at
    * end-of-stream; compare against batch up to that horizon. */
  private lazy val horizon = {
    val maxTs = batchEvents.agg(max("ts")).collect()(0).getTimestamp(0)
    new java.sql.Timestamp(maxTs.getTime - 2 * 3600 * 1000L)
  }

  test("tumbling window stream equals batch aggregation up to watermark") {
    val stream = EventStreams.asStream(spark, TestSpark.sfDir)
    val got = EventStreams.runToBatch(spark,
      EventStreams.tumblingCounts(stream), "t_tumbling")
    val exp = batchEvents
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("cnt"), sum(col("value")).as("sum_value"))
      .select(col("window.start").as("window_start"),
        col("window.end").as("window_end"),
        col("event_type"), col("cnt"), col("sum_value"))
      .filter(col("window_end") <= lit(horizon))
    val gotClosed = got.filter(
      col("window_start") + expr("INTERVAL 1 HOUR") <= lit(horizon))
    assert(gotClosed.count() == exp.count())
    assert(gotClosed.select("window_start", "event_type", "cnt")
      .collect().toSet ==
      exp.select("window_start", "event_type", "cnt").collect().toSet)
  }

  test("session windows: closed sessions match batch session_window") {
    val stream = EventStreams.asStream(spark, TestSpark.sfDir)
    val got = EventStreams.runToBatch(spark,
      EventStreams.sessionCounts(stream), "t_sessions")
    assert(got.count() > 0)
    assert(got.filter(col("session_end") <= col("session_start")).count() == 0)
    val exp = batchEvents
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("session_window.start").as("session_start"),
        col("user_id"), col("n_events"))
      .filter(col("session_window.end") <= lit(horizon))
    val gotClosed = got.filter(col("session_end") <= lit(horizon))
      .select("session_start", "user_id", "n_events")
    assert(gotClosed.collect().toSet == exp.collect().toSet)
  }

  test("streaming dedup keeps one row per event_id") {
    val stream = EventStreams.asStream(spark, TestSpark.sfDir)
    val got = EventStreams.runToBatch(spark,
      EventStreams.dedupEvents(stream), "t_dedup")
    assert(got.count() == batchEvents.select("event_id").distinct().count())
  }

  test("flatMapGroupsWithState running totals match batch group-by") {
    val stream = EventStreams.asStream(spark, TestSpark.sfDir)
    val got = EventStreams.runToBatch(spark,
      EventStreams.userRunningTotals(spark, stream).toDF(), "t_state",
      outputMode = "update")
    // final state per user (last update) == batch totals
    val finalPerUser = got.groupBy("user_id")
      .agg(max("n").as("n"))
    val exp = batchEvents.groupBy("user_id").agg(count(lit(1)).as("n"))
    assert(finalPerUser.collect().map(r => (r.getLong(0), r.getLong(1))).toSet ==
      exp.collect().map(r => (r.getLong(0), r.getLong(1))).toSet)
  }
}
