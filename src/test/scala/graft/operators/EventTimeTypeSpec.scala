package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{TimestampType, TimestampNTZType, LongType}
import graft.TestSpark

/** Pins the event-time type contract so testdata drift fails LOUDLY here
  * instead of silently breaking the watermark family (the round-8
  * regression: events.parquet changed from TIMESTAMP(NANOS) to µs
  * TIMESTAMP with isAdjustedToUTC=false, which Spark 4's default
  * inferTimestampNTZ=true reads as TIMESTAMP_NTZ — and withWatermark,
  * unix_micros, and session_window all reject NTZ).
  *
  * Contract: whatever physical annotation the testdata writer uses,
  * [[Relational.events]] and [[graft.streaming.EventStreams.asStream]]
  * must both resolve `ts` to a session-TZ TimestampType.
  */
class EventTimeTypeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("shared events helper normalizes ts to TimestampType on every sf") {
    for (sf <- Seq("sf0.001", "sf0.01")) {
      val dir = s"/root/testdata/$sf"
      if (new java.io.File(s"$dir/events.parquet").exists()) {
        val dt = Relational.events(spark, dir).schema("ts").dataType
        assert(dt == TimestampType,
          s"$sf events.ts resolved to $dt — testdata drifted again; " +
            "extend Relational.ev's normalization")
      }
    }
  }

  test("NTZ variant is normalized identically (micros preserved)") {
    // Force the NTZ read path via the per-source option regardless of the
    // session default, then apply the same normalization ev() uses and
    // check micros agree with the session-pinned read.
    val p = s"${TestSpark.sfDir}/events.parquet"
    val ntz = spark.read.option("inferTimestampNTZ", "true").parquet(p)
    val pinned = Relational.events(spark, TestSpark.sfDir)
    val normalized = ntz.schema("ts").dataType match {
      case TimestampNTZType =>
        ntz.withColumn("ts", col("ts").cast("timestamp"))
      case LongType =>
        ntz.withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
      case _ => ntz
    }
    assert(normalized.schema("ts").dataType == TimestampType)
    val a = normalized.agg(sum(unix_micros(col("ts")))).collect()(0).getLong(0)
    val b = pinned.agg(sum(unix_micros(col("ts")))).collect()(0).getLong(0)
    assert(a == b, "NTZ-normalized micros differ from session-pinned read")
  }

  test("event-time operators analyze: watermark + session_window accept ts") {
    val ev = Relational.events(spark, TestSpark.sfDir)
    // withWatermark throws at analysis on NTZ — this is the loud canary.
    val wm = ev.withWatermark("ts", "2 hours")
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n"))
    assert(wm.schema.fieldNames.contains("n"))
    val stream = graft.streaming.EventStreams.asStream(spark, TestSpark.sfDir)
    assert(stream.schema("ts").dataType == TimestampType)
  }
}
