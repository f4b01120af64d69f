package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** Multimodal plumbing: schema, batch shape, determinism, and that the
  * metadata path avoids reading payload bytes. */
class MultimodalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private lazy val media = Multimodal.mediaTable(spark, TestSpark.sfDir)

  test("media table carries binary payload + typed metadata") {
    val schema = media.schema
    assert(schema("payload").dataType.typeName == "binary")
    assert(media.count() == 500)
    assert(media.filter(col("width") < 16 || col("height") < 16).count() == 0)
  }

  test("feature extraction is partition-parallel, fixed-width, deterministic") {
    val f1 = Multimodal.extractFeatures(media, dim = 16)
    val rows = f1.collect()
    assert(rows.forall(_.features.length == 16))
    // deterministic across runs and partitionings
    val f2 = Multimodal.extractFeatures(
      media.repartition(13), dim = 16).collect()
    val m1 = rows.map(r => r.media_id -> r.features.toSeq).toMap
    val m2 = f2.map(r => r.media_id -> r.features.toSeq).toMap
    assert(m1 == m2)
    // non-empty payload → non-zero features
    assert(rows.filter(_.n_bytes > 0).forall(_.features.exists(_ != 0f)))
  }

  test("resize keeps metadata contract and bounds payload") {
    val r = Multimodal.resize(media, 8, 8).collect()
    assert(r.forall(x => x.width == 8 && x.height == 8))
    assert(r.forall(_.payload.length <= 64))
  }

  test("frame sampling explodes to one row per sampled frame") {
    val f = Multimodal.sampleFrames(media, everyN = 50)
    assert(f.columns.toSeq == Seq("media_id", "frame_offset", "frame_byte"))
    assert(f.count() >= media.count()) // ≥1 frame per non-empty payload
    assert(f.groupBy("media_id").count()
      .agg(max("count")).collect()(0).getLong(0) <= 8)
  }

  test("metadata-only stats never deserialize payloads") {
    val stats = Multimodal.metaStats(media)
    assert(stats.count() == 2) // image + audio
    // plan should not reference the payload column after pruning
    val plan = stats.queryExecution.optimizedPlan.toString
    assert(!plan.contains("payload") ||
      !stats.queryExecution.executedPlan.toString.contains("payload"))
  }
}
