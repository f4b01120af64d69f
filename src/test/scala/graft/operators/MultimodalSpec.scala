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

  // ---- the memory-budget proof for the decode slot: a real codec
  // fits extractFeatures at region size because rows STREAM — see the
  // memory contract on Multimodal.extractFeatures

  private def syntheticMedia(n: Int) = {
    import spark.implicits._
    spark.range(n).repartition(1) // ONE partition: per-task accounting
      .map(i => Multimodal.MediaRow(i, "image",
        Array[Byte](1, 2, 3), 64, 48))
  }

  test("decode slot streams: in-flight rows stay O(1) at 10x region size") {
    // 500k rows = 10x a 50k-row compacted region, one task. The
    // instrumented decoder tracks decoded-but-not-yet-consumed rows;
    // a slot that materialized the partition would show ~500k.
    MultimodalProbe.reset()
    val n = 500000
    val feats = Multimodal.extractFeatures(syntheticMedia(n), dim = 4,
      decode = MultimodalProbe.countingDecode)
    import spark.implicits._
    val consumed = feats.mapPartitions { it =>
      it.map { r => MultimodalProbe.consumed.incrementAndGet(); r }
    }.count()
    assert(consumed == n)
    val peak = MultimodalProbe.maxInFlight.get()
    assert(peak < 64,
      s"decode slot buffered $peak rows — the streaming contract " +
        "(O(1) live decode buffers per task) is broken")
  }

  test("real-size frame buffers fit the slot in a bounded heap") {
    // a 1080p RGB frame buffer per row (~6 MB), 5k rows in one task:
    // materialized that is ~30 GB — far beyond this JVM's heap — so
    // completing at all proves buffers are transient (one live per
    // task), the no-OOM-at-region-size property.
    val frameBytes = 1920 * 1080 * 3
    val n = 5000
    val feats = Multimodal.extractFeatures(syntheticMedia(n), dim = 4,
      decode = (payload, dim) => {
        val frame = new Array[Byte](frameBytes) // the codec's buffer
        frame(payload.length) = payload(0)
        Array.tabulate(dim)(j => frame(j) + payload(0).toFloat)
      })
    assert(feats.count() == n)
  }
}

/** Shared accounting for the streaming-contract probe (executor threads
  * and driver share the JVM in local mode). */
object MultimodalProbe {
  val decoded = new java.util.concurrent.atomic.AtomicLong
  val consumed = new java.util.concurrent.atomic.AtomicLong
  val maxInFlight = new java.util.concurrent.atomic.AtomicLong

  def reset(): Unit = { decoded.set(0); consumed.set(0); maxInFlight.set(0) }

  val countingDecode: (Array[Byte], Int) => Array[Float] = (payload, dim) => {
    val inFlight = decoded.incrementAndGet() - consumed.get()
    maxInFlight.updateAndGet(m => math.max(m, inFlight))
    Array.tabulate(dim)(_ => payload(0).toFloat)
  }
}
