package graft

import org.apache.spark.sql.SparkSession

/** Single-query profiling aid: times one registered query on the bench
  * session config (warm pass first, so catalog builds and JIT are out
  * of the number) and prints its formatted physical plan — the
  * `.explain`-and-iterate loop SURVEY §6 prescribes, as a one-liner.
  *
  * Usage: `runMain graft.Prof <queryName> [sfDir]`
  */
object Prof {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: runMain graft.Prof <queryName> [sfDir]")
    val d = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.files.maxPartitionBytes", "4m")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.sources.v2.bucketing.enabled", "true")
      .config("spark.sql.sources.v2.bucketing.pushPartValues.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val q = SparkEntry.queries.getOrElse(args(0),
      sys.error(s"unknown query '${args(0)}'; names: " +
        SparkEntry.queries.keys.toSeq.sorted.mkString(", ")))
    q(spark, d).count() // warm: builds catalog tables, JITs codegen
    val t0 = System.nanoTime()
    val df = q(spark, d)
    df.count()
    println(f"[prof] ${args(0)} ${(System.nanoTime() - t0) / 1e9}%.2f s")
    println(df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted")))
    spark.stop()
  }
}
