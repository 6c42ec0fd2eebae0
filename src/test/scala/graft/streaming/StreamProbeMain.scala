package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Manual probe main (test scope): drives StreamOps end-to-end through a
  * real `readStream` file source over the testdata events parquet.
  * Usage: Test/runMain graft.streaming.StreamProbeMain [sfDir]
  */
object StreamProbeMain {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // file-stream sources watch a DIRECTORY; stage the single parquet file
    val stageDir = java.nio.file.Files.createTempDirectory("graft-stream").toFile
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$dir/events.parquet"),
      java.nio.file.Paths.get(stageDir.getPath, "events.parquet"))

    val schema = spark.read.parquet(s"$dir/events.parquet").schema
    val stream = spark.readStream.schema(schema).parquet(stageDir.getPath)
      // ts arrives as long nanos (nanosAsLong); windows need a timestamp
      .withColumn("ts", (col("ts") / 1e9).cast("timestamp"))

    val counts = StreamOps.windowedEventCounts(stream,
      watermark = "1 hour", win = "1 hour")
    val q = counts.writeStream.format("memory").queryName("probe_counts")
      .outputMode("update").start()
    q.processAllAvailable()
    val rows = spark.table("probe_counts")
      .groupBy("event_type").agg(sum("n").as("n")).orderBy("event_type")
    println("=== streaming windowed counts by event_type ===")
    rows.collect().foreach(r => println(s"${r.getString(0)}: ${r.getLong(1)}"))
    val total = spark.table("probe_counts").agg(sum("n")).head().getLong(0)
    val batch = spark.read.parquet(s"$dir/events.parquet").count()
    println(s"stream total=$total batch total=$batch match=${total == batch}")
    q.stop()
    spark.stop()
  }
}
