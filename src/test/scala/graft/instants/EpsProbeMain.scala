package graft.instants

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

object EpsProbeMain {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]").appName("eps-probe")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $name%-30s ${(System.nanoTime() - t0) / 1e9}%7.2f s"); r
    }
    val ev = spark.read.parquet(s"$dir/events.parquet")
    t("raw scan count") { println("  n=" + ev.count()) }
    t("raw scan count again") { ev.count() }
    val base = ev.select(col("user_id").cast("string").as("record"),
      col("ts"), col("event_id"), col("event_type"), col("value"))
    t("base select count") { base.count() }
    val w = Window.partitionBy("record").orderBy("ts", "event_id")
    val op = base.select(col("record"), row_number().over(w).cast("long").as("t"),
      col("event_type"), col("value"))
    t("windowed count") { op.count() }
    t("windowed count again") { op.count() }
    println("[probe] files=" + ev.inputFiles.length)
    t("agg only") { base.groupBy("record").count().count() }
    spark.stop()
  }
}
