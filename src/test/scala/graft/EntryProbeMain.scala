package graft

import org.apache.spark.sql.SparkSession

/** Simulates the driver's smoke check: a PLAIN session (no
  * GraftExtensions, no nanosAsLong) calling SparkEntry.entry.
  */
object EntryProbeMain {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val n = SparkEntry.entry(spark).count()
    println(s"ENTRY rows=$n")
    spark.stop()
  }
}
