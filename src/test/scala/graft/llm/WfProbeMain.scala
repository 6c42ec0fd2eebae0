package graft.llm
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object WfProbeMain {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet("/root/repo/bigdata/docs10/documents.parquet")
    def time(tag: String)(f: => Unit): Unit = {
      val ts = (1 to 3).map { _ => val t0 = System.nanoTime(); f; (System.nanoTime()-t0)/1e9 }
      println(f"$tag%-18s min=${ts.min}%.3f all=${ts.map(t=>f"$t%.2f").mkString(",")}")
    }
    time("wordfreq") {
      docs.select(explode(split(col("text"), "\\s+")).as("w"))
        .groupBy("w").agg(count(lit(1))).queryExecution.toRdd.count()
    }
    time("bpe_train") {
      spark.catalog.clearCache()
      TextAnalysis.trainBpeMerges(docs, "text", 12).queryExecution.toRdd.count()
    }
    spark.stop()
  }
}
