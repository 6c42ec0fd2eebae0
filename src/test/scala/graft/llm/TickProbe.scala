package graft.llm
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object TickProbe {
  def main(args: Array[String]): Unit = {
    val aqe = args.headOption.getOrElse("true")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.adaptive.enabled", aqe)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time(tag: String)(f: => Unit): Unit = {
      val ts = (1 to 2).map { _ => val t0 = System.nanoTime(); f; (System.nanoTime()-t0)/1e9 }
      println(f"$tag aqe=$aqe min=${ts.min}%.2f all=${ts.map(t=>f"$t%.2f").mkString(",")}")
    }
    time("query_full") {
      graft.SparkEntry.queries("text_classifier")(spark, "/root/repo/bigdata/docs10")
        .queryExecution.toRdd.count()
    }
    spark.stop()
  }
}
