package graft.analysis

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object PcaProbeMain {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[2]")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val df = Seq((1.0, 5.0), (2.0, 5.0), (3.0, 5.0)).toDF("a", "const")
    try Pca.circle(df, Seq("a", "const"), spark).show()
    catch { case e: Exception => println("NULL-CORR-ERR: " + e.getMessage.linesIterator.next()) }
    val one = Seq((1.0, 2.0)).toDF("a", "b")
    try Pca.circle(one, Seq("a", "b"), spark).show()
    catch { case e: Exception => println("ONE-ROW-ERR: " + e.getMessage.linesIterator.next()) }
    spark.stop()
  }
}
