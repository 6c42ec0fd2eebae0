package graft.functions

import org.apache.spark.sql.SparkSession

object FpProbeMain {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[2]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.sql("SELECT graft_fingerprint('hello world') AS fp, graft_fingerprint('héllo 😀world') AS fp_nonascii").show(truncate = false)
    try spark.sql("SELECT graft_fingerprint(42)").show()
    catch { case e: Exception => println("TYPE-ERR: " + e.getMessage.linesIterator.next()) }
    try spark.sql("SELECT graft_fingerprint('a', 'b')").show()
    catch { case e: Exception => println("ARITY-ERR: " + e.getMessage.linesIterator.next()) }
    spark.stop()
  }
}
