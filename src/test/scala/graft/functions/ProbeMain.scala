package graft.functions

import org.apache.spark.sql.SparkSession

/** Manual probe main (test scope, not shipped): drives graft_dot through
  * the SQL surface including its error paths.
  */
object ProbeMain {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[2]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    try spark.sql("SELECT graft_dot(array(1, 2), array(1.0d, 2.0d))").show()
    catch { case e: Exception => println("TYPE-ERR: " + e.getMessage.linesIterator.next()) }
    try spark.sql("SELECT graft_dot(array(1.0d))").show()
    catch { case e: Exception => println("ARITY-ERR: " + e.getMessage.linesIterator.next()) }
    spark.sql("SELECT graft_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d").show()
    spark.stop()
  }
}
