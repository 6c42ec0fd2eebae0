package graft.core

import org.apache.spark.sql.SparkSession

/** Manual probe main (test scope): drives Opset.save/load end-to-end on
  * the real events Opset.
  */
object SaveProbeMain {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val os = Opset.sampleData(spark)
    val n = os.df.count()
    val dir = java.nio.file.Files.createTempDirectory("graft-save").toString + "/store"
    os.save(dir, numFiles = 4)
    val back = Opset.load(spark, dir)
    println(s"saved $n rows -> ${new java.io.File(dir).listFiles().count(_.getName.endsWith(".parquet"))} parquet files; reloaded ${back.df.count()} rows; records=${back.size}; get('1')=${back.get("1").count()}")
    spark.stop()
  }
}
