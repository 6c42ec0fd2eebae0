package graft.core

import org.apache.spark.sql.SparkSession

/** Dev probe: plan + timing for the profile family at a given SF dir. */
object ProfileProbeMain {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .config("spark.driver.memory", "8g")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
    def time(tag: String)(f: => Unit): Unit = {
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"$tag%-24s min=${ts.min}%.3f all=${ts.map(t => f"$t%.2f").mkString(",")}")
    }
    if (args.contains("explain"))
      Profile.profileApprox(li).explain("formatted")
    time("scan_floor_11col") { li.queryExecution.toRdd.count() }
    time("profile_exact") { Profile.profile(li).queryExecution.toRdd.count() }
    time("profile_approx") { Profile.profileApprox(li).queryExecution.toRdd.count() }
    spark.stop()
  }
}
