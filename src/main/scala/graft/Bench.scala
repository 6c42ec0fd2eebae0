package graft

import org.apache.spark.sql.SparkSession
import graft.util.Json

/** Driver-run benchmark: times every SparkEntry query on
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line. A failed query is reported
  * with an `"err"` marker (and excluded from the total) instead of being
  * silently timed as if it had passed.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // absorb session/executor init so the alphabetically-first query
    // isn't charged ~5s of one-time startup
    spark.range(1000).selectExpr("sum(id)").collect()

    val results: Seq[(String, Either[String, Double])] =
      SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
        val t0 = System.nanoTime()
        val r =
          try { fn(spark, sfDir).count(); Right((System.nanoTime() - t0) / 1e9) }
          catch { case e: Throwable => Left(s"${e.getClass.getSimpleName}: ${e.getMessage}") }
        name -> r
      }

    val qs = results.map {
      case (k, Right(sec)) => s"${Json.q(k)}:$sec"
      case (k, Left(err))  => s"${Json.q(k)}:${Json.q("err " + err.take(160))}"
    }.mkString("{", ",", "}")
    val ok = results.collect { case (_, Right(s)) => s }
    val nerr = results.count(_._2.isLeft)
    val total = ok.sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"n_ok":${ok.size},"n_err":$nerr,"sf":${Json.q(sfDir)}}""")
    spark.stop()
  }
}
