package graft.core

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.SparkSpec

class TopKSpec extends SparkSpec {
  import spark.implicits._

  private def data = {
    val rnd = new scala.util.Random(17)
    (1 to 2000).map(i => (s"k${rnd.nextInt(5)}", i.toLong, rnd.nextInt(100)))
      .toDF("k", "id", "v")
  }

  test("perKey == the single-window form, row for row") {
    val two = TopK.perKey(data, Seq("k"), Seq(col("v").desc, col("id")), 7)
      .collect().toSet
    val one = data.withColumn("rank", row_number().over(
        Window.partitionBy("k").orderBy(col("v").desc, col("id"))).cast("long"))
      .filter(col("rank") <= 7).collect().toSet
    assert(two === one)
  }

  test("perKey is partitioning-independent under a total order") {
    val a = TopK.perKey(data, Seq("k"), Seq(col("v").desc, col("id")), 5).collect().toSet
    val b = TopK.perKey(data.repartition(13), Seq("k"), Seq(col("v").desc, col("id")), 5)
      .collect().toSet
    assert(a === b)
  }

  test("perKey: groups smaller than k keep every row, ranked") {
    val df = Seq(("a", 1L, 9), ("a", 2L, 5)).toDF("k", "id", "v")
    val out = TopK.perKey(df, Seq("k"), Seq(col("v").desc, col("id")), 10)
      .orderBy("rank").collect().map(r => (r.getLong(1), r.getLong(3)))
    assert(out === Array((1L, 1L), (2L, 2L)))
  }
}
