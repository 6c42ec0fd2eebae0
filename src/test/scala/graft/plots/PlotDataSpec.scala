package graft.plots

import org.apache.spark.sql.functions._
import graft.SparkSpec

class PlotDataSpec extends SparkSpec {
  import spark.implicits._

  private def df = Seq(
    (1L, 10.0, 100.0, 5.0),
    (2L, 20.0, 200.0, 5.0),
    (3L, 30.0, 300.0, 5.0),
  ).toDF("k", "A [m]", "B [s]", "C [m]")

  test("melt emits one row per (key, variable) with parsed name/unit") {
    val m = PlotData.melt(df, Seq("k"), Seq("A [m]", "B [s]"))
    assert(m.count() === 6)
    val row = m.filter($"k" === 1L && $"variable" === "A [m]").head()
    assert(row.getAs[String]("name") === "A ")
    assert(row.getAs[String]("unit") === "m")
    assert(row.getAs[Double]("y") === 10.0)
  }

  test("byunitplot selects only the columns of the requested unit") {
    val m = PlotData.byunitplot(df, Seq("k"), Seq("A [m]", "B [s]", "C [m]"), "m")
    assert(m.select("variable").distinct().as[String].collect().toSet === Set("A [m]", "C [m]"))
  }

  test("groupplotStandardized z-scores and drops zero-variance columns") {
    val m = PlotData.groupplotStandardized(df, Seq("k"), Seq("A [m]", "B [s]", "C [m]"))
    // C is constant → dropped entirely
    assert(m.select("variable").distinct().as[String].collect().toSet === Set("A [m]", "B [s]"))
    val a = m.filter($"variable" === "A [m]").orderBy("k").select("y").as[Double].collect()
    assert(math.abs(a(0) + 1.0) < 1e-6 && math.abs(a(1)) < 1e-6 && math.abs(a(2) - 1.0) < 1e-6)
  }

  test("doubleplot assigns resolved top variables to pane 1, rest to pane 2") {
    val m = PlotData.doubleplot(df, Seq("k"), Seq("A [m]", "B [s]", "C [m]"), Seq("B"))
    val p1 = m.filter($"pane" === 1).select("variable").distinct().as[String].collect().toSet
    val p2 = m.filter($"pane" === 2).select("variable").distinct().as[String].collect().toSet
    assert(p1 === Set("B [s]"))
    assert(p2 === Set("A [m]", "C [m]"))
  }
}
