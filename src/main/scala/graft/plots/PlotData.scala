package graft.plots

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.core.ColumnMeta

/** Data preparation behind the reference's plotting layer (tabata
  * plots.py). The reference renders with plotly/matplotlib; a Spark engine's
  * job is to produce the *plottable DataFrames* — the series a front-end
  * would draw — as distributed transforms. Rendering chrome (widgets,
  * colors, figure layout) is intentionally out of scope.
  *
  * All transforms are melt/projection/window shaped: column-pruned scans,
  * no UDFs, at most one shuffle.
  */
object PlotData {

  /** Long-format melt of `valueCols` into (keys..., variable, name, unit,
    * y). The backbone of selplot/tsplot/byunitplot (plots.py:99, 450, 190).
    */
  def melt(df: DataFrame, keyCols: Seq[String], valueCols: Seq[String]): DataFrame = {
    val entries = valueCols.flatMap { c =>
      val (n, u) = ColumnMeta.nameunit(c)
      Seq(lit(c), struct(lit(n).as("name"), lit(u).as("unit"), col(c).cast("double").as("y")))
    }
    df.select(keyCols.map(col) :+ explode(map(entries: _*)).as(Seq("variable", "_s")): _*)
      .select(keyCols.map(col) ++ Seq(
        col("variable"), col("_s.name").as("name"), col("_s.unit").as("unit"), col("_s.y").as("y")): _*)
  }

  /** selplot (plots.py:99): resolve a (possibly partial) variable name via
    * `get_colname` and emit that one series per record.
    */
  def selplot(df: DataFrame, keyCols: Seq[String], valueCols: Seq[String],
              variable: Option[String]): DataFrame = {
    val resolved = ColumnMeta.getColname(valueCols, variable)
      .getOrElse(sys.error(s"no column resolves '$variable'"))
    melt(df, keyCols, Seq(resolved))
  }

  /** byunitplot (plots.py:190): series of every column sharing `unit`. */
  def byunitplot(df: DataFrame, keyCols: Seq[String], valueCols: Seq[String],
                 unit: String): DataFrame = {
    val cols = ColumnMeta.byunits(valueCols).collectFirst { case (`unit`, cs) => cs }
      .getOrElse(Seq.empty)
    melt(df, keyCols, cols)
  }

  /** groupplot with standardize=True (plots.py:276): per-column z-score
    * (sample stddev, like pandas `.std()`), columns with zero variance
    * dropped — computed with distributed aggregates, then melted. The drop
    * is distributed too: a zero-variance (or all-null) column z-scores to
    * null, and null-`y` rows are filtered after the melt, so no
    * driver-side stats collection is needed.
    */
  def groupplotStandardized(df: DataFrame, keyCols: Seq[String],
                            valueCols: Seq[String]): DataFrame = {
    val stats = df.select(valueCols.flatMap(c =>
      Seq(avg(col(c)).as(s"_m_$c"), stddev_samp(col(c)).as(s"_s_$c"))): _*)
    // fanOut the MELT side only: the z-score + melt explode is the
    // per-row work; `stats` stays on the original partitioning so its
    // float summation order is unchanged
    val z = graft.core.Fanout.fanOut(df).crossJoin(broadcast(stats))
    val zcols = valueCols.map { c =>
      when(col(s"_s_$c") =!= 0.0, (col(c) - col(s"_m_$c")) / col(s"_s_$c")).as(c)
    }
    val keep = z.select(keyCols.map(col) ++ zcols: _*)
    melt(keep, keyCols, valueCols)
      .filter(col("y").isNotNull)
      .withColumn("y", round(col("y"), 6))
  }

  /** doubleplot (plots.py:335): two linked panes — pane 1 for the resolved
    * `topVars` columns, pane 2 for the rest.
    */
  def doubleplot(df: DataFrame, keyCols: Seq[String], valueCols: Seq[String],
                 topVars: Seq[String]): DataFrame = {
    val top = topVars.flatMap(v => ColumnMeta.getColname(valueCols, Some(v), None)).distinct
    val bottom = valueCols.filterNot(top.contains)
    melt(df, keyCols, top).withColumn("pane", lit(1))
      .unionByName(melt(df, keyCols, bottom).withColumn("pane", lit(2)))
  }

  /** The signal trace behind `Opset.plot`/`make_figure` (opset.py:264):
    * one record's series plus a boolean phase overlay (`phase` column of
    * the reference — here any boolean expression over the row).
    */
  def signalTrace(df: DataFrame, keyCols: Seq[String], y: String,
                  phase: Column): DataFrame =
    df.select(keyCols.map(col) ++ Seq(
      col(y).cast("double").as("y"),
      phase.cast("boolean").as("phase")): _*)
}
