package graft.instants

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.dsp.SignalOps

/** The indicator feature bank behind the reference's instant detection
  * (tabata instants.py:211 `make_indicators`): positional features
  * LEN/REV/PERCENT, the raw signals, and a grid of hump-counting
  * indicators at several (half-width, derivative order, ±sigma) settings,
  * each scaled by a per-(width, order) noise level epsilon.
  *
  * Everything is window algebra over `(record, t)` — the whole bank is one
  * shuffle on `record` regardless of grid size, and epsilon is a two-pass
  * SG aggregation, never a per-record driver loop.
  */
object Indicators {

  /** One indicator configuration of the grid. `halfWidth < 0` encodes the
    * reference's reversed variant `c[-1] − c` (instants.py:342-347);
    * `sigma` is the signed multiplier `e*s` applied to epsilon.
    */
  final case class IndicatorCode(col: String, halfWidth: Int, order: Int, sigma: Double) {
    def name: String = {
      val dir = if (sigma >= 0) "u" else "d"
      val rev = if (halfWidth < 0) "-" else "+"
      // no '.' in the label: Spark column resolution and spark.ml attribute
      // names treat dots as nested-field separators
      val s = math.abs(sigma)
      val sStr = if (s == s.floor) s.toInt.toString else s.toString.replace('.', 'p')
      s"$col[${rev}w${math.abs(halfWidth)}o$order$dir$sStr]"
    }
  }

  /** Positional features (instants.py:306-307): LEN = 0-based index,
    * REV = reversed index, PERCENT = LEN/(n−1).
    */
  def withPositional(df: DataFrame, rec: String, t: String): DataFrame = {
    val wRec = Window.partitionBy(rec)
    val n = count(lit(1)).over(wRec)
    df.withColumn("LEN", (col(t) - 1).cast("double"))
      .withColumn("REV", (n - col(t)).cast("double"))
      .withColumn("PERCENT",
        when(n > 1, col("LEN") / (n - 1).cast("double")).otherwise(lit(0.0)))
  }

  /** The reference's epsilon (instants.py:276-295): for window `w = 2l+1`
    * and derivative order `d`, the max over records of the population
    * stddev of `SG_w(x, d) − SG_{2w+1}(SG_w(x, d), d)` — a per-scale noise
    * floor for the crossing thresholds. One distributed aggregation.
    */
  def epsilon(df: DataFrame, rec: String, t: String, x: String,
              w: Int, d: Int, deg: Int): Double = {
    val b = SignalOps.sgDf(df, x, rec, t, w, deg, d, "_eb")
    val c = SignalOps.sgDf(b, "_eb", rec, t, 2 * w + 1, deg, d, "_ec")
    c.withColumn("_er", col("_eb") - col("_ec"))
      .groupBy(col(rec)).agg(stddev_pop(col("_er")).as("_es"))
      .agg(max(col("_es"))).head().getDouble(0)
  }

  /** Add the indicator column for one code; `eps` is its noise floor.
    * Reversed codes subtract from the record's last value (instants.py:343).
    */
  def withIndicator(df: DataFrame, rec: String, t: String,
                    code: IndicatorCode, eps: Double, deg: Int): DataFrame = {
    val l = math.abs(code.halfWidth)
    val w = 2 * l + 1
    val sg = SignalOps.sgDf(df, code.col, rec, t, w, deg, code.order, "_isg")
    // direction comes from the sign of the configured sigma, NOT of
    // sigma*eps: for a perfectly-smooth signal eps == 0 and the product
    // would silently flip an upward indicator to downward crossings
    val ind = SignalOps.indicatorDf(sg, "_isg", rec, t,
        lit(code.sigma * eps), positive = code.sigma > 0, code.name)
      .drop("_isg")
    if (code.halfWidth >= 0) ind
    else {
      val wFull = Window.partitionBy(rec).orderBy(t)
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      ind.withColumn(code.name, last(col(code.name)).over(wFull) - col(code.name))
    }
  }

  /** The full bank for a grid of codes over one signal column. Returns the
    * augmented DataFrame and the effective (code, epsilon) list.
    */
  def bank(df: DataFrame, rec: String, t: String, codes: Seq[IndicatorCode],
           deg: Int): (DataFrame, Seq[(IndicatorCode, Double)]) = {
    val epsCache = scala.collection.mutable.Map.empty[(String, Int, Int), Double]
    val withEps = codes.map { cd =>
      val w = 2 * math.abs(cd.halfWidth) + 1
      val e = epsCache.getOrElseUpdate((cd.col, w, cd.order),
        epsilon(df, rec, t, cd.col, w, cd.order, deg))
      (cd, e)
    }
    val out = withEps.foldLeft(withPositional(df, rec, t)) { case (d, (cd, e)) =>
      withIndicator(d, rec, t, cd, e, deg)
    }
    (out, withEps)
  }
}
