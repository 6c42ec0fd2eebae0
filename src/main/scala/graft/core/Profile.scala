package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Schema-dynamic table profiling — the pipeline sanity scan run before
  * committing a 100 TB ingest: one row per column with null/distinct
  * counts and type-appropriate bounds. The numeric surface is doubles
  * rounded to 6 (timestamps as epoch micros — exact in a double through
  * year ~2255), string bounds are LENGTHS, not values, so the output
  * never depends on engine-specific float/collation formatting.
  *
  * Plan shape: ONE aggregation pass builds every column's stats
  * simultaneously (a single scan, map-side combined), then a `stack`
  * projection unpivots the 1-row result — the unpivot costs nothing, it
  * runs on one row. The exact multi-column `count(DISTINCT)` plans as a
  * single Expand (one data pass, N× shuffle rows for N profiled
  * columns): right up to very wide tables, where the sketch path —
  * [[graft.analysis.Sketches.hll]] per column, register-sized shuffle —
  * is the drop-in replacement; exact counts are kept here because the
  * profile IS the correctness artifact this operator exists to produce.
  */
object Profile {

  /** Per-column profile of `df`: `(column, n_rows, n_null, n_distinct,
    * min_num, max_num, min_len, max_len)`, one row per profiled column
    * in name order. Numeric/timestamp columns fill `min_num`/`max_num`
    * (rounded to 6); string columns fill `min_len`/`max_len`; other
    * types profile null/distinct only.
    */
  def profile(df: DataFrame): DataFrame = {
    val cols = df.schema.fields.sortBy(_.name)
    def numView(f: StructField): Option[Column] = f.dataType match {
      case _: NumericType => Some(col(f.name).cast("double"))
      case TimestampType => Some(unix_micros(col(f.name)).cast("double"))
      case TimestampNTZType =>
        // Convention: a naive timestamp profiles as its NAIVE-AS-UTC epoch
        // micros, independent of spark.sql.session.timeZone (a bare
        // cast-to-timestamp would interpret the naive value in the session
        // zone and drift from any UTC-based oracle). Shifting the naive
        // value INTO the session zone first makes the NTZ→LTZ cast's
        // session-zone interpretation land back on the UTC instant the
        // naive value denotes. (Caveat: wall times inside a DST fall-back
        // overlap of the session zone resolve to the earlier offset —
        // pin the session to a fixed-offset zone for bound exactness.)
        Some(unix_micros(
          convert_timezone(lit("UTC"), current_timezone(), col(f.name)).cast("timestamp"))
          .cast("double"))
      case DateType => Some(datediff(col(f.name), lit("1970-01-01")).cast("double"))
      case _ => None
    }
    val aggs: Seq[Column] = count(lit(1)).as("_n") +: cols.flatMap { f =>
      val c = col(f.name)
      val base = Seq(
        count(when(c.isNull, 1)).as(s"_null_${f.name}"),
        countDistinct(c).as(s"_dist_${f.name}"))
      val num = numView(f).toSeq.flatMap(v => Seq(
        round(min(v), 6).as(s"_min_${f.name}"),
        round(max(v), 6).as(s"_max_${f.name}")))
      val str = f.dataType match {
        case StringType => Seq(
          min(length(c)).cast("long").as(s"_minl_${f.name}"),
          max(length(c)).cast("long").as(s"_maxl_${f.name}"))
        case _ => Nil
      }
      base ++ num ++ str
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val rows = cols.map { f =>
      def opt(prefix: String, there: Boolean, tpe: String): Column =
        if (there) col(s"_$prefix${f.name}") else lit(null).cast(tpe)
      val isNum = numView(f).isDefined
      val isStr = f.dataType == StringType
      struct(
        lit(f.name).as("column"),
        col("_n").as("n_rows"),
        col(s"_null_${f.name}").as("n_null"),
        col(s"_dist_${f.name}").as("n_distinct"),
        opt("min_", isNum, "double").as("min_num"),
        opt("max_", isNum, "double").as("max_num"),
        opt("minl_", isStr, "long").as("min_len"),
        opt("maxl_", isStr, "long").as("max_len"))
    }
    one.select(explode(array(rows: _*)).as("_r")).select(col("_r.*"))
  }
}
