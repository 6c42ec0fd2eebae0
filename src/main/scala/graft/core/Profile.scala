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
  * Two plans, one output shape:
  *
  *   - [[profile]] — EXACT distinct counts via one two-level aggregation
  *     PER COLUMN, unioned. Each branch scans only its own column
  *     (parquet column pruning: total I/O across all branches = one full
  *     scan of the table) and its first-level `groupBy(value)` is
  *     map-side combined, so the exchange carries per-partition DISTINCT
  *     values, never raw rows. This deliberately avoids the single
  *     multi-`count(DISTINCT)` aggregation: Catalyst plans that as one
  *     Expand that replicates every corpus row once per profiled column
  *     (11× shuffle input on lineitem) and drags the min/max/null
  *     aggregates through the replicated stream — measured 83× a
  *     columnar engine at sf0.1, where the per-column union is a set of
  *     narrow independent stages. Profile the STORED table (a file-backed
  *     or cached DataFrame): the branches share the scan's columns, not
  *     an upstream computation — an expensive uncached upstream would
  *     re-execute per branch.
  *   - [[profileApprox]] — the same union-of-branches shape but with
  *     per-column HLL register sketches (the exact
  *     [[graft.analysis.Sketches]] register + estimator contract, p=9)
  *     in place of the per-value table: each branch's exchange is ≤
  *     2^p + 1 rows per partition REGARDLESS of column cardinality. At
  *     100 TB × hundreds of columns this is the profile you run:
  *     register-sized shuffles, distinct counts within ±~4.6%, exact
  *     everything else.
  */
object Profile {

  private def numView(dt: DataType, c: Column): Option[Column] = dt match {
    case _: NumericType => Some(c.cast("double"))
    case TimestampType => Some(unix_micros(c).cast("double"))
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
        convert_timezone(lit("UTC"), current_timezone(), c).cast("timestamp"))
        .cast("double"))
    case DateType => Some(datediff(c, lit("1970-01-01")).cast("double"))
    case _ => None
  }

  /** Per-column profile of `df`: `(column, n_rows, n_null, n_distinct,
    * min_num, max_num, min_len, max_len)`, one row per profiled column
    * in name order. Numeric/timestamp columns fill `min_num`/`max_num`
    * (rounded to 6); string columns fill `min_len`/`max_len`; other
    * types profile null/distinct only. Distinct counts are EXACT — the
    * profile is the correctness artifact this operator exists to
    * produce; [[profileApprox]] is the sketch twin for when a ±5% count
    * on a 400-column table is the better trade.
    */
  def profile(df: DataFrame): DataFrame = {
    val cols = df.schema.fields.sortBy(_.name)
    val branches = cols.map { f =>
      val isStr = f.dataType == StringType
      // level 1: the column's per-value count table — one pruned scan,
      // map-side combined, so the exchange is bounded by per-partition
      // distinct values
      val pv = df.select(col(f.name).as("_v"))
        .groupBy(col("_v")).agg(count(lit(1)).as("_c"))
      val nv = numView(f.dataType, col("_v"))
      def nullD = lit(null).cast("double")
      def nullL = lit(null).cast("long")
      // level 2: collapse the per-value table (metadata-sized) to the
      // single profile row; min/max distribute over the value groups
      pv.agg(
        coalesce(sum(col("_c")), lit(0L)).cast("long").as("n_rows"),
        coalesce(sum(when(col("_v").isNull, col("_c"))), lit(0L))
          .cast("long").as("n_null"),
        count(when(col("_v").isNotNull, 1)).cast("long").as("n_distinct"),
        nv.fold(nullD)(v => round(min(v), 6)).as("min_num"),
        nv.fold(nullD)(v => round(max(v), 6)).as("max_num"),
        (if (isStr) min(length(col("_v"))).cast("long") else nullL).as("min_len"),
        (if (isStr) max(length(col("_v"))).cast("long") else nullL).as("max_len"))
        .select(lit(f.name).as("column"), col("n_rows"), col("n_null"),
          col("n_distinct"), col("min_num"), col("max_num"),
          col("min_len"), col("max_len"))
    }
    branches.reduce(_ unionByName _)
  }

  /** PINNED canonical hash string of a value for [[profileApprox]]'s
    * distinct sketch — the contract an independent engine replays:
    * strings hash as themselves, numerics as their 1e-6 tick count
    * (`floor(v·1e6 + 0.5)` as a long — distinctness is measured at
    * 1e-6 resolution, which also sidesteps engine float formatting),
    * timestamps as epoch-micros strings, dates as epoch-day strings.
    * Unsupported types return None (profiled as null/bounds-only).
    */
  private def canonStr(dt: DataType, c: Column): Option[Column] = dt match {
    case StringType => Some(c)
    case _: NumericType =>
      Some(floor(c.cast("double") * 1e6 + 0.5).cast("long").cast("string"))
    case TimestampType => Some(unix_micros(c).cast("string"))
    case TimestampNTZType =>
      Some(unix_micros(
        convert_timezone(lit("UTC"), current_timezone(), c).cast("timestamp"))
        .cast("string"))
    case DateType => Some(datediff(c, lit("1970-01-01")).cast("long").cast("string"))
    case _ => None
  }

  /** The sketch-distinct wide-table profile: same shape as [[profile]]
    * but `n_distinct` is replaced by `distinct_est` (double, the
    * [[graft.analysis.Sketches]] HLL estimate at precision `p`,
    * quantized to 1e-6; null for unsupported types — and distinctness
    * of numerics is at 1e-6 tick resolution per [[canonStr]]).
    *
    * Plan: one branch per column, unioned — each branch scans only its
    * own column (pruned: total I/O = one full table scan) and its first
    * aggregation collapses to ≤ 2^p + 1 register rows per partition IN
    * THE SCAN STAGE (map-side combine), so the exchange is
    * register-sized REGARDLESS of table size; the second aggregation
    * folds registers to the estimator. Unlike [[profile]], a
    * high-cardinality column costs the same bounded exchange as a
    * low-cardinality one — this is the wide-table/100 TB default. The
    * per-branch hash is aliased once in its own projection (inlining it
    * into downstream uses would evaluate the md5 three times per row —
    * measured 23× slower; CollapseProject never duplicates a non-cheap
    * alias referenced more than once).
    */
  def profileApprox(df: DataFrame, p: Int = 9): DataFrame = {
    require(p >= 4 && p <= 16, s"profileApprox: p must be in [4,16], got $p")
    val cols = df.schema.fields.sortBy(_.name)
    val remBits = 32 - p
    val maxRho = remBits + 1
    val mask = (1L << remBits) - 1
    val mm = 1 << p
    val emptyTerm = 1L << maxRho
    val branches = cols.map { f =>
      val c = col(f.name)
      val supported = canonStr(f.dataType, c).isDefined
      val isStr = f.dataType == StringType
      // projection 1: the md5-derived hash aliased ONCE, plus the raw views
      val hashed = df.select(
        canonStr(f.dataType, c).map(graft.llm.Dedup.md5Hash32)
          .getOrElse(lit(null).cast("long")).as("_h"),
        c.isNull.as("_nul"),
        numView(f.dataType, c).getOrElse(lit(null).cast("double")).as("_v"),
        (if (isStr) length(c).cast("long") else lit(null).cast("long")).as("_l"))
      // register table: ≤ 2^p + 1 rows after the in-stage combine
      val reg = hashed
        .select(shiftright(col("_h"), remBits).as("_bucket"),
          when(col("_h").bitwiseAND(lit(mask)) === 0, lit(maxRho))
            .otherwise(lit(maxRho) - length(bin(col("_h").bitwiseAND(lit(mask)))))
            .as("_rho"),
          col("_nul"), col("_v"), col("_l"))
        .groupBy(col("_bucket"), col("_nul"))
        .agg(count(lit(1)).as("_c"), max(col("_rho")).as("mj"),
          min(col("_v")).as("_mn"), max(col("_v")).as("_mx"),
          min(col("_l")).as("_mnl"), max(col("_l")).as("_mxl"))
      val one = reg.agg(
        coalesce(sum(col("_c")), lit(0L)).cast("long").as("n_rows"),
        coalesce(sum(when(col("_nul"), col("_c"))), lit(0L)).cast("long").as("n_null"),
        count(when(col("_bucket").isNotNull, 1)).as("_nb"),
        coalesce(sum(when(col("_bucket").isNotNull,
          expr(s"shiftleft(CAST(1 AS BIGINT), $maxRho - mj)"))), lit(0L)).as("_sobs"),
        round(min(col("_mn")), 6).as("min_num"), round(max(col("_mx")), 6).as("max_num"),
        min(col("_mnl")).as("min_len"), max(col("_mxl")).as("max_len"))
      val sFixed = col("_sobs") + (lit(mm.toLong) - col("_nb")) * emptyTerm
      val zeros = lit(mm.toLong) - col("_nb")
      val raw = lit(graft.analysis.Sketches.alphaNumerator(p)) / sFixed.cast("double")
      val est = when(zeros > 0 && raw <= lit(2.5 * mm),
        lit(mm.toDouble) * log(lit(mm.toDouble) / zeros.cast("double")))
        .otherwise(raw)
      one.select(
        lit(f.name).as("column"), col("n_rows"), col("n_null"),
        (if (supported) floor(est * 1e6 + 0.5) / 1e6
         else lit(null).cast("double")).as("distinct_est"),
        col("min_num"), col("max_num"), col("min_len"), col("max_len"))
    }
    branches.reduce(_ unionByName _)
  }
}
