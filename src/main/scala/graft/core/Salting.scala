package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-salting for aggregations: when one group key carries a
  * disproportionate share of rows (a viral document, a hot user), a plain
  * `groupBy(key)` routes the whole hot group through one reducer. Salting
  * splits every group into `salts` sub-groups on a deterministic row hash,
  * aggregates partially per (key, salt), then merges the tiny per-salt
  * partials — the hot key's work spreads over `salts` reducers and the
  * second shuffle only carries #distinct-keys × salts rows.
  *
  * (AQE's skew handling covers joins; skewed *aggregations* still need
  * this pattern.)
  */
object Salting {

  /** Two-phase salted aggregation. `partial` defines the per-(key, salt)
    * aggregates; `merge` combines the per-salt partials to the final
    * per-key row. Both run as ordinary hash aggregations with map-side
    * combine.
    */
  def saltedAggregate(df: DataFrame, keyCols: Seq[String], saltExpr: Column, salts: Int,
                      partial: Seq[Column], merge: Seq[Column]): DataFrame =
    df.withColumn("_salt", pmod(saltExpr, lit(salts)))
      .groupBy((keyCols :+ "_salt").map(col): _*)
      .agg(partial.head, partial.tail: _*)
      .groupBy(keyCols.map(col): _*)
      .agg(merge.head, merge.tail: _*)

  /** Salted exact-dedup winners: identical result to
    * [[graft.llm.Dedup.exact]]'s (min id, group count) pairs but with the
    * skew-resistant two-phase plan.
    */
  def saltedDedupExact(df: DataFrame, idCol: String, keyCols: Seq[String],
                       salts: Int = 16): DataFrame =
    saltedAggregate(
      df, keyCols,
      saltExpr = xxhash64(col(idCol)),
      salts = salts,
      partial = Seq(min(col(idCol)).as("_min_id"), count(lit(1)).as("_cnt")),
      merge = Seq(min(col("_min_id")).as(idCol), sum(col("_cnt")).as("dup_count")))
}
