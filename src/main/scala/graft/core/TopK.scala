package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact top-k per key without task funneling — the generalized form of
  * the BM25 ranking stage, extracted because every "best k per group"
  * need hits the same trap: a plain `row_number()` window partitions by
  * the key alone, so a SMALL key count concentrates the ENTIRE data set
  * into that many window tasks (3 queries → 3 tasks sorting a corpus).
  */
object TopK {

  /** Top `k` rows per `keyCols` group under `ordering` (which must be a
    * TOTAL order — append a unique tiebreak column — for the result to
    * be deterministic). Adds `outRank` (1-based long).
    *
    * Phase 1 ranks within (key, physical partition) and keeps ≤ k
    * survivors per cell — parallelism keys × partitions; phase 2 ranks
    * the ≤ k×P survivors per key. Phase 1 is a strict SUPERSET filter
    * of the answer (a global top-k row is top-k within its own
    * partition), so the final result equals the single-window form
    * row-for-row while the full data never funnels through few tasks.
    */
  def perKey(df: DataFrame, keyCols: Seq[String], ordering: Seq[Column], k: Int,
             outRank: String = "rank"): DataFrame = {
    require(keyCols.nonEmpty, "TopK.perKey: at least one key column")
    require(k >= 1, "TopK.perKey: k must be >= 1")
    Salting.requireFreeColumns(df, Seq("_p", "_rn", outRank), "TopK.perKey")
    val pre = df.withColumn("_p", spark_partition_id())
      .withColumn("_rn", row_number().over(
        Window.partitionBy((keyCols :+ "_p").map(col): _*).orderBy(ordering: _*)))
      .filter(col("_rn") <= k).drop("_p", "_rn")
    pre.withColumn(outRank, row_number().over(
        Window.partitionBy(keyCols.map(col): _*).orderBy(ordering: _*)).cast("long"))
      .filter(col(outRank) <= k)
  }
}
