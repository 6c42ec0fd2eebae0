package graft.instants

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.core.Opset

/** Record splitting at per-record instants — the reference's `left` /
  * `right` / `between` (tabata instants.py:583, 607, 631), which build new
  * Opsets by truncating every record at a detected instant.
  *
  * The reference iterates records and slices `df.iloc[:i]` / `df.iloc[i:]`
  * / `df.iloc[i:j]`; here the instant table (`record`, 0-based index
  * columns) is tiny relative to the signal data, so each split is ONE
  * broadcast hash join + a filter — no shuffle of the signal side at all,
  * which is the property that matters at 100 TB.
  *
  * Convention: instants are 0-based sample indices (like the reference's
  * `iloc` positions) against the Opset's 1-based `t`:
  *   - left(i):       positions [0, i)   ⇔ t <= i
  *   - right(i):      positions [i, n)   ⇔ t >  i
  *   - between(i, j): positions [i, j)   ⇔ t >  i AND t <= j
  */
object Splits {

  private def joined(os: Opset, instants: DataFrame): DataFrame =
    os.df.join(broadcast(instants), Seq(os.recordCol))

  /** Rows strictly before the instant (reference `left`, instants.py:583). */
  def left(os: Opset, instants: DataFrame, iCol: String = "i"): Opset =
    os.copy(df = joined(os, instants).filter(col(os.tCol) <= col(iCol)).drop(iCol))

  /** Rows at/after the instant (reference `right`, instants.py:607). */
  def right(os: Opset, instants: DataFrame, iCol: String = "i"): Opset =
    os.copy(df = joined(os, instants).filter(col(os.tCol) > col(iCol)).drop(iCol))

  /** Rows in [i, j) positions (reference `between`, instants.py:631). */
  def between(os: Opset, instants: DataFrame, lCol: String = "i", rCol: String = "j"): Opset =
    os.copy(df = joined(os, instants)
      .filter(col(os.tCol) > col(lCol) && col(os.tCol) <= col(rCol))
      .drop(lCol, rCol))

  /** A simple deterministic instant: the 0-based position of each record's
    * maximum of `x` (first occurrence). Used by the split queries as the
    * stand-in for a learned detector's `computed` table.
    */
  def argmaxInstants(os: Opset, x: String): DataFrame = {
    val w = Window.partitionBy(os.recordCol).orderBy(col(x).desc, col(os.tCol))
    os.df.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1)
      .select(col(os.recordCol), (col(os.tCol) - 1).cast("long").as("i"))
  }
}
