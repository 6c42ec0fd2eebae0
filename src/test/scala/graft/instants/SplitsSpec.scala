package graft.instants

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.core.Opset

/** left/right/between split semantics (tabata instants.py:583-654):
  * 0-based instant i against 1-based t — left = positions [0,i),
  * right = [i,n), between = [i,j).
  */
class SplitsSpec extends SparkSpec {
  import spark.implicits._

  private def os = Opset(
    (1 to 10).map(i => ("r", i.toLong, i.toDouble)).toDF("record", "t", "value"))

  private def instants(i: Long) = Seq(("r", i)).toDF("record", "i")

  test("left keeps positions strictly before the instant") {
    val l = Splits.left(os, instants(4)).df.select("t").as[Long].collect().sorted
    assert(l.toSeq === (1L to 4L)) // positions 0..3 = t 1..4
  }

  test("right keeps positions at/after the instant") {
    val r = Splits.right(os, instants(4)).df.select("t").as[Long].collect().sorted
    assert(r.toSeq === (5L to 10L))
  }

  test("left + right partition the record exactly") {
    val n = Splits.left(os, instants(7)).df.count() + Splits.right(os, instants(7)).df.count()
    assert(n === 10)
  }

  test("between keeps [i, j) positions") {
    val lr = Seq(("r", 2L, 5L)).toDF("record", "i", "j")
    val b = Splits.between(os, lr).df.select("t").as[Long].collect().sorted
    assert(b.toSeq === Seq(3L, 4L, 5L)) // positions 2,3,4
  }

  test("argmaxInstants finds the 0-based position of the first max") {
    val twoPeaks = Opset(Seq(
      ("p", 1L, 0.0), ("p", 2L, 9.0), ("p", 3L, 9.0), ("p", 4L, 1.0),
    ).toDF("record", "t", "value"))
    val i = Splits.argmaxInstants(twoPeaks, "value").select("i").as[Long].head()
    assert(i === 1L) // first occurrence, 0-based
  }
}
