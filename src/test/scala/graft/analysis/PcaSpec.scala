package graft.analysis

import org.apache.spark.sql.functions._
import graft.SparkSpec

class PcaSpec extends SparkSpec {
  import spark.implicits._

  test("jacobiEigen solves a known symmetric system") {
    // [[2,1],[1,2]] has eigenvalues 3 and 1, vectors (1,1)/√2 and (1,-1)/√2
    val (vals, vecs) = Pca.jacobiEigen(Array(Array(2.0, 1.0), Array(1.0, 2.0)))
    assert(math.abs(vals(0) - 3.0) < 1e-9 && math.abs(vals(1) - 1.0) < 1e-9)
    val inv = 1.0 / math.sqrt(2.0)
    assert(vecs(0).zip(Array(inv, inv)).forall { case (a, b) => math.abs(a - b) < 1e-9 })
  }

  test("eigen-system reconstructs the correlation matrix") {
    val rng = new scala.util.Random(3)
    val base = Seq.fill(300)(rng.nextGaussian())
    val rows = base.zipWithIndex.map { case (x, i) =>
      (x, 0.8 * x + 0.2 * rng.nextGaussian(), rng.nextGaussian(), i.toDouble % 7)
    }
    val df = rows.toDF("a", "b", "c", "d")
    val cols = Seq("a", "b", "c", "d")
    val m = Pca.corrMatrix(df, cols)
    val (vals, vecs) = Pca.jacobiEigen(m)
    // Σ_k λ_k v_k v_kᵀ == C, eigenvalue sum == trace == p
    assert(math.abs(vals.sum - 4.0) < 1e-6)
    for (i <- 0 until 4; j <- 0 until 4) {
      val rec = vals.indices.map(k => vals(k) * vecs(k)(i) * vecs(k)(j)).sum
      assert(math.abs(rec - m(i)(j)) < 1e-6, s"($i,$j)")
    }
    // correlated pair dominates PC1
    assert(vals(0) > 1.5)
  }

  test("circle emits one loading row per (component, variable), |x| ≤ ~1") {
    val df = Seq.tabulate(100)(i =>
      (i.toDouble, i * 2.0 + (i % 3), 100.0 - i, (i % 5).toDouble))
      .toDF("a", "b", "c", "d")
    val out = Pca.circle(df, Seq("a", "b", "c", "d"), spark).collect()
    assert(out.length === 16)
    assert(out.forall(r => math.abs(r.getAs[Double]("x")) <= 1.02))
    val evrs = out.filter(_.getAs[Long]("component") == 1L).map(_.getAs[Double]("evr"))
    assert(evrs.forall(v => v >= 0 && v <= 1))
  }
}
