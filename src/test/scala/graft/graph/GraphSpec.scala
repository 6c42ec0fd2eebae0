package graft.graph

import org.apache.spark.sql.functions._
import graft.SparkSpec

class GraphSpec extends SparkSpec {
  import spark.implicits._

  test("pagerank: 2-cycle is stationary at 1.0; one-way edge drains to the base") {
    val cyc = Seq(("a", "b"), ("b", "a")).toDF("s", "d")
    val rc = Graph.pagerank(cyc, "s", "d", iters = 3)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(rc === Map("a" -> 1.0, "b" -> 1.0))
    val one = Seq(("a", "b")).toDF("s", "d")
    val ro = Graph.pagerank(one, "s", "d", iters = 1)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    // a gets only the base; b gets base + 0.85 of a's full initial rank
    assert(ro("a") === 0.15)
    assert(ro("b") === 1.0)
  }

  test("pagerank: the hub of a star out-ranks its leaves") {
    val leaves = (1 to 10).map(i => (s"leaf$i", "hub"))
    val back = (1 to 10).map(i => ("hub", s"leaf$i"))
    val ranks = Graph.pagerank((leaves ++ back).toDF("s", "d"), "s", "d", iters = 5)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(ranks("hub") > ranks("leaf1") * 3)
  }

  test("pagerank is partitioning-independent (exact integer arithmetic)") {
    val rnd = new scala.util.Random(5)
    val edges = Seq.fill(300)((s"n${rnd.nextInt(40)}", s"n${rnd.nextInt(40)}")).toDF("s", "d")
    val a = Graph.pagerank(edges, "s", "d", 4).collect().toSet
    val b = Graph.pagerank(edges.repartition(7), "s", "d", 4).collect().toSet
    assert(a === b)
  }

  test("pagerank: parallel edges weight the walk") {
    // a sends to b twice and to c once: b receives 2/3 of a's mass
    val edges = Seq(("a", "b"), ("a", "b"), ("a", "c")).toDF("s", "d")
    val r = Graph.pagerank(edges, "s", "d", 1)
      .collect().map(x => x.getString(0) -> x.getDouble(1)).toMap
    assert(r("b") > r("c"))
    // exact: b = 0.15 + 0.85 * 2 * (1e9 div 3)/1e9 ; c = 0.15 + 0.85 * (1e9 div 3)/1e9
    val third = 1000000000L / 3
    assert(r("b") === (150000000L + (85L * (2 * third)) / 100) / 1e9)
    assert(r("c") === (150000000L + (85L * third) / 100) / 1e9)
  }
}
