package graft

/** Guards the driver contract: every oracle key must have a query (a
  * dangling oracle silently weakens the correctness gate), rows-only
  * queries are a known closed set, and the inventory only grows.
  */
class SparkEntrySpec extends SparkSpec {

  private val RowsOnlyAlways = Set("tube_fit", "pca_circle")
  // oracled dynamically once the corresponding query has run in the session
  // (the oracle SQL embeds the fitted tree / trained centroids as literals)
  private val RowsOnlyUntilRun = Set(
    "instants_fit", "instants_predict", "instants_scores", "ann_ivf")

  test("every oracleSql key has a matching queries entry") {
    val dangling = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(dangling.isEmpty, s"oracles without queries: $dangling")
  }

  test("every query without an oracle is a known rows-only query") {
    val rowsOnly = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    val unexpected = rowsOnly -- RowsOnlyAlways -- RowsOnlyUntilRun
    assert(unexpected.isEmpty, s"unexpected rows-only queries: $unexpected")
    assert(RowsOnlyAlways.subsetOf(rowsOnly),
      s"always-rows-only queries unexpectedly gained oracles: ${RowsOnlyAlways -- rowsOnly}")
  }

  test("the graded inventory does not shrink") {
    assert(SparkEntry.queries.size >= 47)
    assert(SparkEntry.oracleSql.size >= 41)
  }

  test("oracle SQL is non-empty and references no Spark-only syntax") {
    SparkEntry.oracleSql.foreach { case (name, sql) =>
      assert(sql.trim.nonEmpty, name)
      assert(!sql.contains("`"), s"$name: backticks are Spark-only quoting")
    }
  }
}
