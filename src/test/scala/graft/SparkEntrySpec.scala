package graft

/** Guards the driver contract: every oracle key must have a query (a
  * dangling oracle silently weakens the correctness gate), rows-only
  * queries are a known closed set, and the inventory only grows.
  */
class SparkEntrySpec extends SparkSpec {

  // oracled dynamically once the corresponding query has run in the session
  // (the oracle SQL embeds the fitted tree / trained centroids / kept tube
  // models / eigenvectors as literals) — so depending on what already ran
  // in this JVM, each of these may or may not carry an oracle here
  private val RowsOnlyUntilRun = Set(
    "instants_fit", "instants_predict", "instants_scores", "ann_ivf",
    "ann_indexed", "ann_indexed_append", "ann_pq", "tube_fit", "pca_circle",
    "dedup_semantic", "stream_ivf_assign", "text_classifier", "ann_recall",
    "dedup_text", "ann_probe_auto", "pipe_funnel")

  test("every oracleSql key has a matching queries entry") {
    val dangling = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(dangling.isEmpty, s"oracles without queries: $dangling")
  }

  test("every query without an oracle is a known rows-only query") {
    val rowsOnly = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    val unexpected = rowsOnly -- RowsOnlyUntilRun
    assert(unexpected.isEmpty, s"unexpected rows-only queries: $unexpected")
  }

  test("the graded inventory does not shrink") {
    assert(SparkEntry.queries.size >= 52)
    assert(SparkEntry.oracleSql.size >= 43)
  }

  test("oracle SQL is non-empty and references no Spark-only syntax") {
    SparkEntry.oracleSql.foreach { case (name, sql) =>
      assert(sql.trim.nonEmpty, name)
      assert(!sql.contains("`"), s"$name: backticks are Spark-only quoting")
    }
  }
}
