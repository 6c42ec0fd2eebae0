package graft.llm

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-level timing probe for the dedup hot paths (not a test; run with
  * `Test/runMain graft.llm.DedupProbeMain <sfdir>`).
  */
object DedupProbeMain {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .appName("dedup-probe")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    val docs = spark.read.parquet(s"$dir/documents.parquet")
    println(s"[probe] docs=${docs.count()}")

    // minhash stages
    val base = docs.select(col("doc_id"),
      Dedup.distinctNgramHashes(col("text"), 5).as("sh")).cache()
    t("shingle base (cache)") { base.count() }
    t("avg shingles/doc") { println("  avg=" + base.select(avg(size(col("sh")))).head().getDouble(0)) }
    val sigs = Dedup.minhashSignature(base, "sh", 8).drop("sh")
    t("signatures") { sigs.count() }
    val pairs = Dedup.lshCandidatePairs(sigs, "doc_id", 8, 4)
    t("candidate pairs") { println("  n=" + pairs.count()) }
    val full = Dedup.minhashLsh(docs, "doc_id", "text", 5, 8, 4, 0.6, graft.core.CacheScope.session)
    t("full minhashLsh") { println("  n=" + full.count()) }
    spark.catalog.clearCache()
    t("full minhashLsh (cold)") {
      println("  n=" + Dedup.minhashLsh(docs, "doc_id", "text", 5, 8, 4, 0.6, graft.core.CacheScope.session).count())
    }

    // jaccard stages
    spark.catalog.clearCache()
    val gh = docs.select(col("doc_id"), Dedup.wordNgramHashes(col("text"), 3).as("gh")).cache()
    t("word-gram base (cache)") { gh.count() }
    t("full ngramJaccard (cold)") {
      spark.catalog.clearCache()
      println("  n=" + Dedup.ngramJaccard(docs, "doc_id", "text", 3, 8, 0.5, 2, 128).count())
    }
    spark.stop()
  }
}
