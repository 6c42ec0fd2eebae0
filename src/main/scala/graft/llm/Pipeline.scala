package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-assembly operators for a training-data pipeline: deterministic
  * stratified sampling and token-budget sequence packing. Both are pure
  * declarative plans (one codegen'd projection; one window partitioned
  * on the shard key) and both are exactly reproducible in ANSI SQL, so
  * they grade against the DuckDB oracle like every other operator.
  */
object Pipeline {

  /** Deterministic stratified downsampling: keep a row iff its md5
    * bucket (of `idCol` and `seed`, out of `denom`) falls below the
    * stratum's fraction. Sampling decisions are a pure function of
    * (id, seed) — independent of partitioning, ordering, and cluster
    * size, so a 100 TB run is reproducible and restartable, unlike
    * `DataFrame.sample`'s partition-seeded RNG. The per-stratum
    * thresholds compile to one `CASE` chain (strata maps are
    * metadata-sized); the scan stays a single codegen'd projection with
    * no shuffle at all.
    *
    * Fractions are quantized to 1/`denom` (default 1e-4) — the md5
    * bucket is uniform on [0, denom), so the kept share of a stratum
    * with n rows concentrates at round(frac*denom)/denom ± O(1/sqrt n).
    */
  def sampleStratified(docs: DataFrame, idCol: String, strataCol: String,
                       fractions: Map[String, Double], default: Double,
                       seed: Long, denom: Int = 10000): DataFrame = {
    require(denom > 0, "sampleStratified: denom must be positive")
    (fractions.values.toSeq :+ default).foreach(f =>
      require(f >= 0.0 && f <= 1.0, s"sampleStratified: fraction $f outside [0,1]"))
    val bucket = Dedup.md5Hash32(concat_ws("|", col(idCol), lit(seed))) % denom
    def thr(f: Double): Column = lit(math.round(f * denom))
    val threshold = fractions.foldLeft(when(lit(false), thr(0.0))) {
      case (c, (k, f)) => c.when(col(strataCol) === k, thr(f))
    }.otherwise(thr(default))
    docs.filter(bucket < threshold)
  }

  /** GPT-style sequence packing: per shard (`shardCol`), documents are
    * concatenated in `idCol` order into one token stream cut into
    * training rows of `budget` tokens; each document is labeled with
    * `bin` (the training row its first token lands in) and `spans`
    * (whether it crosses a cut — consumers that forbid cross-document
    * attention re-split on these). The whole operator is ONE window
    * cumsum partitioned on the shard key — the shard is the packing
    * unit, so parallelism scales with shard count and no global order
    * (or global shuffle) is ever required; a 100 TB corpus packs as
    * thousands of independent shards.
    */
  def packSequences(docs: DataFrame, idCol: String, textCol: String,
                    shardCol: String, budget: Int): DataFrame = {
    require(budget > 0, "packSequences: budget must be positive")
    val w = Window.partitionBy(shardCol).orderBy(idCol)
    val b = lit(budget.toDouble)
    docs
      .withColumn("n_tokens", TextAnalysis.tokenCount(col(textCol)))
      .withColumn("start_tok",
        coalesce(sum(col("n_tokens")).over(w) - col("n_tokens"), lit(0L)))
      .withColumn("bin", floor(col("start_tok") / b))
      .withColumn("spans",
        col("n_tokens") > 0 &&
          floor((col("start_tok") + col("n_tokens") - 1) / b) =!= col("bin"))
      .select(col(idCol), col(shardCol), col("n_tokens"), col("bin"), col("spans"))
  }
}
