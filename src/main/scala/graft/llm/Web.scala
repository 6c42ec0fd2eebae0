package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Web-provenance operators for corpus assembly: URL canonicalization
  * and per-domain document caps — the RefinedWeb recipe (Penedo et al.
  * 2023) applies exactly this pair before text-level dedup, because at
  * web scale the cheapest duplicates are the ones the URL already
  * names, and unbounded single-domain mass (forums, mirrors, link
  * farms) skews every downstream statistic.
  *
  * Every construct here is a regex both Java (Spark codegen) and RE2
  * (DuckDB oracle) read identically — no lookarounds, no
  * replacement-group syntax (Java `$1` vs RE2 `\1` differ, so patterns
  * are written to never need groups in replacements).
  */
object Web {

  /** Canonical URL: query string and fragment dropped, scheme+host
    * lowercased (path case is PRESERVED — paths are case-sensitive),
    * `www.` host prefix stripped, trailing slash stripped. A pure
    * codegen'd regex projection — zero shuffle at any corpus size.
    *
    * A string with no `//` authority passes through un-lowered (the
    * scheme+host extract matches nothing and concatenates the empty
    * string) — malformed rows degrade, never throw.
    */
  def urlNormalize(url: Column): Column = {
    val u1 = regexp_replace(url, "[?#].*$", "")
    val schemeHost = "^[^/]*//[^/]*"
    val u2 = concat(lower(regexp_extract(u1, schemeHost, 0)),
      regexp_replace(u1, schemeHost, ""))
    val u3 = regexp_replace(u2, "://www\\.", "://")
    regexp_replace(u3, "/$", "")
  }

  /** The host part of a [[urlNormalize]]d URL (empty when malformed). */
  def urlDomain(urlNorm: Column): Column =
    regexp_extract(urlNorm, "://([^/]*)", 1)

  /** Keep at most `k` documents per domain, winners = the k smallest
    * `(md5(id, seed), id)` — a deterministic pseudorandom sample that is
    * reproducible and partition-independent like every sampler here
    * (smallest-id winners would bias toward old documents).
    *
    * Scale shape: ONE shuffle partitioned on the domain, ranking inside
    * each domain only; parallelism = domain count, which at web scale is
    * millions. The skew bound is the largest single domain (it ranks in
    * one partition): real pipelines cap the handful of mega-domains
    * upstream — [[graft.core.Salting.dropOverCap]] is the loud guard if
    * a degenerate key (empty domain for every malformed row) appears.
    */
  def capPerDomain(docs: DataFrame, idCol: String, domainCol: String,
                   k: Int, seed: Long): DataFrame = {
    require(k > 0, "capPerDomain: k must be positive")
    // two-phase top-k (graft.core.TopK): a corpus dominated by FEW
    // domains — exactly the situation the cap exists for — would funnel
    // through that many window tasks in the single-window form; the
    // per-(domain, partition) pre-rank keeps parallelism at
    // domains × partitions with the identical winner set
    graft.core.TopK.perKey(
        docs.withColumn("_h", Dedup.md5Hash32(concat_ws("|", col(idCol), lit(seed)))),
        Seq(domainCol), Seq(col("_h"), col(idCol)), k, "_rn")
      .drop("_h", "_rn")
  }
}
