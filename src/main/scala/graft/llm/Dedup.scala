package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Deduplication operators for training-data pipelines.
  *
  * Scale design (100 TB): every variant here is *bucketed* — the only
  * pairwise work ever done is within a hash bucket (band bucket for
  * MinHash, hamming-block bucket for SimHash, shared-shingle block for
  * Jaccard). There is no all-pairs join, no driver-side index, and no
  * `.collect()`; winners are chosen with a single window/aggregate per
  * group key.
  */
object Dedup {

  /** Exact dedup: group identical keys, keep the smallest id as winner.
    * One shuffle on the (hashed) key; map-side partial aggregation applies.
    */
  def exact(df: DataFrame, idCol: String, keyCols: Seq[String]): DataFrame = {
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(col(idCol))
    df.withColumn("_rn", row_number().over(w))
      .withColumn("dup_count", count(lit(1)).over(Window.partitionBy(keyCols.map(col): _*)))
      .filter(col("_rn") === 1)
      .drop("_rn")
  }

  /** A deterministic 32-bit token hash both Spark and an ANSI-SQL oracle
    * can compute: the first 8 hex chars of md5, read as an integer.
    */
  def md5Hash32(c: Column): Column =
    conv(substring(md5(c), 1, 8), 16, 10).cast("long")

  /** Character n-gram set of `text` (distinct substrings of length n;
    * a text shorter than n yields itself as the single shingle).
    */
  def charShingles(text: Column, n: Int): Column =
    array_distinct(
      transform(
        sequence(lit(1), greatest(length(text) - (n - 1), lit(1))),
        i => text.substr(i, lit(n)),
      )
    )

  /** MinHash signature: for permutation k, `min over shingles of
    * (a_k * h(shingle) + b_k) mod P`. Coefficients are a deterministic
    * LCG of k so the oracle can reproduce them.
    */
  val MinhashP = 4294967311L // smallest prime > 2^32

  /** Deterministic (a, b) per permutation, with a < 2^31 so that
    * `h * a + b` never overflows a signed 64-bit long (h < 2^32).
    */
  def minhashCoeff(k: Int): (Long, Long) = {
    def lcg(x: Long): Long = (x * 6364136223846793005L + 1442695040888963407L) >>> 33
    (lcg(2L * k + 1) % 2147483646L + 1L, lcg(2L * k + 2) % 2147483647L)
  }

  /** Add `sig_0..sig_{numHashes-1}` MinHash columns computed from a
    * `shingle_hashes: array<long>` column.
    */
  def minhashSignature(df: DataFrame, hashesCol: String, numHashes: Int): DataFrame =
    (0 until numHashes).foldLeft(df) { (d, k) =>
      val (a, b) = minhashCoeff(k)
      d.withColumn(
        s"sig_$k",
        array_min(transform(col(hashesCol), h => (h * a + b) % MinhashP)),
      )
    }

  /** Banded-LSH candidate pairs from MinHash signatures: band key =
    * concatenated rows of the band → groupBy band key → within-bucket
    * pairs (self-join per bucket on the *small* bucket contents only).
    * Pairs are deduplicated across bands.
    */
  def lshCandidatePairs(sigs: DataFrame, idCol: String, numHashes: Int, bands: Int): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val rowsPerBand = numHashes / bands
    val bandCols = (0 until bands).map { b =>
      // Field names must be positional (h_0..h_{r-1}), not the original
      // sig_k names, so every band struct has the same type and they can
      // be exploded from one array.
      val cs = (0 until rowsPerBand).map(i => col(s"sig_${b * rowsPerBand + i}").as(s"h_$i"))
      struct(lit(b).as("band") +: cs: _*).as(s"_band_$b")
    }
    val banded = sigs
      .select(col(idCol) +: bandCols: _*)
      .select(col(idCol), explode(array((0 until bands).map(b => col(s"_band_$b")): _*)).as("bucket"))
    // Within-bucket pairs: bucket sizes are tiny relative to the corpus, so
    // the self-join shuffles on the bucket key and never goes all-pairs.
    val l = banded.as("l")
    val r = banded.as("r")
    l.join(r, col("l.bucket") === col("r.bucket") && col(s"l.$idCol") < col(s"r.$idCol"))
      .select(col(s"l.$idCol").as("id_a"), col(s"r.$idCol").as("id_b"))
      .distinct()
  }

  /** Full MinHash-LSH near-dedup: shingle → hash → signature → banded
    * buckets → candidate pairs → exact Jaccard re-rank on the candidates
    * only, keeping pairs with similarity ≥ `threshold`.
    */
  def minhashLsh(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      shingleLen: Int = 5,
      numHashes: Int = 16,
      bands: Int = 4,
      threshold: Double = 0.6,
  ): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val base = docs.select(
      col(idCol),
      array_distinct(ngramHashes(col(textCol), shingleLen)).as("sh"),
    )
    val sigs = minhashSignature(base, "sh", numHashes).drop("sh")
    val pairs = lshCandidatePairs(sigs, idCol, numHashes, bands)
    val sets = base.select(col(idCol).as("_id"), col("sh"))
    pairs
      .join(sets.withColumnRenamed("_id", "id_a").withColumnRenamed("sh", "sh_a"), "id_a")
      .join(sets.withColumnRenamed("_id", "id_b").withColumnRenamed("sh", "sh_b"), "id_b")
      .withColumn("inter", size(array_intersect($"sh_a", $"sh_b")).cast("double"))
      .withColumn("uni", size(array_union($"sh_a", $"sh_b")).cast("double"))
      .withColumn("jaccard", round($"inter" / $"uni", 6))
      .filter($"jaccard" >= threshold)
      .select($"id_a", $"id_b", $"jaccard")
  }

  /** md5-based 32-bit hashes of the distinct character n-grams of `text`. */
  def ngramHashes(text: Column, n: Int): Column =
    transform(charShingles(text, n), g => md5Hash32(g))
}
