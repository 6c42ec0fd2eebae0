package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** JSONL corpus ingest/egress — the interchange format of every public
  * text-corpus release (C4, The Pile, RedPajama ship as JSON lines).
  * The contract here is the 100 TB-safe version of `spark.read.json`:
  *
  *  - the schema is ENFORCED, never inferred — schema inference is a
  *    full extra pass over the data, and a drifting inferred schema is
  *    a silent pipeline-breaker; callers pass the expected struct;
  *  - corrupt lines are QUARANTINED, not dropped and not fatal: they
  *    come back as a second DataFrame of raw lines for operational
  *    triage (a 100 TB ingest always has a few), while the good rows
  *    carry exactly the declared columns;
  *  - both directions are line-oriented text, so they split, scale, and
  *    stream like any text source (a `readStream.json` over the same
  *    schema is the streaming form for free).
  */
object TextCorpus {

  private val CorruptCol = "_graft_corrupt"

  /** Read a JSONL corpus under `schema`: returns (good, corrupt) — good
    * rows with exactly the declared columns, corrupt raw lines (parse
    * failures AND type-violating lines) as one string column `line`.
    *
    * Implementation: a TEXT scan parsed by `from_json` with a
    * corrupt-record column, NOT `spark.read.json` — the json source
    * forbids plans that reference only its corrupt column (the
    * quarantine side would trip
    * UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_COLUMN after column
    * pruning), while the text-scan form keeps the raw line available to
    * both sides of the split from one scan, no caching required, and
    * nothing shuffles.
    */
  def readJsonl(spark: SparkSession, path: String,
                schema: StructType): (DataFrame, DataFrame) = {
    require(!schema.fieldNames.contains(CorruptCol),
      s"readJsonl: schema may not contain $CorruptCol")
    val withCorrupt = StructType(schema.fields :+
      StructField(CorruptCol, StringType, nullable = true))
    val parsed = spark.read.text(path).select(col("value"),
      from_json(col("value"), withCorrupt,
        Map("mode" -> "PERMISSIVE", "columnNameOfCorruptRecord" -> CorruptCol)).as("_r"))
    val bad = col("_r").isNull || col(s"_r.$CorruptCol").isNotNull
    val good = parsed.filter(!bad)
      .select(schema.fieldNames.map(f => col(s"_r.$f").as(f)).toSeq: _*)
    val corrupt = parsed.filter(bad).select(col("value").as("line"))
    (good, corrupt)
  }

  /** Write `df` as JSONL (one JSON object per line, all columns). A
    * plain text write of `to_json(struct(*))` — splittable, appendable,
    * and readable by anything; `numFiles` controls output parallelism
    * the same way every writer here does.
    */
  def writeJsonl(df: DataFrame, path: String, numFiles: Int = 0): Unit = {
    val out = df.select(to_json(struct(df.columns.map(col).toSeq: _*)).as("value"))
    val sized = if (numFiles > 0) out.repartition(numFiles) else out
    sized.write.mode("overwrite").text(path)
  }
}
