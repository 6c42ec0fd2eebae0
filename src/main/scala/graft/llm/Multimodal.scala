package graft.llm

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media as an opaque `binary` payload column
  * with typed metadata, and distributed feature extraction over the raw
  * bytes.
  *
  * The Spark-side architecture is the real thing — binary columns survive
  * parquet round trips, the extraction runs per-partition over the byte
  * arrays (the Scala analog of a `mapInPandas` batch UDF), and the output
  * is a typed Dataset with a stable schema. Only the media *decode* is
  * stubbed: this container has no image/audio codecs, so [[fakeDecode]]
  * is a deterministic stand-in marked where a real decoder would go.
  */
object Multimodal {

  /** Extracted per-document features. All-integer so any SQL oracle
    * reproduces them exactly (no float rounding semantics involved).
    *
    * @param n_bytes    decoded payload size
    * @param ascii_hash polynomial rolling hash of the ASCII bytes (the
    *                   UTF-8 ASCII projection — multi-byte sequences are
    *                   all ≥ 0x80, so byte- and codepoint-level ASCII
    *                   projections agree)
    * @param ascii_sum  sum of the ASCII byte values
    * @param bucket     ascii_hash mod 16 — a partition-friendly shard key
    */
  final case class MediaFeatures(doc_id: Long, n_bytes: Long, ascii_hash: Long,
                                 ascii_sum: Long, bucket: Long)

  /** View a text table as a binary media table: payload + typed metadata
    * struct. With real media the payload would come off the source as-is.
    */
  def asBinary(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    // null media treated as an empty payload — keeps the per-partition
    // extraction total (no NPE on decoded.length) and matches a
    // COALESCE(text, '') oracle
    val t = coalesce(col(textCol), lit(""))
    docs.select(
      col(idCol),
      encode(t, "UTF-8").as("payload"),
      struct(
        octet_length(t).cast("long").as("n_bytes"),
        lit("text/plain").as("mime"),
      ).as("meta"))
  }

  /** STUB — a real pipeline would decode the image/audio container here
    * (e.g. JPEG → pixel array). No codecs in this container, so the
    * deterministic stand-in returns the payload unchanged; everything
    * around it (schema, partitioning, per-partition batch shape) is real.
    */
  private def fakeDecode(payload: Array[Byte]): Array[Byte] = payload

  /** Per-partition feature extraction over the binary payloads — the
    * imperative, library-calling step a real media pipeline needs, kept
    * off the driver and run batch-at-a-time per partition.
    */
  def extractFeatures(bin: DataFrame, idCol: String = "doc_id"): Dataset[MediaFeatures] = {
    val spark = bin.sparkSession
    import spark.implicits._
    bin.select(col(idCol).cast("long"), col("payload")).as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, payload) =>
          val decoded = fakeDecode(payload)
          var h = 0L
          var s = 0L
          decoded.foreach { b =>
            if (b >= 0) { // ASCII byte (< 0x80)
              h = (h * 31 + b) % TextAnalysis.FpMod
              s += b
            }
          }
          MediaFeatures(id, decoded.length.toLong, h, s, h % 16)
        }
      }
  }
}
