package graft.llm

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.ImageIO

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media as an opaque `binary` payload column
  * with typed metadata, and distributed feature extraction over the raw
  * bytes.
  *
  * Binary columns survive parquet round trips, the decode/extract/resize
  * steps run per-partition over the byte arrays (the Scala analog of a
  * `mapInPandas` batch UDF), and the outputs are typed Datasets with
  * stable schemas. The image decode is REAL — `javax.imageio` ships with
  * the JDK (PNG/BMP/GIF/JPEG readers), needs no display, and runs on any
  * executor. Audio/video containers would slot into the same
  * per-partition shape with their codec library.
  */
object Multimodal {

  // ImageIO defaults to a temp-FILE cache per decode; at millions of
  // images per executor that is pure filesystem churn — decode in memory.
  ImageIO.setUseCache(false)

  /** Extracted per-document features. All-integer so any SQL oracle
    * reproduces them exactly (no float rounding semantics involved).
    *
    * @param n_bytes    payload size
    * @param ascii_hash polynomial rolling hash of the ASCII bytes (the
    *                   UTF-8 ASCII projection — multi-byte sequences are
    *                   all ≥ 0x80, so byte- and codepoint-level ASCII
    *                   projections agree)
    * @param ascii_sum  sum of the ASCII byte values
    * @param bucket     ascii_hash mod 16 — a partition-friendly shard key
    */
  final case class MediaFeatures(doc_id: Long, n_bytes: Long, ascii_hash: Long,
                                 ascii_sum: Long, bucket: Long)

  /** Per-image features off a REAL decode. All-integer (channel sums, not
    * means) so expected values are exact. `ok = false` marks payloads no
    * installed reader accepts (dims/sums zero) — corrupt media must not
    * kill a 100 TB scan.
    */
  final case class ImageFeatures(doc_id: Long, ok: Boolean, width: Long, height: Long,
                                 n_pixels: Long, sum_r: Long, sum_g: Long, sum_b: Long)

  /** View a text table as a binary media table: payload + typed metadata
    * struct. With real media the payload would come off the source as-is.
    */
  def asBinary(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    // null media treated as an empty payload — keeps the per-partition
    // extraction total (no NPE on payload.length) and matches a
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

  /** Per-partition feature extraction over raw binary payloads — the
    * imperative, library-calling step a media pipeline needs, kept off
    * the driver and run batch-at-a-time per partition.
    */
  def extractFeatures(bin: DataFrame, idCol: String = "doc_id"): Dataset[MediaFeatures] = {
    val spark = bin.sparkSession
    import spark.implicits._
    bin.select(col(idCol).cast("long"), col("payload")).as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, payload) =>
          var h = 0L
          var s = 0L
          payload.foreach { b =>
            if (b >= 0) { // ASCII byte (< 0x80)
              h = (h * 31 + b) % TextAnalysis.FpMod
              s += b
            }
          }
          MediaFeatures(id, payload.length.toLong, h, s, h % 16)
        }
      }
  }

  // ---- real image decode ------------------------------------------------

  /** Decode an image container (PNG/BMP/GIF/JPEG via the JDK's readers).
    * None when no reader accepts the bytes — never throws on corrupt
    * payloads.
    */
  def decodeImage(payload: Array[Byte]): Option[BufferedImage] =
    if (payload == null || payload.isEmpty) None
    else
      try Option(ImageIO.read(new ByteArrayInputStream(payload)))
      catch { case _: java.io.IOException => None }

  /** Encode a deterministic solid-color PNG — the synthetic-media
    * generator for specs/oracles: content is a closed-form function of
    * (w, h, r, g, b), so expected decode features are computable by any
    * SQL engine while the bytes still travel the REAL PNG encoder.
    */
  def solidPng(w: Int, h: Int, r: Int, g: Int, b: Int): Array[Byte] = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    val rgb = (r << 16) | (g << 8) | b
    var y = 0
    while (y < h) { var x = 0; while (x < w) { img.setRGB(x, y, rgb); x += 1 }; y += 1 }
    val out = new ByteArrayOutputStream()
    ImageIO.write(img, "png", out)
    out.toByteArray
  }

  /** REAL decode + feature extraction: dims and per-channel sums, one
    * image at a time per partition; corrupt rows degrade to `ok = false`.
    */
  def imageFeatures(bin: DataFrame, idCol: String = "doc_id"): Dataset[ImageFeatures] = {
    val spark = bin.sparkSession
    import spark.implicits._
    bin.select(col(idCol).cast("long"), col("payload")).as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, payload) =>
          decodeImage(payload) match {
            case None => ImageFeatures(id, ok = false, 0L, 0L, 0L, 0L, 0L, 0L)
            case Some(img) =>
              val (w, h) = (img.getWidth, img.getHeight)
              var (sr, sg, sb) = (0L, 0L, 0L)
              var y = 0
              while (y < h) {
                var x = 0
                while (x < w) {
                  val p = img.getRGB(x, y)
                  sr += (p >> 16) & 0xff; sg += (p >> 8) & 0xff; sb += p & 0xff
                  x += 1
                }
                y += 1
              }
              ImageFeatures(id, ok = true, w.toLong, h.toLong, w.toLong * h, sr, sg, sb)
          }
        }
      }
  }

  /** Distributed thumbnailing: decode, area-preserving nearest-neighbor
    * resize to `tw × th`, re-encode PNG. Undecodable rows drop (a media
    * pipeline filters, it doesn't crash). Output: (idCol, payload).
    */
  def thumbnails(bin: DataFrame, tw: Int, th: Int,
                 idCol: String = "doc_id"): Dataset[(Long, Array[Byte])] = {
    val spark = bin.sparkSession
    import spark.implicits._
    bin.select(col(idCol).cast("long"), col("payload")).as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, payload) =>
          decodeImage(payload).map { img =>
            val dst = new BufferedImage(tw, th, BufferedImage.TYPE_INT_RGB)
            val g2 = dst.createGraphics()
            try g2.drawImage(img, 0, 0, tw, th, null)
            finally g2.dispose()
            val out = new ByteArrayOutputStream()
            ImageIO.write(dst, "png", out)
            (id, out.toByteArray)
          }
        }
      }
  }
}
