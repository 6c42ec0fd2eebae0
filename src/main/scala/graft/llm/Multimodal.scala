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

  // --- video frame sampling ---
  //
  // No video codec library ships offline, so the DECODE here is the
  // brief's sanctioned deterministic fake: a tiny explicit container
  // ("GFTV": magic, u16 w, u16 h, u32 nFrames, then 3 bytes (r,g,b) per
  // SOLID frame). Everything around the fake codec — the binary payload
  // column, the per-partition batch decode, the one-row-per-sampled-
  // frame explosion, corrupt-row degradation, the typed output schema —
  // is the real Spark plumbing a real codec would slot into (swap
  // decodeVideo for the jcodec/ffmpeg call and nothing else changes).

  /** Per-sampled-frame features — all-integer (solid frames make channel
    * sums exact closed forms), so a SQL oracle reproduces them.
    */
  final case class FrameFeatures(doc_id: Long, frame_idx: Long, width: Long,
                                 height: Long, sum_r: Long, sum_g: Long, sum_b: Long)

  private val VideoMagic = Array[Byte]('G', 'F', 'T', 'V')

  /** Encode the synthetic container: solid frames with the given colors.
    * Content is a pure function of the arguments — the generator half of
    * the fake codec.
    */
  def syntheticVideo(w: Int, h: Int, frames: Seq[(Int, Int, Int)]): Array[Byte] = {
    require(w > 0 && w <= 0xffff && h > 0 && h <= 0xffff, "syntheticVideo: bad dims")
    val out = java.nio.ByteBuffer.allocate(12 + 3 * frames.size)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put(VideoMagic).putShort(w.toShort).putShort(h.toShort).putInt(frames.size)
    frames.foreach { case (r, g, b) =>
      out.put((r & 0xff).toByte).put((g & 0xff).toByte).put((b & 0xff).toByte) }
    out.array()
  }

  /** Decode the synthetic container. None on anything malformed (bad
    * magic, truncated frames) — corrupt media must not kill the scan.
    */
  def decodeVideo(payload: Array[Byte]): Option[(Int, Int, Array[(Int, Int, Int)])] =
    if (payload == null || payload.length < 12 ||
        !payload.take(4).sameElements(VideoMagic)) None
    else {
      val bb = java.nio.ByteBuffer.wrap(payload)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.position(4)
      val w = bb.getShort & 0xffff
      val h = bb.getShort & 0xffff
      val n = bb.getInt
      if (n < 0 || payload.length != 12 + 3L * n || w == 0 || h == 0) None
      else Some((w, h, Array.tabulate(n) { _ =>
        (bb.get() & 0xff, bb.get() & 0xff, bb.get() & 0xff) }))
    }

  /** Frame sampling: every `everyK`-th frame (0, k, 2k, …) of each video
    * becomes one output row with its decode features. Per-partition
    * batch decode (the mapInPandas shape), undecodable payloads DROP.
    * The row explosion is bounded by frames/everyK per video — the knob
    * that keeps a billion-hour corpus's sampled-frame table sized to the
    * training budget rather than the footage.
    */
  def frameSample(bin: DataFrame, everyK: Int,
                  idCol: String = "doc_id"): Dataset[FrameFeatures] = {
    require(everyK >= 1, "frameSample: everyK must be >= 1")
    val spark = bin.sparkSession
    import spark.implicits._
    bin.select(col(idCol).cast("long"), col("payload")).as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, payload) =>
          decodeVideo(payload).iterator.flatMap { case (w, h, frames) =>
            frames.iterator.zipWithIndex
              .filter(_._2 % everyK == 0)
              .map { case ((r, g, b), f) =>
                val px = w.toLong * h
                FrameFeatures(id, f.toLong, w.toLong, h.toLong,
                  px * r, px * g, px * b)
              }
          }
        }
      }
  }

  // --- audio (WAV/PCM) ---
  //
  // The decode here is REAL: RIFF/WAVE is a public byte layout (magic,
  // chunk walk, `fmt ` + `data` chunks, 16-bit little-endian PCM) that
  // needs no codec library — unlike video, the container IS the format.
  // Completes the modality set: image (real JDK decode), video
  // (sanctioned synthetic container), audio (real header parse).

  /** Per-clip features — all-integer (abs-sums, not float RMS) so a SQL
    * oracle reproduces them exactly. `ok = false` marks payloads the
    * parser rejects (bad magic, truncated data, non-PCM, non-16-bit) —
    * corrupt media must not kill a 100 TB scan. Multichannel clips
    * measure the INTERLEAVED stream as-is (per-channel splits are a
    * `filter(i % channels = c)` away and not baked into the contract).
    *
    * @param zero_cross count of adjacent sample pairs whose signs differ
    *                   (`(s[i-1] < 0) != (s[i] < 0)`) — the classic
    *                   cheap voicing/noise discriminator
    */
  final case class AudioFeatures(doc_id: Long, ok: Boolean, channels: Long,
                                 sample_rate: Long, n_samples: Long,
                                 sum_abs: Long, max_abs: Long, zero_cross: Long)

  /** Encode a real RIFF/WAVE (PCM, 16-bit LE) from raw samples — the
    * generator half: content is a pure function of the arguments, so
    * expected decode features are closed forms while the bytes travel
    * the genuine container layout.
    */
  def pcmWav(sampleRate: Int, channels: Int, samples: Array[Short]): Array[Byte] = {
    require(sampleRate > 0 && channels > 0, "pcmWav: bad format args")
    val dataLen = samples.length * 2
    val bb = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1) // PCM
      .putShort(channels.toShort)
      .putInt(sampleRate)
      .putInt(sampleRate * channels * 2) // byte rate
      .putShort((channels * 2).toShort)  // block align
      .putShort(16)                      // bits per sample
      .put("data".getBytes("US-ASCII")).putInt(dataLen)
    samples.foreach(bb.putShort)
    bb.array()
  }

  /** Parse a RIFF/WAVE payload: walk the chunk list, require a PCM
    * 16-bit `fmt ` chunk before `data`, read the samples. None on
    * anything malformed (bad magic, truncated chunk, odd data length,
    * compressed or non-16-bit audio) — never throws.
    */
  def decodeWav(payload: Array[Byte]): Option[(Int, Int, Array[Short])] = {
    if (payload == null || payload.length < 44 ||
        payload(0) != 'R' || payload(1) != 'I' || payload(2) != 'F' || payload(3) != 'F' ||
        payload(8) != 'W' || payload(9) != 'A' || payload(10) != 'V' || payload(11) != 'E')
      return None
    val bb = java.nio.ByteBuffer.wrap(payload).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    var pos = 12
    var fmt: Option[(Int, Int)] = None // (channels, sampleRate)
    while (pos + 8 <= payload.length) {
      val id = new String(payload, pos, 4, "US-ASCII")
      val len = bb.getInt(pos + 4)
      if (len < 0 || pos + 8 + len > payload.length) return None
      if (id == "fmt ") {
        if (len < 16) return None
        val audioFormat = bb.getShort(pos + 8) & 0xffff
        val channels = bb.getShort(pos + 10) & 0xffff
        val rate = bb.getInt(pos + 12)
        val bits = bb.getShort(pos + 22) & 0xffff
        if (audioFormat != 1 || bits != 16 || channels == 0 || rate <= 0) return None
        fmt = Some((channels, rate))
      } else if (id == "data") {
        return fmt.flatMap { case (ch, rate) =>
          if (len % 2 != 0) None
          else {
            val n = len / 2
            val out = new Array[Short](n)
            var i = 0
            while (i < n) { out(i) = bb.getShort(pos + 8 + 2 * i); i += 1 }
            Some((ch, rate, out))
          }
        }
      }
      pos += 8 + len + (len & 1) // chunks are word-aligned
    }
    None
  }

  /** REAL WAV parse + integer amplitude features, one clip at a time per
    * partition (the mapInPandas shape); corrupt rows degrade to
    * `ok = false` like [[imageFeatures]].
    */
  def audioFeatures(bin: DataFrame, idCol: String = "doc_id"): Dataset[AudioFeatures] = {
    val spark = bin.sparkSession
    import spark.implicits._
    bin.select(col(idCol).cast("long"), col("payload")).as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, payload) =>
          decodeWav(payload) match {
            case None => AudioFeatures(id, ok = false, 0L, 0L, 0L, 0L, 0L, 0L)
            case Some((ch, rate, samples)) =>
              var (sumAbs, maxAbs, zc) = (0L, 0L, 0L)
              var i = 0
              while (i < samples.length) {
                val a = math.abs(samples(i).toLong)
                sumAbs += a
                if (a > maxAbs) maxAbs = a
                if (i > 0 && (samples(i - 1) < 0) != (samples(i) < 0)) zc += 1
                i += 1
              }
              AudioFeatures(id, ok = true, ch.toLong, rate.toLong,
                samples.length.toLong, sumAbs, maxAbs, zc)
          }
        }
      }
  }

  // --- image perceptual hashing (near-dup over the IMAGE modality) ---
  //
  // dHash / aHash (public knowledge: the standard perceptual-hash
  // family) with every step PINNED so an independent engine reproduces
  // the bits from a closed-form pixel function:
  //   - sample grid = NEAREST-NEIGHBOR floor coordinates
  //     (x_i = ⌊i·w/cols⌋, y_j = ⌊j·h/rows⌋) — no interpolation, no
  //     float resize kernel an oracle can't replay;
  //   - grayscale = integer luma ⌊(299·r + 587·g + 114·b) / 1000⌋;
  //   - dHash bit (j·8+i) = luma(x_i, y_j) > luma(x_{i+1}, y_j) over a
  //     9×7 sample grid → 56 bits; aHash bit = luma > ⌊mean⌋ over 8×7.
  // 56 bits, not 64, on purpose: bit 63 of a BIGINT overflows an ANSI
  // engine's CHECKED left shift (the Bloom-words precedent), and 56
  // bits Hamming-band evenly into 8 × 7.

  val PhashCols = 8   // dHash compares 9 x-samples pairwise → 8 bits/row
  val PhashRows = 7
  val PhashBits: Int = PhashCols * PhashRows // 56
  val PhashBands = 8  // 7 bits per band; dist ≤ 6 < 8 bands ⇒ candidate guaranteed

  /** Per-image perceptual hashes off a REAL decode; `ok = false` (hashes
    * 0) marks undecodable payloads.
    */
  final case class ImageHashes(doc_id: Long, ok: Boolean, dhash: Long, ahash: Long)

  /** Encode a PNG whose pixel (x, y) is `f(x, y)` — the generator half
    * for gradient fixtures: content is a pure function of the closure,
    * so expected luma/hash values are closed forms while the bytes
    * travel the real PNG encoder + decoder.
    */
  def pixelPng(w: Int, h: Int, f: (Int, Int) => (Int, Int, Int)): Array[Byte] = {
    require(w > 0 && h > 0, "pixelPng: bad dims")
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val (r, g, b) = f(x, y)
        img.setRGB(x, y, ((r & 0xff) << 16) | ((g & 0xff) << 8) | (b & 0xff))
        x += 1
      }
      y += 1
    }
    val out = new ByteArrayOutputStream()
    ImageIO.write(img, "png", out)
    out.toByteArray
  }

  /** dHash + aHash per image (the pinned construction above): one decode
    * per row per partition, no shuffle — the signature table a near-dup
    * pass ([[phashDup]]) bands over.
    */
  def imageHashes(bin: DataFrame, idCol: String = "doc_id"): Dataset[ImageHashes] = {
    val spark = bin.sparkSession
    import spark.implicits._
    bin.select(col(idCol).cast("long"), col("payload")).as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, payload) =>
          decodeImage(payload) match {
            case None => ImageHashes(id, ok = false, 0L, 0L)
            case Some(img) =>
              val (w, h) = (img.getWidth, img.getHeight)
              def luma(x: Int, y: Int): Int = {
                val p = img.getRGB(x, y)
                (299 * ((p >> 16) & 0xff) + 587 * ((p >> 8) & 0xff) +
                  114 * (p & 0xff)) / 1000
              }
              // dHash: 9 x-samples × 7 y-samples, row-adjacent compares
              var dh = 0L
              var j = 0
              while (j < PhashRows) {
                val y = j * h / PhashRows
                var i = 0
                while (i < PhashCols) {
                  val l1 = luma(i * w / (PhashCols + 1), y)
                  val l2 = luma((i + 1) * w / (PhashCols + 1), y)
                  if (l1 > l2) dh |= 1L << (j * PhashCols + i)
                  i += 1
                }
                j += 1
              }
              // aHash: 8×7 grid against the floored mean
              val samples = new Array[Int](PhashBits)
              j = 0
              while (j < PhashRows) {
                val y = j * h / PhashRows
                var i = 0
                while (i < PhashCols) {
                  samples(j * PhashCols + i) = luma(i * w / PhashCols, y)
                  i += 1
                }
                j += 1
              }
              val mean = (samples.map(_.toLong).sum / PhashBits).toInt
              var ah = 0L
              var k = 0
              while (k < PhashBits) {
                if (samples(k) > mean) ah |= 1L << k
                k += 1
              }
              ImageHashes(id, ok = true, dh, ah)
          }
        }
      }
  }

  /** Image near-dup pairs by Hamming-banded blocking over a perceptual
    * hash column — the [[Dedup]] banding doctrine applied to the image
    * modality: the 56-bit hash splits into [[PhashBands]] 7-bit bands,
    * a pair is a candidate iff SOME band matches exactly (pigeonhole:
    * Hamming distance ≤ bands−1 guarantees a shared band, so
    * `maxDist` ≤ [[PhashBands]]−1 loses nothing), candidates pay one
    * exact `bit_count(xor)` re-rank. Only band-local pairs are ever
    * formed; a band value shared by more than `maxBandFreq` images
    * (solid-color boilerplate — every bit 0) is dropped like
    * ngramJaccard's stop-gram cap, since that bucket IS the O(df²)
    * blow-up. Undecodable rows (`ok = false`) never pair.
    *
    * Output: `(id_a, id_b, hamming)`, id_a < id_b, hamming ≤ maxDist.
    */
  def phashDup(hashes: DataFrame, idCol: String = "doc_id",
               hashCol: String = "dhash", maxDist: Int = 6,
               maxBandFreq: Int = 256): DataFrame = {
    require(maxDist >= 0 && maxDist < PhashBands,
      s"phashDup: maxDist must be in [0, ${PhashBands - 1}] for banding to guarantee recall")
    val bandBits = PhashBits / PhashBands // 7
    val mask = (1L << bandBits) - 1
    val bd = hashes.filter(col("ok"))
      .select(col(idCol).cast("long").as("_id"), col(hashCol).as("_h"))
      .select(col("_id"), col("_h"),
        explode(array((0 until PhashBands).map(b =>
          struct(lit(b).as("b"),
            shiftright(col("_h"), b * bandBits).bitwiseAND(lit(mask)).as("bv"))): _*))
          .as("_bd"))
      .select(col("_id"), col("_h"), col("_bd.b").as("_b"), col("_bd.bv").as("_bv"))
    val hot = bd.groupBy(col("_b"), col("_bv")).agg(count(lit(1)).as("_c"))
      .filter(col("_c") > maxBandFreq)
      .select(col("_b").as("_hb"), col("_bv").as("_hbv"))
    val cold = bd.join(broadcast(hot),
        col("_b") === col("_hb") && col("_bv") === col("_hbv"), "left_anti")
    val l = cold.select(col("_b"), col("_bv"), col("_id").as("id_a"), col("_h").as("_ha"))
    val r = cold.select(col("_b"), col("_bv"), col("_id").as("id_b"), col("_h").as("_hb2"))
    l.join(r, Seq("_b", "_bv")).filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        bit_count(col("_ha").bitwiseXOR(col("_hb2"))).cast("long").as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxDist)
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
