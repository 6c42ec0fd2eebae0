package graft.llm

import graft.SparkSpec

/** Real-image multimodal path: the bytes travel the actual JDK PNG
  * encoder/decoder on executors; features/thumbnails are exact on
  * synthetic solid-color images.
  */
class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("imageFeatures decodes real PNG bytes exactly") {
    val bin = Seq(
      (1L, Multimodal.solidPng(3, 2, 10, 20, 30)),
      (2L, Multimodal.solidPng(1, 1, 255, 0, 128)),
    ).toDF("doc_id", "payload")
    val f = Multimodal.imageFeatures(bin).collect().sortBy(_.doc_id)
    assert(f(0) === Multimodal.ImageFeatures(1L, ok = true, 3L, 2L, 6L,
      60L, 120L, 180L))
    assert(f(1) === Multimodal.ImageFeatures(2L, ok = true, 1L, 1L, 1L,
      255L, 0L, 128L))
  }

  test("corrupt payloads degrade to ok = false, never throw") {
    val bin = Seq(
      (1L, Array[Byte](1, 2, 3)),
      (2L, Array.emptyByteArray),
      (3L, null.asInstanceOf[Array[Byte]]),
    ).toDF("doc_id", "payload")
    val f = Multimodal.imageFeatures(bin).collect().sortBy(_.doc_id)
    assert(f.length === 3)
    assert(f.forall(r => !r.ok && r.width == 0L && r.n_pixels == 0L))
  }

  test("thumbnails resize through a real re-encode round trip") {
    val bin = Seq((7L, Multimodal.solidPng(8, 8, 40, 50, 60))).toDF("doc_id", "payload")
    val thumbs = Multimodal.thumbnails(bin, 2, 3).toDF("doc_id", "payload")
    val f = Multimodal.imageFeatures(thumbs).head()
    assert(f === Multimodal.ImageFeatures(7L, ok = true, 2L, 3L, 6L,
      6L * 40, 6L * 50, 6L * 60))
    // undecodable rows drop instead of crashing the scan
    val bad = Seq((8L, Array[Byte](9, 9))).toDF("doc_id", "payload")
    assert(Multimodal.thumbnails(bad, 2, 2).count() === 0L)
  }

  test("video container round-trips; corrupt and truncated payloads decode to None") {
    val v = Multimodal.syntheticVideo(3, 2, Seq((10, 20, 30), (40, 50, 60)))
    val Some((w, h, fs)) = Multimodal.decodeVideo(v)
    assert((w, h) === ((3, 2)))
    assert(fs.toSeq === Seq((10, 20, 30), (40, 50, 60)))
    assert(Multimodal.decodeVideo(null) === None)
    assert(Multimodal.decodeVideo("PNG?".getBytes) === None)
    assert(Multimodal.decodeVideo(v.dropRight(1)) === None) // truncated frame
    assert(Multimodal.decodeVideo(v.take(11)) === None)     // truncated header
  }

  test("frameSample keeps every k-th frame with exact solid-frame sums; corrupt rows drop") {
    val frames = Seq((1, 2, 3), (4, 5, 6), (7, 8, 9), (10, 11, 12), (13, 14, 15))
    val bin = Seq(
      (1L, Multimodal.syntheticVideo(4, 3, frames)),
      (2L, Array[Byte](1, 2, 3))).toDF("doc_id", "payload")
    val out = Multimodal.frameSample(bin, everyK = 2).collect()
      .map(f => (f.frame_idx, f.width, f.height, f.sum_r, f.sum_g, f.sum_b)).sorted
    // frames 0, 2, 4; sums = 12 pixels x channel value
    assert(out === Array(
      (0L, 4L, 3L, 12L, 24L, 36L),
      (2L, 4L, 3L, 84L, 96L, 108L),
      (4L, 4L, 3L, 156L, 168L, 180L)))
    // everyK = 1 keeps all frames
    assert(Multimodal.frameSample(bin, 1).count() === 5L)
  }

  test("WAV round-trips through the real RIFF layout; malformed payloads decode to None") {
    val samples = Array[Short](0, 100, -200, 300, -1, 32767, -32768)
    val wav = Multimodal.pcmWav(16000, 2, samples)
    val Some((ch, rate, got)) = Multimodal.decodeWav(wav)
    assert((ch, rate) === ((2, 16000)))
    assert(got.toSeq === samples.toSeq)
    assert(Multimodal.decodeWav(null) === None)
    assert(Multimodal.decodeWav("RIFFxxxxWAVE".getBytes) === None) // no chunks
    assert(Multimodal.decodeWav(wav.dropRight(1)) === None)        // truncated data
    assert(Multimodal.decodeWav(wav.take(30)) === None)            // truncated fmt
    val bad = wav.clone(); bad(20) = 3 // audioFormat = 3 (float PCM) rejected
    assert(Multimodal.decodeWav(bad) === None)
  }

  test("audioFeatures: exact integer amplitude features; corrupt rows degrade to ok=false") {
    // samples: 5, -3, 0, -7, 2 → sumAbs 17, maxAbs 7,
    // sign flips at (5,-3), (-3,0), (0,-7), (-7,2) → zc = 4 (0 counts as >= 0)
    val bin = Seq(
      (1L, Multimodal.pcmWav(8000, 1, Array[Short](5, -3, 0, -7, 2))),
      (2L, Array[Byte](1, 2, 3))).toDF("doc_id", "payload")
    val out = Multimodal.audioFeatures(bin).collect().sortBy(_.doc_id)
    assert(out(0) === Multimodal.AudioFeatures(1L, ok = true, 1L, 8000L, 5L, 17L, 7L, 4L))
    assert(out(1) === Multimodal.AudioFeatures(2L, ok = false, 0L, 0L, 0L, 0L, 0L, 0L))
  }

  test("imageHashes: pinned dHash/aHash bits on a hand-checkable image; " +
    "corrupt payloads degrade to ok=false") {
    // 9x7 image, luma = x * 30 wrapping nowhere: row-adjacent samples
    // strictly increase, so NO dHash bit sets (l1 > l2 never); aHash:
    // samples x=0..7 luma 0,30,..210, mean = 105 -> bits for x in 4..7
    // (luma 120,150,180,210 > 105), i.e. bits i in {4,5,6,7} of every row
    val grad = Multimodal.pixelPng(9, 7, (x, _) => (x * 30, x * 30, x * 30))
    val bin = Seq((1L, grad), (2L, Array[Byte](9, 9, 9))).toDF("doc_id", "payload")
    val out = Multimodal.imageHashes(bin).collect().sortBy(_.doc_id)
    assert(out(0).ok && out(0).dhash === 0L)
    val expectA = (0 until Multimodal.PhashRows).map { j =>
      Seq(4, 5, 6, 7).map(i => 1L << (j * Multimodal.PhashCols + i)).sum
    }.sum
    assert(out(0).ahash === expectA)
    assert(out(1) === Multimodal.ImageHashes(2L, ok = false, 0L, 0L))
  }

  test("phashDup: near-identical images pair with small hamming, distant ones " +
    "don't; corrupt rows never pair; the hot-band cap drops boilerplate") {
    def png(seed: Int, off: Int) = Multimodal.pixelPng(12, 9, (x, y) =>
      (((seed * 37 + 71 * x + 43 * y + off) % 256),
        ((seed * 11 + 97 * x + 29 * y + off) % 256),
        ((seed * 53 + 61 * x + 83 * y + off) % 256)))
    val bin = Seq(
      1L -> png(1, 0), 2L -> png(1, 1),   // near-dup pair
      3L -> png(9, 0),                     // unrelated
      4L -> Array[Byte](1, 2, 3)           // corrupt
    ).toDF("doc_id", "payload")
    val hashes = Multimodal.imageHashes(bin).toDF()
    val pairs = Multimodal.phashDup(hashes).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs === Set((1L, 2L)))
    // boilerplate cap: N solid images all hash to 0 in every band; with
    // maxBandFreq below N the clique produces ZERO candidate pairs
    val solid = (1L to 10L).map(i => i -> Multimodal.solidPng(8, 8, 200, 10, 10))
      .toDF("doc_id", "payload")
    val sh = Multimodal.imageHashes(solid).toDF()
    assert(Multimodal.phashDup(sh, maxBandFreq = 5).count() === 0L)
    assert(Multimodal.phashDup(sh, maxBandFreq = 100).count() === 45L)
  }
}
