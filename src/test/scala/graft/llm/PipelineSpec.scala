package graft.llm

import org.apache.spark.sql.functions._
import graft.SparkSpec

class PipelineSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    // (doc_id, text, lang, shard)
    (0L, "one two three", "en", "s0"),          // 3 tokens
    (1L, "uno dos tres cuatro cinco", "es", "s0"), // 5 tokens
    (2L, "a b c d", "en", "s0"),                // 4 tokens
    (3L, "", "en", "s0"),                       // 0 tokens
    (4L, "x y z w v u t s", "de", "s1"),        // 8 tokens
    (5L, "p q", "de", "s1")                     // 2 tokens
  ).toDF("doc_id", "text", "lang", "shard")

  test("sampleStratified is a deterministic pure function of (id, seed)") {
    val a = Pipeline.sampleStratified(docs, "doc_id", "lang",
      Map("en" -> 0.5), default = 1.0, seed = 42L).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    val b = Pipeline.sampleStratified(docs.repartition(7), "doc_id", "lang",
      Map("en" -> 0.5), default = 1.0, seed = 42L).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(a === b, "partitioning must not change the sample")
    // non-"en" strata use the default fraction (here: keep everything)
    assert(Set(1L, 4L, 5L).subsetOf(a))
  }

  test("sampleStratified fraction endpoints: 0 drops all, 1 keeps all") {
    val none = Pipeline.sampleStratified(docs, "doc_id", "lang",
      Map.empty, default = 0.0, seed = 1L)
    val all = Pipeline.sampleStratified(docs, "doc_id", "lang",
      Map.empty, default = 1.0, seed = 1L)
    assert(none.count() === 0L)
    assert(all.count() === docs.count())
  }

  test("packSequences: bin is the starting cut, spans marks boundary-crossers") {
    // budget 6, shard s0 in doc_id order: 3 + 5 + 4 + 0 tokens
    //   doc 0 starts at 0  -> bin 0, ends at 2  -> no span
    //   doc 1 starts at 3  -> bin 0, ends at 7  -> spans into bin 1
    //   doc 2 starts at 8  -> bin 1, ends at 11 -> no span
    //   doc 3 empty        -> bin 2 (start 12), spans=false by the n>0 guard
    // shard s1: 8 tokens -> starts bin 0 spans into bin 1; then 2 tokens bin 1
    val out = Pipeline.packSequences(docs, "doc_id", "text", "shard", 6)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(2), r.getLong(3), r.getBoolean(4)))).toMap
    assert(out(0L) === ((3L, 0L, false)))
    assert(out(1L) === ((5L, 0L, true)))
    assert(out(2L) === ((4L, 1L, false)))
    assert(out(3L) === ((0L, 2L, false)))
    assert(out(4L) === ((8L, 0L, true)))
    assert(out(5L) === ((2L, 1L, false)))
  }

  test("packSequences with a subword vocab: budgets are vocab-REAL token counts") {
    // vocab: "ab" + single letters a, b → "ababa" = ab ab a = 3 subwords
    // (5 whitespace-chars, 1 whitespace token — the budget genuinely moves)
    val d = Seq((0L, "ababa ab", "s"), (1L, "b a", "s")).toDF("doc_id", "text", "shard")
    val out = Pipeline.packSequences(d, "doc_id", "text", "shard", 4,
        vocab = Some(Seq("a", "b", "ab")))
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(2), r.getLong(3), r.getBoolean(4)))).toMap
    // doc 0: ababa=3 + ab=1 → 4 subwords, fills bin 0 exactly (no span);
    // doc 1: 2 subwords starting at 4 → bin 1
    assert(out(0L) === ((4L, 0L, false)))
    assert(out(1L) === ((2L, 1L, false)))
    // whitespace budgets would have been 2 and 2 — different bins entirely
    val ws = Pipeline.packSequences(d, "doc_id", "text", "shard", 4)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(ws(0L) === 2L)
  }

  test("chunkSubwords: windows cut in subword space, chunk identity hashes the id slice") {
    // vocab ids: a=0, b=1, ab=2 → "ababa ba x" = [2, 2, 0, 1, 0, -1] (6 subwords)
    val d = Seq((1L, "ababa ba x")).toDF("doc_id", "text")
    val out = Pipeline.chunkSubwords(d, "doc_id", "text", Seq("a", "b", "ab"),
        chunkTokens = 4, stride = 2)
      .orderBy("chunk_id").collect()
    // 6 ids, budget 4, stride 2 → chunks at 0 (4 ids) and 2 (4 ids)
    assert(out.map(r => (r.getLong(1), r.getLong(2), r.getLong(3))).toSeq ===
      Seq((0L, 0L, 4L), (1L, 2L, 4L)))
    // hash = md5-32 of the id slice joined with '|' — check chunk 0 directly
    val expect = Seq(Tuple1("2|2|0|1")).toDF("s")
      .select(Dedup.md5Hash32(col("s"))).collect().head.getLong(0)
    assert(out(0).getLong(4) === expect)
    // a doc with zero subwords (whitespace only) produces no chunks
    assert(Pipeline.chunkSubwords(Seq((2L, "   ")).toDF("doc_id", "text"),
      "doc_id", "text", Seq("a"), 4, 2).count() === 0L)
  }

  test("packSequences mega-shard recipe: salt the shard key, then pack") {
    // The shard is the packing unit, so a single mega-shard serializes in
    // one window partition BY CONTRACT — the documented remedy is to
    // derive a salted sub-shard key and pack on that. This pins the
    // recipe's semantics: every salted sub-shard packs exactly as if it
    // were its own table (bins restart per sub-shard, spans stay local),
    // and no tokens are lost relative to the serialized mega-shard pack.
    val mega = docs.withColumn("shard", lit("all"))
    val salted = mega.withColumn("sub",
      concat(lit("all_"), (col("doc_id") % 2).cast("string")))
    val packed = Pipeline.packSequences(salted, "doc_id", "text", "sub", 6)
    for (k <- Seq("all_0", "all_1")) {
      val together = packed.filter(col("sub") === k)
        .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(3), r.getBoolean(4))).toSet
      val alone = Pipeline.packSequences(
          salted.filter(col("sub") === k), "doc_id", "text", "sub", 6)
        .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(3), r.getBoolean(4))).toSet
      assert(together === alone, s"sub-shard $k must pack as its own table")
    }
    val megaTokens = Pipeline.packSequences(mega, "doc_id", "text", "shard", 6)
      .agg(sum("n_tokens")).head.getLong(0)
    val saltedTokens = packed.agg(sum("n_tokens")).head.getLong(0)
    assert(saltedTokens === megaTokens, "salting must conserve the token stream")
  }

  test("shuffleDeterministic: pure (id, seed) permutation, contiguous shard positions") {
    def run(df: org.apache.spark.sql.DataFrame, seed: Long) =
      Pipeline.shuffleDeterministic(df, "doc_id", seed, 2)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val a = run(docs, 42L)
    assert(a === run(docs.repartition(7), 42L),
      "partitioning must not change the permutation")
    assert(a.map(_._1) === docs.collect().map(_.getLong(0)).toSet,
      "every doc appears exactly once")
    for ((sh, rows) <- a.groupBy(_._2))
      assert(rows.map(_._3) === (0L until rows.size).toSet,
        s"shard $sh positions must be contiguous from 0")
    assert(a !== run(docs, 43L), "a different seed must reorder")
  }

  // Decontamination fixtures: bench 3-grams are {zzz alpha beta,
  // alpha beta gamma, beta gamma delta, gamma delta yyy}.
  private val deconTrain = Seq(
    (10L, "alpha beta gamma delta epsilon"), // shares 2 bench 3-grams
    (11L, "foo bar baz qux"),                // shares none
    (12L, "alpha beta gamma delta")          // shares the same 2
  ).toDF("doc_id", "text")
  private val deconBench = Seq((0L, "zzz alpha beta gamma delta yyy")).toDF("doc_id", "text")

  test("decontaminate flags exactly the docs sharing an n-gram, with distinct-hit counts") {
    val flagged = Pipeline.decontaminate(deconTrain, deconBench, "doc_id", "text", n = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // docs 10 and 12 each share {alpha beta gamma, beta gamma delta};
    // doc 10's third gram (gamma delta epsilon) is NOT in the bench set.
    assert(flagged === Map(10L -> 2L, 12L -> 2L))
  }

  test("decontaminate minHits raises the flagging bar; shuffle path matches broadcast") {
    val strict = Pipeline.decontaminate(deconTrain, deconBench, "doc_id", "text",
        n = 3, minHits = 3)
    assert(strict.count() === 0L, "no train doc shares 3 distinct grams")
    val bcast = Pipeline.decontaminate(deconTrain, deconBench, "doc_id", "text", n = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val shuffled = Pipeline.decontaminate(deconTrain, deconBench, "doc_id", "text",
        n = 3, broadcastBench = false)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(bcast === shuffled, "broadcast and shuffled joins must agree")
  }

  test("decontaminated keeps exactly the unflagged training docs") {
    val clean = Pipeline.decontaminated(deconTrain, deconBench, "doc_id", "text", n = 3)
      .collect().map(_.getLong(0)).toSet
    assert(clean === Set(11L))
  }

  test("packSequences shards are independent: adding a shard changes nothing else") {
    val base = Pipeline.packSequences(docs, "doc_id", "text", "shard", 6)
      .collect().map(r => (r.getLong(0), r.getLong(3), r.getBoolean(4))).toSet
    val more = docs.union(Seq((9L, "k l m", "en", "s9")).toDF(docs.columns: _*))
    val out = Pipeline.packSequences(more, "doc_id", "text", "shard", 6)
      .filter(col("shard") =!= "s9")
      .collect().map(r => (r.getLong(0), r.getLong(3), r.getBoolean(4))).toSet
    assert(out === base)
  }

  test("chunk covers every token with stride windows; final chunk may be short") {
    val d = Seq((1L, (1 to 10).map(i => s"t$i").mkString(" "))).toDF("doc_id", "text")
    // 10 tokens, chunk 4, stride 3 -> starts 0,3,6 and final short start 9? no:
    // nChunks = 1 + ceil((10-4)/3) = 1 + 2 = 3 -> starts 0, 3, 6 (covers t7..t10)
    val out = Pipeline.chunk(d, "doc_id", "text", 4, 3, withText = true)
      .orderBy("chunk_id").collect()
    assert(out.map(_.getLong(1)).toSeq === Seq(0L, 1L, 2L))
    assert(out.map(_.getLong(2)).toSeq === Seq(0L, 3L, 6L))
    assert(out.map(_.getLong(3)).toSeq === Seq(4L, 4L, 4L))
    assert(out.last.getString(5) === "t7 t8 t9 t10")
  }

  test("chunk edge cases: short doc = one chunk, empty doc = no chunks") {
    val d = Seq((1L, "a b"), (2L, ""), (3L, "   ")).toDF("doc_id", "text")
    val out = Pipeline.chunk(d, "doc_id", "text", 4, 3, withText = true).collect()
    assert(out.length === 1)
    assert(out.head.getLong(0) === 1L && out.head.getLong(3) === 2L)
    assert(out.head.getString(5) === "a b")
  }

  test("chunk: trailing tokens force one extra chunk (ceil, not floor)") {
    // 11 tokens, chunk 4, stride 3: nChunks = 1 + ceil(7/3) = 4; last covers t10 t11
    val d = Seq((1L, (1 to 11).map(i => s"t$i").mkString(" "))).toDF("doc_id", "text")
    val out = Pipeline.chunk(d, "doc_id", "text", 4, 3, withText = true)
      .orderBy("chunk_id").collect()
    assert(out.length === 4)
    assert(out.last.getLong(2) === 9L && out.last.getLong(3) === 2L)
    assert(out.last.getString(5) === "t10 t11")
  }

  // DSIR fixture: "wiki" docs share a vocabulary disjoint from "web" docs,
  // so the importance ratio separates them cleanly.
  private val dsirDocs = Seq(
    (0L, "alpha beta gamma delta alpha beta", "wiki"),
    (1L, "beta gamma delta alpha gamma", "wiki"),
    (2L, "spam click buy now spam click", "web"),
    (3L, "click buy spam now now buy", "web"),
    (4L, "alpha beta gamma delta", "web"), // web doc with wiki vocabulary
    (5L, "", "web")                        // empty doc still gets a weight
  ).toDF("doc_id", "text", "source")

  test("importanceWeights separates target-vocabulary docs and is partition-invariant") {
    val target = dsirDocs.filter($"source" === "wiki")
    val w = Pipeline.importanceWeights(dsirDocs, target, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(w.size === 6, "every document, empty included, gets a weight")
    // wiki-vocabulary docs (0, 1, and the wiki-flavored web doc 4) must
    // outscore the pure web docs (2, 3)
    Seq(0L, 1L, 4L).foreach(i => Seq(2L, 3L).foreach(j =>
      assert(w(i) > w(j), s"doc $i ($w(i)) should outscore doc $j (${w(j)})")))
    val w2 = Pipeline.importanceWeights(dsirDocs.repartition(7), target.repartition(3),
      "doc_id", "text").collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(w === w2, "weights are a pure function of the data, not its partitioning")
  }

  test("importanceWeights: the native tick-sum probe == the explode+join " +
    "plan, bit-for-bit (same ticks, exact integer sum, one /1e6)") {
    val target = dsirDocs.filter($"source" === "wiki")
    val ns = Seq(1, 2); val buckets = 512; val alpha = 1.0
    // explicit explode+join replica of the fallback scoring probe, fed by
    // the identical flagged-union count table
    val dg = dsirDocs.select($"doc_id",
      explode(Pipeline.gramBuckets($"text", ns, buckets)).as("_b"))
    val counts = dg.select($"_b", lit(0).as("_t"))
      .unionAll(target.select(
        explode(Pipeline.gramBuckets($"text", ns, buckets)).as("_b"),
        lit(1).as("_t")))
      .groupBy("_b").agg(
        count(when($"_t" === 0, 1)).as("_cr"),
        count(when($"_t" === 1, 1)).as("_ct"))
    val wAll = org.apache.spark.sql.expressions.Window.partitionBy(lit(0))
    val aB = alpha * buckets
    val ratio = counts
      .withColumn("_tr", sum("_cr").over(wAll))
      .withColumn("_tt", sum("_ct").over(wAll))
      .select($"_b",
        floor((log(($"_ct" + alpha) / ($"_tt" + aB))
          - log(($"_cr" + alpha) / ($"_tr" + aB))) * 1e6 + 0.5).as("_lri"))
    val replica = dg.join(broadcast(ratio), "_b")
      .groupBy("doc_id").agg((sum("_lri") / 1e6).as("weight"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val native = Pipeline.importanceWeights(dsirDocs, target, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(native === replica)
  }

  test("resampleTopK: k >= n keeps everything; selection is deterministic") {
    val target = dsirDocs.filter($"source" === "wiki")
    val w = Pipeline.importanceWeights(dsirDocs, target, "doc_id", "text")
    val all = Pipeline.resampleTopK(w, "doc_id", k = 100, seed = 5L)
      .collect().map(r => (r.getLong(0), r.getDouble(2)))
    assert(all.length === 6)
    assert(all.map(_._2).toSeq === all.map(_._2).sorted(Ordering[Double].reverse),
      "output arrives in key order")
    val top2a = Pipeline.resampleTopK(w, "doc_id", k = 2, seed = 5L)
      .collect().map(_.getLong(0)).toSet
    val top2b = Pipeline.resampleTopK(
      Pipeline.importanceWeights(dsirDocs.repartition(5), target, "doc_id", "text"),
      "doc_id", k = 2, seed = 5L).collect().map(_.getLong(0)).toSet
    assert(top2a === top2b, "Gumbel keys are pure (id, seed) functions")
  }

  test("decontaminateFuzzy flags near-dup eval leaks the exact n-gram check misses") {
    val benchText = "the quick brown fox jumps over the lazy dog near the river bank today"
    val train = Seq(
      // light paraphrase drift: exact word-4-gram decon sees few shared
      // grams, but the 5-char shingle sets stay highly similar
      (1L, "the quick brown fox jumps over the lazy dog near the river bank today!"),
      (2L, benchText), // verbatim leak -> jaccard 1.0
      (3L, "completely unrelated content about cooking pasta with fresh tomatoes and basil")
    ).toDF("doc_id", "text")
    val bench = Seq((100L, benchText)).toDF("doc_id", "text")
    val flags = Pipeline.decontaminateFuzzy(train, bench, "doc_id", "text",
        threshold = 0.6)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(flags.keySet === Set(1L, 2L), s"expected docs 1 and 2 flagged, got $flags")
    assert(flags(2L)._2 === 1.0, "a verbatim leak re-ranks to jaccard 1.0")
    assert(flags(1L)._1 === 1L && flags(1L)._2 >= 0.6 && flags(1L)._2 < 1.0)
    // the shuffled-join escape hatch selects the identical flag set
    val shuffled = Pipeline.decontaminateFuzzy(train, bench, "doc_id", "text",
        threshold = 0.6, broadcastBench = false)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(shuffled === flags)
  }

  test("resampleThreshold selects exactly resampleTopK's set at every k, even under stress") {
    val target = dsirDocs.filter($"source" === "wiki")
    val w = Pipeline.importanceWeights(dsirDocs, target, "doc_id", "text")
    for (k <- Seq(1, 3, 6, 16)) { // interior, exact-n, and k > n
      val top = Pipeline.resampleTopK(w, "doc_id", k, seed = 5L)
        .orderBy($"g_key".desc, $"doc_id").collect().toSeq
      val thr = Pipeline.resampleThreshold(w, "doc_id", k, seed = 5L)
        .orderBy($"g_key".desc, $"doc_id").collect().toSeq
      assert(thr === top, s"threshold selection diverged from top-k at k=$k")
    }
    // resolution=1: every key lands in one boundary cell — the window
    // path alone must still reproduce the exact top-k
    val coarse = Pipeline.resampleThreshold(w, "doc_id", 3, seed = 5L, resolution = 1)
      .orderBy($"g_key".desc, $"doc_id").collect().toSeq
    val exact = Pipeline.resampleTopK(w, "doc_id", 3, seed = 5L)
      .orderBy($"g_key".desc, $"doc_id").collect().toSeq
    assert(coarse === exact)
    // constant weights: selection is pure Gumbel order, keys id-distinct
    val flat = dsirDocs.select($"doc_id", lit(1.0).as("weight"))
    val ft = Pipeline.resampleTopK(flat, "doc_id", 2, seed = 9L)
      .collect().map(_.getLong(0)).toSet
    val fh = Pipeline.resampleThreshold(flat, "doc_id", 2, seed = 9L)
      .collect().map(_.getLong(0)).toSet
    assert(ft === fh)
  }

  test("cleanCorpus: every funnel stage drops its offender, PII redacts in the output") {
    // long English filler pushing quality over the bar
    val good = ("the quick brown fox jumps over the lazy dog and then " +
      "walks to the house of his friend where they talk about the weather " +
      "for a while and it is all very pleasant in the end you know") // ~200 chars, en
    val d = Seq(
      (1L, good),                                     // survives
      (2L, good),                                     // exact dup of 1 -> dropped (min id wins)
      (3L, "it was a bright cold day in april and the clocks were striking " +
        "thirteen while he slipped quickly through the glass doors of victory " +
        "mansions though not quickly enough to prevent a swirl of gritty dust " +
        "from entering along with him"),              // en, good quality, distinct
      (4L, "der hund und die katze sind in dem haus und sie ist bei der " +
        "arbeit mit den anderen und das ist auch ein sehr langer text der " +
        "hier noch viel weiter geht und geht"),       // de -> dropped by langId
      (5L, "a b" * 3),                                // short/low quality -> dropped
      (6L, ("spam " * 40) + "the of and to in is it") // repetition cap -> dropped
    ).toDF("doc_id", "text")
    // bench set shares doc 3's text verbatim (and nothing of doc 1's)
    // -> decon drops doc 3 only
    val bench = Seq((100L, "it was a bright cold day in april and the " +
      "clocks were striking thirteen")).toDF("doc_id", "text")
    val out = Pipeline.cleanCorpus(d, bench, "doc_id", "text",
      lang = "en", minQuality = 0.6, maxTopWordFrac = 0.2, deconN = 4)
      .collect().map(_.getLong(0)).toSet
    assert(out === Set(1L), s"expected only doc 1 to survive, got $out")

    // PII redaction reaches the fingerprint: same text ± an email must
    // fingerprint identically after redaction... with placeholder, so two
    // docs differing only in the concrete email redact to equal fingerprints
    val p1 = good + " contact alice@example.com now"
    val p2 = good + " contact bob.smith@other.org now"
    val fps = Pipeline.cleanCorpus(
      Seq((7L, p1), (8L, p2)).toDF("doc_id", "text"),
      bench.limit(0), "doc_id", "text", deconN = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(4)).toMap
    assert(fps.keySet === Set(7L, 8L))
    assert(fps(7L) === fps(8L),
      "different emails must redact to the same <EMAIL> fingerprint")
  }

  test("cleanCorpus(lineClean = true) == manual line-clean composed ahead of the funnel") {
    val good = "the quick brown fox jumps over the lazy dog and then " +
      "walks to the house of his friend where they talk about the weather " +
      "for a while and it is all very pleasant in the end you know."
    val pages = Seq(
      (1L, s"Menu Home About\n$good\nClick here!"),         // nav+stub lines drop
      (2L, s"$good\nPlease enable JavaScript to proceed."), // js line drops
      (3L, s"$good\nlorem ipsum dolor sit."),               // doc flag -> drops
      (4L, s"$good\nvar x = { y }"),                        // brace flag -> drops
    ).toDF("doc_id", "text")
    val bench = pages.limit(0)
    val composed = Pipeline.cleanCorpus(pages, bench, "doc_id", "text",
      deconN = 4, lineClean = true).orderBy("doc_id").collect().toSeq
    val manual = {
      val c4 = TextAnalysis.c4LineCols(col("text")).toMap
      val cleaned = pages.filter(!c4("drop_doc"))
        .select(col("doc_id"), c4("clean_text").as("text"))
      Pipeline.cleanCorpus(cleaned, bench, "doc_id", "text", deconN = 4)
        .orderBy("doc_id").collect().toSeq
    }
    assert(composed === manual)
    // docs 1 and 2 converge to the SAME surviving line -> exact dedup
    // keeps doc 1 only; flagged docs 3-4 never reach the funnel
    assert(composed.map(_.getLong(0)) === Seq(1L))
  }

  test("sampleToMixture: quota fractions, zero-share strata drop, determinism") {
    // huge budget -> every in-share stratum keeps everything; "de" (no
    // share) drops entirely
    val all = Pipeline.sampleToMixture(docs, "doc_id", "lang",
      Map("en" -> 0.5, "es" -> 0.5), totalN = 1000L, seed = 3L)
      .collect().map(_.getLong(0)).toSet
    assert(all === Set(0L, 1L, 2L, 3L), "in-share strata keep all; de drops")
    // zero budget share -> stratum drops even when listed
    val none = Pipeline.sampleToMixture(docs, "doc_id", "lang",
      Map("en" -> 0.0), totalN = 1000L, seed = 3L).count()
    assert(none === 0L)
    val a = Pipeline.sampleToMixture(docs, "doc_id", "lang",
      Map("en" -> 0.7, "es" -> 0.3), totalN = 4L, seed = 9L)
      .collect().map(_.getLong(0)).toSet
    val b = Pipeline.sampleToMixture(docs.repartition(7), "doc_id", "lang",
      Map("en" -> 0.7, "es" -> 0.3), totalN = 4L, seed = 9L)
      .collect().map(_.getLong(0)).toSet
    assert(a === b, "partitioning must not change the sample")
  }

  test("sampleExactK: exactly min(k, |stratum|) per stratum; ranks nest; partitioning-independent") {
    val docs = ((1 to 40).map(i => (i.toLong, "en")) ++
      (41 to 45).map(i => (i.toLong, "es"))).toDF("doc_id", "lang")
    val s10 = Pipeline.sampleExactK(docs, "doc_id", "lang", 10, seed = 3L)
      .collect().map(r => (r.getString(1), r.getLong(0), r.getLong(2)))
    assert(s10.count(_._1 == "en") === 10)
    assert(s10.count(_._1 == "es") === 5)           // whole small stratum
    // rank <= j IS the exact-j sample (stable sub-sampling)
    val s4 = Pipeline.sampleExactK(docs, "doc_id", "lang", 4, seed = 3L)
      .collect().map(r => (r.getString(1), r.getLong(0))).toSet
    assert(s4 === s10.filter(_._3 <= 4).map(t => (t._1, t._2)).toSet)
    // deterministic across partitionings; different seed -> different draw
    val rep = Pipeline.sampleExactK(docs.repartition(7), "doc_id", "lang", 10, 3L)
      .collect().map(r => (r.getString(1), r.getLong(0), r.getLong(2)))
    assert(rep.toSet === s10.toSet)
    val other = Pipeline.sampleExactK(docs, "doc_id", "lang", 10, seed = 4L)
      .collect().map(r => (r.getString(1), r.getLong(0), r.getLong(2)))
    assert(other.toSet !== s10.toSet)
  }
}
