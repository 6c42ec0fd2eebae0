package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured-Streaming operators over the engine's data model: the same
  * transformations the batch operators declare, re-expressed for
  * `readStream` sources.
  *
  *  - Stateless operators (text analysis, plot preps, splits against a
  *    static instant table) need NO streaming variant — the batch column
  *    expressions apply unchanged to a streaming DataFrame; see
  *    StreamOpsSpec for the proof.
  *  - Aggregations become watermarked windowed aggregations.
  *  - Exact dedup becomes `dropDuplicatesWithinWatermark`, bounding state
  *    by event time.
  *  - The per-record running detector state (the streaming analog of the
  *    instant pipeline's argmax stand-in) is a
  *    `flatMapGroupsWithState` keyed by record.
  */
object StreamOps {

  /** Watermarked tumbling-window event statistics per event type —
    * the streaming form of the events-table aggregations. State is
    * bounded by the watermark; partial aggregation applies per batch.
    */
  def windowedEventCounts(events: DataFrame, eventTime: String = "ts",
                          watermark: String = "10 seconds",
                          win: String = "10 seconds"): DataFrame =
    events.withWatermark(eventTime, watermark)
      .groupBy(window(col(eventTime), win), col("event_type"))
      .agg(count(lit(1)).as("n"), avg(col("value")).as("avg_value"))

  /** Streaming exact dedup: keeps the first row per key seen within the
    * watermark horizon. State expires with the watermark — bounded memory
    * on an unbounded stream, unlike a naive dropDuplicates.
    */
  def streamingDedup(docs: DataFrame, keyCols: Seq[String], eventTime: String,
                     watermark: String = "10 seconds"): DataFrame =
    docs.withWatermark(eventTime, watermark)
      .dropDuplicatesWithinWatermark(keyCols)

  /** One sample of a record's signal. */
  final case class SigEvent(record: String, t: Long, value: Double)

  /** Running detector state: the first-occurrence argmax so far. */
  final case class ArgmaxState(bestT: Long, bestV: Double)

  /** Per-record running argmax (first occurrence wins on ties, matching
    * the batch `Splits.argmaxInstants`): emits the record's current
    * 0-based instant after every update. Keyed state scales with the
    * number of live records, not the number of samples.
    */
  def runningArgmax(ds: Dataset[SigEvent]): Dataset[(String, Long, Double)] = {
    import ds.sparkSession.implicits._
    ds.groupByKey(_.record)
      .flatMapGroupsWithState[ArgmaxState, (String, Long, Double)](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        case (rec: String, it: Iterator[SigEvent], state: GroupState[ArgmaxState]) =>
          var best = state.getOption.getOrElse(ArgmaxState(Long.MaxValue, Double.NegativeInfinity))
          it.foreach { e =>
            if (e.value > best.bestV || (e.value == best.bestV && e.t < best.bestT))
              best = ArgmaxState(e.t, e.value)
          }
          state.update(best)
          Iterator((rec, best.bestT - 1, best.bestV)) // 0-based instant
      }
  }

  /** One banded-MinHash bucket claim: `docId` hashed one of its signature
    * bands to `bucket`, which is owned by `ownerId` — the first document
    * seen in that bucket within the state horizon.
    */
  final case class BucketClaim(docId: Long, bucket: Long, ownerId: Long)

  /** Internal per-bucket row after banding. `ts` stays a TIMESTAMP all the
    * way into the stateful operator: the event-time-timeout checker
    * requires the watermark-tagged attribute in the operator's input, so
    * converting it to a long upstream would reject the query.
    */
  final case class BucketRow(bucket: Long, docId: Long, ts: java.sql.Timestamp)

  /** Per-bucket ownership state. */
  final case class OwnerState(ownerId: Long, ownerTsMs: Long, lastSeenMs: Long)

  /** Streaming NEAR-dup detection — the ingestion form of the batch
    * MinHash-LSH dedup (`Dedup.minhashLsh`): shingle → k minhashes →
    * banded bucket keys are the SAME stateless column expressions the
    * batch operator declares (so stream and batch agree on what "near"
    * means), and the cross-document part becomes per-bucket first-owner
    * state instead of a self-join. A document that lands in a bucket
    * already owned by an earlier document is a candidate near-dup of that
    * owner; [[nearDupVerdicts]] folds the per-band claims into one
    * verdict per document.
    *
    * Scale shape: state is keyed by band bucket (bounded by distinct
    * buckets seen within the horizon, not by stream length) and expires
    * via event-time timeout `horizonMs` past the last sighting — the same
    * bounded-lookback contract as `dropDuplicatesWithinWatermark`. No
    * pairwise work anywhere: a bucket stores ONE owner id, so a
    * boilerplate mega-bucket costs O(1) state and O(rows) claims.
    *
    * Banding matches the batch operator (`numHashes` minhashes in
    * `bands` bands); candidate semantics are band-collision, i.e. the
    * batch operator's candidate stage WITHOUT the exact-Jaccard re-rank —
    * a stream cannot revisit the earlier document's shingle set without
    * storing it. Callers needing exact confirmation join claims against
    * a doc store in `foreachBatch`. Bucket keys are 64-bit hashes of the
    * band rows; a hash collision can produce a false candidate at ~2^-64
    * per pair — the LSH banding itself is already probabilistic.
    */
  def streamingNearDupClaims(docs: DataFrame, idCol: String, textCol: String,
                             eventTime: String, watermark: String = "10 seconds",
                             shingleLen: Int = 5, numHashes: Int = 16, bands: Int = 4,
                             horizonMs: Long = 60000L): Dataset[BucketClaim] = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val spark = docs.sparkSession
    import spark.implicits._
    val rowsPerBand = numHashes / bands
    val base = docs.withWatermark(eventTime, watermark)
      // Degenerate docs must be dropped BEFORE banding. A null text
      // shingles to [null] (not an empty array!), so its signature is
      // all-null; xxhash64 skips null inputs, so every null-text doc
      // would band to the SAME per-band bucket and get claimed a
      // near-dup of the first one seen. Empty text shingles to the
      // single hash of "", so all empty docs collide too. The batch
      // path's exact-Jaccard re-rank rejects these candidates; this
      // stream is documented re-rank-free, and "empty equals empty" is
      // not a near-dup verdict anyone wants driving data deletion.
      .filter(col(textCol).isNotNull && length(col(textCol)) > 0)
      .select(col(idCol).cast("long").as("docId"),
        col(eventTime).as("ts"), // alias keeps the watermark metadata tag
        graft.llm.Dedup.distinctNgramHashes(col(textCol), shingleLen).as("_sh"))
      .filter(col("_sh").isNotNull && size(col("_sh")) > 0)
    val sigs = graft.llm.Dedup.minhashSignature(base, "_sh", numHashes)
      // belt-and-braces: any row that still produced a null leading sig
      // would bucket on band index alone — never let one reach banding
      .filter(col("sig_0").isNotNull)
    val bucketKeys = (0 until bands).map { b =>
      xxhash64(lit(b) +: (0 until rowsPerBand).map(i => col(s"sig_${b * rowsPerBand + i}")): _*)
    }
    sigs.select(explode(array(bucketKeys: _*)).as("bucket"), col("docId"), col("ts"))
      .as[BucketRow]
      .groupByKey(_.bucket)
      .flatMapGroupsWithState[OwnerState, BucketClaim](
        OutputMode.Update(), GroupStateTimeout.EventTimeTimeout()) {
        case (bucket: Long, it: Iterator[BucketRow], state: GroupState[OwnerState]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            // sort the micro-batch so the owner choice (earliest ts, then
            // smallest id) is deterministic regardless of task order
            val batch = it.toVector.sortBy(r => (r.ts.getTime, r.docId))
            val st0 = state.getOption.getOrElse(
              OwnerState(batch.head.docId, batch.head.ts.getTime, batch.head.ts.getTime))
            val owner = st0.ownerId
            val lastSeen = math.max(st0.lastSeenMs, batch.last.ts.getTime)
            state.update(st0.copy(lastSeenMs = lastSeen))
            // expire horizonMs after the LAST sighting (sliding lookback);
            // the timeout must sit above the current watermark
            state.setTimeoutTimestamp(
              math.max(lastSeen + horizonMs, state.getCurrentWatermarkMs() + 1))
            batch.iterator.map(r => BucketClaim(r.docId, bucket, owner))
          }
      }
  }

  /** Fold [[streamingNearDupClaims]] output into one verdict per document
    * (batch aggregation over the landed claims, or inside `foreachBatch`):
    * `is_dup` iff any of the document's buckets was owned by an EARLIER
    * document; `dup_of` = the smallest such owner id. Aggregation-shaped
    * (groupBy, map-side partials) — no window, no self-join.
    */
  def nearDupVerdicts(claims: DataFrame): DataFrame =
    claims.groupBy(col("docId").as("doc_id"))
      .agg(min(when(col("ownerId") =!= col("docId"), col("ownerId"))).as("dup_of"))
      .withColumn("is_dup", col("dup_of").isNotNull)

  /** Per-key SESSION-window aggregation — the streaming twin of
    * [[graft.events.EventOps.sessionize]], expressed through Spark's
    * native `session_window` (gap-merged windows: an event extends its
    * session to `t + gap`; a later event merges while strictly inside
    * that horizon, so the batch twin's break condition is `diff ≥ gap`).
    * Returns one row per (key, session_window) with `n_events` — the
    * window struct carries start and `last event + gap` end.
    *
    * State shape: session state is per OPEN session per key, closed and
    * evicted once the watermark passes the session end — bounded by key
    * rate × gap, the property a batch lag/running-sum formulation
    * cannot offer a stream. Spark restricts session-window aggregation
    * to APPEND output: a session emits exactly once, when the watermark
    * closes it — so a bounded replay needs a watermark push (e.g. a
    * sentinel event past the data's horizon) to flush the tail sessions
    * through the final no-data micro-batch.
    */
  def sessionWindowCounts(events: DataFrame, eventTime: String, keyCol: String,
                          gap: String, watermarkDelay: String): DataFrame =
    events
      .withWatermark(eventTime, watermarkDelay)
      .groupBy(col(keyCol), session_window(col(eventTime), gap).as("session"))
      .agg(count(lit(1)).as("n_events"))

  /** Watermarked stream-stream interval join — the attribution shape:
    * each `effects` row (e.g. a click) pairs with every `causes` row
    * (e.g. a view) of the same key whose event time falls in
    * `[effect − lookback, effect]`. Both inputs must be STREAMING
    * DataFrames with distinct column names (callers project/rename
    * first); the result is an append-mode inner join.
    *
    * State bound: the time-range predicate plus the two watermarks give
    * Spark a provable eviction horizon — a cause row is dropped from
    * state once the effect-side watermark passes `causeTime + lookback`,
    * so state is O(key-rate × (lookback + watermark delay)), never
    * unbounded. That horizon is the whole design: an un-ranged
    * stream-stream join would have to keep both sides forever. The join
    * itself hash-partitions both sides on the key — one co-shuffle, the
    * same exchange a batch join of the two streams would pay.
    */
  def intervalJoin(effects: DataFrame, causes: DataFrame,
                   joinKeys: Column, effectTime: String, causeTime: String,
                   lookback: String, watermarkDelay: String): DataFrame = {
    val e = effects.withWatermark(effectTime, watermarkDelay)
    val c = causes.withWatermark(causeTime, watermarkDelay)
    e.join(c, joinKeys &&
      col(causeTime) <= col(effectTime) &&
      col(causeTime) >= col(effectTime) - expr(s"INTERVAL $lookback"))
  }

  /** Land an UPDATE-mode stream (e.g. [[streamingNearDupClaims]], whose
    * stateful operator emits updates) into an append-only parquet
    * directory via `foreachBatch`: the file sink proper only accepts
    * Append mode, so each micro-batch's updates are appended as a batch
    * write instead. Exactly-once per micro-batch comes from the
    * checkpoint + idempotent-by-batchId is NOT provided here — a replayed
    * batch would append twice; callers needing it dedup downstream (the
    * claim fold [[nearDupVerdicts]] is idempotent to duplicate claims,
    * which is why this pairing is safe).
    */
  def landUpdates(df: DataFrame, path: String, checkpoint: String,
                  trigger: org.apache.spark.sql.streaming.Trigger =
                    org.apache.spark.sql.streaming.Trigger.AvailableNow())
      : org.apache.spark.sql.streaming.StreamingQuery =
    df.writeStream
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], _: Long) =>
        batch.write.mode("append").parquet(path)
      }
      .option("checkpointLocation", checkpoint)
      .outputMode(OutputMode.Update())
      .trigger(trigger)
      .start()

  /** Stream a transformed signal stream INTO an Opset store: append-mode
    * parquet sink readable by [[graft.core.Opset.load]], with
    * exactly-once file commits via the checkpoint. Returns the started
    * query; await/stop is the caller's choice (the default
    * `Trigger.AvailableNow` drains the backlog and stops — the
    * batch-refresh pattern of a large-scale ingest job).
    */
  /** Continuous IVF index ingest — the STREAMING half of the index
    * maintenance story ([[graft.llm.Similarity.appendToIvfIndex]] is the
    * batch half): each arriving vector is assigned to its frozen coarse
    * cell by the SAME `bestCentroidCol` expression the batch index and
    * every probe use, and lands CELL-PARTITIONED, so
    * [[graft.llm.Similarity.ivfIndexTopK]]'s plan-time partition pruning
    * holds over a continuously growing index. Stateless by construction
    * (assignment is a pure projection against centroid literals): no
    * watermark, no state store, exactly-once into the directory via the
    * file-sink commit log. The cell-skew rebuild signal
    * ([[graft.llm.Similarity.ivfIndexCellStats]]) applies unchanged.
    */
  def streamingIvfAssign(vectors: DataFrame, vecCol: String,
                         cents: Array[Array[Double]],
                         path: String, checkpoint: String,
                         trigger: org.apache.spark.sql.streaming.Trigger =
                           org.apache.spark.sql.streaming.Trigger.AvailableNow())
      : org.apache.spark.sql.streaming.StreamingQuery =
    vectors.withColumn("cell",
        graft.llm.Similarity.bestCentroidCol(
          graft.llm.Similarity.asDouble(col(vecCol)), cents))
      .writeStream
      .format("parquet")
      .option("path", path)
      .option("checkpointLocation", checkpoint)
      .partitionBy("cell")
      .outputMode(OutputMode.Append())
      .trigger(trigger)
      .start()

  /** Streaming KMV quantile-sketch maintenance — the third streaming
    * sketch beside the HLL fold and the IVF ingest. Each micro-batch
    * lands its OWN bottom-k slice ([[graft.analysis.Sketches.kmvSketch]]
    * over just that batch) via `foreachBatch`; the global sketch at read
    * time is [[graft.analysis.Sketches.kmvMerge]] over the landed
    * slices. Exact by the composition property the batch merge row
    * proves (`sketch_kmv_merge`): bottom-k under the total (md5, id)
    * order composes over a disjoint partition of the rows, and a
    * replayed file stream partitions the rows disjointly by batch. NO
    * state store at all — the sketch property moved the state into the
    * landed artifact, ≤ k rows per (group, batch), and the read-time
    * fold re-truncates to k per group. Same caveat as kmvMerge: ids
    * must not repeat across batches (an id that re-arrives occupies two
    * sample slots); streams with replayed keys dedup upstream.
    *
    * The sink is EXACTLY-ONCE, not at-least-once: each micro-batch
    * writes `path/batch=<batchId>/` with overwrite, so a batch replayed
    * after a failure REPLACES its own slice instead of appending a
    * duplicate (a blind `mode("append")` would let one retried batch
    * occupy two sample slots per row and silently corrupt the fold).
    * Readers therefore see a `batch` partition column beside the sketch
    * columns — [[readSlices]] reads the directory and drops it.
    */
  def streamingKmv(rows: DataFrame, groupCols: Seq[String],
                   idCol: org.apache.spark.sql.Column,
                   valueCol: org.apache.spark.sql.Column,
                   k: Int, seed: Long, path: String, checkpoint: String,
                   trigger: org.apache.spark.sql.streaming.Trigger =
                     org.apache.spark.sql.streaming.Trigger.AvailableNow())
      : org.apache.spark.sql.streaming.StreamingQuery =
    rows.writeStream
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        graft.analysis.Sketches.kmvSketch(batch, groupCols, idCol, valueCol, k, seed)
          .write.mode("overwrite").parquet(s"$path/batch=$batchId")
      }
      .option("checkpointLocation", checkpoint)
      .outputMode(OutputMode.Append())
      .trigger(trigger)
      .start()

  /** Streaming exact top-k per key — the continuous-leaderboard twin of
    * [[graft.core.TopK.perKey]], by the same composition property as
    * [[streamingKmv]]: top-k under a TOTAL order composes over a
    * disjoint partition of the rows, so each micro-batch lands its OWN
    * ≤ k-per-key slice (rank dropped — a within-batch rank is
    * meaningless) and the read-time `TopK.perKey` fold over the landed
    * slices IS the global leaderboard, rank and all. ZERO state store;
    * landed state ≤ k rows per (key, batch). `ordering` must be a total
    * order (unique tiebreak) and ids must not repeat across batches —
    * the kmv caveat verbatim. Same exactly-once sink layout as
    * [[streamingKmv]]: `path/batch=<batchId>/` with overwrite, so a
    * retried batch replaces rather than duplicates its slice; read the
    * landed slices with [[readSlices]].
    */
  def streamingTopK(rows: DataFrame, keyCols: Seq[String],
                    ordering: Seq[org.apache.spark.sql.Column], k: Int,
                    path: String, checkpoint: String,
                    trigger: org.apache.spark.sql.streaming.Trigger =
                      org.apache.spark.sql.streaming.Trigger.AvailableNow())
      : org.apache.spark.sql.streaming.StreamingQuery =
    rows.writeStream
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        graft.core.TopK.perKey(batch, keyCols, ordering, k).drop("rank")
          .write.mode("overwrite").parquet(s"$path/batch=$batchId")
      }
      .option("checkpointLocation", checkpoint)
      .outputMode(OutputMode.Append())
      .trigger(trigger)
      .start()

  /** Streaming binned-quantile maintenance — the fourth streaming sketch
    * beside HLL/KMV/top-k, exploiting the property that made
    * [[graft.analysis.Stats.binnedQuantiles]]' count table the batch
    * plan device: per-(group, bin) counts are REGISTER-BOUNDED state
    * (≤ groups × nBins rows, ever — the stream's length never enters),
    * exactly like HLL registers. Bin bounds must be FIXED up front (a
    * reference sample, domain knowledge — a stream cannot take a second
    * pass over its own past to learn min/max): `bounds` is a STATIC
    * `(groupCols…, _mn, _mx)` table, stream-static-joined (broadcast)
    * onto the flow; bin assignment is the SAME pinned
    * [[graft.analysis.Stats.binIndex]] rule the batch operator uses, so
    * stream and batch agree bit-for-bit on what a bin is.
    *
    * Returns the update-mode streaming aggregation `(groupCols…, _bin,
    * _c)`. Land it with [[landUpdates]]; a count only GROWS across
    * emissions, so the read-back fold is `max(_c)` per (group, bin) —
    * the same monotone-register fold as the HLL row — and the final
    * quantiles are
    * [[graft.analysis.Stats.binnedQuantilesFromCounts]] over the folded
    * table with the same `bounds`: identical pinned estimator, identical
    * oracle as the batch `stats_quantiles_binned`.
    *
    * Values outside [_mn, _mx] clamp into the edge bins (the pinned rule
    * already floors/caps), so a drifting stream degrades to edge-mass
    * rather than wrong arithmetic; groups absent from `bounds` drop
    * (inner join) — the explicit contract that bounds ARE the quantile
    * domain.
    */
  def streamingBinCounts(rows: DataFrame, groupCols: Seq[String],
                         valueCol: Column, bounds: DataFrame,
                         nBins: Int): DataFrame = {
    require(nBins >= 2 && nBins <= 65536,
      "streamingBinCounts: nBins must be in [2, 65536]")
    val gs = groupCols.map(col)
    rows.select(gs :+ valueCol.cast("double").as("_v"): _*)
      .filter(col("_v").isNotNull)
      .join(broadcast(bounds), groupCols)
      .withColumn("_bin", graft.analysis.Stats.binIndex(nBins))
      .groupBy(gs :+ col("_bin"): _*)
      .agg(count(lit(1)).as("_c"))
  }

  /** Read the slices landed by [[streamingKmv]]/[[streamingTopK]] as one
    * DataFrame, dropping the `batch=<id>` partition column the
    * exactly-once layout adds — the input shape `kmvMerge`/`TopK.perKey`
    * fold back into the global answer.
    */
  def readSlices(spark: org.apache.spark.sql.SparkSession, path: String): DataFrame =
    spark.read.parquet(path).drop("batch")

  def writeOpsetStore(df: DataFrame, path: String, checkpoint: String,
                      trigger: org.apache.spark.sql.streaming.Trigger =
                        org.apache.spark.sql.streaming.Trigger.AvailableNow())
      : org.apache.spark.sql.streaming.StreamingQuery =
    df.writeStream
      .format("parquet")
      .option("path", path)
      .option("checkpointLocation", checkpoint)
      .outputMode(OutputMode.Append())
      .trigger(trigger)
      .start()
}
