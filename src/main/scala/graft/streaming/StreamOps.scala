package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
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

  /** Stream a transformed signal stream INTO an Opset store: append-mode
    * parquet sink readable by [[graft.core.Opset.load]], with
    * exactly-once file commits via the checkpoint. Returns the started
    * query; await/stop is the caller's choice (the default
    * `Trigger.AvailableNow` drains the backlog and stops — the
    * batch-refresh pattern of a large-scale ingest job).
    */
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
