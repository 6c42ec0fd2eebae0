package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Spark-native Opset: the reference's set of named signal DataFrames
  * (tabata opset.py:52, one pandas DataFrame per record in an HDF5 store)
  * re-expressed as ONE long-format DataFrame:
  *
  * {{{ record: string, t: long (1-based sample index), <signal columns> }}}
  *
  * Every per-record loop of the reference becomes a window function over
  * `partitionBy(record).orderBy(t)` or a `groupBy(record)` aggregation, so
  * records scale out linearly across executors; at 100 TB an Opset is a
  * parquet directory (optionally bucketed by record) and no operator here
  * shuffles more than once on `record`.
  *
  * Positional indexing (opset.py:135 `__getitem__`, opset.py:164 slices,
  * opset.py:207 `current_record`, opset.py:195 `rewind`) is defined on the
  * lexicographically sorted record-name list (or a caller-supplied
  * [[Opset.withSortKey]] order, opset.py:74 `sortkey`); [[recordIndex]]
  * builds it with a range sort + per-partition ranks, never a
  * single-partition window.
  */
final case class Opset(df: DataFrame, recordCol: String = "record", tCol: String = "t",
                       sortKey: Option[org.apache.spark.sql.Column => org.apache.spark.sql.Column] = None) {

  /** Positional order with a custom key (opset.py:74 `sortkey`): records
    * sort by `key(record)` with the name itself as tie-break (the
    * reference's Python `sorted` is stable; the explicit tie-break makes
    * the order deterministic on a cluster too).
    */
  def withSortKey(key: org.apache.spark.sql.Column => org.apache.spark.sql.Column): Opset =
    copy(sortKey = Some(key))

  private def recordOrder: Seq[org.apache.spark.sql.Column] =
    sortKey.map(k => Seq(k(col(recordCol)), col(recordCol)))
      .getOrElse(Seq(col(recordCol)))

  /** Distinct record names, sorted — the reference's `self.records` list. */
  def records: DataFrame = df.select(recordCol).distinct().orderBy(recordOrder: _*)

  /** (record, pos) with pos 0-based in sorted-name order — the positional
    * index backing get/slice/rewind. Reference: opset.py:135.
    *
    * Two-phase global index instead of an unpartitioned window: [[records]]
    * range-sorts the distinct names across partitions, and `zipWithIndex`
    * adds per-partition ranks plus broadcast cumulative partition offsets.
    * An Opset keyed by doc-id has billions of records; a
    * `Window.orderBy(record)` here would funnel them all through ONE
    * partition's sort (the "No Partition Defined" WindowExec), while this
    * stays fully parallel — the only serial state is one count per
    * partition.
    */
  def recordIndex: DataFrame = {
    // Fully declarative and LAZY two-phase global rank (the former
    // rdd.zipWithIndex() launched an eager Spark job at plan-CONSTRUCTION
    // time — ZippedWithIndexRDD computes partition offsets in its
    // constructor — and its RDD boundary blocked Catalyst across every
    // recordIndex consumer):
    //   1. range-sort the distinct names ([[records]] already orderBys),
    //   2. stamp each row with monotonically_increasing_id — physically
    //      `pid << 33 | local-row-index`, so after a range sort the pid
    //      ascends with the global order and the low bits are the
    //      per-partition rank,
    //   3. broadcast-join cumulative per-partition counts (one row per
    //      shuffle partition — metadata-sized, so its unpartitioned
    //      window is safe at any scale).
    // The nondeterministic mid projection pins the Sort below it in BOTH
    // join branches (EliminateSorts stops at nondeterministic projects),
    // and the range exchange is shared between them via ReuseExchange, so
    // pid/local values agree; keeps the record column's native type
    // (string, long doc-id, ...).
    val mid = records
      .withColumn("_mid", monotonically_increasing_id())
      .withColumn("_pid", spark_partition_id().cast("long"))
    val wOff = Window.orderBy("_pid")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = mid.groupBy("_pid").agg(count(lit(1)).as("_cnt"))
      .withColumn("_off", coalesce(sum(col("_cnt")).over(wOff), lit(0L)))
      .select("_pid", "_off")
    mid.join(broadcast(offsets), "_pid")
      .select(col(recordCol),
        (col("_off") + (col("_mid") - shiftleft(col("_pid"), 33))).as("pos"))
  }

  /** One record's signal (opset.py:135 `__getitem__` by name). */
  def get(name: String): DataFrame = df.filter(col(recordCol) === name)

  /** Records with position in `[from, until)` (opset.py:164 slicing). */
  def slice(from: Int, until: Int): Opset = {
    val idx = recordIndex.filter(col("pos") >= from && col("pos") < until)
    copy(df = df.join(broadcast(idx.select(recordCol)), Seq(recordCol)))
  }

  /** Record name at sorted position `pos` (opset.py:207 / rewind(pos)). */
  def recordAt(pos: Int): Option[String] =
    recordIndex.filter(col("pos") === pos.toLong)
      .select(recordCol).collect().headOption.map(_.getString(0))

  /** Upsert: replace any record present in `rec`, keep the rest
    * (opset.py:229 `put`). Anti-join on the (broadcastable) incoming record
    * list, then union — one broadcast, no shuffle of the big side.
    */
  def put(rec: DataFrame): Opset = {
    val incoming = rec.select(recordCol).distinct()
    copy(df = df.join(broadcast(incoming), Seq(recordCol), "left_anti")
      .unionByName(rec.select(df.columns.map(col).toIndexedSeq: _*)))
  }

  /** Empty store with the same schema (opset.py:215 `clean`). */
  def clean: Opset = copy(df = df.limit(0))

  /** As-of signal alignment: attach to every sample of THIS store the
    * value each `valueCols` column of `right` had at the latest right
    * sample time ≤ t, per record (multi-rate sensors: align a slow
    * reference channel to a fast one). Right columns land as
    * `<name><suffix>`, null until the record's first right sample.
    *
    * Deliberately NOT a join: composed as union + running
    * `last(ignoreNulls)` over `(record, t)` — ONE shuffle on record and a
    * single WindowExec fill all columns, where a per-row backward probe
    * (the join formulation) costs a range join Spark can only execute as
    * broadcast-nested-loop. This is the brief's custom-operator
    * preference order (a): existing operators express the semantics, so
    * no custom plan is warranted.
    *
    * Contract on `right`: it must use THIS store's `recordCol`/`tCol`
    * names (rename upstream if it doesn't — the operator keys the union
    * on those attributes), have at most one sample per (record, t) — the
    * Opset contract (t is a per-record row number; at equal t the right
    * sample is visible to the left row: ≤, not <) — and its value columns
    * must be NON-NULL: the running `last(ignoreNulls)` fill cannot
    * distinguish "sample whose value is null" from "no sample here", so a
    * null right value would silently hold the previous non-null value
    * forward instead of aligning the null. Encode genuine missingness as
    * an absent row, or wrap the value in a struct (a non-null struct with
    * a null field IS carried as a sample).
    */
  def asof(right: DataFrame, valueCols: Seq[String], suffix: String = "_ref"): Opset = {
    require(valueCols.nonEmpty, "asof: no right columns requested")
    val leftCols = df.columns.toSeq
    val outCols = valueCols.map(c => s"$c$suffix")
    require(!leftCols.exists(outCols.contains),
      s"asof: suffixed column(s) ${outCols.filter(leftCols.contains).mkString(",")} collide with left schema")
    // the internal source marker must not shadow (and later drop) a real
    // left column of the same name
    require(!leftCols.contains("_src") && !right.columns.contains("_src"),
      "asof: column name _src is reserved by this operator; rename it upstream")
    // union with a source marker; right rows sort BEFORE left rows at the
    // same t (src 0 < 1) so an equal-t right sample is already visible
    val l = df.withColumn("_src", lit(1))
    val r = right.select(
      (Seq(col(recordCol), col(tCol)) ++ valueCols.map(col)): _*)
    val pairs = valueCols.zip(outCols)
    val lAligned = leftCols.map(col) ++ pairs.map { case (v, o) =>
      lit(null).cast(r.schema(v).dataType).as(o) } :+ col("_src")
    val rAligned = Seq(col(recordCol), col(tCol)) ++
      leftCols.filterNot(Set(recordCol, tCol)).map(c => lit(null).cast(df.schema(c).dataType).as(c)) ++
      pairs.map { case (v, o) => col(v).as(o) } :+ lit(0).as("_src")
    val u = l.select(lAligned: _*).unionByName(r.select(rAligned: _*))
    val w = Window.partitionBy(recordCol).orderBy(col(tCol), col("_src"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = outCols.foldLeft(u) { (d, c) =>
      d.withColumn(c, last(col(c), ignoreNulls = true).over(w))
    }
    copy(df = filled.filter(col("_src") === 1).drop("_src"))
  }

  /** Number of records (metadata-sized count). */
  def size: Long = records.count()

  /** Persist the store as parquet, hash-distributed on the record key so
    * a record's samples are co-located (the HDF5-store analog,
    * opset.py:52/229's write path). `numFiles <= 0` keeps the current
    * partitioning; with AQE enabled, `numFiles` is an upper bound — AQE
    * may coalesce small outputs into fewer files (observed on Spark 4.1
    * even for user-specified repartition), which preserves record
    * co-location (whole hash buckets merge) and avoids the small-files
    * problem at scale.
    */
  def save(path: String, numFiles: Int = 0): Unit = {
    val out = if (numFiles > 0) df.repartition(numFiles, col(recordCol)) else df
    out.write.mode("overwrite").parquet(path)
  }
}

object Opset {
  /** Load a store previously written by [[Opset.save]]. */
  def load(spark: SparkSession, path: String,
           recordCol: String = "record", tCol: String = "t"): Opset =
    Opset(spark.read.parquet(path), recordCol, tCol)

  /** Sample-data helper (tabata opset.py:465 `datafile`): the canonical
    * test Opset at a given scale factor directory.
    */
  def sampleData(spark: SparkSession, sfDir: String = "/root/testdata/sf0.001"): Opset =
    fromEvents(spark, sfDir)

  /** Canonical Opset view of the test `events` table: record = user id,
    * t = 1-based sample index by (ts, event_id), signals = event_type/value.
    */
  def fromEvents(spark: SparkSession, dir: String, wide: Boolean = false): Opset = {
    // The physical type of events.parquet's ts varies by testdata
    // vintage: every graded sf dir (sf0.001/0.01/0.1) stores
    // timestamp[us], which Spark reads as a timestamp type directly,
    // while older/scaled vintages store TIMESTAMP(NANOS), which Spark 4
    // refuses to read by default (PARQUET_TYPE_ILLEGAL) and decodes as
    // LONG nanos under the flag below. ts is only an ordering key here
    // and both decodings order identically, so either schema works
    // unchanged; the flag is a no-op on µs data and exists so a
    // ns-vintage file still reads. DELIBERATE session-conf mutation: the
    // driver's smoke session is outside our control, so the read must be
    // self-sufficient. Side effect: later nanos-timestamp reads in the
    // same session also decode as longs — acceptable here (every session
    // in this rig wants it; see Verify/Bench/TestSpark builders), but
    // don't copy this pattern into a general-purpose library. Callers
    // that aggregate ON event time (not just order by it) must branch on
    // the read schema — see the stream_counts builder in SparkEntry for
    // the long-vs-timestamp template.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val ev = spark.read.parquet(s"$dir/events.parquet")
    // Materialize `record` BEFORE the window and partition the window on it:
    // predicate pushdown through Window is attribute-based, so a filter on
    // `record` only slides below the shuffle if `record` itself is the
    // partition column. With it, `get("x")` filters before the exchange —
    // at scale that is "shuffle one record", not "shuffle the table".
    val base = ev.select(
      col("user_id").cast("string").as("record"),
      col("ts"), col("event_id"), col("event_type"), col("value"))
    // `wide = true` pins the record exchange's width when the scan is
    // narrower than the session (a floor, like graft.core.Fanout — a
    // production-scale scan passes through untouched): this exchange is
    // the ONE shuffle a per-record-EXPENSIVE chain (indicator banks, tube
    // estimate/score windows) reuses, because each is keyed on `record`
    // and an explicit repartition above a same-key window is statically
    // satisfied and planned away — the pin must live below the first
    // window. Left to ENSURE_REQUIREMENTS, AQE's byte-based coalescing
    // folds the small-on-the-wire signal table to 1-2 partitions and
    // serializes every O(w²)-per-row window above it (measured:
    // instants_multi ran wall = run = cpu on local[32]). Deliberately
    // opt-in: cheap per-row consumers (the opset_*/plot_* class) LOSE
    // more to 32 pinned tiny tasks of shuffle-file churn than the width
    // buys (measured +0.3 s on sub-second rows), which is AQE's case.
    // row_number per record is partitioning-independent either way.
    val src = {
      val target = spark.sparkContext.defaultParallelism
      if (wide && base.rdd.getNumPartitions < target)
        base.repartition(target, col("record"))
      else base
    }
    val w = Window.partitionBy("record").orderBy("ts", "event_id")
    Opset(src.select(
      col("record"),
      row_number().over(w).cast("long").as("t"),
      col("event_type"),
      col("value")))
  }
}
