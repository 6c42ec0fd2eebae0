package graft.sources

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Migration of a real tabata HDF5 Opset store (reference opset.py:52-74:
  * one pandas DataFrame per record, saved via `pd.HDFStore` in fixed
  * format) into graft's long-format layout — the one-time on-ramp for an
  * existing tabata user: convert each store once, then every graft
  * operator runs on the parquet.
  *
  * pandas fixed-format layout per record group (what [[Hdf5]] decodes):
  * {{{
  *   /<record>/axis0            string[ncols]   column names, frame order
  *   /<record>/axis1            int64|float64[nrows]   the row index
  *   /<record>/block<i>_items   string[k]       columns stored in block i
  *   /<record>/block<i>_values  float64|int64[k, nrows]  C-order values
  * }}}
  *
  * Output schema: `record: string, t: long (1-based sample position —
  * the [[graft.core.Opset]] contract), index: double (the original
  * pandas index value, typically the tabata time axis), <signal columns
  * as named in the store, e.g. "ALT [ft]">: double`. Records missing a
  * column (stores with heterogeneous frames) carry nulls there.
  *
  * Scale shape: one .h5 store is a single unsplittable file decoded on
  * the driver — correct for a MIGRATION tool (tabata stores are
  * plotting-sized by construction; a 100 TB corpus does not live in one
  * .h5). A fleet of stores converts in parallel by running [[convert]]
  * per file (driver loop or one task each); after conversion everything
  * is ordinary distributed parquet.
  */
object Hdf5Opset {

  /** Java-serializable carrier for the session's Hadoop configuration —
    * `loadMany`'s executor tasks must resolve paths with the SAME
    * filesystem settings as the driver (S3/ABFS credentials, defaultFS,
    * custom FS impls); a bare `new Configuration()` in the closure would
    * silently drop them all. Hadoop's `Configuration` is not
    * Serializable itself, so this wraps its own write/readFields.
    * (Spark has an identical internal helper, but it is private[spark].)
    */
  private final class SerializableHadoopConf(
      @transient var value: org.apache.hadoop.conf.Configuration) extends Serializable {
    private def writeObject(out: java.io.ObjectOutputStream): Unit = {
      out.defaultWriteObject()
      value.write(out)
    }
    private def readObject(in: java.io.ObjectInputStream): Unit = {
      in.defaultReadObject()
      value = new org.apache.hadoop.conf.Configuration(false)
      value.readFields(in)
    }
  }

  /** Decoded store: record name → (column names in frame order, index
    * values, column → values). Pure JVM, no Spark — separable for tests.
    */
  private[sources] def decode(root: Hdf5.H5Group):
      Seq[(String, Seq[String], Array[Double], Map[String, Array[Double]])] = {
    root.groups.toSeq.sortBy(_._1).map { case (record, g) =>
      val axis0 = g.datasets.get("axis0") match {
        case Some(Hdf5.H5Dataset(_, Hdf5.Str(names))) => names.toSeq
        case _ => throw new IllegalArgumentException(
          s"Hdf5Opset: record '$record' has no string axis0 — not a pandas fixed-format store?")
      }
      def asDoubles(d: Hdf5.H5Data): Array[Double] = d match {
        case Hdf5.F64(v) => v
        case Hdf5.I64(v) => v.map(_.toDouble)
        case Hdf5.Str(_) => throw new IllegalArgumentException(
          s"Hdf5Opset: record '$record' has a string-valued block — signals must be numeric")
      }
      val blocks = g.datasets.keys.filter(_.matches("block\\d+_values")).toSeq.sorted
      val colValues = blocks.flatMap { valuesName =>
        val itemsName = valuesName.replace("_values", "_items")
        val items = g.datasets.get(itemsName) match {
          case Some(Hdf5.H5Dataset(_, Hdf5.Str(names))) => names.toSeq
          case _ => throw new IllegalArgumentException(
            s"Hdf5Opset: record '$record' has $valuesName but no string $itemsName")
        }
        val ds = g.datasets(valuesName)
        require(ds.dims.length == 2 && ds.dims(0) == items.size,
          s"Hdf5Opset: record '$record' $valuesName dims ${ds.dims.mkString("x")} " +
            s"do not match ${items.size} items")
        val nRows = ds.dims(1).toInt
        val flat = asDoubles(ds.data)
        items.zipWithIndex.map { case (name, i) =>
          name -> java.util.Arrays.copyOfRange(flat, i * nRows, (i + 1) * nRows)
        }
      }.toMap
      val nRows = colValues.headOption.map(_._2.length).getOrElse(0)
      val index = g.datasets.get("axis1").map(d => asDoubles(d.data))
        .getOrElse(Array.tabulate(nRows)(_.toDouble)) // RangeIndex fallback
      require(index.length == nRows || nRows == 0,
        s"Hdf5Opset: record '$record' index length ${index.length} != $nRows rows")
      require(colValues.values.forall(_.length == nRows),
        s"Hdf5Opset: record '$record' has blocks of differing row counts")
      (record, axis0, index, colValues)
    }
  }

  /** Load a tabata .h5 store as the long-format DataFrame (see the object
    * Scaladoc for the schema). Column order: first record's frame order,
    * then any further columns in first-seen record order.
    */
  def load(spark: SparkSession, path: String): DataFrame = {
    val records = decode(Hdf5.readFile(path))
    val signalCols: Seq[String] = records.flatMap { case (_, axis0, _, cols) =>
      axis0.filter(cols.contains)
    }.distinct
    val schema = StructType(
      StructField("record", StringType, nullable = false) +:
        StructField("t", LongType, nullable = false) +:
        StructField("index", DoubleType, nullable = false) +:
        signalCols.map(c => StructField(c, DoubleType, nullable = true)))
    val rows = records.flatMap { case (record, _, index, cols) =>
      (0 until index.length).map { r =>
        Row.fromSeq(record +: (r + 1).toLong +: index(r) +:
          signalCols.map(c => cols.get(c).map(v => v(r): java.lang.Double).orNull))
      }
    }
    spark.createDataFrame(
      new java.util.ArrayList[Row](java.util.Arrays.asList(rows: _*)), schema)
  }

  /** One-shot migration: read the .h5 store, land the long format as
    * parquet readable by [[graft.core.Opset.load]]. `numFiles > 0`
    * repartitions on `record` first (records stay co-located — every
    * per-record operator's shuffle key).
    */
  def convert(spark: SparkSession, h5Path: String, parquetPath: String,
              numFiles: Int = 0): Unit = {
    val df = load(spark, h5Path)
    val out = if (numFiles > 0)
      df.repartition(numFiles, org.apache.spark.sql.functions.col("record"))
    else df
    out.write.mode("overwrite").parquet(parquetPath)
  }

  /** FLEET migration: decode many stores in parallel, ONE TASK PER FILE,
    * on the executors — the shape that turns "a directory of tabata .h5
    * stores" into one long-format DataFrame in a single distributed job.
    * Each store is still decoded whole in its task (the format is
    * unsplittable), but a thousand stores migrate with a thousand-way
    * parallelism instead of a driver loop.
    *
    * `signalCols` pins the unified schema up front (schema inference
    * would force a driver-side pre-pass over every file — the exact
    * serialization this operator exists to avoid); a store carrying a
    * column outside the list FAILS its task loudly unless
    * `ignoreExtraColumns`. Records from different stores can share
    * names, so the output is keyed `(store, record)` — `store` is the
    * file's base name without extension.
    */
  def loadMany(spark: SparkSession, paths: Seq[String], signalCols: Seq[String],
               ignoreExtraColumns: Boolean = false): DataFrame = {
    require(paths.nonEmpty, "Hdf5Opset.loadMany: no paths")
    val schema = StructType(
      StructField("store", StringType, nullable = false) +:
        StructField("record", StringType, nullable = false) +:
        StructField("t", LongType, nullable = false) +:
        StructField("index", DoubleType, nullable = false) +:
        signalCols.map(c => StructField(c, DoubleType, nullable = true)))
    val cols = signalCols // avoid capturing `this`-adjacent state in the closure
    val strict = !ignoreExtraColumns
    // ship the DRIVER's Hadoop configuration to the tasks: credentials,
    // defaultFS and custom FS impls live there, and a fresh
    // Configuration() on the executor would misresolve or fail any
    // non-local path (see SerializableHadoopConf)
    val hadoopConf = spark.sparkContext.broadcast(
      new SerializableHadoopConf(spark.sparkContext.hadoopConfiguration))
    import spark.implicits._
    val rows = spark.createDataset(paths)
      .repartition(paths.size) // one task per store — the parallelism unit
      .flatMap { p =>
        val hp = new org.apache.hadoop.fs.Path(p)
        val fs = hp.getFileSystem(hadoopConf.value.value)
        val in = fs.open(hp)
        val bytes = try {
          val buf = new java.io.ByteArrayOutputStream()
          org.apache.hadoop.io.IOUtils.copyBytes(in, buf, 1 << 20, false)
          buf.toByteArray
        } finally in.close()
        val store = hp.getName.stripSuffix(".h5")
        decode(Hdf5.read(bytes)).iterator.flatMap { case (record, axis0, index, colVals) =>
          if (strict) {
            val extra = axis0.filter(colVals.contains).filterNot(cols.contains)
            require(extra.isEmpty,
              s"Hdf5Opset.loadMany: store '$store' record '$record' carries " +
                s"column(s) ${extra.mkString(", ")} outside signalCols — pass " +
                "ignoreExtraColumns=true to drop them")
          }
          (0 until index.length).iterator.map { r =>
            Row.fromSeq(store +: record +: (r + 1).toLong +: index(r) +:
              cols.map(c => colVals.get(c).map(v => v(r): java.lang.Double).orNull))
          }
        }
      }(org.apache.spark.sql.Encoders.row(schema))
    rows.toDF()
  }
}
