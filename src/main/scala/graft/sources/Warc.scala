package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** WARC/WET record extraction — the step AHEAD of HTML extraction in a
  * real web-corpus funnel: crawls ship as WARC files (ISO 28500, public
  * format), each a concatenation of `WARC/1.0` records (version line,
  * header block, blank line, payload, blank line). A WET conversion
  * carries extracted text payloads; a WAT/WARC response carries HTML —
  * either way the pipeline's first transform is "split the blob into
  * records, read the headers, take the payload", which is exactly what
  * this does, as pure column algebra (split + fixed-arithmetic
  * substring — codegen'd, zero shuffle at any corpus size; files
  * parallelize by blob row, records by the explode).
  *
  * Pinned grammar (the simplification is documented, not hidden):
  * records are delimited by the version line `WARC/1.0\n` at segment
  * starts — the payload must not contain that line at a line start
  * (true for WET text; a binary-payload WARC needs the Content-Length
  * framing a streaming byte parser honors). Headers end at the first
  * blank line; the payload is everything after it, minus the trailing
  * record-separator blank line. `Content-Length` is VERIFIED, not
  * trusted: `ok = declared == length(payload)`, so truncated or
  * corrupted records surface as `ok = false` rows instead of silently
  * shifting every later record — degrade, never throw (the
  * [[graft.llm.Multimodal]] convention).
  */
object Warc {

  /** Parse a WARC/WET blob into `array<struct<uri, ok, payload>>`, in
    * record order. Malformed segments (no header/payload blank line)
    * yield `ok = false` with an empty payload.
    */
  def records(blob: Column): Column = {
    val segs = filter(split(blob, "WARC/1\\.0\\n"), s => length(s) > 0)
    transform(segs, seg => {
      val headers = substring_index(seg, "\n\n", 1)
      // payload = seg minus headers, minus the "\n\n" separator, minus
      // the trailing record-separator "\n\n" (fixed arithmetic — no
      // regex backtracking over payload bytes)
      val hasBody = length(seg) >= length(headers) + 4
      val payload = when(hasBody,
        substring(seg, length(headers) + 3, length(seg) - length(headers) - 4))
        .otherwise(lit(""))
      val uri = regexp_extract(headers, "WARC-Target-URI: ([^\\n]*)", 1)
      val declared = regexp_extract(headers, "Content-Length: ([0-9]+)", 1)
      val ok = hasBody && declared =!= "" &&
        declared.cast("long") === length(payload).cast("long")
      struct(uri.as("uri"), ok.as("ok"), payload.as("payload"))
    })
  }

  /** Explode a table of WARC blobs into one row per record:
    * `(blobCol's siblings…, uri, ok, payload)` — compose
    * [[graft.llm.Html.extractText]] on `payload` for the full
    * crawl→text head of the cleaning funnel.
    */
  def extractRecords(df: DataFrame, blobCol: String): DataFrame =
    df.withColumn("_rec", explode(records(col(blobCol))))
      .select(df.columns.filter(_ != blobCol).map(col) ++
        Seq(col("_rec.uri").as("uri"), col("_rec.ok").as("ok"),
          col("_rec.payload").as("payload")): _*)

  /** Build one WARC/WET conversion record — the generator half for
    * specs/oracles (content is a pure function of the arguments, the
    * [[graft.llm.Multimodal.pcmWav]] pattern). `declaredLength`
    * defaults to the true payload length; pass a wrong one to
    * synthesize a corrupt record.
    */
  def record(uri: Column, payload: Column,
             declaredLength: Option[Column] = None): Column =
    concat(
      lit("WARC/1.0\nWARC-Type: conversion\nWARC-Target-URI: "), uri,
      lit("\nContent-Length: "),
      declaredLength.getOrElse(length(payload)).cast("string"),
      lit("\n\n"), payload, lit("\n\n"))
}
