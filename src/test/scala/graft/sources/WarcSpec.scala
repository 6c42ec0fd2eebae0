package graft.sources

import org.apache.spark.sql.functions._
import graft.SparkSpec

class WarcSpec extends SparkSpec {
  import spark.implicits._

  private def mk(uri: String, payload: String, declared: Option[Int] = None): String =
    s"WARC/1.0\nWARC-Type: conversion\nWARC-Target-URI: $uri\n" +
      s"Content-Length: ${declared.getOrElse(payload.length)}\n\n$payload\n\n"

  test("extractRecords: a multi-record blob splits into exact (uri, ok, payload) rows") {
    val blob = mk("https://a/1", "first record text") +
      mk("https://a/2", "second, with\nan embedded newline") +
      mk("https://a/3", "third")
    val out = Warc.extractRecords(Seq(Tuple1(blob)).toDF("blob"), "blob")
      .select("uri", "ok", "payload").collect()
      .map(r => (r.getString(0), r.getBoolean(1), r.getString(2)))
    assert(out.toSeq === Seq(
      ("https://a/1", true, "first record text"),
      ("https://a/2", true, "second, with\nan embedded newline"),
      ("https://a/3", true, "third")))
  }

  test("Content-Length is verified, not trusted: a wrong declaration flags ok=false " +
    "but still recovers the payload (framing is the magic line)") {
    val blob = mk("https://a/1", "good") + mk("https://a/2", "bad", declared = Some(99))
    val out = Warc.extractRecords(Seq(Tuple1(blob)).toDF("blob"), "blob")
      .select("uri", "ok", "payload").collect()
      .map(r => (r.getString(0), r.getBoolean(1), r.getString(2)))
    assert(out.toSeq === Seq(("https://a/1", true, "good"), ("https://a/2", false, "bad")))
  }

  test("malformed segments degrade: missing blank line or headers yield ok=false, " +
    "never an exception") {
    val blob = "WARC/1.0\nWARC-Target-URI: u\nContent-Length: 5" // no blank line, no body
    val out = Warc.extractRecords(Seq(Tuple1(blob)).toDF("blob"), "blob").collect()
    assert(out.length === 1 && !out.head.getAs[Boolean]("ok"))
  }

  test("funnel composition: WARC payload carrying HTML flows into Html.extractText") {
    val html = "<html><head><title>t</title></head><body>" +
      "<nav><a href='/'>Home</a> <a href='/x'>More</a></nav>" +
      "<p>actual page content words here</p></body></html>"
    val blob = mk("https://a/1", html)
    val out = Warc.extractRecords(Seq(Tuple1(blob)).toDF("blob"), "blob")
      .select(graft.llm.Html.extractText(col("payload")).as("t"))
      .collect().head.getString(0)
    assert(out === "actual page content words here")
  }
}
