package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** Pins ColumnMeta to the reference semantics (tabata plots.py:46-97). */
class ColumnMetaSpec extends AnyFunSuite {

  test("nameunit splits NAME [unit] labels") {
    assert(ColumnMeta.nameunit("ALT [m]") === (("ALT ", "m")))
    assert(ColumnMeta.nameunit("N1 [%]") === (("N1 ", "%")))
    assert(ColumnMeta.nameunit("TIME") === (("TIME", "-")))
    // unit bracket never closed: everything after '[' minus last char
    assert(ColumnMeta.nameunit("X [m") === (("X ", "")))
  }

  test("byunits groups by unit preserving first-seen order") {
    val cols = Seq("ALT [m]", "TEMP [C]", "EGT [C]", "N1 [%]", "TIME")
    assert(ColumnMeta.byunits(cols) === Seq(
      "m" -> Seq("ALT [m]"),
      "C" -> Seq("TEMP [C]", "EGT [C]"),
      "%" -> Seq("N1 [%]"),
      "-" -> Seq("TIME"),
    ))
  }

  test("getColname substring resolution with positional default") {
    val cols = Seq("ALT [m]", "TEMP [C]", "EGT [C]")
    assert(ColumnMeta.getColname(cols, Some("EGT")) === Some("EGT [C]"))
    assert(ColumnMeta.getColname(cols, Some("T")) === Some("ALT [m]")) // first match
    assert(ColumnMeta.getColname(cols, None) === Some("ALT [m]"))     // default 0
    assert(ColumnMeta.getColname(cols, Some("nope")) === Some("ALT [m]"))
    assert(ColumnMeta.getColname(cols, Some("nope"), None) === None)
    assert(ColumnMeta.getColname(cols, Some(""), Some(1)) === Some("TEMP [C]"))
  }
}
