package graft.core

/** Column-metadata utilities for `"NAME [unit]"`-style signal columns.
  *
  * Semantics match the reference helpers in tabata `plots.py:46` (`nameunit`),
  * `plots.py:54` (`byunits`) and `plots.py:68` (`get_colname`), re-expressed
  * as plain Scala (driver-side, no Spark dependency — column names are tiny).
  */
object ColumnMeta {

  /** Split a column label into (name, unit). A label without a separator has
    * unit `"-"`. E.g. `nameunit("ALT [m]")  == ("ALT ", "m")`.
    * Reference: plots.py:46.
    */
  def nameunit(col: String, sep: Char = '['): (String, String) = {
    val i = col.indexOf(sep)
    if (i == -1) (col, "-")
    else (col.substring(0, i), col.substring(i + 1, math.max(i + 1, col.length - 1)))
  }

  /** Group column labels by physical unit; preserves first-seen unit order
    * and per-unit column order. Reference: plots.py:54.
    */
  def byunits(cols: Seq[String], sep: Char = '['): Seq[(String, Seq[String])] = {
    val order = scala.collection.mutable.LinkedHashMap.empty[String, Vector[String]]
    cols.foreach { c =>
      val (_, u) = nameunit(c, sep)
      order(u) = order.getOrElse(u, Vector.empty) :+ c
    }
    order.toSeq
  }

  /** Resolve a (possibly partial) variable name to a full column label: the
    * first column containing `variable` as a substring, else the default
    * (`Some(columns(i))` for an int default, `None` if defaultNone).
    * Reference: plots.py:68.
    */
  def getColname(
      columns: Seq[String],
      variable: Option[String],
      default: Option[Int] = Some(0)): Option[String] = {
    val dflt = default.flatMap(i => columns.lift(i))
    variable.filter(_.nonEmpty) match {
      case None => dflt
      case Some(v) => columns.find(_.contains(v)).orElse(dflt)
    }
  }
}
