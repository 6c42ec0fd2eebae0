package graft.functions

import org.apache.spark.sql.SparkSession

/** Per-session availability probe for the [[graft.GraftExtensions]]
  * expressions. Operators that prefer the codegen'd `graft_dot` /
  * `graft_fingerprint` call sites use this to fall back to their HOF
  * twins in sessions that did not set
  * `spark.sql.extensions=graft.GraftExtensions` (e.g. a driver-provided
  * smoke session) instead of failing analysis with an
  * unresolved-function error.
  *
  * The probe is one catalog lookup per session, memoized in a weak map so
  * stopped sessions do not pin driver memory. Column construction happens
  * on the driver with an active session; with no active session at all we
  * answer `false` — the HOF fallback works everywhere, the native path is
  * only an optimization.
  */
object Native {
  private val known = new java.util.WeakHashMap[SparkSession, java.lang.Boolean]()

  def registered: Boolean =
    SparkSession.getActiveSession.exists { s =>
      known.synchronized {
        var v = known.get(s)
        if (v == null) {
          v = java.lang.Boolean.valueOf(s.catalog.functionExists("graft_dot"))
          known.put(s, v)
        }
        v.booleanValue()
      }
    }
}
