package graft

/** In-process side-channel from query entries to the bench harness
  * (VERDICT r14 task #4): the m37/m41 incremental maintainers are
  * superlinear per decade because their INPUT (the minhash pair graph
  * over replicated testdata) densifies superlinearly by construction —
  * a fact that lived in BENCH_SCALE prose while the hunt script judged
  * raw walls. The gate entries record the path of the pair list they
  * just materialized (a map put — nanoseconds inside the measured
  * window); Bench drains it AFTER the window closes and prices the
  * input's density (edge/wedge counts) into the artifact row, so
  * regression checks can normalize by the work actually presented.
  *
  * Deliberately dumb: a concurrent map of name → path, drained by
  * whoever runs the registry. Verify populates it too and never drains
  * — two string entries per run, harmless. */
object Telemetry {
  private val paths = new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** Record where a gate staged the input whose density should be
    * priced into its bench row. */
  def recordPath(query: String, path: String): Unit = paths.put(query, path)

  /** Remove and return the recorded path for one query, if any. */
  def drainPath(query: String): Option[String] = Option(paths.remove(query))
}
