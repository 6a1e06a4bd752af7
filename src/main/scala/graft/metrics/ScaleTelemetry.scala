package graft.metrics

/** Operator-level scale telemetry side-channel: iterative operators
  * (pointer-jumping connected components, k-means) record how many rounds
  * they actually ran and how much data each round moved, and Bench attaches
  * the drained values to the gate that just executed. The point is
  * attribution at scale: when a 10× data step turns super-linear, the
  * round count says whether the algorithm (more CC rounds = deeper
  * near-dup chains) or the per-round cost (same rounds, bigger shuffles)
  * grew — without re-running anything under a profiler.
  *
  * Values are plain JSON fragments (numbers or arrays) keyed by metric
  * name; drain() returns-and-clears, so each bench rep sees only its own
  * run's values. Thread-safe; last-writer-wins per key is fine because a
  * gate invokes each instrumented operator at most once per rep.
  */
object ScaleTelemetry {
  private val data = new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** Record a metric; `jsonValue` must already be valid JSON (number,
    * string with quotes, or array).
    */
  def put(key: String, jsonValue: String): Unit = { data.put(key, jsonValue); () }

  def putNum(key: String, value: Long): Unit = put(key, value.toString)

  /** Snapshot and clear — the caller owns the window boundaries. */
  def drain(): Map[String, String] = {
    val snap = scala.jdk.CollectionConverters.MapHasAsScala(data).asScala.toMap
    data.clear()
    snap
  }
}
