package graft.queries

/**
 * Per-query phase timings for the scale family (round 11, VERDICT #3):
 * the *_big gates conflate one-time index BUILD (train + assign +
 * list shuffle + cache fill) with the serving-path SEARCH — at the
 * 1000x rung the build dominated and masked the number a deployment
 * actually cares about. Query functions record named phases here;
 * Bench drains the registry into a "phases" map in BENCH_QUERIES.json
 * (stderr + file only — the driver's stdout contract is unchanged).
 */
object PhaseTimer {
  private val phases = scala.collection.concurrent.TrieMap.empty[String, Double]

  /** run `f`, recording its wall seconds under `query.phase` */
  def time[T](query: String, phase: String)(f: => T): T = {
    val t0 = System.nanoTime()
    val r = f
    phases.put(s"$query.$phase", (System.nanoTime() - t0) / 1e9)
    r
  }

  def snapshot: Map[String, Double] = phases.toMap
  def clear(): Unit = phases.clear()
}
