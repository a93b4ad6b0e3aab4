package graft.trace

/** Records which query paid for each per-dataset memo build (PageRank /
  * betweenness / LPA / simhash-pair caches). The bench publishes this as
  * `memo_builds` in its JSON line so per-query timings are attributable:
  * a memoized query's cost depends on run order, and without this map a
  * regression in the memo build is invisible behind whichever query
  * happens to absorb it.
  */
object MemoLog {
  @volatile var currentQuery: String = ""
  private val builds = scala.collection.mutable.LinkedHashMap[String, String]()

  /** Called by a memo provider as it builds (not on cache hits). */
  def record(memo: String): Unit = synchronized {
    if (!builds.contains(memo)) builds(memo) = currentQuery
  }

  def snapshot: Map[String, String] = synchronized { builds.toMap }
}
