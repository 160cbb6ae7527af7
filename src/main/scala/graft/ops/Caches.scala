package graft.ops

import org.apache.spark.sql.Dataset

/** Session-lifetime cache registry for shared query subtrees.
  *
  * The repo's subtree-reuse rule (README "100 TB design notes") is: a
  * non-iterative frame consumed by 2+ plan branches gets an EAGER
  * `persist()` — a lazy persist lets branches scheduled in the same job
  * wave race past the empty cache and each recompute the subtree
  * (measured ~2× on q118). The gap that left (round-4 ADVICE) was
  * cleanup: builders persist but cannot unpersist, because the frame
  * must stay cached until the CALLER materializes the query result, so
  * each invocation leaked cached blocks for the session lifetime and
  * relied on LRU eviction in long multi-query runs (Verify/Bench walk
  * 130+ queries in one session).
  *
  * `shared` centralizes the pattern: persist + eager fill + register.
  * The harnesses (Verify, Bench) call [[clear]] after each query's
  * result is fully written, releasing the blocks deterministically.
  * Single-query callers that never clear() are no worse off than the
  * old inline persist.
  */
object Caches {
  private val tracked = new java.util.concurrent.ConcurrentLinkedQueue[Dataset[_]]()

  /** Persist `ds` (MEMORY_AND_DISK), eagerly fill the cache with one
    * count() so same-wave branches all hit it, and register it for
    * harness-side [[clear]].
    */
  def shared[T](ds: Dataset[T]): Dataset[T] = {
    val cached = ds.persist()
    cached.count()
    tracked.add(cached)
    cached
  }

  /** Unpersist every tracked frame (non-blocking). Safe to call once the
    * query result that consumed them has been materialized.
    */
  def clear(): Unit = {
    var d = tracked.poll()
    while (d != null) { d.unpersist(blocking = false); d = tracked.poll() }
  }
}
