package graft

import org.apache.spark.sql.SparkSession

/** Bounded, evicting session memo — the lifecycle layer under the
  * engine's memoized relations (PLANS.md "session-memoized
  * relations"). Each instance wraps one relation family's cache and
  * adds what the raw ConcurrentHashMap hooks lacked (VERDICT r7 #2):
  *
  *  - **LRU bound**: at most `maxEntries` parameterizations stay
  *    persisted; inserting past the cap evicts the least-recently-used
  *    entry and `unpersist`s every Dataset in its value, so a
  *    long-lived session churning parameters cannot pin unbounded
  *    executor storage. Eviction only un-caches — a consumer still
  *    holding the evicted DataFrame recomputes from lineage, it never
  *    breaks (the standard persist contract).
  *  - **Lock-hygienic builds**: the value is held in a lazily-forced
  *    cell, so the multi-job Spark build runs OUTSIDE the map's bin
  *    lock (ADVICE r7: concurrent queries on colliding bins blocked
  *    for seconds otherwise). Concurrent callers of the SAME key
  *    serialize on the cell, distinct keys never contend. A failed
  *    build removes the cell so the next caller retries.
  *  - **Session scoping**: [[Graft.clearSession]] walks the global
  *    registry and drops (unpersisting) every entry whose key
  *    references the closing session — the explicit end-of-session
  *    hook for notebooks and long-lived services.
  */
final class SessionMemo[K <: AnyRef, V](val name: String,
                                        maxEntries: Int = SessionMemo.DefaultMax) {
  require(maxEntries >= 1, "maxEntries must be >= 1")

  private final class Cell(build: () => V) {
    @volatile var built = false
    lazy val value: V = { val v = build(); built = true; v }
  }

  private val cells = new java.util.concurrent.ConcurrentHashMap[K, Cell]()
  // access-ordered LRU index; its monitor only ever guards map ops
  private val order = new java.util.LinkedHashMap[K, K](16, 0.75f, true)
  SessionMemo.register(this)

  def getOrBuild(key: K)(build: => V): V = {
    val cell = cells.computeIfAbsent(key, _ => new Cell(() => build))
    val v =
      try cell.value // Spark work happens here, outside the bin lock
      catch {
        case t: Throwable =>
          cells.remove(key, cell)
          order.synchronized { order.remove(key) }
          throw t
      }
    val evicted = order.synchronized {
      order.put(key, key)
      val out = List.newBuilder[K]
      val it = order.keySet().iterator()
      while (order.size() > maxEntries && it.hasNext) {
        val k = it.next()
        if (k != key) { out += k; it.remove() }
      }
      out.result()
    }
    evicted.foreach(drop)
    v
  }

  private def drop(k: K): Unit =
    Option(cells.remove(k)).foreach { c =>
      if (c.built) SessionMemo.unpersistAll(c.value)
    }

  /** Drop (and unpersist) every entry whose key references `spark`. */
  def clearSession(spark: SparkSession): Unit = {
    val doomed = List.newBuilder[K]
    cells.keySet().forEach { k =>
      if (SessionMemo.mentions(k, spark)) doomed += k
    }
    val ks = doomed.result()
    order.synchronized { ks.foreach(order.remove) }
    ks.foreach(drop)
  }

  /** Live entry count (test hook for the eviction contract). */
  def size: Int = cells.size()
}

object SessionMemo {
  /** Default parameterization bound per relation family — far above
    * anything Bench/Verify use, small enough that even a session
    * churning ad-hoc parameters holds a bounded persisted set. */
  val DefaultMax = 32

  private val registry =
    new java.util.concurrent.CopyOnWriteArrayList[SessionMemo[_ <: AnyRef, _]]()

  private def register(m: SessionMemo[_ <: AnyRef, _]): Unit = registry.add(m)

  private[graft] def clearAll(spark: SparkSession): Unit =
    registry.forEach(_.clearSession(spark))

  /** Does the (tuple) key reference this session? */
  private def mentions(key: Any, spark: SparkSession): Boolean = key match {
    case s: SparkSession => s eq spark
    case p: Product      => p.productIterator.exists(mentions(_, spark))
    case _               => false
  }

  /** Unpersist every Dataset inside a cached value (values are
    * DataFrames or small tuples of DataFrames). */
  private def unpersistAll(v: Any): Unit = v match {
    case ds: org.apache.spark.sql.Dataset[_] => ds.unpersist(false)
    case p: Product                          => p.productIterator.foreach(unpersistAll)
    case _                                   => ()
  }
}

/** Public lifecycle hooks of the engine. */
object Graft {
  /** Unpersist and forget every session-memoized relation built under
    * `spark` — call before discarding a session (or between tenants of
    * a shared long-lived one). Safe anytime: memoized relations are
    * deterministic, so the next consumer just rebuilds. */
  def clearSession(spark: SparkSession): Unit = SessionMemo.clearAll(spark)
}
