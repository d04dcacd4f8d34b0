package graft.sink

import scala.collection.mutable

/** Executor-singleton resource pool — the reference's
  * `CachedHiveWriters.scala:33-127` pattern re-expressed generically:
  * a synchronized map of key → idle-resource queue with `getOrCreate` /
  * `recycle`, a timed sweep expiring resources idle longer than
  * `expireMillis` (reference: 10 minutes, `CachedHiveWriters.scala:35`), and
  * a JVM shutdown hook closing everything (`CachedHiveWriters.scala:46-55`).
  *
  * The graft sink's durability is epoch-scoped (files close at task commit),
  * so unlike the reference it does not keep OPEN output streams across
  * tasks; the pool instead amortizes expensive per-partition setup objects
  * (string builders / write buffers keyed by partition spec). The pattern —
  * not the pooled type — is the reference behavior being preserved.
  */
final class WriterPool[K, V](
    create: K => V,
    close: V => Unit,
    expireMillis: Long = 10 * 60 * 1000L,
    clock: () => Long = () => System.currentTimeMillis()) {

  private case class Entry(value: V, idleSince: Long)
  private val idle = mutable.HashMap.empty[K, mutable.Queue[Entry]]
  private var lastSweep = clock()

  def getOrCreate(key: K): V = synchronized {
    maybeSweep()
    idle.get(key).filter(_.nonEmpty) match {
      case Some(q) => q.dequeue().value
      case None => create(key)
    }
  }

  def recycle(key: K, value: V): Unit = synchronized {
    idle.getOrElseUpdate(key, mutable.Queue.empty).enqueue(Entry(value, clock()))
  }

  /** Close and drop every idle resource unused for `expireMillis`. */
  def sweep(): Int = synchronized {
    val cutoff = clock() - expireMillis
    var n = 0
    idle.values.foreach { q =>
      val (stale, fresh) = q.partition(_.idleSince < cutoff)
      q.clear(); q.enqueueAll(fresh)
      stale.foreach { e => close(e.value); n += 1 }
    }
    idle.filterInPlace((_, q) => q.nonEmpty)
    n
  }

  private def maybeSweep(): Unit =
    if (clock() - lastSweep >= expireMillis) { sweep(); lastSweep = clock() }

  def closeAll(): Unit = synchronized {
    idle.values.foreach(_.foreach(e => close(e.value)))
    idle.clear()
  }

  def idleCount: Int = synchronized(idle.values.map(_.size).sum)

  private val hook = new Thread(() => closeAll(), "graft-writer-pool-shutdown")
  Runtime.getRuntime.addShutdownHook(hook)
}
