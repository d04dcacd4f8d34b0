package graft.sink

import org.scalatest.funsuite.AnyFunSuite

/** The CachedHiveWriters-pattern pool (reference `CachedHiveWriters.scala:
  * 33-127`): getOrCreate/recycle reuse, timed expiry, close-all.
  */
class WriterPoolSpec extends AnyFunSuite {

  private class Res(val key: String) { var closed = false }

  test("recycle then getOrCreate reuses the instance") {
    val pool = new WriterPool[String, Res](k => new Res(k), _.closed = true)
    val r1 = pool.getOrCreate("k")
    pool.recycle("k", r1)
    assert(pool.getOrCreate("k") eq r1)
  }

  test("distinct keys do not share resources") {
    val pool = new WriterPool[String, Res](k => new Res(k), _.closed = true)
    val r1 = pool.getOrCreate("a")
    pool.recycle("a", r1)
    val r2 = pool.getOrCreate("b")
    assert(r2 ne r1)
    assert(r2.key === "b")
  }

  test("idle resources expire after the timeout (reference: 10 min sweep)") {
    var now = 0L
    val pool = new WriterPool[String, Res](
      k => new Res(k), _.closed = true, expireMillis = 1000L, clock = () => now)
    val r1 = pool.getOrCreate("k")
    pool.recycle("k", r1)
    now = 500L
    assert(pool.sweep() === 0)
    assert(pool.idleCount === 1)
    now = 1600L
    assert(pool.sweep() === 1)
    assert(r1.closed, "expired resource must be closed")
    assert(pool.idleCount === 0)
    // a fresh getOrCreate now creates anew
    assert(pool.getOrCreate("k") ne r1)
  }

  test("closeAll closes everything idle (reference shutdown hook behavior)") {
    val pool = new WriterPool[String, Res](k => new Res(k), _.closed = true)
    val rs = (1 to 5).map { i => val r = pool.getOrCreate(s"k$i"); pool.recycle(s"k$i", r); r }
    pool.closeAll()
    assert(rs.forall(_.closed))
    assert(pool.idleCount === 0)
  }
}
