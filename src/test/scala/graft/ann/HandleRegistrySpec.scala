package graft.ann

import java.util.concurrent.{CountDownLatch, Executors, TimeUnit}
import java.util.concurrent.atomic.AtomicInteger

import org.scalatest.funsuite.AnyFunSuite

/** Pins the [[HandleRegistry]] contract behind IvfStore.open — the
  * r14/r15-ADVICE registry race: concurrent opens converge on one
  * live handle; dead entries are swept on any access. No Spark
  * needed — the registry is parametric in the liveness predicate. */
class HandleRegistrySpec extends AnyFunSuite {

  private final case class H(id: Int, alive: Boolean)

  test("two concurrent getOrCreate on a cold key yield one live handle") {
    val reg = new HandleRegistry[String, H](_.alive)
    val builds = new AtomicInteger(0)
    val nThreads = 8
    val ready = new CountDownLatch(nThreads)
    val go = new CountDownLatch(1)
    val pool = Executors.newFixedThreadPool(nThreads)
    try {
      val futures = (0 until nThreads).map { _ =>
        pool.submit(new java.util.concurrent.Callable[H] {
          def call(): H = {
            ready.countDown(); go.await()
            reg.getOrCreate("k", H(builds.incrementAndGet(), alive = true))
          }
        })
      }
      ready.await(10, TimeUnit.SECONDS)
      go.countDown()
      val results = futures.map(_.get(10, TimeUnit.SECONDS)).toSet
      // racing builders may each construct (losers discarded), but all
      // callers must converge on exactly ONE stored value
      assert(results.size == 1,
        s"concurrent opens returned ${results.size} distinct handles")
      assert(reg.size == 1)
      // a later open returns the same cached value without rebuilding
      val before = builds.get()
      assert(reg.getOrCreate("k", H(builds.incrementAndGet(), alive = true))
        == results.head)
      assert(builds.get() == before, "warm open must not rebuild")
    } finally pool.shutdownNow()
  }

  test("dead entries are swept on ANY getOrCreate, not just same-key") {
    val reg = new HandleRegistry[String, H](_.alive)
    assert(reg.getOrCreate("dead1", H(1, alive = false)) == H(1, false))
    assert(reg.size == 1)
    // touching an UNRELATED key sweeps the dead entry
    reg.getOrCreate("live", H(3, alive = true))
    assert(reg.size == 1, "dead-session entries must not accumulate")
    // dead1's slot is really gone: re-access builds fresh
    assert(reg.getOrCreate("dead1", H(4, alive = true)) == H(4, true))
    assert(reg.size == 2)
  }

  test("a dead entry occupying the requested key is replaced, never served") {
    val reg = new HandleRegistry[String, H](_.alive)
    reg.getOrCreate("k", H(1, alive = false))
    val got = reg.getOrCreate("k", H(2, alive = true))
    assert(got == H(2, alive = true), "a dead cached handle must re-open")
    assert(reg.size == 1)
  }
}
