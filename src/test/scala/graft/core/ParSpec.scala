package graft.core

import java.util.concurrent.CountDownLatch
import java.util.concurrent.atomic.AtomicBoolean

import graft.SparkSpec

/** Pins the r10 composition-overlap helper (guide §2.6): both legs'
  * values come back, the legs genuinely run concurrently, and no leg's
  * work ever escapes the call — a failing main leg still waits for the
  * forked one (the bench clears caches between reps; a straggler leg
  * racing that cleanup would be a correctness hazard, not just noise).
  */
class ParSpec extends SparkSpec {

  test("both legs run concurrently and both values return") {
    val aInB = new CountDownLatch(1)
    val bInA = new CountDownLatch(1)
    // each leg releases the other's latch and then waits on its own —
    // deadlock (timeout) unless the legs truly overlap
    val (ra, rb) = Par.two {
      bInA.countDown()
      assert(aInB.await(30, java.util.concurrent.TimeUnit.SECONDS),
        "forked leg never saw the calling leg run")
      21
    } {
      aInB.countDown()
      assert(bInA.await(30, java.util.concurrent.TimeUnit.SECONDS),
        "calling leg never saw the forked leg run")
      2
    }
    assert(ra * rb == 42)
  }

  test("a failing calling leg still waits for the forked leg") {
    val forkedDone = new AtomicBoolean(false)
    val ex = intercept[IllegalStateException] {
      Par.two {
        Thread.sleep(300)
        forkedDone.set(true)
        1
      } {
        throw new IllegalStateException("main leg fails fast")
      }
    }
    assert(ex.getMessage == "main leg fails fast")
    assert(forkedDone.get,
      "Par.two propagated the failure before the forked leg finished")
  }

  test("a failing forked leg propagates after the calling leg completes") {
    val mainDone = new AtomicBoolean(false)
    val ex = intercept[IllegalStateException] {
      Par.two[Int, Int] {
        throw new IllegalStateException("forked leg fails")
      } {
        mainDone.set(true)
        2
      }
    }
    assert(ex.getMessage == "forked leg fails")
    assert(mainDone.get)
  }

  test("spark actions from both legs agree with sequential results") {
    val (a, b) = Par.two {
      spark.range(100000).selectExpr("sum(id)").head().getLong(0)
    } {
      spark.range(1000).selectExpr("count(*)").head().getLong(0)
    }
    assert(a == 4999950000L && b == 1000L)
  }
}
