package graft.core

import java.util.concurrent.Executors

import scala.concurrent.duration.Duration
import scala.concurrent.{Await, ExecutionContext, Future}

/** Overlap two independent eager legs of a composition (optimization
  * guide §2.6): Spark runs several jobs at once inside one application —
  * actions are only sequential because the driver calls them
  * sequentially. The composed ingestion pipelines are chains of small
  * sequential jobs (corpus CC ≈ 10 driver round-trips, the shard
  * probe/verify another ~10), each leaving most executors idle at its
  * barriers; when two legs are data-independent until a join point,
  * submitting them from two threads lets FIFO scheduling backfill one
  * leg's idle capacity with the other's tasks. Dataflow and results are
  * unchanged — only wall-clock between the fork and the join point.
  *
  * `a` runs on a daemon pool thread; `b` runs on the CALLING thread (so
  * the main leg's stack traces and listener callsites stay
  * attributable). Both are awaited before returning — no work escapes
  * the composition (the bench's per-rep cache clear never races a
  * straggler leg).
  */
object Par {
  private lazy val ec = ExecutionContext.fromExecutor(
    Executors.newCachedThreadPool(r => {
      val t = new Thread(r, "graft-par")
      t.setDaemon(true)
      t
    }))

  def two[A, B](a: => A)(b: => B): (A, B) = {
    val fa = Future(a)(ec)
    val rb =
      try b
      catch {
        case t: Throwable =>
          // even on failure, no work escapes the composition: wait for
          // the forked leg (its Spark jobs would otherwise race the
          // caller's cleanup — e.g. the bench's per-rep cache clear).
          // On interruption the await is abandoned (the forked leg may
          // still be running) — restore the interrupt flag so the
          // caller's cancellation signal survives the rethrow.
          try Await.ready(fa, Duration.Inf)
          catch { case _: InterruptedException => Thread.currentThread().interrupt() }
          // if the forked leg ALSO failed, don't drop its exception
          fa.value.foreach(_.failed.foreach(ft => if (ft ne t) t.addSuppressed(ft)))
          throw t
      }
    (Await.result(fa, Duration.Inf), rb)
  }
}
