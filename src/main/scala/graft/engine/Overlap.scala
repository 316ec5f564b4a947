package graft.engine

import java.util.concurrent.Executors
import scala.concurrent.{Await, ExecutionContext, Future}
import scala.concurrent.duration.Duration

/** Overlap INDEPENDENT Spark actions from a small driver-side thread pool
  * (optimization guide §2.6 "Overlap independent jobs"): Spark's scheduler
  * happily runs several jobs at once inside one application — actions are
  * sequential only because driver code calls them sequentially. The
  * multi-arm diagnostic keys (probe sweeps, recall checks, lifecycle
  * audits) are exactly the shape that benefits: 2-4 independent job
  * chains, each a string of small stages that never fills the cluster on
  * its own, previously paying driver latency + stage tail serially per
  * arm. Profiled at sf0.1/local[32]: ivf_pq_opq_sweep ran 83
  * driver-sequential jobs of 20-40 ms with 30-80 ms planning gaps — the
  * cluster was idle most of the wall clock.
  *
  * Results are unaffected: each arm's plan, partitioning, and
  * partial-aggregation order are exactly what the serial code ran — only
  * the SUBMISSION of the independent chains overlaps (FIFO scheduling
  * back-fills the tail, guide §2.6). Callers must pass genuinely
  * independent arms: nothing here may mutate state another arm reads
  * (lifecycle keys overlap only their post-mutation reads).
  *
  * The LAST arm runs on the caller thread (no pool round-trip and the
  * pool can never be the bottleneck for a single par call); the rest run
  * on daemon threads. Do NOT nest par calls — the pool is fixed-size and
  * nesting can starve it; query keys call it once at top level.
  */
object Overlap {
  private lazy val pool: ExecutionContext =
    ExecutionContext.fromExecutorService(
      Executors.newFixedThreadPool(6, (r: Runnable) => {
        val t = new Thread(r, "graft-overlap")
        t.setDaemon(true)
        t
      }))

  def par[A, B](a: => A, b: => B): (A, B) = {
    val fa = Future(a)(pool)
    val rb = b
    (Await.result(fa, Duration.Inf), rb)
  }

  def par3[A, B, C](a: => A, b: => B, c: => C): (A, B, C) = {
    val fa = Future(a)(pool)
    val fb = Future(b)(pool)
    val rc = c
    (Await.result(fa, Duration.Inf), Await.result(fb, Duration.Inf), rc)
  }

  def par4[A, B, C, D](a: => A, b: => B, c: => C, d: => D): (A, B, C, D) = {
    val fa = Future(a)(pool)
    val fb = Future(b)(pool)
    val fc = Future(c)(pool)
    val rd = d
    (Await.result(fa, Duration.Inf), Await.result(fb, Duration.Inf),
      Await.result(fc, Duration.Inf), rd)
  }

  /** N independent arms, results in input order (the par/par3/par4 shape
    * for a runtime-sized arm list, e.g. a per-window-size sweep). The
    * LAST arm runs on the caller thread like the fixed-arity forms. */
  def all[A](thunks: Seq[() => A]): Seq[A] = {
    if (thunks.isEmpty) return Nil
    val fs = thunks.init.map(t => Future(t())(pool))
    val last = thunks.last()
    fs.map(Await.result(_, Duration.Inf)) :+ last
  }
}
