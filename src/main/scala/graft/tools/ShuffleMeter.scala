package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Task-metrics shuffle meter: measures the shuffle WRITE bytes a thunk
  * causes on a session — the plan+data-determined number behind the
  * bench's `shuffle_mb` and the shuffle-budget regression specs (a query
  * whose SHAPE regresses shows here even when timings are noisy).
  *
  * The listener bus is drained before each read
  * ([[org.apache.spark.graftshim.ListenerShim]]) — task-end events are
  * delivered asynchronously and an undrained read undercounts. Meters on
  * the same session must not interleave measurements across threads (the
  * counter is session-global); the bench and specs run queries
  * sequentially, which is also what makes per-query attribution mean
  * anything. */
final class ShuffleMeter(spark: SparkSession) {
  private val bytes = new java.util.concurrent.atomic.AtomicLong()
  private val listener = new SparkListener {
    override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
      val m = t.taskMetrics
      if (m != null) bytes.addAndGet(m.shuffleWriteMetrics.bytesWritten): Unit
    }
  }
  spark.sparkContext.addSparkListener(listener)

  // waitUntilEmpty THROWS TimeoutException after Spark's internal bus
  // timeout on a badly loaded host; instrumentation must degrade to "no
  // measurement" rather than convert a healthy query into a reported
  // error (the bench records exceptions from the measured thunk's scope
  // as query failures)
  private def settled(): Boolean =
    try { org.apache.spark.graftshim.ListenerShim.waitUntilEmpty(spark.sparkContext); true }
    catch { case _: java.util.concurrent.TimeoutException => false }

  /** Shuffle write bytes attributable to `run`, or -1 when the listener
    * bus failed to drain (the count would under- or over-attribute). */
  def measure(run: () => Unit): Long = {
    val cleanBefore = settled()
    bytes.set(0L)
    run()
    if (settled() && cleanBefore) bytes.get() else -1L
  }

  /** Detach the listener — meters on a long-lived shared session (the
    * test JVM) should not keep paying the per-task callback after their
    * suite finishes. */
  def close(): Unit =
    spark.sparkContext.removeSparkListener(listener)
}
