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
  spark.sparkContext.addSparkListener(new SparkListener {
    override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
      val m = t.taskMetrics
      if (m != null) bytes.addAndGet(m.shuffleWriteMetrics.bytesWritten): Unit
    }
  })

  /** Shuffle write bytes attributable to `run`. */
  def measure(run: () => Unit): Long = {
    org.apache.spark.graftshim.ListenerShim.waitUntilEmpty(spark.sparkContext)
    bytes.set(0L)
    run()
    org.apache.spark.graftshim.ListenerShim.waitUntilEmpty(spark.sparkContext)
    bytes.get()
  }
}
