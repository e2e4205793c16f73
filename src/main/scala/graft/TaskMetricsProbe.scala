package graft

import java.util.concurrent.atomic.LongAdder

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Executor-side metric aggregation for the bench: CPU and shuffle
  * transport bytes summed over every COMPLETED task, snapshotted at
  * query boundaries.
  *
  * Why it exists: [[BenchCore.processCpuSeconds]] reads THIS JVM's
  * process clock, which attributes all plan compute only while the
  * master is `local[n]` (tasks run in the driver). Under
  * `GRAFT_MASTER=local-cluster[...]` every task runs in a forked
  * executor JVM and the process clock sees nothing but harness
  * overhead — task metrics are the deployment-independent CPU
  * attribution (and the only one a real cluster has). Shuffle
  * read-side bytes are recorded split by locality: a nonzero
  * `remoteBytesRead` is positive evidence the run exercised real
  * cross-executor (Netty) shuffle transport, which `local[n]`
  * structurally cannot (one BlockManager → all reads local).
  *
  * The listener bus is ASYNCHRONOUS: events from an action can still
  * be in flight when the action returns, so a boundary snapshot must
  * [[drain]] first or tail events bleed into the next query's delta.
  */
final class TaskMetricsProbe extends SparkListener {
  private val cpuNs = new LongAdder
  private val runMs = new LongAdder
  private val remoteShuffleB = new LongAdder
  private val localShuffleB = new LongAdder
  private val tasks = new LongAdder

  override def onTaskEnd(e: SparkListenerTaskEnd): Unit = {
    val m = e.taskMetrics
    if (m != null) {
      cpuNs.add(m.executorCpuTime)
      runMs.add(m.executorRunTime)
      remoteShuffleB.add(m.shuffleReadMetrics.remoteBytesRead)
      localShuffleB.add(m.shuffleReadMetrics.localBytesRead)
      tasks.add(1L)
    }
  }

  def snapshot(): TaskMetricsProbe.Snap = TaskMetricsProbe.Snap(
    cpuS = cpuNs.sum() / 1e9,
    runS = runMs.sum() / 1e3,
    remoteShuffleBytes = remoteShuffleB.sum(),
    localShuffleBytes = localShuffleB.sum(),
    tasks = tasks.sum())
}

object TaskMetricsProbe {
  final case class Snap(cpuS: Double, runS: Double,
      remoteShuffleBytes: Long, localShuffleBytes: Long, tasks: Long) {
    def -(o: Snap): Snap = Snap(cpuS - o.cpuS, runS - o.runS,
      remoteShuffleBytes - o.remoteShuffleBytes,
      localShuffleBytes - o.localShuffleBytes, tasks - o.tasks)
  }

  /** Install a probe on the session's listener bus. */
  def install(s: SparkSession): TaskMetricsProbe = {
    val p = new TaskMetricsProbe
    s.sparkContext.addSparkListener(p)
    p
  }

  /** Drain the async listener bus so a snapshot taken now reflects
    * every event of the actions that already returned. A drain
    * timeout degrades the boundary (the snapshot may be early), never
    * the run.
    */
  def drain(s: SparkSession): Unit =
    try org.apache.spark.graft.ListenerBusDrain.drain(s.sparkContext)
    catch { case _: java.util.concurrent.TimeoutException => () }
}
