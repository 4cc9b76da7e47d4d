package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQueryListener

/** One micro-batch's worth of [[StreamingQueryListener]] progress,
  * flattened to the fields the bench publishes: the trigger's own
  * phase clocks (`durationMs`) plus the state-store totals the
  * task-metrics listener cannot see (state commits happen on executor
  * threads but their cost is wall-clock inside `addBatch`, invisible
  * to GC/spill counters — the round-10 verdict's "zero gc, zero
  * spill, 1.2-1.7x slower" stream mystery in one line).
  *
  * `tsMs` is the trigger's start instant (epoch ms) — the join key
  * back to whichever bench pass was running when the trigger fired,
  * so attribution needs no cooperation from the query builders (some
  * streams are unnamed foreachBatch sinks).
  */
final case class TriggerSnap(
    tsMs: Long,
    inputRows: Long,
    stateOps: Int,
    stateRows: Long,
    stateCommitMs: Long,
    stateUpdateMs: Long,
    phases: Map[String, Long])

/** Buffering listener for per-trigger phase attribution. Install once
  * per session; progress events arrive asynchronously on the listener
  * bus, so readers should quiesce the session's streams before
  * trusting [[snapshot]] to be complete.
  */
final class StreamMeter extends StreamingQueryListener {
  private val buf = scala.collection.mutable.ArrayBuffer.empty[TriggerSnap]

  override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit = ()
  override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
  override def onQueryIdle(e: StreamingQueryListener.QueryIdleEvent): Unit = ()

  override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit = {
    val p = e.progress
    val phases = {
      val m = p.durationMs
      val it = m.entrySet().iterator()
      val b = Map.newBuilder[String, Long]
      while (it.hasNext) { val kv = it.next(); b += kv.getKey -> kv.getValue.longValue() }
      b.result()
    }
    val ops = p.stateOperators
    val snap = TriggerSnap(
      tsMs = java.time.Instant.parse(p.timestamp).toEpochMilli,
      inputRows = p.numInputRows,
      stateOps = ops.length,
      stateRows = ops.map(_.numRowsTotal).sum,
      stateCommitMs = ops.map(_.commitTimeMs).sum,
      stateUpdateMs = ops.map(o => o.allUpdatesTimeMs + o.allRemovalsTimeMs).sum,
      phases = phases)
    synchronized { buf += snap; () }
  }

  def snapshot(): Vector[TriggerSnap] = synchronized(buf.toVector)
}

object StreamMeter {

  /** Phase totals for one (query, pass) attribution window. `nTriggers`
    * counts every micro-batch the window saw; `dataTriggers` only those
    * that moved rows (with `noDataMicroBatches` off they coincide).
    */
  final case class WindowAgg(
      nTriggers: Int, dataTriggers: Int, inputRows: Long,
      stateOps: Int, stateRows: Long,
      triggerMs: Long, addBatchMs: Long, sourceMs: Long,
      planMs: Long, commitMs: Long, stateCommitMs: Long, stateUpdateMs: Long)

  /** Fold the snaps whose trigger start falls in `[t0, t1]`. Returns
    * None when the window saw no micro-batch (a batch-only query).
    */
  def aggregate(snaps: Seq[TriggerSnap], t0: Long, t1: Long): Option[WindowAgg] = {
    val in = snaps.filter(s => s.tsMs >= t0 && s.tsMs <= t1)
    if (in.isEmpty) None
    else Some(WindowAgg(
      nTriggers = in.size,
      dataTriggers = in.count(_.inputRows > 0),
      inputRows = in.map(_.inputRows).sum,
      // max, not sum: each trigger reports the query's CURRENT operator
      // count / state size; several queries in one window (a staged
      // ingest + the measured stream) still max to the widest plan
      stateOps = in.map(_.stateOps).max,
      stateRows = in.map(_.stateRows).max,
      triggerMs = in.map(_.phases.getOrElse("triggerExecution", 0L)).sum,
      addBatchMs = in.map(_.phases.getOrElse("addBatch", 0L)).sum,
      sourceMs = in.map(s => s.phases.getOrElse("latestOffset", 0L) +
        s.phases.getOrElse("getBatch", 0L)).sum,
      planMs = in.map(_.phases.getOrElse("queryPlanning", 0L)).sum,
      commitMs = in.map(s => s.phases.getOrElse("walCommit", 0L) +
        s.phases.getOrElse("commitOffsets", 0L)).sum,
      stateCommitMs = in.map(_.stateCommitMs).sum,
      stateUpdateMs = in.map(_.stateUpdateMs).sum))
  }

  def install(spark: SparkSession): StreamMeter = {
    val m = new StreamMeter
    spark.streams.addListener(m)
    m
  }
}
