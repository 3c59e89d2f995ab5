package graft.bench

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import scala.collection.mutable

/** Per-stage task-metric collector — the measurement side of the skew
  * defenses (north rule: "salted shuffles for hot-entity skew" must be
  * HANDLED, which means demonstrated under hostile data, not just planned).
  *
  * Registers as a SparkListener and records every successful task's run
  * time plus its record counts (input, shuffle read, shuffle write). The
  * record counts are the durable evidence: they are deterministic functions
  * of the data and the plan, while times track host load. A plan whose
  * worst task reads k× the median's records WILL have a k× straggler at
  * 1000 executors no matter how the cluster behaves; a plan whose spread is
  * bounded cannot.
  *
  * Used by [[SkewBench]] (the committed artifact) and SkewSpec (the CI
  * assertion that the salted / capped / join-back plans keep their spread
  * bound while the naive shapes violate it on the same hostile corpus).
  */
final class TaskSpread extends SparkListener {

  final case class TaskRow(
      stageId: Int,
      runTimeMs: Long,
      inputRecords: Long,
      shuffleReadRecords: Long,
      shuffleWriteRecords: Long,
      shuffleReadBytes: Long,
      shuffleWriteBytes: Long)

  private val rows = mutable.ArrayBuffer.empty[TaskRow]

  override def onTaskEnd(e: SparkListenerTaskEnd): Unit = synchronized {
    val m = e.taskMetrics
    if (m != null && e.taskInfo != null && e.taskInfo.successful)
      rows += TaskRow(
        e.stageId,
        m.executorRunTime,
        m.inputMetrics.recordsRead,
        m.shuffleReadMetrics.recordsRead,
        m.shuffleWriteMetrics.recordsWritten,
        m.shuffleReadMetrics.localBytesRead + m.shuffleReadMetrics.remoteBytesRead,
        m.shuffleWriteMetrics.bytesWritten)
  }

  def reset(): Unit = synchronized(rows.clear())
  def snapshot(): Seq[TaskRow] = synchronized(rows.toSeq)

  /** Spread statistics for one stage. `medianX` is the median over the
    * stage's tasks; ratios are computed against `max(median, floor)` so a
    * stage of near-empty tasks cannot manufacture an infinite ratio. */
  final case class StageSpread(
      stageId: Int,
      nTasks: Int,
      maxShuffleReadRecords: Long,
      medianShuffleReadRecords: Long,
      maxShuffleWriteRecords: Long,
      medianShuffleWriteRecords: Long,
      maxShuffleReadBytes: Long,
      medianShuffleReadBytes: Long,
      maxTimeMs: Long,
      medianTimeMs: Long) {
    def readRatio(floor: Long = 64): Double =
      maxShuffleReadRecords.toDouble / math.max(medianShuffleReadRecords, floor)
    def writeRatio(floor: Long = 64): Double =
      maxShuffleWriteRecords.toDouble / math.max(medianShuffleWriteRecords, floor)
    /** Byte-level spread: row counts miss payload skew (a partial
      * collect_list ships FEW rows that are each megabytes). */
    def readBytesRatio(floorBytes: Long = 1 << 16): Double =
      maxShuffleReadBytes.toDouble / math.max(medianShuffleReadBytes, floorBytes)
  }

  private def median(xs: Seq[Long]): Long =
    if (xs.isEmpty) 0L else xs.sorted.apply(xs.size / 2)

  /** Per-stage spreads for stages with at least `minTasks` tasks (a spread
    * over 1–2 tasks is meaningless). */
  def stageSpreads(minTasks: Int = 4): Seq[StageSpread] =
    snapshot().groupBy(_.stageId).toSeq.sortBy(_._1).collect {
      case (sid, ts) if ts.size >= minTasks =>
        StageSpread(sid, ts.size,
          ts.map(_.shuffleReadRecords).max, median(ts.map(_.shuffleReadRecords)),
          ts.map(_.shuffleWriteRecords).max, median(ts.map(_.shuffleWriteRecords)),
          ts.map(_.shuffleReadBytes).max, median(ts.map(_.shuffleReadBytes)),
          ts.map(_.runTimeMs).max, median(ts.map(_.runTimeMs)))
    }

  /** The worst shuffle-read spread across all qualifying stages — the
    * one-number verdict for "does any reducer see a hot key's full
    * traffic". */
  def worstReadRatio(minTasks: Int = 4, floor: Long = 64): Double = {
    val ss = stageSpreads(minTasks)
    if (ss.isEmpty) 1.0 else ss.map(_.readRatio(floor)).max
  }

  def report(minTasks: Int = 4): String =
    stageSpreads(minTasks).map { s =>
      f"stage ${s.stageId}%4d tasks=${s.nTasks}%3d " +
        f"shufRead max/med=${s.maxShuffleReadRecords}%8d/${s.medianShuffleReadRecords}%8d " +
        f"shufWrite max/med=${s.maxShuffleWriteRecords}%8d/${s.medianShuffleWriteRecords}%8d " +
        f"time max/med=${s.maxTimeMs}%6d/${s.medianTimeMs}%6d ms"
    }.mkString("\n")
}
