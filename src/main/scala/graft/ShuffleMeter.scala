package graft

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.SparkContext
import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}

/** Stage-level shuffle read/write accumulator.
  *
  * The engine's scale story rests on "decision shuffles carry hashes, ids
  * and scores — never text or vectors". The plan-shape specs pin the column
  * sets; this listener pins the BYTES, continuously: [[Bench]] registers one
  * instance and reports per-query shuffle read/write alongside seconds, so
  * every round's BENCH_r*.json re-validates the ladder claims instead of
  * leaving them to ad-hoc `tools/shuffle_bytes.scala` sessions.
  *
  * Thread-safety: stage-completed events arrive on the listener-bus thread
  * while reset/read happen on the bench loop thread — hence AtomicLong.
  * Reads must go through [[settle]], which drains the async bus first.
  */
class ShuffleMeter extends SparkListener {
  private val readB = new AtomicLong(0L)
  private val writeB = new AtomicLong(0L)

  override def onStageCompleted(ev: SparkListenerStageCompleted): Unit = {
    val m = ev.stageInfo.taskMetrics
    if (m != null) {
      readB.addAndGet(m.shuffleReadMetrics.totalBytesRead)
      writeB.addAndGet(m.shuffleWriteMetrics.bytesWritten)
    }
  }

  def reset(): Unit = { readB.set(0L); writeB.set(0L) }

  /** Drain the listener bus, then return (shuffleReadBytes, shuffleWriteBytes)
    * accumulated since the last [[reset]].
    */
  def settle(sc: SparkContext): (Long, Long) = {
    org.apache.spark.sql.graftshim.ListenerBridge.drain(sc)
    (readB.get(), writeB.get())
  }
}
