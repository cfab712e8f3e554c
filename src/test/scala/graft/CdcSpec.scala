package graft

import graft.operators.Cdc
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.sql.Timestamp

class CdcSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def snapshot(): org.apache.spark.sql.DataFrame =
    Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0), (4L, "d", 40.0))
      .toDF("k", "s", "v")

  test("applyChanges: upsert/delete/insert, latest (seq, op) wins per key") {
    val changes = Seq(
      (1L, 1L, "U", "a1", 11.0), // plain update
      (2L, 1L, "U", "b1", 21.0), // update then delete: delete has higher seq
      (2L, 2L, "D", "b1", 21.0),
      (3L, 2L, "U", "c2", 32.0), // two updates out of arrival order
      (3L, 1L, "U", "c1", 31.0),
      (9L, 1L, "I", "i", 90.0)   // insert of a new key
    ).toDF("k", "seq", "op", "s", "v")
    val out = Cdc.applyChanges(snapshot(), changes, "k", "seq", "op")
      .orderBy("k").as[(Long, String, Double)].collect().toSeq
    assert(out === Seq((1L, "a1", 11.0), (3L, "c2", 32.0), (4L, "d", 40.0),
      (9L, "i", 90.0)))
  }

  test("applyChanges DEFAULT plans the bloom-pruned path") {
    // the round-12 sf1 finding: the plain anti-join flips broadcast → SMJ
    // and shuffles the whole base once the feed outgrows broadcast; the
    // default merge must therefore BE the pruned form (verdict task 2)
    val changes = Seq((1L, 1L, "U", "a1", 11.0)).toDF("k", "seq", "op", "s", "v")
    val tmp = java.nio.file.Files.createTempDirectory("cdc_default").toString
    snapshot().write.mode("overwrite").parquet(tmp)
    val plan = Cdc.applyChanges(spark.read.parquet(tmp), changes, "k", "seq", "op")
      .queryExecution.executedPlan.toString
    assert(plan.contains("might_contain"),
      s"default applyChanges must gate the base behind the bloom probe:\n$plan")
  }

  test("applyChangesPruned ≡ applyChangesUnpruned; bloom probe in plan; empty feed safe") {
    val changes = Seq(
      (1L, 1L, "U", "a1", 11.0), (2L, 1L, "U", "b1", 21.0),
      (2L, 2L, "D", "b1", 21.0), (3L, 2L, "U", "c2", 32.0),
      (3L, 1L, "U", "c1", 31.0), (9L, 1L, "I", "i", 90.0)
    ).toDF("k", "seq", "op", "s", "v")
    // plan probe assertion needs a parquet-backed base — LocalRelation
    // fixtures constant-fold the filter (memory/PlanPropertiesSpec gotcha)
    val tmp = java.nio.file.Files.createTempDirectory("cdc_pruned").toString
    snapshot().write.mode("overwrite").parquet(tmp)
    val fileBase = spark.read.parquet(tmp)
    val pruned = Cdc.applyChangesPruned(fileBase, changes, "k", "seq", "op")
    assert(pruned.queryExecution.executedPlan.toString.contains("might_contain"),
      "untouched rows must be gated by the bloom probe, not the join")
    val got = pruned.orderBy("k").as[(Long, String, Double)].collect().toSeq
    val plain = Cdc.applyChangesUnpruned(snapshot(), changes, "k", "seq", "op")
      .orderBy("k").as[(Long, String, Double)].collect().toSeq
    assert(got === plain, "bloom false positives must die in the exact anti-join")
    // randomized equivalence at a deliberately terrible fpp so false
    // positives actually occur and the residue join corrects them
    val rnd = new scala.util.Random(7)
    val base = (0L until 500L).map(k => (k, s"s$k", k.toDouble)).toDF("k", "s", "v")
    val feed = (0 until 200).map { _ =>
      val k = rnd.nextInt(600).toLong
      (k, rnd.nextInt(5).toLong, if (rnd.nextBoolean()) "U" else "D", s"u$k", k * 2.0)
    }.toDF("k", "seq", "op", "s", "v")
    val a = Cdc.applyChangesPruned(base, feed, "k", "seq", "op",
        expectedChangedKeys = 4, fpp = 0.5)
      .orderBy("k", "s").collect().toSeq
    val b = Cdc.applyChangesUnpruned(base, feed, "k", "seq", "op")
      .orderBy("k", "s").collect().toSeq
    assert(a === b)
    val empty = changes.where(lit(false))
    assert(Cdc.applyChangesPruned(snapshot(), empty, "k", "seq", "op")
      .orderBy("k").collect().length == 4, "empty feed returns the base")
  }

  test("maintainGroupCounts ≡ full recompute: migration across groups, vanishing group, inserts") {
    // base: group g of a row = s; key 4 is the ONLY member of group "d"
    val base = Seq((1L, "a", 10L), (2L, "a", 20L), (3L, "b", 30L), (4L, "d", 40L))
      .toDF("k", "g", "v")
    val changes = Seq(
      (1L, 1L, "U", "b", 11L), // migrates a -> b
      (4L, 1L, "D", "d", 40L), // empties group d
      (9L, 1L, "I", "c", 90L), // new group c
      (2L, 1L, "U", "a", 25L), // in-place value update
      (2L, 2L, "U", "a", 26L)  // stacked: latest wins
    ).toDF("k", "seq", "op", "g", "v")
    val view = base.groupBy("g")
      .agg(count(lit(1)).as("n_rows"), sum(col("v")).as("sum_val"))
    val got = Cdc.maintainGroupCounts(view, base, changes, "k", "seq", "op", "g", "v")
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val recomputed = Cdc.applyChanges(base, changes, "k", "seq", "op")
      .groupBy("g").agg(count(lit(1)).as("n"), sum(col("v")).as("s"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got == recomputed, s"maintained $got vs recomputed $recomputed")
    assert(!got.contains("d"), "emptied group must drop, as a recompute would")
    assert(got("b") == (2L, 41L), "migrated row lands in its new group")
  }

  test("applyChanges: seq tie breaks by op descending (deterministic)") {
    // same seq for U and D on one key: 'U' > 'D' lexicographically, so the
    // upsert wins — pinned so a malformed feed still resolves one way
    val changes = Seq((1L, 5L, "D", "x", 0.0), (1L, 5L, "U", "tie", 1.0))
      .toDF("k", "seq", "op", "s", "v")
    val out = Cdc.applyChanges(snapshot(), changes, "k", "seq", "op")
      .where($"k" === 1L).as[(Long, String, Double)].collect().toSeq
    assert(out === Seq((1L, "tie", 1.0)))
  }

  test("applyChanges: empty feed returns the base unchanged") {
    val empty = Seq.empty[(Long, Long, String, String, Double)]
      .toDF("k", "seq", "op", "s", "v")
    assert(Cdc.applyChanges(snapshot(), empty, "k", "seq", "op")
      .orderBy("k").as[(Long, String, Double)].collect().toSeq ===
      snapshot().orderBy("k").as[(Long, String, Double)].collect().toSeq)
  }

  private def ts(m: Int) = Timestamp.valueOf(f"2026-01-01 00:$m%02d:00")

  test("scd2History: transitions open intervals, equal runs collapse, ties pinned") {
    val log = Seq(
      (1L, ts(0), 10L, "x"), // first version
      (1L, ts(1), 11L, "x"), // unchanged -> collapses
      (1L, ts(2), 12L, "y"), // transition closes x at 00:02
      (1L, ts(2), 13L, "x"), // same-ts tie: event_id orders y before this x
      (2L, ts(5), 20L, "z")
    ).toDF("user_id", "ts", "event_id", "event_type")
    val out = Cdc.scd2History(log, "user_id", "ts", "event_id", Seq("event_type"))
      .select("user_id", "event_id", "event_type", "valid_from", "valid_to",
        "is_current")
      .orderBy("user_id", "valid_from", "event_id")
      .as[(Long, Long, String, Timestamp, Option[Timestamp], Boolean)]
      .collect().toSeq
    assert(out === Seq(
      (1L, 10L, "x", ts(0), Some(ts(2)), false),
      (1L, 12L, "y", ts(2), Some(ts(2)), false),
      (1L, 13L, "x", ts(2), None, true),
      (2L, 20L, "z", ts(5), None, true)))
  }

  test("scd2History: single shuffle — both windows share one exchange") {
    val prev = spark.conf.getOption("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val log = Seq((1L, ts(0), 10L, "x"), (1L, ts(1), 11L, "y"))
        .toDF("user_id", "ts", "event_id", "event_type")
      val plan = Cdc.scd2History(log, "user_id", "ts", "event_id",
        Seq("event_type")).queryExecution.executedPlan
      val exchanges = plan.collect { case e: ShuffleExchangeExec => e }
      assert(exchanges.size == 1,
        s"expected exactly one exchange feeding both windows, got:\n$plan")
    } finally prev match {
      case Some(v) => spark.conf.set("spark.sql.adaptive.enabled", v)
      case None => spark.conf.unset("spark.sql.adaptive.enabled")
    }
  }
}
