package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Structured-Streaming ingestion path (post-parity extension, SURVEY.md
  * §7.6): windowed event aggregation with watermarking, plus its exact
  * batch twin (same expressions) for oracle checking.
  */
object EventStream {

  /** Batch twin of the streaming aggregation — tumbling 1-hour windows.
    * Decimal sum so results are order-independent (bit-stable under any
    * partitioning / oracle engine).
    */
  def tumblingCounts(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,6)")).as("total_value"))
      .select(col("w.start").as("window_start"), col("event_type"), col("n"),
        col("total_value"))

  /** Session windows: per-user sessions closed by a 30-minute inactivity
    * gap (`session_window` — the gaps-and-islands lag/cumsum construction is
    * the ANSI-SQL oracle twin). Boundary semantics, verified empirically:
    * an event arriving EXACTLY `gap` after its predecessor still MERGES into
    * the session (events at 00:00/00:30/00:59:59 with gap=30m form one
    * session), so the SQL twin's new-session predicate is the strict
    * `ts - lag(ts) > gap`. Runs batch or streaming (with watermark).
    */
  def sessionCounts(events: DataFrame, gap: String = "30 minutes"): DataFrame =
    events
      .groupBy(col("user_id"), session_window(col("ts"), gap).as("sw"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,6)")).as("total_value"))
      .select(col("user_id"), col("sw.start").as("session_start"), col("n"),
        col("total_value"))

  /** Sliding windows: 1-hour windows every 30 minutes (each event lands in
    * windowDuration/slide = 2 windows, start-aligned to epoch multiples of
    * the slide). The SQL oracle twin enumerates both candidate starts per
    * event — time_bucket(30m, ts) and that minus 30m. Batch or streaming.
    */
  def slidingCounts(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "1 hour", "30 minutes").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,6)")).as("total_value"))
      .select(col("w.start").as("window_start"), col("event_type"), col("n"),
        col("total_value"))

  /** Streaming exact dedup twin: keep the FIRST event per (user, type) in
    * event-time order. The streaming form is
    * `dropDuplicates("user_id", "event_type")` (state-store keyed on the
    * pair, keeps first arrival); the batch twin pins arrival order to event
    * time (tie-broken by event_id) so the result is deterministic and
    * oracle-comparable. One shuffle on the dedup key; state per key is one
    * row, so streaming state is bounded by key cardinality, not volume.
    */
  def firstEventPerKey(events: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id", "event_type").orderBy(col("ts"), col("event_id"))
    events.withColumn("rn", row_number().over(w)).where(col("rn") === 1)
      .select("user_id", "event_type", "event_id", "ts", "value")
  }

  /** Conversion funnel: for each user, the first `stages.head` event, then
    * for every later stage the first event of that type landing within
    * `within` AFTER the previous stage's timestamp (null once a stage is
    * missed — classic ordered-funnel semantics). Output: one row per user
    * who entered the funnel, with t1..tN stage timestamps.
    *
    * Scale shape: stage i is a left join of the (shrinking, per-user) funnel
    * frame against ONLY the stage-i-filtered events, followed by a per-user
    * conditional min — `stages.length - 1` shuffles of pre-filtered event
    * slices, never of the full log.
    */
  def funnel(events: DataFrame, stages: Seq[String], within: String): DataFrame = {
    require(stages.nonEmpty, "need at least one funnel stage")
    val e = events.select(col("user_id"), col("event_type"), col("ts"))
    var acc = e.where(col("event_type") === stages.head)
      .groupBy("user_id").agg(min(col("ts")).as("t1"))
    var carried = Seq("t1")
    for ((st, idx) <- stages.tail.zipWithIndex) {
      val prev = s"t${idx + 1}"
      val cur = s"t${idx + 2}"
      acc = acc.join(e.where(col("event_type") === st), Seq("user_id"), "left")
        .groupBy(col("user_id") +: carried.map(col): _*)
        .agg(min(when(col("ts") >= col(prev) &&
          col("ts") < col(prev) + expr(s"INTERVAL $within"), col("ts"))).as(cur))
      carried = carried :+ cur
    }
    acc
  }

  /** Event-interaction join: purchases within `horizon` AFTER an error by
    * the same user, emitted as (err_id, p_id, user_id) pairs. The batch
    * form; [[streamingPurchasesNearErrors]] runs the identical expressions
    * as a watermarked stream-stream join. The user_id equality is the
    * shuffle key — the time bounds evaluate as a post-join filter, so no
    * cartesian/BNLJ plan at any scale.
    */
  def purchasesNearErrors(events: DataFrame, horizon: String = "2 hours"): DataFrame = {
    val errors = events.where(col("event_type") === "error")
      .select(col("user_id"), col("event_id").as("err_id"), col("ts").as("err_ts"))
    val purchases = events.where(col("event_type") === "purchase")
      .select(col("user_id").as("p_user_id"), col("event_id").as("p_id"),
        col("ts").as("p_ts"))
    errors.join(purchases,
        col("user_id") === col("p_user_id") &&
          col("p_ts") >= col("err_ts") &&
          col("p_ts") < col("err_ts") + expr(s"INTERVAL $horizon"))
      .select("err_id", "p_id", "user_id")
  }

  /** Stream-stream inner join with watermarks on BOTH sides: each side's
    * state store holds only rows younger than watermark + horizon, so state
    * is bounded by rate × (watermark + horizon), not stream length. Append
    * mode; results match the batch twin exactly once both streams drain.
    */
  def streamingPurchasesNearErrors(spark: SparkSession, dir: String,
      rawSchema: StructType, horizon: String = "2 hours"): DataFrame = {
    // prune to the four needed columns BEFORE anything stateful: every
    // surviving column of both sides lives in the join state stores for
    // watermark + horizon — the wide `props` payload must never get there
    def src = graft.SparkUtil.normalizeEventTs(
        spark.readStream.schema(rawSchema).parquet(dir))
      .select(col("user_id"), col("event_id"), col("event_type"), col("ts"))
    val errors = src.where(col("event_type") === "error")
      .select(col("user_id"), col("event_id").as("err_id"), col("ts").as("err_ts"))
      .withWatermark("err_ts", "4 hours")
    val purchases = src.where(col("event_type") === "purchase")
      .select(col("user_id").as("p_user_id"), col("event_id").as("p_id"),
        col("ts").as("p_ts"))
      .withWatermark("p_ts", "4 hours")
    errors.join(purchases,
        col("user_id") === col("p_user_id") &&
          col("p_ts") >= col("err_ts") &&
          col("p_ts") < col("err_ts") + expr(s"INTERVAL $horizon"))
      .select("err_id", "p_id", "user_id")
  }

  /** The same aggregation as a streaming query over a parquet directory of
    * raw events (ts normalized from either physical testdata type — see
    * [[graft.SparkUtil.normalizeEventTs]]), with a 2-hour watermark for late
    * data. Identical expressions to the batch twin by construction. Caller
    * starts/stops it (tests use the memory sink + processAllAvailable).
    */
  def streamingTumblingCounts(spark: SparkSession, dir: String, rawSchema: StructType): DataFrame =
    tumblingCounts(
      graft.SparkUtil.normalizeEventTs(
          spark.readStream.schema(rawSchema).parquet(dir))
        .withWatermark("ts", "2 hours"))
}
