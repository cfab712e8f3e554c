package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Change-data-capture application: MERGE/upsert a change feed into a base
  * snapshot, and build type-2 (validity-interval) history from a change
  * log. Training-data corpora are recrawled continuously — the practical
  * shape of "update the corpus" at scale is a small change feed applied to
  * a huge immutable snapshot, not a rewrite (the lakehouse MERGE pattern;
  * extends the crawl-delta view of [[Dedup.snapshotDiff]]).
  *
  * [Scale] The base snapshot NEVER shuffles: the change feed first
  * collapses to one decision row per changed key (a map-side-combined
  * `max_by` aggregate — shuffle traffic is (key, latest-payload) rows,
  * bounded by the feed, not the base), and the base then anti-joins that
  * key set — broadcastable whenever the collapsed feed is small, which is
  * the operating point of an incremental pipeline. Survivors union with
  * the non-delete latest rows; both legs are narrow.
  */
object Cdc {

  private def qcol(name: String): Column = col(s"`$name`")

  /** Apply a CDC change feed to a base snapshot (MERGE semantics).
    *
    * `changes` carries `keyCol`, `seqCol` (monotone change order), `opCol`
    * (`"I"`/`"U"` upsert the row's payload, `"D"` deletes the key), and
    * every payload column of `base`. Per key, the change with the largest
    * `(seq, op)` wins — ties on `seq` break by `op` descending so the
    * decision is deterministic even on a malformed feed that reuses a
    * sequence number; a well-formed feed has unique `seq` per key.
    * Inserts and updates are the same operation (upsert): the winning
    * payload replaces whatever the base held.
    *
    * Returns the new snapshot with exactly `base`'s columns.
    *
    * The DEFAULT plan is the Bloom-pruned merge ([[applyChangesPruned]]):
    * the sf1 validation bench (BENCH_sf1.json, round 12) measured the
    * plain anti-join flipping broadcast → sort-merge once the collapsed
    * feed outgrew the broadcast ceiling, shuffling the WHOLE base — while
    * the pruned form stays feed-proportional in every regime (below the
    * ceiling the Bloom build is one tiny aggregate job and the residue
    * anti-join still broadcasts; above it, base rows the filter proves
    * untouched never enter an exchange). Row-identical by construction —
    * a Bloom filter has no false negatives and the residue anti-join
    * corrects false positives. [[applyChangesUnpruned]] retains the plain
    * single-scan anti-join for the broadcast regime and as the
    * equivalence twin in specs/ladders.
    */
  def applyChanges(base: DataFrame, changes: DataFrame, keyCol: String,
      seqCol: String, opCol: String): DataFrame =
    applyChangesPruned(base, changes, keyCol, seqCol, opCol)

  /** The plain (un-pruned) MERGE: collapse the feed, anti-join the base on
    * the changed-key set, union the upserts. One base scan, but the
    * anti-join shuffles the whole base once the collapsed feed outgrows
    * the broadcast ceiling — prefer [[applyChanges]] (Bloom-pruned
    * default) unless the feed is known-tiny and the extra base scan of
    * the pruned form matters more than its shuffle immunity.
    */
  def applyChangesUnpruned(base: DataFrame, changes: DataFrame, keyCol: String,
      seqCol: String, opCol: String): DataFrame = {
    val payload = base.columns.filterNot(_ == keyCol)
    // one row per changed key: partial-aggregating max_by, never a window
    // (a row_number window would sort full feed partitions; max_by combines
    // map-side so the exchange carries one candidate row per key per task)
    val latest = changes
      .groupBy(qcol(keyCol))
      .agg(max_by(struct((opCol +: payload).map(qcol): _*),
        struct(qcol(seqCol), qcol(opCol))).as("__latest"))
      .select(qcol(keyCol) +: (opCol +: payload).map(c =>
        col(s"`__latest`.`$c`").as(c)): _*)
    val survivors = base.join(latest.select(qcol(keyCol)), Seq(keyCol), "left_anti")
    survivors.unionByName(
      latest.where(qcol(opCol) =!= "D").select(base.columns.map(qcol): _*))
  }

  /** [[applyChanges]] with a BLOOM-PRUNED base: the variant for the regime
    * where the collapsed feed outgrows the broadcast ceiling and the plain
    * anti-join starts shuffling the WHOLE base (measured at the sf1
    * validation bench: 4→72 MB shuffle write crossing that threshold —
    * BENCH_sf1.json round 12). The changed-key set compresses into one
    * bounded Bloom filter; base rows the filter proves untouched
    * (`might_contain = false` — a Bloom filter has NO false negatives)
    * bypass the join entirely and never enter an exchange, so the shuffled
    * slice is (changed + false-positive) rows — proportional to the FEED,
    * not the base. The residue anti-joins exactly, so false positives are
    * corrected and the result is row-identical to [[applyChanges]].
    *
    * `expectedChangedKeys` sizes the filter (fpp degrades above it, the
    * prune weakens, correctness unaffected — the [[Joins.bloomPrunedJoin]]
    * clamp convention).
    */
  def applyChangesPruned(base: DataFrame, changes: DataFrame, keyCol: String,
      seqCol: String, opCol: String, expectedChangedKeys: Long = 1L << 20,
      fpp: Double = 1e-3): DataFrame = {
    import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
    import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
    import org.apache.spark.sql.graftshim.ColumnBridge
    import org.apache.spark.sql.functions.xxhash64
    val payload = base.columns.filterNot(_ == keyCol)
    val latest = changes
      .groupBy(qcol(keyCol))
      .agg(max_by(struct((opCol +: payload).map(qcol): _*),
        struct(qcol(seqCol), qcol(opCol))).as("__latest"))
      .select(qcol(keyCol) +: (opCol +: payload).map(c =>
        col(s"`__latest`.`$c`").as(c)): _*)
      .transform(graft.SparkUtil.scopedPersist) // feeds bloom build + anti-join + upserts
    val idealBits = math.ceil(-expectedChangedKeys * math.log(fpp) /
      (math.log(2) * math.log(2))).toLong
    val maxBits = base.sparkSession.conf
      .get("spark.sql.optimizer.runtime.bloomFilter.maxNumBits", "67108864").toLong
    val bloom = latest.agg(ColumnBridge.column(
      new BloomFilterAggregate(
        ColumnBridge.expression(xxhash64(qcol(keyCol))),
        Literal(expectedChangedKeys),
        Literal(math.min(idealBits, maxBits))).toAggregateExpression())
      .as("__bf")).head.getAs[Array[Byte]](0)
    // empty feed ⇒ null aggregate ⇒ nothing changed: the base IS the result
    if (bloom == null) return base.select(base.columns.map(qcol): _*)
    val probe = ColumnBridge.column(BloomFilterMightContain(
      ColumnBridge.expression(org.apache.spark.sql.functions.lit(bloom)),
      ColumnBridge.expression(xxhash64(qcol(keyCol)))))
    val pass = base.where(!probe) // provably untouched — never shuffles
    val residue = base.where(probe)
      .join(latest.select(qcol(keyCol)), Seq(keyCol), "left_anti")
    pass.unionByName(residue).unionByName(
      latest.where(qcol(opCol) =!= "D").select(base.columns.map(qcol): _*))
  }

  /** Incremental MATERIALIZED-VIEW maintenance of a per-group
    * (count, sum) aggregate under a CDC feed — the lakehouse pattern that
    * makes dashboards affordable at 100 TB: instead of re-aggregating the
    * snapshot after every merge, the stored view absorbs a DELTA built
    * from feed-proportional work only. Removals read each changed key's
    * OLD row (one semi-join of base against the collapsed changed-key set
    * — the only base touch, and exactly the slice [[applyChangesPruned]]
    * would bloom-gate); additions are the upsert payloads. Counts and
    * integer-valued sums make the maintained view equal the full
    * recompute BIT-FOR-BIT — the property the gate's oracle checks by
    * recomputing from the applied snapshot.
    *
    * `view` carries (groupCol, n_rows, sum_val) — the stored state;
    * groups whose maintained count reaches 0 drop (a recompute would not
    * produce them either).
    */
  def maintainGroupCounts(view: DataFrame, base: DataFrame,
      changes: DataFrame, keyCol: String, seqCol: String, opCol: String,
      groupCol: String, valCol: String): DataFrame = {
    val payload = base.columns.filterNot(_ == keyCol)
    val latest = changes
      .groupBy(qcol(keyCol))
      .agg(max_by(struct((opCol +: payload).map(qcol): _*),
        struct(qcol(seqCol), qcol(opCol))).as("__latest"))
      .select(qcol(keyCol) +: (opCol +: payload).map(c =>
        col(s"`__latest`.`$c`").as(c)): _*)
      .transform(graft.SparkUtil.scopedPersist)
    val removed = base.join(latest.select(qcol(keyCol)), Seq(keyCol))
      .select(qcol(groupCol).as("__g"), lit(-1L).as("__dc"),
        (-qcol(valCol)).as("__dv"))
    val added = latest.where(qcol(opCol) =!= "D")
      .select(qcol(groupCol).as("__g"), lit(1L).as("__dc"),
        qcol(valCol).cast("long").as("__dv"))
    val delta = removed.unionByName(added)
      .groupBy("__g").agg(sum(col("__dc")).as("__dcs"), sum(col("__dv")).as("__dvs"))
    view.join(delta, qcol(groupCol) === col("__g"), "full_outer")
      .select(coalesce(qcol(groupCol), col("__g")).as(groupCol),
        (coalesce(col("n_rows"), lit(0L)) + coalesce(col("__dcs"), lit(0L)))
          .as("n_rows"),
        (coalesce(col("sum_val"), lit(0L)) + coalesce(col("__dvs"), lit(0L)))
          .as("sum_val"))
      .where(col("n_rows") > 0)
  }

  /** Build a type-2 (validity-interval) history from a change log: one row
    * per (key, attribute-change), with `valid_from` = the change's
    * timestamp, `valid_to` = the NEXT change's timestamp (null while
    * current), and `is_current`. Consecutive rows whose `attrCols` are
    * unchanged collapse into the earlier row's interval — only genuine
    * transitions open a new version.
    *
    * `tieCol` pins the order of same-timestamp rows per key (pass a
    * per-row-unique column such as an event id) so the history is
    * deterministic.
    *
    * [Scale] One shuffle total: both windows partition by `keyCol` with
    * the same `(ts, tie)` sort, so Catalyst plans a single exchange + sort
    * feeding both Window operators — the change-detect filter between them
    * preserves partitioning and order.
    */
  def scd2History(log: DataFrame, keyCol: String, tsCol: String,
      tieCol: String, attrCols: Seq[String]): DataFrame = {
    require(attrCols.nonEmpty, "attrCols must be non-empty")
    val w = Window.partitionBy(qcol(keyCol)).orderBy(qcol(tsCol), qcol(tieCol))
    val attrs = struct(attrCols.map(qcol): _*)
    log
      .withColumn("__prev", lag(attrs, 1).over(w))
      // null-safe: the first row per key (prev null) is always a transition
      .where(!(attrs <=> col("__prev")))
      .drop("__prev")
      .withColumn("valid_from", qcol(tsCol))
      .withColumn("valid_to", lead(qcol(tsCol), 1).over(w))
      .withColumn("is_current", col("valid_to").isNull)
  }
}
