package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Join operators beyond plain equi-joins (training-pipeline extensions —
  * the reference has only equi-joins, SURVEY.md §2.3).
  */
object Joins {

  /** Backtick-quoted column ref: a plain `col("user.id")` would resolve as
    * a nested-field path, silently or fatally, for names containing dots.
    */
  private def qcol(name: String): Column = col(s"`$name`")

  /** Skew-salted equi-join: the manual hot-key defense for when AQE's
    * runtime skew splitting isn't available (AQE off, deterministic plan
    * required, or skew concentrated in a single key exceeding even split
    * thresholds). The probe side gets a per-ROW salt in [0, salt) derived
    * from `saltFrom` (pass any per-row-distinct column: a row id, an event
    * id — NOT the join key, which would put each hot key back in one
    * partition); the build side is replicated `salt` times. The join key
    * becomes (keys..., salt), so one hot key fans out over `salt` reducers
    * at the cost of a `salt`× build-side duplication. Results are exactly
    * the plain join's — replication guarantees every (probe row, build row)
    * key match still meets on exactly one salt value.
    */
  def saltedJoin(
      probe: DataFrame,
      build: DataFrame,
      probeKeys: Seq[String],
      buildKeys: Seq[String],
      saltFrom: Column,
      salt: Int,
      joinType: String = "inner"): DataFrame = {
    require(salt > 1, s"salt must be > 1, got $salt")
    // Only PROBE-preserving types are equivalent to the plain join: with a
    // build-preserving type (right/full outer), an unmatched build row was
    // replicated `salt` times by the explode and would be emitted once per
    // salt value — `salt` spurious null-padded rows instead of one.
    val allowed = Set("inner", "left", "left_outer", "leftouter",
      "left_semi", "leftsemi", "semi", "left_anti", "leftanti", "anti", "cross")
    require(allowed.contains(joinType.toLowerCase.replace(" ", "_")),
      s"saltedJoin supports only probe-preserving join types $allowed, got " +
        s"'$joinType' — build-preserving types would emit unmatched build rows salt times")
    require(probeKeys.nonEmpty && probeKeys.length == buildKeys.length,
      s"key lists must be non-empty and same length: $probeKeys vs $buildKeys")
    val p = probe.withColumn("__salt_p", pmod(xxhash64(saltFrom), lit(salt.toLong)).cast("int"))
    val b = build.withColumn("__salt_b", explode(sequence(lit(0), lit(salt - 1))))
    val cond = probeKeys.zip(buildKeys)
      .map { case (pk, bk) => p(pk) === b(bk) }
      .reduce(_ && _) && p("__salt_p") === b("__salt_b")
    p.join(b, cond, joinType).drop("__salt_p", "__salt_b")
  }

  /** Backward as-of join: for every left row, attach the payload of the
    * latest right row with `right.tsCol <= left.tsCol` for the same key
    * (the classic "most recent prior event/quote" lookup).
    *
    * Scale design: implemented as union → single window pass, ONE shuffle
    * on `keys` — no range-condition join (which Spark would plan as a
    * broadcast-nested-loop or cartesian), no per-key explosion. At 100 TB
    * the shuffle carries (keys, ts, payload) only.
    *
    * Tie semantics: a right row at exactly left.ts matches ("at or
    * before"); among right rows sharing the same (key, ts), the one with
    * the greatest `tieBreak` payload column wins — pass a unique column
    * (e.g. an event id) to make results deterministic.
    *
    * @param payloadCols right-side columns to attach, emitted as
    *                    `outPrefix + name` (null when no prior right row)
    */
  def asofJoinPrior(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      tsCol: String,
      payloadCols: Seq[String],
      tieBreak: String,
      outPrefix: String = "r_"): DataFrame =
    asofJoinImpl(left, right, keys, tsCol, payloadCols, tieBreak, outPrefix,
      forward = false)

  /** FORWARD as-of join — the "next right row AT OR AFTER left.ts per
    * key" counterpart of [[asofJoinPrior]] (the `ASOF ... <=` direction a
    * time-series engine pairs with backward as-of: next fill, next quote,
    * time-to-event). Identical machinery — the union is scanned in
    * DESCENDING event time, so `last(ignoreNulls)` carries the nearest
    * FUTURE right row instead of the nearest past one; tie semantics
    * mirror exactly (a right row at left.ts matches; greatest `tieBreak`
    * wins among equal (key, ts) rights). Same scale shape: ONE windowed
    * shuffle on the keys, no range join, no cartesian.
    */
  def asofJoinNext(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      tsCol: String,
      payloadCols: Seq[String],
      tieBreak: String,
      outPrefix: String = "r_"): DataFrame =
    asofJoinImpl(left, right, keys, tsCol, payloadCols, tieBreak, outPrefix,
      forward = true)

  private def asofJoinImpl(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      tsCol: String,
      payloadCols: Seq[String],
      tieBreak: String,
      outPrefix: String,
      forward: Boolean): DataFrame = {
    require(keys.nonEmpty, "asofJoin needs at least one key column")
    val keyCols: Seq[Column] = keys.map(qcol)
    val leftType = org.apache.spark.sql.types.StructType(
      left.columns.map(c => left.schema(c)))
    val rightType = org.apache.spark.sql.types.StructType(
      payloadCols.map(c => right.schema(c)))

    // tag 0 sorts right rows before left at equal ts ⇒ "at or before".
    // __tie keeps the tieBreak column's own type — a cast (e.g. to long)
    // would silently null out string/uuid tie-breakers and lose the
    // determinism guarantee.
    val tieType = right.schema(tieBreak).dataType
    val l = left.select(
      keyCols :+ qcol(tsCol).as("__ts") :+ lit(1).as("__tag") :+
        lit(null).cast(tieType).as("__tie") :+
        struct(left.columns.map(qcol): _*).as("__l") :+
        lit(null).cast(rightType).as("__r"): _*)
    val r = right.select(
      keyCols :+ qcol(tsCol).as("__ts") :+ lit(0).as("__tag") :+
        qcol(tieBreak).as("__tie") :+
        lit(null).cast(leftType).as("__l") :+
        struct(payloadCols.map(qcol): _*).as("__r"): _*)

    // nulls FIRST: a null tieBreak must lose to every non-null value —
    // nulls-last would let a null-tie row beat real tie-breakers. Ties
    // among multiple null tieBreaks remain arbitrary; pass a unique
    // non-null column for full determinism. Forward mode scans DESCENDING
    // time (the nearest FUTURE right row is the last non-null seen);
    // within an equal-(key, ts) group the ordering is unchanged, so a
    // right row at exactly left.ts still matches and the greatest
    // tieBreak still wins.
    val tsOrder = if (forward) col("__ts").desc else col("__ts").asc
    val w = Window.partitionBy(keyCols: _*)
      .orderBy(tsOrder, col("__tag").asc, col("__tie").asc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val joined = l.unionByName(r)
      .withColumn("__prior", last(col("__r"), ignoreNulls = true).over(w))
      .where(col("__tag") === 1)

    // getField, not string-path col(): a column name containing '.' must
    // resolve as one field, not a nested path
    val outCols = left.columns.map(c => col("__l").getField(c).as(c)) ++
      payloadCols.map(c => col("__prior").getField(c).as(outPrefix + c))
    joined.select(outCols: _*)
  }

  /** Interval × point range join via bucketed equi-join: one row per
    * (interval row, point row) with `startCol <= ts < endCol` and equal
    * keys.
    *
    * Scale design: Spark plans a raw inequality join as a broadcast-
    * nested-loop / cartesian product — quadratic per key. Instead, time is
    * quantized into `bucketMillis` cells; every interval explodes to the
    * cells it covers (ceil(len/bucket)+1 rows, 2 for interval ≈ bucket),
    * every point maps to exactly one cell, and the join becomes a plain
    * shuffled equi-join on (keys, cell) + a residual range filter. Each
    * point has one cell, so no pair can match twice — no distinct needed.
    * Pick `bucketMillis` near the typical interval length.
    *
    * Dirty-data bounds: inverted/empty intervals (`end <= start`)
    * contribute zero rows, and every interval's cell fan-out is capped at
    * `maxCellsPerInterval` — a sentinel end date (9999-12-31) would
    * otherwise explode one row into ~10⁸ cells. An interval longer than
    * `maxCellsPerInterval × bucketMillis` only matches points within that
    * horizon after `startCol` (size `bucketMillis` to the data so real
    * intervals span a handful of cells; the cap is an anti-sentinel guard,
    * not a tuning knob).
    *
    * @param intervals    frame with `startCol`/`endCol` timestamps
    * @param points       frame with `tsCol` timestamps; emitted columns are
    *                     the caller-selected `pointCols` (pre-alias to
    *                     avoid collisions with interval column names)
    */
  def rangeJoinBucketed(
      intervals: DataFrame,
      points: DataFrame,
      keys: Seq[String],
      startCol: String,
      endCol: String,
      tsCol: String,
      bucketMillis: Long,
      pointCols: Seq[String],
      maxCellsPerInterval: Int = 4096): DataFrame = {
    require(keys.nonEmpty, "rangeJoinBucketed needs at least one key column")
    require(bucketMillis > 0, "bucketMillis must be positive")
    require(maxCellsPerInterval > 0, "maxCellsPerInterval must be positive")
    // cell arithmetic in MICROS: Spark timestamps are microsecond-precision,
    // and millis truncation loses the final sub-millisecond of an interval —
    // an interval ending at cellBoundary+0.5ms would miss points in that
    // tail (they carry the next cell, the interval doesn't)
    val w = lit(bucketMillis * 1000L)
    // guard end > start: Spark's sequence() happily generates a DESCENDING
    // run for inverted intervals, exploding one dirty row into thousands of
    // spurious cells; empty/inverted intervals must contribute zero rows
    val loCell = floor(unix_micros(qcol(startCol)) / w).cast("long")
    val hiCell = least(
      floor((unix_micros(qcol(endCol)) - 1) / w).cast("long"),
      loCell + lit(maxCellsPerInterval.toLong - 1))
    val cells = when(qcol(endCol) > qcol(startCol), sequence(loCell, hiCell))
      .otherwise(lit(Array.empty[Long]))
    val iv = intervals.withColumn("__cell", explode(cells))
    val pt = points
      .select((keys.map(qcol) :+ qcol(tsCol)) ++ pointCols.map(qcol): _*)
      .withColumn("__cell", floor(unix_micros(qcol(tsCol)) / w).cast("long"))
    iv.join(pt, keys :+ "__cell")
      .where(qcol(tsCol) >= qcol(startCol) && qcol(tsCol) < qcol(endCol))
      .drop("__cell")
  }

  /** Interval × interval overlap join via the same cell blocking: one row
    * per (left, right) pair with equal keys and half-open overlap
    * `lStart < rEnd && rStart < lEnd`.
    *
    * Both sides explode to covered cells; overlapping intervals share at
    * least one cell, so a shuffled equi-join on (keys, cell) + the residual
    * overlap predicate finds every pair. A pair CAN share several cells —
    * the final projection dedups on the caller's id columns (pass one
    * unique id per side). Inverted intervals vanish (as in
    * [[rangeJoinBucketed]]), and per-interval cell fan-out is capped —
    * note the cap is a completeness bound, not just a dirty-data guard: an
    * interval longer than `maxCellsPerInterval × bucketMillis` only matches
    * partners overlapping within that horizon after its start. Size
    * `bucketMillis` near the typical interval length so real intervals
    * span a handful of cells.
    */
  def intervalOverlapJoin(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      lStart: String, lEnd: String, lId: String,
      rStart: String, rEnd: String, rId: String,
      bucketMillis: Long,
      maxCellsPerInterval: Int = 4096): DataFrame = {
    require(keys.nonEmpty, "intervalOverlapJoin needs at least one key column")
    require(bucketMillis > 0, "bucketMillis must be positive")
    // micros, not millis — see rangeJoinBucketed: millis truncation drops
    // overlaps confined to an interval's final sub-millisecond
    val w = lit(bucketMillis * 1000L)
    def cellsOf(s: String, e: String): Column = {
      val lo = floor(unix_micros(qcol(s)) / w).cast("long")
      val hi = least(
        floor((unix_micros(qcol(e)) - 1) / w).cast("long"),
        lo + lit(maxCellsPerInterval.toLong - 1))
      when(qcol(e) > qcol(s), sequence(lo, hi)).otherwise(lit(Array.empty[Long]))
    }
    val l = left.select((keys.map(qcol) :+ qcol(lId) :+ qcol(lStart) :+ qcol(lEnd)): _*)
      .withColumn("__cell", explode(cellsOf(lStart, lEnd)))
    val r = right.select((keys.map(qcol) :+ qcol(rId) :+ qcol(rStart) :+ qcol(rEnd)): _*)
      .withColumn("__cell", explode(cellsOf(rStart, rEnd)))
    l.join(r, keys :+ "__cell")
      .where(qcol(lStart) < qcol(rEnd) && qcol(rStart) < qcol(lEnd))
      .dropDuplicates(keys :+ lId :+ rId)
      .drop("__cell")
  }

  /** [[asofJoinPrior]] with a STALENESS BOUND — the market-data / feature-
    * store semantics: a prior right row older than `toleranceSeconds`
    * (exact microsecond comparison) is no better than no row, so its
    * payload nulls out. The join itself is unchanged (same one windowed
    * union shuffle); the bound is a post-join narrow projection, never a
    * range join. `payloadCols` must include `tsCol` (the bound needs the
    * matched row's timestamp — and a stale match nulls it too).
    */
  def asofJoinPriorWithin(left: DataFrame, right: DataFrame,
      keys: Seq[String], tsCol: String, payloadCols: Seq[String],
      tieBreak: String, outPrefix: String,
      toleranceSeconds: Long): DataFrame = {
    require(payloadCols.contains(tsCol),
      s"asofJoinPriorWithin needs '$tsCol' in payloadCols for the staleness test")
    require(toleranceSeconds >= 0, s"tolerance must be >= 0, got $toleranceSeconds")
    val joined = asofJoinPrior(left, right, keys, tsCol, payloadCols,
      tieBreak, outPrefix)
    // The staleness test must be MATERIALIZED before any payload column is
    // overwritten: nulling outPrefix+tsCol first would make a Column that
    // re-resolves per-step evaluate to null for every later payload column,
    // silently keeping stale values whenever tsCol isn't processed last.
    val withStale = joined.withColumn("__stale",
      unix_micros(qcol(tsCol)) -
        unix_micros(qcol(outPrefix + tsCol)) > toleranceSeconds * 1000000L)
    payloadCols.foldLeft(withStale) { (df, c) =>
      df.withColumn(outPrefix + c,
        when(qcol("__stale"), lit(null)).otherwise(qcol(outPrefix + c)))
    }.drop("__stale")
  }

  /** Bloom-pruned inner join — the explicit runtime-filter technique for a
    * selective dimension join at 100 TB: the small side's keys compress
    * into ONE bounded Bloom filter (partial-aggregated bit-OR, the driver
    * receives `numBits/8` bytes regardless of row count), and the big side
    * filters on `might_contain` BEFORE its shuffle — fact rows with no
    * possible partner never enter the exchange. The result is EXACTLY the
    * plain inner join: a Bloom filter has no false negatives, and false
    * positives die in the real join that follows (null big-side keys fall
    * out of the probe the same way the inner join drops them).
    *
    * This is what Spark's `InjectRuntimeFilter` does adaptively; the
    * explicit form guarantees the prune regardless of optimizer
    * heuristics/thresholds and makes the filter size a declared budget
    * (fpp 1e-6 ⇒ ~3.6 MB per million keys). Codegen'd end to end: the
    * build is Spark's `BloomFilterAggregate`, the probe its
    * `BloomFilterMightContain` (deserialized once per task, not per row).
    */
  def bloomPrunedJoin(big: DataFrame, small: DataFrame, bigKey: String,
      smallKey: String, expectedItems: Long = 1L << 20,
      fpp: Double = 1e-6): DataFrame = {
    require(bigKey != smallKey,
      "bloomPrunedJoin: key columns must have distinct names (alias one side)")
    import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
    import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
    import org.apache.spark.sql.graftshim.ColumnBridge
    val idealBits = math.ceil(
      -expectedItems * math.log(fpp) / (math.log(2) * math.log(2))).toLong
    // BloomFilterAggregate rejects numBits above
    // spark.sql.optimizer.runtime.bloomFilter.maxNumBits at ANALYSIS time
    // (default 64 MiB of bits = ~2.3M items at fpp 1e-6). Clamp instead of
    // failing: an undersized filter only degrades the achieved fpp — the
    // join stays exact because false positives die in the real join — so
    // at 100 TB scale the prune gets weaker, never wrong.
    val maxBits = big.sparkSession.conf
      .get("spark.sql.optimizer.runtime.bloomFilter.maxNumBits", "67108864").toLong
    val numBits = math.min(idealBits, maxBits)
    val agg = ColumnBridge.column(
      new BloomFilterAggregate(
        ColumnBridge.expression(xxhash64(qcol(smallKey))),
        Literal(expectedItems), Literal(numBits)).toAggregateExpression())
    val bloom = small.agg(agg.as("__bf")).head.getAs[Array[Byte]](0)
    val probe = ColumnBridge.column(BloomFilterMightContain(
      ColumnBridge.expression(lit(bloom)),
      ColumnBridge.expression(xxhash64(qcol(bigKey)))))
    big.where(probe).join(small, qcol(bigKey) === qcol(smallKey))
  }
}
