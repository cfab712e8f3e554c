package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-layout operators. At 100 TB the scan is the query: files are
  * skipped (or not) on their per-file column min/max ranges, and a layout
  * clustered on ONE key only prunes predicates on that key. Z-ordering
  * (the Morton space-filling curve — the public Delta/Iceberg `OPTIMIZE
  * ZORDER BY` technique) interleaves the bits of two keys so that sorting
  * by the single z-value keeps BOTH keys' min/max ranges tight in every
  * file, making two-column point/range predicates prunable from one
  * physical ordering.
  */
object Layout {

  /** 2-D Morton z-value: interleave the low `bits` bits of two
    * non-negative integer keys — x on even bit positions, y on odd. A
    * fixed-depth tree of builtin shift/mask ops: codegen'd end to end,
    * zero shuffles, and replayed bit-for-bit by the oracle with the same
    * shift arithmetic. Callers bound/normalize keys into `[0, 2^bits)`
    * first (higher bits are deliberately ignored, the standard Morton
    * truncation).
    */
  def zValue(x: Column, y: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, s"bits in [1,31], got $bits")
    val xl = x.cast("long")
    val yl = y.cast("long")
    (0 until bits).map { i =>
      shiftleft(shiftright(xl, i).bitwiseAND(lit(1L)), 2 * i)
        .bitwiseOR(shiftleft(shiftright(yl, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }.reduce(_ bitwiseOR _)
  }

  /** Rewrite `df` into a z-ordered layout on (xCol, yCol): range-partition
    * by z-value into `partitions` output files and sort within each — the
    * write-side shape of `OPTIMIZE ZORDER BY`. One range exchange (with
    * Spark's sampled range bounds) carrying the full row exactly once; at
    * 100 TB `partitions` is sized so each output file lands near the
    * rowgroup-friendly 128 MB-1 GB band.
    */
  def zOrderBy(df: DataFrame, xCol: String, yCol: String, bits: Int,
      partitions: Int): DataFrame = {
    require(partitions >= 1, s"partitions >= 1, got $partitions")
    df.withColumn("__z", zValue(col(xCol), col(yCol), bits))
      .repartitionByRange(partitions, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
  }

  /** Per-bucket min/max evidence table under an arbitrary clustering
    * order: split the total (orderExpr, tieCol) order into `buckets`
    * equal runs (bucket = ⌊idx·B/n⌋, 0-based) and report each run's
    * bounding box over the two keys — exactly the per-file statistics a
    * reader prunes on. Tight boxes ⇒ predicates on EITHER key skip most
    * buckets.
    *
    * Scale shape: distributed sort + `zipWithIndex` (the vocabulary-index
    * pattern — order-preserving, per-partition offsets, NO global window
    * funneling the corpus through one task), then one map-side-combined
    * aggregate on the bucket id. Exchanges carry (long, long, long) rows.
    */
  def clusteredBucketStats(df: DataFrame, xCol: String, yCol: String,
      orderExpr: Column, buckets: Int, tieCol: String): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.{LongType, StructField, StructType}
    require(buckets >= 1, s"buckets >= 1, got $buckets")
    val spark = df.sparkSession
    val sorted = graft.SparkUtil.scopedPersist(
      df.select(col(xCol).cast("long").as("x"), col(yCol).cast("long").as("y"),
          orderExpr.cast("long").as("__ord"), col(tieCol).cast("long").as("__t"))
        .sort("__ord", "__t").select("x", "y"))
    val n = sorted.count()
    val b = buckets.toLong
    val rdd = sorted.rdd.zipWithIndex().map { case (r, i) =>
      Row(r.getLong(0), r.getLong(1), i * b / n)
    }
    spark.createDataFrame(rdd, StructType(Seq(
        StructField("x", LongType, nullable = false),
        StructField("y", LongType, nullable = false),
        StructField("bucket", LongType, nullable = false))))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_rows"),
        min("x").as("x_min"), max("x").as("x_max"),
        min("y").as("y_min"), max("y").as("y_max"))
  }

  /** [[clusteredBucketStats]] under the z-order itself — the evidence
    * table that a `zOrderBy` layout keeps both keys' per-file ranges
    * tight.
    */
  def zOrderBucketStats(df: DataFrame, xCol: String, yCol: String,
      bits: Int, buckets: Int, tieCol: String): DataFrame =
    clusteredBucketStats(df, xCol, yCol,
      zValue(col(xCol), col(yCol), bits), buckets, tieCol)

  /** Small-file compaction plan (the lakehouse `OPTIMIZE` bin-packing
    * step): assign each manifest file to a rewrite bin so bins approach
    * `targetBytes`. Sequential fill in `fileCol` order per partition —
    * bin = (running-size start offset) div target — a deterministic rule
    * both engines replay exactly, unlike best-fit heuristics whose output
    * depends on iteration order. A file larger than the target keeps its
    * whole bin (files are never split); `n_in_bin = 1` marks files the
    * rewrite can skip.
    *
    * [Scale] The manifest is METADATA — one row per file, not per data
    * row (a 100 TB table at 128 MB files is ~800k rows), so the plan is
    * a sub-second computation regardless of table size. One exchange on
    * the partition key feeds both windows: hash(part) satisfies the
    * (part, bin) clustering, so the bin-stats window adds only a local
    * re-sort, never a second exchange (plan-asserted in OperatorSpec).
    */
  def compactionPlan(manifest: DataFrame, partCol: String, fileCol: String,
      sizeCol: String, targetBytes: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(targetBytes >= 1, s"targetBytes >= 1, got $targetBytes")
    val w = Window.partitionBy(col(partCol)).orderBy(col(fileCol))
    val planned = manifest
      .withColumn("__start",
        coalesce(sum(col(sizeCol)).over(w) - col(sizeCol), lit(0L)))
      .withColumn("bin", expr(s"__start div ${targetBytes}L"))
      .drop("__start")
    val wb = Window.partitionBy(col(partCol), col("bin"))
    planned
      .withColumn("n_in_bin", count(lit(1)).over(wb))
      .withColumn("bin_bytes", sum(col(sizeCol)).over(wb))
  }

  /** 2-D HILBERT curve index (Hilbert 1891; the xy2d bit algorithm in its
    * public textbook form) — the clustering key with strictly better
    * locality than [[zValue]]: consecutive Hilbert indices are ALWAYS
    * grid-adjacent (Manhattan step 1), where Morton order jumps across
    * the plane at quadrant boundaries — fewer files overlap a 2-D range
    * predicate, the reason engines moved OPTIMIZE from Z-order to Hilbert.
    *
    * Implemented as a CHAINED PROJECTION (one narrow Project per bit
    * level carrying (x, y, d) by COLUMN REFERENCE): each level's rotation
    * reads both prior coordinates, so a single folded expression would
    * re-inline the whole prior tree into each operand and grow
    * exponentially with `bits`. Column-name indirection keeps the plan
    * linear; Catalyst collapses the chain into one codegen'd stage.
    * Callers bound keys into `[0, 2^bits)` first (Morton-truncation
    * convention). Appends `out` and leaves other columns untouched.
    */
  def withHilbertIndex(df: DataFrame, x: Column, y: Column, bits: Int,
      out: String): DataFrame = {
    require(bits >= 1 && bits <= 31, s"bits in [1,31], got $bits")
    var cur = df.withColumn("__hx", x.cast("long"))
      .withColumn("__hy", y.cast("long"))
      .withColumn(out, lit(0L))
    for (level <- bits - 1 to 0 by -1) {
      val s = 1L << level
      val rx = when(col("__hx").bitwiseAND(lit(s)) > 0, lit(1L)).otherwise(lit(0L))
      val ry = when(col("__hy").bitwiseAND(lit(s)) > 0, lit(1L)).otherwise(lit(0L))
      cur = cur
        .withColumn("__rx", rx)
        .withColumn("__ry", ry)
        .withColumn(out, col(out) +
          lit(s * s) * (lit(3L) * col("__rx")).bitwiseXOR(col("__ry")))
        // flip-then-swap rotation: x' = (rx ? s-1-y : y), y' = (rx ? s-1-x : x)
        // when ry == 0; identity otherwise
        .withColumn("__nx", when(col("__ry") === 0,
          when(col("__rx") === 1, lit(s - 1) - col("__hy"))
            .otherwise(col("__hy"))).otherwise(col("__hx")))
        .withColumn("__ny", when(col("__ry") === 0,
          when(col("__rx") === 1, lit(s - 1) - col("__hx"))
            .otherwise(col("__hx"))).otherwise(col("__hy")))
        .withColumn("__hx", col("__nx"))
        .withColumn("__hy", col("__ny"))
    }
    cur.drop("__hx", "__hy", "__rx", "__ry", "__nx", "__ny")
  }
}
