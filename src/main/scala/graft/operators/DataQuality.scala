package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality constraint checks — the validation layer a
  * lakehouse pipeline runs before promoting a snapshot (dbt tests /
  * Delta constraints shape): each check reduces to ONE exact violation
  * count, so a 100 TB table validates in a single pass per check with
  * nothing but (check, count) rows ever reaching the driver.
  *
  * Scale shape per check: not-null and predicate checks are map-side
  * combined conditional counts inside the scan (zero extra exchanges);
  * the unique-key check is one partial-aggregated count-distinct over
  * the key projection; referential integrity is a key-projected
  * left-anti join (decision-sized: keys only, never payload), with no
  * broadcast hint so a pathological parent still shuffles instead of
  * dying at the broadcast ceiling.
  */
object DataQuality {

  /** One-row frame: rows where any `cols` is null. */
  private def notNullViolations(df: DataFrame, c: String): DataFrame =
    df.agg(count(when(col(c).isNull, 1)).as("n_violations"))
      .select(lit(s"not_null:$c").as("check_name"), col("n_violations"))

  /** One-row frame: extra rows beyond one per distinct key tuple (rows
    * with a NULL in the key are excluded — cover those with a not-null
    * check; SQL UNIQUE likewise ignores nulls).
    */
  private def uniqueViolations(df: DataFrame, cols: Seq[String]): DataFrame = {
    val key = struct(cols.map(col): _*)
    df.where(cols.map(col(_).isNotNull).reduce(_ && _))
      .agg((count(lit(1)) - count_distinct(key)).as("n_violations"))
      .select(lit(s"unique:${cols.mkString(",")}").as("check_name"),
        col("n_violations"))
  }

  /** One-row frame: non-null child keys with no matching parent key. */
  private def refViolations(child: DataFrame, childKey: String,
      parent: DataFrame, parentKey: String): DataFrame =
    child.select(col(childKey).as("__dq_k")).where(col("__dq_k").isNotNull)
      .join(parent.select(col(parentKey).as("__dq_k")).distinct(),
        Seq("__dq_k"), "left_anti")
      .agg(count(lit(1)).as("n_violations"))
      .select(lit(s"ref:$childKey->$parentKey").as("check_name"),
        col("n_violations"))

  /** One-row frame: rows FAILING `pred` (null predicate counts as a
    * failure — an unevaluable constraint is not a passing one).
    */
  private def predicateViolations(df: DataFrame, name: String,
      pred: Column): DataFrame =
    df.agg(count(when(!coalesce(pred, lit(false)), 1)).as("n_violations"))
      .select(lit(s"check:$name").as("check_name"), col("n_violations"))

  /** ANALYZE-style column profile: one (column, n_rows, n_nulls,
    * n_distinct) row per requested column — the table-stats surface a
    * catalog needs for join planning and a pipeline needs for drift
    * checks. Exact counts only (no min/max: cross-engine rendering of
    * floating-point extrema is not a stable comparison surface).
    *
    * Scale shape: one partial-aggregated pass PER COLUMN (count +
    * conditional count + count-distinct on a single-column projection);
    * the per-column jobs are independent — a scheduler runs them
    * concurrently — and nothing but the stat rows reaches the driver.
    * Distinct is exact by design; swap in approx_count_distinct upstream
    * when 2% error is acceptable and the column is ultra-high-cardinality.
    */
  def columnProfile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "columnProfile: no columns requested")
    cols.map { c =>
      df.select(col(c)).agg(count(lit(1)).as("n_rows"),
          count(when(col(c).isNull, 1)).as("n_nulls"),
          count_distinct(col(c)).as("n_distinct"))
        .select(lit(c).as("column_name"), col("n_rows"), col("n_nulls"),
          col("n_distinct"))
    }.reduce(_.unionAll(_))
  }

  /** Schema + profile drift between two table snapshots — the
    * data-contract check a pipeline runs when a new upstream delivery
    * lands: per column, its presence in each snapshot (added / dropped /
    * kept), the declared type on each side, and the exact null-count
    * delta for kept columns. A full-outer join of the two (bounded,
    * schema-sized) profile frames plus the driver-side schema maps —
    * nothing data-sized ever moves beyond the two profile passes.
    */
  def schemaDrift(a: DataFrame, b: DataFrame): DataFrame = {
    val spark = a.sparkSession
    import spark.implicits._
    val typesA = a.schema.map(f => f.name -> f.dataType.catalogString).toMap
    val typesB = b.schema.map(f => f.name -> f.dataType.catalogString).toMap
    val pa = columnProfile(a, a.columns.toSeq)
      .select(col("column_name"), col("n_nulls").as("nulls_a"),
        col("n_distinct").as("distinct_a"))
    val pb = columnProfile(b, b.columns.toSeq)
      .select(col("column_name"), col("n_nulls").as("nulls_b"),
        col("n_distinct").as("distinct_b"))
    val typeRows = (typesA.keySet ++ typesB.keySet).toSeq.sorted.map { c =>
      (c, typesA.get(c).orNull, typesB.get(c).orNull)
    }.toDF("column_name", "type_a", "type_b")
    typeRows
      .join(pa, Seq("column_name"), "left")
      .join(pb, Seq("column_name"), "left")
      .withColumn("status",
        when(col("type_a").isNull, "added")
          .when(col("type_b").isNull, "dropped")
          .when(col("type_a") =!= col("type_b"), "type_changed")
          .otherwise("kept"))
      .select(col("column_name"), col("status"), col("type_a"), col("type_b"),
        col("nulls_a"), col("nulls_b"),
        (coalesce(col("nulls_b"), lit(0L)) - coalesce(col("nulls_a"), lit(0L)))
          .as("null_delta"))
  }

  /** Population Stability Index between two snapshots of a numeric
    * signal — the standard production drift monitor (banking/ML-ops
    * folklore; PSI < 0.1 stable, 0.1-0.25 moderate, > 0.25 shifted):
    * per fixed bucket `(pA − pB) · ln(pA / pB)` with add-one count
    * smoothing so empty buckets stay finite. FIXED cutoffs by design
    * (the CCNet-cutoff convention) — corpus-derived quantile cutoffs
    * would make the reference frame drift with the data it monitors.
    * Output: one row per bucket (bucket, n_a, n_b, term6); the PSI is
    * the sum of terms.
    *
    * Scale shape: two map-side-combined bucket counts (one pass per
    * snapshot) joined on a ≤ cutoffs+1-row spine — only bucket rows ever
    * reach the driver or cross an exchange.
    */
  def psiBuckets(a: DataFrame, b: DataFrame, valueCol: String,
      cutoffs: Seq[Double]): DataFrame = {
    require(cutoffs.nonEmpty && cutoffs == cutoffs.sorted,
      s"cutoffs must be non-empty and ascending, got $cutoffs")
    val k = cutoffs.length
    def bucketOf(v: Column): Column =
      cutoffs.zipWithIndex.foldRight(lit(k)) { case ((c, i), acc) =>
        when(v < c, i).otherwise(acc)
      }
    def counts(df: DataFrame, out: String): DataFrame =
      df.select(bucketOf(col(valueCol).cast("double")).as("bucket"))
        .groupBy("bucket").agg(count(lit(1)).as(out))
    val spine = a.sparkSession.range(0, k + 1).select(col("id").cast("int").as("bucket"))
    val joined = spine
      .join(counts(a, "n_a"), Seq("bucket"), "left")
      .join(counts(b, "n_b"), Seq("bucket"), "left")
      .withColumn("n_a", coalesce(col("n_a"), lit(0L)))
      .withColumn("n_b", coalesce(col("n_b"), lit(0L)))
    val totA = sum(col("n_a")).over(org.apache.spark.sql.expressions.Window
      .partitionBy(lit(1)))
    val totB = sum(col("n_b")).over(org.apache.spark.sql.expressions.Window
      .partitionBy(lit(1)))
    // add-one smoothing: pX = (nX + 1) / (totX + k + 1); the spine is
    // bounded, so the single-partition total window is safe
    joined
      .withColumn("__pa", (col("n_a") + 1).cast("double") / (totA + k + 1))
      .withColumn("__pb", (col("n_b") + 1).cast("double") / (totB + k + 1))
      .select(col("bucket"), col("n_a"), col("n_b"),
        round((col("__pa") - col("__pb")) * log(col("__pa") / col("__pb")), 6)
          .as("term6"))
  }

  /** The full report: one (check, n_violations) row per declared
    * constraint, in declaration order (union of one-row aggregates — each
    * check stays an independent single-pass job).
    */
  def constraintReport(df: DataFrame,
      notNull: Seq[String] = Nil,
      uniqueKeys: Seq[Seq[String]] = Nil,
      refs: Seq[(String, DataFrame, String)] = Nil,
      predicates: Seq[(String, Column)] = Nil): DataFrame = {
    val checks =
      notNull.map(notNullViolations(df, _)) ++
      uniqueKeys.map(uniqueViolations(df, _)) ++
      refs.map { case (ck, parent, pk) => refViolations(df, ck, parent, pk) } ++
      predicates.map { case (n, p) => predicateViolations(df, n, p) }
    require(checks.nonEmpty, "constraintReport: no constraints declared")
    checks.reduce(_.unionAll(_))
  }

  /** Robust per-group outlier statistics (median / MAD — Hampel's rule):
    * for each key, the exact median, the median absolute deviation, and
    * the count of rows with `|x − med| > k·MAD`. The mean/stddev z-score
    * breaks down exactly when outliers are present (they inflate the
    * stddev that is supposed to flag them); median/MAD has a 50%
    * breakdown point. Exact sort-based medians (the agg_median
    * convention — deterministic, engine-identical incl. the two-middle
    * average), so the flag verdicts are bit-reproducible; no sampling,
    * no approximation.
    *
    * Scale shape: two grouped exact medians = two sort-based aggregations
    * over narrow (key, double) projections, plus one map-side-combined
    * conditional count; the group medians join back as key-sized frames.
    */
  def madOutlierStats(df: DataFrame, keyCol: String, valueCol: String,
      k: Double): DataFrame = {
    require(k > 0, s"k must be > 0, got $k")
    val vals = df.select(col(keyCol), col(valueCol).cast("double").as("__v"))
      .where(col("__v").isNotNull)
    val med = vals.groupBy(keyCol).agg(median(col("__v")).as("__med"))
    val dev = vals.join(med, Seq(keyCol))
      .withColumn("__dev", abs(col("__v") - col("__med")))
    val mad = dev.groupBy(keyCol).agg(median(col("__dev")).as("__mad"))
    dev.join(mad, Seq(keyCol))
      .groupBy(keyCol)
      .agg(count(lit(1)).as("n"),
        round(first(col("__med")), 6).as("med6"),
        round(first(col("__mad")), 6).as("mad6"),
        sum(when(col("__dev") > col("__mad") * k, 1L).otherwise(0L))
          .as("n_outliers"))
  }

  /** k-anonymity audit over a quasi-identifier tuple (Sweeney 2002): a
    * release is k-anonymous when every equivalence class — rows sharing
    * the full quasi-identifier value — has at least k members. One exact
    * summary row: class count, classes below k, rows those classes expose,
    * and the class-size extremes (min = the achieved anonymity level).
    *
    * Scale shape: one map-side-combined count per class (the only
    * exchange, keyed on the quasi tuple — decision-sized), then a scalar
    * roll-up of the class-size frame. Rows with a NULL quasi value form
    * their own class (NULL-safe grouping), matching the release semantics:
    * a null attribute still partitions the published table.
    */
  /** Persist a PER-(group, partition) KMV cardinality snapshot as a
    * managed table — the sketch half of the lakehouse monitoring loop:
    * a daily job appends its partition's per-group sketches (k longs per
    * group — bounded regardless of row count), and later audits merge
    * them WITHOUT re-reading the data, the re-aggregation property
    * `agg_kmv_reagg` pins (k smallest of a union = k smallest of the
    * k-smallest sets). One map-side-combined aggregate per save; only
    * (group, part, k·8 bytes) rows reach the writer.
    */
  def saveKmvSnapshot(df: DataFrame, groupCol: String, partCol: Column,
      keyCol: String, k: Int, table: String): Unit = {
    val snap = df
      .groupBy(col(groupCol).as("grp"), partCol.as("part"))
      .agg(graft.functions.Sketches.kmvAgg(xxhash64(col(keyCol)), k).as("sk"))
    snap.write.mode(org.apache.spark.sql.SaveMode.Overwrite)
      .format("parquet").saveAsTable(table)
  }

  /** Cardinality drift between two persisted KMV snapshots (the
    * `dq_schema_drift` shape for distinct counts): reload both tables,
    * merge each group's per-partition sketches back to one sketch
    * (array-union + k-cut — exact re-aggregation), estimate distinct
    * keys per group on each side, and flag groups whose relative change
    * reaches `driftFloorMicro` (micro-units, integer arithmetic). Below
    * sketch capacity the estimates are EXACT, so gate-scale results
    * replay against `count(DISTINCT ...)` in any engine; above capacity
    * the same report degrades gracefully to the (k−1)/θ estimate.
    * Groups absent from one snapshot report 0 there (a vanished group is
    * 100% drift, not a dropped row). Everything after the table scans is
    * decision-sized: (group, sketch) rows, one join on the group key.
    */
  def cardinalityDrift(spark: org.apache.spark.sql.SparkSession,
      tableA: String, tableB: String, k: Int,
      driftFloorMicro: Long = 100000L): DataFrame = {
    def merged(table: String, out: String): DataFrame =
      spark.table(table).groupBy("grp")
        .agg(slice(array_sort(array_distinct(flatten(collect_list(col("sk"))))),
          1, k).as("__m"))
        .select(col("grp"),
          graft.functions.Sketches.kmvDistinct(col("__m"), k)
            .cast("long").as(out))
    merged(tableA, "est_a")
      .join(merged(tableB, "est_b"), Seq("grp"), "full_outer")
      .select(col("grp"),
        coalesce(col("est_a"), lit(0L)).as("est_a"),
        coalesce(col("est_b"), lit(0L)).as("est_b"))
      .withColumn("drift_micro",
        expr("abs(est_b - est_a) * 1000000 div greatest(est_a, 1)"))
      .withColumn("drifted", col("drift_micro") >= driftFloorMicro)
  }

  /** Per-group WINSORIZED statistics with EXACT rank-based cut points
    * (the `agg_median` sort-based convention — no approximate
    * percentiles): values clamp to the [k_lo, k_hi]-ranked values where
    * `k_lo = ceil(loPct·n)` and `k_hi = floor(hiPct·n)` (clamped to
    * [1, n]), ranks pinned by (value, tieCol). All arithmetic runs on
    * micro-rounded longs, so cut points, clamp counts, and the
    * winsorized sum replay bit-for-bat in any engine — the robust
    * alternative to trimming when row counts must be preserved (Tukey's
    * convention; [[madOutlierStats]] flags, this REPAIRS).
    *
    * Scale shape: one per-group sort window over (key, micro, tie)
    * decision rows, cut extraction as a conditional aggregate (never a
    * collect), one broadcastable per-group cut join back.
    */
  def winsorizedStats(df: DataFrame, keyCol: String, valCol: String,
      tieCol: String, loPctMicro: Long = 50000L,
      hiPctMicro: Long = 950000L): DataFrame = {
    require(loPctMicro >= 0 && hiPctMicro <= 1000000L &&
      loPctMicro < hiPctMicro, "need 0 <= lo < hi <= 1e6")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("__k").orderBy(col("__m"), col("__tie"))
    val ranked = df.select(col(keyCol).as("__k"),
        round(col(valCol) * 1e6).cast("long").as("__m"),
        col(tieCol).as("__tie"))
      .withColumn("__rn", row_number().over(w))
      .transform(graft.SparkUtil.scopedPersist)
    val withN = ranked.join(
      ranked.groupBy("__k").agg(count(lit(1)).as("n")), Seq("__k"))
      .withColumn("__klo",
        greatest(lit(1L), expr(s"(n * $loPctMicro + 999999) div 1000000")))
      .withColumn("__khi",
        least(col("n"), greatest(lit(1L), expr(s"(n * $hiPctMicro) div 1000000"))))
    val cutVals = withN.groupBy("__k")
      .agg(max(col("n")).as("n"),
        max(when(col("__rn") === col("__klo"), col("__m"))).as("lo_cut_micro"),
        max(when(col("__rn") === col("__khi"), col("__m"))).as("hi_cut_micro"))
    withN.select(col("__k"), col("__m"))
      .join(cutVals, Seq("__k"))
      .groupBy(col("__k").as(keyCol))
      .agg(max(col("n")).as("n"),
        max(col("lo_cut_micro")).as("lo_cut_micro"),
        max(col("hi_cut_micro")).as("hi_cut_micro"),
        sum(greatest(col("lo_cut_micro"), least(col("hi_cut_micro"), col("__m"))))
          .as("sum_winsorized_micro"),
        sum(when(col("__m") < col("lo_cut_micro"), 1L).otherwise(0L))
          .as("n_clamped_lo"),
        sum(when(col("__m") > col("hi_cut_micro"), 1L).otherwise(0L))
          .as("n_clamped_hi"))
  }

  def kAnonymityReport(df: DataFrame, quasi: Seq[String], k: Int): DataFrame = {
    require(quasi.nonEmpty, "kAnonymityReport: no quasi-identifiers declared")
    require(k > 1, s"kAnonymityReport: k must be > 1, got $k")
    df.groupBy(quasi.map(col): _*).agg(count(lit(1)).as("n"))
      .agg(count(lit(1)).as("n_classes"),
        sum(when(col("n") < k, 1L).otherwise(0L)).as("violating_classes"),
        sum(when(col("n") < k, col("n")).otherwise(0L)).as("rows_at_risk"),
        min(col("n")).as("min_class_size"),
        max(col("n")).as("max_class_size"))
      .select(lit(k.toLong).as("k"), col("n_classes"), col("violating_classes"),
        col("rows_at_risk"), col("min_class_size"), col("max_class_size"))
  }
}
