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
}
