package graft

import org.apache.spark.sql.SparkSession

/** One shared local session for all suites. Installs the engine's
  * SparkSessionExtensions (SQL function surface) the way a user would —
  * suites must see exactly what `spark.sql.extensions=graft.plans.
  * GraftExtensions` produces.
  */
object TestSpark {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.optimizer.excludedRules",
      "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate")
    .withExtensions(new graft.plans.GraftExtensions)
    .getOrCreate()
}
