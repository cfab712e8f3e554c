package graft

import graft.operators.MinHashLSH
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pinned end-to-end goldens (FIXTURES.md §A.4 structure, regenerated on the
  * driver testdata): md5 mode is fully deterministic, so exact ids AND exact
  * float scores are pinned. Any kernel change that shifts hashing semantics
  * fails here before it fails the driver's DuckDB gate.
  */
class GoldenSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("flagship ANN golden: sf0.001, 120-char prefix of doc 0, full config") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val key = docs.where(col("doc_id") === 0).select("text")
      .collect()(0).getString(0).take(120)
    val m = new MinHashLSH(MinHashConfig()).fit(docs, "doc_id", "text")
    val got = m.approxNearestNeighbors(key, 10).collect()
      .map(r => (r.getLong(0), r.getFloat(2)))
    // near-dup family with exact pinned estimates, then the noise tail
    assert(got.take(3).toSeq == Seq((50L, 0.88f), (0L, 0.85f), (82L, 0.83f)))
    assert(got.drop(3).forall(_._2 <= 0.1f))
    m.unpersist()
  }

  private def formatted(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))

  test("plan properties: filter pushdown, pruned read schema, broadcast topk join") {
    val fltPlan = formatted(SparkEntry.queries("flt_predicate")(spark, "/root/testdata/sf0.001"))
    assert(fltPlan.contains("GreaterThanOrEqual(l_quantity,45.0)"),
      s"expected quantity pushdown in:\n$fltPlan")

    val prjPlan = formatted(SparkEntry.queries("prj_select")(spark, "/root/testdata/sf0.001"))
    assert(prjPlan.contains("struct<c_custkey:bigint,c_name:string,c_mktsegment:string>"),
      s"expected 3-column pruned scan in:\n$prjPlan")

    val topkPlan = formatted(SparkEntry.queries("join_docs_topk")(spark, "/root/testdata/sf0.001"))
    assert(topkPlan.contains("BroadcastHashJoin") || topkPlan.contains("BroadcastExchange"),
      s"expected broadcast join in:\n$topkPlan")
    assert(topkPlan.contains("TakeOrderedAndProject"),
      s"expected TakeOrderedAndProject in:\n$topkPlan")
  }
}
