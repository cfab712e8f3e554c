package graft

import graft.operators.MinHashLSH
import graft.sources.IndexStore
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class IndexStoreSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("bucketed index + bucketed docs join with no shuffle exchange") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id").cast("long").as(Cols.Id), col("text"))
    val model = new MinHashLSH(MinHashConfig(numHash = 16, numBands = 4, numRows = 4))
      .fit(docs, Cols.Id, "text")

    // the in-memory catalog forgets tables between JVMs but their warehouse
    // directories survive — clear them so saveAsTable doesn't refuse
    for (t <- Seq("graft_index_bucketed", "graft_docs_bucketed")) {
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val loc = new java.io.File(s"spark-warehouse/$t")
      if (loc.exists()) {
        import scala.reflect.io.Directory
        new Directory(loc).deleteRecursively()
      }
    }
    IndexStore.saveBucketed(model.indexDf, "graft_index_bucketed", 8)
    IndexStore.saveBucketed(docs, "graft_docs_bucketed", 8)

    val ix = IndexStore.load(spark, "graft_index_bucketed")
    val dd = IndexStore.load(spark, "graft_docs_bucketed")
    val joined = ix.join(dd, Seq(Cols.Id))

    assert(joined.count() == docs.count())
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"),
      s"expected shuffle-free bucketed join, got:\n$plan")

    // and the same join against an UNbucketed side does shuffle — the
    // assertion above is meaningful, not vacuous
    val unbucketed = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id").cast("long").as(Cols.Id), col("text"))
    val mixed = ix.join(unbucketed, Seq(Cols.Id))
    val mixedPlan = mixed.queryExecution.executedPlan.toString
    mixed.count()
    assert(mixedPlan.contains("Exchange") || mixedPlan.contains("Broadcast"),
      s"expected exchange/broadcast on unbucketed side:\n$mixedPlan")
    model.unpersist()
  }
}
