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
    Seq("graft_index_bucketed", "graft_docs_bucketed")
      .foreach(IndexStore.reset(spark, _))
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

  test("compact: max-seq wins per id, file count bounded, join stays shuffle-free") {
    val spark2 = spark
    import spark2.implicits._
    val table = "graft_index_compact_fix"
    Seq(table, table + "_compact_tmp").foreach(IndexStore.reset(spark, _))
    def batch(rows: Seq[(Long, String, Long)]) =
      rows.toDF(Cols.Id, "payload", "ingest_seq")
    // base build + two appends: id 1 superseded twice, id 2 once, id 3 never
    IndexStore.saveBucketed(
      batch(Seq((1L, "v1", 1L), (2L, "v1", 1L), (3L, "v1", 1L))), table, 4)
    IndexStore.appendBucketed(batch(Seq((1L, "v2", 2L), (2L, "v2", 2L))), table, 4)
    IndexStore.appendBucketed(batch(Seq((1L, "v3", 3L))), table, 4)
    assert(spark.table(table).count() == 6, "append log holds every version")
    // bucket count comes from the catalog spec, not a caller parameter —
    // a wrong constant here can no longer silently re-bucket the table
    assert(IndexStore.bucketCountOf(spark, table) == 4)
    IndexStore.compact(spark, table)
    val got = spark.table(table).orderBy(Cols.Id)
      .select(Cols.Id, "payload", "ingest_seq").as[(Long, String, Long)].collect()
    assert(got.toSeq == Seq((1L, "v3", 3L), (2L, "v2", 2L), (3L, "v1", 1L)),
      s"latest ingest must win per id: ${got.toSeq}")
    // one data file per bucket — the compaction's file-count bound
    val files = IndexStore.warehouseLocation(spark, table).listFiles()
      .filter(_.getName.endsWith(".parquet"))
    assert(files.length <= 4, s"expected <= 4 bucket files, got ${files.length}")
    // the compacted table still joins shuffle-free against a bucketed side
    val other = IndexStore.load(spark, table).select(col(Cols.Id), col("payload"))
    val self = IndexStore.load(spark, table).join(other, Seq(Cols.Id))
    self.count()
    assert(!self.queryExecution.executedPlan.toString
      .contains("Exchange hashpartitioning"),
      "compaction must preserve the bucketed shuffle-free join property")
  }
  test("inverted index: serve results invariant to the prefixLen layout knob") {
    import graft.operators.MinHashLSH
    val cfg = MinHashConfig(numHash = 16, numBands = 4, numRows = 4, bucketHexLen = 2)
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val key = docs.where(col("doc_id") === 0)
      .select("text").collect()(0).getString(0).take(120)
    val model = new MinHashLSH(cfg).fit(docs, "doc_id", "text")
    val results = Seq(1, 2).map { pl =>
      val t = s"graft_inverted_pl$pl"
      IndexStore.reset(spark, t)
      model.saveInvertedIndex(t, prefixLen = pl)
      model.approxNearestNeighborsIndexed(t, key, 10)
        .collect().toSeq
    }
    assert(results(0) == results(1),
      "prefixLen is a LAYOUT knob — results must be bit-identical across it")
    assert(results(0).nonEmpty)
    model.unpersist()
  }

  test("inverted index: append + compact supersedes stale postings; scans stay partition-backed") {
    import graft.operators.MinHashLSH
    val cfg = MinHashConfig(numHash = 16, numBands = 4, numRows = 4, bucketHexLen = 2)
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id").cast("long").as(Cols.Id), col("text"))
    val table = "graft_inverted_lifecycle"
    Seq(table, table + "_compact_tmp").foreach(IndexStore.reset(spark, _))
    val lsh = new MinHashLSH(cfg)
    def feat(df: org.apache.spark.sql.DataFrame, seq: Long) =
      lsh.featurize(df, Cols.Id, "text", None)
        .select(col(Cols.Id), col(Cols.Signature), col(Cols.BucketIds))
        .withColumn("ingest_seq", lit(seq))
    val prelim = docs.select(col(Cols.Id),
      when(col(Cols.Id) % 5 === 0, concat(lit("draft "), col("text")))
        .otherwise(col("text")).as("text"))
    IndexStore.saveInverted(feat(prelim, 1), table)
    IndexStore.appendInverted(feat(docs.where(col(Cols.Id) % 5 === 0), 2), table)
    IndexStore.compactInverted(spark, table)
    val compacted = IndexStore.loadInverted(spark, table)
    // the catalog-partition trap: a renamed PARTITIONED managed table must
    // still read its rows (the in-memory catalog keeps stale partition
    // locations without the MSCK repair) — a silent-zero regression guard
    assert(compacted.count() > 0, "compacted table must not read zero files")
    // supersession: every %5 doc serves ONLY its seq-2 (final) postings
    val stale = compacted.where(col(Cols.Id) % 5 === 0 && col("ingest_seq") =!= 2).count()
    assert(stale == 0, s"superseded postings survived compaction: $stale")
    // and the compacted postings equal a fresh build over the final corpus
    val fresh = feat(docs, 9L)
      .select(col(Cols.Id), explode(col(Cols.BucketIds)).as("bucket"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val got = compacted.select(col(Cols.Id), col("bucket"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got == fresh, "maintained posting set must equal a fresh build")
  }

}
