package graft

import graft.operators.MinHashLSH
import graft.sources.DocumentSource
import graft.streaming.StreamingIndex
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SourceSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("readText: line-per-doc, unique increasing ids, trim, blank lines kept") {
    val dir = java.nio.file.Files.createTempDirectory("txt-src")
    val f = dir.resolve("corpus.txt")
    java.nio.file.Files.writeString(f,
      "first doc line\nsecond doc line\n\nfourth doc after blank\nfifth\n")
    val docs = DocumentSource.readText(spark, f.toString).collect()
    assert(docs.length == 5) // blank line kept (read.text semantics)
    assert(docs.map(_.getString(1)).contains(""))
    val ids = docs.map(_.getLong(0))
    assert(ids.distinct.length == 5)
    val trimmed = DocumentSource.readText(spark, f.toString, trim = 2)
    assert(trimmed.count() == 2)
  }

  test("streaming incremental index matches the batch index bit-for-bit") {
    val dir = java.nio.file.Files.createTempDirectory("docs-stream").toString
    java.nio.file.Files.copy(
      java.nio.file.Paths.get("/root/testdata/sf0.001/documents.parquet"),
      java.nio.file.Paths.get(dir, "documents.parquet"))
    val batchDocs = spark.read.parquet(dir)
    val cfg = MinHashConfig(numHash = 16, numBands = 4, numRows = 4)
    val q = StreamingIndex.incrementalIndex(spark, dir, batchDocs.schema, cfg)
      .writeStream.format("memory").queryName("index_stream")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("index_stream").collect()
        .map(r => (r.getLong(0), r.getSeq[String](1), r.getSeq[String](2))).toSet
      val model = new MinHashLSH(cfg).fit(batchDocs, "doc_id", "text")
      val batch = model.indexDf.where(col(Cols.Signature).isNotNull).collect()
        .map(r => (r.getLong(0), r.getSeq[String](1), r.getSeq[String](2))).toSet
      val streamedNonNull = streamed.filter(_._2 != null)
      assert(streamedNonNull == batch)
      model.unpersist()
    } finally q.stop()
  }
}
