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

  test("streaming dedup drops repeated content across micro-batches") {
    val dir = java.nio.file.Files.createTempDirectory("dedup-stream").toString
    val spark0 = spark
    import spark0.implicits._
    // batch 1: three docs, one internal duplicate pair
    Seq((1L, "alpha beta"), (2L, "gamma delta"), (3L, "alpha beta"))
      .toDF("doc_id", "text").write.parquet(s"$dir/b1")
    val schema = spark.read.parquet(s"$dir/b1").schema
    val q = StreamingIndex.dedupedStream(spark, s"$dir/b*", schema)
      .writeStream.format("memory").queryName("dedup_stream")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      assert(spark.table("dedup_stream").count() == 2)
      // batch 2 arrives later: one brand-new doc, one cross-batch duplicate
      Seq((4L, "epsilon zeta"), (5L, "gamma delta"))
        .toDF("doc_id", "text").write.parquet(s"$dir/b2")
      q.processAllAvailable()
      val out = spark.table("dedup_stream")
      assert(out.count() == 3) // the cross-batch duplicate was dropped
      val texts = out.select("text").as[String].collect().toSet
      assert(texts == Set("alpha beta", "gamma delta", "epsilon zeta"))
    } finally q.stop()
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

  test("warc: planted file round-trips through the strict record walk") {
    import graft.sources.WarcSource
    for (id <- Seq(0L, 3L, 5L, 10L, 16L)) {
      val recs = WarcSource.parseWarc(WarcSource.plantWarc(id)).get
      assert(recs.head.recType == "warcinfo")
      assert(recs.head.httpStatus.isEmpty)
      val responses = recs.tail
      assert(responses.length == WarcSource.plantWarcResponseCount(id))
      responses.zipWithIndex.foreach { case (r, j) =>
        assert(r.recType == "response")
        assert(r.targetUri.contains(s"http://host${(id + j) % 7}.example/p/$id/$j"))
        val expStatus = if (id % 5 == 0 && j == 1) 404 else 200
        assert(r.httpStatus.contains(expStatus))
        assert(r.body == s"<html><body>page $id section $j " +
          ("x" * ((id % 5).toInt + j + 1)) + "</body></html>")
      }
    }
  }

  test("robots: group selection, wildcards, longest-match, fallbacks") {
    import graft.sources.RobotsTxt
    val content =
      """# policy
        |User-agent: evilbot
        |Disallow: /
        |
        |User-agent: GraftBot
        |User-agent: otherbot
        |disallow: /private/
        |ALLOW: /private/pub
        |Crawl-delay: 5
        |Disallow: /*.zip$
        |
        |User-agent: *
        |Disallow: /all
        |Disallow:
        |""".stripMargin
    // specific group wins (case-insensitive agent + directive names); the
    // empty Disallow in * is dropped
    val rules = RobotsTxt.parseRobots(content, "graftbot")
    assert(rules.map(r => (r.pattern, r.allow)) == Seq(
      ("/private/", false), ("/private/pub", true), ("/*.zip$", false)))
    // unknown agent falls back to the * group
    assert(RobotsTxt.parseRobots(content, "strangerbot")
      .map(_.pattern) == Seq("/all"))
    // pure-JVM longest-match checks via the compiled regexes
    def allowed(path: String, rs: Seq[RobotsTxt.RobotRule]): Boolean = {
      def hit(rx: String) = // regexp_like semantics: find, not full-match
        java.util.regex.Pattern.compile(rx).matcher(path).find()
      def best(want: Boolean) = rs.filter(r => r.allow == want && hit(r.rx))
        .map(_.pattern.length).maxOption.getOrElse(-1)
      best(true) >= best(false)
    }
    assert(!allowed("/private/secret", rules))
    assert(allowed("/private/pub/x", rules))
    assert(allowed("/open/x", rules))
    assert(!allowed("/dl/a.zip", rules))
    assert(allowed("/dl/a.zip.txt", rules), "trailing $ must anchor")
  }

  test("warc: malformed payloads dead-letter, headers are case-insensitive") {
    import graft.sources.WarcSource
    val good = WarcSource.plantWarc(7L)
    // truncated mid-block
    assert(WarcSource.parseWarc(good.take(good.length - 10)).isEmpty)
    // bad magic
    assert(WarcSource.parseWarc("HTTP/1.1 200 OK\r\n\r\n".getBytes).isEmpty)
    // missing Content-Length
    assert(WarcSource.parseWarc(
      "WARC/1.0\r\nWARC-Type: response\r\n\r\nbody\r\n\r\n".getBytes).isEmpty)
    // declared length overruns the payload
    assert(WarcSource.parseWarc(
      "WARC/1.0\r\nWARC-Type: metadata\r\nContent-Length: 999\r\n\r\nx\r\n\r\n"
        .getBytes).isEmpty)
    // missing the two-CRLF record separator
    assert(WarcSource.parseWarc(
      "WARC/1.0\r\nWARC-Type: metadata\r\nContent-Length: 1\r\n\r\nx".getBytes).isEmpty)
    // lowercase header names parse fine (spec: names are case-insensitive)
    val lower = ("WARC/1.0\r\nwarc-type: metadata\r\ncontent-length: 2\r\n\r\nhi" +
      "\r\n\r\n").getBytes
    val rec = WarcSource.parseWarc(lower).get.head
    assert(rec.recType == "metadata" && rec.body == "hi" && rec.contentLength == 2L)
  }
}
