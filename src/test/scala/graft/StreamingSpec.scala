package graft

import graft.streaming.EventStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Streaming/batch twin equivalence: the same tumbling-window aggregation
  * expressions run over the events parquet as a stream must produce exactly
  * the batch result (file source + memory sink + processAllAvailable).
  */
class StreamingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("streaming tumbling agg equals batch twin") {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // file stream source needs a directory, not a bare parquet file
    val dir = java.nio.file.Files.createTempDirectory("events-stream").toString
    java.nio.file.Files.copy(
      java.nio.file.Paths.get("/root/testdata/sf0.001/events.parquet"),
      java.nio.file.Paths.get(dir, "events.parquet"))
    val raw = spark.read.parquet(dir)
    val batch = EventStream.tumblingCounts(SparkUtil.normalizeEventTs(raw))
      .orderBy("window_start", "event_type").collect()

    val q = EventStream.streamingTumblingCounts(spark, dir, raw.schema)
      .writeStream.format("memory").queryName("stream_out")
      .outputMode("complete").start()
    try {
      q.processAllAvailable()
      val stream = spark.table("stream_out")
        .orderBy("window_start", "event_type").collect()
      assert(stream.length == batch.length && stream.length > 0)
      assert(stream.toSeq == batch.toSeq)
    } finally q.stop()
  }


  test("SemanticDedupStream: decisions are a pure function of ids, not batch boundaries") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.streaming.{EmbeddingArrival, SemanticDedupStream}
    implicit val sc = spark.sqlContext
    // cell 0: 10 ~ 11 (identical) ~ both near 12; cell 1 independent
    val a = Seq(
      EmbeddingArrival(10L, 0, Seq(1f, 0f, 0f)),
      EmbeddingArrival(11L, 0, Seq(1f, 0f, 0f)),   // dup of 10 -> dropped
      EmbeddingArrival(12L, 0, Seq(0.9f, 0.1f, 0f)), // near 10 -> dropped
      EmbeddingArrival(13L, 0, Seq(0f, 0f, 1f)),   // far -> kept
      EmbeddingArrival(20L, 1, Seq(1f, 0f, 0f))    // other cell -> kept
    )
    def run(batches: Seq[Seq[EmbeddingArrival]], name: String) = {
      val ms = MemoryStream[EmbeddingArrival]
      val q = SemanticDedupStream.dedupArrivals(ms.toDS(), 0.9)
        .toDF().writeStream.format("memory").queryName(name)
        .outputMode("append").start()
      try {
        batches.foreach { b => ms.addData(b); q.processAllAvailable() }
      } finally q.stop()
      spark.table(name).orderBy("vec_id")
        .collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    }
    val oneBatch = run(Seq(a), "semdedup_one")
    val split = run(Seq(a.take(2), a.slice(2, 4), a.drop(4)), "semdedup_split")
    val expected = Map(10L -> true, 11L -> false, 12L -> false,
      13L -> true, 20L -> true)
    assert(oneBatch == expected, s"one-batch: $oneBatch")
    assert(split == expected, "3-batch split must not change any decision")
  }

  test("streaming dropDuplicates equals firstEventPerKey batch twin on time-ordered input") {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // one file, pre-sorted by event time: arrival order == event-time order,
    // so stateful dropDuplicates (keeps first ARRIVAL per key) must equal
    // the deterministic batch twin (keeps first event-TIME row per key)
    val dir = java.nio.file.Files.createTempDirectory("events-dedup").toString
    SparkUtil.normalizeEventTs(
        spark.read.parquet("/root/testdata/sf0.001/events.parquet"))
      .orderBy("ts", "event_id").coalesce(1)
      .write.mode("overwrite").parquet(dir)
    val sorted = spark.read.parquet(dir)
    val batch = EventStream.firstEventPerKey(sorted)
      .select("user_id", "event_type", "event_id")
      .orderBy("user_id", "event_type").collect()

    val q = spark.readStream.schema(sorted.schema).parquet(dir)
      .dropDuplicates("user_id", "event_type")
      .select("user_id", "event_type", "event_id")
      .writeStream.format("memory").queryName("dedup_out")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      val stream = spark.table("dedup_out").orderBy("user_id", "event_type").collect()
      assert(stream.length == batch.length && stream.length > 0)
      assert(stream.toSeq == batch.toSeq)
    } finally q.stop()
  }

  test("stream-stream interaction join equals batch twin after both streams drain") {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val dir = java.nio.file.Files.createTempDirectory("events-ssjoin").toString
    java.nio.file.Files.copy(
      java.nio.file.Paths.get("/root/testdata/sf0.001/events.parquet"),
      java.nio.file.Paths.get(dir, "events.parquet"))
    val raw = spark.read.parquet(dir)
    val batch = EventStream.purchasesNearErrors(SparkUtil.normalizeEventTs(raw))
      .orderBy("err_id", "p_id").collect()
    val q = EventStream.streamingPurchasesNearErrors(spark, dir, raw.schema)
      .writeStream.format("memory").queryName("ssjoin_out")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      val stream = spark.table("ssjoin_out").orderBy("err_id", "p_id").collect()
      assert(stream.length == batch.length && stream.length > 0,
        s"stream=${stream.length} batch=${batch.length}")
      assert(stream.toSeq == batch.toSeq)
    } finally q.stop()
  }

  test("Sessionizer (flatMapGroupsWithState): batch ≡ gaps-and-islands twin") {
    import graft.streaming.{SessionEvent, Sessionizer}
    import spark.implicits._
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val ev = SparkUtil.normalizeEventTs(
        spark.read.parquet("/root/testdata/sf0.001/events.parquet"))
      .select(col("user_id"), col("event_id"), unix_millis(col("ts")).as("tsMillis"))
      .as[SessionEvent]
    val gap = 30L * 60 * 1000
    val got = Sessionizer.assignSessions(ev, gap)
      .toDF().orderBy("user_id", "session_seq", "event_id").collect()

    // twin: lag + running sum of new-session markers (strict > gap)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("tsMillis", "event_id")
    val twin = ev.toDF()
      .withColumn("new_s",
        when(col("tsMillis") - lag("tsMillis", 1).over(w) > gap
          || lag("tsMillis", 1).over(w).isNull, 1).otherwise(0))
      .withColumn("session_seq", sum("new_s").over(
        w.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)))
      .select(col("user_id"), col("event_id"), col("session_seq").cast("int"))
      .orderBy("user_id", "session_seq", "event_id").collect()
    assert(got.length == twin.length && got.length > 0)
    assert(got.toSeq == twin.toSeq)
  }

  test("Sessionizer streaming: state carries sessions across micro-batches") {
    import graft.streaming.{SessionEvent, Sessionizer}
    import spark.implicits._
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val all = SparkUtil.normalizeEventTs(
        spark.read.parquet("/root/testdata/sf0.001/events.parquet"))
      .select(col("user_id"), col("event_id"), unix_millis(col("ts")).as("tsMillis"))
    val cut = all.selectExpr("percentile(tsMillis, 0.5)").collect()(0).getDouble(0).toLong

    // two time-ordered files → maxFilesPerTrigger=1 forces two micro-batches,
    // so per-user sessions spanning the cut exercise cross-batch state
    val dir = java.nio.file.Files.createTempDirectory("sessionizer-stream").toString
    all.where(col("tsMillis") <= cut).coalesce(1).write.parquet(s"$dir/b0")
    all.where(col("tsMillis") > cut).coalesce(1).write.parquet(s"$dir/b1")
    val src = java.nio.file.Files.createTempDirectory("sessionizer-src").toString
    def copyOne(sub: String, name: String): Unit = {
      val f = new java.io.File(s"$dir/$sub").listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      java.nio.file.Files.copy(f.toPath, java.nio.file.Paths.get(src, name))
    }
    copyOne("b0", "part-0.parquet") // older file first (latestFirst=false)
    Thread.sleep(1100)              // distinct mtimes → deterministic order
    copyOne("b1", "part-1.parquet")

    val gap = 30L * 60 * 1000
    val stream = spark.readStream.schema(all.schema)
      .option("maxFilesPerTrigger", 1).parquet(src).as[SessionEvent]
    val q = Sessionizer.assignSessions(stream, gap)
      .writeStream.format("memory").queryName("sessionizer_out")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      val got = spark.table("sessionizer_out")
        .orderBy("user_id", "session_seq", "event_id").collect()
      val batch = Sessionizer.assignSessions(all.as[SessionEvent], gap)
        .toDF().orderBy("user_id", "session_seq", "event_id").collect()
      assert(got.length == batch.length && got.length > 0)
      assert(got.toSeq == batch.toSeq,
        "streaming with cross-batch state must equal the batch run")
    } finally q.stop()
  }

  test("streaming ANN over micro-batched queries equals the batch multi-query run") {
    import graft.operators.MinHashLSH
    import graft.streaming.StreamingIndex
    import spark.implicits._
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val model = new MinHashLSH(MinHashConfig(numHash = 16, numBands = 4, numRows = 4,
      bucketHexLen = 2)).fit(docs, "doc_id", "text")
    val queries = docs.where(col("doc_id") < 20)
      .select(col("doc_id").as("qid"), col("text"))

    val batchResult = model.approxNearestNeighborsAll(queries, "qid", "text", 5)
      .orderBy("qid", "rank").collect()

    // stream the same queries as two files → two micro-batches
    val dir = java.nio.file.Files.createTempDirectory("ann-queries").toString
    queries.where(col("qid") < 10).coalesce(1).write.parquet(s"$dir/b0")
    queries.where(col("qid") >= 10).coalesce(1).write.parquet(s"$dir/b1")
    val src = java.nio.file.Files.createTempDirectory("ann-src").toString
    def copyOne(sub: String, name: String): Unit = {
      val f = new java.io.File(s"$dir/$sub").listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      java.nio.file.Files.copy(f.toPath, java.nio.file.Paths.get(src, name))
    }
    copyOne("b0", "q0.parquet")
    copyOne("b1", "q1.parquet")

    val collected = scala.collection.mutable.ArrayBuffer.empty[org.apache.spark.sql.Row]
    val stream = spark.readStream.schema(queries.schema)
      .option("maxFilesPerTrigger", 1).parquet(src)
    val q = StreamingIndex.streamingAnn(model, stream, "qid", "text", 5) { out =>
      collected.synchronized { collected ++= out.collect() }
    }
    try {
      q.processAllAvailable()
      val got = collected.sortBy(r => (r.getLong(0), r.getInt(3)))
      assert(got.length == batchResult.length && got.nonEmpty)
      assert(got.toSeq == batchResult.toSeq)
    } finally q.stop()
    model.unpersist()
  }

  test("incremental index over micro-batches equals the batch-built index exactly") {
    import graft.operators.MinHashLSH
    import graft.streaming.StreamingIndex
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("text"))
    val cfg = MinHashConfig(numHash = 16, numBands = 4, numRows = 4, bucketHexLen = 2)
    // 3 files → 3 micro-batches (maxFilesPerTrigger=1): real incremental appends
    val src = java.nio.file.Files.createTempDirectory("index-src").toString
    docs.repartition(3).write.mode("overwrite").parquet(src)
    val stream = StreamingIndex.incrementalIndex(spark, src,
      docs.schema, cfg, maxFilesPerTrigger = Some(1))
    val q = stream.writeStream.format("memory").queryName("idx_update_spec")
      .outputMode("append").start()
    val streamed =
      try { q.processAllAvailable(); spark.table("idx_update_spec").collect() }
      finally q.stop()
    val batch = new MinHashLSH(cfg).fit(docs, "doc_id", "text")
    val expected = batch.indexDf
      .select(col(Cols.Id), col(Cols.Signature), col(Cols.BucketIds)).collect()
    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0), Option(r.getSeq[String](1)).map(_.toList),
        Option(r.getSeq[String](2)).map(_.toList.sorted))
    assert(streamed.length == expected.length && streamed.nonEmpty)
    assert(streamed.map(key).sortBy(_._1).toSeq == expected.map(key).sortBy(_._1).toSeq,
      "per-row featurize must make streamed and batch index states identical")
    batch.unpersist()
  }

  test("ivfRecallEval: nProbe = nLists degenerates to brute force — recall exactly 1") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val all = graft.operators.SimSearch.ivfRecallEval(emb, "vec_id", "embedding",
      nQueries = 10, k = 5, nLists = 8, nProbe = 8, iters = 1, recallFloor = 1.0)
      .collect()
    assert(all.length == 10)
    assert(all.forall(_.getBoolean(1)),
      "full-probe IVF must reproduce the exact brute top-k for every query")
    graft.SparkUtil.releaseScopedCaches()
  }

  test("streaming near-dup filter keeps only novel docs, per micro-batch") {
    import graft.operators.MinHashLSH
    import graft.streaming.StreamingIndex
    import spark.implicits._
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val model = new MinHashLSH(MinHashConfig(numHash = 16, numBands = 4, numRows = 4,
      bucketHexLen = 2)).fit(docs, "doc_id", "text")
    val doc0 = docs.where(col("doc_id") === 0).select("text").collect()(0).getString(0)
    val incoming = Seq(
      (900000L, doc0),                       // near-dups the index → dropped
      (900001L, "totally novel zebra quark") // novel → kept
    ).toDF("doc_id", "text")
    val src = java.nio.file.Files.createTempDirectory("novel-src").toString
    incoming.coalesce(1).write.mode("overwrite").parquet(src)
    val buf = scala.collection.mutable.ArrayBuffer.empty[Long]
    val q = StreamingIndex.streamingNearDupFilter(model,
      spark.readStream.schema(incoming.schema).parquet(src), "doc_id", "text", 0.5) { out =>
      buf.synchronized { buf ++= out.select("doc_id").as[Long].collect() }
    }
    try {
      q.processAllAvailable()
      assert(buf.sorted.toSeq == Seq(900001L), s"got ${buf.toSeq}")
    } finally q.stop()
    model.unpersist()
  }

  test("streaming decontamination drops benchmark-overlapping docs per micro-batch") {
    import graft.streaming.StreamingIndex
    import spark.implicits._
    val bench = Seq((1L, "alpha beta gamma")).toDF("doc_id", "text")
    val incoming = Seq(
      (10L, "alpha beta something"),   // shares shingle "alpha beta" → dropped
      (11L, "clean novel words here"), // kept
      (12L, "x")                       // < k tokens → no shingles → kept
    ).toDF("doc_id", "text")
    val src = java.nio.file.Files.createTempDirectory("decon-src").toString
    incoming.coalesce(1).write.mode("overwrite").parquet(src)
    val buf = scala.collection.mutable.ArrayBuffer.empty[Long]
    val q = StreamingIndex.streamingDecontaminate(
      spark.readStream.schema(incoming.schema).parquet(src), "doc_id", "text",
      bench, "text") { out =>
      buf.synchronized { buf ++= out.select("doc_id").as[Long].collect() }
    }
    try {
      q.processAllAvailable()
      assert(buf.sorted.toSeq == Seq(11L, 12L), s"got ${buf.toSeq}")
    } finally q.stop()
  }

  test("session_window boundary: exact-gap event merges (strict-gap SQL twin)") {
    import spark.implicits._
    // Events exactly gap apart MERGE into one session — pins the semantics
    // the stream_session_agg oracle twin encodes with its strict
    // `ts - lag(ts) > gap` predicate.
    val ev = Seq(
      (1L, java.sql.Timestamp.valueOf("2026-01-01 00:00:00"), 1.0),
      (1L, java.sql.Timestamp.valueOf("2026-01-01 00:30:00"), 1.0),
      (1L, java.sql.Timestamp.valueOf("2026-01-01 01:00:01"), 1.0)
    ).toDF("user_id", "ts", "value")
    val sessions = EventStream.sessionCounts(ev).orderBy("session_start").collect()
    assert(sessions.length == 2, s"got ${sessions.toSeq}")
    assert(sessions(0).getLong(2) == 2L) // 00:00 + 00:30 merged
    assert(sessions(1).getLong(2) == 1L) // 01:00:01 is > gap after 00:30
  }

  test("ScdStream: transitions carry last-attr state across micro-batches") {
    import graft.streaming.{AttrEvent, ScdStream, ScdTransition}
    import spark.implicits._
    // batch 0 ends with user 1 on attr "a"; batch 1 opens with another "a"
    // (must NOT re-emit: state continuity) then "b" (must emit), while
    // user 2 changes attr exactly at the boundary (must emit)
    val b0 = Seq(AttrEvent(1L, 10L, 1000L, "a"), AttrEvent(1L, 11L, 2000L, "a"),
      AttrEvent(2L, 20L, 1500L, "x"))
    val b1 = Seq(AttrEvent(1L, 12L, 3000L, "a"), AttrEvent(1L, 13L, 4000L, "b"),
      AttrEvent(2L, 21L, 2500L, "y"))
    val src = java.nio.file.Files.createTempDirectory("scd2-src").toString
    b0.toDS().coalesce(1).write.mode("overwrite").parquet(s"$src/stage0")
    b1.toDS().coalesce(1).write.mode("overwrite").parquet(s"$src/stage1")
    val in = java.nio.file.Files.createTempDirectory("scd2-in").toString
    def copyOne(sub: String, name: String): Unit = {
      val f = new java.io.File(s"$src/$sub").listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      java.nio.file.Files.copy(f.toPath, java.nio.file.Paths.get(in, name))
    }
    copyOne("stage0", "part-0.parquet")
    Thread.sleep(1100) // distinct mtimes -> deterministic file order
    copyOne("stage1", "part-1.parquet")
    val stream = spark.readStream.schema(b0.toDS().schema)
      .option("maxFilesPerTrigger", 1).parquet(in).as[AttrEvent]
    val q = ScdStream.transitions(stream)
      .writeStream.format("memory").queryName("scd2_stream_out")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      val got = spark.table("scd2_stream_out").as[ScdTransition]
        .collect().sortBy(t => (t.user_id, t.tsMicros)).toSeq
      assert(got == Seq(
        ScdTransition(1L, 10L, 1000L, "a"), // first version
        ScdTransition(1L, 13L, 4000L, "b"), // 3000L "a" absorbed ACROSS batches
        ScdTransition(2L, 20L, 1500L, "x"),
        ScdTransition(2L, 21L, 2500L, "y")), s"got $got")
      // and the streamed log equals the batch run over the union
      val batch = ScdStream.transitions((b0 ++ b1).toDS())
        .collect().sortBy(t => (t.user_id, t.tsMicros)).toSeq
      assert(got == batch, "streaming with cross-batch state must equal batch")
    } finally q.stop()
  }

  test("streamingIndexMaintenance: a delete-only FIRST micro-batch cold-creates the table; a later lower-seq upsert stays deleted") {
    import graft.sources.IndexStore
    import org.apache.spark.sql.functions._
    val cfg = MinHashConfig(numHash = 16, numBands = 4, numRows = 4, bucketHexLen = 2)
    val dd = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .where(col("doc_id") < 20)
      .select(col("doc_id").cast("long").as(Cols.Id), col("text").as(Cols.Text))
    val table = "graft_maint_delfirst"
    IndexStore.reset(spark, table)
    val in = java.nio.file.Files.createTempDirectory("idx-delfirst").toString
    // batch 1: ONLY deletes (ids 3, 7 at seq 5 — outranking the ingest
    // that arrives later); batch 2: the full-corpus upsert at seq 1
    val slices = Seq(
      dd.where(col(Cols.Id).isin(3L, 7L))
        .select(col(Cols.Id), col(Cols.Text), lit("D").as("op"), lit(5L).as("ingest_seq")),
      dd.select(col(Cols.Id), col(Cols.Text), lit("U").as("op"), lit(1L).as("ingest_seq")))
    slices.zipWithIndex.foreach { case (g, i) =>
      g.coalesce(1).write.mode(if (i == 0) "overwrite" else "append").parquet(in)
      new java.io.File(in).listFiles().filter(_.getName.endsWith(".parquet"))
        .filter(_.lastModified() > 1700000000000L)
        .foreach(_.setLastModified(1600000000000L + i * 60000L))
    }
    val schema = spark.read.parquet(in).schema
    val q = graft.streaming.StreamingIndex.streamingIndexMaintenance(
      spark, in, schema, cfg, table, idCol = Cols.Id, textCol = Cols.Text,
      opCol = "op", prefixLen = 1)
    try q.processAllAvailable() finally q.stop()
    IndexStore.compactInverted(spark, table)
    val live = spark.table(table)
      .where(col("bkt_pfx") =!= IndexStore.TombstonePrefix)
      .select(col(Cols.Id)).collect().map(_.getLong(0)).toSet
    assert(!live.contains(3L) && !live.contains(7L),
      s"a delete that PRECEDES its document's ingest (higher seq) must hold: $live")
    assert(live.nonEmpty && live.subsetOf((0L until 20L).toSet))
    assert(spark.table(table)
      .where(col("bkt_pfx") === IndexStore.TombstonePrefix).count() == 2,
      "both markers must survive as redelivery guards")
  }

  test("streamingInvertedIngest cold-creates the co-located file-bucketed layout") {
    import graft.sources.IndexStore
    import org.apache.spark.sql.functions._
    val cfg = MinHashConfig(numHash = 16, numBands = 4, numRows = 4, bucketHexLen = 2)
    val dd = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .where(col("doc_id") < 30)
      .select(col("doc_id").cast("long").as("id"), col("text"),
        lit(1L).as("ingest_seq"))
    val table = "graft_stream_coldbucketed"
    IndexStore.reset(spark, table)
    val in = java.nio.file.Files.createTempDirectory("idx-coldbkt").toString
    dd.coalesce(1).write.mode("overwrite").parquet(in)
    val schema = spark.read.parquet(in).schema
    val q = graft.streaming.StreamingIndex.streamingInvertedIngest(
      spark, in, schema, cfg, table, prefixLen = 1, seedNumBuckets = 8,
      seedHotThreshold = 1000L)
    try q.processAllAvailable() finally q.stop()
    // the stream-created table must carry the bucket spec in BOTH the
    // catalog and the meta file — maintenance and co-located serving
    // derive it from there — and the seeded hot-bucket policy (stats
    // refresh at the maintenance points, not per micro-batch)
    assert(IndexStore.bucketCountOf(spark, table) == 8,
      "cold-created table must carry the seeded bucket spec")
    assert(IndexStore.invertedMeta(spark, table).numBuckets == 8)
    assert(IndexStore.invertedMeta(spark, table).hotThreshold == 1000L,
      "cold-created table must carry the seeded hot threshold")
    // and the layout's property holds: a bucket equi-join plans with no
    // exchange on the posting side
    val oldB = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val oldA = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val t = spark.table(table)
      val joined = t.join(t.select(col("bucket"), col(Cols.Id).as("rhs_id")),
        Seq("bucket"))
      joined.count()
      val exchanges = joined.queryExecution.executedPlan.collect {
        case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
      }
      assert(exchanges.isEmpty,
        s"stream-cold-created bucketed table must join exchange-free: $exchanges")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", oldB)
      spark.conf.set("spark.sql.adaptive.enabled", oldA)
    }
  }

  test("streamingIndexMaintenance: compacted state invariant to micro-batch boundaries") {
    import graft.operators.MinHashLSH
    import graft.sources.IndexStore
    import org.apache.spark.sql.functions._
    // the same event set — corpus upserts (seq 1), a correction re-ingest
    // of the %5 slice (U seq 2), deletes of the %9==4 slice (D seq 2) —
    // delivered as ONE file (single batch mixing U and D) and as THREE
    // files must compact to the identical posting set, with the deleted
    // ids gone: seqs ride in the data, so batch boundaries are invisible
    val cfg = MinHashConfig(numHash = 16, numBands = 4, numRows = 4, bucketHexLen = 2)
    val dd = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .where(col("doc_id") < 60)
      .select(col("doc_id").cast("long").as(Cols.Id), col("text").as(Cols.Text))
    val slices = Seq(
      dd.select(col(Cols.Id), col(Cols.Text), lit("U").as("op"), lit(1L).as("ingest_seq")),
      dd.where(col(Cols.Id) % 5 === 0)
        .select(col(Cols.Id), concat(lit("revised "), col(Cols.Text)).as(Cols.Text),
          lit("U").as("op"), lit(2L).as("ingest_seq")),
      dd.where(col(Cols.Id) % 9 === 4 && col(Cols.Id) % 5 =!= 0)
        .select(col(Cols.Id), col(Cols.Text), lit("D").as("op"), lit(2L).as("ingest_seq")))
    def run(groups: Seq[org.apache.spark.sql.DataFrame], table: String): Set[(Long, String)] = {
      IndexStore.reset(spark, table)
      val in = java.nio.file.Files.createTempDirectory("idx-maint").toString
      groups.zipWithIndex.foreach { case (g, i) =>
        g.coalesce(1).write.mode(if (i == 0) "overwrite" else "append").parquet(in)
        new java.io.File(in).listFiles().filter(_.getName.endsWith(".parquet"))
          .filter(_.lastModified() > 1700000000000L)
          .foreach(_.setLastModified(1600000000000L + i * 60000L))
      }
      val schema = spark.read.parquet(in).schema
      val q = graft.streaming.StreamingIndex.streamingIndexMaintenance(
        spark, in, schema, cfg, table, idCol = Cols.Id, textCol = Cols.Text,
        opCol = "op", prefixLen = 1)
      try q.processAllAvailable() finally q.stop()
      IndexStore.compactInverted(spark, table)
      spark.table(table).where(col("bkt_pfx") =!= IndexStore.TombstonePrefix)
        .select(col(Cols.Id), col("bucket"))
        .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    }
    val oneBatch = run(Seq(slices.reduce(_ unionByName _)), "graft_maint_one")
    val threeBatches = run(slices, "graft_maint_three")
    assert(oneBatch == threeBatches,
      "batch boundaries must not change the compacted posting set")
    assert(oneBatch.nonEmpty)
    val deleted = dd.where(col(Cols.Id) % 9 === 4 && col(Cols.Id) % 5 =!= 0)
      .select(col(Cols.Id)).collect().map(_.getLong(0)).toSet
    assert(oneBatch.forall { case (id, _) => !deleted.contains(id) },
      "tombstoned ids must be gone from the compacted set")
  }
}
