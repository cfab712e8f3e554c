package graft

// r20 measurement scratch: per-step timing of the ann_index_relayout
// protocol path (deleted once the round's evidence is recorded).
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.IndexStore
import graft.operators.MinHashLSH

object ProbeSteps {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("GATE_SF", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]").appName("probe")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.optimizer.excludedRules",
        "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    if (sys.env.contains("PROBE_JOBS")) {
      import org.apache.spark.scheduler._
      spark.sparkContext.addSparkListener(new SparkListener {
        val starts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, Int)]()
        override def onJobStart(j: SparkListenerJobStart): Unit =
          starts.put(j.jobId, (System.nanoTime(), j.stageInfos.map(_.numTasks).sum))
        override def onJobEnd(j: SparkListenerJobEnd): Unit = {
          val s = starts.remove(j.jobId)
          if (s != null) println(f"PJOB ${j.jobId}%4d ${(System.nanoTime() - s._1) / 1e9}%7.3f s tasks ${s._2}%5d")
        }
      })
    }
    spark.read.parquet(s"$sfDir/region.parquet").write.format("noop").mode("overwrite").save()
    def step[T](tag: String)(body: => T): T = {
      val t0 = System.nanoTime(); val r = body
      println(f"STEP $tag ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val reps = sys.env.getOrElse("PROBE_REPS", "2").toInt
    val mode = sys.env.getOrElse("PROBE_MODE", "relayout")
    val cfg16 = MinHashConfig(numHash = 16, numBands = 4, numRows = 4, bucketHexLen = 2)
    if (mode == "manifest") {
      (1 to reps).foreach { rep =>
        println(s"== rep $rep ==")
        val table = "graft_r20_manifest_probe"
        step("reset") { Seq(table, table + "__compact_stage_tbl").foreach(IndexStore.reset(spark, _)) }
        val dd = spark.read.parquet(s"$sfDir/documents.parquet")
          .select(col("doc_id").cast("long").as(Cols.Id), col("text").as(Cols.Text))
        def feat(df: DataFrame, seq: Int): DataFrame =
          new MinHashLSH(cfg16).featurize(df, Cols.Id, Cols.Text, None)
            .select(col(Cols.Id), col(Cols.Signature), col(Cols.BucketIds))
            .withColumn("ingest_seq", lit(seq.toLong))
        val prelim = dd.select(col(Cols.Id),
          when(col(Cols.Id) % 5 === 0, concat(lit("preliminary draft "), col(Cols.Text)))
            .otherwise(col(Cols.Text)).as(Cols.Text))
        step("saveInverted") { IndexStore.saveInverted(feat(prelim, 1), table, prefixLen = 1,
          swapMode = IndexStore.SwapManifest) }
        step("appendInverted") { IndexStore.appendInverted(feat(dd.where(col(Cols.Id) % 5 === 0), 2), table) }
        step("compactInverted") { IndexStore.compactInverted(spark, table) }
        step("appendInverted2") { IndexStore.appendInverted(feat(dd.where(col(Cols.Id) % 10 === 0), 3), table) }
        step("compactInverted2") { IndexStore.compactInverted(spark, table) }
        val key = dd.where(col(Cols.Id) === 0L).select(col(Cols.Text)).collect()(0).getString(0).take(120)
        step("serve") { MinHashLSH.annFromInvertedIndex(spark, table, spark.read.parquet(s"$sfDir/documents.parquet"), "doc_id", "text", key, 10, cfg16).write.format("noop").mode("overwrite").save() }
        SparkUtil.releaseScopedCaches(); spark.catalog.clearCache()
        spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
      }
      spark.stop(); return
    }
    (1 to reps).foreach { rep =>
      println(s"== rep $rep ==")
      val table = "graft_r20_relayout_probe"
      step("reset") { Seq(table, table + "__compact_stage_tbl").foreach(IndexStore.reset(spark, _)) }
      val dd = spark.read.parquet(s"$sfDir/documents.parquet")
        .select(col("doc_id").cast("long").as(Cols.Id), col("text").as(Cols.Text))
      def feat(df: DataFrame, seq: Int): DataFrame =
        new MinHashLSH(cfg16).featurize(df, Cols.Id, Cols.Text, None)
          .select(col(Cols.Id), col(Cols.Signature), col(Cols.BucketIds))
          .withColumn("ingest_seq", lit(seq.toLong))
      val prelim = dd.select(col(Cols.Id),
        when(col(Cols.Id) % 5 === 0, concat(lit("preliminary draft "), col(Cols.Text)))
          .otherwise(col(Cols.Text)).as(Cols.Text))
      step("featurizeOnly") { feat(prelim, 1).write.format("noop").mode("overwrite").save() }
      step("saveInverted") { IndexStore.saveInverted(feat(prelim, 1), table, prefixLen = 1) }
      step("appendInverted") { IndexStore.appendInverted(feat(dd.where(col(Cols.Id) % 5 === 0), 2), table) }
      step("appendTombstones") { IndexStore.appendTombstones(spark, table, dd.where(col(Cols.Id) === 82L).select(col(Cols.Id)), seq = 2L) }
      step("relayoutInverted") { IndexStore.relayoutInverted(spark, table, IndexStore.invertedMeta(spark, table).copy(prefixLen = 2, numBuckets = 16)) }
      step("appendInverted2") { IndexStore.appendInverted(feat(dd.where(col(Cols.Id) % 7 === 3), 3), table) }
      step("compactInverted") { IndexStore.compactInverted(spark, table) }
      val key = dd.where(col(Cols.Id) === 0L).select(col(Cols.Text)).collect()(0).getString(0).take(120)
      step("serve") { MinHashLSH.annFromInvertedIndex(spark, table, spark.read.parquet(s"$sfDir/documents.parquet"), "doc_id", "text", key, 10, cfg16).write.format("noop").mode("overwrite").save() }
      SparkUtil.releaseScopedCaches(); spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
    }
    spark.stop()
  }
}
