package graft

import graft.operators.{IvfModel, PqModel, SimSearch}
import graft.sources.{CellManifest, IndexStore, VectorAudit}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The vector-index storage lifecycle under the object-store-safe
  * manifest swap ([[graft.sources.CellManifest]]) — the cell-table twin
  * of IndexStoreSpec's SwapManifest coverage.
  */
class VectorStoreSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  lazy val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")

  private def staleCorpus = emb.select(col("vec_id"),
    when(col("vec_id") === 3, transform(col("embedding"), x => -x))
      .otherwise(col("embedding")).as("embedding"))

  private def qvOf(id: Long): Seq[Double] =
    emb.where(col("vec_id") === id).select("embedding")
      .collect()(0).getSeq[Float](0).map(_.toDouble).toSeq

  private def topIds(dir: String, qv: Seq[Double], k: Int): Seq[(Long, Double)] =
    IvfModel.load(spark, dir).query(qv, k, nProbe = 8)
      .collect().map(r => (r.getLong(0), r.getDouble(2))).toSeq

  private def parquetFiles(dir: String): Map[String, Long] = {
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) f.listFiles().toSeq.flatMap(walk)
      else if (f.getName.endsWith(".parquet")) Seq(f)
      else Seq.empty
    walk(new java.io.File(dir)).map(f => f.getPath -> f.lastModified()).toMap
  }

  test("manifest lifecycle: answers equal the rename-mode twin; data files never move; replaced dirs retained one pass then gc'd") {
    val model = SimSearch.trainIvf(staleCorpus, "vec_id", "embedding",
      nLists = 8, iters = 1)
    val renameDir = java.nio.file.Files.createTempDirectory("vm-rename").toString
    val manDir = java.nio.file.Files.createTempDirectory("vm-manifest").toString
    val seeded = IvfModel(model.centroids,
      model.assigned.withColumn("ingest_seq", lit(1L)))
    seeded.save(renameDir)
    seeded.save(manDir, IndexStore.SwapManifest)
    val qv = qvOf(3)

    // the upsert lands as a NEW generation: every pre-existing parquet
    // file of the manifest table stays byte-identical in place
    val before = parquetFiles(s"$manDir/assigned")
    Seq(renameDir, manDir).foreach(d => IvfModel.appendVectors(spark, d,
      emb.where(col("vec_id") === 3), "vec_id", "embedding", seq = 2L))
    val afterAppend = parquetFiles(s"$manDir/assigned")
    before.foreach { case (p, ts) =>
      assert(afterAppend.get(p).contains(ts),
        s"append must not touch existing file $p")
    }
    assert(topIds(manDir, qv, 3) == topIds(renameDir, qv, 3),
      "manifest and rename twins must answer identically pre-compaction")
    val manDebt = graft.sources.VectorAudit.maintenanceDebt(spark, manDir).collect()(0)
    assert(manDebt.getLong(0) == 1L && manDebt.getLong(2) == 2L,
      s"manifest debt after the append: one superseded row, touched cells " +
        s"at generation fan-out 2: $manDebt")

    // compaction: the stale cell's base directory is REPLACED in the
    // manifest but RETAINED on disk for in-flight readers of the old
    // manifest; the next maintenance pass garbage-collects it
    val staleCell = spark.read.parquet(s"$manDir/assigned")
      .where(col("id") === 3 && col("ingest_seq") === 1)
      .select("cell").collect()(0).get(0).toString
    Seq(renameDir, manDir).foreach(d => IvfModel.compactUpserts(spark, d))
    assert(new java.io.File(s"$manDir/assigned/cell=$staleCell").exists(),
      "the replaced base directory must be retained until the next pass")
    assert(topIds(manDir, qv, 3) == topIds(renameDir, qv, 3),
      "manifest and rename twins must answer identically post-compaction")
    val live = IvfModel.load(spark, manDir).assigned
      .where(col("id") === 3).select("ingest_seq")
      .collect().map(_.getLong(0)).toSeq
    assert(live == Seq(2L), s"only the winner serves after compaction: $live")

    // second maintenance pass: head-of-pass gc reclaims the unreferenced
    // directories; answers unchanged
    IvfModel.compactUpserts(spark, manDir)
    assert(!new java.io.File(s"$manDir/assigned/cell=$staleCell").exists(),
      "the second pass must gc the replaced base directory")
    assert(topIds(manDir, qv, 3) == topIds(renameDir, qv, 3))
    model.unpersist()
  }

  test("manifest mid-flip crash: a staged-but-uncommitted generation is invisible (old serves complete); the commit flips atomically; gc reclaims an orphan stage") {
    val model = SimSearch.trainIvf(staleCorpus, "vec_id", "embedding",
      nLists = 8, iters = 1)
    val dir = java.nio.file.Files.createTempDirectory("vm-crash").toString
    IvfModel(model.centroids,
      model.assigned.withColumn("ingest_seq", lit(1L)))
      .save(dir, IndexStore.SwapManifest)
    val qv = qvOf(3)
    val preIds = topIds(dir, qv, 3)

    // CRASH WINDOW of an append: the batch staged as _gen-G, the
    // manifest put never landed — readers keep serving the OLD manifest,
    // complete, with the staged rows invisible
    val table = s"$dir/assigned"
    val (gen, stage) = CellManifest.nextGen(spark, table)
    val batch = IvfModel.load(spark, dir).assigned
      .where(col("id") === 3).withColumn("ingest_seq", lit(9L))
    batch.write.mode("overwrite").partitionBy("cell").parquet(stage)
    assert(topIds(dir, qv, 3) == preIds,
      "an uncommitted stage must be invisible to readers")
    assert(IvfModel.load(spark, dir).assigned
      .where(col("ingest_seq") === 9L).count() == 0)

    // the commit IS the flip: one manifest put and the generation serves
    CellManifest.commitAppend(spark, table, gen)
    assert(IvfModel.load(spark, dir).assigned
      .where(col("ingest_seq") === 9L).count() > 0,
      "the committed generation must serve")

    // a second orphaned stage (crashed before its put) is reclaimed by
    // the next maintenance pass and never resurrects
    val (gen2, stage2) = CellManifest.nextGen(spark, table)
    batch.withColumn("ingest_seq", lit(99L))
      .write.mode("overwrite").partitionBy("cell").parquet(stage2)
    val orphanFiles = parquetFiles(stage2).keySet
    IvfModel.compactUpserts(spark, dir) // head gc + upsert compaction
    // the orphan's FILES are reclaimed (its generation NUMBER may be
    // safely reused by the rewrite that follows the gc)
    orphanFiles.foreach(p => assert(!new java.io.File(p).exists(),
      s"orphan stage _gen-$gen2 file must be gc'd at the next pass: $p"))
    assert(IvfModel.load(spark, dir).assigned
      .where(col("ingest_seq") === 99L).count() == 0,
      "a crashed append stays lost (the caller replays the whole batch)")
    model.unpersist()
  }

  test("manifest adoption: a lived-in rename-mode table converts in place (no data moves); maintenance continues under the manifest") {
    val model = SimSearch.trainIvf(staleCorpus, "vec_id", "embedding",
      nLists = 8, iters = 1)
    val dir = java.nio.file.Files.createTempDirectory("vm-adopt").toString
    IvfModel(model.centroids,
      model.assigned.withColumn("ingest_seq", lit(1L))).save(dir) // rename mode
    // live the rename-mode life first: an upsert and its compaction
    IvfModel.appendVectors(spark, dir, emb.where(col("vec_id") === 3),
      "vec_id", "embedding", seq = 2L)
    IvfModel.compactUpserts(spark, dir)
    val qv = qvOf(3)
    val before = topIds(dir, qv, 3)
    val files = parquetFiles(s"$dir/assigned")

    // adoption is one manifest put — nothing moves, answers identical
    CellManifest.init(spark, s"$dir/assigned")
    assert(parquetFiles(s"$dir/assigned") == files,
      "adoption must not touch a data file")
    assert(topIds(dir, qv, 3) == before, "answers must survive adoption")

    // maintenance CONTINUES under the manifest: the next upsert lands as
    // a generation, its compaction commits by flip, answers unchanged
    IvfModel.appendVectors(spark, dir, emb.where(col("vec_id") === 3),
      "vec_id", "embedding", seq = 3L)
    assert(new java.io.File(s"$dir/assigned").listFiles()
      .exists(_.getName.startsWith("_gen-")),
      "post-adoption appends must stage as generations")
    IvfModel.compactUpserts(spark, dir)
    assert(topIds(dir, qv, 3) == before)
    assert(CellManifest.readTable(spark, s"$dir/assigned")
      .where(col("id") === 3).select("ingest_seq")
      .collect().map(_.getLong(0)).toSeq == Seq(3L))
    model.unpersist()
  }

  test("manifest stale-reader contract: a frame resolved pre-gc fails LOUDLY once its generation is reclaimed; a re-read serves the current truth") {
    val model = SimSearch.trainIvf(staleCorpus, "vec_id", "embedding",
      nLists = 8, iters = 1)
    val dir = java.nio.file.Files.createTempDirectory("vm-stale").toString
    IvfModel(model.centroids,
      model.assigned.withColumn("ingest_seq", lit(1L)))
      .save(dir, IndexStore.SwapManifest)
    // resolve a reader against the CURRENT manifest, then age its
    // generation out: one compaction replaces the dirty cells (retained
    // one pass), a second pass gc's them
    val stale = IvfModel.load(spark, dir).assigned
    stale.count() // the resolution is real, not lazy-path-only
    IvfModel.appendVectors(spark, dir,
      emb.where(col("vec_id") === 3), "vec_id", "embedding", seq = 2L)
    IvfModel.compactUpserts(spark, dir)
    IvfModel.compactUpserts(spark, dir) // head gc reclaims the replaced dirs
    // the stale frame's file list names reclaimed paths — an action on it
    // must fail loudly, never silently serve a partial table
    val ex = intercept[Exception] { stale.count() }
    val msg = Option(ex.getMessage).getOrElse(ex.toString)
    assert(msg.contains("not exist") || msg.contains("FileNotFound") ||
      ex.isInstanceOf[org.apache.spark.SparkException],
      s"a reclaimed generation must fail the stale reader loudly: $ex")
    // a re-read resolves the newest manifest and serves the full truth
    val fresh = IvfModel.load(spark, dir).assigned
    assert(fresh.count() == emb.count(),
      "the re-read must serve the complete current generation set")
    assert(fresh.where(col("id") === 3).select("ingest_seq")
      .collect().map(_.getLong(0)).toSeq == Seq(2L))
    model.unpersist()
  }

  test("vector takedown audit: postingsOf shows physical state through the lifecycle; the id-map read is partition-pruned and matches a full scan") {
    import graft.sources.VectorAudit
    val model = SimSearch.trainIvf(staleCorpus, "vec_id", "embedding",
      nLists = 8, iters = 1)
    val dir = java.nio.file.Files.createTempDirectory("vm-audit").toString
    IvfModel(model.centroids,
      model.assigned.withColumn("ingest_seq", lit(1L))).save(dir)
    IvfModel.appendVectors(spark, dir, emb.where(col("vec_id") === 3),
      "vec_id", "embedding", seq = 2L)
    IvfModel.deleteVectors(spark, dir,
      emb.where(col("vec_id") === 5).select("vec_id"), seq = 2L)

    def audit(): Seq[(Long, Long, String)] =
      VectorAudit.postingsOf(spark, dir, Seq(3L, 4L, 5L))
        .select("id", "ingest_seq", "kind")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
        .toSeq.sorted
    assert(audit() == Seq((3L, 1L, "vector"), (3L, 2L, "vector"),
      (4L, 1L, "vector"), (5L, 1L, "vector"), (5L, 2L, "marker")),
      s"pre-compaction the audit shows BOTH versions and the marker: ${audit()}")

    // debt pre-maintenance: one superseded version (id 3's seq-1 row),
    // one pending marker, rename table -> no generations
    val preDebt = VectorAudit.maintenanceDebt(spark, dir).collect()(0)
    assert((preDebt.getLong(0), preDebt.getLong(1), preDebt.getLong(2)) ==
      ((1L, 1L, -1L)), s"pre-maintenance debt: $preDebt")

    // the stored cells are the write path's assignments — featurize
    // replay through the SAME shared expression
    val cents = IvfModel.load(spark, dir).centroids
    val versions = staleCorpus.where(col("vec_id").isin(3L, 4L, 5L))
      .select(col("vec_id").as("id"), lit(1L).as("ingest_seq"),
        col("embedding").as("v"))
      .unionByName(emb.where(col("vec_id") === 3)
        .select(col("vec_id").as("id"), lit(2L).as("ingest_seq"),
          col("embedding").as("v")))
      .withColumn("expected", SimSearch.assignedCellOf(col("v"), cents))
    val mismatches = VectorAudit.postingsOf(spark, dir, Seq(3L, 4L, 5L))
      .where(col("kind") === "vector")
      .join(versions, Seq("id", "ingest_seq"))
      .where(col("cell") =!= col("expected")).count()
    assert(mismatches == 0, "stored cells must replay through assignedCellOf")

    // the lookup is a partition-pruned id-map read, never a cell scan
    val plan = VectorAudit.postingsOf(spark, dir, Seq(3L, 4L, 5L))
      .queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("idh"),
      s"the audit read must prune idh partitions:\n$plan")
    assert(!plan.contains("assigned"),
      s"the audit must answer from the id-map, not the cell table:\n$plan")

    // maintenance keeps the mirror in lockstep: upsert compaction drops
    // the superseded mirror, the takedown scrub drops the deleted one
    // and the marker clears with it
    IvfModel.compactUpserts(spark, dir)
    assert(audit() == Seq((3L, 2L, "vector"), (4L, 1L, "vector"),
      (5L, 1L, "vector"), (5L, 2L, "marker")), s"after upsert compact: ${audit()}")
    IvfModel.compactDeletes(spark, dir)
    assert(audit() == Seq((3L, 2L, "vector"), (4L, 1L, "vector")),
      s"after takedown compact: ${audit()}")

    // the debt report tracks the lifecycle: after both compactions
    // nothing is superseded, no marker pends, and a rename table
    // reports no generations
    val debt = VectorAudit.maintenanceDebt(spark, dir).collect()(0)
    assert((debt.getLong(0), debt.getLong(1), debt.getLong(2)) == ((0L, 0L, -1L)),
      s"post-maintenance debt must be zero: $debt")

    // the pruned answer equals the full-scan truth over the cell table
    val truth = spark.read.parquet(s"$dir/assigned")
      .where(col("id").isin(3L, 4L, 5L))
      .select(col("id"), col("ingest_seq"), col("cell").cast("int"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq.sorted
    val mirrored = VectorAudit.postingsOf(spark, dir, Seq(3L, 4L, 5L))
      .where(col("kind") === "vector").select("id", "ingest_seq", "cell")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq.sorted
    assert(mirrored == truth, s"id-map $mirrored must mirror the table $truth")
    model.unpersist()
  }

  test("streaming ingestion into a manifest table: per-micro-batch appends commit as generations; state equals the one-batch twin") {
    val model = SimSearch.trainIvf(staleCorpus, "vec_id", "embedding",
      nLists = 8, iters = 1)
    val batchDir = java.nio.file.Files.createTempDirectory("vm-sb").toString
    val streamDir = java.nio.file.Files.createTempDirectory("vm-ss").toString
    val seeded = IvfModel(model.centroids,
      model.assigned.withColumn("ingest_seq", lit(1L)))
    seeded.save(batchDir, IndexStore.SwapManifest)
    seeded.save(streamDir, IndexStore.SwapManifest)
    val slice = emb.where(col("vec_id") % 17 === 3)

    // batch twin: the whole re-embedding slice in ONE append
    IvfModel.appendVectors(spark, batchDir, slice, "vec_id", "embedding", 2L)

    // streaming twin: the same slice, one file per micro-batch, each
    // foreachBatch commit is its own generation flip (the single-writer
    // manifest contract under micro-batch cadence)
    val tmp = java.nio.file.Files.createTempDirectory("vm-feed").toString
    slice.repartition(4).write.mode("overwrite").parquet(tmp)
    val schema = spark.read.parquet(tmp).schema
    val q = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(tmp)
      .writeStream.outputMode("append")
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        if (!df.isEmpty)
          IvfModel.appendVectors(spark, streamDir, df, "vec_id", "embedding", 2L)
      }
      .start()
    try q.processAllAvailable() finally q.stop()

    // the streamed table accumulated one generation per micro-batch...
    val fanOut = graft.sources.VectorAudit
      .maintenanceDebt(spark, streamDir).collect()(0).getLong(2)
    assert(fanOut >= 2, s"micro-batch appends must land as generations: $fanOut")
    // ...and serves exactly the one-batch twin, before and after the
    // compaction that collapses the superseded rows
    def state(dir: String): Seq[(Long, Int, Long)] =
      CellManifest.readTable(spark, s"$dir/assigned")
        .select(col("id"), col("cell").cast("int"), col("ingest_seq"))
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSeq.sorted
    assert(state(streamDir) == state(batchDir),
      "streamed state must equal the one-batch twin")
    val qv = qvOf(3)
    assert(topIds(streamDir, qv, 3) == topIds(batchDir, qv, 3))
    Seq(batchDir, streamDir).foreach(d => IvfModel.compactUpserts(spark, d))
    assert(state(streamDir) == state(batchDir))
    assert(topIds(streamDir, qv, 3) == topIds(batchDir, qv, 3))
    model.unpersist()
  }

  test("retrain: fresh centroids over the current truth, seq continuity, markers applied, audit reseeded, swap strategy preserved") {
    val model = SimSearch.trainIvf(staleCorpus, "vec_id", "embedding",
      nLists = 4, iters = 1)
    val dir = java.nio.file.Files.createTempDirectory("vm-retrain").toString
    IvfModel(model.centroids,
      model.assigned.withColumn("ingest_seq", lit(1L)))
      .save(dir, IndexStore.SwapManifest)
    IvfModel.appendVectors(spark, dir, emb.where(col("vec_id") === 3),
      "vec_id", "embedding", seq = 2L)
    IvfModel.deleteVectors(spark, dir,
      emb.where(col("vec_id") === 5).select("vec_id"), seq = 2L)
    val n = emb.count()

    IvfModel.retrain(spark, dir, nLists = 8, iters = 1)

    // the rebuilt index: 8 fresh centroids over the current truth — one
    // row per live id (the upsert winner carried its seq, the deleted id
    // is gone), markers cleared, swap strategy preserved
    val re = IvfModel.load(spark, dir)
    assert(re.centroids.length == 8, "retrain must fit the new nLists")
    val seqs = re.assigned.groupBy(col("ingest_seq")).count()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(seqs == Map(1L -> (n - 2), 2L -> 1L),
      s"one row per live id with its newest seq carried: $seqs")
    assert(re.assigned.where(col("id") === 5).count() == 0,
      "the takedown must be applied by the rebuild")
    assert(!new java.io.File(s"$dir/deleted").exists(),
      "markers clear with the swap (the compactDeletes redelivery contract)")
    assert(CellManifest.isManifest(spark, s"$dir/assigned"),
      "a manifest table must retrain into a manifest table")
    // the audit id-map reseeded with the rebuilt truth
    assert(VectorAudit.postingsOf(spark, dir, Seq(3L, 5L))
      .select("id", "ingest_seq", "kind")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
      .toSeq.sorted == Seq((3L, 2L, "vector")))
    VectorAudit.verifyVectorState(spark, dir)
    // exactness: full-probe top-1 of id 3's vector is itself
    val qv = qvOf(3)
    val top = re.query(qv, 1, nProbe = 8).collect()(0)
    assert(top.getLong(0) == 3L && top.getDouble(2) > 0.99)

    // maintenance CONTINUES on the retrained index: a seq-3 delete and a
    // seq-3 re-ingest keep their ordering against the carried seqs
    IvfModel.deleteVectors(spark, dir,
      emb.where(col("vec_id") === 7).select("vec_id"), seq = 3L)
    assert(IvfModel.load(spark, dir).assigned.where(col("id") === 7).count() == 0)
    IvfModel.appendVectors(spark, dir, emb.where(col("vec_id") === 3),
      "vec_id", "embedding", seq = 3L)
    IvfModel.compactUpserts(spark, dir)
    assert(CellManifest.readTable(spark, s"$dir/assigned")
      .where(col("id") === 3).select("ingest_seq")
      .collect().map(_.getLong(0)).toSeq == Seq(3L),
      "post-retrain supersession must keep working")
    model.unpersist()
  }

  test("retrain crash windows: an unflagged stage is discarded, a flagged stage is adopted to completion, live is never the build site") {
    val model = SimSearch.trainIvf(staleCorpus, "vec_id", "embedding",
      nLists = 8, iters = 1)
    val dir = java.nio.file.Files.createTempDirectory("vm-retrain-crash").toString
    IvfModel(model.centroids,
      model.assigned.withColumn("ingest_seq", lit(1L))).save(dir)
    val qv = qvOf(3)
    val before = topIds(dir, qv, 3)

    // (a) a build that died pre-flag: junk stage — the next maintenance
    // op discards it, the live index is untouched
    val stage = new java.io.File(s"$dir/__retrain_stage")
    stage.mkdirs()
    new java.io.File(stage, "junk").createNewFile()
    IvfModel.compactUpserts(spark, dir)
    assert(!stage.exists(), "an unflagged stage must be discarded")
    assert(topIds(dir, qv, 3) == before, "live must be untouched")

    // (b) a retrain that died AFTER the flag, before any rename: build a
    // complete staged index (seqs bumped to 9 as the adoption sentinel),
    // flag it — recovery at the next maintenance head finishes the swap
    val m2 = SimSearch.trainIvf(emb, "vec_id", "embedding",
      nLists = 8, iters = 1)
    IvfModel(m2.centroids,
      m2.assigned.withColumn("ingest_seq", lit(9L)))
      .save(s"$dir/__retrain_stage")
    new java.io.File(stage, "_complete").createNewFile()
    IvfModel.compactUpserts(spark, dir) // head recovery adopts
    assert(!stage.exists() && !new java.io.File(s"$dir/__retrain_aside").exists())
    val adopted = IvfModel.load(spark, dir)
    assert(adopted.centroids.length == 8 &&
      adopted.assigned.where(col("ingest_seq") =!= 9L).count() == 0,
      "a flagged stage must be adopted whole")

    // (c) mid-swap fragment: assigned renamed aside, the rest unswapped —
    // with the flag still present the recovery completes the swap
    IvfModel(m2.centroids,
      m2.assigned.withColumn("ingest_seq", lit(11L)))
      .save(s"$dir/__retrain_stage")
    new java.io.File(stage, "_complete").createNewFile()
    val aside = new java.io.File(s"$dir/__retrain_aside")
    aside.mkdirs()
    assert(new java.io.File(s"$dir/assigned")
      .renameTo(new java.io.File(aside, "assigned")))
    IvfModel.compactDeletes(spark, dir) // no markers: only the recovery runs
    assert(IvfModel.load(spark, dir).assigned
      .where(col("ingest_seq") =!= 11L).count() == 0,
      "a mid-swap crash must complete to the new index, never a mix")
    m2.unpersist()
    model.unpersist()
  }

  test("PQ retrain: coarse + codebooks refit over the current truth, one commit point for all four components, seq continuity") {
    val model = SimSearch.trainIvfPq(staleCorpus, "vec_id", "embedding",
      nLists = 4, m = 8, ks = 16)
    val dir = java.nio.file.Files.createTempDirectory("vm-pq-retrain").toString
    PqModel(IvfModel(model.ivf.centroids,
        model.ivf.assigned.withColumn("ingest_seq", lit(1L))),
      model.codebooks, model.subDim,
      model.encoded.withColumn("ingest_seq", lit(1L)))
      .save(dir, IndexStore.SwapManifest)
    PqModel.appendVectors(spark, dir, emb.where(col("vec_id") === 3),
      "vec_id", "embedding", seq = 2L)
    PqModel.deleteVectors(spark, dir,
      emb.where(col("vec_id") === 5).select("vec_id"), seq = 2L)
    val n = emb.count()

    PqModel.retrain(spark, dir, nLists = 8, m = 8, ks = 16)

    val re = PqModel.load(spark, dir)
    assert(re.ivf.centroids.length == 8, "the coarse quantizer must refit")
    Seq(re.ivf.assigned, re.encoded).foreach { t =>
      assert(t.count() == n - 1, "one row per live id in both tables")
      assert(t.where(col("id") === 5).count() == 0, "takedown applied")
      assert(t.where(col("id") === 3).select("ingest_seq")
        .collect()(0).getLong(0) == 2L, "newest seq carried")
    }
    // both tables from the SAME training run: codes decode against the
    // new codebooks — every code index must be in the new ks range and
    // the (id, cell) pairing must match across tables
    val mism = re.encoded.select(col("id"), col("cell").as("ec"))
      .join(re.ivf.assigned.select(col("id"), col("cell").as("ac")), Seq("id"))
      .where(col("ec") =!= col("ac")).count()
    assert(mism == 0, "encoded and assigned must agree on cells")
    assert(!new java.io.File(s"$dir/ivf/deleted").exists(),
      "markers clear with the swapped ivf subtree")
    assert(CellManifest.isManifest(spark, s"$dir/encoded") &&
      CellManifest.isManifest(spark, s"$dir/ivf/assigned"),
      "both cell tables keep the manifest strategy")
    VectorAudit.verifyVectorState(spark, s"$dir/ivf", Some(s"$dir/encoded"))

    // post-retrain maintenance continuity on BOTH tables
    PqModel.appendVectors(spark, dir, emb.where(col("vec_id") === 3),
      "vec_id", "embedding", seq = 3L)
    PqModel.compactUpserts(spark, dir)
    Seq(s"$dir/ivf/assigned", s"$dir/encoded").foreach { t =>
      assert(CellManifest.readTable(spark, t).where(col("id") === 3)
        .select("ingest_seq").collect().map(_.getLong(0)).toSeq == Seq(3L),
        s"post-retrain supersession must keep working in $t")
    }
    model.unpersist()
  }

  test("PQ manifest composition: upsert + takedown lifecycle over both cell tables, both serving states, scrub under manifest") {
    val model = SimSearch.trainIvfPq(staleCorpus, "vec_id", "embedding",
      nLists = 8, m = 8, ks = 16)
    val dir = java.nio.file.Files.createTempDirectory("vm-pq").toString
    PqModel(IvfModel(model.ivf.centroids,
        model.ivf.assigned.withColumn("ingest_seq", lit(1L))),
      model.codebooks, model.subDim,
      model.encoded.withColumn("ingest_seq", lit(1L)))
      .save(dir, IndexStore.SwapManifest)

    // the re-embedding supersedes in BOTH tables the moment it commits
    PqModel.appendVectors(spark, dir, emb.where(col("vec_id") === 3),
      "vec_id", "embedding", seq = 2L)
    def liveSeqs(of: String): Seq[Long] = {
      val m2 = PqModel.load(spark, dir)
      val t = if (of == "assigned") m2.ivf.assigned else m2.encoded
      t.where(col("id") === 3).groupBy(col("id"))
        .agg(max(col("ingest_seq")).as("s"))
        .select("s").collect().map(_.getLong(0)).toSeq
    }
    assert(liveSeqs("assigned") == Seq(2L) && liveSeqs("encoded") == Seq(2L),
      "the upsert must win in both tables pre-compaction")
    PqModel.compactUpserts(spark, dir)
    Seq("assigned", "encoded").foreach { t =>
      val raw = CellManifest.readTable(spark,
        if (t == "assigned") s"$dir/ivf/assigned" else s"$dir/encoded")
      val seqs = raw.where(col("id") === 3)
        .select("ingest_seq").collect().map(_.getLong(0)).toSeq
      assert(seqs == Seq(2L), s"$t must hold only the winner physically: $seqs")
    }

    // takedown: marker excludes immediately, the manifest-mode scrub
    // physically drops the rows from both tables
    PqModel.deleteVectors(spark, dir,
      emb.where(col("vec_id") === 5).select("vec_id"), seq = 3L)
    assert(PqModel.load(spark, dir).encoded.where(col("id") === 5).count() == 0)
    PqModel.compactDeletes(spark, dir)
    Seq(s"$dir/ivf/assigned", s"$dir/encoded").foreach { t =>
      assert(CellManifest.readTable(spark, t).where(col("id") === 5).count() == 0,
        s"$t must physically drop the deleted id")
    }
    assert(PqModel.load(spark, dir).encoded.where(col("id") === 3)
      .select("ingest_seq").collect().map(_.getLong(0)).toSeq == Seq(2L),
      "the scrub must not disturb surviving rows")

    // the reconciliation hatch: clean after the full lifecycle, loud on
    // a violated replay contract (a half-landed append)
    VectorAudit.verifyVectorState(spark, s"$dir/ivf", Some(s"$dir/encoded"))
    // half-landed append: the assigned generation commits, encoded and
    // the id-map never see the batch (the crash window the replay
    // contract covers)
    val at = s"$dir/ivf/assigned"
    val (gen, stage) = CellManifest.nextGen(spark, at)
    CellManifest.readTable(spark, at)
      .where(col("id") === 3).withColumn("ingest_seq", lit(7L))
      .write.mode("overwrite").partitionBy("cell").parquet(stage)
    CellManifest.commitAppend(spark, at, gen)
    val ex = intercept[IllegalStateException] {
      VectorAudit.verifyVectorState(spark, s"$dir/ivf", Some(s"$dir/encoded"))
    }
    assert(ex.getMessage.contains("diverges"), ex.getMessage)
    model.unpersist()
  }

  test("a crashed retrain swap fails readers LOUDLY; recoverRetrain finishes it — never new assigned paired with old centroids") {
    val model = SimSearch.trainIvf(staleCorpus, "vec_id", "embedding",
      nLists = 8, iters = 1)
    val dir = java.nio.file.Files.createTempDirectory("vm-load-recover").toString
    IvfModel(model.centroids,
      model.assigned.withColumn("ingest_seq", lit(1L))).save(dir)
    // a committed retrain (4 fresh centroids, seq-9 sentinel) that died
    // BETWEEN the component renames: assigned already swapped in, the
    // centroids still the old 8-cell geometry
    val m2 = SimSearch.trainIvf(emb, "vec_id", "embedding",
      nLists = 4, iters = 1)
    val stage = new java.io.File(s"$dir/__retrain_stage")
    IvfModel(m2.centroids,
      m2.assigned.withColumn("ingest_seq", lit(9L)))
      .save(s"$dir/__retrain_stage")
    new java.io.File(stage, "_complete").createNewFile()
    val aside = new java.io.File(s"$dir/__retrain_aside")
    aside.mkdirs()
    assert(new java.io.File(s"$dir/assigned")
      .renameTo(new java.io.File(aside, "assigned")))
    assert(new java.io.File(stage, "assigned")
      .renameTo(new java.io.File(s"$dir/assigned")))
    // NO maintenance op runs — a plain reader must fail LOUDLY (never
    // silently pair the new assigned cells with the old centroid
    // geometry); readers don't run the recovery themselves, so two
    // concurrent loads can't race the renames
    val ex = intercept[IllegalStateException] { IvfModel.load(spark, dir) }
    assert(ex.getMessage.contains("retrain swap pending"), ex.getMessage)
    // the documented recovery (a maintenance head or this explicit call)
    // finishes the swap; the re-load serves the consistent NEW index
    IvfModel.recoverRetrain(spark, dir)
    val loaded = IvfModel.load(spark, dir)
    assert(loaded.centroids == m2.centroids,
      "recovery must finish the swap: staged centroids, never the old geometry")
    assert(loaded.assigned.where(col("ingest_seq") =!= 9L).count() == 0)
    assert(loaded.assigned.select(max(col("cell"))).collect()(0).getInt(0) <
      loaded.centroids.length, "assigned cells must index the NEW centroids")
    assert(!stage.exists() && !aside.exists(), "recovery must leave no fragments")
    m2.unpersist(); model.unpersist()
  }

  test("writes adopt a flagged retrain stage FIRST: a takedown beside the stage applies to the adopted index, never silently lost") {
    val model = SimSearch.trainIvf(staleCorpus, "vec_id", "embedding",
      nLists = 8, iters = 1)
    val dir = java.nio.file.Files.createTempDirectory("vm-write-recover").toString
    IvfModel(model.centroids,
      model.assigned.withColumn("ingest_seq", lit(1L))).save(dir)
    val m2 = SimSearch.trainIvf(emb, "vec_id", "embedding",
      nLists = 8, iters = 1)
    val stage = new java.io.File(s"$dir/__retrain_stage")
    IvfModel(m2.centroids,
      m2.assigned.withColumn("ingest_seq", lit(9L)))
      .save(s"$dir/__retrain_stage")
    new java.io.File(stage, "_complete").createNewFile()
    // the takedown arrives while the flagged stage pends: deleteVectors
    // must adopt the stage BEFORE writing its marker — a marker written
    // beside the stage would clear UNAPPLIED when the stage swapped in
    IvfModel.deleteVectors(spark, dir,
      emb.where(col("vec_id") === 5).select("vec_id"), seq = 10L)
    assert(!stage.exists(), "the write head must adopt the flagged stage")
    assert(IvfModel.load(spark, dir).assigned.where(col("id") === 5).count() == 0,
      "the takedown must exclude the id from the ADOPTED index")
    IvfModel.compactDeletes(spark, dir)
    assert(spark.read.parquet(s"$dir/assigned").where(col("id") === 5).count() == 0,
      "the scrub must physically drop the id — no silent takedown loss")
    // same contract on the append side: a batch lands on the adopted truth
    IvfModel(m2.centroids,
      m2.assigned.withColumn("ingest_seq", lit(11L)))
      .save(s"$dir/__retrain_stage")
    new java.io.File(stage, "_complete").createNewFile()
    IvfModel.appendVectors(spark, dir, emb.where(col("vec_id") === 3),
      "vec_id", "embedding", seq = 12L)
    assert(!stage.exists())
    val seqs = CellManifest.readTable(spark, s"$dir/assigned")
      .where(col("id") === 3).select("ingest_seq")
      .collect().map(_.getLong(0)).toSeq.sorted
    assert(seqs == Seq(11L, 12L),
      s"the append must survive the adoption (never swallowed): $seqs")
    m2.unpersist(); model.unpersist()
  }

  test("manifest gc retains the two newest manifest FILES: an in-flight reader's resolution target survives one pass") {
    val model = SimSearch.trainIvf(staleCorpus, "vec_id", "embedding",
      nLists = 8, iters = 1)
    val dir = java.nio.file.Files.createTempDirectory("vm-gc-manifests").toString
    IvfModel(model.centroids,
      model.assigned.withColumn("ingest_seq", lit(1L)))
      .save(dir, IndexStore.SwapManifest)
    def manifests(): Seq[Long] =
      new java.io.File(s"$dir/assigned/_vmanifest").listFiles()
        .map(_.getName).filter(_.startsWith("manifest-"))
        .map(_.stripPrefix("manifest-").toLong).toSeq.sorted
    assert(manifests() == Seq(0L))
    IvfModel.appendVectors(spark, dir, emb.where(col("vec_id") === 3),
      "vec_id", "embedding", seq = 2L)
    // first maintenance pass: its head gc must KEEP the previous manifest
    // (numbering advances by 2, so the old `< m - 1` rule deleted it)
    IvfModel.compactUpserts(spark, dir)
    assert(manifests().contains(0L),
      s"the previous manifest must survive one pass for in-flight " +
        s"readers: ${manifests()}")
    // second pass: only the two newest survive
    IvfModel.compactUpserts(spark, dir)
    val after = manifests()
    assert(after.length <= 2 && !after.contains(0L),
      s"older manifests must gc once twice-replaced: $after")
    model.unpersist()
  }

  test("a replayed duplicate WINNER collapses identically in the cell table and the audit mirror — verifyVectorState stays clean") {
    val model = SimSearch.trainIvf(staleCorpus, "vec_id", "embedding",
      nLists = 4, iters = 1)
    val dir = java.nio.file.Files.createTempDirectory("vm-dup").toString
    IvfModel(model.centroids,
      model.assigned.withColumn("ingest_seq", lit(1L))).save(dir)
    // a NEW id (no older version, so no superseded row of its own) whose
    // vector is id 5's — deterministic assignment puts it in id 5's cell;
    // pick its value so it hashes into a DIFFERENT id-map partition than
    // id 5 (the advice scenario: the loser's rewrite scope touches the
    // duplicate's cell but not its idh partition)
    import spark.implicits._
    def idhOf(id: Long): Int = Seq(id).toDF("id")
      .select(pmod(hash(col("id")), lit(VectorAudit.IdMapBuckets)))
      .collect()(0).getInt(0)
    val newId = (1000L to 1100L).find(c => idhOf(c) != idhOf(5L)).get
    val dupBatch = emb.where(col("vec_id") === 5)
      .select(lit(newId).as("vec_id"), col("embedding"))
    // the at-least-once replay: the same batch lands TWICE at seq 2
    IvfModel.appendVectors(spark, dir, dupBatch, "vec_id", "embedding", 2L)
    IvfModel.appendVectors(spark, dir, dupBatch, "vec_id", "embedding", 2L)
    // an unrelated supersession in the SAME cell triggers its rewrite
    IvfModel.appendVectors(spark, dir, emb.where(col("vec_id") === 5),
      "vec_id", "embedding", seq = 3L)
    IvfModel.compactUpserts(spark, dir)
    val inTable = spark.read.parquet(s"$dir/assigned")
      .where(col("id") === newId).count()
    val inMirror = spark.read.parquet(s"$dir/_idmap")
      .where(col("id") === newId).count()
    assert(inTable == 1L && inMirror == 1L,
      s"both sides must collapse the replayed winner to one row: " +
        s"table=$inTable mirror=$inMirror")
    VectorAudit.verifyVectorState(spark, dir) // healthy index, no divergence
    model.unpersist()
  }

  test("writer fence: a stale-epoch manifest commit throws and changes nothing — the table serves the newer writer's truth") {
    import graft.sources.Fence
    val model = SimSearch.trainIvf(staleCorpus, "vec_id", "embedding",
      nLists = 8, iters = 1)
    val dir = java.nio.file.Files.createTempDirectory("vm-fence").toString
    IvfModel(model.centroids,
      model.assigned.withColumn("ingest_seq", lit(1L)))
      .save(dir, IndexStore.SwapManifest)
    val table = s"$dir/assigned"
    val preState = CellManifest.readTable(spark, table)
      .select(col("id"), col("ingest_seq"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // writer A stages an append (nextGen binds A's epoch to the gen)...
    val (gen, stage) = CellManifest.nextGen(spark, table)
    CellManifest.readTable(spark, table)
      .where(col("id") === 3).withColumn("ingest_seq", lit(9L))
      .write.mode("overwrite").partitionBy("cell").parquet(stage)
    // ...writer B claims the table before A commits
    Fence.begin(spark, table)
    val ex = intercept[IllegalStateException] {
      CellManifest.commitAppend(spark, table, gen)
    }
    assert(ex.getMessage.contains("writer fence violated"), ex.getMessage)
    assert(CellManifest.readTable(spark, table)
      .select(col("id"), col("ingest_seq"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet == preState,
      "a fenced-out commit must leave the manifest (and every row) unchanged")
    // A replays the batch whole under a fresh claim — the normal recovery
    IvfModel.appendVectors(spark, dir, emb.where(col("vec_id") === 3),
      "vec_id", "embedding", seq = 9L)
    assert(CellManifest.readTable(spark, table)
      .where(col("ingest_seq") === 9L).count() > 0)
    // the abandoned stage is gc'd at the next maintenance head
    IvfModel.compactUpserts(spark, dir)
    assert(!new java.io.File(stage).exists() ||
      new java.io.File(stage).list().isEmpty,
      "the fenced-out stage must be reclaimed by gc")
    model.unpersist()
  }

  test("writer fence: a foreign claim during the retrain rebuild refuses the flag — old index serves, stage discarded, retry retrains") {
    import graft.sources.{Fence, MaintHooks}
    val model = SimSearch.trainIvf(staleCorpus, "vec_id", "embedding",
      nLists = 8, iters = 1)
    val dir = java.nio.file.Files.createTempDirectory("vm-fence-retrain").toString
    IvfModel(model.centroids,
      model.assigned.withColumn("ingest_seq", lit(1L))).save(dir)
    val qv = qvOf(3)
    val before = topIds(dir, qv, 3)
    MaintHooks.hook = (point, d) =>
      if (point == "retrain.staged" && d == dir) Fence.begin(spark, dir)
    val ex = try intercept[IllegalStateException] {
      IvfModel.retrain(spark, dir, nLists = 4, iters = 1)
    } finally MaintHooks.reset()
    assert(ex.getMessage.contains("writer fence violated"), ex.getMessage)
    assert(IvfModel.load(spark, dir).centroids.length == 8 &&
      topIds(dir, qv, 3) == before,
      "the fenced-out retrain must leave the old index serving")
    IvfModel.compactUpserts(spark, dir) // head recovery discards the stage
    assert(!new java.io.File(s"$dir/__retrain_stage").exists())
    IvfModel.retrain(spark, dir, nLists = 4, iters = 1) // the live claim
    assert(IvfModel.load(spark, dir).centroids.length == 4)
    model.unpersist()
  }

  test("retrain seq-guard: an append racing the staged rebuild refuses the swap — no silent vector loss; retrain-after-catchup succeeds") {
    import graft.sources.MaintHooks
    val model = SimSearch.trainIvf(staleCorpus, "vec_id", "embedding",
      nLists = 8, iters = 1)
    val dir = java.nio.file.Files.createTempDirectory("vm-seqguard").toString
    IvfModel(model.centroids,
      model.assigned.withColumn("ingest_seq", lit(1L))).save(dir)
    // the racing append lands exactly between snapshot and commit
    MaintHooks.hook = (point, d) =>
      if (point == "retrain.staged" && d == dir) {
        MaintHooks.reset() // the inner append must not re-trigger
        IvfModel.appendVectors(spark, dir, emb.where(col("vec_id") === 3),
          "vec_id", "embedding", seq = 5L)
      }
    val ex = try intercept[IllegalStateException] {
      IvfModel.retrain(spark, dir, nLists = 4, iters = 1)
    } finally MaintHooks.reset()
    assert(ex.getMessage.contains("retrain snapshot") &&
      ex.getMessage.contains("raced"), ex.getMessage)
    // the raced append SURVIVES (it was never swallowed by a swap)
    val seqs = CellManifest.readTable(spark, s"$dir/assigned")
      .where(col("id") === 3).select("ingest_seq")
      .collect().map(_.getLong(0)).toSeq.sorted
    assert(seqs == Seq(1L, 5L), s"the raced append must survive: $seqs")
    // after the writer quiesces, retrain succeeds and carries the seq
    IvfModel.retrain(spark, dir, nLists = 4, iters = 1)
    val re = IvfModel.load(spark, dir)
    assert(re.centroids.length == 4)
    assert(re.assigned.where(col("id") === 3).select("ingest_seq")
      .collect().map(_.getLong(0)).toSeq == Seq(5L),
      "the rebuilt index must hold the raced append's newest version")
    model.unpersist()
  }

  test("retrain seq-guard: a takedown racing the staged rebuild refuses the swap — the marker survives and applies on the retry") {
    import graft.sources.MaintHooks
    val model = SimSearch.trainIvf(staleCorpus, "vec_id", "embedding",
      nLists = 8, iters = 1)
    val dir = java.nio.file.Files.createTempDirectory("vm-seqguard-del").toString
    IvfModel(model.centroids,
      model.assigned.withColumn("ingest_seq", lit(1L))).save(dir)
    MaintHooks.hook = (point, d) =>
      if (point == "retrain.staged" && d == dir) {
        MaintHooks.reset()
        IvfModel.deleteVectors(spark, dir,
          emb.where(col("vec_id") === 5).select("vec_id"), seq = 6L)
      }
    val ex = try intercept[IllegalStateException] {
      IvfModel.retrain(spark, dir, nLists = 4, iters = 1)
    } finally MaintHooks.reset()
    assert(ex.getMessage.contains("marker files 0 -> 1"), ex.getMessage)
    // the takedown is live (never cleared by an un-adopting swap)...
    assert(IvfModel.load(spark, dir).assigned.where(col("id") === 5).count() == 0)
    // ...and the retry applies it: the rebuilt index never held the id
    IvfModel.retrain(spark, dir, nLists = 4, iters = 1)
    assert(spark.read.parquet(s"$dir/assigned").where(col("id") === 5).count() == 0,
      "the retry must rebuild without the taken-down id — no resurrection")
    model.unpersist()
  }

  test("seq-in-data appends: one batch carrying two versions of an id lands each under its own seq — equal to the literal-seq twin") {
    val model = SimSearch.trainIvf(staleCorpus, "vec_id", "embedding",
      nLists = 8, iters = 1)
    val litDir = java.nio.file.Files.createTempDirectory("vm-seqlit").toString
    val colDir = java.nio.file.Files.createTempDirectory("vm-seqcol").toString
    val seeded = IvfModel(model.centroids,
      model.assigned.withColumn("ingest_seq", lit(1L)))
    seeded.save(litDir); seeded.save(colDir)
    val v2 = emb.where(col("vec_id") === 3)
      .select(col("vec_id"), col("embedding"))
    val v3 = emb.where(col("vec_id") === 3)
      .select(col("vec_id"),
        transform(col("embedding"), x => -x).as("embedding"))
    // literal twin: two appends, one per version
    IvfModel.appendVectors(spark, litDir, v2, "vec_id", "embedding", seq = 2L)
    IvfModel.appendVectors(spark, litDir, v3, "vec_id", "embedding", seq = 3L)
    // seq-column twin: BOTH versions in ONE frame, each row its own seq —
    // the shape a literal-seq call cannot express
    IvfModel.appendVectors(spark, colDir,
      v2.withColumn("ingest_seq", lit(2L))
        .unionByName(v3.withColumn("ingest_seq", lit(3L))),
      "vec_id", "embedding", "ingest_seq")
    def state(dir: String): Seq[(Long, Long, Int)] =
      CellManifest.readTable(spark, s"$dir/assigned")
        .where(col("id") === 3)
        .select(col("id"), col("ingest_seq"), col("cell").cast("int"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq.sorted
    assert(state(colDir) == state(litDir),
      s"seq-column rows must land as the literal twin: ${state(colDir)} vs ${state(litDir)}")
    Seq(litDir, colDir).foreach(d => IvfModel.compactUpserts(spark, d))
    assert(state(colDir) == state(litDir))
    val win = CellManifest.readTable(spark, s"$colDir/assigned")
      .where(col("id") === 3).select("ingest_seq")
      .collect().map(_.getLong(0)).toSeq
    assert(win == Seq(3L), s"newest seq in the frame must win: $win")
    val qv = qvOf(4)
    assert(topIds(colDir, qv, 3) == topIds(litDir, qv, 3))
    model.unpersist()
  }

  test("streaming vector sink: the debt poll fires compaction mid-stream — zero superseded rows without any harness compact; state equals the one-batch twin") {
    val model = SimSearch.trainIvf(staleCorpus, "vec_id", "embedding",
      nLists = 8, iters = 1)
    val batchDir = java.nio.file.Files.createTempDirectory("vm-debt-b").toString
    val streamDir = java.nio.file.Files.createTempDirectory("vm-debt-s").toString
    val seeded = IvfModel(model.centroids,
      model.assigned.withColumn("ingest_seq", lit(1L)))
    seeded.save(batchDir, IndexStore.SwapManifest)
    seeded.save(streamDir, IndexStore.SwapManifest)
    val slice = emb.where(col("vec_id") % 17 === 3)
      .select(col("vec_id"), col("embedding"), lit(2L).as("ingest_seq"))

    // batch twin: one append, harness-compacted
    IvfModel.appendVectors(spark, batchDir, slice, "vec_id", "embedding",
      "ingest_seq")
    IvfModel.compactUpserts(spark, batchDir)

    // streaming twin: three micro-batches through the sink; the harness
    // NEVER compacts — only the in-sink debt trigger can drop losers
    val tmp = java.nio.file.Files.createTempDirectory("vm-debt-feed").toString
    slice.repartition(3).write.mode("overwrite").parquet(tmp)
    val schema = spark.read.parquet(tmp).schema
    val q = graft.streaming.StreamingIndex.streamingVectorIngest(
      spark, tmp, schema, streamDir, compactAtSuperseded = 1L)
    try q.processAllAvailable() finally q.stop()

    val narrow = CellManifest.readTable(spark, s"$streamDir/assigned")
      .select(col("id"), col("ingest_seq"))
    val stale = narrow.join(
        narrow.groupBy(col("id")).agg(max(col("ingest_seq")).as("__w")),
        Seq("id"))
      .where(col("ingest_seq") < col("__w")).count()
    assert(stale == 0L,
      s"the debt trigger must have compacted mid-stream: $stale stale rows")
    def state(dir: String): Seq[(Long, Int, Long)] =
      CellManifest.readTable(spark, s"$dir/assigned")
        .select(col("id"), col("cell").cast("int"), col("ingest_seq"))
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSeq.sorted
    assert(state(streamDir) == state(batchDir),
      "debt-compacted streamed state must equal the one-batch compacted twin")
    val qv = qvOf(3)
    assert(topIds(streamDir, qv, 3) == topIds(batchDir, qv, 3))
    model.unpersist()
  }

  test("vector change feed: U/D events with per-row seqs — micro-batch boundaries never change the state; markers outrank, re-ingests resurrect") {
    val model = SimSearch.trainIvf(staleCorpus, "vec_id", "embedding",
      nLists = 8, iters = 1)
    val batchDir = java.nio.file.Files.createTempDirectory("vm-cf-b").toString
    val streamDir = java.nio.file.Files.createTempDirectory("vm-cf-s").toString
    val seeded = IvfModel(model.centroids,
      model.assigned.withColumn("ingest_seq", lit(1L)))
    seeded.save(batchDir, IndexStore.SwapManifest)
    seeded.save(streamDir, IndexStore.SwapManifest)
    val zero = transform(col("embedding"), x => x * 0.0f)
    // the event set: id 3 re-embeds at seq 2; ids 5 and 6 taken down at
    // seq 2; id 6 re-ingested at seq 3 (resurrect)
    val ups = emb.where(col("vec_id") === 3)
      .select(col("vec_id"), col("embedding"),
        lit(2L).as("ingest_seq"), lit("U").as("op"))
    val dels = emb.where(col("vec_id").isin(5L, 6L))
      .select(col("vec_id"), zero.as("embedding"),
        lit(2L).as("ingest_seq"), lit("D").as("op"))
    val res = emb.where(col("vec_id") === 6)
      .select(col("vec_id"), col("embedding"),
        lit(3L).as("ingest_seq"), lit("U").as("op"))

    // batch twin: one append call per op kind (per-row seqs carry the
    // event order, so call boundaries are irrelevant by contract)
    IvfModel.appendVectors(spark, batchDir, ups.unionByName(res),
      "vec_id", "embedding", "ingest_seq")
    IvfModel.deleteVectors(spark, batchDir, dels, "vec_id", "ingest_seq")

    // streaming twin: the same events as three micro-batches
    val tmp = java.nio.file.Files.createTempDirectory("vm-cf-feed").toString
    Seq(ups, dels, res).zipWithIndex.foreach { case (sl, i) =>
      sl.coalesce(1).write.mode(if (i == 0) "overwrite" else "append")
        .parquet(tmp)
      new java.io.File(tmp).listFiles()
        .filter(f => f.getName.endsWith(".parquet"))
        .filter(_.lastModified() > 1700000000000L)
        .foreach(_.setLastModified(1600000000000L + i * 60000L))
    }
    val schema = spark.read.parquet(tmp).schema
    val q = graft.streaming.StreamingIndex.streamingVectorMaintenance(
      spark, tmp, schema, streamDir)
    try q.processAllAvailable() finally q.stop()

    def served(dir: String): Seq[(Long, Long, Int)] =
      IvfModel.load(spark, dir).assigned
        .select(col("id"), col("ingest_seq"), col("cell").cast("int"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq.sorted
    assert(served(streamDir) == served(batchDir),
      "micro-batch boundaries must not change the served state")
    val s6 = IvfModel.load(spark, streamDir).assigned
      .where(col("id") === 6).select("ingest_seq")
      .collect().map(_.getLong(0)).toSeq
    assert(s6 == Seq(3L), s"id 6 must resurrect at its newest seq: $s6")
    assert(IvfModel.load(spark, streamDir).assigned
      .where(col("id") === 5).count() == 0, "id 5 serves excluded")
    Seq(batchDir, streamDir).foreach { d =>
      IvfModel.compactUpserts(spark, d); IvfModel.compactDeletes(spark, d)
    }
    assert(served(streamDir) == served(batchDir))
    // live physical state (manifest-resolved — replaced generation dirs
    // are retained one pass by contract, so raw-parquet would over-read)
    assert(CellManifest.readTable(spark, s"$streamDir/assigned")
      .where(col("id") === 5).count() == 0, "physically scrubbed")
    model.unpersist()
  }

  test("PQ change feed: the op-routed stream maintains both tables; state equals the batch twin with markers applied") {
    val model = SimSearch.trainIvfPq(staleCorpus, "vec_id", "embedding",
      nLists = 8, m = 8, ks = 16)
    val batchDir = java.nio.file.Files.createTempDirectory("vm-pqcf-b").toString
    val streamDir = java.nio.file.Files.createTempDirectory("vm-pqcf-s").toString
    val seeded = PqModel(
      IvfModel(model.ivf.centroids,
        model.ivf.assigned.withColumn("ingest_seq", lit(1L))),
      model.codebooks, model.subDim,
      model.encoded.withColumn("ingest_seq", lit(1L)))
    seeded.save(batchDir); seeded.save(streamDir)
    val zero = transform(col("embedding"), x => x * 0.0f)
    val ups = emb.where(col("vec_id") === 3)
      .select(col("vec_id"), col("embedding"),
        lit(2L).as("ingest_seq"), lit("U").as("op"))
    val dels = emb.where(col("vec_id") === 5)
      .select(col("vec_id"), zero.as("embedding"),
        lit(2L).as("ingest_seq"), lit("D").as("op"))
    PqModel.appendVectors(spark, batchDir, ups, "vec_id", "embedding",
      "ingest_seq")
    PqModel.deleteVectors(spark, batchDir, dels, "vec_id", "ingest_seq")
    val tmp = java.nio.file.Files.createTempDirectory("vm-pqcf-feed").toString
    Seq(ups, dels).zipWithIndex.foreach { case (sl, i) =>
      sl.coalesce(1).write.mode(if (i == 0) "overwrite" else "append")
        .parquet(tmp)
      new java.io.File(tmp).listFiles()
        .filter(f => f.getName.endsWith(".parquet"))
        .filter(_.lastModified() > 1700000000000L)
        .foreach(_.setLastModified(1600000000000L + i * 60000L))
    }
    val schema = spark.read.parquet(tmp).schema
    val q = graft.streaming.StreamingIndex.streamingVectorMaintenance(
      spark, tmp, schema, streamDir, pq = true)
    try q.processAllAvailable() finally q.stop()
    def state(dir: String, table: String): Seq[(Long, Long)] =
      PqModel.load(spark, dir) match { case m2 =>
        (if (table == "encoded") m2.encoded else m2.ivf.assigned)
          .select(col("id"), col("ingest_seq"))
          .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
      }
    Seq("encoded", "assigned").foreach { t =>
      assert(state(streamDir, t) == state(batchDir, t),
        s"$t: streamed change feed must equal the batch twin")
    }
    assert(!state(streamDir, "encoded").exists(_._1 == 5L),
      "the taken-down id serves excluded from the code table too")
    model.unpersist()
  }

  test("generation fold: a pure-append manifest table's fan-out collapses to one generation per offending cell — rows untouched, answers identical, idle twice over") {
    val model = SimSearch.trainIvf(staleCorpus, "vec_id", "embedding",
      nLists = 8, iters = 1)
    val dir = java.nio.file.Files.createTempDirectory("vm-genfold").toString
    IvfModel(model.centroids,
      model.assigned.withColumn("ingest_seq", lit(1L)))
      .save(dir, IndexStore.SwapManifest)
    // three appends of NEW ids: nothing superseded, so compactUpserts
    // has nothing to rewrite and the generation lists only ever grow
    (1 to 3).foreach { i =>
      IvfModel.appendVectors(spark, dir,
        emb.where(col("vec_id") % 3 === i % 3)
          .select((col("vec_id") + i * 10000L).as("vec_id"), col("embedding")),
        "vec_id", "embedding", seq = 1L)
    }
    def genLists = CellManifest.read(spark, s"$dir/assigned")._2.values
    assert(genLists.map(_.length).max >= 3,
      s"appends must fan out: ${genLists.toSeq}")
    IvfModel.compactUpserts(spark, dir)
    assert(genLists.map(_.length).max >= 3,
      "upsert compaction must not touch clean cells' generation lists")
    val before = CellManifest.readTable(spark, s"$dir/assigned")
      .select(col("id"), col("ingest_seq"), col("cell").cast("int"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq.sorted
    val qv = qvOf(4)
    val preTop = topIds(dir, qv, 5)
    IvfModel.compactGenerations(spark, dir, maxGenLists = 1)
    assert(genLists.map(_.length).max == 1,
      s"every offending cell must fold to one generation: ${genLists.toSeq}")
    val after = CellManifest.readTable(spark, s"$dir/assigned")
      .select(col("id"), col("ingest_seq"), col("cell").cast("int"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq.sorted
    assert(after == before, "the fold is purely physical — rows untouched")
    assert(topIds(dir, qv, 5) == preTop, "answers identical across the fold")
    // idle twice over: a below-threshold second call commits no new
    // generation and leaves the live files byte-identical (its head-of-
    // pass gc MAY reclaim the one-pass-retained replaced dirs — that is
    // the retention contract, not a rewrite)
    val manifest = CellManifest.read(spark, s"$dir/assigned")._2
    val liveDirs = manifest.values.flatten.toSet.map((g: Long) => s"_gen-$g/")
    def liveFiles = parquetFiles(s"$dir/assigned")
      .filter { case (p, _) => liveDirs.exists(p.contains) }
    val files = liveFiles
    IvfModel.compactGenerations(spark, dir, maxGenLists = 1)
    assert(CellManifest.read(spark, s"$dir/assigned")._2 == manifest,
      "a below-threshold fold must not commit a generation")
    assert(liveFiles == files,
      "a below-threshold fold must leave live files untouched")
    val plainDir = java.nio.file.Files.createTempDirectory("vm-genplain").toString
    IvfModel(model.centroids,
      model.assigned.withColumn("ingest_seq", lit(1L))).save(plainDir)
    IvfModel.compactGenerations(spark, plainDir, maxGenLists = 1) // no-op
    assert(topIds(plainDir, qv, 3).nonEmpty)
    model.unpersist()
  }

  test("rename-mode file fold: per-cell parquet fan-out is the same debt in a different carrier — folds through the rename swap, reported as cell_files_max") {
    val model = SimSearch.trainIvf(staleCorpus, "vec_id", "embedding",
      nLists = 8, iters = 1)
    val dir = java.nio.file.Files.createTempDirectory("vm-filefold").toString
    IvfModel(model.centroids,
      model.assigned.withColumn("ingest_seq", lit(1L))).save(dir)
    (1 to 3).foreach { i =>
      IvfModel.appendVectors(spark, dir,
        emb.where(col("vec_id") % 3 === i % 3)
          .select((col("vec_id") + i * 10000L).as("vec_id"), col("embedding")),
        "vec_id", "embedding", seq = 1L)
    }
    def debtRow = VectorAudit.maintenanceDebt(spark, dir).collect()(0)
    assert(debtRow.getAs[Long]("gen_lists_max") == -1L,
      "rename mode has no generations")
    assert(debtRow.getAs[Long]("cell_files_max") >= 3L,
      s"appends must fan out files per cell: $debtRow")
    // supersession compaction is a no-op on the pure-append table
    IvfModel.compactUpserts(spark, dir)
    assert(debtRow.getAs[Long]("cell_files_max") >= 3L)
    val before = spark.read.parquet(s"$dir/assigned")
      .select(col("id"), col("ingest_seq"), col("cell").cast("int"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq.sorted
    IvfModel.compactGenerations(spark, dir, maxGenLists = 1)
    assert(debtRow.getAs[Long]("cell_files_max") == 1L,
      s"every cell must fold to one file: $debtRow")
    val after = spark.read.parquet(s"$dir/assigned")
      .select(col("id"), col("ingest_seq"), col("cell").cast("int"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq.sorted
    assert(after == before, "the fold is purely physical")
    model.unpersist()
  }

  test("PQ generation fold: both manifest tables fold together — codes and assignments byte-equal across the fold") {
    val model = SimSearch.trainIvfPq(staleCorpus, "vec_id", "embedding",
      nLists = 8, m = 8, ks = 16)
    val dir = java.nio.file.Files.createTempDirectory("vm-pqgenfold").toString
    PqModel(IvfModel(model.ivf.centroids,
        model.ivf.assigned.withColumn("ingest_seq", lit(1L))),
      model.codebooks, model.subDim,
      model.encoded.withColumn("ingest_seq", lit(1L)))
      .save(dir, IndexStore.SwapManifest)
    (1 to 3).foreach { i =>
      PqModel.appendVectors(spark, dir,
        emb.where(col("vec_id") % 3 === i % 3)
          .select((col("vec_id") + i * 10000L).as("vec_id"), col("embedding")),
        "vec_id", "embedding", seq = 1L)
    }
    def listsOf(t: String) = CellManifest.read(spark, s"$dir/$t")._2.values
    assert(listsOf("encoded").map(_.length).max >= 3 &&
      listsOf("ivf/assigned").map(_.length).max >= 3,
      "appends must fan out both tables")
    def codesOf: Seq[(Long, Seq[Int], Long)] =
      CellManifest.readTable(spark, s"$dir/encoded")
        .select(col("id"), col("codes"), col("ingest_seq"))
        .collect().map(r => (r.getLong(0), r.getSeq[Int](1).toSeq, r.getLong(2)))
        .toSeq.sortBy(x => (x._1, x._3))
    val before = codesOf
    PqModel.compactGenerations(spark, dir, maxGenLists = 1)
    assert(listsOf("encoded").map(_.length).max == 1 &&
      listsOf("ivf/assigned").map(_.length).max == 1,
      "both tables must fold to one generation per cell")
    assert(codesOf == before, "codes pass through the fold untouched")
    model.unpersist()
  }

  test("PQ streaming sink: one logical append per micro-batch maintains BOTH tables; the debt trigger compacts both — state equals the one-batch twin") {
    val model = SimSearch.trainIvfPq(staleCorpus, "vec_id", "embedding",
      nLists = 8, m = 8, ks = 16)
    val batchDir = java.nio.file.Files.createTempDirectory("vm-pqdebt-b").toString
    val streamDir = java.nio.file.Files.createTempDirectory("vm-pqdebt-s").toString
    val seeded = PqModel(
      IvfModel(model.ivf.centroids,
        model.ivf.assigned.withColumn("ingest_seq", lit(1L))),
      model.codebooks, model.subDim,
      model.encoded.withColumn("ingest_seq", lit(1L)))
    seeded.save(batchDir); seeded.save(streamDir)
    val slice = emb.where(col("vec_id") % 17 === 3)
      .select(col("vec_id"), col("embedding"), lit(2L).as("ingest_seq"))

    PqModel.appendVectors(spark, batchDir, slice, "vec_id", "embedding",
      "ingest_seq")
    PqModel.compactUpserts(spark, batchDir)

    val tmp = java.nio.file.Files.createTempDirectory("vm-pqdebt-feed").toString
    slice.repartition(2).write.mode("overwrite").parquet(tmp)
    val schema = spark.read.parquet(tmp).schema
    val q = graft.streaming.StreamingIndex.streamingVectorIngest(
      spark, tmp, schema, streamDir, pq = true, compactAtSuperseded = 1L)
    try q.processAllAvailable() finally q.stop()

    // both persisted tables compacted by the trigger, state equal to the
    // one-batch twin — codes never pair with foreign codebooks because
    // the sink encodes against the FROZEN model
    def state(dir: String, table: String): Seq[(Long, Long)] =
      CellManifest.readTable(spark, s"$dir/$table")
        .select(col("id"), col("ingest_seq"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
    Seq("ivf/assigned", "encoded").foreach { t =>
      assert(state(streamDir, t) == state(batchDir, t),
        s"$t: streamed state must equal the one-batch twin")
      val rows = state(streamDir, t)
      assert(rows.groupBy(_._1).forall(_._2.length == 1),
        s"$t: the debt trigger must have dropped every superseded row: $rows")
    }
    val codes = CellManifest.readTable(spark, s"$streamDir/encoded")
      .where(col("id") === 3).select("codes", "ingest_seq").collect()
    assert(codes.length == 1 && codes(0).getLong(1) == 2L,
      "the re-embedded id serves its seq-2 codes only")
    model.unpersist()
  }

  private def idSeqs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.select(col("id"), col("ingest_seq")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  test("snapshot pin: time-travel reads stay byte-stable across append + compaction + gc; live moves on; unpin reclaims next pass") {
    val model = SimSearch.trainIvf(staleCorpus, "vec_id", "embedding",
      nLists = 8, iters = 1)
    val dir = java.nio.file.Files.createTempDirectory("vm-pin").toString
    IvfModel(model.centroids,
        model.assigned.withColumn("ingest_seq", lit(1L)))
      .save(dir, IndexStore.SwapManifest)
    model.unpersist()
    val table = s"$dir/assigned"
    val qv = qvOf(7L)
    val truthAtPin = idSeqs(CellManifest.readTable(spark, table))
    val answerAtPin = topIds(dir, qv, 3)

    val m = IvfModel.pinSnapshot(spark, dir, "train_v1")
    assert(IvfModel.snapshots(spark, dir) == Map("train_v1" -> m))

    // the live table moves: upsert, physical compaction (rewrites the
    // dirty cells into NEW generations), and the gc at each maintenance
    // head — none of which may touch the pinned truth
    IvfModel.appendVectors(spark, dir, emb.where(col("vec_id") === 3),
      "vec_id", "embedding", seq = 2L)
    IvfModel.compactUpserts(spark, dir)
    IvfModel.compactGenerations(spark, dir, maxGenLists = 1)

    assert(idSeqs(CellManifest.readTable(spark, table, "train_v1"))
      == truthAtPin, "the pinned multiset must be exactly the pin-time truth")
    val pinned = IvfModel.load(spark, dir, "train_v1")
    assert(pinned.query(qv, 3, nProbe = 8).collect()
      .map(r => (r.getLong(0), r.getDouble(2))).toSeq == answerAtPin,
      "a pinned query must answer the pin-time truth")
    assert(pinned.assigned.where(col("ingest_seq") === 2L).count() == 0,
      "post-pin ingest must be invisible through the pin")
    val live = IvfModel.load(spark, dir).assigned
      .where(col("id") === 3).select("ingest_seq")
      .collect().map(_.getLong(0)).toSeq
    assert(live == Seq(2L), s"the live table must serve the upsert: $live")

    // export the pin as a standalone index BEFORE unpinning — the escape
    // hatch: the exported copy must keep answering the pin-time truth
    // after the pin (and its retained generations) are gone
    val exp = java.nio.file.Files.createTempDirectory("vm-pin-exp").toString + "/m"
    IvfModel.exportSnapshot(spark, dir, "train_v1", exp)

    // unpin: the generations only the pin referenced reclaim at the NEXT
    // maintenance head, and the pinned name resolves loudly never stale
    IvfModel.unpinSnapshot(spark, dir, "train_v1")
    intercept[IllegalArgumentException] {
      CellManifest.readTable(spark, table, "train_v1")
    }
    IvfModel.compactUpserts(spark, dir) // gc runs at its head
    val manifests = new java.io.File(s"$table/_vmanifest").listFiles()
      .map(_.getName).filter(_.startsWith("manifest-"))
      .map(_.stripPrefix("manifest-").toLong).sorted
    assert(!manifests.contains(m),
      s"the unpinned manifest must reclaim at the next pass: $manifests")
    // the exported standalone copy outlives the pin: same ids at the
    // pin-time seqs (one seq per id — the served state), same answer
    val expm = IvfModel.load(spark, exp)
    assert(idSeqs(expm.assigned) == truthAtPin,
      "the export must hold exactly the pin-time served state")
    assert(expm.query(qv, 3, nProbe = 8).collect()
      .map(r => (r.getLong(0), r.getDouble(2))).toSeq == answerAtPin,
      "the exported index must answer the pin-time truth with no pin")
  }

  test("snapshot pin guards: double-pin throws, unknown unpin throws, rename-mode refuses, re-save and retrain refuse while pinned") {
    val model = SimSearch.trainIvf(staleCorpus, "vec_id", "embedding",
      nLists = 8, iters = 1)
    val dir = java.nio.file.Files.createTempDirectory("vm-pin-guard").toString
    val seeded = IvfModel(model.centroids,
      model.assigned.withColumn("ingest_seq", lit(1L)))
    seeded.save(dir, IndexStore.SwapManifest)
    IvfModel.pinSnapshot(spark, dir, "p1")
    intercept[IllegalStateException] { IvfModel.pinSnapshot(spark, dir, "p1") }
    intercept[IllegalArgumentException] {
      IvfModel.unpinSnapshot(spark, dir, "nope")
    }

    // whole-table writers refuse while the pin references the generations
    val exR = intercept[IllegalStateException] {
      IvfModel.retrain(spark, dir, nLists = 8, iters = 1)
    }
    assert(exR.getMessage.contains("p1"), exR.getMessage)
    val exS = intercept[IllegalStateException] {
      seeded.save(dir, IndexStore.SwapManifest)
    }
    assert(exS.getMessage.contains("p1"), exS.getMessage)
    // both refusals changed nothing: the pin still reads, the live table
    // still serves seq-1 truth
    assert(idSeqs(CellManifest.readTable(spark, s"$dir/assigned", "p1"))
      == idSeqs(CellManifest.readTable(spark, s"$dir/assigned")))

    // after the unpin, retrain proceeds (the refusal was the pin, nothing
    // else) — and a rename-mode table has no manifest to pin against
    IvfModel.unpinSnapshot(spark, dir, "p1")
    IvfModel.retrain(spark, dir, nLists = 8, iters = 1)
    val renameDir = java.nio.file.Files.createTempDirectory("vm-pin-ren").toString
    seeded.save(renameDir) // rename mode
    intercept[IllegalArgumentException] {
      IvfModel.pinSnapshot(spark, renameDir, "p1")
    }
    model.unpersist()
  }

  test("snapshot pin vs takedown: markers pierce the pin at read time; compactDeletes retains markers while pinned, clears after unpin") {
    val model = SimSearch.trainIvf(staleCorpus, "vec_id", "embedding",
      nLists = 8, iters = 1)
    val dir = java.nio.file.Files.createTempDirectory("vm-pin-del").toString
    IvfModel(model.centroids,
        model.assigned.withColumn("ingest_seq", lit(1L)))
      .save(dir, IndexStore.SwapManifest)
    model.unpersist()
    IvfModel.pinSnapshot(spark, dir, "audit_v1")
    IvfModel.deleteVectors(spark, dir,
      emb.where(col("vec_id") === 5).select("vec_id"), seq = 2L)

    // compliance outranks reproducibility: the marker excludes the id
    // from the PINNED read immediately, though the pinned bytes hold it
    assert(IvfModel.load(spark, dir, "audit_v1").assigned
      .where(col("id") === 5).count() == 0,
      "a takedown must pierce the pin at read time")
    assert(CellManifest.readTable(spark, s"$dir/assigned", "audit_v1")
      .where(col("id") === 5).count() == 1,
      "the pinned generation itself is immutable — the marker does the work")

    IvfModel.compactDeletes(spark, dir)
    assert(CellManifest.readTable(spark, s"$dir/assigned")
      .where(col("id") === 5).count() == 0,
      "the live table must physically scrub")
    assert(new java.io.File(s"$dir/deleted").exists(),
      "markers must RETAIN while a pin exists — the pinned read depends " +
        "on them for the exclusion")
    assert(IvfModel.load(spark, dir, "audit_v1").assigned
      .where(col("id") === 5).count() == 0,
      "the pinned read must stay clean after the live scrub")

    IvfModel.unpinSnapshot(spark, dir, "audit_v1")
    IvfModel.compactDeletes(spark, dir)
    assert(!new java.io.File(s"$dir/deleted").exists(),
      "markers clear at the first compactDeletes after the last unpin")
  }

  test("snapshot pin under the streaming sink: debt-fired compactions and generation folds never disturb the pinned truth") {
    val model = SimSearch.trainIvf(staleCorpus, "vec_id", "embedding",
      nLists = 8, iters = 1)
    val dir = java.nio.file.Files.createTempDirectory("vm-pin-stream").toString
    IvfModel(model.centroids,
        model.assigned.withColumn("ingest_seq", lit(1L)))
      .save(dir, IndexStore.SwapManifest)
    model.unpersist()
    val truthAtPin = idSeqs(CellManifest.readTable(spark, s"$dir/assigned"))
    IvfModel.pinSnapshot(spark, dir, "pre_stream")

    // a continuous-ingest stream with BOTH in-sink maintenance triggers
    // armed: the re-embedding slice supersedes (debt-fired compactUpserts
    // rewrites dirty cells) and the per-micro-batch appends fan out
    // generations (fold-fired compactGenerations) — every maintenance
    // head runs gc, and none of it may touch the pinned truth
    val slice = emb.where(col("vec_id") % 17 === 3)
      .select(col("vec_id"), col("embedding"), lit(2L).as("ingest_seq"))
    val tmp = java.nio.file.Files.createTempDirectory("vm-pin-feed").toString
    slice.repartition(3).write.mode("overwrite").parquet(tmp)
    val schema = spark.read.parquet(tmp).schema
    val q = graft.streaming.StreamingIndex.streamingVectorIngest(
      spark, tmp, schema, dir, compactAtSuperseded = 1L, compactAtGenLists = 1)
    try q.processAllAvailable() finally q.stop()

    val narrow = CellManifest.readTable(spark, s"$dir/assigned")
      .select(col("id"), col("ingest_seq"))
    val stale = narrow.join(
        narrow.groupBy(col("id")).agg(max(col("ingest_seq")).as("__w")),
        Seq("id"))
      .where(col("ingest_seq") < col("__w")).count()
    assert(stale == 0L, "the in-sink triggers must have fired (the test " +
      s"needs real mid-stream maintenance to mean anything): $stale")
    assert(idSeqs(CellManifest.readTable(spark, s"$dir/assigned", "pre_stream"))
      == truthAtPin,
      "the pinned truth must survive the stream's own maintenance")
    assert(IvfModel.load(spark, dir, "pre_stream").assigned
      .where(col("ingest_seq") === 2L).count() == 0,
      "streamed ingest must be invisible through the pin")
    IvfModel.unpinSnapshot(spark, dir, "pre_stream")
  }

  test("PQ snapshot pin: one name covers both cell tables; pinned queries answer the pin-time truth; a half-failed pin rolls back") {
    val model = SimSearch.trainIvfPq(staleCorpus, "vec_id", "embedding",
      nLists = 8, m = 8, ks = 16)
    val dir = java.nio.file.Files.createTempDirectory("vm-pin-pq").toString
    PqModel(IvfModel(model.ivf.centroids,
        model.ivf.assigned.withColumn("ingest_seq", lit(1L))),
      model.codebooks, model.subDim,
      model.encoded.withColumn("ingest_seq", lit(1L)))
      .save(dir, IndexStore.SwapManifest)
    model.unpersist()
    val truthAtPin = idSeqs(CellManifest.readTable(spark, s"$dir/encoded"))
    PqModel.pinSnapshot(spark, dir, "pq_v1")
    assert(PqModel.snapshots(spark, dir).contains("pq_v1"))

    PqModel.appendVectors(spark, dir, emb.where(col("vec_id") === 3),
      "vec_id", "embedding", seq = 2L)
    PqModel.compactUpserts(spark, dir)

    // the PQ-layout debt signal aggregates BOTH halves: one pin, a
    // positive manifest-commit age, retention from ivf + encoded
    val debt = graft.sources.VectorAudit.snapshotDebt(spark, dir).collect()(0)
    assert(debt.getInt(0) == 1 && debt.getString(1) == "pq_v1" &&
      debt.getLong(2) > 0L && debt.getLong(3) > 0L,
      s"PQ snapshotDebt must see the aged two-table pin: ${debt.toSeq}")

    val pinned = PqModel.load(spark, dir, "pq_v1")
    assert(idSeqs(pinned.encoded) == truthAtPin,
      "the pinned encoded table must be exactly the pin-time truth")
    assert(pinned.ivf.assigned.where(col("ingest_seq") === 2L).count() == 0
      && pinned.encoded.where(col("ingest_seq") === 2L).count() == 0,
      "post-pin ingest must be invisible through the pin in BOTH tables")
    assert(PqModel.load(spark, dir).encoded.where(col("id") === 3)
      .select("ingest_seq").collect().map(_.getLong(0)).toSeq == Seq(2L),
      "the live index must serve the upsert")

    // a duplicate-name pin fails on the FIRST half and leaves no
    // half-pinned state; a fresh name that fails on the second half
    // rolls the first back (forced by pinning the encoded name directly)
    intercept[IllegalStateException] { PqModel.pinSnapshot(spark, dir, "pq_v1") }
    CellManifest.pin(spark, s"$dir/encoded", "half")
    intercept[IllegalStateException] { PqModel.pinSnapshot(spark, dir, "half") }
    assert(!PqModel.snapshots(spark, dir).contains("half"),
      "a half-failed pin must roll back the ivf half")
    CellManifest.unpin(spark, s"$dir/encoded", "half")

    PqModel.unpinSnapshot(spark, dir, "pq_v1")
    assert(PqModel.snapshots(spark, dir).isEmpty
      && CellManifest.pins(spark, s"$dir/encoded").isEmpty,
      "unpin must clear both halves")
    PqModel.compactUpserts(spark, dir) // post-unpin head: gc reclaims
    val after = graft.sources.VectorAudit.snapshotDebt(spark, dir).collect()(0)
    assert(after.getInt(0) == 0 && after.getLong(2) == -1L &&
      after.getLong(3) == 0L,
      s"PQ snapshotDebt must clear after unpin + maintenance head: ${after.toSeq}")
  }
}
