package graft

import graft.operators.{IvfModel, SimSearch}
import graft.sources.{CellManifest, IndexStore, VectorAudit}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Fault-injection matrix for the manifest commit protocol, driven
  * through [[FaultFs]] — the object-store semantics
  * [[graft.sources.CellManifest]] was designed for, proven without S3:
  * every injected fault lands readers on a COMPLETE generation (old
  * until the put, new after, duplicates collapsing at compaction), and
  * the one impossible-on-object-stores state (a torn single put) fails
  * loudly instead of serving a truncated cell map.
  */
class ManifestFaultSpec extends AnyFunSuite {
  lazy val spark = {
    val s = TestSpark.spark
    s.sparkContext.hadoopConfiguration
      .set("fs.faultfs.impl", classOf[FaultFs].getName)
    s
  }
  lazy val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")

  private def freshModelDir(): (String, String) = {
    val local = java.nio.file.Files.createTempDirectory("vm-fault").toString
    (s"faultfs:$local", local)
  }

  private def seededSave(dir: String): Unit = {
    val m = SimSearch.trainIvf(emb, "vec_id", "embedding", nLists = 8, iters = 1)
    IvfModel(m.centroids, m.assigned.withColumn("ingest_seq", lit(1L)))
      .save(dir, IndexStore.SwapManifest)
    m.unpersist()
  }

  private def rowsOf(dir: String): Set[(Long, Long)] =
    CellManifest.readTable(spark, s"$dir/assigned")
      .select(col("id"), col("ingest_seq"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("fail-before-put: the commit create fails — readers keep the old manifest complete; the whole-batch replay lands once") {
    val (dir, _) = freshModelDir()
    seededSave(dir)
    val pre = rowsOf(dir)
    FaultFs.failCreateOn = Some(".tmp-manifest")
    val ex = try intercept[Exception] {
      IvfModel.appendVectors(spark, dir, emb.where(col("vec_id") === 3),
        "vec_id", "embedding", seq = 2L)
    } finally FaultFs.reset()
    assert(ex.getMessage.contains("fail-before-put"), ex.getMessage)
    assert(rowsOf(dir) == pre,
      "a failed put must leave readers on the old complete manifest")
    // the caller's contract: replay the WHOLE batch
    IvfModel.appendVectors(spark, dir, emb.where(col("vec_id") === 3),
      "vec_id", "embedding", seq = 2L)
    assert(rowsOf(dir) == pre + ((3L, 2L)), "the replay must land exactly once")
    // the crashed attempt's orphan stage is reclaimed at the next pass
    IvfModel.compactUpserts(spark, dir)
    VectorAudit.verifyVectorState(spark, dir)
    assert(rowsOf(dir) == (pre - ((3L, 1L))) + ((3L, 2L)))
  }

  test("fail-after-put (S3 rename: copy lands, cleanup crashes): the commit IS visible; the at-least-once replay's duplicate collapses at compaction") {
    val (dir, _) = freshModelDir()
    seededSave(dir)
    FaultFs.crashRenameAfterCopyOn = Some("/manifest-")
    val ex = try intercept[Exception] {
      IvfModel.appendVectors(spark, dir, emb.where(col("vec_id") === 3),
        "vec_id", "embedding", seq = 2L)
    } finally FaultFs.reset()
    assert(ex.getMessage.contains("injected crash after copy"), ex.getMessage)
    // the put landed whole before the crash — the new generation serves
    assert(CellManifest.readTable(spark, s"$dir/assigned")
      .where(col("id") === 3 && col("ingest_seq") === 2L).count() == 1,
      "a post-put crash must not lose the committed generation")
    // the caller cannot know the put landed: it replays the whole batch,
    // and the duplicate copy collapses at the next compaction
    IvfModel.appendVectors(spark, dir, emb.where(col("vec_id") === 3),
      "vec_id", "embedding", seq = 2L)
    assert(CellManifest.readTable(spark, s"$dir/assigned")
      .where(col("id") === 3 && col("ingest_seq") === 2L).count() == 2,
      "pre-compaction the redelivered copy is physically present")
    IvfModel.compactUpserts(spark, dir)
    assert(CellManifest.readTable(spark, s"$dir/assigned")
      .where(col("id") === 3).collect()
      .map(r => r.getAs[Long]("ingest_seq")).toSeq == Seq(2L),
      "compaction must collapse the replayed duplicate to the one winner")
    VectorAudit.verifyVectorState(spark, dir)
  }

  test("eventually-consistent listing: a reader that can't see the newest manifest serves the PREVIOUS generation set, complete (two-generation retention)") {
    val (dir, _) = freshModelDir()
    seededSave(dir)
    IvfModel.appendVectors(spark, dir, emb.where(col("vec_id") === 3),
      "vec_id", "embedding", seq = 2L)
    val preCompact = rowsOf(dir) // both versions of id 3 visible
    IvfModel.compactUpserts(spark, dir) // rewrite commits a new manifest
    val postCompact = rowsOf(dir)
    assert(postCompact == preCompact - ((3L, 1L)))
    // the listing hides the newest manifest: the reader resolves the
    // previous one — whose generation directories the rewrite RETAINED —
    // and serves that complete pre-compaction state, no missing files
    FaultFs.hideNewestManifest = true
    val stale = try rowsOf(dir) finally FaultFs.hideNewestManifest = false
    assert(stale == preCompact,
      s"the stale listing must serve the previous COMPLETE state: $stale")
    assert(rowsOf(dir) == postCompact, "a caught-up listing serves the newest")
  }

  test("a torn manifest (impossible as a single object put; a broken copy could) fails LOUDLY, never a truncated cell map") {
    val (dir, local) = freshModelDir()
    seededSave(dir)
    val md = new java.io.File(s"$local/assigned/_vmanifest")
    val newest = md.listFiles().filter(_.getName.startsWith("manifest-"))
      .maxBy(_.getName.stripPrefix("manifest-").toLong)
    val bytes = java.nio.file.Files.readAllBytes(newest.toPath)
    java.nio.file.Files.write(newest.toPath,
      java.util.Arrays.copyOf(bytes, bytes.length - 3)) // tear the tail
    val ex = intercept[IllegalArgumentException] {
      CellManifest.read(spark, s"$dir/assigned")
    }
    assert(ex.getMessage.contains("TORN"), ex.getMessage)
  }

  test("pin fail-before-put: the pin create fails — no pin lands, nothing is retained; the retry pins clean") {
    val (dir, _) = freshModelDir()
    seededSave(dir)
    FaultFs.failCreateOn = Some("pin-t1")
    val ex = try intercept[IllegalStateException] {
      CellManifest.pin(spark, s"$dir/assigned", "t1")
    } finally FaultFs.reset()
    // a transient store failure on the create-exclusive put is
    // indistinguishable from a lost double-pin race — both are safe
    // (nothing landed) and both read as the same loud refusal
    assert(ex.getMessage.contains("t1"), ex.getMessage)
    assert(CellManifest.pins(spark, s"$dir/assigned").isEmpty,
      "a failed pin put must leave no pin")
    val m = CellManifest.pin(spark, s"$dir/assigned", "t1")
    assert(CellManifest.pins(spark, s"$dir/assigned") == Map("t1" -> m),
      "the retry must pin clean")
  }

  test("a torn pin file fails LOUDLY, never a silently empty snapshot") {
    val (dir, local) = freshModelDir()
    seededSave(dir)
    CellManifest.pin(spark, s"$dir/assigned", "t1")
    val pinFile = new java.io.File(s"$local/assigned/_vmanifest/pin-t1")
    val bytes = java.nio.file.Files.readAllBytes(pinFile.toPath)
    java.nio.file.Files.write(pinFile.toPath,
      java.util.Arrays.copyOf(bytes, bytes.length - 3)) // tear the tail
    val ex = intercept[IllegalArgumentException] {
      CellManifest.pins(spark, s"$dir/assigned")
    }
    assert(ex.getMessage.contains("TORN"), ex.getMessage)
  }

  test("pin under an eventually-consistent listing: the pin resolves the newest VISIBLE manifest — a complete generation set, retained") {
    val (dir, _) = freshModelDir()
    seededSave(dir)
    val pre = rowsOf(dir)
    // an append advances the manifest; the listing hides the newest one
    IvfModel.appendVectors(spark, dir, emb.where(col("vec_id") === 3),
      "vec_id", "embedding", seq = 2L)
    FaultFs.hideNewestManifest = true
    val m = try CellManifest.pin(spark, s"$dir/assigned", "stale")
    finally FaultFs.reset()
    // the pin references the PREVIOUS (pre-append) manifest — a complete
    // state by the two-generation retention, and gc keeps it now that
    // the pin names it
    val pinned = CellManifest.readTable(spark, s"$dir/assigned", "stale")
      .select(col("id"), col("ingest_seq"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pinned == pre,
      s"the stale-listing pin must serve the complete previous state: " +
        s"manifest-$m")
    IvfModel.compactUpserts(spark, dir)
    val pinnedAfter = CellManifest.readTable(spark, s"$dir/assigned", "stale")
      .select(col("id"), col("ingest_seq"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pinnedAfter == pre, "gc must retain the stale-listing pin's state")
  }
}
