package graft

import graft.operators.{IvfModel, SimSearch}
import graft.sources.Fence
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The fencing-token protocol's own contract ([[graft.sources.Fence]]) —
  * the properties the per-operator fence tests (IndexStoreSpec /
  * VectorStoreSpec interleave refusals) rely on but don't pin directly:
  * epochs are NOT leases, so there is nothing to leak, time out, or
  * manually clean; and racing claims can never share a token.
  */
class FenceSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  lazy val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")

  test("racing claims never share a token: the create-exclusive loser advances past the winner; both tokens validate their own epoch only") {
    val dir = java.nio.file.Files.createTempDirectory("fence-race").toString
    val winner = Fence.begin(spark, dir)
    // the competitor's claim is already on disk when the loser retries:
    // pre-create the next epoch file, exactly what begin would race on
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sessionState.newHadoopConf())
    fs.create(new org.apache.hadoop.fs.Path(s"$dir/_fence/epoch-${winner + 1}"),
      false).close()
    val loser = Fence.begin(spark, dir)
    assert(loser == winner + 2,
      s"the loser must advance past the competitor's $winner+1: got $loser")
    // the newest claim is the only valid token
    Fence.check(spark, dir, loser)
    val ex = intercept[IllegalStateException](Fence.check(spark, dir, winner))
    assert(ex.getMessage.contains("writer fence violated"), ex.getMessage)
  }

  test("a transient create failure on one epoch file is a lost race, not corruption: begin advances, the token validates, no cleanup needed") {
    val tmp = java.nio.file.Files.createTempDirectory("fence-fault").toString
    spark.sparkContext.hadoopConfiguration
      .set("fs.faultfs.impl", classOf[FaultFs].getName)
    val dir = s"faultfs:$tmp"
    val cur = Fence.begin(spark, dir) // seed epoch 1 cleanly
    FaultFs.reset()
    FaultFs.failCreateOn = Some(s"epoch-${cur + 1}")
    try {
      // the store refuses the put of epoch-(cur+1) — an object store's
      // conditional-put failure and a lost race are indistinguishable to
      // the claimer, and both are safe: take the next number
      val token = Fence.begin(spark, dir)
      assert(token == cur + 2,
        s"begin must advance past the refused number: got $token")
      Fence.check(spark, dir, token)
    } finally FaultFs.reset()
  }

  test("a hidden-newest listing (eventually-consistent store) never shares a token and never passes a stale commit: the successor walk resolves the true head by point reads") {
    val tmp = java.nio.file.Files.createTempDirectory("fence-hide").toString
    spark.sparkContext.hadoopConfiguration
      .set("fs.faultfs.impl", classOf[FaultFs].getName)
    val dir = s"faultfs:$tmp"
    FaultFs.reset()
    val a = Fence.begin(spark, dir)
    val b = Fence.begin(spark, dir) // two epochs on disk so hiding bites
    try {
      FaultFs.hideNewestEpoch = true
      // the listing now hides epoch-b, but exists() still sees it: a new
      // claimer must resolve the TRUE head and land strictly past it —
      // never reuse b's number (shared token) or a number below it
      val c = Fence.begin(spark, dir)
      assert(c == b + 1,
        s"claim under a stale listing must walk to the true head $b: got $c")
      // ...and the fenced-out writer's commit must refuse LOUDLY even
      // while the listing still hides the newest claim — the point-read
      // successor probe, not the listing, decides the commit
      val ex = intercept[IllegalStateException](Fence.check(spark, dir, b))
      assert(ex.getMessage.contains("writer fence violated"), ex.getMessage)
      Fence.check(spark, dir, c) // the true newest token still validates
      assert(a < b && b < c, "tokens stay strictly ordered")
    } finally FaultFs.reset()
  }

  test("a persistently refusing store is an outage, not an epoch climb: begin throws loudly after the refusal cap instead of advancing forever") {
    val tmp = java.nio.file.Files.createTempDirectory("fence-outage").toString
    spark.sparkContext.hadoopConfiguration
      .set("fs.faultfs.impl", classOf[FaultFs].getName)
    val dir = s"faultfs:$tmp"
    FaultFs.reset()
    val seeded = Fence.begin(spark, dir) // the dir exists; store then dies
    FaultFs.failCreateOn = Some("epoch-") // EVERY claim put refused
    try {
      val ex = intercept[IllegalStateException](Fence.begin(spark, dir))
      assert(ex.getMessage.contains("store is refusing puts"), ex.getMessage)
      assert(ex.getCause.isInstanceOf[java.io.IOException])
    } finally FaultFs.reset()
    // the climb was bounded AND left nothing behind: no epoch file past
    // the seeded one, so the table's epoch did not move
    assert(Fence.current(spark, dir) == seeded,
      "a refused claim storm must not advance the table's epoch")
  }

  test("a fence refusal is TYPED: check throws FenceViolation, so race-retry callers match on the class and the message text is free to change") {
    val dir = java.nio.file.Files.createTempDirectory("fence-typed").toString
    val older = Fence.begin(spark, dir)
    Fence.begin(spark, dir)
    // the supertype catch sites keep working (FenceViolation extends
    // IllegalStateException), and the structural match works too
    val ex = intercept[graft.sources.FenceViolation](
      Fence.check(spark, dir, older))
    assert(ex.isInstanceOf[IllegalStateException])
  }

  test("a re-seeded fence back-fills a contiguous tail: a stale listing that hides the lone post-wipe epoch still resolves the true head by the successor walk") {
    val tmp = java.nio.file.Files.createTempDirectory("fence-reseed").toString
    spark.sparkContext.hadoopConfiguration
      .set("fs.faultfs.impl", classOf[FaultFs].getName)
    val dir = s"faultfs:$tmp"
    FaultFs.reset()
    val pre = Fence.begin(spark, dir) // pre-wipe history
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    // the overwrite/relayout wipe: _fence goes with the directory
    fs.delete(new org.apache.hadoop.fs.Path(s"$dir/_fence"), true)
    val reseeded = Fence.begin(spark, dir, atLeast = pre + 1)
    assert(reseeded == pre + 1, s"re-seed must land at pre+1: $reseeded")
    // the back-fill gives the lone re-seeded epoch contiguous
    // predecessors, so a listing blind to the newest file still walks to
    // the head — without it current() would resolve 0 here and a new
    // claim would re-use a low slot the pre-wipe tokens already held
    try {
      FaultFs.hideNewestEpoch = true
      assert(Fence.current(spark, dir) == reseeded,
        "a stale listing must still resolve the re-seeded head")
      val next = Fence.begin(spark, dir)
      assert(next == reseeded + 1,
        s"claim under a stale listing must land past the re-seed: $next")
      val ex = intercept[graft.sources.FenceViolation](
        Fence.check(spark, dir, reseeded))
      assert(ex.getMessage.contains("writer fence violated"), ex.getMessage)
    } finally FaultFs.reset()
  }

  test("a crashed claimer never wedges the table: epochs are not leases — the next op claims over the dangling epoch and proceeds, zero cleanup") {
    val model = SimSearch.trainIvf(emb, "vec_id", "embedding",
      nLists = 4, iters = 0)
    val dir = java.nio.file.Files.createTempDirectory("fence-crash").toString
    IvfModel(model.centroids,
      model.assigned.withColumn("ingest_seq", lit(1L))).save(dir)
    // a writer claims at its head and dies before doing ANY work: the
    // epoch file is all it leaves behind
    val dangling = Fence.begin(spark, dir)
    // a fresh op needs no timeout, no lease steal, no manual unlock —
    // its own head claim outranks the corpse and the append lands
    IvfModel.appendVectors(spark, dir, emb.where(col("vec_id") === 3),
      "vec_id", "embedding", seq = 2L)
    assert(Fence.current(spark, dir) > dangling,
      "the fresh op's claim must outrank the dangling epoch")
    val seqs = spark.read.parquet(s"$dir/assigned")
      .where(col("id") === 3).select("ingest_seq")
      .collect().map(_.getLong(0)).toSeq.sorted
    assert(seqs == Seq(1L, 2L), s"the append must have landed: $seqs")
    // ...and the corpse's token can never commit anything afterwards
    val ex = intercept[IllegalStateException](Fence.check(spark, dir, dangling))
    assert(ex.getMessage.contains("writer fence violated"), ex.getMessage)
    model.unpersist()
  }
}
