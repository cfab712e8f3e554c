package graft

import graft.operators.{IvfModel, SimSearch}
import graft.sources.{Fence, IndexStore, MaintHooks, Snapshots}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The cross-index consistent pin-pair ([[graft.sources.Snapshots]]):
  * claim-all → pin-all → check-all, so a training run's text + vector
  * snapshot can never straddle a writer that began inside the pin
  * window — the straddle is detected at the commit point and the whole
  * attempt rolls back and retries against the newer state.
  */
class SnapshotPairSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  lazy val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")

  private def freshTextTable(name: String): String = {
    val spark2 = spark
    import spark2.implicits._
    IndexStore.reset(spark, name)
    def posting(id: Long, bucket: String, seq: Long) =
      (id, Array(s"sig$id-$seq"), Array(bucket), seq)
    IndexStore.saveInverted(
      Seq(posting(1L, "aa11", 1L), posting(2L, "bb22", 1L))
        .toDF(Cols.Id, Cols.Signature, Cols.BucketIds, "ingest_seq"),
      name, prefixLen = 2, swapMode = IndexStore.SwapManifest)
    name
  }

  private def freshVectorDir(tag: String): String = {
    val dir = java.nio.file.Files.createTempDirectory(tag).toString
    val m = SimSearch.trainIvf(emb, "vec_id", "embedding", nLists = 4, iters = 0)
    IvfModel(m.centroids, m.assigned.withColumn("ingest_seq", lit(1L)))
      .save(dir, IndexStore.SwapManifest)
    m.unpersist()
    dir
  }

  test("a racing append between the two pins is fenced out: the attempt rolls back whole and the retry pins one coherent (newer) corpus state") {
    val table = freshTextTable("graft_pair_race")
    val dir = freshVectorDir("pair-race-vec")
    // the race: while the TEXT pin sits staged (pinned window already
    // open — both fences claimed), a vector ingest lands. Its head claim
    // moves the vector epoch past the helper's token, so the check-all
    // commit point must refuse, unpin the text pin, and retry.
    var fired = false
    MaintHooks.hook = (point, _) =>
      if (point == "pin.staged" && !fired) {
        fired = true
        IvfModel.appendVectors(spark, dir,
          emb.where(col("vec_id") % 13 === 2), "vec_id", "embedding", seq = 2L)
      }
    val attempts =
      try Snapshots.pinTrainingSet(spark, "pair_v1", Seq(table), Seq(dir))
      finally MaintHooks.reset()
    assert(fired, "the interleaved append must have run")
    assert(attempts == 2,
      s"attempt 1 must lose to the racing append, attempt 2 commits: $attempts")
    // one coherent state: the committed pin set is AFTER the racing
    // append on both surfaces — the pinned vector read carries seq 2
    val pinnedSeqs = graft.sources.CellManifest
      .readTable(spark, s"$dir/assigned", "pair_v1")
      .select(max(col("ingest_seq"))).collect()(0).getLong(0)
    assert(pinnedSeqs == 2L,
      s"the retry must pin the post-append vector state: max seq $pinnedSeqs")
    assert(IndexStore.pinsInverted(spark, table).keySet == Set("pair_v1"))
    // nothing dangles from the rolled-back attempt (one pin per name,
    // and the helper's unpin cleans both surfaces)
    Snapshots.unpinTrainingSet(spark, "pair_v1", Seq(table), Seq(dir))
    assert(IndexStore.pinsInverted(spark, table).isEmpty)
    assert(graft.sources.CellManifest.pins(spark, s"$dir/assigned").isEmpty)
  }

  test("attempt exhaustion throws loudly with every surface unpinned; a quiet window commits in one attempt") {
    val table = freshTextTable("graft_pair_exhaust")
    val dir = freshVectorDir("pair-exhaust-vec")
    var seq = 1L
    MaintHooks.hook = (point, _) =>
      if (point == "pin.staged") {
        seq += 1
        IvfModel.appendVectors(spark, dir,
          emb.where(col("vec_id") === seq), "vec_id", "embedding", seq = seq)
      }
    val ex =
      try intercept[IllegalStateException](Snapshots.pinTrainingSet(
        spark, "pair_v2", Seq(table), Seq(dir), maxAttempts = 2))
      finally MaintHooks.reset()
    assert(ex.getMessage.contains("lost 2 consecutive races"), ex.getMessage)
    // every attempt rolled back whole: NO surface carries the name
    assert(IndexStore.pinsInverted(spark, table).isEmpty,
      "no text pin may survive an exhausted pinTrainingSet")
    assert(graft.sources.CellManifest.pins(spark, s"$dir/assigned").isEmpty,
      "no vector pin may survive an exhausted pinTrainingSet")
    // with the writers quiet the same name pins first try
    assert(Snapshots.pinTrainingSet(spark, "pair_v2", Seq(table), Seq(dir)) == 1)
    // the training set's one-frame debt view: one row per surface, the
    // shared age column carrying each family's own writer-op unit
    val debt = Snapshots.trainingSetDebt(spark, Seq(table), Seq(dir))
      .orderBy("kind").collect()
    assert(debt.length == 2 &&
      debt.map(_.getString(1)).toSeq == Seq("text", "vector"))
    assert(debt.forall(r => r.getInt(2) == 1 && r.getString(3) == "pair_v2"),
      s"both surfaces carry the fresh pin: ${debt.toSeq}")
    assert(debt.forall(_.getLong(4) >= 0L),
      "a just-taken pin's age is zero or the claims the pin window itself made")
    Snapshots.unpinTrainingSet(spark, "pair_v2", Seq(table), Seq(dir))
    val after = Snapshots.trainingSetDebt(spark, Seq(table), Seq(dir)).collect()
    assert(after.forall(r => r.getInt(2) == 0 && r.getLong(4) == -1L),
      s"unpin clears the whole view: ${after.toSeq}")
  }

  test("an append still STAGING when the pin window opens is fenced out before anything is visible: the pin captures the pre-append state, the append replays cleanly") {
    val spark2 = spark
    import spark2.implicits._
    val table = freshTextTable("graft_pair_gap_staged")
    val preCount = spark.table(table).count()
    val batch = Seq((3L, Array("sig3-2"), Array("cc33", "aa77"), 2L))
      .toDF(Cols.Id, Cols.Signature, Cols.BucketIds, "ingest_seq")
    // the append CLAIMS first, then the pin window opens while the batch
    // sits staged — the append's pre-visibility check must refuse, so
    // the window never sees a byte of it (the claim-to-write gap, closed)
    var attempts = -1
    MaintHooks.hook = (point, _) =>
      if (point == "append.staged" && attempts < 0)
        attempts = Snapshots.pinTrainingSet(spark, "gap_v1", Seq(table))
    val ex = try intercept[graft.sources.FenceViolation](
        IndexStore.appendInverted(batch, table))
      finally MaintHooks.reset()
    assert(ex.getMessage.contains("writer fence violated"), ex.getMessage)
    assert(attempts == 1,
      s"the pin window saw zero claims after its own — one attempt: $attempts")
    assert(spark.table(table).count() == preCount,
      "a fenced-out staged append must leave the live table untouched")
    val pinned = IndexStore.pinInventory(spark, table, "gap_v1").get
    assert(spark.table(table).where(col(Cols.Id) === 3L).count() == 0)
    // the replay lands on the settled (pinned) state without disturbing it
    IndexStore.appendInverted(batch, table)
    assert(spark.table(table).where(col(Cols.Id) === 3L).count() == 2)
    assert(IndexStore.pinInventory(spark, table, "gap_v1").get == pinned,
      "the pin's inventory must not move when the replay lands")
    Snapshots.unpinTrainingSet(spark, "gap_v1", Seq(table))
  }

  test("an append whose batch became VISIBLE just before the pin's claim completes before the pin: the pin captures the whole batch, the raced append replays and collapses") {
    val spark2 = spark
    import spark2.implicits._
    val table = freshTextTable("graft_pair_gap_visible")
    val batch = Seq((3L, Array("sig3-2"), Array("cc33", "aa77"), 2L))
      .toDF(Cols.Id, Cols.Signature, Cols.BucketIds, "ingest_seq")
    // the pin window opens AFTER the append's files moved in but BEFORE
    // its post-visibility check: the pin inventories the complete batch,
    // the append detects the claim, keeps every pin-captured file, and
    // throws for a whole-batch replay — never a half-landed straddle
    var attempts = -1
    MaintHooks.hook = (point, _) =>
      if (point == "append.visible" && attempts < 0)
        attempts = Snapshots.pinTrainingSet(spark, "gap_v2", Seq(table))
    val ex = try intercept[graft.sources.FenceViolation](
        IndexStore.appendInverted(batch, table))
      finally MaintHooks.reset()
    assert(ex.getMessage.contains("pin-captured files were kept"), ex.getMessage)
    assert(attempts == 1, s"quiet window for the pin itself: $attempts")
    // the pin holds the COMPLETE batch (it linearizes after the append)
    // and no pin was poisoned — nothing is torn
    val pinnedFiles = IndexStore.pinInventory(spark, table, "gap_v2").get
    assert(pinnedFiles.exists(_._1 == "cc") && pinnedFiles.exists(_._1 == "aa"),
      s"the pin must capture both of the batch's partitions: $pinnedFiles")
    assert(spark.table(table).where(col(Cols.Id) === 3L).count() == 2,
      "the kept (pin-captured) files stay live")
    // the at-least-once replay lands a second copy; the next compaction
    // collapses the redelivery back to exactly one posting per bucket
    IndexStore.appendInverted(batch, table)
    assert(spark.table(table).where(col(Cols.Id) === 3L).count() == 4)
    IndexStore.compactInverted(spark, table)
    val after = spark.table(table).where(col(Cols.Id) === 3L)
      .select("bucket").as[String].collect().sorted.toSeq
    assert(after == Seq("aa77", "cc33"),
      s"the replayed copies must collapse at compaction: $after")
    Snapshots.unpinTrainingSet(spark, "gap_v2", Seq(table))
  }

  test("a batch materializing BETWEEN the pin's two inventory passes refuses the pin, not the data: re-pin captures the settled state") {
    val spark2 = spark
    import spark2.implicits._
    val table = freshTextTable("graft_pair_gap_listing")
    val batch = Seq((3L, Array("sig3-2"), Array("cc33"), 2L))
      .toDF(Cols.Id, Cols.Signature, Cols.BucketIds, "ingest_seq")
    // a full append lands between the pin-file commit and the pin's
    // post-commit re-inventory: the extra-files validation must roll the
    // pin back loudly (retryable), never freeze a capture that missed
    // part of a batch
    var fired = false
    MaintHooks.hook = (point, _) =>
      if (point == "pin.committed" && !fired) {
        fired = true
        IndexStore.appendInverted(batch, table)
      }
    val ex = try intercept[graft.sources.FenceViolation](
        IndexStore.pinInverted(spark, table, "gap_v3"))
      finally MaintHooks.reset()
    assert(ex.getMessage.contains("raced an append"), ex.getMessage)
    assert(fired && IndexStore.pinsInverted(spark, table).isEmpty,
      "the raced pin must roll back whole")
    assert(spark.table(table).where(col(Cols.Id) === 3L).count() == 1,
      "the append itself is untouched by the pin's refusal")
    // the retry captures the settled state, batch included
    IndexStore.pinInverted(spark, table, "gap_v3")
    assert(IndexStore.pinInventory(spark, table, "gap_v3").get
      .exists(_._1 == "cc"), "the re-pin must capture the landed batch")
    IndexStore.unpinInverted(spark, table, "gap_v3")
  }

  test("a VECTOR append still staging when the pin window opens is fenced out before its manifest put: the pin is atomic, the replay lands whole") {
    val dir = freshVectorDir("pair-gap-vec")
    val batch = emb.where(col("vec_id") % 13 === 2)
    // the append CLAIMS the model fence, stages its generation, and the
    // pin window opens while the stage sits unreferenced: the append's
    // model-fence check at its visibility point (right before the
    // manifest put) must refuse — the pinned manifest never sees a row
    // of the batch, because visibility IS the atomic put
    var attempts = -1
    MaintHooks.hook = (point, _) =>
      if (point == "vecappend.staged" && attempts < 0)
        attempts = Snapshots.pinTrainingSet(spark, "gap_v4", Nil, Seq(dir))
    val ex = try intercept[graft.sources.FenceViolation](
        IvfModel.appendVectors(spark, dir, batch,
          "vec_id", "embedding", seq = 2L))
      finally MaintHooks.reset()
    assert(ex.getMessage.contains("writer fence violated"), ex.getMessage)
    assert(attempts == 1, s"the pin window itself was quiet: $attempts")
    val pinnedMax = graft.sources.CellManifest
      .readTable(spark, s"$dir/assigned", "gap_v4")
      .agg(max(col("ingest_seq"))).collect()(0).getLong(0)
    assert(pinnedMax == 1L,
      s"the pinned manifest must hold the pre-append state: $pinnedMax")
    assert(graft.sources.CellManifest
        .readTable(spark, s"$dir/assigned")
        .agg(max(col("ingest_seq"))).collect()(0).getLong(0) == 1L,
      "the fenced-out batch is invisible to the LIVE read too (atomic put)")
    // the whole-batch replay lands after the window; the pin stays frozen
    IvfModel.appendVectors(spark, dir, batch, "vec_id", "embedding", seq = 2L)
    assert(graft.sources.CellManifest
        .readTable(spark, s"$dir/assigned")
        .agg(max(col("ingest_seq"))).collect()(0).getLong(0) == 2L)
    assert(graft.sources.CellManifest
        .readTable(spark, s"$dir/assigned", "gap_v4")
        .agg(max(col("ingest_seq"))).collect()(0).getLong(0) == 1L,
      "the pinned read must not move when the replay lands")
    Snapshots.unpinTrainingSet(spark, "gap_v4", Nil, Seq(dir))
  }

  test("non-race failures rethrow immediately and roll back the attempt's pins: an immutable-name collision is not a retry") {
    val table = freshTextTable("graft_pair_immutable")
    val dir = freshVectorDir("pair-immutable-vec")
    // the vector surface already carries the name (pins are immutable);
    // the text pin from the same attempt must roll back, not dangle
    IvfModel.pinSnapshot(spark, dir, "pair_v3")
    val ex = intercept[IllegalStateException](
      Snapshots.pinTrainingSet(spark, "pair_v3", Seq(table), Seq(dir)))
    assert(ex.getMessage.contains("already exists"), ex.getMessage)
    assert(IndexStore.pinsInverted(spark, table).isEmpty,
      "the attempt's text pin must roll back on the non-race failure")
    IvfModel.unpinSnapshot(spark, dir, "pair_v3")
  }
}
