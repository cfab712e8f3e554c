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
