package graft.sources

import org.apache.spark.sql.SparkSession

/** Writer-FENCING epochs for maintained tables — the guard that turns the
  * module-wide "single-writer per table" assumption (every maintenance
  * protocol here: dirty-log appends, rename-aside swaps, flagged retrain
  * stages, manifest commits) from an invisible convention into a checked
  * contract. Two pipelines accidentally pointed at one table, or a zombie
  * driver retrying an orchestration step while its replacement already
  * runs, would otherwise interleave generation numbers or double-append
  * side logs SILENTLY; with the fence the late writer's commit FAILS
  * LOUDLY and changes nothing.
  *
  * Protocol (the classic fencing-token shape, e.g. HDFS lease recovery /
  * ZooKeeper epoch fencing, re-expressed on files):
  *
  *  - the table's current epoch is the highest `epoch-N` file under its
  *    `_fence/` side dir (0 when none — every pre-fence table reads as
  *    epoch 0 and upgrades on first claim);
  *  - every maintenance op CLAIMS the table at its head: [[begin]] writes
  *    `epoch-(cur+1)` (create-exclusive — a lost race advances and
  *    retries) and returns the new epoch as the op's token;
  *  - multi-step ops re-validate at their COMMIT point: [[check]] throws
  *    unless the table is still at the op's token. A second writer that
  *    claimed in between moved the epoch, so the first writer's staged
  *    work is abandoned un-committed (a crashed-stage shape every
  *    protocol here already recovers from) and the table keeps serving
  *    the newer writer's truth.
  *
  * Granularity: one claim per op per directory. Single-shot appends only
  * claim (bumping invalidates any in-flight older op's commit); staged
  * ops (compaction swap, relayout flag, retrain flag, manifest put) claim
  * AND check. The fence detects writer interleave at commit boundaries —
  * it is not a lock: two writers can still both pay for staging work, but
  * only the newest can commit, and the loser's failure names the culprit.
  *
  * Cost: two or three filesystem metadata calls per MAINTENANCE op (zero
  * on the query path). On a real object store the create-exclusive put is
  * the same conditional-put primitive the manifest commit already
  * assumes; [[current]]/[[check]] additionally require read-after-write
  * CONSISTENT LISTING (a listing that hides the newest epoch would let a
  * fenced-out writer pass its commit check) — S3 has been strongly
  * consistent since 2020, and stores without it need the epoch resolved
  * by conditional reads instead of listings. Any IOException on the
  * claim put reads as a lost race (the claimer advances and retries) —
  * a transient store failure and a real competitor are indistinguishable
  * and both are safe, since the claimer only ever proceeds with a token
  * it holds; FenceSpec pins this, the shared-token impossibility, and
  * the no-lease property (a crashed claimer's epoch file wedges nothing
  * and needs no cleanup or timeout).
  */
object Fence {

  private def fenceDir(dir: String) =
    new org.apache.hadoop.fs.Path(s"$dir/_fence")

  private def fsOf(spark: SparkSession, dir: String) =
    new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sessionState.newHadoopConf())

  /** The table's current writer epoch — 0 for a table never claimed. */
  def current(spark: SparkSession, dir: String): Long = {
    val fs = fsOf(spark, dir)
    val fd = fenceDir(dir)
    if (!fs.exists(fd)) 0L
    else fs.listStatus(fd).map(_.getPath.getName)
      .filter(_.startsWith("epoch-"))
      .map(_.stripPrefix("epoch-").toLong)
      .foldLeft(0L)(math.max)
  }

  /** Claim the table: advance its epoch and return the new value as this
    * op's fencing token. Create-exclusive per epoch file, so two racing
    * claims can never share a token — the loser advances past the
    * winner. Older epoch files beyond the newest two are pruned (the
    * current claim and the one it fenced out; history has no reader).
    * `atLeast` re-seeds monotonicity when an overwrite/relayout replaced
    * the directory holding the fence (the caller passes the pre-wipe
    * epoch + 1, so stale tokens can never collide with fresh ones).
    */
  def begin(spark: SparkSession, dir: String, atLeast: Long = 1L): Long = {
    val fs = fsOf(spark, dir)
    val fd = fenceDir(dir)
    fs.mkdirs(fd)
    var e = math.max(current(spark, dir) + 1, atLeast)
    var claimed = false
    while (!claimed) {
      try {
        fs.create(new org.apache.hadoop.fs.Path(fd, s"epoch-$e"), false).close()
        claimed = true
      } catch {
        case _: java.io.IOException => e += 1 // lost the race; take the next
      }
    }
    val nums = fs.listStatus(fd).map(_.getPath.getName)
      .filter(_.startsWith("epoch-"))
      .map(_.stripPrefix("epoch-").toLong).sorted
    nums.dropRight(2).foreach { n =>
      fs.delete(new org.apache.hadoop.fs.Path(fd, s"epoch-$n"), false); ()
    }
    e
  }

  /** Validate an op's token at its commit point: throws when another
    * writer claimed the table after this op began. The caller must not
    * have mutated live state yet — everything staged so far is abandoned
    * as an uncommitted fragment the next maintenance head reclaims.
    */
  def check(spark: SparkSession, dir: String, token: Long): Unit = {
    val cur = current(spark, dir)
    if (cur != token) throw new IllegalStateException(
      s"writer fence violated for $dir: this op holds epoch $token but the " +
        s"table is at epoch $cur — another writer (or a zombie retry) " +
        "claimed the table after this op began; the commit was refused " +
        "and the live table is unchanged (single-writer contract)")
  }
}

/** Deterministic fault-injection seam for the maintenance protocols: a
  * named no-op call at each staged-but-uncommitted point (after an op's
  * stage write, before its commit check). Specs install a hook to
  * interleave a second writer or a crash EXACTLY inside the window the
  * crash contracts describe — the only way to test a commit-point fence
  * deterministically without pausing a live op. Production cost: one
  * static function call per maintenance op.
  */
private[graft] object MaintHooks {
  /** (point, dir) — points: `compact.staged`, `relayout.staged`,
    * `retrain.staged`, `cells.staged`.
    */
  @volatile var hook: (String, String) => Unit = (_, _) => ()

  def at(point: String, dir: String): Unit = hook(point, dir)

  def reset(): Unit = hook = (_, _) => ()
}
