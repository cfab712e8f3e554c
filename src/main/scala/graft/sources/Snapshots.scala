package graft.sources

import org.apache.spark.sql.SparkSession

/** CROSS-INDEX consistent snapshots — the training-set primitive the
  * per-table pins compose into. A training run that reads a text index
  * AND one or more vector indexes pins each table separately; two pins
  * taken while an ingest pipeline is mid-flight can straddle one table's
  * commit (text pinned before a document's re-ingest, vectors pinned
  * after its embedding landed), and the run then trains on a corpus
  * state no single moment ever held. [[pinTrainingSet]] makes the pin
  * SET mutually consistent by construction under the existing writer
  * fence:
  *
  *  1. CLAIM the fence of every surface first ([[Fence.begin]] on the
  *     text table's directory / the vector model directory — the same
  *     epochs every maintenance writer claims). The claims fence any
  *     in-flight STAGED op out of its commit, exactly as a competing
  *     writer would.
  *  2. PIN every surface (the per-table reader-initiated pins, verbatim:
  *     zero data copies, takedowns keep piercing).
  *  3. CHECK every claim token at the commit point. A writer that began
  *     on ANY surface between step 1 and here moved that surface's epoch
  *     past our token, so the check throws — the helper then UNPINS
  *     everything from this attempt and retries against the newer state
  *     (bounded by `maxAttempts`; the per-table pin-vs-gc rollbacks
  *     retry the same way). Only a pin set whose window saw zero writer
  *     claims anywhere ever commits.
  *
  * There is nothing to release afterwards: fence epochs are not leases
  * (a claim is a number, not a lock), so the "quiesce" costs two
  * metadata puts per surface and holds nothing open — maintenance
  * resumes with its next head claim as if a tiny writer had run.
  *
  * Appends that claimed BEFORE step 1 but materialize DURING the window
  * are covered too (round-19): text appends re-validate their claim at
  * their visibility point ([[IndexStore]]'s staged append — they are
  * fenced out before anything lands, or the pin's post-commit
  * validations refuse the capture), and vector appends re-validate the
  * model fence before their atomic manifest put — so an in-flight
  * append is either fenced out or completes before the pin, never a
  * straddle.
  */
object Snapshots {

  /** One pinned surface: `kind` is `text` (an inverted posting TABLE
    * name) or `vector` (an [[graft.operators.IvfModel]] / PQ model
    * DIRECTORY).
    */
  private case class Surface(kind: String, loc: String) {
    def fenceDir(spark: SparkSession): String = kind match {
      case "text" => IndexStore.fenceDirOf(spark, loc)
      case _      => loc
    }
    def pin(spark: SparkSession, name: String): Unit = kind match {
      // the UNFENCED text pin: pinTrainingSet's own claim-all/check-all
      // is the fence window here — the public pinInverted's nested claim
      // would move the epoch past the outer token and fail the outer
      // commit unconditionally
      case "text" => IndexStore.pinInvertedUnfenced(spark, loc, name)
      case _      => graft.operators.IvfModel.pinSnapshot(spark, loc, name); ()
    }
    def unpin(spark: SparkSession, name: String): Unit = kind match {
      case "text" => IndexStore.unpinInverted(spark, loc, name)
      case _      => graft.operators.IvfModel.unpinSnapshot(spark, loc, name)
    }
  }

  /** Pin `name` on every listed surface as ONE consistent training-set
    * snapshot (claim-all → pin-all → check-all; see the object doc).
    * Returns the number of attempts taken — 1 when no writer raced, >1
    * when a racing claim forced a clean retry. Throws after
    * `maxAttempts` raced attempts (every attempt's pins rolled back), or
    * immediately on non-race failures (e.g. the name already pinned —
    * pins are immutable, same as the per-table contract).
    */
  def pinTrainingSet(spark: SparkSession, name: String,
      textTables: Seq[String] = Nil, vectorDirs: Seq[String] = Nil,
      maxAttempts: Int = 8): Int = {
    require(textTables.nonEmpty || vectorDirs.nonEmpty,
      "pinTrainingSet needs at least one surface to pin")
    require(maxAttempts >= 1, s"maxAttempts must be >= 1: $maxAttempts")
    val surfaces = textTables.map(Surface("text", _)) ++
      vectorDirs.map(Surface("vector", _))
    var attempt = 0
    while (true) {
      attempt += 1
      // head claims FIRST, in declaration order — the pin window opens
      // with every surface's epoch at our token
      val tokens = surfaces.map(s => s -> Fence.begin(spark, s.fenceDir(spark)))
      val pinned = scala.collection.mutable.ListBuffer.empty[Surface]
      try {
        surfaces.foreach { s => s.pin(spark, name); pinned += s }
        // commit point: zero writer claims anywhere during the window,
        // or the whole set rolls back
        tokens.foreach { case (s, tok) =>
          Fence.check(spark, s.fenceDir(spark), tok)
        }
        return attempt
      } catch {
        case e: FenceViolation =>
          // roll back THIS attempt's pins completely — a partial pin set
          // must never be visible as a training snapshot
          pinned.foreach(_.unpin(spark, name))
          if (attempt >= maxAttempts) throw new IllegalStateException(
            s"pinTrainingSet('$name') lost $attempt consecutive races to " +
              "concurrent writers across " +
              s"${surfaces.map(_.loc).mkString(", ")} — every attempt was " +
              "rolled back whole (no surface is pinned); quiesce the " +
              "ingest pipelines or raise maxAttempts", e)
        case e: Throwable =>
          pinned.foreach(_.unpin(spark, name))
          throw e
      }
    }
    attempt // unreachable
  }

  /** Drop the named training-set snapshot from every surface. EVERY
    * surface is attempted — a failure on one (a typo'd table, a name
    * already dropped by hand) must not leave the later surfaces pinned
    * and silently holding retention — then a single loud error names
    * every surface that refused (same per-table loudness, aggregated).
    */
  def unpinTrainingSet(spark: SparkSession, name: String,
      textTables: Seq[String] = Nil, vectorDirs: Seq[String] = Nil): Unit = {
    val failures = (textTables.map(Surface("text", _)) ++
        vectorDirs.map(Surface("vector", _)))
      .flatMap { s =>
        try { s.unpin(spark, name); None }
        catch { case e: Exception => Some(s.loc -> e) }
      }
    failures.headOption.foreach { case (_, first) =>
      throw new IllegalStateException(
        s"unpinTrainingSet('$name') failed on " +
          s"${failures.map(_._1).mkString(", ")} (every other surface WAS " +
          "unpinned — nothing else is still holding retention); first " +
          s"cause: ${first.getMessage}", first)
    }
  }

  /** The pin-retention debt of a TRAINING SET's surfaces in one frame —
    * the observability twin of [[pinTrainingSet]]: one row per surface
    * (`surface` = the table name / model dir, `kind` = text | vector),
    * with that family's [[IndexStore.snapshotDebt]] /
    * [[graft.sources.VectorAudit.snapshotDebt]] columns aligned to one
    * schema (`oldest_pin_age` carries claims on text surfaces and
    * manifest commits on vector ones — both "writer ops since the pin",
    * never wall clock; `markers_retained` is −1 on text surfaces, where
    * tombstones are permanent by contract and never pin-retained). The
    * dashboard query for "which surface is the forgotten pin on".
    */
  def trainingSetDebt(spark: SparkSession,
      textTables: Seq[String] = Nil,
      vectorDirs: Seq[String] = Nil): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    require(textTables.nonEmpty || vectorDirs.nonEmpty,
      "trainingSetDebt needs at least one surface")
    val text = textTables.map { t =>
      IndexStore.snapshotDebt(spark, t)
        .select(lit(t).as("surface"), lit("text").as("kind"),
          col("pins"), col("oldest_pin"),
          col("oldest_pin_age_claims").as("oldest_pin_age"),
          col("retained_locations"), lit(-1L).as("markers_retained"))
    }
    val vec = vectorDirs.map { d =>
      VectorAudit.snapshotDebt(spark, d)
        .select(lit(d).as("surface"), lit("vector").as("kind"),
          col("pins"), col("oldest_pin"),
          col("oldest_pin_age_commits").as("oldest_pin_age"),
          col("retained_locations"), col("markers_retained"))
    }
    (text ++ vec).reduce(_.unionByName(_))
  }

}
