package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Object-store-safe swap protocol for CELL-partitioned path tables (the
  * IVF/PQ vector stores: `assigned/` and `encoded/` under a model dir) —
  * the vector twin of [[IndexStore.SwapManifest]]'s catalog flips. The
  * text index swaps by re-pointing catalog partition locations; a vector
  * table is a bare parquet directory with no catalog, so the pointer
  * lives in the table itself as a tiny versioned manifest file:
  *
  * {{{
  *   tableDir/cell=N/                 generation 0 (the initial save)
  *   tableDir/_gen-G/cell=N/          generation G (append or rewrite)
  *   tableDir/_vmanifest/manifest-G   the live cell -> generations map
  * }}}
  *
  * The manifest maps each live cell to the LIST of generations holding
  * its rows: an APPEND stages its batch as a fresh generation and adds G
  * to each written cell's list; a REWRITE (upsert/delete compaction)
  * stages the survivors as a fresh generation and REPLACES the dirty
  * cells' lists with [G] (or removes the cell when every row dropped).
  * Data files NEVER move — the unit of commit is one small manifest-file
  * put, which is what an S3-like store can make atomic (versioned names
  * + highest-number-wins; a conditional put in production). Readers
  * resolve the newest manifest and scan exactly the listed directories,
  * partition-pruned per generation.
  *
  * Crash contract (the text index's mid-flip guarantee, ported): readers
  * always see a COMPLETE manifest generation — old until the manifest
  * file lands, new after, never a half-swapped table. A staged
  * generation whose manifest write never landed is invisible (and its
  * append is LOST — the same replay-the-whole-batch contract as
  * [[IndexStore.appendInverted]]'s non-atomic trio); [[gc]] at the head
  * of the next maintenance pass discards it. Directories a flip replaced
  * are RETAINED until that same next-pass gc, so a reader that resolved
  * the previous manifest finishes its scan on intact files.
  *
  * Single-writer per table, like every maintenance op in this module.
  */
object CellManifest {

  private def manifestDir(tableDir: String) =
    new org.apache.hadoop.fs.Path(s"$tableDir/_vmanifest")

  private def fsOf(spark: SparkSession, tableDir: String) =
    new org.apache.hadoop.fs.Path(tableDir)
      .getFileSystem(spark.sessionState.newHadoopConf())

  /** Whether `tableDir` is manifest-governed (init ran at save time). */
  def isManifest(spark: SparkSession, tableDir: String): Boolean =
    fsOf(spark, tableDir).exists(manifestDir(tableDir))

  /** Adopt an existing plainly-written cell table into manifest mode:
    * every `cell=N` directory becomes generation 0 — no data moves.
    * Called once by `save(dir, swap = manifest)`, and usable as the
    * MIGRATION path for a lived-in rename-mode table (run any pending
    * maintenance first so no `__compact_stage`/`__compact_aside`
    * leftovers exist; from the init on, appends and rewrites commit
    * through manifest flips — VectorStoreSpec pins answer equality
    * across the adoption).
    */
  def init(spark: SparkSession, tableDir: String): Unit = {
    val fs = fsOf(spark, tableDir)
    val cells = baseCells(fs, tableDir)
    fs.delete(manifestDir(tableDir), true)
    write(spark, tableDir, 0L, cells.map(_ -> Seq(0L)).toMap)
  }

  private def baseCells(fs: org.apache.hadoop.fs.FileSystem,
      tableDir: String): Seq[Int] =
    fs.listStatus(new org.apache.hadoop.fs.Path(tableDir))
      .map(_.getPath.getName)
      .filter(_.startsWith("cell="))
      .map(_.stripPrefix("cell=").toInt).toSeq

  /** The newest manifest: (its number, cell -> generation list). */
  def read(spark: SparkSession, tableDir: String): (Long, Map[Int, Seq[Long]]) = {
    val fs = fsOf(spark, tableDir)
    val md = manifestDir(tableDir)
    val files = fs.listStatus(md).map(_.getPath.getName)
      .filter(_.startsWith("manifest-"))
    require(files.nonEmpty, s"manifest table $tableDir has no manifest file")
    val g = files.map(_.stripPrefix("manifest-").toLong).max
    (g, readAt(spark, tableDir, g))
  }

  /** The cell -> generation map of ONE SPECIFIC manifest number — the
    * time-travel resolution a [[pin]] reader uses. Loud when the number
    * is gone (gc reclaimed it: only the newest two and pinned manifests
    * survive a maintenance pass).
    */
  def readAt(spark: SparkSession, tableDir: String,
      g: Long): Map[Int, Seq[Long]] = {
    val fs = fsOf(spark, tableDir)
    val md = manifestDir(tableDir)
    require(fs.exists(new org.apache.hadoop.fs.Path(md, s"manifest-$g")),
      s"manifest-$g of $tableDir no longer exists — unpinned manifests " +
        "are retained only one maintenance pass; pin a snapshot before " +
        "relying on its number")
    val in = fs.open(new org.apache.hadoop.fs.Path(md, s"manifest-$g"))
    val body = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
    finally in.close()
    val lines = body.linesIterator.filter(_.nonEmpty).toSeq
    // the terminator proves the put landed whole: a store that tears
    // multi-part writes (no object store does for a single put; a broken
    // copy-based rename could) must fail LOUDLY, never silently serve a
    // truncated cell map as "those cells were dropped"
    require(lines.lastOption.contains(EofLine),
      s"manifest-$g of $tableDir is TORN (missing the $EofLine terminator) " +
        "— the commit put did not land whole; restore from the previous " +
        "manifest (retained one pass) or re-run the crashed maintenance op")
    val cells = lines.filterNot(_.startsWith("#")).map { line =>
      val Array(c, gens) = line.split("=", 2)
      c.toInt -> (if (gens.isEmpty) Seq.empty[Long]
                  else gens.split(",").map(_.toLong).toSeq)
    }.toMap
    cells
  }

  /** Final line of every manifest — the whole-file integrity witness. */
  private val EofLine = "#eof"

  // ---------------------------------------------------------------- pins

  private val PinPrefix = "pin-"
  private val PinName = "[A-Za-z0-9][A-Za-z0-9._-]*".r

  private def pinPath(tableDir: String, name: String) =
    new org.apache.hadoop.fs.Path(manifestDir(tableDir), s"$PinPrefix$name")

  /** PIN the table's current state as a named SNAPSHOT: records the
    * newest manifest number in `_vmanifest/pin-<name>`, and from then on
    * [[gc]] retains that manifest AND every generation directory it
    * references — so [[readTable]]`(pin = name)` keeps answering with the
    * pinned truth while the live table appends, upserts, and compacts
    * freely past it (each rewrite lands in NEW generations; pinned data
    * files are never touched — the manifest protocol's data-never-moves
    * property is what makes snapshots free). The reproducible-corpus
    * primitive: a training run pins the snapshot it reads, re-runs
    * resolve the same bytes, and the pin is a named, auditable object.
    *
    * Pins are READER-initiated — no fence claim (a training run must not
    * fence out the maintenance writer). Create-exclusive per name: a
    * second pin of the same name fails loudly ([[unpin]] first — pins are
    * immutable). Two whole-table writer ops refuse while pins exist,
    * checked at their commit points: a model re-`save` (the overwrite
    * wipes every generation) and `retrain` (the swap replaces the table
    * wholesale). Takedowns are NOT frozen: delete markers apply to pinned
    * reads at read time (compliance outranks reproducibility — see
    * [[graft.operators.IvfModel.load]]), and marker files are retained by
    * `compactDeletes` while any pin exists so the exclusion survives the
    * physical scrub of the live generations.
    *
    * Returns the pinned manifest number. The post-write validation guards
    * the one real race: a pin landing while TWO maintenance passes
    * complete (flip + gc twice) could reference a reclaimed manifest —
    * then the pin self-deletes and throws instead of dangling.
    */
  def pin(spark: SparkSession, tableDir: String, name: String): Long = {
    require(PinName.pattern.matcher(name).matches(),
      s"pin name '$name' must match ${PinName.regex}")
    require(isManifest(spark, tableDir),
      s"$tableDir is not manifest-governed — snapshots need the manifest " +
        "swap strategy (rename-mode compaction rewrites files in place, " +
        "which cannot freeze); save with swap = manifest")
    val fs = fsOf(spark, tableDir)
    val (m, _) = read(spark, tableDir)
    val p = pinPath(tableDir, name)
    val out = try fs.create(p, false) catch {
      case e: java.io.IOException => throw new IllegalStateException(
        s"snapshot pin '$name' already exists on $tableDir — pins are " +
          "immutable; unpin first or choose a new name", e)
    }
    try out.write(s"$m\n$EofLine".getBytes("UTF-8")) finally out.close()
    // validate against the pin-vs-gc race: the manifest we pinned (and
    // every generation it references) must still exist now that the pin
    // is visible to gc — if a concurrent maintenance pass reclaimed it
    // between our read and the pin put, fail loudly and leave nothing
    try {
      val cells = readAt(spark, tableDir, m)
      val missing = cells.values.flatten.toSet.filter(_ != 0L).filterNot(g =>
        fs.exists(new org.apache.hadoop.fs.Path(s"$tableDir/_gen-$g")))
      require(missing.isEmpty,
        s"pinned manifest-$m references reclaimed generations $missing")
      val missingBase = cells.collect {
        case (c, gs) if gs.contains(0L) &&
          !fs.exists(new org.apache.hadoop.fs.Path(s"$tableDir/cell=$c")) => c
      }
      require(missingBase.isEmpty,
        s"pinned manifest-$m references reclaimed base cells $missingBase")
      m
    } catch {
      case e: Throwable =>
        fs.delete(p, false)
        throw new FenceViolation(
          s"snapshot pin '$name' on $tableDir raced a maintenance pass " +
            s"that reclaimed manifest-$m — the pin was rolled back; " +
            "re-pin (the retry resolves the newer manifest)", e)
    }
  }

  /** Drop a named snapshot: the pinned manifest and any generations only
    * it referenced become reclaimable at the next maintenance pass (gc
    * runs at pass heads — nothing deletes at unpin time). Loud on an
    * unknown name, so a typo cannot silently leave the real pin holding
    * storage forever.
    */
  def unpin(spark: SparkSession, tableDir: String, name: String): Unit = {
    val fs = fsOf(spark, tableDir)
    val p = pinPath(tableDir, name)
    require(fs.exists(p), s"no snapshot pin '$name' on $tableDir " +
      s"(pins: ${pins(spark, tableDir).keys.toSeq.sorted.mkString(", ")})")
    fs.delete(p, false); ()
  }

  /** Every named snapshot on the table: name -> pinned manifest number. */
  def pins(spark: SparkSession, tableDir: String): Map[String, Long] = {
    val fs = fsOf(spark, tableDir)
    val md = manifestDir(tableDir)
    if (!fs.exists(md)) return Map.empty
    fs.listStatus(md).map(_.getPath.getName)
      .filter(_.startsWith(PinPrefix)).map { f =>
        val name = f.stripPrefix(PinPrefix)
        val in = fs.open(new org.apache.hadoop.fs.Path(md, f))
        val body = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
        finally in.close()
        val lines = body.linesIterator.filter(_.nonEmpty).toSeq
        // same torn-put witness as the manifests: a pin that did not land
        // whole must not silently pin nothing
        require(lines.lastOption.contains(EofLine),
          s"snapshot pin '$name' of $tableDir is TORN — the put did not " +
            "land whole; delete and re-pin")
        name -> lines.head.toLong
      }.toMap
  }

  /** Loud guard for whole-table writer ops (re-save, retrain swap): both
    * replace every generation, which would tear the bytes out from under
    * the named snapshots. Checked at the op's head AND its commit point.
    */
  def requireNoPins(spark: SparkSession, tableDir: String, op: String): Unit = {
    val ps = pins(spark, tableDir)
    if (ps.nonEmpty) throw new IllegalStateException(
      s"$op on $tableDir refused: snapshot pins " +
        s"${ps.keys.toSeq.sorted.mkString("[", ", ", "]")} reference the " +
        "current generations, which this op would replace wholesale — " +
        "unpin them (or copy the pinned snapshot out) first; nothing " +
        "was changed")
  }

  /** One line per cell, `cell=g1,g2,...`; the put is staged through a
    * hidden sibling and renamed in — on a real object store this is the
    * single conditional put the protocol needs atomic.
    */
  private def write(spark: SparkSession, tableDir: String, gen: Long,
      cells: Map[Int, Seq[Long]]): Unit = {
    val fs = fsOf(spark, tableDir)
    val md = manifestDir(tableDir)
    fs.mkdirs(md)
    val tmp = new org.apache.hadoop.fs.Path(md, s".tmp-manifest-$gen")
    val out = fs.create(tmp, true)
    try out.write((cells.toSeq.sortBy(_._1)
      .map { case (c, gs) => s"$c=${gs.mkString(",")}" } :+ EofLine)
      .mkString("\n").getBytes("UTF-8"))
    finally out.close()
    fs.rename(tmp, new org.apache.hadoop.fs.Path(md, s"manifest-$gen")); ()
  }

  /** A fresh generation number (max over staged dirs AND manifest
    * numbers, so a crashed unreferenced stage is never reused before gc
    * reclaims it) and its staging path. The caller writes its batch
    * `partitionBy("cell")` at the path, then commits.
    *
    * The call also CLAIMS the table's writer fence and binds the claimed
    * epoch to the generation (a `.stage-G-E` marker beside the
    * manifests): the matching commit re-validates that epoch, so a
    * second writer claiming the table between stage and commit makes
    * this generation's manifest put FAIL LOUDLY — the stage is abandoned
    * unreferenced (gc reclaims it) and readers keep the newer writer's
    * truth.
    */
  def nextGen(spark: SparkSession, tableDir: String): (Long, String) = {
    val fs = fsOf(spark, tableDir)
    val (m, _) = read(spark, tableDir)
    // shared generation discipline: above every staged dir AND above the
    // manifest numbers (the pointer layer's floor), never reused
    val g = Generations.next(fs, new org.apache.hadoop.fs.Path(tableDir), m)
    val epoch = Fence.begin(spark, tableDir)
    fs.create(new org.apache.hadoop.fs.Path(manifestDir(tableDir),
      s".stage-$g-$epoch"), true).close()
    (g, s"$tableDir/_gen-$g")
  }

  /** The fence epoch [[nextGen]] bound to generation `gen`, if any. */
  private def stageEpochOf(fs: org.apache.hadoop.fs.FileSystem,
      tableDir: String, gen: Long): Option[Long] = {
    val md = manifestDir(tableDir)
    if (!fs.exists(md)) None
    else fs.listStatus(md).map(_.getPath.getName)
      .filter(_.startsWith(s".stage-$gen-"))
      .map(_.stripPrefix(s".stage-$gen-").toLong)
      .sorted.lastOption
  }

  private def checkStageFence(spark: SparkSession, tableDir: String,
      gen: Long): Unit = {
    val fs = fsOf(spark, tableDir)
    stageEpochOf(fs, tableDir, gen).foreach(e => Fence.check(spark, tableDir, e))
  }

  private def dropStageMarker(spark: SparkSession, tableDir: String,
      gen: Long): Unit = {
    val fs = fsOf(spark, tableDir)
    fs.listStatus(manifestDir(tableDir)).map(_.getPath)
      .filter(_.getName.startsWith(s".stage-$gen-"))
      .foreach { p => fs.delete(p, false); () }
  }

  /** Commit an APPEND staged at generation `gen`: every cell the stage
    * wrote gains `gen` in its list (a brand-new cell enters the map).
    */
  def commitAppend(spark: SparkSession, tableDir: String, gen: Long): Unit = {
    checkStageFence(spark, tableDir, gen) // COMMIT POINT: fence first
    val fs = fsOf(spark, tableDir)
    val written = baseCells(fs, s"$tableDir/_gen-$gen")
    val (m, cells) = read(spark, tableDir)
    val updated = written.foldLeft(cells) { (acc, c) =>
      acc.updated(c, acc.getOrElse(c, Seq.empty) :+ gen)
    }
    write(spark, tableDir, math.max(m, gen) + 1, updated)
    dropStageMarker(spark, tableDir, gen)
  }

  /** Commit a REWRITE of the `dirty` cells staged at generation `gen`:
    * each dirty cell's list REPLACES with [gen] — or the cell leaves the
    * map when the stage holds no directory for it (every row dropped).
    * Clean cells keep their lists untouched (their files were never
    * read, let alone rewritten).
    */
  def commitRewrite(spark: SparkSession, tableDir: String, gen: Long,
      dirty: Set[Int]): Unit = {
    checkStageFence(spark, tableDir, gen) // COMMIT POINT: fence first
    val fs = fsOf(spark, tableDir)
    val staged = baseCells(fs, s"$tableDir/_gen-$gen").toSet
    val (m, cells) = read(spark, tableDir)
    val updated = dirty.foldLeft(cells) { (acc, c) =>
      if (staged.contains(c)) acc.updated(c, Seq(gen)) else acc - c
    }
    write(spark, tableDir, math.max(m, gen) + 1, updated)
    dropStageMarker(spark, tableDir, gen)
  }

  /** Reclaim everything the newest manifest no longer references: stale
    * `_gen-*` directories (replaced generations AND crashed unflipped
    * stages), base `cell=N` directories whose list dropped generation 0,
    * and manifest files older than the previous one (kept as the
    * in-flight reader's resolution target). Runs at the HEAD of each
    * maintenance pass — never in the middle of one — so anything it
    * deletes has been unreferenced since at least the previous flip.
    */
  def gc(spark: SparkSession, tableDir: String): Unit = {
    val fs = fsOf(spark, tableDir)
    val (_, cells) = read(spark, tableDir)
    // PINNED manifests extend liveness: a named snapshot's manifest and
    // every generation (and gen-0 base cell) it references survive gc
    // until the pin drops — that is the whole snapshot contract
    val pinnedMaps = pins(spark, tableDir).values.toSet[Long]
      .map(m => readAt(spark, tableDir, m))
    val liveGens = cells.values.flatten.toSet ++
      pinnedMaps.flatMap(_.values.flatten)
    // shared generation discipline: replaced generations and crashed
    // unreferenced stages reclaim together at the maintenance head
    Generations.dropUnreferenced(fs, new org.apache.hadoop.fs.Path(tableDir),
      liveGens.contains)
    def gen0Live(c: Int): Boolean =
      cells.get(c).exists(_.contains(0L)) ||
        pinnedMaps.exists(_.get(c).exists(_.contains(0L)))
    fs.listStatus(new org.apache.hadoop.fs.Path(tableDir)).foreach { st =>
      val name = st.getPath.getName
      if (name.startsWith("cell=") &&
          !gen0Live(name.stripPrefix("cell=").toInt)) {
        fs.delete(st.getPath, true); ()
      }
    }
    // retain the TWO HIGHEST manifests that actually exist (commit
    // numbering advances by 2 — gen then manifest — so "m - 1" names a
    // file that never existed and comparing against it would delete the
    // in-flight reader's resolution target, the immediately previous one)
    // plus every PINNED number, each a named snapshot's resolution target
    val md = manifestDir(tableDir)
    val nums = fs.listStatus(md).map(_.getPath.getName)
      .filter(_.startsWith("manifest-"))
      .map(_.stripPrefix("manifest-").toLong).sorted
    val keep = nums.takeRight(2).toSet ++ pins(spark, tableDir).values
    nums.filterNot(keep).foreach { n =>
      fs.delete(new org.apache.hadoop.fs.Path(md, s"manifest-$n"), false); ()
    }
    // a surviving .stage-G-E marker belongs to a fenced-out or crashed
    // stage (commit deletes its own marker) — drop it with the stage
    fs.listStatus(md).map(_.getPath).filter(_.getName.startsWith(".stage-"))
      .foreach { p =>
        val g = p.getName.stripPrefix(".stage-").takeWhile(_ != '-')
        if (!fs.exists(new org.apache.hadoop.fs.Path(s"$tableDir/_gen-$g"))) {
          fs.delete(p, false); ()
        }
      }
  }

  /** The live rows of a manifest table: one partition-pruned read per
    * referenced generation (basePath keeps the `cell` partition column),
    * unioned. Enumerating explicit `cell=` paths — rather than scanning
    * each generation directory — is what skips the retained
    * previous-generation copies. Non-manifest tables read plainly, so
    * every consumer can route through here unconditionally.
    */
  def readTable(spark: SparkSession, tableDir: String): DataFrame = {
    if (!isManifest(spark, tableDir))
      return spark.read.parquet(tableDir)
    scanCells(spark, tableDir, read(spark, tableDir)._2)
  }

  /** TIME-TRAVEL read of a named snapshot ([[pin]]): resolves the pinned
    * manifest number and scans exactly the generation directories it
    * listed — the same bytes every time, however far the live table has
    * moved. Loud on an unknown pin (a dropped pin's generations may
    * already be reclaimed — serving a partial table silently is the one
    * forbidden outcome).
    */
  def readTable(spark: SparkSession, tableDir: String, pin: String): DataFrame = {
    require(isManifest(spark, tableDir),
      s"$tableDir is not manifest-governed — snapshots need the manifest " +
        "swap strategy (save with swap = manifest)")
    val m = pins(spark, tableDir).getOrElse(pin,
      throw new IllegalArgumentException(
        s"no snapshot pin '$pin' on $tableDir (pins: " +
          s"${pins(spark, tableDir).keys.toSeq.sorted.mkString(", ")})"))
    scanCells(spark, tableDir, readAt(spark, tableDir, m))
  }

  private def scanCells(spark: SparkSession, tableDir: String,
      cells: Map[Int, Seq[Long]]): DataFrame = {
    require(cells.nonEmpty,
      s"manifest table $tableDir is empty — every cell was dropped; " +
        "re-save the model instead of querying a vacated table")
    val byGen = cells.toSeq
      .flatMap { case (c, gs) => gs.map(g => (g, c)) }
      .groupBy(_._1).toSeq.sortBy(_._1)
    byGen.map { case (g, cs) =>
      val base = if (g == 0L) tableDir else s"$tableDir/_gen-$g"
      spark.read.option("basePath", base)
        .parquet(cs.map { case (_, c) => s"$base/cell=$c" }: _*)
    }.reduce(_.unionByName(_))
  }
}
