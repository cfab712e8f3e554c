package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Takedown-audit lookup for persisted vector indexes — the IVF/PQ twin
  * of [[IndexStore.postingsOf]] ("which cells does vector X still have
  * rows in, at which seqs, and is there a marker?"). The cell tables are
  * partitioned by CELL, so an id lookup against them would scan
  * everything; this module mirrors each append's narrow (id, seq, cell)
  * rows into an id-HASH-partitioned `_idmap/` beside the model, so the
  * audit reads ≤ |ids| touched `idh=` partitions — the text index's
  * maintenance-id-map bound. Marker rows come from the model's own
  * `deleted/` side file (takedown-sized by nature, read whole); they
  * vanish when `compactDeletes` clears the markers — the documented
  * divergence from the text tombstones, whose redelivery-guard rows
  * persist.
  *
  * The id-map compacts in lockstep with the cell tables
  * ([[compactUpserts]]/[[compactDeletes]], called from the model-level
  * maintenance ops), so it always reflects PHYSICAL state: superseded
  * rows appear until upsert compaction drops them — that is the audit's
  * point; serving semantics (winner/marker resolution) live in the query
  * paths.
  *
  * `dir` is the IVF model directory ([[graft.operators.IvfModel.save]]'s
  * target; a PQ index audits through its `ivf/` half — the encoded
  * table's (id, cell, seq) rows mirror the assigned table's by
  * construction, pinned in VectorStoreSpec).
  */
object VectorAudit {

  /** id-hash partition count — [[IndexStore]]'s default ladder-validated
    * knob (tools/idmap_knob_ladder.scala): decision/audit reads scale
    * inversely until the row-group floor.
    */
  val IdMapBuckets = 64

  private def idMapDir(dir: String) = s"$dir/_idmap"

  private def fsOf(spark: SparkSession, dir: String) =
    new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sessionState.newHadoopConf())

  private def hasIdMap(spark: SparkSession, dir: String): Boolean =
    fsOf(spark, dir).exists(new org.apache.hadoop.fs.Path(idMapDir(dir)))

  private def narrow(df: DataFrame): DataFrame = {
    val seq = if (df.columns.contains("ingest_seq")) col("ingest_seq")
              else lit(null).cast("long").as("ingest_seq")
    df.select(col("id").cast("long").as("id"), seq,
      col("cell").cast("int").as("cell"))
  }

  private def withIdh(df: DataFrame): DataFrame =
    df.withColumn("idh", pmod(hash(col("id")), lit(IdMapBuckets)))

  /** (Re-)seed the audit id-map from the saved assigned table — paid at
    * save time, when an O(table) write just happened anyway (the
    * [[IndexStore.seedIdMap]] convention).
    */
  def seed(spark: SparkSession, dir: String): Unit = {
    fsOf(spark, dir).delete(new org.apache.hadoop.fs.Path(idMapDir(dir)), true)
    withIdh(narrow(CellManifest.readTable(spark, s"$dir/assigned")))
      .repartition(col("idh"))
      .write.mode(SaveMode.Overwrite).partitionBy("idh")
      .parquet(idMapDir(dir))
  }

  /** Mirror an append batch's narrow rows — one delta-sized write per
    * [[graft.operators.IvfModel.appendVectors]].
    */
  def logAppend(spark: SparkSession, dir: String, batch: DataFrame): Unit = {
    if (!hasIdMap(spark, dir)) return // legacy index: audit falls back
    withIdh(narrow(batch))
      .repartition(col("idh"))
      .write.mode(SaveMode.Append).partitionBy("idh")
      .parquet(idMapDir(dir))
  }

  /** Drop superseded mirrors in lockstep with the cell tables' upsert
    * compaction: only the `idh=` partitions holding ≥ 1 loser rewrite
    * (pruned by the losers' own hash values — bounded by
    * [[IdMapBuckets]]); the decision reads the narrow id-map only, never
    * a cell table.
    */
  def compactUpserts(spark: SparkSession, dir: String): Unit = {
    if (!hasIdMap(spark, dir)) return
    val raw = spark.read.parquet(idMapDir(dir))
    // touched = partitions holding a superseded row OR a same-seq
    // duplicate — the SAME criteria (and the same shared one-exchange
    // decision pass) as the cell-table rewrite
    // ([[graft.operators.IvfModel.compactUpsertsCells]]), so a replayed
    // batch's duplicate copies collapse on both sides in the same pass
    // and verifyVectorState never sees a healthy index diverge. The
    // duplicate test here keys on (seq, idh) — same-seq copies of one id
    // share their idh, so every true replay duplicate is caught; rows at
    // one seq in DIFFERENT cells (impossible under the content-identical
    // replay contract) would flag a rewrite that preserves both rows,
    // exactly like the cell side's dropDuplicates — never a drift
    val touched = graft.operators.IvfModel.dirtySlots(
      raw.select(col("id"), col("ingest_seq"), col("idh").as("slot"))).toSeq
    if (touched.isEmpty) return
    val winners = raw.groupBy(col("id")).agg(max(col("ingest_seq")).as("__w"))
    rewrite(spark, dir, touched,
      raw.where(col("idh").isin(touched: _*))
        .join(winners, Seq("id"))
        .where(col("ingest_seq") === col("__w")).drop("__w")
        .dropDuplicates("id", "ingest_seq", "cell"))
  }

  /** Drop deleted mirrors in lockstep with the takedown scrub: rows each
    * marker OUTRANKS leave (a post-delete re-ingest's mirror survives,
    * like its cell row); partitions pruned by the marker ids' hashes —
    * takedown-sized.
    */
  def compactDeletes(spark: SparkSession, dir: String,
      markers: DataFrame): Unit = {
    if (!hasIdMap(spark, dir)) return
    val touched = withIdh(markers.select(col("id")))
      .select(col("idh")).distinct().collect().map(_.getInt(0)).toSeq
    if (touched.isEmpty) return
    val raw = spark.read.parquet(idMapDir(dir))
    rewrite(spark, dir, touched,
      raw.where(col("idh").isin(touched: _*))
        .join(broadcast(markers), Seq("id"), "left_outer")
        .where(col("__del_seq").isNull || col("ingest_seq") > col("__del_seq"))
        .drop("__del_seq"))
  }

  /** Rewrite the touched `idh=` partitions to `kept` — staged then
    * swapped per directory (the id-map is maintenance-internal with no
    * concurrent readers, the [[IndexStore]] id-map convention).
    */
  private def rewrite(spark: SparkSession, dir: String, touched: Seq[Int],
      kept: DataFrame): Unit = {
    val fs = fsOf(spark, dir)
    val stage = new org.apache.hadoop.fs.Path(s"$dir/__idmap_stage")
    fs.delete(stage, true)
    withIdh(kept.drop("idh"))
      .repartition(col("idh"))
      .write.mode(SaveMode.Overwrite).partitionBy("idh").parquet(stage.toString)
    touched.foreach { h =>
      val src = new org.apache.hadoop.fs.Path(stage, s"idh=$h")
      val dst = new org.apache.hadoop.fs.Path(s"${idMapDir(dir)}/idh=$h")
      fs.delete(dst, true)
      if (fs.exists(src)) { fs.rename(src, dst); () }
    }
    fs.delete(stage, true); ()
  }

  /** The MAINTENANCE DEBT of a persisted vector index — the IVF/PQ twin
    * of [[IndexStore.maintenanceDebt]], the signal a cost-driven
    * `compactUpserts`/`compactDeletes` trigger polls. One row:
    *
    *  - `superseded_rows`: stored versions a compaction would drop (rows
    *    below their id's winning seq) — counted from the NARROW audit
    *    id-map, never the cell tables (a legacy index falls back to the
    *    assigned table's narrow projection);
    *  - `markers_pending`: live takedown markers awaiting a scrub;
    *  - `gen_lists_max`: on a manifest table, the longest per-cell
    *    generation list (appends since that cell's last rewrite) — the
    *    per-query directory-listing pressure a rewrite collapses to 1;
    *    -1 on a rename-mode table (no generations).
    *
    * Trigger recipe: compact when `superseded_rows` passes the
    * space-amplification target against the live count, or when
    * `gen_lists_max` passes the acceptable per-cell read fan-out.
    */
  def maintenanceDebt(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val rows =
      if (hasIdMap(spark, dir)) spark.read.parquet(idMapDir(dir))
      else narrow(CellManifest.readTable(spark, s"$dir/assigned"))
    val w = rows.groupBy(col("id")).agg(max(col("ingest_seq")).as("__w"))
    val superseded = rows.join(w, Seq("id"))
      .where(col("ingest_seq") < col("__w")).count()
    val delDir = new org.apache.hadoop.fs.Path(s"$dir/deleted")
    val markers =
      if (!fsOf(spark, dir).exists(delDir)) 0L
      else spark.read.parquet(delDir.toString)
        .select(col("id")).distinct().count()
    val table = s"$dir/assigned"
    // per-cell read fan-out, each mode in its own column and unit:
    // `gen_lists_max` = generation-list length (manifest tables; −1
    // otherwise), `cell_files_max` = parquet-file count per cell dir
    // (rename-mode tables, where each append lands one more file per
    // touched cell in place; −1 under a manifest — generations are the
    // fold unit there). File counts depend on writer parallelism, so
    // they live in their own column instead of overloading the
    // deterministic generation signal. Both drive
    // [[graft.operators.IvfModel.compactGenerations]] at the same
    // threshold meaning "units unioned per cell read"; the rename-mode
    // listing is one listStatus per cell, bounded by nLists.
    val isManifest = CellManifest.isManifest(spark, table)
    val genMax =
      if (!isManifest) -1L
      else CellManifest.read(spark, table)._2.values
        .map(_.length.toLong).foldLeft(0L)(math.max)
    val fileMax =
      if (isManifest) -1L
      else {
        val fs = fsOf(spark, dir)
        val t = new org.apache.hadoop.fs.Path(table)
        if (!fs.exists(t)) -1L
        else fs.listStatus(t).filter(_.getPath.getName.startsWith("cell="))
          .map(d => fs.listStatus(d.getPath)
            .count(_.getPath.getName.endsWith(".parquet")).toLong)
          .foldLeft(-1L)(math.max)
      }
    Seq((superseded, markers, genMax, fileMax))
      .toDF("superseded_rows", "markers_pending", "gen_lists_max",
        "cell_files_max")
  }

  /** The SNAPSHOT-RETENTION debt of a vector index — the IVF/PQ twin of
    * [[IndexStore.snapshotDebt]]: pins block retrain/re-save and extend
    * manifest, generation, and takedown-marker retention by design;
    * this makes that cost pollable. One row:
    *
    *  - `pins`: named snapshots on the assigned table;
    *  - `oldest_pin` / `oldest_pin_age_commits`: the stalest pin and its
    *    age in MANIFEST COMMITS (newest manifest number minus the pinned
    *    one — one unit per append/rewrite pass, never wall clock; −1
    *    with no pins);
    *  - `retained_locations`: per-cell locations (a generation's cell
    *    directory, or a base `cell=` dir as generation 0) only pinned
    *    manifests reference — the storage gc holds for pins, reclaimed
    *    at the first maintenance head after the last unpin;
    *  - `markers_retained`: live takedown-marker ids whose files
    *    compactDeletes is retaining because pins exist (0 with no pins —
    *    then markers are [[maintenanceDebt]]'s `markers_pending`,
    *    awaiting an ordinary scrub).
    *
    * Cost: pin-count point reads plus the manifests' own reads —
    * metadata-only, poll-friendly. A rename-mode index reports the empty
    * row (it cannot carry pins). Trigger recipe: alert when the oldest
    * age passes the maintenance-interval budget; a pin older than N
    * passes is a forgotten pin blocking retrain, not a training run.
    */
  def snapshotDebt(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // PQ layout: one pin name covers BOTH cell tables (ivf subtree +
    // encoded codes). The age/pins read from the ivf half (the halves
    // pin together or roll back together); the encoded half contributes
    // its own retained locations to the storage signal.
    val fs = fsOf(spark, dir)
    if (!fs.exists(new org.apache.hadoop.fs.Path(s"$dir/assigned")) &&
        fs.exists(new org.apache.hadoop.fs.Path(s"$dir/ivf/assigned"))) {
      val base = snapshotDebt(spark, s"$dir/ivf")
      val encRetained = retainedLocations(spark, s"$dir/encoded")
      return base.withColumn("retained_locations",
        when(col("retained_locations") >= 0,
          col("retained_locations") + lit(encRetained))
          .otherwise(col("retained_locations")))
    }
    val table = s"$dir/assigned"
    if (!CellManifest.isManifest(spark, table))
      return Seq((0, None: Option[String], -1L, -1L, 0L))
        .toDF("pins", "oldest_pin", "oldest_pin_age_commits",
          "retained_locations", "markers_retained")
    val pins = CellManifest.pins(spark, table)
    val (cur, liveCells) = CellManifest.read(spark, table)
    val ages = pins.toSeq.map { case (n, m) => n -> (cur - m) }
    val (oldestName, oldestAge) =
      if (ages.isEmpty) (None: Option[String], -1L)
      else { val (n, a) = ages.maxBy(_._2); (Some(n), a) }
    val retained = retainedLocations(spark, table)
    val delDir = new org.apache.hadoop.fs.Path(s"$dir/deleted")
    val markers =
      if (pins.isEmpty || !fsOf(spark, dir).exists(delDir)) 0L
      else spark.read.parquet(delDir.toString)
        .select(col("id")).distinct().count()
    Seq((pins.size, oldestName, oldestAge, retained, markers))
      .toDF("pins", "oldest_pin", "oldest_pin_age_commits",
        "retained_locations", "markers_retained")
  }

  /** Per-cell locations only PINNED manifests of `table` reference — a
    * generation's cell directory, or a base `cell=` dir as generation 0;
    * 0 on a rename-mode or pin-free table.
    */
  private def retainedLocations(spark: SparkSession, table: String): Long = {
    if (!CellManifest.isManifest(spark, table)) return 0L
    val pins = CellManifest.pins(spark, table)
    if (pins.isEmpty) return 0L
    val (_, liveCells) = CellManifest.read(spark, table)
    def locs(cells: Map[Int, Seq[Long]]): Set[(Int, Long)] =
      cells.toSeq.flatMap { case (c, gs) => gs.map(c -> _) }.toSet
    val pinnedLocs = pins.values.toSet.flatMap((m: Long) =>
      locs(CellManifest.readAt(spark, table, m)))
    (pinnedLocs -- locs(liveCells)).size.toLong
  }

  /** OPT-IN reconciliation of the vector index's side state — the
    * [[IndexStore.verifyMaintState]] twin: an append spans up to three
    * non-atomic writes (assigned cells, encoded codes on a PQ index, the
    * audit id-map), and a caller that swallows a failure mid-trio leaves
    * them silently diverged — audits under-report, or one PQ table
    * serves a version the other lacks. Cross-checks the (id, seq, cell)
    * multiset of the assigned table against the audit id-map, and (when
    * `encodedDir` names the PQ code table) against the encoded table,
    * throwing with samples on any divergence; re-save the model (or
    * replay the failed batch whole) to repair. One narrow scan per
    * table — the price of distrust, paid only when asked.
    */
  def verifyVectorState(spark: SparkSession, dir: String,
      encodedDir: Option[String] = None): Unit = {
    require(hasIdMap(spark, dir),
      s"$dir has no audit id-map — nothing to reconcile")
    def counts(df: DataFrame): DataFrame = narrow(df)
      .groupBy(col("id"), col("ingest_seq"), col("cell")).count()
    def diff(tag: String, left: DataFrame, right: DataFrame): Unit = {
      val d = left.withColumnRenamed("count", "__l")
        .join(right.withColumnRenamed("count", "__r"),
          Seq("id", "ingest_seq", "cell"), "full_outer")
        .where(col("__l").isNull || col("__r").isNull || col("__l") =!= col("__r"))
        .limit(5).collect()
      if (d.nonEmpty)
        throw new IllegalStateException(
          s"$tag of $dir diverges — a crashed append was not replayed " +
            "whole; sample (id, seq, cell, leftCount, rightCount): " +
            d.map(_.toSeq.mkString("(", ", ", ")")).mkString(" "))
    }
    val assigned = counts(CellManifest.readTable(spark, s"$dir/assigned"))
    diff("audit id-map", assigned,
      counts(spark.read.parquet(idMapDir(dir)).drop("idh")))
    encodedDir.foreach(e =>
      diff("encoded table", assigned,
        counts(CellManifest.readTable(spark, e))))
  }

  /** Everything the vector index physically stores about the given ids:
    * one row per stored version — `(id, ingest_seq, cell, kind)` with
    * kind `vector` — plus kind `marker` rows (null cell) for live
    * takedown markers. Reads ≤ |ids| id-map partitions; the touched
    * partitions derive from the SAME Spark hash expression the write
    * side partitions by, so reader and writer can never disagree. A
    * legacy index (saved before the id-map existed) falls back to a
    * full narrow scan of the assigned table, loudly O(table).
    */
  def postingsOf(spark: SparkSession, dir: String,
      ids: Seq[Long]): DataFrame = {
    import spark.implicits._
    val idsDf = ids.toDF("id")
    val data =
      if (hasIdMap(spark, dir)) {
        val touched = withIdh(idsDf)
          .select(col("idh")).distinct().collect().map(_.getInt(0)).toSeq
        spark.read.parquet(idMapDir(dir))
          .where(col("idh").isin(touched: _*))
          .where(col("id").isin(ids: _*))
          .drop("idh")
      } else
        narrow(CellManifest.readTable(spark, s"$dir/assigned"))
          .where(col("id").isin(ids: _*))
    val vectors = data.withColumn("kind", lit("vector"))
    val delDir = new org.apache.hadoop.fs.Path(s"$dir/deleted")
    if (!fsOf(spark, dir).exists(delDir)) vectors
    else {
      val raw = spark.read.parquet(delDir.toString)
      // markers written before the seq column existed read as
      // unconditional deletes (the deletedMarkers tolerance)
      val m = if (raw.columns.contains("__del_seq")) raw
              else raw.withColumn("__del_seq", lit(Long.MaxValue))
      vectors.unionByName(m.where(col("id").isin(ids: _*))
        .select(col("id"), col("__del_seq").as("ingest_seq"),
          lit(null).cast("int").as("cell"), lit("marker").as("kind")))
    }
  }
}
