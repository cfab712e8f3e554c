// Partition-scoped compaction ladder: TWO claims under test.
// (1) compactInverted's REWRITE cost tracks the DELTA (the re-ingested
//     slice), not the table — the round-13 full-table rewrite rewrote 100%
//     per pass.
// (2) round 15: the DECISION pass is O(delta) too — each append logs its
//     (id, seq) delta and mirrors narrow postings into the id-hash-
//     partitioned _graft_idmap, so the decision reads the log plus only the
//     touched idmap partitions (job description "graft-compact-decision";
//     measured here with a per-description input-bytes listener). The
//     round-14 decision was a flat full-table narrow scan every pass —
//     reproduced below as the LEGACY rung (idmap removed → fallback path).
// Base: sf0.1 documents replicated 20x (100k docs, ~400k postings) in a
// prefixLen=3 layout (4096-directory space — the 100 TB shape where dirty
// directories stay sparse). Rungs: re-ingest 5 / 50 / 500 docs
// (0.005% / 0.05% / 0.5%) against the SAME table (each compaction leaves it
// clean for the next rung). Expect: decisionBytes and rewritten fraction
// both monotone in the delta and far below the legacy full-scan bytes at
// the small rungs.
//
//   cd $(mktemp -d) && /opt/spark/bin/spark-shell --master 'local[32]' \
//     --conf spark.ui.enabled=false --conf spark.sql.shuffle.partitions=32 \
//     --conf spark.sql.warehouse.dir=/tmp/compact_ladder_wh \
//     --jars /root/repo/target/scala-2.13/pysparkminhashlshspark_2.13-0.1.0.jar \
//     -I /root/repo/tools/compact_ladder.scala <<< ":quit"
//   (scratch cwd: a stale metastore_db in the cwd pins the default DB to
//   its ORIGINAL warehouse path, silently ignoring the conf above)
//
// NOTE: spark-shell -I compiles statement-by-statement — one-liners only.
import org.apache.spark.sql.functions._
import graft.sources.IndexStore
import graft.operators.MinHashLSH
import graft.MinHashConfig

val cfg = MinHashConfig(numHash = 16, numBands = 4, numRows = 4, bucketHexLen = 4)

val d0 = spark.read.parquet("/root/testdata/sf0.1/documents.parquet").select(col("doc_id").cast("long").as("id"), col("text"))

val reps = spark.range(0, 20).select(col("id").as("rep"))

val docs = d0.crossJoin(reps).select((col("id") + col("rep") * 1000000L).as("id"), concat(col("text"), lit(" rep "), col("rep")).as("text")).localCheckpoint()

def feat(df: org.apache.spark.sql.DataFrame, seq: Long) = { val m = new MinHashLSH(cfg).fit(df, "id", "text"); val ix = m.indexDf.select(col("id"), col("signature"), col("bucket_ids")).withColumn("ingest_seq", lit(seq)).localCheckpoint(); m.unpersist(); ix }

// input bytes per job description — attributes the decision vs rewrite reads
class BytesListener extends org.apache.spark.scheduler.SparkListener { val byDesc = new scala.collection.concurrent.TrieMap[String, (Long, Long)](); val stageDesc = new scala.collection.concurrent.TrieMap[Int, String](); override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = { val d = Option(js.properties.getProperty("spark.job.description")).getOrElse(""); js.stageInfos.foreach(si => stageDesc.put(si.stageId, d)) }; override def onStageCompleted(s: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = { val d = stageDesc.getOrElse(s.stageInfo.stageId, ""); val m = s.stageInfo.taskMetrics; val prev = byDesc.getOrElse(d, (0L, 0L)); byDesc.put(d, (prev._1 + m.inputMetrics.bytesRead, prev._2 + m.inputMetrics.recordsRead)) } }

val bl = new BytesListener

spark.sparkContext.addSparkListener(bl)

val table = "compact_ladder"

IndexStore.reset(spark, table)

IndexStore.saveInverted(feat(docs, 1L), table, prefixLen = 3)

// per directory: (bytes, newest mtime) — mtime detects a same-size rewrite
def dirState(): Map[String, (Long, Long)] = { val root = new java.io.File(new java.net.URI(spark.sessionState.catalog.getTableMetadata(org.apache.spark.sql.catalyst.TableIdentifier(table)).location.toString)); root.listFiles().filter(f => f.isDirectory && f.getName.startsWith("bkt_pfx=")).map { dir => val fs = dir.listFiles().filter(_.getName.endsWith(".parquet")); dir.getName -> (fs.map(_.length()).sum, if (fs.isEmpty) 0L else fs.map(_.lastModified()).max) }.toMap }

def rung(tag: String, delta: Int, seq: Long): Unit = { val slice = docs.orderBy("id").limit(delta).select(col("id"), concat(lit(s"corrected pass $seq "), col("text")).as("text")); IndexStore.appendInverted(feat(slice.localCheckpoint(), seq), table); val before = dirState(); val total = before.values.map(_._1).sum; bl.byDesc.clear(); val t0 = System.nanoTime(); IndexStore.compactInverted(spark, table); val secs = (System.nanoTime() - t0) / 1e9; Thread.sleep(3000); val dec = bl.byDesc.getOrElse("graft-compact-decision", (0L, 0L)); val rew = bl.byDesc.getOrElse("graft-compact-rewrite", (0L, 0L)); val after = dirState(); val dirty = before.keySet.union(after.keySet).filter(k => before.get(k) != after.get(k)); val rewrittenBytes = dirty.toSeq.map(k => before.get(k).map(_._1).getOrElse(0L)).sum; println(f"RUNG $tag delta=$delta%6d dirtyDirs=${dirty.size}%5d of ${after.size}%5d decisionBytes=${dec._1}%12d decisionRecords=${dec._2}%10d rewriteReadBytes=${rew._1}%12d rewrittenBytes=$rewrittenBytes%12d totalBytes=$total%12d fraction=${rewrittenBytes.toDouble / total}%.4f compactSecs=$secs%.1f") }

rung("logged", 5, 2L)

rung("logged", 50, 3L)

rung("logged", 500, 4L)

// LEGACY contrast: strip the maintenance side state — the decision falls
// back to the round-14 full-table narrow scan; same delta as rung 1
def stripMaint(): Unit = { val root = new java.io.File(new java.net.URI(spark.sessionState.catalog.getTableMetadata(org.apache.spark.sql.catalyst.TableIdentifier(table)).location.toString)); Seq("_graft_idmap", "_graft_dirtylog").foreach(n => { val d = new scala.reflect.io.Directory(new java.io.File(root, n)); if (d.exists) d.deleteRecursively() }); () }

stripMaint()

rung("legacy", 5, 5L)

rung("legacy", 500, 6L)

System.exit(0)
