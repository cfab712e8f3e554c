// Uncompacted-backlog serving ladder — the cost of "exact on arrival"
// between compactions, measured on BOTH axes the backlog grows along:
//
// (1) LOG FILE COUNT (one tiny file per append): every serve opens the
//     dirty log to build the supersession cutoffs, so 10k appends since
//     the last compaction = 10k parquet footers per point query — unless
//     the log self-compacts (IndexStore.compactDirtyLogIfNeeded, trigger
//     graft.maint.logCompactFiles = 64). Rungs synthesize the post-N-
//     append log state exactly (same rows, N files via repartition(N) —
//     the file count is what 10, 100, 1k, 10k real appends leave behind;
//     the product code under test is the SERVE and the FOLD, not the
//     setup) and measure point-query latency before/after the fold.
// (2) BACKLOG ROWS (cutoff frame size): the serve broadcasts the cutoff
//     frame only under graft.serve.cutoffBroadcastMaxBytes and degrades
//     to an id-keyed shuffle join past it (PlanPropertiesSpec pins the
//     flip); measured here as latency at a 10-row vs 10k-row backlog,
//     broadcast vs forced-shuffle on the same state.
//
//   cd $(mktemp -d) && /opt/spark/bin/spark-shell --master 'local[32]' \
//     --conf spark.ui.enabled=false --conf spark.sql.shuffle.partitions=32 \
//     --conf spark.sql.warehouse.dir=/tmp/backlog_ladder_wh \
//     --jars /root/repo/target/scala-2.13/pysparkminhashlshspark_2.13-0.1.0.jar \
//     -I /root/repo/tools/backlog_ladder.scala <<< ":quit"
//
// NOTE: spark-shell -I compiles statement-by-statement — one-liners only.
import org.apache.spark.sql.functions._
import graft.sources.IndexStore
import graft.operators.MinHashLSH
import graft.MinHashConfig

val cfg = MinHashConfig(numHash = 16, numBands = 4, numRows = 4)

val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet").select(col("doc_id").cast("long").as("id"), col("text")).localCheckpoint()

val key = docs.where(col("id") === 0L).select("text").collect()(0).getString(0).take(200)

def feat(df: org.apache.spark.sql.DataFrame, seq: Long) = { val m = new MinHashLSH(cfg).fit(df, "id", "text"); val ix = m.indexDf.select(col("id"), col("signature"), col("bucket_ids")).withColumn("ingest_seq", lit(seq)).localCheckpoint(); m.unpersist(); ix }

val table = "backlog_ladder"

IndexStore.reset(spark, table)

IndexStore.saveInverted(feat(docs, 1L), table, prefixLen = 2)

// the full-corpus (5k-id at sf0.1) re-ingest backlog lands as ONE
// logical append (its log rows are identical whether it arrived as 1 or
// 10k batches; the FILE-count axis is synthesized per rung below)
val slice = docs.orderBy("id").limit(10000).select(col("id"), concat(lit("corrected "), col("text")).as("text"))

IndexStore.appendInverted(feat(slice, 2L), table)

val logDir = new java.io.File(new java.net.URI(spark.sessionState.catalog.getTableMetadata(org.apache.spark.sql.catalyst.TableIdentifier(table)).location.toString + "/_graft_dirtylog"))

def logFiles(): Int = logDir.listFiles().count(_.getName.endsWith(".parquet"))

// re-shape the SAME log rows into n files — the exact on-disk state n
// single-doc appends leave (one small file each); overwrite via staging
def shapeLog(n: Int): Unit = { val rows = spark.read.parquet(logDir.toString).localCheckpoint(); val stage = logDir.getPath + "__stage"; rows.repartition(n).write.mode("overwrite").parquet(stage); scala.reflect.io.Path(logDir).toDirectory.deleteRecursively(); new java.io.File(stage).renameTo(logDir); () }

def serveSecs(): Double = { val reps = (1 to 3).map { _ => val t0 = System.nanoTime(); val r = MinHashLSH.annFromInvertedIndex(spark, table, docs, "id", "text", key, 10, cfg).collect(); require(r.nonEmpty); (System.nanoTime() - t0) / 1e9 }; reps.sorted.apply(1) }

def debtRow(): String = { val d = IndexStore.maintenanceDebt(spark, table).collect()(0); s"files=${d.getInt(0)} bytes=${d.getLong(1)} backlogIds=${d.getLong(2)} deadPostings=${d.getLong(3)}" }

// --- axis 1: log file count at a fixed 10k-row backlog ---------------
for (n <- Seq(10, 100, 1000, 10000)) { shapeLog(n); val s = serveSecs(); println(f"FILES n=$n%6d logFiles=${logFiles()}%6d serveSecs=$s%.2f  [${debtRow()}]") }

// the self-compaction fold: 10k files -> 1 aggregated file, serve drops
// back to the 1-file latency; crash-safe append-then-delete
spark.conf.set("graft.maint.logCompactFiles", "64")

val t0 = System.nanoTime()

IndexStore.compactDirtyLogIfNeeded(spark, table)

println(f"FOLD secs=${(System.nanoTime() - t0) / 1e9}%.2f logFiles=${logFiles()}%d serveSecs=${serveSecs()}%.2f  [${debtRow()}]")

// --- axis 2: backlog rows, broadcast vs forced shuffle ----------------
def bothModes(tag: String): Unit = { val b = serveSecs(); spark.conf.set("graft.serve.cutoffBroadcastMaxBytes", "1"); val s = serveSecs(); spark.conf.unset("graft.serve.cutoffBroadcastMaxBytes"); println(f"ROWS $tag broadcastSecs=$b%.2f shuffleSecs=$s%.2f  [${debtRow()}]") }

bothModes("backlog=10000")

IndexStore.compactInverted(spark, table)

IndexStore.appendInverted(feat(docs.orderBy("id").limit(10).select(col("id"), concat(lit("pass3 "), col("text")).as("text")), 3L), table)

bothModes("backlog=10")

System.exit(0)
