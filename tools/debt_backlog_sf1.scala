// sf1 debt-poll ladder at the ADVERSARIAL backlog shape (round-16
// verdict task 7): `IndexStore.maintenanceDebt` claims O(delta) cost —
// the dirty log plus only the touched id-map partitions, never the
// table. Measured here on the sf1 corpus (~50k docs, 10x sf0.1) with a
// 10,000-append backlog (10k re-ingested ids, log shaped to 10k files —
// the exact on-disk state 10k single-doc appends leave), on both axes:
//   (1) poll input bytes as a fraction of the table, small vs 10k
//       backlog, before and after the log's self-compaction fold;
//   (2) poll wall time at each shape.
// Requires /tmp/graft_sf1 (tools/sf_scale_gen.scala).
//
//   cd $(mktemp -d) && /opt/spark/bin/spark-shell --master 'local[32]' \
//     --conf spark.ui.enabled=false --conf spark.sql.shuffle.partitions=32 \
//     --conf spark.sql.warehouse.dir=/tmp/debt_backlog_wh \
//     --jars /root/repo/target/scala-2.13/pysparkminhashlshspark_2.13-0.1.0.jar \
//     -I /root/repo/tools/debt_backlog_sf1.scala <<< ":quit"
//
// NOTE: spark-shell -I compiles statement-by-statement — one-liners only.
import org.apache.spark.sql.functions._
import graft.sources.IndexStore
import graft.operators.MinHashLSH
import graft.MinHashConfig

val cfg = MinHashConfig(numHash = 16, numBands = 4, numRows = 4)

val docs = spark.read.parquet("/tmp/graft_sf1/documents.parquet").select(col("doc_id").cast("long").as("id"), col("text")).localCheckpoint()

def feat(df: org.apache.spark.sql.DataFrame, seq: Long) = { val m = new MinHashLSH(cfg).fit(df, "id", "text"); val ix = m.indexDf.select(col("id"), col("signature"), col("bucket_ids")).withColumn("ingest_seq", lit(seq)).localCheckpoint(); m.unpersist(); ix }

class BytesListener extends org.apache.spark.scheduler.SparkListener { @volatile var bytes = 0L; @volatile var records = 0L; override def onStageCompleted(s: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = { bytes += s.stageInfo.taskMetrics.inputMetrics.bytesRead; records += s.stageInfo.taskMetrics.inputMetrics.recordsRead } }

val bl = new BytesListener

spark.sparkContext.addSparkListener(bl)

val table = "debt_backlog_sf1"

IndexStore.reset(spark, table)

IndexStore.saveInverted(feat(docs, 1L), table, prefixLen = 2)

val tableBytes = { val root = new java.io.File(new java.net.URI(spark.sessionState.catalog.getTableMetadata(org.apache.spark.sql.catalyst.TableIdentifier(table)).location.toString)); def walk(f: java.io.File): Long = if (f.isDirectory) f.listFiles().map(walk).sum else if (f.getName.endsWith(".parquet")) f.length() else 0L; walk(root) }

println(f"TABLE sf1 bytes=$tableBytes%d postings=${spark.table(table).count()}%d docs=${docs.count()}%d")

def poll(tag: String): Unit = { bl.bytes = 0L; bl.records = 0L; val t0 = System.nanoTime(); val d = IndexStore.maintenanceDebt(spark, table).collect()(0); val secs = (System.nanoTime() - t0) / 1e9; Thread.sleep(1500); println(f"POLL $tag%-28s secs=$secs%6.2f inputBytes=${bl.bytes}%12d fractionOfTable=${bl.bytes.toDouble / tableBytes}%.4f [files=${d.getInt(0)} bytes=${d.getLong(1)} backlogIds=${d.getLong(2)} dead=${d.getLong(3)}]") }

// small backlog: 10 re-ingested ids
IndexStore.appendInverted(feat(docs.orderBy("id").limit(10).select(col("id"), concat(lit("corrected "), col("text")).as("text")), 2L), table)

poll("backlog=10")

// the adversarial shape: 10k MORE re-ingested ids, log shaped to 10k
// files (what 10k single-doc appends leave on disk)
val slice = docs.orderBy("id").limit(10000).select(col("id"), concat(lit("corrected2 "), col("text")).as("text"))

IndexStore.appendInverted(feat(slice, 3L), table)

val logDir = new java.io.File(new java.net.URI(spark.sessionState.catalog.getTableMetadata(org.apache.spark.sql.catalyst.TableIdentifier(table)).location.toString + "/_graft_dirtylog"))

def shapeLog(n: Int): Unit = { val rows = spark.read.parquet(logDir.toString).localCheckpoint(); val stage = logDir.getPath + "__stage"; rows.repartition(n).write.mode("overwrite").parquet(stage); scala.reflect.io.Path(logDir).toDirectory.deleteRecursively(); new java.io.File(stage).renameTo(logDir); () }

shapeLog(10000)

poll("backlog=10010 files=10000")

// the log fold bounds the footer-open cost; the poll re-measured
spark.conf.set("graft.maint.logCompactFiles", "64")

IndexStore.compactDirtyLogIfNeeded(spark, table)

poll("backlog=10010 folded")

// contrast: what the poll would cost if it scanned the table instead
bl.bytes = 0L

val full = spark.table(table).where(col("bkt_pfx") =!= IndexStore.TombstonePrefix).select(col("id"), col("ingest_seq")).groupBy("id").agg(max("ingest_seq")).count()

Thread.sleep(1500)

println(f"FULLSCAN_CONTRAST inputBytes=${bl.bytes}%d fractionOfTable=${bl.bytes.toDouble / tableBytes}%.4f")

System.exit(0)
