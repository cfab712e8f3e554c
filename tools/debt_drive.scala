// Backlog-aware compaction trigger drive — the operator recipe for
// "compaction is purely a cost operation" (exact-on-arrival serving):
// under CONTINUOUS re-ingest, poll IndexStore.maintenanceDebt (O(delta)
// decision cost) and compact when log_bytes approaches the serve
// broadcast budget. Claims: (1) the debt report's log_bytes tracks the
// ingest; (2) the trigger fires before the budget is crossed, so the
// serve-path cutoff join NEVER leaves broadcast mode; (3) dead_postings
// drop to 0 at each compaction (the space reclaim) and the drive's
// answers equal a fresh build at the end.
//
//   cd $(mktemp -d) && /opt/spark/bin/spark-shell --master 'local[32]' \
//     --conf spark.ui.enabled=false --conf spark.sql.shuffle.partitions=32 \
//     --conf spark.sql.warehouse.dir=/tmp/debt_drive_wh \
//     --jars /root/repo/target/scala-2.13/pysparkminhashlshspark_2.13-0.1.0.jar \
//     -I /root/repo/tools/debt_drive.scala <<< ":quit"
//
// NOTE: spark-shell -I compiles statement-by-statement — one-liners only.
import org.apache.spark.sql.functions._
import graft.sources.IndexStore
import graft.operators.MinHashLSH
import graft.MinHashConfig

val cfg = MinHashConfig(numHash = 16, numBands = 4, numRows = 4)

val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet").select(col("doc_id").cast("long").as("id"), col("text")).localCheckpoint()

def feat(df: org.apache.spark.sql.DataFrame, seq: Long) = { val m = new MinHashLSH(cfg).fit(df, "id", "text"); val ix = m.indexDf.select(col("id"), col("signature"), col("bucket_ids")).withColumn("ingest_seq", lit(seq)).localCheckpoint(); m.unpersist(); ix }

val table = "debt_drive"

IndexStore.reset(spark, table)

IndexStore.saveInverted(feat(docs, 1L), table, prefixLen = 2)

// a DELIBERATELY small budget so the drive crosses it in-session; the
// production knob is graft.serve.cutoffBroadcastMaxBytes (32 MB default)
// and the trigger margin is half of it
val budget = 64L * 1024

val trigger = budget / 2

var compactions = 0

for (tick <- 1 to 30) { val seq = tick + 1L; val slice = docs.where(pmod(col("id") + tick, lit(37)) === 0).select(col("id"), concat(lit(s"rev $seq "), col("text")).as("text")); IndexStore.appendInverted(feat(slice, seq), table); val d = IndexStore.maintenanceDebt(spark, table).collect()(0); val act = if (d.getLong(1) > trigger) { IndexStore.compactInverted(spark, table); compactions += 1; "COMPACT" } else "-"; val after = IndexStore.maintenanceDebt(spark, table).collect()(0); val overBudget = after.getLong(1) > budget; println(f"TICK $tick%3d logBytes=${d.getLong(1)}%8d backlogIds=${d.getLong(2)}%6d deadPostings=${d.getLong(3)}%7d action=$act%-8s afterLogBytes=${after.getLong(1)}%8d broadcastSafe=${!overBudget}") }

println(s"COMPACTIONS=$compactions")

// end-state correctness: the maintained table serves EXACTLY a fresh
// build over the current corpus (the exact-on-arrival contract held
// through every trigger decision). An id's newest revision is the
// LARGEST tick t in [1,30] with (id + t) % 37 == 0 — i.e. t0 =
// (37 - id % 37) % 37 when 1 <= t0 <= 30 (t0 + 37 > 30 never matches),
// revised text "rev ${t0+1} <orig>".
val t0 = pmod(lit(37) - pmod(col("id"), lit(37)), lit(37))

val current = docs.select(col("id"), when(t0.between(1, 30), concat(lit("rev "), (t0 + 1).cast("string"), lit(" "), col("text"))).otherwise(col("text")).as("text")).localCheckpoint()

val key = docs.where(col("id") === 0L).select("text").collect()(0).getString(0).take(200)

val served = MinHashLSH.annFromInvertedIndex(spark, table, current, "id", "text", key, 10, cfg).collect().map(r => (r.getLong(0), r.getFloat(2))).toSeq

val freshTable = "debt_drive_fresh"

IndexStore.reset(spark, freshTable)

IndexStore.saveInverted(feat(current, 1L), freshTable, prefixLen = 2)

val fresh = MinHashLSH.annFromInvertedIndex(spark, freshTable, current, "id", "text", key, 10, cfg).collect().map(r => (r.getLong(0), r.getFloat(2))).toSeq

println("SERVED_TOP=" + served.take(5).mkString(";"))

println("EXACT_ON_ARRIVAL=" + (served == fresh))

System.exit(0)
