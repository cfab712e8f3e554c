// Partition-scoped compaction ladder: the claim under test is that
// compactInverted's REWRITE cost tracks the DELTA (the re-ingested slice),
// not the table — the round-13 full-table rewrite rewrote 100% per pass.
// Base: sf0.1 documents replicated 20x (100k docs, ~400k postings) in a
// prefixLen=3 layout (4096-directory space — the 100 TB shape where dirty
// directories stay sparse; at prefixLen=2's 256 dirs a 50-doc delta
// already dirties a third of the space). Rungs: re-ingest 5 / 50 / 500
// docs (0.005% / 0.05% / 0.5%) against the SAME table (each compaction
// leaves it clean for the next rung), and measure the bytes of data files
// REWRITTEN (directories whose contents changed) vs the table's total.
// Expect: rewritten fraction monotone in the delta and far below 1 at the
// small rungs — the inverse rung of the append-heavy gate feeds (which
// touch most prefixes by design).
//
//   /opt/spark/bin/spark-shell --master 'local[32]' \
//     --conf spark.ui.enabled=false --conf spark.sql.shuffle.partitions=32 \
//     --conf spark.sql.warehouse.dir=/tmp/compact_ladder_wh \
//     --jars target/scala-2.13/pysparkminhashlshspark_2.13-0.1.0.jar \
//     -I tools/compact_ladder.scala <<< ":quit"
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

val table = "compact_ladder"

IndexStore.reset(spark, table)

IndexStore.saveInverted(feat(docs, 1L), table, prefixLen = 3)

// per directory: (bytes, newest mtime) — mtime detects a same-size rewrite
def dirState(): Map[String, (Long, Long)] = { val root = IndexStore.warehouseLocation(spark, table); root.listFiles().filter(f => f.isDirectory && f.getName.startsWith("bkt_pfx=")).map { dir => val fs = dir.listFiles().filter(_.getName.endsWith(".parquet")); dir.getName -> (fs.map(_.length()).sum, if (fs.isEmpty) 0L else fs.map(_.lastModified()).max) }.toMap }

def rung(delta: Int, seq: Long): Unit = { val slice = docs.orderBy("id").limit(delta).select(col("id"), concat(lit(s"corrected pass $seq "), col("text")).as("text")); IndexStore.appendInverted(feat(slice.localCheckpoint(), seq), table); val before = dirState(); val total = before.values.map(_._1).sum; val t0 = System.nanoTime(); IndexStore.compactInverted(spark, table); val secs = (System.nanoTime() - t0) / 1e9; val after = dirState(); val dirty = before.keySet.union(after.keySet).filter(k => before.get(k) != after.get(k)); val rewrittenBytes = dirty.toSeq.map(k => before.get(k).map(_._1).getOrElse(0L)).sum; println(f"RUNG delta=$delta%6d dirtyDirs=${dirty.size}%5d of ${after.size}%5d rewrittenBytes=$rewrittenBytes%12d totalBytes=$total%12d fraction=${rewrittenBytes.toDouble / total}%.4f compactSecs=$secs%.1f") }

rung(5, 2L)

rung(50, 3L)

rung(500, 4L)

System.exit(0)
