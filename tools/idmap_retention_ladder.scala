// Id-map marker-retention ladder — the round-15 self-assessed follow-up:
// tombstone MIRROR rows in the maintenance id-map made a delete-heavy
// table's id-map grow with total deletes EVER (the table's own marker
// partition is the serving guard + compliance record; the mirror only
// feeds the compaction decision). pruneIdMapMarkers drops mirrors older
// than the redelivery horizon. Claim: under a pure delete-churn workload
// the PRUNED table's id-map size plateaus while the UNPRUNED twin grows
// linearly in rounds; serving is identical on both (IndexStoreSpec:768
// pins that a replayed pre-delete batch stays serve-invisible across the
// horizon — the table marker guards, never the mirror).
//
//   cd $(mktemp -d) && /opt/spark/bin/spark-shell --master 'local[32]' \
//     --conf spark.ui.enabled=false --conf spark.sql.shuffle.partitions=32 \
//     --conf spark.sql.warehouse.dir=/tmp/idmap_retention_wh \
//     --jars /root/repo/target/scala-2.13/pysparkminhashlshspark_2.13-0.1.0.jar \
//     -I /root/repo/tools/idmap_retention_ladder.scala <<< ":quit"
//
// NOTE: spark-shell -I compiles statement-by-statement — one-liners only.
import org.apache.spark.sql.functions._
import graft.sources.IndexStore
import graft.operators.MinHashLSH
import graft.MinHashConfig

val cfg = MinHashConfig(numHash = 16, numBands = 4, numRows = 4)

val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet").select(col("doc_id").cast("long").as("id"), col("text")).localCheckpoint()

def feat(df: org.apache.spark.sql.DataFrame, seq: Long) = { val m = new MinHashLSH(cfg).fit(df, "id", "text"); val ix = m.indexDf.select(col("id"), col("signature"), col("bucket_ids")).withColumn("ingest_seq", lit(seq)).localCheckpoint(); m.unpersist(); ix }

def idmapBytes(table: String): Long = { val root = new java.io.File(new java.net.URI(spark.sessionState.catalog.getTableMetadata(org.apache.spark.sql.catalyst.TableIdentifier(table)).location.toString + "/_graft_idmap")); def walk(f: java.io.File): Long = if (f.isDirectory) f.listFiles().map(walk).sum else if (f.getName.endsWith(".parquet")) f.length() else 0L; walk(root) }

def markerMirrors(table: String): Long = { val root = spark.sessionState.catalog.getTableMetadata(org.apache.spark.sql.catalyst.TableIdentifier(table)).location.toString; spark.read.parquet(root + "/_graft_idmap").where(col("bkt_pfx") === IndexStore.TombstonePrefix).count() }

val ix = feat(docs, 1L)

Seq("churn_nopr", "churn_pr").foreach { t => IndexStore.reset(spark, t); IndexStore.saveInverted(ix, t, prefixLen = 2) }

// CHURN: each round deletes a fresh 500-id slice, then compacts; the
// PR twin additionally prunes mirrors below the round's horizon (the
// oldest seq the ingestion layer could still redeliver)
val rounds = 8

val batch = 500

for (r <- 1 to rounds) { val seq = r + 1L; val ids = docs.where(col("id") >= (r - 1) * batch && col("id") < r * batch).select(col("id")); Seq("churn_nopr", "churn_pr").foreach { t => IndexStore.appendTombstones(spark, t, ids, seq = seq); IndexStore.compactInverted(spark, t) }; IndexStore.pruneIdMapMarkers(spark, "churn_pr", horizon = seq); println(f"ROUND $r%2d  noprune: idmapBytes=${idmapBytes("churn_nopr")}%9d mirrors=${markerMirrors("churn_nopr")}%6d   pruned: idmapBytes=${idmapBytes("churn_pr")}%9d mirrors=${markerMirrors("churn_pr")}%6d") }

// serving parity after the churn: same flagship answer from both tables
// (id 4500 survives — rounds deleted ids 0..3999 of the 5000-doc corpus;
// the FULL text keys the query so the self-hit pins a non-empty answer)
val key = docs.where(col("id") === 4500L).select("text").collect()(0).getString(0)

val a = MinHashLSH.annFromInvertedIndex(spark, "churn_nopr", docs, "id", "text", key, 10, cfg).collect().map(_.getLong(0)).toSeq

val b = MinHashLSH.annFromInvertedIndex(spark, "churn_pr", docs, "id", "text", key, 10, cfg).collect().map(_.getLong(0)).toSeq

println("SERVE_PARITY=" + (a == b && a.nonEmpty) + " top=" + a.take(5).mkString(","))

System.exit(0)
