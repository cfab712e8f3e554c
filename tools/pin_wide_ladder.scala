// Wide-layout pin rung (round-18 verdict task 4; 16⁴ rung added in
// round 19): the wide layouts OPERATIONS.md recommends toward 100 TB,
// pinned. pinInverted used to list partitions SERIALLY on the driver
// (fine at 16², minutes of metadata round trips at 16⁴); it now lists
// through a bounded 32-thread pool past 64 partitions — TWICE since
// round 19 (the post-commit extra-files validation). This rung measures
// pin wall-clock and inventory bytes — the claim is "bounded at
// ~seconds, same inventory, gates unchanged" (PERF.md cites the
// numbers). GRAFT_PIN_PREFIX picks the layout width: 3 → 4096 dirs
// (default), 4 → 65536 dirs (the documented max recommended width).
//
//   cd $(mktemp -d) && /opt/spark/bin/spark-shell --master 'local[32]' \
//     --driver-memory 8g \
//     --conf spark.ui.enabled=false --conf spark.sql.shuffle.partitions=32 \
//     --conf spark.sql.warehouse.dir=/tmp/pin_wide_wh \
//     --jars /root/repo/target/scala-2.13/pysparkminhashlshspark_2.13-0.1.0.jar \
//     -I /root/repo/tools/pin_wide_ladder.scala <<< ":quit"
//
// NOTE: spark-shell -I compiles statement-by-statement — one-liners only.
import org.apache.spark.sql.functions._
import graft.sources.IndexStore
import graft.operators.MinHashLSH
import graft.MinHashConfig

val cfg = MinHashConfig(numHash = 16, numBands = 4, numRows = 4, bucketHexLen = 4)

val pinPrefix = sys.env.getOrElse("GRAFT_PIN_PREFIX", "3").toInt

val d0 = spark.read.parquet("/root/testdata/sf0.1/documents.parquet").select(col("doc_id").cast("long").as("id"), col("text"))

def corpus(mult: Int) = { val reps = spark.range(0, mult).select(col("id").as("rep")); d0.crossJoin(reps).select((col("id") + col("rep") * 1000000L).as("id"), concat(col("text"), lit(" rep "), col("rep")).as("text")).localCheckpoint() }

def feat(df: org.apache.spark.sql.DataFrame, seq: Long) = { val m = new MinHashLSH(cfg).fit(df, "id", "text"); val ix = m.indexDf.select(col("id"), col("signature"), col("bucket_ids")).withColumn("ingest_seq", lit(seq)).localCheckpoint(); m.unpersist(); ix }

def walkBytes(root: java.io.File, pred: String => Boolean): Long = { def w(f: java.io.File): Long = if (f.isDirectory) f.listFiles().map(w).sum else if (pred(f.getName)) f.length() else 0L; w(root) }

val key = d0.where(col("id") === 0).select(substring(col("text"), 1, 120)).collect()(0).getString(0)

for (mult <- Seq(sys.env.getOrElse("GRAFT_PIN_MULT", "4").toInt)) { val table = s"pin_wide_${pinPrefix}_$mult"; IndexStore.reset(spark, table); val docs = corpus(mult); val n = docs.count(); IndexStore.saveInverted(feat(docs, 1L), table, prefixLen = pinPrefix, swapMode = IndexStore.SwapManifest); IndexStore.appendInverted(feat(docs.where(col("id") % 97 === 0), 2L), table); IndexStore.compactInverted(spark, table); val root = new java.io.File(new java.net.URI(spark.sessionState.catalog.getTableMetadata(org.apache.spark.sql.catalyst.TableIdentifier(table)).location.toString)); val nDirs = spark.sessionState.catalog.listPartitions(org.apache.spark.sql.catalyst.TableIdentifier(table)).size; val dataBytes = walkBytes(root, _.endsWith(".parquet")); val t0 = System.nanoTime(); IndexStore.pinInverted(spark, table, "p1"); val pinSecs = (System.nanoTime() - t0) / 1e9; val pinBytes = walkBytes(new java.io.File(root, "_graft_pins"), _ => true); def serveMs(pin: Option[String]): Long = { val t = System.nanoTime(); val r = MinHashLSH.annFromInvertedIndex(spark, table, docs.withColumnRenamed("id", "doc_id"), "doc_id", "text", key, 10, cfg, pin).collect(); require(r.nonEmpty); (System.nanoTime() - t) / 1000000L }; val live1 = serveMs(None); val pin1 = serveMs(Some("p1")); val live2 = serveMs(None); val pin2 = serveMs(Some("p1")); IndexStore.unpinInverted(spark, table, "p1"); println(f"PINWIDE dirs=$nDirs docs=$n dataMB=${dataBytes / 1e6}%.1f pinSecs=$pinSecs%.2f pinKB=${pinBytes / 1e3}%.1f serveLiveMs=${math.min(live1, live2)} servePinMs=${math.min(pin1, pin2)}"); docs.unpersist() }

System.exit(0)
