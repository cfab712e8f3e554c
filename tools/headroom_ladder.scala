// Headroom ladder for the three sf1 rows nearest the 1.5×/unit threshold
// (round-18 verdict task 8): mm_keyframes_real 0.81, dedup_audio_fingerprint
// 0.711, stream_inverted_ingest_real 0.706. All three are payload/ingest-
// bound — their cost should be LINEAR in total payload/batch volume, which
// bounds the per-unit ratio away from 1.5 at any corpus scale (a drift
// toward the threshold would need super-linear growth in volume). This
// ladder doubles the volume at the sf0.1 shape and reports t(2x)/t(1x);
// ≈2.0 confirms linearity (PERF.md cites the numbers).
//
//   cd $(mktemp -d) && /opt/spark/bin/spark-shell --master 'local[32]' \
//     --driver-memory 8g \
//     --conf spark.ui.enabled=false --conf spark.sql.shuffle.partitions=32 \
//     --conf spark.sql.warehouse.dir=/tmp/headroom_wh \
//     --jars /root/repo/target/scala-2.13/pysparkminhashlshspark_2.13-0.1.0.jar \
//     -I /root/repo/tools/headroom_ladder.scala <<< ":quit"
//
// NOTE: spark-shell -I compiles statement-by-statement — one-liners only.
import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Multimodal}
import graft.sources.IndexStore
import graft.MinHashConfig

val cfg = MinHashConfig(numHash = 16, numBands = 4, numRows = 4, bucketHexLen = 2)

val d0 = spark.read.parquet("/root/testdata/sf0.1/documents.parquet").select(col("doc_id").cast("long").as("doc_id"), col("text"))

def corpus(mult: Int) = { val reps = spark.range(0, mult).select(col("id").as("rep")); d0.crossJoin(reps).select((col("doc_id") + col("rep") * 1000000L).as("doc_id"), concat(col("text"), lit(" rep "), col("rep")).as("text")).localCheckpoint() }

def timed(tag: String)(body: => Long): Double = { val t0 = System.nanoTime(); val n = body; val dt = (System.nanoTime() - t0) / 1e9; println(f"HEADROOM $tag rows=$n secs=$dt%.2f"); dt }

// --- 1. keyframes: per-payload MJPEG decode walk, volume = payload count
def kf(mult: Int): Double = timed(s"keyframes_x$mult")(Multimodal.selectKeyframes(Multimodal.plantSceneVideoPayloads(corpus(mult), "doc_id"), threshold = 10.0).count())
val kf1a = kf(1)
val kf1 = kf(1)
val kf2 = kf(2)
println(f"HEADROOM keyframes ratio=${kf2 / kf1}%.2f (linear=2.0)")

// --- 2. audio fingerprint: per-payload FFT peak walk + family-blocked pairs
def au(mult: Int): Double = timed(s"audio_x$mult") { val pk = Multimodal.audioPeakSequence(Multimodal.plantTonePayloads(corpus(mult), "doc_id")).localCheckpoint(); Dedup.audioFingerprintPairs(pk, "doc_id", "frame_idx", "peak_bin", minJacMicro = 250000L).count() }
val au1a = au(1)
val au1 = au(1)
val au2 = au(2)
println(f"HEADROOM audio ratio=${au2 / au1}%.2f (linear=2.0)")

// --- 3. streaming inverted ingest: three slices per corpus copy, one file
// per micro-batch; volume = batch bytes through featurize + append + compact
def slices(docs: org.apache.spark.sql.DataFrame) = { val dd = docs.select(col("doc_id").as("id"), col("text")); Seq(dd.select(col("id"), when(col("id") % 5 === 0, concat(lit("preliminary draft "), col("text"))).otherwise(col("text")).as("text"), lit(1L).as("ingest_seq")), dd.where(col("id") % 5 === 0).withColumn("ingest_seq", lit(2L)), dd.where(col("id") % 7 === 3).withColumn("ingest_seq", lit(3L))) }

def ing(mult: Int): Double = { val table = s"headroom_ingest_$mult"; IndexStore.reset(spark, table); val tmp = java.nio.file.Files.createTempDirectory(s"headroom-feed-$mult").toString; val dirF = new java.io.File(tmp); slices(corpus(mult)).zipWithIndex.foreach { case (sl, i) => sl.coalesce(1).write.mode(if (i == 0) "overwrite" else "append").parquet(tmp); dirF.listFiles().filter(f => f.getName.endsWith(".parquet")).filter(_.lastModified() > 1700000000000L).foreach(_.setLastModified(1600000000000L + i * 60000L)) }; val schema = spark.read.parquet(tmp).schema; timed(s"ingest_x$mult") { val q = graft.streaming.StreamingIndex.streamingInvertedIngest(spark, tmp, schema, cfg, table, prefixLen = 1); try q.processAllAvailable() finally q.stop(); IndexStore.compactInverted(spark, table); spark.table(table).count() } }
val in1a = ing(1)
val in1 = ing(1)
val in2 = ing(2)
println(f"HEADROOM ingest ratio=${in2 / in1}%.2f (linear=2.0)")

System.exit(0)
