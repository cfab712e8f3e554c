// Generation fan-out ladder — the pure-append path's physical debt on a
// manifest vector table and what IvfModel.compactGenerations reclaims:
//
// every micro-batch append commits as its own _gen-N directory and the
// upsert rewrite only replaces the lists of cells holding SUPERSEDED
// rows, so an all-new-ids stream grows every cell's generation list by
// one per batch forever. Each cell read then unions one directory per
// surviving append — N parquet footers + N tiny row groups per cell per
// query. Rungs synthesize the post-N-append manifest state exactly (the
// same rows committed as N generations through the real appendVectors
// path would be; the product code under test is the READ and the FOLD,
// not the setup) and measure a full readTable scan plus a single-cell
// read before/after compactGenerations, with the file/dir counts that
// drive the latency.
//
//   cd $(mktemp -d) && /opt/spark/bin/spark-shell --master 'local[32]' \
//     --conf spark.ui.enabled=false --conf spark.sql.shuffle.partitions=32 \
//     --jars /root/repo/target/scala-2.13/pysparkminhashlshspark_2.13-0.1.0.jar \
//     -I /root/repo/tools/genfold_ladder.scala <<< ":quit"
//
// NOTE: spark-shell -I compiles statement-by-statement — one-liners only.
import org.apache.spark.sql.functions._
import graft.operators.{IvfModel, SimSearch}
import graft.sources.{CellManifest, IndexStore}

// sf0.01: the ladder's variable is the GENERATION COUNT (directory and
// footer fan-out per cell), not corpus bytes — each rung pays N real
// appendVectors calls, and 168 of them at sf0.1 is all setup time
val emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet").localCheckpoint()

val m = SimSearch.trainIvf(emb, "vec_id", "embedding", nLists = 16, iters = 1)

def freshDir(): String = java.nio.file.Files.createTempDirectory("genfold").toString

def walkCount(d: String): (Long, Long) = { def w(f: java.io.File): Seq[java.io.File] = if (f.isDirectory) f.listFiles().toSeq.flatMap(w) else Seq(f); val fs = w(new java.io.File(d)); (fs.count(_.getName.endsWith(".parquet")).toLong, fs.map(_.length).sum) }

def timeMs[T](body: => T): (T, Long) = { val t0 = System.nanoTime; val r = body; (r, (System.nanoTime - t0) / 1000000L) }

def scanAll(dir: String): Long = CellManifest.readTable(spark, s"$dir/assigned").agg(count(lit(1))).collect()(0).getLong(0)

def scanCell(dir: String, c: Int): Long = CellManifest.readTable(spark, s"$dir/assigned").where(col("cell") === c).agg(count(lit(1))).collect()(0).getLong(0)

// rungs: the state N single-vector-batch appends leave behind — N
// generations, each holding one slice of the corpus across all cells
def buildRung(nGens: Int): String = { val dir = freshDir(); IvfModel(m.centroids, m.assigned.where(col("id") < 10).withColumn("ingest_seq", lit(1L))).save(dir, IndexStore.SwapManifest); val feed = emb.where(col("vec_id") >= 10).withColumn("b", pmod(col("vec_id"), lit(nGens))).localCheckpoint(); (0 until nGens).foreach { i => IvfModel.appendVectors(spark, dir, feed.where(col("b") === i).drop("b"), "vec_id", "embedding", seq = 1L) }; dir }

println("GENFOLD_LADDER rows: rung gens_max files bytes scan_all_ms scan_cell_ms")

Seq(8, 32, 128).foreach { n => val dir = buildRung(n); val lists = CellManifest.read(spark, s"$dir/assigned")._2.values; val gmax = lists.map(_.length).max; val (files, bytes) = walkCount(s"$dir/assigned"); val (rows, tAll) = timeMs(scanAll(dir)); val (_, tCell) = timeMs(scanCell(dir, 3)); println(s"GENFOLD pre  n=$n gens_max=$gmax files=$files bytes=$bytes rows=$rows scan_all_ms=$tAll scan_cell_ms=$tCell"); val (_, tFold) = timeMs(IvfModel.compactGenerations(spark, dir, maxGenLists = 1)); IvfModel.compactGenerations(spark, dir, maxGenLists = 1); val lists2 = CellManifest.read(spark, s"$dir/assigned")._2.values; val (files2, bytes2) = walkCount(s"$dir/assigned"); val (rows2, tAll2) = timeMs(scanAll(dir)); val (_, tCell2) = timeMs(scanCell(dir, 3)); println(s"GENFOLD post n=$n gens_max=${lists2.map(_.length).max} files=$files2 bytes=$bytes2 rows=$rows2 scan_all_ms=$tAll2 scan_cell_ms=$tCell2 fold_ms=$tFold rows_equal=${rows == rows2}") }

m.unpersist()

System.exit(0)
