// Hilbert-vs-Z-order layout ladder (round-12 verdict task 7): REAL parquet
// files under three clustering layouts (hilbert curve, z-order curve,
// linear-x baseline) at two scales, then for a fixed set of range
// predicates count the files a min/max-pruning reader would skip and the
// bytes it would read. Skipping decision = the standard per-file
// (min,max)-box intersection test — exactly what Delta/Iceberg data
// skipping and parquet row-group pruning evaluate; file stats come from
// the WRITTEN files themselves (input_file_name group-by), byte sizes
// from the filesystem. Run via:
//
//   /opt/spark/bin/spark-shell --master 'local[32]' \
//     --conf spark.ui.enabled=false --conf spark.sql.shuffle.partitions=32 \
//     --jars target/scala-2.13/pysparkminhashlshspark_2.13-0.1.0.jar \
//     -I tools/hilbert_ladder.scala <<< ":quit"
//
// Prints one JSON line per (scale, layout, predicate). NOTE: spark-shell
// -I compiles statement-by-statement — every val below stays a ONE-LINER.
import org.apache.spark.sql.functions._

// deterministic pseudo-uniform keys in [0, 1024)^2 (10 bits; Weyl-style
// multipliers — no Math.random, ladder is replayable)
def plant(n: Long) = spark.range(n).select(col("id"), pmod(col("id") * 2654435761L, lit(1024L)).as("x"), pmod(col("id") * 40503L + 17L, lit(1024L)).as("y"))

def writeLayout(df: org.apache.spark.sql.DataFrame, layout: String, dir: String, files: Int) = { val out = layout match { case "hilbert" => graft.operators.Layout.withHilbertIndex(df, col("x"), col("y"), 10, "__h").repartitionByRange(files, col("__h")).sortWithinPartitions("__h").drop("__h"); case "zorder" => graft.operators.Layout.zOrderBy(df, "x", "y", 10, files); case "linear" => df.repartitionByRange(files, col("x")).sortWithinPartitions("x") }; out.write.mode("overwrite").parquet(dir) }

// per-file (min,max) boxes + on-disk byte size — the reader's skipping input
def fileStats(dir: String) = { val sizes = new java.io.File(dir).listFiles.filter(f => f.getName.endsWith(".parquet")).map(f => (f.getName, f.length)).toMap; spark.read.parquet(dir).withColumn("f", regexp_extract(input_file_name(), "[^/]+$", 0)).groupBy("f").agg(min("x").as("x0"), max("x").as("x1"), min("y").as("y0"), max("y").as("y1"), count(lit(1)).as("rows")).collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), sizes(r.getString(0)))) }

// predicate boxes: two single-key slices (the clustered key and the OTHER
// key — the case linear layouts lose) and two squares
val preds = Seq(("x_slice", 0L, 63L, 0L, 1023L), ("y_slice", 0L, 1023L, 0L, 63L), ("sq64", 256L, 319L, 512L, 575L), ("sq128", 640L, 767L, 128L, 255L))

for (n <- Seq(1000000L, 10000000L)) { val base = plant(n).persist(); base.count(); for (layout <- Seq("hilbert", "zorder", "linear")) { val dir = s"/tmp/graft_hilbert_ladder/n$n/$layout"; writeLayout(base, layout, dir, 64); val st = fileStats(dir); val totalBytes = st.map(_._6).sum; for ((pn, xa, xb, ya, yb) <- preds) { val hit = st.filter { case (_, x0, x1, y0, y1, _) => !(x1 < xa || x0 > xb || y1 < ya || y0 > yb) }; println(f"""{"ladder":"hilbert","n":$n,"layout":"$layout","pred":"$pn","files_total":${st.length},"files_read":${hit.length},"files_skipped":${st.length - hit.length},"bytes_read_mb":${hit.map(_._6).sum / 1e6}%.2f,"bytes_total_mb":${totalBytes / 1e6}%.2f,"rows_read":${hit.map(_._5).sum}}""") } }; base.unpersist() }

System.exit(0)
