// Dump the physical plan of the inverted-index WRITE frame (the exploded
// posting rows of IndexStore.writeInverted) — the r20 evidence artifact for
// the signature-kernel-in-scan-filter fix. Reproduces indexRows' exact
// expression over a public fit()'s index frame, in BOTH shapes:
//   "filtered"  — with the pre-r20 `where(signature.isNotNull)` (the shape
//                 indexRows/explodedNarrow had through r19)
//   "plain"     — without it (the r20 shape)
// Run with Bench's optimizer rules (InferFiltersFromGenerate excluded) so
// the diff shows OUR filter's pushdown, exactly what the driver's bench ran.
//
//   EXPLAIN_OUT=/root/repo/plans/r20/indexrows_write_before.txt VARIANT=filtered \
//   /opt/spark/bin/spark-shell --master 'local[32]' --driver-memory 8g \
//     --conf spark.ui.enabled=false --conf spark.sql.shuffle.partitions=32 \
//     --conf spark.sql.extensions=graft.plans.GraftExtensions \
//     --conf "spark.sql.optimizer.excludedRules=org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate" \
//     --conf spark.sql.session.timeZone=UTC \
//     --jars target/scala-2.13/pysparkminhashlshspark_2.13-0.1.0.jar \
//     -I tools/explain_indexrows.scala <<< ":quit"
// NOTE: spark-shell -I compiles statement-by-statement — one-liners only.
import org.apache.spark.sql.functions._
val sfDir = sys.env.getOrElse("GATE_SF", "/root/testdata/sf0.1")
val variant = sys.env.getOrElse("VARIANT", "plain")
val out = sys.env("EXPLAIN_OUT")
val cfg = graft.MinHashConfig(numHash = 16, numBands = 4, numRows = 4, bucketHexLen = 2)
val dd = spark.read.parquet(sfDir + "/documents.parquet")
val ix = new graft.operators.MinHashLSH(cfg).fit(dd, "doc_id", "text").indexDf.unpersist().withColumn("ingest_seq", lit(1L))
val base = if (variant == "filtered") ix.where(col("signature").isNotNull) else ix
val frame = base.select(col("id"), col("signature"), explode(col("bucket_ids")).as("bucket"), col("ingest_seq")).withColumn("bkt_pfx", substring(col("bucket"), 1, 1)).repartition(col("bkt_pfx"))
val txt = frame.queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode)
java.nio.file.Files.writeString(java.nio.file.Paths.get(out), s"== inverted-index write frame, variant=$variant (sf=$sfDir) ==\n" + txt)
println(s"EXPLAINED $variant -> $out (${txt.length} chars)")
System.exit(0)
