// Time each protocol step of ann_index_relayout separately (r20 task 1).
//   /opt/spark/bin/spark-shell --master 'local[32]' ... -I tools/relayout_steps.scala <<< ":quit"
// NOTE: spark-shell -I compiles statement-by-statement — one-liners only.
import org.apache.spark.sql.functions._
import graft._, graft.sources._, graft.operators._
val sfDir = sys.env.getOrElse("GATE_SF", "/root/testdata/sf0.1")
val warm = spark.read.parquet(sfDir + "/region.parquet").write.format("noop").mode("overwrite").save()
def step[T](tag: String)(body: => T): T = { val t0 = System.nanoTime(); val r = body; println(f"STEP $tag ${(System.nanoTime() - t0) / 1e9}%.2f s"); r }
val cfg16 = MinHashConfig(numHash = 16, numBands = 4, numRows = 4, bucketHexLen = 2)
val table = "graft_r20_relayout_probe"
step("reset") { Seq(table, table + "__compact_stage_tbl").foreach(IndexStore.reset(spark, _)) }
val dd = spark.read.parquet(sfDir + "/documents.parquet").select(col("doc_id").cast("long").as("id"), col("text").as("text"))
def feat(df: org.apache.spark.sql.DataFrame, seq: Int) = new MinHashLSH(cfg16).featurize(df, "id", "text", None).select(col("id"), col("signature"), col("bucket_ids")).withColumn("ingest_seq", lit(seq.toLong))
val prelim = dd.select(col("id"), when(col("id") % 5 === 0, concat(lit("preliminary draft "), col("text"))).otherwise(col("text")).as("text"))
step("saveInverted") { IndexStore.saveInverted(feat(prelim, 1), table, prefixLen = 1) }
step("appendInverted") { IndexStore.appendInverted(feat(dd.where(col("id") % 5 === 0), 2), table) }
step("appendTombstones") { IndexStore.appendTombstones(spark, table, dd.where(col("id") === 82L).select(col("id")), seq = 2L) }
step("relayoutInverted") { IndexStore.relayoutInverted(spark, table, IndexStore.invertedMeta(spark, table).copy(prefixLen = 2, numBuckets = 16)) }
step("appendInverted2") { IndexStore.appendInverted(feat(dd.where(col("id") % 7 === 3), 3), table) }
step("compactInverted") { IndexStore.compactInverted(spark, table) }
val key = dd.where(col("id") === 42L).select(col("text")).collect()(0).getString(0)
step("serve") { MinHashLSH.annFromInvertedIndex(spark, table, spark.read.parquet(sfDir + "/documents.parquet"), "doc_id", "text", key, 10, cfg16).write.format("noop").mode("overwrite").save() }
System.exit(0)
