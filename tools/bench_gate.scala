// Bench one or more SparkEntry gates with the Bench.scala methodology
// (noop sink, min of REPS, cache sweep between reps) but HONORING the
// session confs given on the spark-shell command line — the conf A/B
// harness of the round-19 optimization work (Bench.scala pins its own
// confs, so config experiments need this shim).
//
//   GATES=ann_index_relayout,ann_snapshot_batch REPS=2 \
//   /opt/spark/bin/spark-shell --master 'local[32]' --driver-memory 24g \
//     --conf spark.ui.enabled=false --conf spark.sql.shuffle.partitions=32 \
//     --conf spark.sql.adaptive.enabled=true \
//     --conf spark.sql.extensions=graft.plans.GraftExtensions \
//     --conf spark.sql.session.timeZone=UTC \
//     --jars /root/repo/target/scala-2.13/pysparkminhashlshspark_2.13-0.1.0.jar \
//     -I /root/repo/tools/bench_gate.scala <<< ":quit"
//
// NOTE: spark-shell -I compiles statement-by-statement — one-liners only.
val confAlign = spark.conf.set("spark.sql.optimizer.excludedRules", "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate")
val sfDir = sys.env.getOrElse("GATE_SF", "/root/testdata/sf0.1")
val gates = sys.env("GATES").split(",").map(_.trim).filter(_.nonEmpty)
val reps = sys.env.getOrElse("REPS", "1").toInt
val warm = spark.read.parquet(sfDir + "/region.parquet").write.format("noop").mode("overwrite").save()
val warm2 = { import org.apache.spark.sql.functions._; spark.read.parquet(sfDir + "/documents.parquet").limit(64).select(graft.functions.TextFunctions.tokenize(col("text")).as("tokens")).select(explode(graft.functions.TextFunctions.kShingles(col("tokens"), 2)).as("shingle")).groupBy("shingle").count().select(graft.functions.HashFunctions.md5Hash(lit(0), col("shingle")).as("h")).write.format("noop").mode("overwrite").save() }
val results = gates.map { g => var best = Double.MaxValue; (1 to reps).foreach { _ => val t0 = System.nanoTime(); graft.SparkEntry.queries(g)(spark, sfDir).write.format("noop").mode("overwrite").save(); val dt = (System.nanoTime() - t0) / 1e9; graft.SparkUtil.releaseScopedCaches(); spark.catalog.clearCache(); spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true)); if (dt < best) best = dt }; println(f"BENCHGATE $g $best%.3f s"); (g, best) }
println("BENCHGATE_TOTAL " + f"${results.map(_._2).sum}%.3f s")
System.exit(0)
