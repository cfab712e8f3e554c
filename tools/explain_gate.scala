// Dump `.explain("formatted")` of one SparkEntry gate to EXPLAIN_OUT
// (round-19 deliverable: plans/r19/<query>_{before,after}.txt).
//
//   GATE=dedup_video_phash EXPLAIN_OUT=/root/repo/plans/r19/x.txt \
//   /opt/spark/bin/spark-shell --master 'local[32]' --driver-memory 8g \
//     --conf spark.ui.enabled=false --conf spark.sql.shuffle.partitions=32 \
//     --conf spark.sql.extensions=graft.plans.GraftExtensions \
//     --conf spark.sql.session.timeZone=UTC \
//     --jars /root/repo/target/scala-2.13/pysparkminhashlshspark_2.13-0.1.0.jar \
//     -I /root/repo/tools/explain_gate.scala <<< ":quit"
//
// NOTE: spark-shell -I compiles statement-by-statement — one-liners only.
val gate = sys.env("GATE")
val sfDir = sys.env.getOrElse("GATE_SF", "/root/testdata/sf0.1")
val out = sys.env("EXPLAIN_OUT")
val df = graft.SparkEntry.queries(gate)(spark, sfDir)
val txt = df.queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode)
java.nio.file.Files.writeString(java.nio.file.Paths.get(out), s"== $gate (sf=$sfDir) ==\n" + txt)
println(s"EXPLAINED $gate -> $out (${txt.length} chars)")
System.exit(0)
