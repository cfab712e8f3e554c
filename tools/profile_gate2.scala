// Gate profiler v2 (round-19): runs GATE twice (second run ≈ bench rep
// after warm-ups), samples the DRIVER main thread every 25 ms during the
// run, and histograms where the driver spends its time — attributing the
// job-gap (planning, listing, commit, fence I/O) that profile_gate.scala
// exposed but could not name (guide §7.3: driver thread dumps).
//
//   GATE=ann_index_relayout /opt/spark/bin/spark-shell --master 'local[32]' \
//     --driver-memory 8g \
//     --conf spark.ui.enabled=false --conf spark.sql.shuffle.partitions=32 \
//     --conf spark.sql.extensions=graft.plans.GraftExtensions \
//     --conf spark.sql.session.timeZone=UTC \
//     --jars /root/repo/target/scala-2.13/pysparkminhashlshspark_2.13-0.1.0.jar \
//     -I /root/repo/tools/profile_gate2.scala <<< ":quit"
//
// NOTE: spark-shell -I compiles statement-by-statement — one-liners only.
import scala.collection.mutable
val gate = sys.env.getOrElse("GATE", "ann_index_relayout")
val sfDir = sys.env.getOrElse("GATE_SF", "/root/testdata/sf0.1")
val mainThread = Thread.currentThread()
class Sampler(t: Thread) extends Thread { @volatile var on = true; val counts = mutable.Map[String, Int]().withDefaultValue(0); setDaemon(true); override def run(): Unit = { while (on) { val st = t.getStackTrace; val own = st.find(f => f.getClassName.startsWith("graft.")).map(f => "graft " + f.getClassName.split("\\.").last + "." + f.getMethodName); val spark = st.find(f => { val c = f.getClassName; c.contains("InMemoryFileIndex") || c.contains("HadoopFSUtils") || c.contains("FileFormatWriter") || c.contains("ParquetUtils") || c.contains("CodeGenerator") || c.contains("QueryExecution") || c.contains("RuleExecutor") || c.contains("SparkPlan") || c.contains("DataSource") || c.contains("FileSourceStrategy") || c.contains("CacheManager") || c.contains("HadoopMapReduceCommitProtocol") || c.contains("FileCommitProtocol") || c.contains("RawLocalFileSystem") || c.contains("ChecksumFileSystem") || c.contains("DAGScheduler") || c.contains("ClosureCleaner") }).map(f => "SPARK " + f.getClassName.split("\\.").last + "." + f.getMethodName); val key = (own, spark) match { case (Some(g), Some(s)) => s + "  <=  " + g; case (Some(g), None) => g; case (None, Some(s)) => s; case _ => if (st.exists(f => f.getClassName.contains("DAGScheduler") || f.getMethodName == "awaitResult" || f.getMethodName == "runJob")) "WAITING-ON-JOB" else st.headOption.map(f => "other " + f.getClassName.split("\\.").last + "." + f.getMethodName).getOrElse("?") }; counts.synchronized { counts(key) += 1 }; Thread.sleep(25) } } }
def runOnce(tag: String): Double = { val smp = new Sampler(mainThread); smp.start(); val t0 = System.nanoTime(); graft.SparkEntry.queries(gate)(spark, sfDir).write.format("noop").mode("overwrite").save(); val dt = (System.nanoTime() - t0) / 1e9; smp.on = false; Thread.sleep(60); println(f"== $tag $gate wall $dt%.2f s =="); smp.counts.toSeq.sortBy(-_._2).take(25).foreach { case (k, n) => println(f"  ${n * 0.025}%7.2f s  $k") }; graft.SparkUtil.releaseScopedCaches(); spark.catalog.clearCache(); spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true)); dt }
val w1 = spark.read.parquet(sfDir + "/region.parquet").write.format("noop").mode("overwrite").save()
val r1 = runOnce("run1")
val r2 = runOnce("run2")
println(f"GATE2 $gate run1 $r1%.2f run2 $r2%.2f")
