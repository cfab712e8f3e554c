// Per-job profile of one SparkEntry gate (round-19 optimization round):
// runs GATE (env) against GATE_SF (env, default sf0.1) with a listener
// that records each Spark job's wall-clock, task count and description,
// then prints the top jobs plus the covered-vs-gap split. The GAP is
// driver-side work — planning, fence point-reads, file listing, commit
// protocol — the part the stage timeline never shows (guide §7.3).
//
//   GATE=ann_index_fresh /opt/spark/bin/spark-shell --master 'local[32]' \
//     --driver-memory 8g \
//     --conf spark.ui.enabled=false --conf spark.sql.shuffle.partitions=32 \
//     --conf spark.sql.extensions=graft.plans.GraftExtensions \
//     --conf spark.sql.session.timeZone=UTC \
//     --jars /root/repo/target/scala-2.13/pysparkminhashlshspark_2.13-0.1.0.jar \
//     -I /root/repo/tools/profile_gate.scala <<< ":quit"
//
// NOTE: spark-shell -I compiles statement-by-statement — one-liners only.
import org.apache.spark.scheduler._
import scala.collection.mutable
class JobProf extends SparkListener { val jobs = mutable.ArrayBuffer[(Int, Long, Long, String, Int)](); val starts = mutable.Map[Int, (Long, String, Int)](); override def onJobStart(j: SparkListenerJobStart): Unit = starts.synchronized { starts(j.jobId) = (System.nanoTime(), Option(j.properties.getProperty("spark.job.description")).getOrElse(""), j.stageInfos.map(_.numTasks).sum) }; override def onJobEnd(j: SparkListenerJobEnd): Unit = starts.synchronized { val (t0, d, nt) = starts(j.jobId); jobs += ((j.jobId, t0, System.nanoTime(), d, nt)) } }
val prof = new JobProf
spark.sparkContext.addSparkListener(prof)
val gate = sys.env.getOrElse("GATE", "ann_index_fresh")
val sfDir = sys.env.getOrElse("GATE_SF", "/root/testdata/sf0.1")
val warm = spark.read.parquet(sfDir + "/region.parquet").write.format("noop").mode("overwrite").save()
val t0 = System.nanoTime()
graft.SparkEntry.queries(gate)(spark, sfDir).write.format("noop").mode("overwrite").save()
val wall = (System.nanoTime() - t0) / 1e9
Thread.sleep(300)
val bench = prof.jobs.filter(_._2 >= t0)
val covered = bench.map(j => (j._3 - j._2) / 1e9).sum
println(f"GATE $gate wall $wall%.2f s covered $covered%.2f s jobs ${bench.size} gap ${wall - covered}%.2f s")
bench.sortBy(j => -(j._3 - j._2)).take(30).foreach(j => println(f"  job ${j._1}%4d ${(j._3 - j._2) / 1e9}%8.3f s tasks ${j._5}%5d  ${j._4.take(110)}"))
