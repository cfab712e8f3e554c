// Round-9 regression adjudication: controlled min-of-N timing + per-query
// shuffle bytes for a named query list, in a Bench-identical session.
// Run via:
//
//   /opt/spark/bin/spark-shell --master 'local[32]' \
//     --conf spark.ui.enabled=false --conf spark.sql.shuffle.partitions=32 \
//     --conf spark.sql.adaptive.enabled=true \
//     --conf spark.sql.session.timeZone=UTC \
//     --conf spark.sql.extensions=graft.plans.GraftExtensions \
//     --conf 'spark.sql.optimizer.excludedRules=org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate' \
//     --jars target/scala-2.13/pysparkminhashlshspark_2.13-0.1.0.jar \
//     -I tools/adjudicate.scala <<< ":quit"
//
// SPARK_GRAFT_ADJ_QUERIES (comma list), SPARK_GRAFT_ADJ_SF, SPARK_GRAFT_ADJ_REPS
// override defaults. Prints "ADJ name rows min-of-N [times...] readKB writeKB"
// where the byte columns are PER-RUN (accumulated across the timed reps'
// stages — including their cache sweeps and noop writes — then divided by
// reps, so they are comparable to the min-of-N time beside them).
// NOTE: spark-shell -I compiles statement-by-statement — one-liners only.
import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}

object AdjMeter { @volatile var read = 0L; @volatile var write = 0L; def reset(): Unit = { read = 0L; write = 0L } }

class AdjListener extends SparkListener { override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = { val m = sc.stageInfo.taskMetrics; if (m != null) { AdjMeter.read += m.shuffleReadMetrics.totalBytesRead; AdjMeter.write += m.shuffleWriteMetrics.bytesWritten } } }

spark.sparkContext.addSparkListener(new AdjListener)

val sf = sys.env.getOrElse("SPARK_GRAFT_ADJ_SF", "/root/testdata/sf0.1")

val reps = sys.env.get("SPARK_GRAFT_ADJ_REPS").flatMap(_.toIntOption).getOrElse(3)

val names = sys.env.get("SPARK_GRAFT_ADJ_QUERIES").map(_.split(',').toSeq).getOrElse(Seq("text_chunk", "text_dedup_within", "text_langid", "text_bm25_scores", "src_text_scan", "split_leakage_safe"))

// warm-up identical to Bench: tiny scan + tokenize->shingle->hash pipeline
spark.read.parquet(sf + "/region.parquet").write.format("noop").mode("overwrite").save()

def sweep(): Unit = { graft.SparkUtil.releaseScopedCaches(); spark.catalog.clearCache(); spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true)) }

def once(q: String): Double = { val t0 = System.nanoTime(); graft.SparkEntry.queries(q)(spark, sf).write.format("noop").mode("overwrite").save(); val dt = (System.nanoTime() - t0) / 1e9; sweep(); dt }

for (q <- names) { val warm = once(q); AdjMeter.reset(); val times = (1 to reps).map(_ => once(q)); println(f"ADJ $q warm=$warm%.3f min=${times.min}%.3f all=${times.map(t => f"$t%.3f").mkString(",")} read=${AdjMeter.read / 1e3 / reps}%.0f KB write=${AdjMeter.write / 1e3 / reps}%.0f KB") }

System.exit(0)
