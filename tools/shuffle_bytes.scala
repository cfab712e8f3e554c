// Per-query shuffle-byte instrumentation: run gate queries with a
// SparkListener summing stage-level shuffle read/write, to verify the
// "shuffles carry hashes/ids/scores, never text" claims with numbers.
// Run via:
//
//   /opt/spark/bin/spark-shell --master 'local[32]' \
//     --conf spark.ui.enabled=false --conf spark.sql.shuffle.partitions=32 \
//     --conf spark.sql.extensions=graft.plans.GraftExtensions \
//     --jars target/scala-2.13/pysparkminhashlshspark_2.13-0.1.0.jar \
//     -I tools/shuffle_bytes.scala <<< ":quit"
//
// Set SPARK_GRAFT_SHUF_QUERIES / SPARK_GRAFT_SHUF_SF to override the
// defaults. Prints one "SHUF name rows readMB writeMB" line per query.
// NOTE: spark-shell -I compiles statement-by-statement — every val below
// must stay a ONE-LINER (multi-line chains silently rebind).
import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}

object ShufMeter { @volatile var read = 0L; @volatile var write = 0L; def reset(): Unit = { read = 0L; write = 0L } }

class ShufListener extends SparkListener { override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = { val m = sc.stageInfo.taskMetrics; if (m != null) { ShufMeter.read += m.shuffleReadMetrics.totalBytesRead; ShufMeter.write += m.shuffleWriteMetrics.bytesWritten } } }

spark.sparkContext.addSparkListener(new ShufListener)

val sf = sys.env.getOrElse("SPARK_GRAFT_SHUF_SF", "/root/testdata/sf0.1")

val names = sys.env.get("SPARK_GRAFT_SHUF_QUERIES").map(_.split(',').toSeq).getOrElse(Seq("text_gopher_rules", "text_char_entropy", "text_dsir_weights", "text_bigram_backoff", "text_unigram_logprob", "dedup_cluster_best", "dedup_exact_keep"))

for (q <- names) { ShufMeter.reset(); val n = graft.SparkEntry.queries(q)(spark, sf).count(); Thread.sleep(1000); println(f"SHUF $q rows=$n read=${ShufMeter.read / 1e3}%.0f KB write=${ShufMeter.write / 1e3}%.0f KB"); graft.SparkUtil.releaseScopedCaches() }

System.exit(0)
