// Paragraph-dedup scale ladder: replicate sf0.1 1x/3x/10x with
// letter-rotated text (replicas share no natural paragraphs) plus a
// GLOBAL boilerplate paragraph and 10 family paragraphs planted in every
// doc — the planted paragraphs are corpus-wide HOT KEYS (the global one
// reaches mult x 5,000 occurrences at the top rung), the skew surface of
// the first-occurrence decision. Pass criteria: wall and decision-shuffle
// bytes near-linear in the paragraph count; the hot hashes must not
// produce a superlinear rung (the winner min-struct partial-aggregates
// map-side; the loser join emits one row per occurrence — linear by
// construction). Run via:
//
//   /opt/spark/bin/spark-shell --master 'local[32]' \
//     --conf spark.ui.enabled=false --conf spark.sql.shuffle.partitions=32 \
//     --jars target/scala-2.13/pysparkminhashlshspark_2.13-0.1.0.jar \
//     -I tools/para_ladder.scala <<< ":quit"
//
// NOTE: spark-shell -I compiles statement-by-statement — one-liners only.
import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}

object PMeter { @volatile var read = 0L; @volatile var write = 0L; def reset(): Unit = { read = 0L; write = 0L } }

class PListener extends SparkListener { override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = { val m = sc.stageInfo.taskMetrics; if (m != null) { PMeter.read += m.shuffleReadMetrics.totalBytesRead; PMeter.write += m.shuffleWriteMetrics.bytesWritten } } }

spark.sparkContext.addSparkListener(new PListener)

import org.apache.spark.sql.functions._

val alpha = "abcdefghijklmnopqrstuvwxyz"

val base = spark.read.parquet("/root/testdata/sf0.1/documents.parquet").select(col("doc_id"), col("text"))

for (mult <- Seq(1, 3, 10, 30, 60)) { val corpus = (0 until mult).map { r => val to = alpha.drop(r * 7 % 26) + alpha.take(r * 7 % 26); base.select((col("doc_id") + lit(r.toLong * 1000000L)).as("doc_id"), concat(lit("subscribe to our newsletter today\n\n"), lit("family "), (col("doc_id") % 10).cast("string"), lit(" standard terms\n\n"), translate(col("text"), alpha, to)).as("text")) }.reduce(_ unionByName _).repartition(32).persist(); val n = corpus.count(); PMeter.reset(); val t0 = System.nanoTime(); val agg = graft.operators.TextAnalysis.dedupParagraphsGlobal(corpus, "doc_id", "text").agg(count(lit(1)).as("rows"), sum("n_paras").as("p"), sum("n_dropped").as("d")).collect()(0); val dt = (System.nanoTime() - t0) / 1e9; println(f"""{"ladder":$mult,"docs":$n,"op":"para_dedup_global","rows":${agg.getLong(0)},"paras":${agg.getLong(1)},"dropped":${agg.getLong(2)},"sec":$dt%.2f,"read_kb":${PMeter.read / 1e3}%.0f,"write_kb":${PMeter.write / 1e3}%.0f}"""); corpus.unpersist(); graft.SparkUtil.releaseScopedCaches() }

System.exit(0)
