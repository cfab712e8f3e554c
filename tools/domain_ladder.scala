// Per-domain-cap scale ladder: the claim under test is that
// TextAnalysis.capPerDomain's RANK exchange carries only (id, host,
// score) decision rows, with a planted HOT HOST holding 20% of every
// rung (the window-skew surface: row_number cannot partial-aggregate, so
// one reducer walks the hot host's rows — cost must stay linear and
// bytes decision-sized, never a superlinear rung). Axes:
// (a) corpus replicated 1x/3x/10x -> per-doc shuffle bytes ~flat;
// (b) at the top rung the payload grows 10x (text repeated) -> this
//     PROBES THE DOCUMENTED REGIME TRANSITION: AQE's size estimate for
//     the loser subtree scales with input width, so the unhinted
//     anti-join degrades broadcast -> SMJ and the base crosses exactly
//     ONE compressed id-keyed exchange (the dropExactDuplicates loser
//     convention); the rank exchange must stay decision-sized even here
//     (plan-probed: hashpartitioning(__cd_host) carries __cd_* only).
// Run via:
//
//   /opt/spark/bin/spark-shell --master 'local[32]' \
//     --conf spark.ui.enabled=false --conf spark.sql.shuffle.partitions=32 \
//     --jars target/scala-2.13/pysparkminhashlshspark_2.13-0.1.0.jar \
//     -I tools/domain_ladder.scala <<< ":quit"
//
// NOTE: spark-shell -I compiles statement-by-statement — one-liners only.
import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}

object DMeter { @volatile var read = 0L; @volatile var write = 0L; def reset(): Unit = { read = 0L; write = 0L } }

class DListener extends SparkListener { override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = { val m = sc.stageInfo.taskMetrics; if (m != null) { DMeter.read += m.shuffleReadMetrics.totalBytesRead; DMeter.write += m.shuffleWriteMetrics.bytesWritten } } }

spark.sparkContext.addSparkListener(new DListener)

import org.apache.spark.sql.functions._

val d0 = spark.read.parquet("/root/testdata/sf0.1/documents.parquet").select(col("doc_id"), col("text"))

def planted(mult: Int, fat: Int): org.apache.spark.sql.DataFrame = (0 until mult).map(r => d0.select((col("doc_id") + lit(r.toLong * 10000000L)).as("doc_id"), (if (fat == 1) col("text") else concat_ws(" ", Seq.fill(fat)(col("text")): _*)).as("text"))).reduce(_ unionByName _).select(col("doc_id"), col("text"), when(col("doc_id") % 5 === 0, lit("https://hot.example/x")).otherwise(concat(lit("https://h"), (col("doc_id") % 1000).cast("string"), lit(".example/p"))).as("url"), length(col("text")).cast("double").as("score"))

def rung(tag: String, mult: Int, fat: Int): Unit = { val in = planted(mult, fat).repartition(32).persist(); val n = in.count(); DMeter.reset(); val t0 = System.nanoTime(); val out = graft.operators.TextAnalysis.capPerDomain(in, "doc_id", "url", "score", 25).agg(count(lit(1)).as("kept"), sum(length(col("text")))).collect()(0); val dt = (System.nanoTime() - t0) / 1e9; println(f"""{"ladder":"$tag","op":"domain_cap","docs":$n,"kept":${out.getLong(0)},"sec":$dt%.2f,"read_kb":${DMeter.read / 1e3}%.0f,"write_kb":${DMeter.write / 1e3}%.0f,"b_per_doc":${DMeter.read * 1.0 / n}%.1f}"""); in.unpersist() }

for (mult <- Seq(1, 3, 10)) rung(s"${mult}x", mult, 1)

rung("10x-fat10", 10, 10)

System.exit(0)
