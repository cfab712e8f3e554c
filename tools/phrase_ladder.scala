// Phrase-search scale ladder: the claim under test is that
// TextSearch.phraseMatches shuffles ONLY (id, anchor) rows for
// query-token occurrences — document text and non-query tokens never
// leave the scan. Axes:
// (a) corpus replicated 1x/3x/10x with the phrase planted on every 5th
//     doc -> shuffle bytes grow with the planted occurrence count,
//     per-occurrence bytes ~flat;
// (b) at the top rung the PAYLOAD grows 10x (text repeated; planted
//     occurrences unchanged) -> shuffle bytes must NOT move, proving the
//     scan filter drops non-query tokens before any exchange. Run via:
//
//   /opt/spark/bin/spark-shell --master 'local[32]' \
//     --conf spark.ui.enabled=false --conf spark.sql.shuffle.partitions=32 \
//     --jars target/scala-2.13/pysparkminhashlshspark_2.13-0.1.0.jar \
//     -I tools/phrase_ladder.scala <<< ":quit"
//
// NOTE: spark-shell -I compiles statement-by-statement — one-liners only.
import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}

object PMeter { @volatile var read = 0L; @volatile var write = 0L; def reset(): Unit = { read = 0L; write = 0L } }

class PListener extends SparkListener { override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = { val m = sc.stageInfo.taskMetrics; if (m != null) { PMeter.read += m.shuffleReadMetrics.totalBytesRead; PMeter.write += m.shuffleWriteMetrics.bytesWritten } } }

spark.sparkContext.addSparkListener(new PListener)

import org.apache.spark.sql.functions._

val d0 = spark.read.parquet("/root/testdata/sf0.1/documents.parquet").select(col("doc_id"), col("text"))

def planted(mult: Int, fat: Int): org.apache.spark.sql.DataFrame = (0 until mult).map(r => d0.select((col("doc_id") + lit(r.toLong * 10000000L)).as("doc_id"), (if (fat == 1) col("text") else concat_ws(" ", Seq.fill(fat)(col("text")): _*)).as("text"))).reduce(_ unionByName _).select(col("doc_id"), concat(col("text"), when(col("doc_id") % 5 === 2, lit(" zeta alpha beta gamma zeta")).otherwise(lit(""))).as("text"))

def rung(tag: String, mult: Int, fat: Int): Unit = { val in = planted(mult, fat).repartition(32).persist(); val n = in.count(); PMeter.reset(); val t0 = System.nanoTime(); val out = graft.operators.TextSearch.phraseMatches(in, "doc_id", "text", "alpha beta gamma").agg(count(lit(1)).as("hits"), sum(col("n_matches"))).collect()(0); val dt = (System.nanoTime() - t0) / 1e9; println(f"""{"ladder":"$tag","op":"phrase","docs":$n,"hit_docs":${out.getLong(0)},"sec":$dt%.2f,"read_kb":${PMeter.read / 1e3}%.0f,"write_kb":${PMeter.write / 1e3}%.0f}"""); in.unpersist() }

for (mult <- Seq(1, 3, 10)) rung(s"${mult}x", mult, 1)

rung("10x-fat10", 10, 10)

System.exit(0)
