// CDC small-feed ladder — the INVERSE rung of tools/cdc_ladder.scala:
// there the feed was held constant while the base grew (shuffle must stay
// flat); here the BASE is held at its top rung (sf0.1 orders x10, 1.5M
// rows) while the feed shrinks 15000 → 1500 → 150 → 15 rows. The claim
// pinned at this extreme: the Bloom-pruned merge's decision traffic
// tracks the FEED all the way down — a 15-row takedown against a 1.5M-row
// base must shuffle kilobytes, not the base. Together the two ladders pin
// "cost tracks the delta" at both ends.
//
//   /opt/spark/bin/spark-shell --master 'local[32]' \
//     --conf spark.ui.enabled=false --conf spark.sql.shuffle.partitions=32 \
//     --jars target/scala-2.13/pysparkminhashlshspark_2.13-0.1.0.jar \
//     -I tools/cdc_smallfeed_ladder.scala <<< ":quit"
//
// NOTE: spark-shell -I compiles statement-by-statement — one-liners only.
import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}

object SMeter { @volatile var read = 0L; @volatile var write = 0L; def reset(): Unit = { read = 0L; write = 0L } }

class SListener extends SparkListener { override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = { val m = sc.stageInfo.taskMetrics; if (m != null) { SMeter.read += m.shuffleReadMetrics.totalBytesRead; SMeter.write += m.shuffleWriteMetrics.bytesWritten } } }

spark.sparkContext.addSparkListener(new SListener)

import org.apache.spark.sql.functions._

val o0 = spark.read.parquet("/root/testdata/sf0.1/orders.parquet").select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"), col("o_totalprice"))

val base = (0 until 10).map(r => o0.select((col("o_orderkey") + lit(r.toLong * 10000000L)).as("o_orderkey"), col("o_custkey"), col("o_orderstatus"), col("o_totalprice"))).reduce(_ unionByName _).repartition(32).persist()

val nb = base.count()

// a feed of n rows: n/3 updates, n/3 deletes, n/3 inserts off replica 0
def feed(n: Int): org.apache.spark.sql.DataFrame = { val k = o0.orderBy("o_orderkey").limit(n).repartition(4).persist(); val third = greatest(lit(1), lit(n / 3)); val u = k.where(col("o_orderkey") % 3 === 0).select(col("o_orderkey"), lit(2L).as("seq"), lit("U").as("op"), col("o_custkey"), lit("U1").as("o_orderstatus"), (col("o_totalprice") + 1.5).as("o_totalprice")); val dl = k.where(col("o_orderkey") % 3 === 1).select(col("o_orderkey"), lit(2L).as("seq"), lit("D").as("op"), col("o_custkey"), col("o_orderstatus"), col("o_totalprice")); val ins = k.where(col("o_orderkey") % 3 === 2).select((col("o_orderkey") + 1000000000000L).as("o_orderkey"), lit(1L).as("seq"), lit("I").as("op"), col("o_custkey"), col("o_orderstatus"), col("o_totalprice")); u.unionByName(dl).unionByName(ins) }

for (n <- Seq(15000, 1500, 150, 15)) { val f = feed(n).localCheckpoint(); val nf = f.count(); SMeter.reset(); val t0 = System.nanoTime(); val out = graft.operators.Cdc.applyChanges(base, f, "o_orderkey", "seq", "op").agg(count(lit(1)).as("rows"), sum(col("o_totalprice"))).collect()(0); val dt = (System.nanoTime() - t0) / 1e9; println(f"""{"ladder":"smallfeed","op":"cdc_apply","base":$nb,"feed":$nf,"rows":${out.getLong(0)},"sec":$dt%.2f,"read_kb":${SMeter.read / 1e3}%.0f,"write_kb":${SMeter.write / 1e3}%.0f}""") }

System.exit(0)
