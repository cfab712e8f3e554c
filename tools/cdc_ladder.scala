// CDC-apply scale ladder: the claim under test is that Cdc.applyChanges
// never shuffles the BASE snapshot — decision traffic is proportional to
// the change feed alone. Two axes: (a) base replicated 1x/3x/10x/30x with
// a FIXED feed -> shuffle bytes must stay ~flat while wall grows with the
// base scan; (b) at the top base rung the feed grows 10x -> shuffle bytes
// must grow with it (proving the flat readings measure the feed, not a
// constant floor). A HOT KEY is planted every rung: 100,000 stacked
// updates on o_orderkey=3 (the skew surface of the per-key max_by) —
// partial aggregation must collapse it map-side, never a superlinear
// rung. Run via:
//
//   /opt/spark/bin/spark-shell --master 'local[32]' \
//     --conf spark.ui.enabled=false --conf spark.sql.shuffle.partitions=32 \
//     --jars target/scala-2.13/pysparkminhashlshspark_2.13-0.1.0.jar \
//     -I tools/cdc_ladder.scala <<< ":quit"
//
// NOTE: spark-shell -I compiles statement-by-statement — one-liners only.
import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}

object CMeter { @volatile var read = 0L; @volatile var write = 0L; def reset(): Unit = { read = 0L; write = 0L } }

class CListener extends SparkListener { override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = { val m = sc.stageInfo.taskMetrics; if (m != null) { CMeter.read += m.shuffleReadMetrics.totalBytesRead; CMeter.write += m.shuffleWriteMetrics.bytesWritten } } }

spark.sparkContext.addSparkListener(new CListener)

import org.apache.spark.sql.functions._

val o0 = spark.read.parquet("/root/testdata/sf0.1/orders.parquet").select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"), col("o_totalprice"))

// fixed feed built from replica-0 keys: updates/deletes/inserts + the hot key
def feed(fmult: Int): org.apache.spark.sql.DataFrame = { val u = o0.where(col("o_orderkey") % 10 === 0).crossJoin(spark.range(fmult).select(col("id").as("rep"))).select(col("o_orderkey"), (col("rep") + 1).as("seq"), lit("U").as("op"), col("o_custkey"), lit("U1").as("o_orderstatus"), (col("o_totalprice") + 1.5).as("o_totalprice")); val dl = o0.where(col("o_orderkey") % 7 === 3).select(col("o_orderkey"), lit(1000000L).as("seq"), lit("D").as("op"), col("o_custkey"), col("o_orderstatus"), col("o_totalprice")); val ins = o0.where(col("o_orderkey") % 13 === 1).select((col("o_orderkey") + 1000000000000L).as("o_orderkey"), lit(1L).as("seq"), lit("I").as("op"), col("o_custkey"), col("o_orderstatus"), col("o_totalprice")); val hot = spark.range(100000).select(lit(3L).as("o_orderkey"), (col("id") + 1).as("seq"), lit("U").as("op"), lit(7L).as("o_custkey"), lit("HOT").as("o_orderstatus"), lit(1.0).as("o_totalprice")); u.unionByName(dl).unionByName(ins).unionByName(hot) }

for (mult <- Seq(1, 3, 10, 30)) { val base = (0 until mult).map(r => o0.select((col("o_orderkey") + lit(r.toLong * 10000000L)).as("o_orderkey"), col("o_custkey"), col("o_orderstatus"), col("o_totalprice"))).reduce(_ unionByName _).repartition(32).persist(); val nb = base.count(); val f = feed(1).repartition(32).persist(); val nf = f.count(); CMeter.reset(); val t0 = System.nanoTime(); val out = graft.operators.Cdc.applyChanges(base, f, "o_orderkey", "seq", "op").agg(count(lit(1)).as("rows"), sum(col("o_totalprice"))).collect()(0); val dt = (System.nanoTime() - t0) / 1e9; println(f"""{"ladder":$mult,"op":"cdc_apply","base":$nb,"feed":$nf,"rows":${out.getLong(0)},"sec":$dt%.2f,"read_kb":${CMeter.read / 1e3}%.0f,"write_kb":${CMeter.write / 1e3}%.0f}"""); base.unpersist(); f.unpersist() }

// axis (b): top base rung, feed x10 — decision bytes must now grow
val base30 = (0 until 30).map(r => o0.select((col("o_orderkey") + lit(r.toLong * 10000000L)).as("o_orderkey"), col("o_custkey"), col("o_orderstatus"), col("o_totalprice"))).reduce(_ unionByName _).repartition(32).persist()

val nb30 = base30.count()

val f10 = feed(10).repartition(32).persist()

val nf10 = f10.count()

CMeter.reset()

val t0b = System.nanoTime()

val outb = graft.operators.Cdc.applyChanges(base30, f10, "o_orderkey", "seq", "op").agg(count(lit(1)).as("rows"), sum(col("o_totalprice"))).collect()(0)

val dtb = (System.nanoTime() - t0b) / 1e9

println(f"""{"ladder":"30x-feed10x","op":"cdc_apply","base":$nb30,"feed":$nf10,"rows":${outb.getLong(0)},"sec":$dtb%.2f,"read_kb":${CMeter.read / 1e3}%.0f,"write_kb":${CMeter.write / 1e3}%.0f}""")

System.exit(0)
