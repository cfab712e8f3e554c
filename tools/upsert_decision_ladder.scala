// Upsert-compaction DECISION-pass ladder: the one-exchange groupBy(id)
// form (IvfModel.dirtySlots) vs the previous three-pass form (winners
// agg + supersession join + duplicate agg) on synthetic narrow
// (id, ingest_seq, cell) tables of growing size. The decision reads the
// narrow projection only — this ladder isolates its exchange cost from
// the rewrite that follows (which is identical either way).
//
//   /opt/spark/bin/spark-shell --master 'local[32]' --driver-memory 8g \
//     --conf spark.ui.enabled=false --conf spark.sql.shuffle.partitions=32 \
//     --jars target/scala-2.13/pysparkminhashlshspark_2.13-0.1.0.jar \
//     -I tools/upsert_decision_ladder.scala <<< ":quit"
//
// (8g: the 2.2M-row rung OOMs the shell's default 1g driver heap — the
// local-mode executor pool shares it across 32 task slots.)
//
// NOTE: spark-shell -I compiles statement-by-statement — every val below
// stays a ONE-LINER.
import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.functions._

object DecMeter { @volatile var read = 0L; @volatile var write = 0L; def reset(): Unit = { read = 0L; write = 0L } }

class DecListener extends SparkListener { override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = { val m = sc.stageInfo.taskMetrics; if (m != null) { DecMeter.read += m.shuffleReadMetrics.totalBytesRead; DecMeter.write += m.shuffleWriteMetrics.bytesWritten } } }

spark.sparkContext.addSparkListener(new DecListener)

// narrow table shape: nIds ids, 10% re-ingested once (two versions), a
// 1% replayed duplicate — the continuous-ingest steady state
def mk(nIds: Long): org.apache.spark.sql.DataFrame = { val base = spark.range(nIds).select(col("id"), lit(1L).as("ingest_seq"), pmod(hash(col("id")), lit(256)).cast("int").as("slot")); val re = spark.range(nIds / 10).select(col("id"), lit(2L).as("ingest_seq"), pmod(hash(col("id") + 7), lit(256)).cast("int").as("slot")); val dup = spark.range(nIds / 100).select(col("id"), lit(2L).as("ingest_seq"), pmod(hash(col("id") + 7), lit(256)).cast("int").as("slot")); base.union(re).union(dup).repartition(32).localCheckpoint() }

def oldForm(narrow: org.apache.spark.sql.DataFrame): Set[Int] = { val winners = narrow.groupBy(col("id")).agg(max(col("ingest_seq")).as("__w")); val superseded = narrow.join(winners, Seq("id")).where(col("ingest_seq") < col("__w")).select(col("slot")); val duplicated = narrow.groupBy(col("id"), col("ingest_seq"), col("slot")).count().where(col("count") > 1).select(col("slot")); superseded.union(duplicated).distinct().collect().map(_.getInt(0)).toSet }

// verbatim mirror of IvfModel.dirtySlots (private[graft] — the spec suite
// pins the shipped path; this ladder measures the identical plan)
def newForm(narrow: org.apache.spark.sql.DataFrame): Set[Int] = { val perId = narrow.groupBy(col("id")).agg(max(col("ingest_seq")).as("__w"), collect_list(struct(col("ingest_seq"), col("slot"))).as("__vers")); perId.select(explode(col("__vers")).as("v"), col("__w"), col("__vers")).where(col("v.ingest_seq") < col("__w") || size(filter(col("__vers"), x => x.getField("ingest_seq") === col("v.ingest_seq") && x.getField("slot") === col("v.slot"))) > 1).select(col("v.slot")).distinct().collect().map(_.getInt(0)).toSet }

for (n <- Seq(100000L, 1000000L, 2000000L)) { val t = mk(n); t.count(); DecMeter.reset(); val t0 = System.nanoTime(); val dOld = oldForm(t); val dtOld = (System.nanoTime() - t0) / 1e9; val shufOld = (DecMeter.read / 1e6, DecMeter.write / 1e6); DecMeter.reset(); val t1 = System.nanoTime(); val dNew = newForm(t); val dtNew = (System.nanoTime() - t1) / 1e9; val shufNew = (DecMeter.read / 1e6, DecMeter.write / 1e6); println(f"DECIDE n=$n old=${dtOld}%.2fs read=${shufOld._1}%.1fMB write=${shufOld._2}%.1fMB | new=${dtNew}%.2fs read=${shufNew._1}%.1fMB write=${shufNew._2}%.1fMB | equal=${dOld == dNew}"); t.unpersist() }

System.exit(0)
