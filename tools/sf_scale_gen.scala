// sf1 corpus generator (round-12 verdict task 1): replicate the sf0.1
// tables 10x with PER-REPLICA DECORRELATION so workloads scale the way a
// real 10x corpus does — linearly — instead of exploding quadratically
// from cross-replica duplicate clusters:
//   documents:  doc_id shifts by rep*N; every token gains an "x<rep>"
//               suffix (rep 0 unchanged) — near-dup/phrase/LM structure
//               is preserved WITHIN a replica, disjoint ACROSS replicas;
//               n_chars recomputed.
//   embeddings: vec_id shifts; dims rotate by rep*7 with alternating sign
//               flips — an ORTHOGONAL transform, so within-replica cosines
//               are bit-preserved while cross-replica cosines decorrelate.
//   orders:     o_orderkey / o_custkey shift by rep*(max+1).
//   customer:   c_custkey shifts; c_name gains an "x<rep>" suffix.
//   region:     copied (Bench warm-up input).
// Run via:
//   /opt/spark/bin/spark-shell --master 'local[32]' \
//     --conf spark.ui.enabled=false --conf spark.sql.shuffle.partitions=32 \
//     --jars target/scala-2.13/pysparkminhashlshspark_2.13-0.1.0.jar \
//     -I tools/sf_scale_gen.scala <<< ":quit"
import org.apache.spark.sql.functions._

val src = "/root/testdata/sf0.1"
val out = "/tmp/graft_sf1"
val reps = 10

val docs = spark.read.parquet(s"$src/documents.parquet")
val nDocs = docs.count()
val docReps = (0 until reps).map { r =>
  docs.select((col("doc_id") + lit(r.toLong * nDocs)).as("doc_id"),
    (if (r == 0) col("text")
     else regexp_replace(col("text"), "([A-Za-z0-9_]+)", s"$$1x$r")).as("text"),
    col("lang"), col("source"))
}
docReps.reduce(_ unionAll _)
  .select(col("doc_id"), col("text"), col("lang"), col("source"),
    length(col("text")).cast("int").as("n_chars"))
  .repartition(32).write.mode("overwrite").parquet(s"$out/documents.parquet")
println(s"GEN documents: ${nDocs * reps}")

val emb = spark.read.parquet(s"$src/embeddings.parquet")
val nVec = emb.count()
val embReps = (0 until reps).map { r =>
  emb.select((col("vec_id") + lit(r.toLong * nVec)).as("vec_id"),
    expr(s"""transform(sequence(0, 63), j ->
      element_at(embedding, CAST((j + $r * 7) % 64 AS INT) + 1) *
      CAST(CASE WHEN (j + $r) % 2 = 0 THEN 1.0 ELSE -1.0 END AS FLOAT))""")
      .cast("array<float>").as("embedding"),
    col("label"))
}
embReps.reduce(_ unionAll _)
  .repartition(32).write.mode("overwrite").parquet(s"$out/embeddings.parquet")
println(s"GEN embeddings: ${nVec * reps}")

val orders = spark.read.parquet(s"$src/orders.parquet")
val maxOk = orders.agg(max("o_orderkey")).head.getLong(0) + 1
val maxCk = orders.agg(max("o_custkey")).head.getLong(0) + 1
(0 until reps).map { r =>
  orders.select((col("o_orderkey") + lit(r * maxOk)).as("o_orderkey"),
    (col("o_custkey") + lit(r * maxCk)).as("o_custkey"),
    col("o_orderstatus"), col("o_totalprice"), col("o_orderdate"),
    col("o_orderpriority"))
}.reduce(_ unionAll _)
  .repartition(32).write.mode("overwrite").parquet(s"$out/orders.parquet")
println("GEN orders done")

val cust = spark.read.parquet(s"$src/customer.parquet")
(0 until reps).map { r =>
  cust.select((col("c_custkey") + lit(r * maxCk)).as("c_custkey"),
    (if (r == 0) col("c_name")
     else concat(col("c_name"), lit(s"x$r"))).as("c_name"),
    col("c_nationkey"), col("c_acctbal"), col("c_mktsegment"))
}.reduce(_ unionAll _)
  .repartition(8).write.mode("overwrite").parquet(s"$out/customer.parquet")
println("GEN customer done")

spark.read.parquet(s"$src/region.parquet")
  .write.mode("overwrite").parquet(s"$out/region.parquet")
println("GEN region done")

// events: nanos-long ts normalized once, event/user ids shift per replica
spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
val ev = graft.SparkUtil.normalizeEventTs(spark.read.parquet(s"$src/events.parquet"))
val nEv = ev.count()
val nUsers = ev.agg(max("user_id")).head.getLong(0) + 1
(0 until reps).map { r =>
  ev.select((col("event_id") + lit(r.toLong * nEv)).as("event_id"), col("ts"),
    (col("user_id") + lit(r * nUsers)).as("user_id"),
    col("event_type"), col("value"), col("props"))
}.reduce(_ unionAll _)
  .repartition(32).write.mode("overwrite").parquet(s"$out/events.parquet")
println(s"GEN events: ${nEv * reps}")
System.exit(0)
