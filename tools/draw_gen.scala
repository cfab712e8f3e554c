// Corpus-DRAW generator for the draw-lottery sweep (round-19 verdict
// task 4): produce N seeded variations of the sf0.01 documents +
// embeddings tables so the round-18 restated claims can be checked
// against MANY draws instead of the single per-round regeneration.
//
// What varies per draw r (all deterministic in r — no RNG state):
//  - documents: doc_id runs through a seeded PERMUTATION
//    (id*10007 + r mod n — bijective, 10007 prime > n), so "doc 0" (the
//    flagship query / self-match anchor) and every planted-family anchor
//    land on different documents each draw; ~10% of docs (seeded by
//    hash(doc_id, r)) additionally get the x<r> token-suffix
//    decorrelation (the sf1 generator's trick), perturbing the pair/
//    near-dup population itself.
//  - embeddings: vec_id runs through the same permutation (a fresh
//    20-query workload each draw) and every component gets ±2% seeded
//    relative noise (hash-based, per (vec_id, dim, r)), perturbing the
//    cosine margins the recall claims ride on.
//
// The oracles recompute from the SAME varied tables, so oracle-paired
// gates stay symmetric under any variation; rows-only gates carry
// self-contained claims. This samples the ASSIGNMENT-and-perturbation
// draw family; full content redraws are sampled once per round by the
// driver's own regeneration.
//
// Run:
//   GRAFT_DRAWS=20 /opt/spark/bin/spark-shell --master 'local[32]' \
//     --conf spark.ui.enabled=false --conf spark.sql.shuffle.partitions=32 \
//     -I tools/draw_gen.scala <<< ":quit"
import org.apache.spark.sql.functions._

val src = sys.env.getOrElse("GRAFT_DRAW_SRC", "/root/testdata/sf0.01")
val outBase = sys.env.getOrElse("GRAFT_DRAW_OUT", "/tmp/graft_draws")
val nDraws = sys.env.getOrElse("GRAFT_DRAWS", "20").toInt

val docs0 = spark.read.parquet(s"$src/documents.parquet").cache()
val nDocs = docs0.count()
val emb0 = spark.read.parquet(s"$src/embeddings.parquet").cache()
val nVec = emb0.count()
require(nDocs < 10007 && nVec < 10007, "permutation prime must exceed n")

for (r <- 1 to nDraws) {
  val out = f"$outBase/draw$r%02d"
  docs0.select(pmod(col("doc_id") * 10007L + lit(r.toLong), lit(nDocs)).as("doc_id"), when(pmod(hash(col("doc_id"), lit(r)), lit(10)) === 0, regexp_replace(col("text"), "([A-Za-z0-9_]+)", s"$$1x$r")).otherwise(col("text")).as("text"), col("lang"), col("source")).withColumn("n_chars", length(col("text")).cast("int")).repartition(8).write.mode("overwrite").parquet(s"$out/documents.parquet")
  emb0.select(pmod(col("vec_id") * 10007L + lit(r.toLong), lit(nVec)).as("vec_id"), expr(s"""cast(transform(sequence(1, 64), j -> element_at(embedding, j) * (1.0 + (pmod(hash(vec_id, j, $r), 1001) - 500) / 25000.0)) as array<float>)""").as("embedding"), col("label")).repartition(8).write.mode("overwrite").parquet(s"$out/embeddings.parquet")
  println(s"DRAWGEN $out done")
}
println(s"DRAWGEN all $nDraws draws at $outBase")
System.exit(0)
