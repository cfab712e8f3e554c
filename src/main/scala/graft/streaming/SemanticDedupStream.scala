package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** An embedding arriving on the ingest stream, already cell-assigned (the
  * pinned plan-literal projection — see
  * [[graft.operators.SimSearch.pinnedCellsExpr]]).
  */
case class EmbeddingArrival(vec_id: Long, cell: Int, vec: Seq[Float])

/** Per-arrival decision row: kept, or dropped against a prior neighbor. */
case class SemanticDecision(vec_id: Long, cell: Int, kept: Boolean)

/** Streaming PRIOR-NEIGHBOR semantic dedup — the ingest-time half of the
  * SemDeDup family (`dedup_semantic_cells` is the batch compaction): an
  * arriving embedding is DROPPED when any already-seen vector with a
  * SMALLER id in its cell sits within the cosine floor, else kept. The
  * smaller-id rule (not arrival order) makes the decision a pure function
  * of the corpus — independent of micro-batch boundaries whenever the
  * ingest log is id-ordered across batches (the append-log contract of
  * [[Sessionizer]]) — so a SQL oracle replays it as one NOT-EXISTS.
  *
  * State per cell is the SEEN (id, vector) list: the declared semantics
  * need every prior vector, kept or not (a dropped vector still witnesses
  * later drops through its own prior — only smaller-id SEEN rows decide).
  * Memory envelope = cell occupancy × (8 + 4·dim) bytes; production caps
  * it with per-cell retention windows exactly as a streaming join would.
  * Cosine runs left-to-right over the dims (the DuckDB list_sum order) so
  * the floor comparison is bit-identical across engines.
  */
object SemanticDedupStream {

  private def cosine(a: Seq[Float], b: Seq[Float]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) {
      val x = a(i).toDouble; val y = b(i).toDouble
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    val den = math.sqrt(na) * math.sqrt(nb)
    if (den == 0.0) 0.0 else dot / den
  }

  def dedupArrivals(arrivals: Dataset[EmbeddingArrival],
      minCosine: Double): Dataset[SemanticDecision] = {
    import arrivals.sparkSession.implicits._
    arrivals
      .groupByKey(_.cell)
      .flatMapGroupsWithState[Seq[(Long, Seq[Float])], SemanticDecision](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (cell: Int, it: Iterator[EmbeddingArrival],
            state: GroupState[Seq[(Long, Seq[Float])]]) =>
          val sorted = it.toArray.sortBy(_.vec_id)
          var seen = state.getOption.getOrElse(Seq.empty)
          val out = sorted.map { a =>
            val kept = !seen.exists { case (pid, pv) =>
              pid < a.vec_id && cosine(pv, a.vec) >= minCosine
            }
            seen :+= (a.vec_id, a.vec)
            SemanticDecision(a.vec_id, cell, kept)
          }
          state.update(seen)
          out.iterator
      }
  }
}
