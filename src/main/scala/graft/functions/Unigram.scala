package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Unigram language-model tokenizer (Kudo 2018, "Subword Regularization:
  * Improving Neural Network Translation Models with Multiple Subword
  * Candidates" — the SentencePiece unigram algorithm): a vocabulary of
  * pieces carries per-piece costs (negative log-probabilities in exact
  * MICRO-NATS, integer), and a word segments into the minimum-total-cost
  * piece sequence by Viterbi DP. Learning is hard-EM with pruning:
  * segment the corpus under the current costs (E), re-estimate piece
  * probabilities from weighted usage counts with add-one smoothing and
  * drop non-character pieces below a usage floor (M + prune), repeat.
  * Character pieces are never pruned — they guarantee coverage, exactly
  * SentencePiece's `character_coverage` role.
  *
  * Everything is integer/micro-nat and every tie is pinned (Viterbi ties
  * prefer the LONGER last piece; prune and output order by piece), so an
  * EM round is a pure function of the corpus that a SQL engine replays
  * bit-for-bit — the `text_bpe_learn` convention, completing the
  * tokenizer-learning family pair.
  *
  * Scale shape: segmentation runs over the DISTINCT-word frame with
  * occurrence weights (one map-side-combined word count, then vocab-sized
  * work per round — the CCNet-calibration convention: corpus size only
  * enters through the word histogram); the piece table is plan-literal
  * like [[BpeTable]] (a production vocab is ~50k pieces, kilobytes); the
  * kernel is a narrow per-row DP inside whole-stage codegen; per round
  * only the vocab-sized (piece, count) aggregate reaches the driver.
  */
final class UnigramTable(val costs: Map[String, Long], val maxPieceLen: Int)
    extends Serializable {
  require(maxPieceLen >= 1, s"maxPieceLen >= 1, got $maxPieceLen")
  @transient lazy val lookup: java.util.HashMap[String, java.lang.Long] = {
    val m = new java.util.HashMap[String, java.lang.Long](costs.size * 2)
    costs.foreach { case (p, c) => m.put(p, java.lang.Long.valueOf(c)) }
    m
  }
  override def equals(o: Any): Boolean = o match {
    case t: UnigramTable => t.costs == costs && t.maxPieceLen == maxPieceLen
    case _ => false
  }
  override def hashCode(): Int = costs.hashCode() * 31 + maxPieceLen
}

/** Static kernel shared by interpreted eval and generated code. */
object UnigramKernel {

  /** Min-cost Viterbi segmentation. Deterministic: at each position the
    * winning candidate minimizes (total cost, −piece length) — cost ties
    * fall to the LONGEST last piece, and no further tie is possible
    * (same length ⇒ same piece ⇒ same prefix state). Returns null for a
    * word no piece sequence covers (dead-letter; cannot happen when the
    * vocabulary seeds every corpus character).
    */
  def segmentWord(word: String, table: UnigramTable): Array[String] = {
    if (word.isEmpty) return Array.empty
    val L = word.length
    val Inf = Long.MaxValue / 4
    val best = Array.fill(L + 1)(Inf)
    val back = new Array[Int](L + 1)
    best(0) = 0L
    val lookup = table.lookup
    var p = 1
    while (p <= L) {
      var k = 1
      val kMax = math.min(table.maxPieceLen, p)
      while (k <= kMax) {
        if (best(p - k) < Inf) {
          val c = lookup.get(word.substring(p - k, p))
          if (c != null) {
            val tot = best(p - k) + c.longValue
            if (tot < best(p) || (tot == best(p) && k > back(p))) {
              best(p) = tot; back(p) = k
            }
          }
        }
        k += 1
      }
      p += 1
    }
    if (best(L) >= Inf) return null
    val out = new scala.collection.mutable.ArrayBuffer[String](8)
    p = L
    while (p > 0) {
      val k = back(p)
      out += word.substring(p - k, p)
      p -= k
    }
    out.reverseIterator.toArray
  }

  /** Total piece count over a word array — one kernel call per row (the
    * [[BpeKernel.countTokens]] convention); uncoverable words count 0.
    */
  def countTokens(words: org.apache.spark.sql.catalyst.util.ArrayData,
      table: UnigramTable): Long = {
    var total = 0L
    var i = 0
    val n = words.numElements()
    while (i < n) {
      val w = words.getUTF8String(i)
      if (w != null) {
        val segs = segmentWord(w.toString, table)
        if (segs != null) total += segs.length
      }
      i += 1
    }
    total
  }

  def segment(word: UTF8String, table: UnigramTable): GenericArrayData = {
    val toks = segmentWord(word.toString, table)
    if (toks == null) return null
    val out = new Array[AnyRef](toks.length)
    var i = 0
    while (i < toks.length) { out(i) = UTF8String.fromString(toks(i)); i += 1 }
    new GenericArrayData(out)
  }
}

/** string word → array<string> of its min-cost unigram pieces (null when
  * uncoverable).
  */
case class UnigramSegmentWord(child: Expression, table: UnigramTable)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "unigram_segment_word"
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"unigram_segment_word requires string, got ${other.catalogString}")
  }
  override def nullable: Boolean = true
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("unigramTable", table,
      classOf[UnigramTable].getName)
    nullSafeCodeGen(ctx, ev, s => s"""
      ${ev.value} = graft.functions.UnigramKernel.segment($s, $ref);
      ${ev.isNull} = ${ev.value} == null;""")
  }
  override protected def nullSafeEval(input: Any): Any =
    UnigramKernel.segment(input.asInstanceOf[UTF8String], table)
  override protected def withNewChildInternal(c: Expression): UnigramSegmentWord =
    copy(child = c)
}

/** array<string> of words → total unigram piece count (long); an
  * uncoverable word contributes 0 (the dead-letter convention of
  * [[UnigramSegmentWord]] folded into a count).
  */
case class UnigramCountTokens(child: Expression, table: UnigramTable)
    extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "unigram_count_tokens"
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"unigram_count_tokens requires array<string>, got ${other.catalogString}")
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("unigramTable", table,
      classOf[UnigramTable].getName)
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.functions.UnigramKernel.countTokens($s, $ref);")
  }
  override protected def nullSafeEval(input: Any): Any =
    UnigramKernel.countTokens(
      input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData], table)
  override protected def withNewChildInternal(c: Expression): UnigramCountTokens =
    copy(child = c)
}

object Unigram {

  def segmentWord(word: Column, table: UnigramTable): Column =
    ColumnBridge.column(UnigramSegmentWord(ColumnBridge.expression(word), table))

  def countTokens(words: Column, table: UnigramTable): Column =
    ColumnBridge.column(UnigramCountTokens(ColumnBridge.expression(words), table))

  /** Micro-nat cost of probability `count+1 / total+vocab` — add-one
    * smoothing keeps unused character pieces finite. The expression tree
    * is fixed operand-for-operand (one division, one ln, one round) so a
    * SQL oracle reproduces every bit.
    */
  private def costMicro(count: Long, total: Long, vocab: Int): Long =
    math.round(-math.log((count + 1).toDouble / (total + vocab)) * 1e6)

  /** Hard-EM unigram-LM learning over `emRounds` rounds, seeded with the
    * corpus characters plus the [[Bpe.PlantedMerges]] outputs (the
    * BPE-learned vocabulary seed — SentencePiece's "start from a large
    * candidate set" step, here the sibling tokenizer family's table).
    * Round = segment the distinct-word histogram under the current costs
    * (uniform on round 1), sum weighted piece usage, prune non-character
    * pieces under `minCount` uses, re-cost the survivors. Returns the
    * final (piece, count, cost_micro) rows ordered by piece.
    */
  def learnUnigram(df: DataFrame, textCol: String, emRounds: Int = 2,
      minCount: Long = 2, maxPieceLen: Int = 4): Seq[(String, Long, Long)] = {
    require(emRounds >= 1, s"emRounds >= 1, got $emRounds")
    import org.apache.spark.sql.functions._
    val words = graft.SparkUtil.ensureParallelism(df.select(col(textCol)))
      .select(explode(TextFunctions.tokenize(col(textCol))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("c"))
      .transform(graft.SparkUtil.scopedPersist)
    // corpus characters (coverage floor) + the BPE-learned seed pieces
    val chars: Set[String] = words
      .select(explode(split(col("w"), "")).as("ch"))
      .where(col("ch") =!= "").distinct()
      .collect().map(_.getString(0)).toSet
    val seedPieces: Seq[String] =
      (chars.toSeq ++ Bpe.PlantedMerges.map { case (l, r) => l + r }).distinct.sorted
    var retained: Seq[String] = seedPieces
    var table = new UnigramTable(
      retained.map(_ -> costMicro(0L, 0L, retained.size)).toMap, maxPieceLen)
    var result: Seq[(String, Long, Long)] = Seq.empty
    for (_ <- 1 to emRounds) {
      val counts: Map[String, Long] = words
        .select(explode(Unigram.segmentWord(col("w"), table)).as("piece"), col("c"))
        .groupBy("piece").agg(sum(col("c")).as("n"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val next = retained.filter(p =>
        p.length == 1 || counts.getOrElse(p, 0L) >= minCount)
      val total = next.map(counts.getOrElse(_, 0L)).sum
      val vocab = next.size
      result = next.map { p =>
        val c = counts.getOrElse(p, 0L)
        (p, c, costMicro(c, total, vocab))
      }
      retained = next
      table = new UnigramTable(
        result.map { case (p, _, cm) => p -> cm }.toMap, maxPieceLen)
    }
    result
  }
}
