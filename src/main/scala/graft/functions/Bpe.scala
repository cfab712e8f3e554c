package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Byte-pair-encoding subword tokenization — the merge-table inference step
  * of Sennrich et al. 2016 ("Neural Machine Translation of Rare Words with
  * Subword Units") in the shape popularized by the public GPT-2 encoder:
  * a word starts as its character symbols, then the lowest-rank adjacent
  * pair in the merge table is merged (all non-overlapping occurrences,
  * left to right) until no listed pair remains. Training pipelines budget
  * and pack in SUBWORD tokens, not whitespace words — this supplies the
  * real token counts those operators consume.
  *
  * Scale shape: the merge table is PLAN-LITERAL (the same bounded-broadcast
  * convention as the IVF-PQ codebooks and DSIR feature table — a real
  * vocabulary is ~50k rows, kilobytes per executor, embedded once in the
  * plan, never shuffled); the encode itself is a narrow per-row kernel
  * inside whole-stage codegen — zero shuffles, scales as the scan does.
  */
final class BpeTable(val merges: Seq[(String, String)]) extends Serializable {
  // empty table is legal: encode degenerates to character symbols — the
  // starting state of merge LEARNING ([[Bpe.learnMerges]])
  // rank lookup keyed on left +  + right ( cannot appear in a
  // tokenizer word, so the joint key is unambiguous)
  @transient lazy val ranks: java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer](merges.size * 2)
    merges.zipWithIndex.foreach { case ((l, r), i) =>
      m.put(l + "" + r, Integer.valueOf(i))
    }
    m
  }
  override def equals(o: Any): Boolean = o match {
    case t: BpeTable => t.merges == merges
    case _ => false
  }
  override def hashCode(): Int = merges.hashCode()
}

/** Static kernel shared by the BPE expressions' interpreted eval and their
  * generated code.
  */
object BpeKernel {

  /** Exact merge-loop inference: repeatedly merge the lowest-rank adjacent
    * pair (all non-overlapping occurrences, left to right). Symbols are
    * CODE POINTS initially — a supplementary-plane char is one symbol, the
    * same convention as the winnowing kernel.
    */
  def encodeWord(word: String, table: BpeTable): Array[String] = {
    if (word.isEmpty) return Array.empty
    val cps = word.codePoints().toArray
    var syms = new Array[String](cps.length)
    var i = 0
    while (i < cps.length) { syms(i) = new String(cps, i, 1); i += 1 }
    val ranks = table.ranks
    while (syms.length > 1) {
      var best = Int.MaxValue
      var bi = -1
      i = 0
      while (i < syms.length - 1) {
        val r = ranks.get(syms(i) + "" + syms(i + 1))
        if (r != null && r.intValue < best) { best = r.intValue; bi = i }
        i += 1
      }
      if (bi < 0) return syms
      val l = syms(bi); val rgt = syms(bi + 1)
      val out = new scala.collection.mutable.ArrayBuffer[String](syms.length)
      i = 0
      while (i < syms.length) {
        if (i < syms.length - 1 && syms(i) == l && syms(i + 1) == rgt) {
          out += l + rgt; i += 2
        } else { out += syms(i); i += 1 }
      }
      syms = out.toArray
    }
    syms
  }

  def encode(word: UTF8String, table: BpeTable): GenericArrayData = {
    val toks = encodeWord(word.toString, table)
    val out = new Array[AnyRef](toks.length)
    var i = 0
    while (i < toks.length) { out(i) = UTF8String.fromString(toks(i)); i += 1 }
    new GenericArrayData(out)
  }

  /** Total subword count over a word array — one kernel call per document
    * row (cheaper than a per-word lambda invocation inside a HOF).
    */
  def countTokens(words: ArrayData, table: BpeTable): Long = {
    var total = 0L
    var i = 0
    val n = words.numElements()
    while (i < n) {
      val w = words.getUTF8String(i)
      if (w != null) total += encodeWord(w.toString, table).length
      i += 1
    }
    total
  }
}

/** string word → array<string> of its BPE subword tokens. */
case class BpeEncodeWord(child: Expression, table: BpeTable)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "bpe_encode_word"
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"bpe_encode_word requires string, got ${other.catalogString}")
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeTable", table, classOf[BpeTable].getName)
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.functions.BpeKernel.encode($s, $ref);")
  }
  override protected def nullSafeEval(input: Any): Any =
    BpeKernel.encode(input.asInstanceOf[UTF8String], table)
  override protected def withNewChildInternal(c: Expression): BpeEncodeWord =
    copy(child = c)
}

/** array<string> of words → total BPE subword count (long). */
case class BpeCountTokens(child: Expression, table: BpeTable)
    extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "bpe_count_tokens"
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"bpe_count_tokens requires array<string>, got ${other.catalogString}")
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeTable", table, classOf[BpeTable].getName)
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.functions.BpeKernel.countTokens($s, $ref);")
  }
  override protected def nullSafeEval(input: Any): Any =
    BpeKernel.countTokens(input.asInstanceOf[ArrayData], table)
  override protected def withNewChildInternal(c: Expression): BpeCountTokens =
    copy(child = c)
}

object Bpe {

  /** The planted gate merge table. Deliberately HIERARCHICAL — every
    * operand is a single character or the output of an EARLIER rule, and
    * output symbols are distinct. For such a table, applying the rules in
    * rank order, each as one left-to-right non-overlapping pass, replays
    * the exact merge loop (a merge of rule k only creates pairs involving
    * its output symbol, which by construction can only be an operand of
    * rules AFTER k — so exhausted rules never reappear). That makes the
    * DuckDB oracle a chain of plain `replace()` calls over a
    * bracket-delimited symbol string — an exact replay, not an
    * approximation. The kernel itself implements the GENERAL algorithm
    * and does not rely on this property.
    */
  val PlantedMerges: Seq[(String, String)] = Seq(
    ("t", "h"), ("th", "e"), ("i", "n"), ("a", "n"), ("an", "d"),
    ("e", "r"), ("o", "n"), ("o", "r"), ("e", "n"), ("a", "t"),
    ("e", "s"), ("in", "g"), ("es", "t"), ("the", "r"))

  lazy val plantedTable: BpeTable = new BpeTable(PlantedMerges)

  def encodeWord(word: Column, table: BpeTable = plantedTable): Column =
    ColumnBridge.column(BpeEncodeWord(ColumnBridge.expression(word), table))

  def countTokens(words: Column, table: BpeTable = plantedTable): Column =
    ColumnBridge.column(BpeCountTokens(ColumnBridge.expression(words), table))

  /** BPE merge LEARNING (Sennrich et al. 2016 `learn_bpe`), distributed:
    * `k` greedy rounds, each = encode every token occurrence under the
    * merges learned so far (narrow, codegen'd kernel), count adjacent
    * symbol pairs corpus-wide, and adopt the most frequent pair
    * (deterministic tie-break: count desc, then (left, right)
    * lexicographic). Returns (left, right, pair_count) in rank order.
    *
    * Scale shape: each round is one map-side-combined (l, r, count)
    * aggregate — the LM-training shuffle shape, pair cardinality bounded
    * by the symbol-bigram vocabulary — plus a ONE-ROW argmax fetch;
    * nothing corpus-sized reaches the driver. k rounds = k passes over
    * the (persisted) token column; production pipelines learn on a
    * calibration sample, exactly like the CCNet cutoffs.
    *
    * The learned table is HIERARCHICAL by construction (operands are
    * symbols that exist at learning time = chars or earlier outputs), so
    * the DuckDB replace-chain replay is exact; the distinct-outputs
    * precondition of that replay is asserted per round.
    */
  def learnMerges(df: org.apache.spark.sql.DataFrame, textCol: String,
      k: Int): Seq[(String, String, Long)] = {
    require(k >= 1, s"k must be >= 1, got $k")
    import org.apache.spark.sql.functions._
    val words = graft.SparkUtil.ensureParallelism(df.select(col(textCol)))
      .select(explode(TextFunctions.tokenize(col(textCol))).as("__w"))
      .transform(graft.SparkUtil.scopedPersist)
    var merges = Vector.empty[(String, String)]
    val learned = scala.collection.mutable.ArrayBuffer.empty[(String, String, Long)]
    var i = 0
    var done = false
    while (i < k && !done) {
      val syms = words.select(
        encodeWord(col("__w"), new BpeTable(merges)).as("__s"))
      val n = size(col("__s"))
      val top = syms.where(n >= 2)
        .select(explode(zip_with(
          slice(col("__s"), lit(1), n - 1), slice(col("__s"), lit(2), n - 1),
          (a, b) => struct(a.as("l"), b.as("r")))).as("__p"))
        .groupBy(col("__p.l").as("l"), col("__p.r").as("r"))
        .agg(count(lit(1)).as("c"))
        .orderBy(col("c").desc, col("l").asc, col("r").asc)
        .limit(1).collect()
      if (top.isEmpty || top(0).getLong(2) < 2) done = true
      else {
        val (l, r) = (top(0).getString(0), top(0).getString(1))
        merges :+= ((l, r))
        require(merges.map { case (a, b) => a + b }.distinct.size == merges.size,
          "learned merge outputs must stay distinct (oracle-replay precondition)")
        learned += ((l, r, top(0).getLong(2)))
      }
      i += 1
    }
    learned.toSeq
  }

  /** The DuckDB replay of [[PlantedMerges]] over one word expression:
    * bracket-delimit every character (`[t][h][e]` — tokenizer words are
    * `[a-z0-9_]+`, so brackets cannot collide), apply each merge as one
    * `replace('[l][r]' -> '[lr]')` in rank order (exact for a hierarchical
    * table, see [[PlantedMerges]]), and count the remaining `[` openers.
    */
  def duckdbCountSql(wordExpr: String): String = {
    val merged = PlantedMerges.foldLeft(
      s"regexp_replace($wordExpr, '(.)', '[\\1]', 'g')") {
      case (acc, (l, r)) => s"replace($acc, '[$l][$r]', '[$l$r]')"
    }
    s"(length($merged) - length(replace($merged, '[', '')))"
  }
}
