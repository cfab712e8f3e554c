package graft.plans

import graft.functions._
import org.apache.spark.sql.{Column, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.graftshim.ColumnBridge

/** SQL frontend: registers the engine's kernels in the session
  * FunctionRegistry so plain `spark.sql` text can call them — the
  * reference has no SQL surface (SURVEY.md §"What the reference is"), but a
  * Spark-native engine should expose one. Installed via the standard
  * extensions hook:
  *
  * {{{
  *   SparkSession.builder()
  *     .withExtensions(new GraftExtensions)   // or
  *     .config("spark.sql.extensions", "graft.plans.GraftExtensions")
  * }}}
  *
  * Custom Catalyst expressions register directly (codegen'd in SQL exactly
  * as in the DataFrame API); composite kernels (tokenize, shingles, band
  * buckets) register as expression *builders* that expand to the same
  * native expression trees — still zero UDFs, fully Catalyst-optimizable.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def c(e: Expression): Column = ColumnBridge.column(e)

  private def intArg(name: String, e: Expression): Int = e match {
    case Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$name expects a literal int, got $other")
  }

  private def register(
      ext: SparkSessionExtensions,
      name: String,
      usage: String,
      builder: PartialFunction[Seq[Expression], Expression]): Unit =
    ext.injectFunction((
      FunctionIdentifier(name),
      new ExpressionInfo("graft", null, name, usage, ""),
      // applyOrElse: a wrong argument count surfaces as a named analysis
      // error instead of a raw scala.MatchError from the case pattern
      (exprs: Seq[Expression]) => builder.applyOrElse(exprs,
        (e: Seq[Expression]) => throw new IllegalArgumentException(
          s"$name: invalid number of arguments (${e.length}); usage: $usage"))))

  override def apply(ext: SparkSessionExtensions): Unit = {
    // direct custom-Expression registrations
    register(ext, "graft_dot_product",
      "graft_dot_product(a, b) - dot product of two float/double arrays",
      { case Seq(a, b) => DotProduct(a, b) })
    register(ext, "graft_l2_norm",
      "graft_l2_norm(a) - L2 norm of a float/double array",
      { case Seq(a) => L2Norm(a) })
    register(ext, "graft_signature_agreement",
      "graft_signature_agreement(a, b) - MinHash signature agreement ratio",
      { case Seq(a, b) => SignatureAgreement(a, b) })
    register(ext, "graft_set_jaccard",
      "graft_set_jaccard(a, b) - exact set Jaccard of two string arrays",
      { case Seq(a, b) => SetJaccard(a, b) })
    register(ext, "graft_tag_occurrences",
      "graft_tag_occurrences(arr) - weighted-minhash occurrence tagging: " +
        "element s becomes 's#occ' (occ = prior occurrences of s in arr)",
      { case Seq(a) => TagOccurrences(a) })
    register(ext, "graft_simhash64",
      "graft_simhash64(tokens) - 64-bit SimHash of a token array",
      { case Seq(a) => SimHash64(a) })
    register(ext, "graft_simhash_md5",
      "graft_simhash_md5(tokens) - md5-mode SimHash fingerprint (16 hex chars)",
      { case Seq(a) => SimHashMd5(a) })
    register(ext, "graft_char_ngrams",
      "graft_char_ngrams(text, n) - distinct character n-grams of normalized text",
      // via TextFunctions so the lower/collapse-whitespace/trim
      // normalization matches the DataFrame twin (raw CharNGrams would
      // n-gram the unnormalized text and silently break SQL ≡ DataFrame)
      { case Seq(a, n) =>
        ColumnBridge.resolvedExpression(
          TextFunctions.charNGrams(c(a), intArg("graft_char_ngrams", n))) })
    register(ext, "graft_minhash_md5",
      "graft_minhash_md5(shingles, h) - md5-mode MinHash signature (h hex strings)",
      { case Seq(a, h) => MinHashMd5Signature(a, intArg("graft_minhash_md5", h)) })
    register(ext, "graft_minhash_xx",
      "graft_minhash_xx(shingles, h) - xxhash64-mode MinHash signature (h longs)",
      { case Seq(a, h) => MinHashXxSignature(a, intArg("graft_minhash_xx", h)) })
    register(ext, "graft_minhash_xx128",
      "graft_minhash_xx128(elems, h) - reference-default xxh128 MinHash " +
        "signature (h Python-hex strings) over vocab indices or shingles",
      { case Seq(a, h) => MinHashXx128Signature(a, intArg("graft_minhash_xx128", h)) })
    register(ext, "graft_band_buckets_xx32",
      "graft_band_buckets_xx32(sig, bands, rows, buckets) - reference-default " +
        "LSH band buckets: xxh32(repr(band), seed=1) mod buckets",
      { case Seq(a, b, r, k) => BandBucketsXx32(a,
        intArg("graft_band_buckets_xx32", b), intArg("graft_band_buckets_xx32", r),
        intArg("graft_band_buckets_xx32", k)) })
    register(ext, "graft_topk",
      "graft_topk(score, id, k) - grouped top-k aggregate (bounded heap, " +
        "score desc / id asc), returns array<struct<score, id>>; " +
        "null and NaN scores are skipped (neither ranks)",
      { case Seq(s, i, kk) =>
        TopKAgg(org.apache.spark.sql.catalyst.expressions.CreateStruct(Seq(
          org.apache.spark.sql.catalyst.expressions.Cast(s, org.apache.spark.sql.types.DoubleType),
          org.apache.spark.sql.catalyst.expressions.Cast(i, org.apache.spark.sql.types.LongType))),
          intArg("graft_topk", kk)) })
    register(ext, "graft_minhash_md5_agg",
      "graft_minhash_md5_agg(shingle, h) - md5-mode MinHash AGGREGATE over " +
        "one-shingle-per-row groups (the analyzer wraps it as an aggregate)",
      { case Seq(a, h) => MinHashMd5Agg(a, intArg("graft_minhash_md5_agg", h)) })

    register(ext, "graft_deflate_ratio",
      "graft_deflate_ratio(text) - DEFLATE compressed/raw byte ratio (0.0 for empty)",
      { case Seq(a) => DeflateRatio(a) })

    register(ext, "graft_bpe_count",
      "graft_bpe_count(words) - total BPE subword count of a word array " +
        "under the engine's planted merge table (a deployment trains its " +
        "own table offline and installs it via the Scala API)",
      { case Seq(a) => BpeCountTokens(a, Bpe.plantedTable) })
    register(ext, "graft_bpe_encode",
      "graft_bpe_encode(word) - BPE subword tokens of one word under the " +
        "engine's planted merge table",
      { case Seq(a) => BpeEncodeWord(a, Bpe.plantedTable) })

    // composite kernels: expand to the same native Column trees
    register(ext, "graft_tokenize",
      "graft_tokenize(text) - lower, punctuation->space, collapse, split",
      { case Seq(a) => ColumnBridge.resolvedExpression(TextFunctions.tokenize(c(a))) })
    register(ext, "graft_shingles",
      "graft_shingles(text, k) - distinct k-token shingles of text",
      { case Seq(a, k) =>
        ColumnBridge.resolvedExpression(
          TextFunctions.shingles(c(a), intArg("graft_shingles", k))) })
    register(ext, "graft_band_buckets_md5",
      "graft_band_buckets_md5(sig, bands, rows, hexLen) - LSH band bucket ids",
      { case Seq(s, b, r, h) =>
        ColumnBridge.resolvedExpression(HashFunctions.bandBucketsMd5(c(s),
          intArg("bands", b), intArg("rows", r), intArg("hexLen", h))) })
    register(ext, "graft_cosine",
      "graft_cosine(a, b) - cosine similarity of two float/double arrays",
      { case Seq(a, b) =>
        ColumnBridge.resolvedExpression(VectorFunctions.cosine(c(a), c(b))) })
    register(ext, "graft_winnow",
      "graft_winnow(text, k, w) - winnowing fingerprints (MOSS) of " +
        "normalized text: min md5 per window of w char-k-gram hashes; any " +
        "shared exact run of >= w+k-1 chars shares a fingerprint",
      // via TextAnalysis so the lower/collapse/trim normalization matches
      // the DataFrame twin (raw WinnowFingerprints would skip it)
      { case Seq(a, k, w) =>
        ColumnBridge.resolvedExpression(
          graft.operators.TextAnalysis.winnowFingerprints(c(a),
            intArg("graft_winnow", k), intArg("graft_winnow", w))) })
  }
}
