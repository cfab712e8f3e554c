package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The SQL frontend (graft.plans.GraftExtensions): every registered function
  * must be callable from plain SQL text and agree bit-for-bit with its
  * DataFrame-API twin.
  */
class SqlFrontendSpec extends AnyFunSuite {

  // shared session — TestSpark installs GraftExtensions at build time
  // (the config-string install path `spark.sql.extensions=graft.plans.
  // GraftExtensions` is exercised externally via spark-shell in /verify)
  lazy val spark: SparkSession = TestSpark.spark

  test("custom expressions are callable from SQL and match the DataFrame API") {
    import graft.functions.{ArrayKernels, HashFunctions => H, TextFunctions => T}
    import org.apache.spark.sql.functions._
    import spark.implicits._

    spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .limit(50).createOrReplaceTempView("docs_sql")

    val viaSql = spark.sql("""
      SELECT doc_id,
        graft_tokenize(text) AS toks,
        graft_shingles(text, 2) AS sh,
        graft_minhash_md5(graft_shingles(text, 2), 8) AS sig,
        graft_band_buckets_md5(graft_minhash_md5(graft_shingles(text, 2), 8), 2, 4, 2) AS buckets,
        graft_simhash64(graft_tokenize(text)) AS sim,
        graft_char_ngrams(text, 3) AS ng
      FROM docs_sql ORDER BY doc_id""")

    val viaApi = spark.table("docs_sql").select(
      col("doc_id"),
      T.tokenize(col("text")).as("toks"),
      T.shingles(col("text"), 2).as("sh"),
      H.minhashMd5(T.shingles(col("text"), 2), 8).as("sig"),
      H.bandBucketsMd5(H.minhashMd5(T.shingles(col("text"), 2), 8), 2, 4, 2).as("buckets"),
      graft.functions.SimHash64.simhash64(T.tokenize(col("text"))).as("sim"),
      T.charNGrams(col("text"), 3).as("ng")
    ).orderBy("doc_id")

    assert(viaSql.schema == viaApi.schema)
    assert(viaSql.collect().toSeq == viaApi.collect().toSeq)
  }

  test("graft_char_ngrams normalizes like the DataFrame twin on raw text") {
    import graft.functions.{TextFunctions => T}
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // mixed case + double spaces: the SQL function must apply the same
    // lower/collapse/trim normalization as TextFunctions.charNGrams
    val df = Seq("Hello  WORLD", "  A  B  ").toDF("t")
    df.createOrReplaceTempView("raw_text")
    val viaSql = spark.sql("SELECT graft_char_ngrams(t, 3) AS g FROM raw_text").collect()
    val viaApi = df.select(T.charNGrams($"t", 3).as("g")).collect()
    assert(viaSql.toSeq == viaApi.toSeq)
    assert(viaSql(0).getSeq[String](0).contains("o w")) // normalized, not 'o  '
  }

  test("graft_winnow matches the DataFrame twin and fingerprints shared runs") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val df = Seq("The  Quick brown fox jumps over the lazy dog tonight",
      "prefix pad the quick brown fox jumps over the lazy dog tonight").toDF("t")
    df.createOrReplaceTempView("winnow_text")
    val viaSql = spark.sql("SELECT graft_winnow(t, 8, 8) AS f FROM winnow_text").collect()
    val viaApi = df.select(
      graft.operators.TextAnalysis.winnowFingerprints($"t", 8, 8).as("f")).collect()
    assert(viaSql.toSeq == viaApi.toSeq)
    val a = viaSql(0).getSeq[String](0).toSet
    val b = viaSql(1).getSeq[String](0).toSet
    assert(a.intersect(b).nonEmpty, "shared normalized run must share a fingerprint")
  }

  test("wrong arity raises a named error, not a MatchError") {
    val e = intercept[Exception] {
      spark.sql("SELECT graft_dot_product(array(1.0D))").collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => x.getMessage +: messages(x.getCause))
    assert(messages(e).exists(m => m != null && m.contains("graft_dot_product")),
      s"expected a message naming the function, got: $e")
  }

  test("vector kernels from SQL: dot, norm, cosine, agreement, set jaccard") {
    val row = spark.sql("""
      SELECT
        graft_dot_product(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS dot,
        graft_l2_norm(array(3.0D, 4.0D)) AS nrm,
        graft_cosine(array(1.0D, 0.0D), array(1.0D, 0.0D)) AS cos,
        graft_signature_agreement(array('a','b','c'), array('a','x','c')) AS agree,
        graft_set_jaccard(array('a','b'), array('b','c')) AS sj
    """).collect()(0)
    assert(row.getDouble(0) == 11.0)
    assert(row.getDouble(1) == 5.0)
    assert(math.abs(row.getDouble(2) - 1.0) < 1e-12)
    assert(math.abs(row.getFloat(3) - 2f / 3f) < 1e-6)
    assert(math.abs(row.getDouble(4) - 1.0 / 3.0) < 1e-12)
  }

  test("graft_tag_occurrences and xx128 kernels from SQL") {
    val row = spark.sql("""
      SELECT
        graft_tag_occurrences(array('a', 'b', 'a')) AS tags,
        graft_minhash_xx128(array('aa bb'), 2) AS sig
    """).collect()(0)
    assert(row.getSeq[String](0) == Seq("a#0", "b#0", "a#1"))
    val sig = row.getSeq[String](1)
    assert(sig.length == 2 && sig.forall(_.matches("0x[0-9a-f]+")))
    // matches the DataFrame twin bit-for-bit
    val df = spark.sql("SELECT array('aa bb') AS sh")
      .select(graft.functions.XxHashExpr.minhashXx128(
        org.apache.spark.sql.functions.col("sh"), 2).as("sig"))
      .collect()(0).getSeq[String](0)
    assert(df == sig)
  }

  test("graft_bpe_count / graft_bpe_encode: SQL surface equals the DataFrame kernel") {
    import org.apache.spark.sql.functions.col
    val enc = spark.sql(
      "SELECT array_join(graft_bpe_encode('weathering'), '|') AS e").collect()(0).getString(0)
    assert(enc == "w|e|a|ther|ing", s"got $enc")
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .createOrReplaceTempView("docs_bpe")
    val bad = spark.sql(
      "SELECT doc_id, graft_bpe_count(graft_tokenize(text)) AS n FROM docs_bpe")
      .join(
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
          .select(col("doc_id"),
            graft.functions.Bpe.countTokens(
              graft.functions.TextFunctions.tokenize(col("text"))).as("m")),
        Seq("doc_id"))
      .where(col("n") =!= col("m")).count()
    assert(bad == 0, "SQL and DataFrame BPE counts must agree per doc")
  }

  test("whole ANN candidate pipeline expressed in one SQL statement") {
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .createOrReplaceTempView("docs_all")
    // doc 0's planted near-dup family (50, 82) must surface via SQL alone
    val top = spark.sql("""
      WITH feat AS (
        SELECT doc_id,
          graft_minhash_md5(graft_shingles(text, 2), 16) AS sig,
          graft_band_buckets_md5(graft_minhash_md5(graft_shingles(text, 2), 16), 4, 4, 2) AS buckets
        FROM docs_all),
      q AS (SELECT sig AS q_sig, buckets AS q_buckets FROM feat WHERE doc_id = 0)
      SELECT f.doc_id,
        graft_signature_agreement(f.sig, q.q_sig) AS jaccard
      FROM feat f, q
      WHERE arrays_overlap(f.buckets, q.q_buckets)
      ORDER BY jaccard DESC, doc_id LIMIT 3""").collect()
    assert(top.map(_.getLong(0)).toSet == Set(0L, 50L, 82L),
      s"got ${top.map(_.getLong(0)).toSeq}")
  }

  test("ann_query_sql ≡ ann_query: same rows, top-k plan, no minhash in filters") {
    val dir = "/root/testdata/sf0.001"
    val sql = SparkEntry.queries("ann_query_sql")(spark, dir)
    val df = SparkEntry.queries("ann_query")(spark, dir)
    assert(sql.select("doc_id", "jaccard").except(df.select("doc_id", "jaccard")).count() == 0 &&
      df.select("doc_id", "jaccard").except(sql.select("doc_id", "jaccard")).count() == 0,
      "SQL frontend must reproduce the DataFrame ANN result exactly")
    val plan = sql.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      s"SQL top-10 must plan as TakeOrderedAndProject:\n$plan")
    // the round-3 contract extends to the SQL surface: the coalesce form
    // must keep InferFiltersFromConstraints from pushing the minhash tree
    // into a scan filter
    val filterLines = plan.linesIterator
      .filter(l => l.contains("Filter") || l.contains("PushedFilters"))
      .mkString("\n")
    assert(!filterLines.contains("minhash_"),
      s"ann_query_sql evaluates MinHash inside a filter:\n$filterLines")
    graft.SparkUtil.releaseScopedCaches()
  }

  test("dedup_exact_sql ≡ dedup_exact_keep: same rows, anti-join shape, no window") {
    val dir = "/root/testdata/sf0.001"
    val sql = SparkEntry.queries("dedup_exact_sql")(spark, dir)
    val df = SparkEntry.queries("dedup_exact_keep")(spark, dir)
    assert(sql.except(df).count() == 0 && df.except(sql).count() == 0,
      "SQL frontend must reproduce the DataFrame dedup result exactly")
    val plan = sql.queryExecution.executedPlan.toString
    assert(plan.contains("LeftAnti"), s"loser removal must be an anti-join:\n$plan")
    assert(!plan.contains("Window"),
      s"the SQL form must keep the hash-groupBy shape, not a text-ranking window:\n$plan")
  }
}
