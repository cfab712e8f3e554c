package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.ExplainMode
import org.scalatest.funsuite.AnyFunSuite

/** Plan-shape contracts: the properties PERF.md claims — pushdown, column
  * pruning, broadcasts, product-join avoidance — asserted on the actual
  * optimized/physical plans so a regression fails CI, not a benchmark
  * eyeball. Queries come straight from SparkEntry (the driver contract).
  */
class PlanPropertiesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def planOf(name: String): String = {
    val df: DataFrame = SparkEntry.queries(name)(spark, dir)
    df.queryExecution.explainString(ExplainMode.fromString("formatted"))
  }

  test("flt_predicate pushes filters into the parquet scan") {
    val plan = planOf("flt_predicate")
    assert(plan.contains("PushedFilters:") &&
      plan.matches("(?s).*PushedFilters: \\[[^\\]]*l_quantity[^\\]]*\\].*"),
      s"expected l_quantity in PushedFilters:\n$plan")
  }

  test("prj_select prunes the scan to the projected columns") {
    val plan = planOf("prj_select")
    val readSchema = plan.linesIterator.find(_.contains("ReadSchema:")).getOrElse("")
    assert(readSchema.contains("c_custkey") && !readSchema.contains("c_address"),
      s"expected 3-column ReadSchema, got: $readSchema")
  }

  test("join_docs_topk broadcasts the top-k side and plans TakeOrderedAndProject") {
    val plan = planOf("join_docs_topk")
    assert(plan.contains("BroadcastHashJoin"), s"expected broadcast join:\n$plan")
    assert(plan.contains("TakeOrderedAndProject"),
      s"expected TakeOrderedAndProject for orderBy+limit:\n$plan")
  }

  test("as-of and range joins never degrade to product joins") {
    for (q <- Seq("join_asof", "join_range")) {
      val plan = planOf(q)
      assert(!plan.contains("CartesianProduct") &&
        !plan.contains("BroadcastNestedLoopJoin"),
        s"$q must stay an equi/window plan:\n$plan")
    }
  }

  test("asofJoinPrior core is ONE hash-partition shuffle (the windowed union)") {
    import org.apache.spark.sql.functions._
    import graft.operators.Joins
    val spark2 = spark
    import spark2.implicits._
    def t(m: Long) = new java.sql.Timestamp(1700000000000L + m * 60000)
    val left = (1 to 50).map(i => (i % 5L, t(i), i.toLong)).toDF("k", "ts", "lid")
    val right = (1 to 50).map(i => (i % 5L, t(i), (100 + i).toLong)).toDF("k", "ts", "rid")
    val plan = Joins.asofJoinPrior(left, right, Seq("k"), "ts", Seq("rid"), "rid")
      .queryExecution.executedPlan.toString
    val shuffles = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(shuffles == 1, s"expected exactly one shuffle, got $shuffles:\n$plan")
  }

  test("aggregations are partial+final hash aggregates (map-side combine)") {
    val plan = planOf("agg_group_stats")
    assert(plan.contains("HashAggregate"), s"expected hash aggregation:\n$plan")
    assert(plan.matches("(?s).*partial_(sum|count).*"),
      s"expected partial aggregation before the exchange:\n$plan")
  }

  test("join_3way_agg: per-table filters pushed, dimension side broadcast") {
    val plan = planOf("join_3way_agg")
    assert(plan.contains("BroadcastHashJoin"),
      s"filtered customer side should broadcast:\n$plan")
    assert(plan.matches("(?s).*PushedFilters: \\[[^\\]]*c_mktsegment[^\\]]*\\].*"),
      s"c_mktsegment must reach the customer scan:\n$plan")
    assert(plan.matches("(?s).*PushedFilters: \\[[^\\]]*l_shipdate[^\\]]*\\].*"),
      s"l_shipdate must reach the lineitem scan:\n$plan")
  }

  test("blocked similarity joins never degrade to product joins") {
    for (q <- Seq("sim_knn_graph", "join_interval_overlap", "dedup_embedding_bucketed",
        "dedup_embedding_ivf", "graph_triangles")) {
      val plan = planOf(q)
      assert(!plan.contains("CartesianProduct") &&
        !plan.contains("BroadcastNestedLoopJoin"),
        s"$q must stay a bucket equi-join:\n$plan")
    }
  }

  test("src_partitioned_scan prunes partitions at the scan") {
    val plan = planOf("src_partitioned_scan")
    assert(plan.matches("(?s).*PartitionFilters: \\[[^\\]]*lang[^\\]]*\\].*"),
      s"lang filter must prune partitions, not scan-and-filter:\n$plan")
  }

  test("ann_query_indexed prunes the inverted-index scan to the query's bucket partitions") {
    val plan = planOf("ann_query_indexed")
    // the serving-path contract: the posting-table scan must carry
    // PartitionFilters on the bucket-prefix partition column (≤ numBands
    // directories read) AND push the full bucket equality into the parquet
    // reader — never a full-index scan with a post-filter
    assert(plan.matches("(?s).*PartitionFilters: \\[[^\\]]*bkt_pfx[^\\]]*\\].*"),
      s"bkt_pfx must prune partitions at the inverted-index scan:\n$plan")
    assert(plan.matches("(?s).*PushedFilters: \\[[^\\]]*bucket[^\\]]*\\].*"),
      s"bucket equality must be pushed to the parquet reader:\n$plan")
  }

  test("ann_query_served (cold-start) carries the same partition-pruned scan shape") {
    val plan = planOf("ann_query_served")
    assert(plan.matches("(?s).*PartitionFilters: \\[[^\\]]*bkt_pfx[^\\]]*\\].*"),
      s"fit-free serving must prune partitions like the model path:\n$plan")
    val a = SparkEntry.queries("ann_query_served")(spark, dir).collect().toSeq
    val b = SparkEntry.queries("ann_query")(spark, dir).collect().toSeq
    assert(a == b, "cold-start serve diverged from the in-memory flagship")
  }

  test("ann_batch_indexed: posting-table join, no product join, no per-corpus explode") {
    val plan = planOf("ann_batch_indexed")
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"batch serving must stay a bucket equi-join:\n$plan")
    // the posting table IS the exploded index — the plan must not re-pay
    // a corpus-side Generate (explode) like the in-memory batch path does
    val postingSide = plan.linesIterator
      .filter(l => l.contains("Scan parquet") || l.contains("FileScan"))
      .mkString("\n")
    assert(postingSide.toLowerCase.contains("graft_ann_inverted"),
      s"batch serving must scan the persisted posting table:\n$postingSide")
  }

  test("ann_query_indexed equals ann_query row-for-row") {
    val a = SparkEntry.queries("ann_query")(spark, dir).collect().toSeq
    val b = SparkEntry.queries("ann_query_indexed")(spark, dir).collect().toSeq
    assert(a == b, s"serving path diverged from in-memory path:\nann_query=$a\nindexed=$b")
  }

  test("no MinHash expression is ever pushed into a scan-level filter") {
    // Regression contract for the round-3 find: a null-signature filter
    // placed below the query-feature cache gets pushed under the
    // parallelizing repartition, evaluating the whole minhash tree per row
    // on the single-task file scan. The featurize pipeline must reach the
    // scan as columns only — every Filter and every scan's data filters
    // must be free of the signature expressions.
    for (q <- Seq("ann_batch_md5", "dedup_novel_filter")) {
      val df = SparkEntry.queries(q)(spark, dir)
      val physical = df.queryExecution.executedPlan.toString
      val filterLines = physical.linesIterator
        .filter(l => l.contains("Filter") || l.contains("PushedFilters"))
        .mkString("\n")
      assert(!filterLines.contains("minhash_"),
        s"$q evaluates MinHash inside a filter:\n$filterLines")
    }
  }

  test("flt_sample_hash: the md5 sampling predicate stays a scan-level filter") {
    val plan = planOf("flt_sample_hash")
    // no shuffle at all — sampling must be a narrow scan+filter pipeline
    assert(!plan.contains("Exchange hashpartitioning"),
      s"hash sampling must not shuffle:\n$plan")
    assert(plan.contains("Filter"), s"expected a filter stage:\n$plan")
  }

  test("dedup_decontaminate broadcasts the benchmark shingle set") {
    val plan = planOf("dedup_decontaminate")
    assert(plan.contains("BroadcastHashJoin"),
      s"benchmark side must broadcast (the corpus side must never shuffle into the match):\n$plan")
  }

  test("dedup_image_phash candidates come from a band equi-join — never all-pairs") {
    val plan = planOf("dedup_image_phash")
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"perceptual-hash pairing must stay a (band, value) equi-join:\n$plan")
  }

  test("saltedJoin plans a hash equi-join on (keys, salt) — never a product join") {
    val plan = planOf("join_skew_salted")
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"salted join must stay an equi-join:\n$plan")
  }

  test("flt_subquery decorrelates EXISTS to a semi join (no subquery loop)") {
    val physical = SparkEntry.queries("flt_subquery")(spark, dir)
      .queryExecution.executedPlan.toString
    assert(physical.contains("LeftSemi"), s"expected left-semi join:\n$physical")
  }

  test("stream_join batch twin keys the shuffle on user_id (no product join)") {
    val plan = planOf("stream_join")
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"interaction join must hash on user_id with time bounds as post-filter:\n$plan")
  }

  test("weighted MinHash signatures are shuffle-free: no window, no sig aggregate") {
    // the tf-weighted pipeline must compute tagged signatures inside the
    // scan's projection — the old (id, gram) row_number window and the
    // exploded-stream MinHash aggregate each shuffled O(corpus tokens)
    val df = graft.operators.Dedup.weightedMinhashPairs(
      spark.read.parquet(s"$dir/documents.parquet"), "doc_id", "text",
      MinHashConfig(numHash = 16, numBands = 4, numRows = 4), 0.4)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"),
      s"no window may remain in the weighted pipeline:\n$plan")
    assert(!plan.contains("minhash_md5_agg"),
      s"signatures must come from the per-row kernel, not the aggregate:\n$plan")
    // and the empty-doc filter must NOT be substituted into a scan-level
    // predicate re-running the tag tree per row (round-3 pushdown trap)
    val filterLines = plan.linesIterator
      .filter(l => l.contains("Filter") || l.contains("PushedFilters"))
      .mkString("\n")
    assert(!filterLines.contains("tag_occurrences") && !filterLines.contains("minhash_"),
      s"weighted pipeline evaluates kernels inside a filter:\n$filterLines")
  }

  test("large-nLists IVF assignment broadcasts centroids, no megabyte plan literal") {
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val big = graft.operators.SimSearch.trainIvf(emb, "vec_id", "embedding",
      nLists = graft.operators.SimSearch.TypedLitCentroidMax + 36, iters = 1)
    val plan = big.assigned.queryExecution.executedPlan.toString
    assert(plan.contains("Broadcast"),
      s"centroids must arrive via broadcast above the typedlit threshold:\n${plan.take(2000)}")
    // a typedlit of 100 x 64 doubles would put ~100KB of digits in the plan
    assert(plan.length < 50000,
      s"plan must not embed the centroid table as a literal (len=${plan.length})")
    big.unpersist()
    val small = graft.operators.SimSearch.trainIvf(emb, "vec_id", "embedding",
      nLists = 8, iters = 1)
    val smallPlan = small.assigned.queryExecution.executedPlan.toString
    assert(!smallPlan.contains("BroadcastNestedLoopJoin"),
      "small nLists keeps the single-projection typedlit path")
    small.unpersist()
  }

  test("AQE splits a planted hot bucket in the LSH-shaped equi-join (skew evidence)") {
    // the bucket equi-join behind approxSimilarityJoin / batch ANN relies on
    // AQE to split hot LSH buckets; until now that safety was argued, not
    // pinned. Plant a bucket carrying ~90% of the probe rows (with payload
    // bytes so the skewed partition crosses the test-scaled thresholds),
    // force a sort-merge join, and assert the finalized adaptive plan
    // actually applied the skew split (the `skew=true` marker).
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val keep = Seq(
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.autoBroadcastJoinThreshold").map(k => k -> spark.conf.getOption(k))
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "65536")
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "32768")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val payload = "x" * 200
      val probe = spark.range(60000).select(
        when(col("id") % 10 =!= 0, lit(0))
          .otherwise(pmod(col("id"), lit(997)).cast("int")).as("bucket"),
        col("id").as("a_id"), lit(payload).as("a_sig"))
      val build = spark.range(1000).select(
        col("id").cast("int").as("bucket"), col("id").as("b_id"))
      val joined = probe.join(build, Seq("bucket"))
      // materialize THROUGH this Dataset's own QueryExecution so its
      // AdaptiveSparkPlan is finalized (df.write/count build a separate one)
      joined.queryExecution.toRdd.count()
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"expected AQE skew-join split on the planted hot bucket:\n${plan.take(3000)}")
    } finally keep.foreach { case (k, v) =>
      v.fold(spark.conf.unset(k))(spark.conf.set(k, _))
    }
  }

  test("dropExactDuplicates: no exchange ever carries the text column") {
    // the round-6 finding: the old full-row window shuffled the whole
    // corpus text to rank it; the decision must ride on (id, 16-byte md5)
    // projections only. The round-7 finding: the loser-id anti-join must
    // carry NO broadcast() hint (a dup-heavy crawl makes a forced broadcast
    // fail hard) — broadcast is AQE's runtime call, never ours.
    val prev = spark.conf.getOption("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val df = graft.operators.Dedup.dropExactDuplicates(
        spark.read.parquet(s"$dir/documents.parquet"), "doc_id", "text")
      val shuffleOutputs = df.queryExecution.executedPlan.collect {
        case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec =>
          e.output.map(_.name)
      }
      assert(shuffleOutputs.nonEmpty, "expected the hash-keyed decision shuffles")
      shuffleOutputs.foreach { cols =>
        assert(!cols.exists(_.toLowerCase.contains("text")),
          s"an exchange ships the text column: $cols")
      }
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("LeftAnti"), s"loser removal must be an anti-join:\n$plan")
      val hinted = df.queryExecution.analyzed.collect {
        case h: org.apache.spark.sql.catalyst.plans.logical.ResolvedHint => h
      }
      assert(hinted.isEmpty,
        s"no forced broadcast hint allowed — the loser list scales with dup rate: $hinted")
    } finally prev.fold(spark.conf.unset("spark.sql.adaptive.enabled"))(
      spark.conf.set("spark.sql.adaptive.enabled", _))
  }

  test("dedupParagraphsGlobal: decision shuffles carry hashes/ints, never paragraph text") {
    val prev = spark.conf.getOption("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val docs = spark.read.parquet(s"$dir/documents.parquet")
      val planted = docs.selectExpr("doc_id",
        "concat('boiler\\n\\n', text) AS text")
      val df = graft.operators.TextAnalysis.dedupParagraphsGlobal(
        planted, "doc_id", "text")
      val shuffleOutputs = df.queryExecution.executedPlan.collect {
        case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec =>
          e.output.map(_.name)
      }
      assert(shuffleOutputs.nonEmpty, "expected the winner/drop decision shuffles")
      shuffleOutputs.foreach { cols =>
        assert(!cols.exists(c => c.contains("text") || c == "__p" || c == "__paras"),
          s"an exchange ships paragraph text: $cols")
      }
      val hinted = df.queryExecution.analyzed.collect {
        case h: org.apache.spark.sql.catalyst.plans.logical.ResolvedHint => h
      }
      assert(hinted.isEmpty,
        s"no forced broadcast — the drop table scales with dup density: $hinted")
    } finally prev.fold(spark.conf.unset("spark.sql.adaptive.enabled"))(
      spark.conf.set("spark.sql.adaptive.enabled", _))
  }

  test("keepBestPerCluster: winner decision never ships text; anti-join unhinted") {
    // same contract as dropExactDuplicates: the argmax ranking rides on
    // (id, label, score) projections only, and the loser removal is a
    // plain LEFT ANTI with no forced broadcast (loser count scales with
    // the corpus dup rate)
    val prev = spark.conf.getOption("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val spark2 = spark
      import spark2.implicits._
      val pairs = Seq((0L, 50L), (0L, 82L)).toDF("a_id", "b_id")
      val df = graft.operators.Dedup.keepBestPerCluster(
        spark.read.parquet(s"$dir/documents.parquet"), "doc_id", pairs, "n_chars")
      val shuffleOutputs = df.queryExecution.executedPlan.collect {
        case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec =>
          e.output.map(_.name)
      }
      shuffleOutputs.foreach { cols =>
        assert(!cols.exists(_.toLowerCase.contains("text")),
          s"an exchange ships the text column: $cols")
      }
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("LeftAnti"), s"loser removal must be an anti-join:\n$plan")
      val hinted = df.queryExecution.analyzed.collect {
        case h: org.apache.spark.sql.catalyst.plans.logical.ResolvedHint => h
      }
      assert(hinted.isEmpty, s"no forced broadcast hint allowed: $hinted")
      graft.SparkUtil.releaseScopedCaches()
    } finally prev.fold(spark.conf.unset("spark.sql.adaptive.enabled"))(
      spark.conf.set("spark.sql.adaptive.enabled", _))
  }

  test("dsirImportanceWeights: feature table broadcasts; no token or text in any exchange") {
    // the operator's 100 TB claim: the hashing trick bounds the feature
    // table at `buckets` rows (always broadcastable), and every exchange
    // carries (bucket, counts) or (id, micro-nat longs) — the token strings
    // and text never shuffle
    val prev = spark.conf.getOption("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val df = graft.operators.TextAnalysis.dsirImportanceWeights(
        spark.read.parquet(s"$dir/documents.parquet"), "doc_id", "text",
        org.apache.spark.sql.functions.col("lang") === "en", buckets = 256)
      val plan = df.queryExecution.executedPlan
      assert(plan.toString.contains("BroadcastHashJoin"),
        "the <=buckets-row log-ratio table must join as a broadcast")
      assert(!plan.toString.contains("collect_list"), "no per-doc buffering")
      val shuffles = plan.collect {
        case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec =>
          (e.outputPartitioning, e.output.map(_.name))
      }
      shuffles.foreach { case (_, cols) =>
        assert(!cols.exists(_.toLowerCase.contains("token")),
          s"an exchange ships token strings: $cols")
      }
      // text may ride (a) the local round-robin parallelism spread — a
      // cluster no-op — but only at the PROJECTED width (id, flag, text),
      // and (b) the single id-keyed enrich join back onto docs (the
      // accepted final shape, same as withUnigramLogProb)
      val textShuffles = shuffles.filter(_._2.exists(_.toLowerCase.contains("text")))
      val (spreads, keyed) = textShuffles.partition(
        _._1.isInstanceOf[org.apache.spark.sql.catalyst.plans.physical.RoundRobinPartitioning])
      spreads.foreach { case (_, cols) =>
        assert(cols.size <= 3, s"parallelism spread ships unread columns: $cols")
      }
      assert(keyed.size <= 1,
        s"more than one keyed exchange ships text: ${keyed.map(_._2)}")
      keyed.foreach { case (p, _) =>
        assert(p.toString.toLowerCase.contains("doc_id"),
          s"text exchange not keyed by the doc id: $p")
      }
    } finally prev.fold(spark.conf.unset("spark.sql.adaptive.enabled"))(
      spark.conf.set("spark.sql.adaptive.enabled", _))
  }

  test("text_unigram_logprob: partial-aggregable, no collect_list, one occurrence-level exchange") {
    // the round-7 finding: the old plan shuffled the token stream twice and
    // buffered each doc's full (pos, logp) list in one aggregation buffer;
    // the micro-nat integer sum must plan as plain HashAggregates with at
    // most ONE exchange carrying occurrence rows (the toks ⋈ freqs join)
    val prev = spark.conf.getOption("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val df = graft.operators.TextAnalysis.withUnigramLogProb(
        spark.read.parquet(s"$dir/documents.parquet"), "doc_id", "text")
      val physical = df.queryExecution.executedPlan
      val plan = physical.toString
      assert(!plan.contains("collect_list") && !plan.contains("ObjectHashAggregate"),
        s"per-doc fold must be a plain partial-aggregable sum, not a buffered list:\n$plan")
      // exchanges carrying (id, token) pairs = occurrence-level; the
      // map-side-combined aggregates carry (token, count) / (id, count, sum)
      val occurrenceExchanges = physical.collect {
        case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
            if e.output.exists(_.name == "token") &&
               e.output.exists(_.name.contains("doc_id")) => e
      }
      assert(occurrenceExchanges.size <= 1,
        s"at most one occurrence-level shuffle allowed, found ${occurrenceExchanges.size}:\n$plan")
    } finally prev.fold(spark.conf.unset("spark.sql.adaptive.enabled"))(
      spark.conf.set("spark.sql.adaptive.enabled", _))
  }

  test("sim_topk_int8: quantize pipeline stays narrow — no hash exchange, top-k via TakeOrdered") {
    val plan = planOf("sim_topk_int8")
    assert(!plan.contains("Exchange hashpartitioning"),
      s"quantize → dequantize → cosine must be a projection pipeline:\n$plan")
    assert(plan.contains("TakeOrderedAndProject"),
      s"top-10 must plan as TakeOrderedAndProject:\n$plan")
  }

  test("gopher_full rules are a zero-shuffle narrow projection") {
    val df = graft.operators.TextAnalysis.withGopherRulesFull(
      spark.read.parquet(s"$dir/documents.parquet"), "text")
    val exchanges = df.queryExecution.executedPlan.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
    }
    assert(exchanges.isEmpty,
      s"every Gopher signal is a per-row fold — no exchange allowed: $exchanges")
  }

  test("domainStats is one map-side-combined aggregate keyed on the host") {
    import org.apache.spark.sql.functions._
    val prev = spark.conf.getOption("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val docs = spark.read.parquet(s"$dir/documents.parquet")
        .select(col("doc_id"), concat(lit("https://h"),
          (col("doc_id") % 5).cast("string"), lit(".org/p")).as("url"), col("text"))
      val physical = graft.operators.TextAnalysis.domainStats(docs, "url", "text")
        .queryExecution.executedPlan
      val exchanges = physical.collect {
        case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
      }
      assert(exchanges.size == 1, s"exactly one host-keyed exchange: $exchanges")
      assert(exchanges.head.output.map(_.name.toLowerCase).forall(c =>
        !c.contains("text") && !c.contains("url")),
        s"the aggregate exchange must carry (host, partials), not text/url: " +
          exchanges.head.output.map(_.name))
      assert(physical.toString.contains("HashAggregate"),
        "host counts must partial-aggregate map-side")
    } finally prev.fold(spark.conf.unset("spark.sql.adaptive.enabled"))(
      spark.conf.set("spark.sql.adaptive.enabled", _))
  }

  test("IVF-PQ final encode is projections over the cached corpus — no new exchange") {
    val model = graft.operators.SimSearch.trainIvfPq(
      spark.read.parquet(s"$dir/embeddings.parquet"), "vec_id", "embedding",
      nLists = 8, m = 16, ks = 16)
    try {
      // exchanges INSIDE the InMemoryRelation (the one-time ensureParallelism
      // of the training base, paid at fit) sit behind the InMemoryTableScan
      // leaf and are not part of this operator tree; the encode itself must
      // add no exchange on top of the cache scan
      val aboveCache = model.encoded.queryExecution.executedPlan.collect {
        case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
      }
      assert(aboveCache.isEmpty,
        s"PQ encode must be an in-row projection over the cached corpus: $aboveCache")
      // the frozen-model encode of NEW vectors (the streaming ingestion
      // path) must be zero-exchange over the raw scan — fully stateless
      val fresh = graft.operators.SimSearch.pqEncodeNew(model,
        spark.read.parquet(s"$dir/embeddings.parquet"), "vec_id", "embedding")
      val freshEx = fresh.queryExecution.executedPlan.collect {
        case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
      }
      assert(freshEx.isEmpty,
        s"frozen-model encode must be a stateless narrow projection: $freshEx")
    } finally graft.SparkUtil.releaseScopedCaches()
  }

  test("PQ re-rank ships only candidate rows: broadcast joins, no vector in any exchange") {
    val prev = spark.conf.getOption("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val df = graft.operators.SimSearch.pqRerankRecalls(
        spark.read.parquet(s"$dir/embeddings.parquet"), "vec_id", "embedding",
        nQueries = 3, k = 5, rerankC = 20, nLists = 8, nProbe = 4,
        m = 16, ks = 16)
      val plan = df.queryExecution.executedPlan
      // the bounded (qid, id) candidate list and query vectors broadcast
      // onto the scans — a sort-merge join TOUCHING the vectors would mean
      // the corpus reshuffled to meet candidate-sized data (the final
      // recall-compare join of the two per-query aggregates may merge-join;
      // it carries nQueries id-list rows, no vectors)
      val vecSmj = plan.collect {
        case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec
            if j.children.exists(_.output.exists(a => a.name == "v" || a.name == "qv")) => j
      }
      assert(vecSmj.isEmpty, s"re-rank joins must broadcast the bounded side: $vecSmj")
      // the only shuffles are the per-query top-k aggregates; none may
      // carry a full-precision vector (exchanges inside the cached
      // training base sit behind the InMemoryTableScan leaf)
      val shuffleOutputs = plan.collect {
        case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec =>
          e.output.map(_.name)
      }
      shuffleOutputs.foreach { cols =>
        assert(!cols.exists(c => c == "v" || c == "qv" || c == "sub"),
          s"an exchange ships a full-precision vector: $cols")
      }
    } finally {
      graft.SparkUtil.releaseScopedCaches()
      prev.fold(spark.conf.unset("spark.sql.adaptive.enabled"))(
        spark.conf.set("spark.sql.adaptive.enabled", _))
    }
  }

  test("dedup families: measured shuffle bytes stay decision-sized (5-family cap)") {
    // the ladder claims ("decision shuffles carry hashes/ids, never text")
    // asserted in BYTES, continuously: each family's total shuffle write at
    // sf0.001 is capped at ~4x its measured steady-state value. A regression
    // that ships text or signatures through an exchange lands megabytes at
    // this scale and trips the cap; suites run sequentially in the forked
    // test JVM, so the shared-context meter sees only this test's stages.
    val capsKb = Seq(
      "dedup_exact_keep" -> 128L,        // measured ~21 KB
      "dedup_minhash_pairs" -> 512L,     // measured ~90 KB
      "dedup_ngram_pairs" -> 1024L,      // measured ~236 KB
      "dedup_embedding_bucketed" -> 1024L, // measured ~136 KB
      // para dedup's decision shuffles are ~1 KB; the 220 KB here is the
      // surviving text crossing its ONE documented id-keyed enrich join
      // (full materialization, unlike the count()-pruned ladder readings)
      "text_para_dedup_global" -> 1024L,
      // the two round-11 measured regressions, pinned so they cannot
      // recur: IVF dedup scoring AFTER the pair-dedup shipped full
      // vectors (918 MB at sf0.1); the node-similarity 2-path join
      // without the super-node cap shipped deg(hub)² pairs (74 MB)
      "dedup_embedding_ivf" -> 2048L,
      "graph_node_jaccard" -> 2048L)
    val meter = new ShuffleMeter
    spark.sparkContext.addSparkListener(meter)
    try {
      for ((q, capKb) <- capsKb) {
        meter.reset()
        SparkEntry.queries(q)(spark, dir).queryExecution.toRdd.count()
        val (_, w) = meter.settle(spark.sparkContext)
        SparkUtil.releaseScopedCaches()
        assert(w <= capKb * 1024,
          s"$q shuffled ${w / 1024} KB (cap $capKb KB) — decision shuffle grew beyond plan-drift margin")
      }
    } finally spark.sparkContext.removeSparkListener(meter)
  }

  test("direct-mode featurize is a narrow plan: no exchange before the index") {
    val m = new graft.operators.MinHashLSH(
      MinHashConfig(numHash = 16, numBands = 4, numRows = 4))
      .fit(spark.read.parquet(s"$dir/documents.parquet"), "doc_id", "text")
    val plan = m.indexDf.queryExecution.executedPlan.toString
    // one RoundRobin repartition (ensureParallelism) is allowed; a
    // hash/range exchange would mean an accidental shuffle in the pipeline
    assert(!plan.contains("Exchange hashpartitioning") &&
      !plan.contains("Exchange rangepartitioning"),
      s"direct featurize must not shuffle:\n$plan")
    m.unpersist()
  }

  test("blockedFuzzyMatch candidates come from a hash equi-join on the block key") {
    // the Levenshtein predicate must stay a post-join filter — if the
    // block key ever left the join condition, Catalyst would plan the
    // theta-join as BNLJ and the candidate generator degrades to all-pairs
    val plan = planOf("er_blocked_match")
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"er_blocked_match must stay a block-key equi-join:\n$plan")
  }

  test("bbitSimilarityJoin: candidate exchanges carry packed longs, never signature arrays") {
    // the operator's whole point is exchange width — a plan that ships the
    // k-element signature arrays through the bucket join has silently
    // reverted to the approxSimilarityJoin wire format
    val df = SparkEntry.queries("dedup_bbit_pairs")(spark, dir)
    val plan = df.queryExecution.executedPlan
    assert(!plan.toString.contains("CartesianProduct") &&
      !plan.toString.contains("BroadcastNestedLoopJoin"),
      "candidates must come from the bucket equi-join")
    val shuffled = plan.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec =>
        e.output
    }
    shuffled.foreach { attrs =>
      attrs.foreach { a =>
        assert(a.name != graft.Cols.Signature &&
          !a.dataType.isInstanceOf[org.apache.spark.sql.types.ArrayType],
          s"an exchange ships an array/signature column: ${attrs.map(_.name)}")
      }
    }
    SparkUtil.releaseScopedCaches()
  }

  test("round-12 pair generators stay equi-joins; media exchanges never ship payloads") {
    // every candidate generator added this round must ride a key equi-join
    // (band/cell/hash), never a product join; and the media pipelines'
    // exchanges must carry decision scalars only — pixels, PCM samples,
    // and payload binaries stay inside their scan task
    for (q <- Seq("dedup_video_phash", "dedup_audio_fingerprint",
        "audio_match_offset", "dedup_semantic_cells", "dedup_cdc_chunks",
        "cdc_maintain_agg", "graph_kcore")) {
      val plan = SparkEntry.queries(q)(spark, dir)
        .queryExecution.executedPlan
      assert(!plan.toString.contains("CartesianProduct") &&
        !plan.toString.contains("BroadcastNestedLoopJoin"),
        s"$q: candidates must come from an equi-join:\n$plan")
      if (q.startsWith("dedup_video") || q.contains("audio")) {
        val shuffled = plan.collect {
          case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec =>
            e.output
        }
        shuffled.foreach(_.foreach { a =>
          assert(!a.dataType.isInstanceOf[org.apache.spark.sql.types.BinaryType.type],
            s"$q: an exchange ships binary payloads: ${a.name}")
        })
      }
      SparkUtil.releaseScopedCaches()
      spark.catalog.clearCache()
    }
  }

  test("ann_batch_colocated: posting side joins exchange-free beyond broadcast reach") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.execution.SparkPlan
    // at gate scale the tiny workload broadcasts and NEITHER path shuffles
    // the postings; the co-location claim is about the regime past the
    // broadcast ceiling (a big workload against a 100 TB index), so probe
    // the static plan with broadcast off: the file-bucketed table's scan
    // must satisfy the join's distribution by itself, while the unbucketed
    // twin pays a posting-side Exchange (the contrast proves the assert
    // isn't vacuous)
    def postingSideExchanges(query: String, tableRe: String): Int = {
      // executedPlan (post-EnsureRequirements, AQE off below) — sparkPlan
      // predates Exchange insertion and would assert vacuously
      val plan = SparkEntry.queries(query)(spark, dir).queryExecution.executedPlan
      val joins = plan.collect {
        case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec => j
        case j: org.apache.spark.sql.execution.joins.ShuffledHashJoinExec => j
      }
      def scansPostings(p: SparkPlan): Boolean = p.collectFirst {
        case f: FileSourceScanExec
            if f.tableIdentifier.exists(_.table.matches(tableRe)) => f
      }.isDefined
      val sides = joins.flatMap(j => Seq(j.children(0), j.children(1)))
        .filter(scansPostings)
      assert(sides.nonEmpty, s"$query: no shuffled join over the posting table found")
      // count shuffles OUTSIDE broadcast subtrees: a maintained table's
      // tombstone max-seq aggregate shuffles its tiny marker partition
      // inside a BroadcastExchange — takedown-sized, not posting-sized —
      // and must not fail the "no exchange over the 100 TB side" claim
      def shufflesOutsideBroadcast(p: SparkPlan): Int = p match {
        case _: org.apache.spark.sql.execution.exchange.BroadcastExchangeExec => 0
        case e: ShuffleExchangeExec =>
          1 + e.children.map(shufflesOutsideBroadcast).sum
        case other => other.children.map(shufflesOutsideBroadcast).sum
      }
      sides.map(shufflesOutsideBroadcast).sum
    }
    val oldB = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val oldA = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      assert(postingSideExchanges("ann_batch_colocated",
        "graft_ann_inverted_.*_b32_.*") == 0,
        "bucketed posting side must join without an Exchange")
      // the SAME property after the full maintenance lifecycle: the gate
      // tombstones + compacts its numBuckets=32 table before this plan is
      // built, so a spec-less rewrite would surface here as an Exchange
      // (or an invalid-bucket-file read) — the round-14 weak finding
      assert(postingSideExchanges("ann_batch_colocated_deleted",
        "graft_ann_colodel_.*") == 0,
        "the exchange-free property must survive tombstone + compaction")
      assert(postingSideExchanges("ann_batch_indexed",
        "graft_ann_inverted_16_4x4_2_md5parity__.*") > 0,
        "contrast broken: the unbucketed twin no longer shuffles — update this test")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", oldB)
      spark.conf.set("spark.sql.adaptive.enabled", oldA)
    }
    SparkUtil.releaseScopedCaches()
  }

  test("ann_index_fresh: cutoff/tombstone resolution stays broadcast — the pruned point plan survives an uncompacted backlog") {
    // the supersession-cutoff and tombstone frames must join as
    // broadcasts above the partition-pruned scan; a silent flip to a
    // sort-merge would shuffle the matched postings per point query
    val df = SparkEntry.queries("ann_index_fresh")(spark, dir)
    val plan = df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(plan.matches("(?s).*PartitionFilters: \\[[^\\]]*bkt_pfx[^\\]]*\\].*"),
      s"the fresh serve must keep the pruned point scan:\n$plan")
    val physical = df.queryExecution.executedPlan
    val smjOverPostings = physical.collect {
      case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec
          if j.children.exists(_.collectFirst {
            case f: org.apache.spark.sql.execution.FileSourceScanExec
                if f.tableIdentifier.exists(_.table.startsWith("graft_ann_fresh")) => f
          }.isDefined) => j
    }
    assert(smjOverPostings.isEmpty,
      s"cutoff/tombstone joins over the posting scan must broadcast: $smjOverPostings")
    SparkUtil.releaseScopedCaches()
  }

  test("past the cutoff broadcast budget the serve degrades to an id-keyed shuffle join — same answers, never an unbounded broadcast") {
    // the supersession backlog is workload-sized (one row per id appended
    // since the last compaction), so unlike the takedown-sized tombstone
    // frame it must NOT broadcast unconditionally: past
    // graft.serve.cutoffBroadcastMaxBytes the cutoff join flips to
    // SHUFFLE_HASH — the plan degrades, the driver never inflates an
    // unbounded build side, and the answers are bit-identical
    val base = SparkEntry.queries("ann_index_fresh")(spark, dir).collect().toSeq
    spark.conf.set("graft.serve.cutoffBroadcastMaxBytes", "1")
    try {
      val df = SparkEntry.queries("ann_index_fresh")(spark, dir)
      assert(df.collect().toSeq == base,
        "the degraded plan must answer identically to the broadcast plan")
      val plan = df.queryExecution.explainString(
        ExplainMode.fromString("formatted"))
      assert(plan.contains("ShuffledHashJoin"),
        s"a 1-byte budget must flip the cutoff join to shuffle-hash:\n$plan")
    } finally spark.conf.unset("graft.serve.cutoffBroadcastMaxBytes")
    SparkUtil.releaseScopedCaches()
  }

  test("ann_batch_pruned: small-batch serving prunes the posting scan like a point query") {
    val plan = planOf("ann_batch_pruned")
    assert(plan.matches("(?s).*PartitionFilters: \\[[^\\]]*bkt_pfx[^\\]]*\\].*"),
      s"the pruned batch scan must carry bkt_pfx PartitionFilters:\n$plan")
    assert(plan.matches("(?s).*PushedFilters: \\[[^\\]]*bucket[^\\]]*\\].*"),
      s"bucket IN must be pushed to the parquet reader:\n$plan")
    // results identical to the unpruned form on the same 5-query slice
    val spark2 = spark
    import spark2.implicits._
    import org.apache.spark.sql.functions._
    val pruned = SparkEntry.queries("ann_batch_pruned")(spark, dir).collect().toSeq
    val full = SparkEntry.queries("ann_batch_indexed")(spark, dir)
      .where(col("qid") < 5).collect().toSeq
    assert(pruned == full, "pruning must never change the batch answer")
    SparkUtil.releaseScopedCaches()
  }

  test("ann_query_hotskip: hot buckets never reach the posting scan") {
    import org.apache.spark.sql.functions._
    import graft.operators.MinHashLSH
    // build the gate's table + serve plan (the gate resets + rebuilds)
    val df = SparkEntry.queries("ann_query_hotskip")(spark, dir)
    val table = "graft_ann_hotskip_" +
      dir.replaceAll("[^A-Za-z0-9]", "_").toLowerCase(java.util.Locale.ROOT)
    // recompute the policy inputs from the table's own artifacts
    val hot = graft.sources.IndexStore.hotBuckets(spark, table)
    assert(hot.nonEmpty, "planted boiler corpus must produce hot buckets")
    val cfg = MinHashConfig(numHash = 16, numBands = 4, numRows = 4, bucketHexLen = 2)
    val key0 = spark.read.parquet(s"$dir/documents.parquet")
      .where(col("doc_id") === 0).select(col("text")).collect()(0).getString(0).take(60)
    val m = new MinHashLSH(cfg).fit(
      spark.createDataFrame(Seq((0L, SparkEntry.hotBoiler + " " + key0)))
        .toDF("id", "text"), "id", "text")
    val qBuckets = m.indexDf.select(col(Cols.BucketIds)).collect()(0).getSeq[String](0)
    m.unpersist()
    val (qHot, qLive) = qBuckets.distinct.partition(hot)
    // the construction must exercise a REAL skip with surviving buckets
    // (measured 2 hot / 2 live at both test scales — see the gate comment)
    assert(qHot.nonEmpty, s"query must touch the hot list (buckets=$qBuckets hot=$hot)")
    assert(qLive.nonEmpty, s"query must keep live buckets (buckets=$qBuckets hot=$hot)")
    // plan evidence: the scan's PartitionFilters carry ONLY the live
    // prefixes (prefixLen == bucketHexLen here, so prefix == bucket) —
    // the hot bucket's directory is never opened, let alone fully read
    val plan = df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    val pf = plan.linesIterator.filter(_.contains("PartitionFilters"))
      .mkString("\n")
    assert(pf.nonEmpty, s"posting scan must carry PartitionFilters:\n$plan")
    qHot.foreach(b => assert(!pf.contains(b),
      s"hot bucket $b leaked into the partition probe:\n$pf"))
    qLive.foreach(b => assert(pf.contains(b),
      s"live bucket $b missing from the partition probe:\n$pf"))
    SparkUtil.releaseScopedCaches()
    spark.catalog.clearCache()
  }

  test("pinned point serve scans only probed pinned files with the bucket IN pushed; pruned and unpruned pinned batches answer identically") {
    import org.apache.spark.sql.functions._
    import graft.operators.MinHashLSH
    // running the gate builds (and memoizes) the pinned lifecycle table
    SparkEntry.queries("ann_snapshot_pin")(spark, dir).collect()
    val table = "graft_ann_pin_" + dir.replaceAll("[^A-Za-z0-9]", "_")
      .toLowerCase(java.util.Locale.ROOT)
    val cfg = MinHashConfig(numHash = 16, numBands = 4, numRows = 4,
      bucketHexLen = 2)
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val key = docs.where(col("doc_id") === 0)
      .select(substring(col("text"), 1, 120)).collect()(0).getString(0)
    val pinnedDf = MinHashLSH.annFromInvertedIndex(spark, table, docs,
      "doc_id", "text", key, 10, cfg, Some("train_v1"))
    val plan = pinnedDf.queryExecution
      .explainString(ExplainMode.fromString("formatted"))
    // the pinned scan keeps the live serve's point-query shape: the
    // bucket equality reaches the parquet reader as a pushed IN, and the
    // scan is over the pin's (driver-subset) file list — never a filter
    // above a whole-inventory read
    assert(plan.matches("(?s).*PushedFilters: \\[[^\\]]*[Ii][Nn]\\(bucket[^\\]]*\\].*"),
      s"expected the bucket IN pushed into the pinned scan:\n$plan")
    assert(pinnedDf.count() > 0)

    // batch twins: the pruned pinned path answers exactly as the
    // unpruned pinned path (same rows, same ranks)
    val m = new MinHashLSH(cfg).fit(
      docs.select(col("doc_id").cast("long").as(Cols.Id),
        col("text").as(Cols.Text)), Cols.Id, Cols.Text)
    val qs = docs.where(col("doc_id") < 10)
      .select(col("doc_id").as("qid"), col("text"))
    def rows(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, Float, Int)] =
      df.select(col("qid"), col(Cols.Id), col(Cols.Jaccard), col("rank"))
        .collect().map(r =>
          (r.getLong(0), r.getLong(1), r.getFloat(2), r.getInt(3))).toSet
    val unpruned = rows(m.approxNearestNeighborsAllIndexed(table, qs,
      "qid", "text", 5, skipHotBuckets = false, Some("train_v1")))
    val pruned = rows(m.approxNearestNeighborsAllIndexedPruned(table, qs,
      "qid", "text", 5, skipHotBuckets = false, Some("train_v1")))
    assert(unpruned.nonEmpty && pruned == unpruned,
      s"pruned pinned batch must equal the unpruned pinned batch: " +
        s"${pruned.size} vs ${unpruned.size}")
    m.unpersist()
    SparkUtil.releaseScopedCaches()
    spark.catalog.clearCache()
  }
}
