package graft.operators

import graft.functions.{VectorFunctions => V}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column. */
object SimSearch {

  /** Brute-force cosine top-k against the vector of `queryId` — the exact
    * baseline. The 1-row query side is broadcast; the scan side stays
    * columnar-parallel (no shuffle, TakeOrderedAndProject top-k).
    */
  def cosineTopK(emb: DataFrame, idCol: String, vecCol: String,
      queryId: Long, k: Int): DataFrame =
    cosineScores(emb, idCol, vecCol, queryId)
      .orderBy(col("cosine").desc, col("id").asc)
      .limit(k)

  /** Cosine of EVERY vector against `queryId`, uncut — the scoring core of
    * [[cosineTopK]], exposed so callers that rank on the 6-dp-ROUNDED
    * score (e.g. [[TextSearch.hybridRrfTopK]]) can apply their own
    * deterministic cut instead of inheriting the raw-double ordering.
    * Output: (id, cosine) for all ids except the query itself.
    */
  def cosineScores(emb: DataFrame, idCol: String, vecCol: String,
      queryId: Long): DataFrame = {
    val q = emb.where(col(idCol) === queryId)
      .select(col(vecCol).as("q_v"))
    graft.SparkUtil.ensureParallelism(emb).crossJoin(broadcast(q))
      .withColumn("cosine", V.cosine(col(vecCol), col("q_v")))
      .where(col(idCol) =!= queryId)
      .select(col(idCol).cast("long").as("id"), col("cosine"))
  }

  /** Leave-one-out kNN-classifier confusion matrix — the label-quality
    * eval run before trusting a labeled embedding set (a strong diagonal
    * means the labels are learnable; off-diagonal mass names the
    * confused class pairs): every vector is classified by majority vote
    * of its [[knnGraphBucketed]] neighbors' labels (vote-count ties break
    * to the smallest label; vectors with no in-bucket neighbor get a
    * null prediction and stay visible). Output: (true_label,
    * pred_label, n).
    *
    * Scale shape: the kNN join keeps its own documented bucket-blocked
    * shape; everything after moves (id, label, count) decision rows —
    * votes partial-aggregate map-side, the argmax is one max(struct)
    * per vector, and the confusion rollup is labels² rows.
    */
  def knnLabelConfusion(emb: DataFrame, idCol: String, vecCol: String,
      labelCol: String, k: Int, nBits: Int = 8): DataFrame = {
    val labels = emb.select(col(idCol).cast("long").as("__id"),
      col(labelCol).cast("long").as("__lab"))
    val votes = knnGraphBucketed(emb, idCol, vecCol, k, nBits)
      .join(labels.select(col("__id").as("b_id"), col("__lab").as("__blab")),
        Seq("b_id"))
      .groupBy(col("a_id"), col("__blab")).agg(count(lit(1)).as("__v"))
      .select(col("a_id"),
        struct(col("__v"), (-col("__blab")).as("__nl")).as("__p"))
      .groupBy("a_id").agg(max(col("__p")).as("__best"))
      .select(col("a_id").as("__id"), (-col("__best.__nl")).as("pred_label"))
    labels.join(votes, Seq("__id"), "left")
      .groupBy(col("__lab").as("true_label"), col("pred_label"))
      .agg(count(lit(1)).as("n"))
  }

  /** One-row eval summary over [[knnLabelConfusion]]: accuracy (null
    * predictions count as errors) and MACRO-F1 — per-class
    * `2·tp/(2·tp+fp+fn)` (0 when the denominator is 0) averaged over the
    * true classes, with each class F1 micro-quantized before the average
    * so the mean is an exact integer division. Output:
    * (n_total, n_correct, accuracy6, macro_f1_6).
    */
  def knnEvalSummary(emb: DataFrame, idCol: String, vecCol: String,
      labelCol: String, k: Int, nBits: Int = 8): DataFrame = {
    val cm = knnLabelConfusion(emb, idCol, vecCol, labelCol, k, nBits)
      .transform(graft.SparkUtil.scopedPersist)
    val tp = cm.where(col("pred_label") === col("true_label"))
      .select(col("true_label").as("cls"), col("n").as("__tp"))
    val fn = cm.groupBy(col("true_label").as("cls"))
      .agg(sum(when(col("pred_label").isNull ||
        col("pred_label") =!= col("true_label"), col("n")).otherwise(lit(0L)))
        .as("__fn"))
    val fp = cm.where(col("pred_label").isNotNull &&
        col("pred_label") =!= col("true_label"))
      .groupBy(col("pred_label").as("cls")).agg(sum(col("n")).as("__fp"))
    val perClass = fn // every true class appears here
      .join(tp, Seq("cls"), "left").join(fp, Seq("cls"), "left")
      .select(col("cls"),
        coalesce(col("__tp"), lit(0L)).as("t"),
        col("__fn").as("f"), coalesce(col("__fp"), lit(0L)).as("p"))
      .withColumn("__f1m",
        when(lit(2) * col("t") + col("p") + col("f") > 0,
          round(lit(2.0) * col("t") / (lit(2) * col("t") + col("p") + col("f"))
            * 1e6).cast("long"))
          .otherwise(lit(0L)))
    val macroF1 = perClass.agg(count(lit(1)).as("__k"), sum(col("__f1m")).as("__s"))
      .select((round(col("__s").cast("double") / col("__k")).cast("long")
        .cast("double") / 1e6).as("macro_f1_6"))
    val acc = cm.agg(sum(col("n")).as("n_total"),
        sum(when(col("pred_label") === col("true_label"), col("n"))
          .otherwise(lit(0L))).as("n_correct"))
      .withColumn("accuracy6",
        round(col("n_correct").cast("double") / col("n_total"), 6))
    acc.crossJoin(macroF1)
  }

  /** Micro-quantized per-label centroids of a (__lc_l, __lc_v) frame:
    * (label, n_vecs, centroid) with per-element sums rounded to integer
    * micro units BEFORE the divide — bit-stable under any partitioning.
    */
  private def microCentroids(vecs: DataFrame): DataFrame =
    vecs.select(col("__lc_l"),
        posexplode(col("__lc_v")).as(Seq("__lc_d", "__lc_x")))
      .groupBy("__lc_l", "__lc_d")
      .agg(round(sum(col("__lc_x")) * 1e6).cast("long").as("sm"),
        count(lit(1)).as("nd"))
      .groupBy("__lc_l")
      .agg(max(col("nd")).as("n_vecs"),
        array_sort(collect_list(struct(col("__lc_d").as("d"), col("sm").as("sm"))))
          .as("__lc_pairs"))
      .withColumn("__lc_c",
        transform(col("__lc_pairs"),
          s => s.getField("sm").cast("double") / 1e6 / col("n_vecs")))
      .select(col("__lc_l"), col("n_vecs"), col("__lc_c"))

  /** Per-label embedding QA report — the class-separation audit a
    * classifier-dataset pipeline runs before training: per label, the
    * member count, centroid norm, intra-class cohesion (mean and worst
    * member-to-centroid cosine) and the nearest CONFUSABLE class (the
    * other label whose centroid is most cosine-similar). Labels with
    * high nearest-other cosine and low cohesion are the mislabeled or
    * entangled classes.
    *
    * Determinism: per-element centroid sums quantize to integer micro
    * units BEFORE the divide (partial-aggregation order cannot move
    * them), so centroids — and every cosine derived from them — are
    * bit-identical across engines and cluster sizes; per-member cosines
    * quantize to micro units so the per-label mean is an exact integer
    * average (the micro-nat LM convention).
    *
    * Scale shape: the centroid pass is one map-side-combined (label, dim)
    * aggregate — decision-sized rows, vectors never shuffle; the bounded
    * (#labels) centroid table broadcasts back onto the scan for the
    * cohesion pass, and the confusability pass is a #labels² self-join
    * of that same bounded table.
    */
  def labelCentroidStats(emb: DataFrame, idCol: String, vecCol: String,
      labelCol: String): DataFrame = {
    val vecs = graft.SparkUtil.ensureParallelism(
        emb.select(col(labelCol).cast("long").as("__lc_l"),
          transform(col(vecCol), x => x.cast("double")).as("__lc_v")))
      .transform(graft.SparkUtil.scopedPersist)
    val cent = microCentroids(vecs)
    val cohesion = vecs.join(broadcast(cent), Seq("__lc_l"))
      .withColumn("__lc_cm",
        round(V.cosine(col("__lc_v"), col("__lc_c")) * 1e6).cast("long"))
      .groupBy("__lc_l")
      .agg(sum("__lc_cm").as("__lc_s"), count(lit(1)).as("__lc_n"),
        min("__lc_cm").as("__lc_mn"))
      .select(col("__lc_l"),
        (round(col("__lc_s").cast("double") / col("__lc_n")).cast("long")
          .cast("double") / 1e6).as("mean_cos6"),
        (col("__lc_mn").cast("double") / 1e6).as("min_cos6"))
    val confus = cent.select(col("__lc_l").as("la"), col("__lc_c").as("ca"))
      .join(cent.select(col("__lc_l").as("lb"), col("__lc_c").as("cb")),
        col("la") =!= col("lb"))
      .select(col("la"),
        struct(round(V.cosine(col("ca"), col("cb")), 6).as("c6"),
          (-col("lb")).as("nl")).as("__lc_p"))
      .groupBy("la").agg(max(col("__lc_p")).as("__lc_best"))
      .select(col("la").as("__lc_l"),
        (-col("__lc_best.nl")).as("nn_label"),
        col("__lc_best.c6").as("nn_cos6"))
    cent.select(col("__lc_l").as(labelCol), col("n_vecs"),
        round(sqrt(aggregate(col("__lc_c"), lit(0.0), (a, x) => a + x * x)), 6)
          .as("centroid_norm6"))
      .join(cohesion.withColumnRenamed("__lc_l", labelCol), Seq(labelCol))
      .join(confus.withColumnRenamed("__lc_l", labelCol), Seq(labelCol))
  }

  /** Per-member outlier flags against the label's cosine distribution —
    * the mislabeled-point detector companion of [[labelCentroidStats]]: a
    * member is flagged when its centroid-cosine sits more than `sigmas`
    * population standard deviations BELOW the label mean. The decision is
    * EXACT INTEGER ARITHMETIC end to end: member cosines quantize to
    * micro units, and `x < μ − kσ` is evaluated as the cross-multiplied
    * `S − n·x > 0 AND (S − n·x)² > k²·(n·Q − S²)` over the exact sums
    * S = Σx, Q = Σx² (DECIMAL(38,0) — the squared terms exceed long at
    * corpus scale), so no sqrt or double division can flip a boundary
    * between engines. Output: every member with (label, id, cos6,
    * is_outlier).
    *
    * Scale shape: one (label, dim) centroid aggregate + one broadcast of
    * the bounded centroid table + one map-side-combined (label) stats
    * aggregate broadcast back — vectors never cross an exchange.
    */
  def labelCosineOutliers(emb: DataFrame, idCol: String, vecCol: String,
      labelCol: String, sigmas: Int = 2): DataFrame = {
    require(sigmas >= 1, s"sigmas must be >= 1, got $sigmas")
    val vecs = graft.SparkUtil.ensureParallelism(
        emb.select(col(idCol).cast("long").as("__lo_id"),
          col(labelCol).cast("long").as("__lc_l"),
          transform(col(vecCol), x => x.cast("double")).as("__lc_v")))
      .transform(graft.SparkUtil.scopedPersist)
    val cent = microCentroids(vecs.select(col("__lc_l"), col("__lc_v")))
    val cm = vecs.join(broadcast(cent), Seq("__lc_l"))
      .select(col("__lc_l"), col("__lo_id"),
        round(V.cosine(col("__lc_v"), col("__lc_c")) * 1e6).cast("long").as("__lo_cm"))
      .transform(graft.SparkUtil.scopedPersist)
    val stats = cm.groupBy("__lc_l").agg(
      sum(col("__lo_cm")).as("__lo_s"), count(lit(1)).as("__lo_n"),
      sum(col("__lo_cm").cast("decimal(38,0)") * col("__lo_cm")).as("__lo_q"))
    cm.join(broadcast(stats), Seq("__lc_l"))
      .withColumn("__lo_d",
        (col("__lo_s") - col("__lo_n") * col("__lo_cm")).cast("decimal(38,0)"))
      .select(col("__lc_l").as(labelCol), col("__lo_id").as(idCol),
        (col("__lo_cm").cast("double") / 1e6).as("cos6"),
        (col("__lo_d") > 0 &&
          col("__lo_d") * col("__lo_d") >
            lit(sigmas.toLong * sigmas) *
              (col("__lo_n").cast("decimal(38,0)") * col("__lo_q") -
                col("__lo_s").cast("decimal(38,0)") * col("__lo_s")))
          .as("is_outlier"))
  }

  /** Sign-quantizer-bucketed top-k (IVF-style single-probe scale path):
    * only the query's own quantizer cell is scanned — at scale the bucket
    * column is a partition/cluster key, so the probe prunes input files
    * instead of scanning the corpus.
    */
  def cosineTopKBucketed(emb: DataFrame, idCol: String, vecCol: String,
      queryId: Long, k: Int, nBits: Int = 8): DataFrame = {
    val withB = graft.SparkUtil.ensureParallelism(
      emb.select(col(idCol).cast("long").as("id"), col(vecCol).as("v"),
        V.signBucket(col(vecCol), nBits).as("bucket")))
    val q = withB.where(col("id") === queryId)
      .select(col("v").as("q_v"), col("bucket"))
    withB.join(broadcast(q), Seq("bucket"))
      .where(col("id") =!= queryId)
      .withColumn("cosine", V.cosine(col("v"), col("q_v")))
      .select(col("id"), col("bucket"), col("cosine"))
      .orderBy(col("cosine").desc, col("id").asc)
      .limit(k)
  }

  /** IVF top-k: k-means inverted lists with distributed Lloyd training.
    *
    * Training is deterministic (seeds = the `nLists` lowest-id vectors,
    * fixed iteration count): each iteration assigns every vector to its
    * nearest centroid with a broadcast-literal `transform` + argmax (pure
    * expressions, no UDF) and recomputes centroids as per-cell element
    * means via posexplode → groupBy(cell, dim) — one shuffle of (cell, dim,
    * value) triples per iteration, never the vectors themselves. Only the
    * (nLists × dim) centroid table ever reaches the driver.
    *
    * Search probes the `nProbe` lists nearest the query vector: at cluster
    * scale `cell` is the partition/cluster key, so the probe prunes files
    * and scans nProbe/nLists of the corpus. `nProbe = nLists` degenerates
    * to exact brute force (recall invariant pinned in OperatorSpec).
    */
  def cosineTopKIvf(emb: DataFrame, idCol: String, vecCol: String,
      queryId: Long, k: Int, nLists: Int = 16, nProbe: Int = 4,
      iters: Int = 2): DataFrame = {
    val model = trainIvf(emb, idCol, vecCol, nLists, iters)
    val qv = emb.where(col(idCol) === queryId).select(col(vecCol)).collect()(0)
      .getSeq[Float](0).map(_.toDouble)
    model.query(qv, k, nProbe, excludeId = Some(queryId))
  }

  /** ATTRIBUTE-FILTERED ANN: train the IVF index, attach the attribute
    * table, and answer predicate + top-k with the filter pushed inside
    * the probed cells ([[IvfModel.queryFiltered]] — filter BEFORE
    * distance ranking; post-ranking filtering under-retrieves). At
    * `nProbe = nLists` this degenerates to EXACT filtered brute force
    * (the oracle-pairable configuration); at `nProbe < nLists` it is the
    * approximate scale path whose recall [[ivfFilteredRecallEval]] gates.
    */
  def cosineTopKIvfFiltered(emb: DataFrame, idCol: String, vecCol: String,
      attrs: DataFrame, attrIdCol: String, predicate: Column, queryId: Long,
      k: Int, nLists: Int = 16, nProbe: Int = 4, iters: Int = 2): DataFrame = {
    val model = trainIvf(emb, idCol, vecCol, nLists, iters)
      .withAttributes(attrs, attrIdCol)
    val qv = emb.where(col(idCol) === queryId).select(col(vecCol)).collect()(0)
      .getSeq[Float](0).map(_.toDouble)
    model.queryFiltered(qv, k, nProbe, predicate, excludeId = Some(queryId))
  }

  /** ATTRIBUTE-FILTERED ANN over a query WORKLOAD — production retrieval
    * is a batch, not a point lookup (the `text_phrase_batch` convention):
    * every query explodes into its `nProbe` nearest cells and ONE shared
    * cell equi-join scans the predicate-filtered corpus for the whole
    * workload — queries × corpus never materializes, per-query work is
    * its probed cells only, and the driver never loops (a per-query
    * [[cosineTopKIvfFiltered]] loop would retrain/rescan per query).
    * The filter lands INSIDE the cell scan, before distance ranking.
    *
    * At `nProbe = nLists` the probe degenerates to the exact filtered
    * scan (the oracle-pairable configuration); at `nProbe < nLists` it is
    * the approximate scale path whose per-query recall
    * [[ivfFilteredRecallEval]] floor-gates against filtered brute force.
    * Returns (qid, id, cosine) rows, top-k per query ranked by
    * (cosine desc, id asc) via the [[graft.functions.TopKAgg]] partial
    * aggregate — candidates reduce map-side, only k survivors per
    * (partition, qid) reach the final exchange.
    */
  def cosineTopKIvfFilteredBatch(emb: DataFrame, idCol: String,
      vecCol: String, attrs: DataFrame, attrIdCol: String,
      predicate: Column, queryIds: Seq[Long], k: Int, nLists: Int = 16,
      nProbe: Int = 4, iters: Int = 2): DataFrame = {
    import graft.functions.ArrayKernels.dotProduct
    require(queryIds.nonEmpty, "batch ANN needs at least one query id")
    val model = trainIvf(emb, idCol, vecCol, nLists, iters)
      .withAttributes(attrs, attrIdCol)
    val base = model.assigned
    val filtered = base.where(predicate)
    val q = base.where(col("id").isInCollection(queryIds))
      .select(col("id").as("qid"), col("v").as("qv"))
    val cents = typedlit(model.centroids)
    val sims = transform(cents, c => dotProduct(col("qv"), c))
    val ranked = sort_array(zip_with(sims,
      sequence(lit(0), lit(nLists - 1)),
      (s, i) => struct((-s).as("negs"), i.as("idx"))))
    val qp = q.withColumn("cell",
      explode(slice(transform(ranked, r => r.getField("idx")), 1, nProbe)))
    filtered.join(broadcast(qp), Seq("cell"))
      .where(col("id") =!= col("qid"))
      .select(col("qid"), col("id"),
        V.cosine(col("v"), col("qv")).as("cosine"))
      .groupBy("qid")
      .agg(graft.functions.TopKAgg.topK(col("cosine"), col("id"), k).as("tk"))
      .select(col("qid"), explode(col("tk")).as("e"))
      .select(col("qid"), col("e.id").as("id"), col("e.score").as("cosine"))
  }

  /** Recall@k of the FILTERED IVF probe against exact FILTERED brute
    * force ([[ivfRecallEval]] pattern — one plan, no per-query driver
    * loop): both sides restrict candidates to the predicate before
    * ranking, the IVF side additionally prunes to each query's `nProbe`
    * cells, and the tolerance boolean is the oracle-checkable claim
    * (Lloyd centroids are engine-internal doubles). Queries are NOT
    * themselves predicate-restricted — a query vector may legitimately
    * search a slice it does not belong to.
    */
  def ivfFilteredRecallEval(emb: DataFrame, idCol: String, vecCol: String,
      attrs: DataFrame, attrIdCol: String, predicate: Column,
      nQueries: Int, k: Int, nLists: Int = 16, nProbe: Int = 8,
      iters: Int = 2, recallFloor: Double = 0.5): DataFrame = {
    import graft.functions.ArrayKernels.dotProduct
    val model = trainIvf(emb, idCol, vecCol, nLists, iters)
      .withAttributes(attrs, attrIdCol)
    val base = model.assigned
    // the filtered candidate corpus feeds BOTH rankings — the recall twin
    // must measure cell pruning, not the predicate
    val filtered = base.where(predicate)
    val q = base.where(col("id") < nQueries)
      .select(col("id").as("qid"), col("v").as("qv"))
    val cents = typedlit(model.centroids)
    val sims = transform(cents, c => dotProduct(col("qv"), c))
    val ranked = sort_array(zip_with(sims,
      sequence(lit(0), lit(nLists - 1)),
      (s, i) => struct((-s).as("negs"), i.as("idx"))))
    val qp = q.withColumn("cell",
      explode(slice(transform(ranked, r => r.getField("idx")), 1, nProbe)))
    def topIds(cands: DataFrame, outCol: String): DataFrame = cands
      .where(col("id") =!= col("qid"))
      .select(col("qid"), col("id"),
        graft.functions.VectorFunctions.cosine(col("v"), col("qv")).as("c"))
      .groupBy("qid")
      .agg(graft.functions.TopKAgg.topK(col("c"), col("id"), k).as("tk"))
      .select(col("qid"), transform(col("tk"), x => x.getField("id")).as(outCol))
    val ivf = topIds(filtered.join(broadcast(qp), Seq("cell")), "ivf_ids")
    val brute = topIds(filtered.crossJoin(broadcast(q)), "ids")
    brute.join(ivf, Seq("qid"), "left")
      .select(col("qid"),
        (coalesce(size(array_intersect(col("ivf_ids"), col("ids"))), lit(0))
          .cast("double") / least(size(col("ids")), lit(k)) >= recallFloor)
          .as("recall_ok"))
  }

  /** Top-`probes` centroid cells of `v` by MICRO-ROUNDED dot product,
    * lowest index winning ties — the pinned (engine-reproducible, SQL-
    * replayable) assignment shared by [[graft.operators.Dedup
    * .semanticDedupCells]] and the streaming dedup gate. One evaluation
    * of the similarity array + one nLists-element sort per row (the
    * ranked-slice pattern); raw-double argmax drifts at ties.
    */
  def pinnedCellsExpr(v: Column, cents: Column, nLists: Int,
      probes: Int): Column = {
    import graft.functions.ArrayKernels.dotProduct
    val simsR = transform(cents, c => round(dotProduct(v, c) * 1e6).cast("long"))
    slice(transform(sort_array(zip_with(simsR,
      sequence(lit(0), lit(nLists - 1)),
      (s, i) => struct((-s).as("negs"), i.as("idx")))),
      r => r.getField("idx")), 1, probes)
  }

  /** Train the IVF index once (Lloyd as above) and keep it as a model —
    * index construction is infrastructure, queries are the workload.
    */
  def trainIvf(emb: DataFrame, idCol: String, vecCol: String,
      nLists: Int = 16, iters: Int = 2): IvfModel = {
    import graft.functions.ArrayKernels.dotProduct
    require(nLists >= 1)
    val base = graft.SparkUtil.ensureParallelism(
      emb.select(col(idCol).cast("long").as("id"), col(vecCol).as("v")))
      // feeds every Lloyd iteration + the final probe scan; stays
      // recomputable under eviction (unlike a truncated-lineage checkpoint).
      // scopedPersist: also registered for the harness sweep — a one-shot
      // query must not leave the training cache pinned (model.unpersist
      // remains the explicit release for long-lived models)
      .transform(graft.SparkUtil.scopedPersist)
    def normalized(c: Array[Double]): Seq[Double] = {
      val n = math.sqrt(c.map(x => x * x).sum)
      (if (n == 0) c else c.map(_ / n)).toSeq
    }
    // deterministic seeds: the nLists lowest-id vectors
    var centroids: Seq[Seq[Double]] = base.orderBy("id").limit(nLists)
      .select("v").collect()
      .map(r => normalized(r.getSeq[Float](0).map(_.toDouble).toArray)).toSeq
    def withCell(df: DataFrame): DataFrame = assignCells(df, centroids)
    for (_ <- 1 to iters) {
      val dims = withCell(base).select(col("cell"), posexplode(col("v")))
        .groupBy("cell", "pos").agg(avg("col").as("m"))
        .collect()
      centroids = centroids.indices.map { cell =>
        val ds = dims.filter(_.getInt(0) == cell)
        if (ds.isEmpty) centroids(cell) // empty list keeps its centroid
        else normalized(ds.sortBy(_.getInt(1)).map(_.getDouble(2)).toArray)
      }
    }
    IvfModel(centroids, withCell(base))
  }

  /** Above this, centroid assignment joins a broadcast centroid row instead
    * of embedding a typedlit plan literal (see trainIvf).
    */
  private[graft] val TypedLitCentroidMax = 64

  /** Nearest-centroid cell assignment as a zero-shuffle projection —
    * shared by training (every Lloyd pass), [[IvfModel.appendVectors]]
    * (incremental/upsert ingestion into a trained index), and the
    * streaming IVF maintenance path. Centroid delivery: under
    * [[TypedLitCentroidMax]] a typedlit plan literal is the cheapest
    * (single projection, zero exchanges); above it the literal bloats
    * every plan that embeds it (nLists=4096 × dim doubles is megabytes of
    * plan tree), so the centroid table ships as a BROADCAST one-row frame
    * instead — same argmax expression over the joined column, still zero
    * shuffles, plan size flat in nLists.
    */
  /** The nearest-centroid cell of `v` — the EXACT argmax expression the
    * write path ([[assignCells]]) evaluates, exposed for featurize-replay
    * audits ([[graft.sources.VectorAudit.postingsOf]] verification):
    * reader and writer share one expression, so they can never disagree
    * on ties or rounding.
    */
  def assignedCellOf(v: Column, centroids: Seq[Seq[Double]]): Column =
    argmaxCell(v, typedlit(centroids))

  private def argmaxCell(v: Column, cs: Column): Column = {
    import graft.functions.ArrayKernels.dotProduct
    val sims = transform(cs, c => dotProduct(v, c))
    (array_position(sims, array_max(sims)) - 1).cast("int")
  }

  private[operators] def assignCells(df: DataFrame,
      centroids: Seq[Seq[Double]]): DataFrame = {
    if (centroids.length <= TypedLitCentroidMax)
      df.withColumn("cell", argmaxCell(col("v"), typedlit(centroids)))
    else {
      val spark = df.sparkSession
      import spark.implicits._
      val centRow = broadcast(Seq(Tuple1(centroids)).toDF("__cents"))
      df.crossJoin(centRow)
        .withColumn("cell", argmaxCell(col("v"), col("__cents")))
        .drop("__cents")
    }
  }

  /** k-NN graph: the top-k cosine neighbors of EVERY vector (the
    * similarity-graph construction step of a training-data pipeline),
    * blocked by the sign-quantizer cell. One bucket equi-join (per-bucket
    * quadratic — bucket occupancy is the tuning knob, like every blocked
    * kNN join) plus one per-source window for the top-k; the shuffle keys
    * are the bucket then the source id, never an all-pairs cross.
    */
  def knnGraphBucketed(emb: DataFrame, idCol: String, vecCol: String,
      k: Int, nBits: Int = 8): DataFrame = {
    val withB = graft.SparkUtil.ensureParallelism(
      emb.select(col(idCol).cast("long").as("id"), col(vecCol).as("v"),
        V.signBucket(col(vecCol), nBits).as("bucket")))
    val a = withB.select(col("bucket"), col("id").as("a_id"), col("v").as("a_v"))
    val b = withB.select(col("bucket"), col("id").as("b_id"), col("v").as("b_v"))
    // per-source top-k via the bounded-heap aggregate (TopKAgg scaladoc):
    // map-side partial heaps instead of a per-a_id shuffle-and-sort of the
    // whole bucket-join output — the win grows with bucket occupancy
    a.join(b, Seq("bucket"))
      .where(col("a_id") =!= col("b_id"))
      .withColumn("cosine", V.cosine(col("a_v"), col("b_v")))
      .groupBy("a_id")
      .agg(graft.functions.TopKAgg.topK(col("cosine"), col("b_id"), k).as("__topk"))
      .select(col("a_id"),
        org.apache.spark.sql.functions.posexplode(col("__topk")).as(Seq("__r0", "__e")))
      .select(col("a_id"), col("__e.id").as("b_id"),
        (col("__r0") + 1).cast("int").as("rank"), col("__e.score").as("cosine"))
  }

  /** Multi-probe variant: additionally scans every quantizer cell at hamming
    * distance 1 from the query's cell (each single sign-bit flip). Vectors
    * near a quantization boundary land one bit away — probing the nBits+1
    * adjacent cells recovers most of the recall single-probe loses, still
    * scanning only (nBits+1)/2^nBits of the corpus.
    */
  def cosineTopKMultiProbe(emb: DataFrame, idCol: String, vecCol: String,
      queryId: Long, k: Int, nBits: Int = 8): DataFrame = {
    val withB = graft.SparkUtil.ensureParallelism(
      emb.select(col(idCol).cast("long").as("id"), col(vecCol).as("v"),
        V.signBucket(col(vecCol), nBits).as("bucket")))
    val probeCols = col("bucket") +:
      (0 until nBits).map(d => col("bucket").bitwiseXOR(lit(1 << d)))
    val q = withB.where(col("id") === queryId)
      .select(col("v").as("q_v"), explode(array(probeCols: _*)).as("bucket"))
    withB.join(broadcast(q), Seq("bucket"))
      .where(col("id") =!= queryId)
      .withColumn("cosine", V.cosine(col("v"), col("q_v")))
      .select(col("id"), col("bucket"), col("cosine"))
      .orderBy(col("cosine").desc, col("id").asc)
      .limit(k)
  }

  /** IVF quality evaluation — recall@k of the trained-IVF probe against
    * exact brute force for the `nQueries` lowest-id vectors, the
    * measurement that decides whether an approximate index is trustworthy.
    * Emits one row per query with `recall_ok = recall@k ≥ recallFloor`.
    *
    * Distributed end to end: every query's probe set (its `nProbe`
    * highest-dot-product cells, same (-sim, idx) tie rule as
    * [[IvfModel.query]]) is computed as an expression over the broadcast
    * centroid literal; candidates come from one cell equi-join; both the
    * IVF and brute rankings fold through the bounded-heap top-k aggregate.
    * No per-query driver loop — the evaluation is one plan.
    *
    * The recall VALUE is not oracle-expressible (Lloyd centroids are
    * engine-internal doubles), so the gate contract is the tolerance
    * boolean, like `agg_approx_distinct`.
    */
  def ivfRecallEval(emb: DataFrame, idCol: String, vecCol: String,
      nQueries: Int, k: Int, nLists: Int = 16, nProbe: Int = 8,
      iters: Int = 2, recallFloor: Double = 0.5): DataFrame =
    ivfRecallEvalFromModel(trainIvf(emb, idCol, vecCol, nLists, iters),
      nQueries, k, nProbe, recallFloor)

  /** [[ivfRecallEval]] against an ALREADY-TRAINED (possibly
    * [[IvfModel.load]]ed) model — the serving-side replay, mirroring
    * [[pqRecallEvalFromModel]]: a persisted IVF index must answer
    * bit-identically to the session that trained it.
    */
  /** `mustExclude`: when non-empty, an extra `clean` column asserts none
    * of the served ids is on the list — the explicit takedown check (the
    * recall column alone cannot catch a failed exclusion, because the
    * brute baseline runs over the SAME assigned frame and would include
    * the ghosts too).
    */
  def ivfRecallEvalFromModel(model: IvfModel, nQueries: Int, k: Int,
      nProbe: Int, recallFloor: Double, mustExclude: Seq[Long] = Nil): DataFrame = {
    import graft.functions.ArrayKernels.dotProduct
    val nLists = model.centroids.length
    val base = model.assigned
    val hasSeq = base.columns.contains("ingest_seq")
    // a seq-carrying (upsert-maintained) index evaluates against the FINAL
    // vectors: the brute truth, the query vectors, and — via the per-pair
    // winner below — the probe side all resolve newest-per-id
    val finalBase = if (hasSeq) IvfModel.newestPerId(base) else base
    val q = finalBase.where(col("id") < nQueries)
      .select(col("id").as("qid"), col("v").as("qv"))
    // probe cells per query: indices of the nProbe largest centroid dot
    // products, ranked by (-sim, idx) — identical to the driver-side rule
    val cents = typedlit(model.centroids)
    val sims = transform(cents, c => dotProduct(col("qv"), c))
    val ranked = sort_array(zip_with(sims,
      sequence(lit(0), lit(nLists - 1)),
      (s, i) => struct((-s).as("negs"), i.as("idx"))))
    val qp = q.withColumn("cell",
      explode(slice(transform(ranked, r => r.getField("idx")), 1, nProbe)))
    def topIds(cands: DataFrame, outCol: String): DataFrame = {
      val scored = cands
        .where(col("id") =!= col("qid"))
        .select(col("qid") +: col("id") +:
          graft.functions.VectorFunctions.cosine(col("v"), col("qv")).as("c") +:
          (if (hasSeq && cands.columns.contains("ingest_seq"))
             Seq(col("ingest_seq")) else Nil): _*)
      // probed-side winner: the newest version seen for an id scores
      // (its stale row may sit in a different probed cell)
      val perId =
        if (scored.columns.contains("ingest_seq"))
          scored.groupBy("qid", "id").agg(max_by(col("c"), col("ingest_seq")).as("c"))
        else scored
      perId.groupBy("qid")
        .agg(graft.functions.TopKAgg.topK(col("c"), col("id"), k).as("tk"))
        .select(col("qid"), transform(col("tk"), x => x.getField("id")).as(outCol))
    }
    val ivf = topIds(base.join(broadcast(qp), Seq("cell")), "ivf_ids")
    val brute = topIds(finalBase.crossJoin(broadcast(q)), "ids")
    val joined = brute.join(ivf, Seq("qid"), "left")
    val rec = coalesce(size(array_intersect(col("ivf_ids"), col("ids"))),
      lit(0)).cast("double") / k
    if (mustExclude.isEmpty)
      joined.select(col("qid") +: recallCols(rec, recallFloor): _*)
    else joined.select(col("qid") +: recallCols(rec, recallFloor) :+
      (!arrays_overlap(coalesce(col("ivf_ids"), array()),
        typedlit(mustExclude))).as("clean"): _*)
  }

  /** Ranking fidelity of int8 embedding quantization: recall@k of the
    * top-k by cosine over DEQUANTIZED int8 codes vs the top-k by
    * full-precision cosine, per query — the end-to-end "4× compression
    * does not destroy the ranking" guarantee a quantized embedding store
    * must give before it replaces the fp store at 100 TB. Fully
    * deterministic (both rankings share the bounded-heap top-k's
    * (-score, id) tie rule), emitted as a per-query tolerance boolean
    * like [[ivfRecallEval]].
    */
  def int8RecallEval(emb: DataFrame, idCol: String, vecCol: String,
      nQueries: Int, k: Int, recallFloor: Double = 0.8): DataFrame = {
    import graft.functions.{VectorFunctions => V, TopKAgg}
    val base = graft.SparkUtil.ensureParallelism(emb)
      .select(col(idCol).cast("long").as("id"), col(vecCol).as("v"))
      .withColumn("scale", V.int8Scale(col("v")))
      .withColumn("dq",
        V.dequantizeInt8(V.quantizeInt8(col("v"), col("scale")), col("scale")))
    val q = broadcast(base.where(col("id") < nQueries)
      .select(col("id").as("qid"), col("v").as("qv"), col("dq").as("qdq")))
    val paired = graft.SparkUtil.scopedPersist(
      base.crossJoin(q).where(col("id") =!= col("qid")))
    def topIds(score: Column, out: String): DataFrame = paired
      .select(col("qid"), col("id"), score.as("c"))
      .groupBy("qid").agg(TopKAgg.topK(col("c"), col("id"), k).as("tk"))
      .select(col("qid"), transform(col("tk"), x => x.getField("id")).as(out))
    topIds(V.cosine(col("v"), col("qv")), "ids")
      .join(topIds(V.cosine(col("dq"), col("qdq")), "i8_ids"), Seq("qid"))
      .select(col("qid"),
        (size(array_intersect(col("i8_ids"), col("ids"))).cast("double") / k
          >= recallFloor).as("recall_ok"))
  }

  /** TWO-TIER recall claim shared by the approximate-index evals: a
    * query's `recall_ok` holds when it clears the SANITY tier (floor/3 —
    * the pipeline demonstrably works for this query) AND the workload's
    * MEAN recall clears the floor. ANN recall is distributional: a
    * single adversarial query below a per-query floor is expected
    * behavior for a quantized/probed index (measured: one sf0.1 corpus
    * draw put one PQ query at recall 0.2 even with nProbe = nLists —
    * pure code distortion at 16× compression, not a defect), and the
    * every-query-clears-the-floor form made the gates a lottery over
    * corpus draws. The two-tier form is strictly implied by the old one
    * (every gate that passed keeps passing) and still fails loudly on
    * real regressions — a broken probe/codebook path drags the MEAN
    * under the floor or a query under the sanity tier.
    *
    * The tiers are EXPLICIT in the schema (round-19): `sane_ok` is the
    * per-query tier and `mean_recall_ok` the workload tier, so a
    * consumer can see which tier a verdict rests on instead of reading
    * `recall_ok` as a pure per-query claim; `min_recall` / `mean_recall`
    * carry the workload's raw distribution (constant per workload — a
    * single-query mode regression that hides under a healthy mean is
    * visible as a sagging `min_recall` even while every boolean passes).
    * The raw columns are draw-dependent by nature, which is exactly why
    * the hash-pinned gates project them away and the rows-only
    * `sim_recall_telemetry` gate carries them instead.
    */
  private def recallCols(rec: org.apache.spark.sql.Column,
      recallFloor: Double): Seq[org.apache.spark.sql.Column] = {
    val w = org.apache.spark.sql.expressions.Window.partitionBy()
    val sane = rec >= lit(recallFloor / 3.0)
    val meanOk = avg(rec).over(w) >= lit(recallFloor)
    Seq((sane && meanOk).as("recall_ok"), sane.as("sane_ok"),
      meanOk.as("mean_recall_ok"),
      min(rec).over(w).as("min_recall"),
      avg(rec).over(w).as("mean_recall"))
  }

  // ---------------- IVF-PQ (Jégou et al. 2011, IVFADC) ----------------

  private def toD(a: Column): Column = transform(a, x => x.cast("double"))

  private def l2sq(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)), lit(0.0), _ + _)

  /** Index of the nearest codeword (min L2², first index on ties). */
  private def nearestCode(codebook: Column, sub: Column): Column = {
    val dists = transform(codebook, cw => l2sq(sub, cw))
    (array_position(dists, array_min(dists)) - 1).cast("int")
  }

  /** Train an IVF-PQ index — the published next step after IVF + int8 for
    * a 100 TB embedding store (Jégou, Douze, Schmid 2011, "Product
    * quantization for nearest neighbor search", the IVFADC structure): the
    * coarse quantizer of [[trainIvf]] plus a PRODUCT QUANTIZER over the
    * coarse RESIDUALS `r = v − centroid(cell)`. The residual splits into
    * `m` subvectors of dim/m; each subquantizer learns `ks` codewords, so
    * a vector stores as cell + m small codes (m bytes at ks=256) instead
    * of dim floats — 32× compression at dim=64/m=8.
    *
    * One SHARED product codebook over residuals, as in the paper's IVFADC
    * (the per-cell-codebook variant buys a small recall gain for nLists×
    * the codebook memory; the plan shape is identical, and the codebook
    * bound below only grows to cells × m × ks rows).
    *
    * Distributed shape: codeword training is Lloyd keyed on (subspace,
    * code) — assignment is a pure expression over the PLAN-LITERAL
    * codebook (m × ks × dim/m doubles — bounded and corpus-independent,
    * the DSIR-style justified broadcast), recomputation is one
    * (m, code, pos) partial-agg shuffle of doubles per iteration, and the
    * final ENCODE is a zero-shuffle narrow projection (codes computed
    * in-row from the plan-literal codebook). Only codebook-sized tables
    * ever reach the driver.
    */
  def trainIvfPq(emb: DataFrame, idCol: String, vecCol: String,
      nLists: Int = 16, m: Int = 8, ks: Int = 16,
      iters: Int = 2, pqIters: Int = 2): PqModel = {
    require(m >= 1 && ks >= 1 && pqIters >= 0)
    val ivf = trainIvf(emb, idCol, vecCol, nLists, iters)
    val dim = ivf.centroids.head.length
    require(dim % m == 0, s"dim $dim must split evenly into m=$m subvectors")
    val dsub = dim / m
    val cents = typedlit(ivf.centroids)
    val resid = ivf.assigned.withColumn("__r",
      zip_with(toD(col("v")), element_at(cents, col("cell") + 1),
        (a, b) => a - b))
    // training rows (id, cell, subspace, subvector); persisted — feeds
    // every Lloyd iteration
    val subs = resid.select(col("id"),
        posexplode(transform(sequence(lit(0), lit(m - 1)),
          i => slice(col("__r"), i * dsub + 1, lit(dsub)))).as(Seq("m", "sub")))
      .transform(graft.SparkUtil.scopedPersist)
    // deterministic seeds: residual subvectors of the ks lowest-id vectors
    val seedIds = ivf.assigned.orderBy("id").limit(ks)
      .select("id").collect().map(_.getLong(0))
    val seeds = subs.where(col("id").isin(seedIds: _*))
      .select("id", "m", "sub").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getSeq[Double](2).toSeq))
    var codebooks: Seq[Seq[Seq[Double]]] = (0 until m).map { mi =>
      seeds.filter(_._2 == mi).sortBy(_._1).map(_._3).toSeq
    }
    for (_ <- 1 to pqIters) {
      val cbLit = typedlit(codebooks)
      val means = subs
        .withColumn("code", nearestCode(element_at(cbLit, col("m") + 1), col("sub")))
        .select(col("m"), col("code"), posexplode(col("sub")))
        .groupBy("m", "code", "pos").agg(avg("col").as("mu"))
        .collect() // bounded: m × ks × dim/m rows
      codebooks = codebooks.zipWithIndex.map { case (cb, mi) =>
        cb.zipWithIndex.map { case (cw, ci) =>
          val ds = means.filter(r => r.getInt(0) == mi && r.getInt(1) == ci)
          if (ds.isEmpty) cw // empty code keeps its codeword (Lloyd rule)
          else ds.sortBy(_.getInt(2)).map(_.getDouble(3)).toSeq
        }
      }
    }
    // final encode: zero-shuffle narrow projection — codes in-row
    val cbLit = typedlit(codebooks)
    val encoded = resid.select(col("id"), col("cell"),
      transform(sequence(lit(0), lit(m - 1)),
        i => nearestCode(element_at(cbLit, i + 1),
          slice(col("__r"), i * dsub + 1, lit(dsub)))).as("codes"))
    PqModel(ivf, codebooks, dsub, encoded)
  }

  /** Recall@k of IVF-PQ asymmetric search vs exact brute force for the
    * first `nQueries` ids, as per-query tolerance booleans (the
    * [[ivfRecallEval]] pattern — codebooks are engine-internal doubles, so
    * the recall FLOOR is the oracle-checkable claim). Asymmetric distance:
    * the query stays full-precision; each candidate is scored against its
    * PQ reconstruction `centroid(cell) + codewords` (decode is an in-row
    * expression over the plan-literal codebook — the probe scan stays
    * narrow, one broadcast of the per-query probe list, no other
    * exchange before the per-query top-k aggregate).
    */
  def pqRecallEval(emb: DataFrame, idCol: String, vecCol: String,
      nQueries: Int, k: Int, nLists: Int = 16, nProbe: Int = 8,
      m: Int = 8, ks: Int = 16, recallFloor: Double = 0.4): DataFrame =
    pqRecallEvalFromModel(trainIvfPq(emb, idCol, vecCol, nLists, m, ks),
      nQueries, k, nProbe, recallFloor)

  /** [[pqRecallEval]] against an ALREADY-TRAINED (possibly [[PqModel.load]]ed)
    * model — the serving-side replay: a persisted IVF-PQ index must answer
    * bit-identically to the session that trained it (codebooks, centroids
    * and codes round-trip parquet exactly; doubles are IEEE-preserved).
    */
  /** `mustExclude`: when non-empty, adds the explicit takedown `clean`
    * column ([[ivfRecallEvalFromModel]]'s contract — recall alone cannot
    * catch a failed exclusion).
    */
  def pqRecallEvalFromModel(model: PqModel, nQueries: Int, k: Int,
      nProbe: Int, recallFloor: Double, mustExclude: Seq[Long] = Nil): DataFrame = {
    import graft.functions.ArrayKernels.dotProduct
    import graft.functions.TopKAgg
    val m = model.codebooks.length
    // upsert-maintained (seq-carrying) index: brute truth and query
    // vectors resolve to the FINAL versions; the probed encoded side
    // resolves per (query, id) below — the IVF eval's winner contract
    val base = IvfModel.newestPerId(model.ivf.assigned)
    val nL = model.ivf.centroids.length
    val q = base.where(col("id") < nQueries)
      .select(col("id").as("qid"), col("v").as("qv"))
    // probe cells per query — identical ranking rule to ivfRecallEval
    val cents = typedlit(model.ivf.centroids)
    val sims = transform(cents, c => dotProduct(col("qv"), c))
    val ranked = sort_array(zip_with(sims,
      sequence(lit(0), lit(nL - 1)),
      (s, i) => struct((-s).as("negs"), i.as("idx"))))
    val qp = q.withColumn("cell",
      explode(slice(transform(ranked, r => r.getField("idx")), 1, nProbe)))
    val cbLit = typedlit(model.codebooks)
    val vhat = zip_with(element_at(cents, col("cell") + 1),
      flatten(zip_with(col("codes"), sequence(lit(0), lit(m - 1)),
        (c, mi) => element_at(element_at(cbLit, mi + 1), c + 1))),
      (a, b) => a + b)
    val pqHasSeq = model.encoded.columns.contains("ingest_seq")
    val pqScored = model.encoded.join(broadcast(qp), Seq("cell"))
      .where(col("id") =!= col("qid"))
      .select(col("qid") +: col("id") +:
        V.cosine(vhat, toD(col("qv"))).as("c") +:
        (if (pqHasSeq) Seq(col("ingest_seq")) else Nil): _*)
    val pqPerId =
      if (pqHasSeq)
        pqScored.groupBy("qid", "id").agg(max_by(col("c"), col("ingest_seq")).as("c"))
      else pqScored
    val pq = pqPerId
      .groupBy("qid").agg(TopKAgg.topK(col("c"), col("id"), k).as("tk"))
      .select(col("qid"), transform(col("tk"), x => x.getField("id")).as("pq_ids"))
    val brute = base.crossJoin(broadcast(q))
      .where(col("id") =!= col("qid"))
      .select(col("qid"), col("id"), V.cosine(col("v"), col("qv")).as("c"))
      .groupBy("qid").agg(TopKAgg.topK(col("c"), col("id"), k).as("tk"))
      .select(col("qid"), transform(col("tk"), x => x.getField("id")).as("ids"))
    val joined = brute.join(pq, Seq("qid"), "left")
    val rec = coalesce(size(array_intersect(col("pq_ids"), col("ids"))),
      lit(0)).cast("double") / k
    if (mustExclude.isEmpty)
      joined.select(col("qid") +: recallCols(rec, recallFloor): _*)
    else joined.select(col("qid") +: recallCols(rec, recallFloor) :+
      (!arrays_overlap(coalesce(col("pq_ids"), array()),
        typedlit(mustExclude))).as("clean"): _*)
  }

  /** FROZEN-model encode of NEW vectors — the index-maintenance path of a
    * production ANN store: incoming embeddings are assigned to their IVF
    * cell and product-quantized against the codebooks trained at fit time
    * (retraining is an offline event; ingestion must not depend on it).
    * Pure plan-literal expressions over (id, vector) — a STATELESS narrow
    * projection, so it lifts to Structured Streaming unchanged: no state
    * store at all, the bounded codebook rides in the plan, and micro-batch
    * boundaries cannot affect the result (gated as
    * `stream_ivf_update_real`). Output matches [[PqModel.encoded]]:
    * (id, cell, codes).
    */
  def pqEncodeNew(model: PqModel, df: DataFrame, idCol: String,
      vecCol: String, keep: Seq[String] = Nil): DataFrame = {
    import graft.functions.ArrayKernels.dotProduct
    val m = model.codebooks.length
    val dsub = model.subDim
    val cents = typedlit(model.ivf.centroids)
    val sims = transform(cents, c => dotProduct(col("__v"), c))
    val cell = (array_position(sims, array_max(sims)) - 1).cast("int")
    val cbLit = typedlit(model.codebooks)
    val resid = zip_with(toD(col("__v")), element_at(cents, col("cell") + 1),
      (a, b) => a - b)
    df.select(col(idCol).cast("long").as("id") +: col(vecCol).as("__v") +:
        keep.map(col): _*)
      .withColumn("cell", cell)
      .withColumn("__r", resid)
      .select(col("id") +: col("cell") +:
        transform(sequence(lit(0), lit(m - 1)),
          i => nearestCode(element_at(cbLit, i + 1),
            slice(col("__r"), i * dsub + 1, lit(dsub)))).as("codes") +:
        keep.map(col): _*)
  }

  /** IVFADC+R — the exact-re-rank stage the same Jégou et al. 2011 line of
    * work adds on top of IVFADC (and the standard production shape): the
    * PQ asymmetric scan keeps the top `rerankC` CANDIDATES per query
    * (C > k), then only those C rows are re-scored against the
    * FULL-PRECISION vectors and the final top-k is exact among them.
    * Per-query recall@k is then |candidates ∩ true top-k| / k — by
    * construction at least the plain-PQ recall at equal parameters (the
    * true neighbors inside the candidate set always win an exact
    * re-score), which is why this gate carries a STRICTLY HIGHER floor
    * than [[pqRecallEval]].
    *
    * Scale shape: the candidate list is bounded (nQueries × C id pairs) —
    * it BROADCASTS onto the full-precision scan, so the re-rank join
    * ships only the C candidate rows per query out of the scan and
    * nothing reshuffles (plan-asserted in PlanPropertiesSpec); query
    * vectors ride the same bounded broadcast. Emitted as per-query
    * tolerance booleans (the [[ivfRecallEval]] contract — codebooks are
    * engine-internal doubles, the FLOOR is the oracle-checkable claim).
    */
  def pqRerankRecallEval(emb: DataFrame, idCol: String, vecCol: String,
      nQueries: Int, k: Int, rerankC: Int, nLists: Int = 16, nProbe: Int = 8,
      m: Int = 8, ks: Int = 16, recallFloor: Double = 0.5): DataFrame =
    pqRerankRecalls(emb, idCol, vecCol, nQueries, k, rerankC, nLists,
      nProbe, m, ks)
      .select(col("qid") +: recallCols(col("recall"), recallFloor): _*)

  /** The per-query recall@k values behind [[pqRerankRecallEval]] (exposed
    * for floor calibration — measure, don't guess).
    */
  def pqRerankRecalls(emb: DataFrame, idCol: String, vecCol: String,
      nQueries: Int, k: Int, rerankC: Int, nLists: Int = 16, nProbe: Int = 8,
      m: Int = 8, ks: Int = 16): DataFrame = {
    import graft.functions.ArrayKernels.dotProduct
    import graft.functions.TopKAgg
    require(rerankC >= k, s"rerankC ($rerankC) must be >= k ($k)")
    val model = trainIvfPq(emb, idCol, vecCol, nLists, m, ks)
    val base = model.ivf.assigned
    val nL = model.ivf.centroids.length
    val q = base.where(col("id") < nQueries)
      .select(col("id").as("qid"), col("v").as("qv"))
    // probe cells per query — identical ranking rule to pqRecallEval
    val cents = typedlit(model.ivf.centroids)
    val sims = transform(cents, c => dotProduct(col("qv"), c))
    val ranked = sort_array(zip_with(sims,
      sequence(lit(0), lit(nL - 1)),
      (s, i) => struct((-s).as("negs"), i.as("idx"))))
    val qp = q.withColumn("cell",
      explode(slice(transform(ranked, r => r.getField("idx")), 1, nProbe)))
    val cbLit = typedlit(model.codebooks)
    val vhat = zip_with(element_at(cents, col("cell") + 1),
      flatten(zip_with(col("codes"), sequence(lit(0), lit(m - 1)),
        (c, mi) => element_at(element_at(cbLit, mi + 1), c + 1))),
      (a, b) => a + b)
    // stage 1 — PQ asymmetric scan, top-C candidate ids per query
    val cand = model.encoded.join(broadcast(qp), Seq("cell"))
      .where(col("id") =!= col("qid"))
      .select(col("qid"), col("id"), V.cosine(vhat, toD(col("qv"))).as("c"))
      .groupBy("qid").agg(TopKAgg.topK(col("c"), col("id"), rerankC).as("tk"))
      .select(col("qid"),
        explode(transform(col("tk"), x => x.getField("id"))).as("id"))
    // stage 2 — exact re-rank of ONLY the candidate rows: the bounded
    // (qid, id) list broadcasts onto the full-precision scan
    val rer = base.join(broadcast(cand), Seq("id"))
      .join(broadcast(q), Seq("qid"))
      .select(col("qid"), col("id"), V.cosine(col("v"), col("qv")).as("c"))
      .groupBy("qid").agg(TopKAgg.topK(col("c"), col("id"), k).as("tk"))
      .select(col("qid"),
        transform(col("tk"), x => x.getField("id")).as("rr_ids"))
    val brute = base.crossJoin(broadcast(q))
      .where(col("id") =!= col("qid"))
      .select(col("qid"), col("id"), V.cosine(col("v"), col("qv")).as("c"))
      .groupBy("qid").agg(TopKAgg.topK(col("c"), col("id"), k).as("tk"))
      .select(col("qid"), transform(col("tk"), x => x.getField("id")).as("ids"))
    brute.join(rer, Seq("qid"), "left")
      .select(col("qid"),
        (coalesce(size(array_intersect(col("rr_ids"), col("ids"))), lit(0))
          .cast("double") / k).as("recall"))
  }
}

/** A trained IVF-PQ index: the coarse [[IvfModel]], the shared product
  * codebook (m × ks × subDim — bounded, corpus-independent), and the
  * encoded corpus (id, cell, codes) — m small integers per vector instead
  * of dim floats.
  */
final case class PqModel(ivf: IvfModel, codebooks: Seq[Seq[Seq[Double]]],
    subDim: Int, encoded: DataFrame) {

  /** Persist the full IVF-PQ index: the coarse [[IvfModel]] (its own
    * cell-partitioned layout), the encoded-codes table `partitionBy("cell")`
    * (so a loaded index's probe joins prune partitions exactly like the
    * in-session one), the (m, code, codeword) codebook table, and a 1-row
    * meta table with `subDim`. Everything driver-sized except the encoded
    * corpus, which is written distributed — a trained product quantizer is
    * expensive at exactly the scale where rebuilding per session is
    * unaffordable, so the whole model must round-trip.
    */
  def save(dir: String): Unit = save(dir, graft.sources.IndexStore.SwapRename)

  /** Persist with an explicit swap strategy — [[IvfModel.save]]'s
    * contract applied to BOTH cell tables (assigned and encoded each get
    * their own manifest; one logical maintenance op commits each table's
    * flip independently, and a crash between the two leaves the marker/
    * seq resolution serving the still-consistent union, exactly as in
    * rename mode's table-at-a-time rewrite).
    */
  def save(dir: String, swap: String): Unit = {
    val spark = encoded.sparkSession
    // a re-save overwrites both cell tables' generations — refuse while
    // snapshot pins reference either (ivf.save re-checks its own half)
    if (graft.sources.CellManifest.isManifest(spark, s"$dir/encoded"))
      graft.sources.CellManifest.requireNoPins(spark, s"$dir/encoded",
        "save (overwrite)")
    val preEpoch = graft.sources.Fence.current(spark, s"$dir/encoded")
    graft.sources.Fence.begin(spark, dir) // the PQ model-level claim
    import spark.implicits._
    // the four components (ivf subtree, encoded codes, codebooks, meta)
    // write to disjoint paths with per-component commit points — they
    // overlap (guide §2.6); each component's internal ordering (write →
    // manifest init → fence re-seed) is preserved inside its own action.
    // NO component is a completion marker anymore (the old sequential
    // order implied meta-last = everything-present): a crash leaves an
    // arbitrary subset, and [[PqModel.load]] fails loudly on ANY missing
    // component — tooling must not infer completeness from meta/centroids
    // presence alone
    graft.SparkUtil.inParallel(
      () => ivf.save(s"$dir/ivf", swap),
      () => {
        encoded.write.mode("overwrite").partitionBy("cell")
          .parquet(s"$dir/encoded")
        if (swap == graft.sources.IndexStore.SwapManifest)
          graft.sources.CellManifest.init(spark, s"$dir/encoded")
        graft.sources.Fence.begin(spark, s"$dir/encoded", preEpoch + 1)
      },
      () => codebooks.zipWithIndex.flatMap { case (cb, mi) =>
        cb.zipWithIndex.map { case (cw, ci) => (mi, ci, cw) }
      }.toDF("m", "code", "codeword")
        .coalesce(1).write.mode("overwrite").parquet(s"$dir/codebooks"),
      () => Seq(subDim).toDF("sub_dim")
        .coalesce(1).write.mode("overwrite").parquet(s"$dir/meta"))
  }

  def unpersist(): Unit = { ivf.unpersist(); encoded.unpersist(); () }
}

object PqModel {
  /** Load an index written by [[PqModel.save]] — bit-identical replay:
    * doubles round-trip parquet exactly, so a loaded model's asymmetric
    * scores equal the fitted session's.
    */
  def load(spark: org.apache.spark.sql.SparkSession, dir: String): PqModel = {
    // a committed-but-unfinished retrain swap fails the reader LOUDLY:
    // without the check a load between the component renames would pair
    // new codes with old codebooks silently. Readers never run the
    // recovery themselves (two racing recoveries could strand a
    // component) — a maintenance head, or an explicit recoverRetrain,
    // finishes the swap under the writer's claim.
    IvfModel.requireNoPendingRetrainSwap(spark, dir)
    loadResolved(spark, dir, IvfModel.load(spark, s"$dir/ivf"),
      graft.sources.CellManifest.readTable(spark, s"$dir/encoded"))
  }

  /** Load the IVF-PQ index AT A NAMED SNAPSHOT ([[pinSnapshot]]): both
    * cell tables resolve through their pinned manifests; codebooks and
    * centroids are snapshot-stable (only retrain replaces them, and
    * retrain refuses while pins exist). Takedown markers pierce the pin
    * at read time on both halves — the [[IvfModel.load]] contract.
    */
  def load(spark: org.apache.spark.sql.SparkSession, dir: String,
      pin: String): PqModel = {
    IvfModel.requireNoPendingRetrainSwap(spark, dir)
    loadResolved(spark, dir, IvfModel.load(spark, s"$dir/ivf", pin),
      graft.sources.CellManifest.readTable(spark, s"$dir/encoded", pin))
  }

  /** PIN the IVF-PQ index's current ingest state under ONE name covering
    * BOTH cell tables (assigned + encoded) — see [[IvfModel.pinSnapshot]].
    * The marker-governing ivf half pins first, so marker retention (and
    * the retrain/save refusals) key off it; quiesce the writer across the
    * two puts, or accept that a pin racing an in-flight append captures
    * the pre-append state of whichever table had not committed yet (the
    * same still-consistent-union contract as [[PqModel.save]]'s
    * table-at-a-time flips — serving joins the halves by id, so a
    * one-sided batch is invisible). Returns the encoded table's pinned
    * manifest number.
    */
  def pinSnapshot(spark: org.apache.spark.sql.SparkSession, dir: String,
      name: String): Long = {
    IvfModel.requireNoPendingRetrainSwap(spark, dir)
    IvfModel.pinSnapshot(spark, s"$dir/ivf", name)
    try graft.sources.CellManifest.pin(spark, s"$dir/encoded", name)
    catch { case e: Throwable =>
      // keep the two halves atomic-ish: a failed second put rolls back
      // the first so no half-pinned name dangles
      IvfModel.unpinSnapshot(spark, s"$dir/ivf", name)
      throw e
    }
  }

  def unpinSnapshot(spark: org.apache.spark.sql.SparkSession, dir: String,
      name: String): Unit = {
    graft.sources.CellManifest.unpin(spark, s"$dir/encoded", name)
    IvfModel.unpinSnapshot(spark, s"$dir/ivf", name)
  }

  /** Every named snapshot on the index (the ivf half is authoritative —
    * [[pinSnapshot]] writes it first and [[unpinSnapshot]] clears it
    * last).
    */
  def snapshots(spark: org.apache.spark.sql.SparkSession,
      dir: String): Map[String, Long] =
    IvfModel.snapshots(spark, s"$dir/ivf")

  private def loadResolved(spark: org.apache.spark.sql.SparkSession,
      dir: String, ivf: IvfModel, rawEncoded: DataFrame): PqModel = {
    import org.apache.spark.sql.functions.col
    val rows = spark.read.parquet(s"$dir/codebooks").collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getSeq[Double](2).toSeq))
    val m = rows.map(_._1).max + 1
    val codebooks: Seq[Seq[Seq[Double]]] = (0 until m).map { mi =>
      rows.filter(_._1 == mi).sortBy(_._2).map(_._3).toSeq
    }
    val subDim = spark.read.parquet(s"$dir/meta").collect()(0).getInt(0)
    // partition column returns as the pruning key; cast pins the int type
    // the in-memory model uses (the IvfModel.load convention)
    val raw = rawEncoded
      .withColumn("cell", col("cell").cast("int"))
    // one takedown marker governs BOTH tables: IvfModel.load already
    // excluded the assigned side; mirror it on the encoded side — with
    // the same seq-outranking rule on an upsert-maintained index
    val delDir = IvfModel.deletedPath(spark, s"$dir/ivf")
    val fs = delDir.getFileSystem(spark.sessionState.newHadoopConf())
    val encoded =
      if (!fs.exists(delDir)) raw
      else {
        val markers = IvfModel.deletedMarkers(spark, s"$dir/ivf")
        if (!raw.columns.contains("ingest_seq"))
          raw.join(broadcast(markers.select(col("id"))), Seq("id"), "left_anti")
        else
          raw.join(broadcast(markers), Seq("id"), "left_outer")
            .where(col("__del_seq").isNull || col("ingest_seq") > col("__del_seq"))
            .drop("__del_seq")
      }
    PqModel(ivf, codebooks, subDim, encoded)
  }

  /** Vector takedown for a persisted IVF-PQ index — one marker beside the
    * coarse quantizer governs both its tables ([[load]] excludes the ids
    * from the assigned AND encoded sides immediately).
    */
  def deleteVectors(spark: org.apache.spark.sql.SparkSession, dir: String,
      ids: DataFrame, seq: Long = Long.MaxValue): Unit = {
    // adopt a committed-but-unswapped retrain FIRST: a marker written
    // beside a flagged stage would clear unapplied when the stage swaps
    // in (silent takedown loss — the rebuild never saw the id)
    IvfModel.recoverRetrain(spark, dir)
    IvfModel.deleteVectors(spark, s"$dir/ivf", ids, seq)
  }

  /** [[deleteVectors]] with the marker sequence riding IN THE DATA —
    * see the [[IvfModel.deleteVectors]] seq-column twin.
    */
  def deleteVectors(spark: org.apache.spark.sql.SparkSession, dir: String,
      ids: DataFrame, idCol: String, seqCol: String): Unit = {
    IvfModel.recoverRetrain(spark, dir)
    IvfModel.deleteVectors(spark, s"$dir/ivf", ids, idCol, seqCol)
  }

  /** UPSERT ingestion into a persisted IVF-PQ index — ONE logical append
    * maintains BOTH tables: the raw vectors assign to the frozen coarse
    * centroids ([[IvfModel.appendVectors]]) and product-quantize against
    * the frozen codebooks ([[SimSearch.pqEncodeNew]] — the stateless
    * streaming-safe projection), each landing cell-partitioned with the
    * given `ingest_seq`. Serving resolves newest-per-id immediately;
    * [[compactUpserts]] drops the losers from both tables, cell-scoped.
    * Both tables must already carry `ingest_seq`.
    */
  def appendVectors(spark: org.apache.spark.sql.SparkSession, dir: String,
      vecs: DataFrame, idCol: String, vecCol: String, seq: Long): Unit =
    appendVectorsSeqed(spark, dir,
      vecs.withColumn("__graft_seq", lit(seq)), idCol, vecCol)

  /** [[appendVectors]] with the supersession sequence riding IN THE DATA
    * (per-row `seqCol`) — the streaming shape; see the [[IvfModel
    * .appendVectors]] seq-column twin. Both persisted tables land each
    * row under its own seq, so the final state is a pure function of the
    * event set regardless of micro-batch boundaries.
    */
  def appendVectors(spark: org.apache.spark.sql.SparkSession, dir: String,
      vecs: DataFrame, idCol: String, vecCol: String, seqCol: String): Unit =
    appendVectorsSeqed(spark, dir,
      vecs.withColumn("__graft_seq", col(seqCol).cast("long")),
      idCol, vecCol)

  private def appendVectorsSeqed(spark: org.apache.spark.sql.SparkSession,
      dir: String, vecs: DataFrame, idCol: String, vecCol: String): Unit = {
    // a flagged stage pending adoption would swallow this append when it
    // swaps in — adopt it first so the batch lands on the live truth
    IvfModel.recoverRetrain(spark, dir)
    // the append claims the PQ model; the token re-validates at EACH
    // half's visibility point (the manifest puts), so an append still
    // staging when a pin window opens on the PQ dir is fenced out before
    // either half becomes visible. A claim landing BETWEEN the two puts
    // fences the second half only — the one-sided batch is the
    // documented crash shape (serving joins the halves by id, so it is
    // invisible) and the caller replays whole.
    val tok = graft.sources.Fence.begin(spark, dir)
    val cur = graft.sources.CellManifest.readTable(spark, s"$dir/encoded")
    require(cur.columns.contains("ingest_seq"),
      s"appendVectors needs a seq-carrying index — save the trained model " +
        s"with an ingest_seq column before appending ($dir/encoded lacks it)")
    val model = PqModel.load(spark, dir)
    IvfModel.appendVectorsOuterFenced(spark, s"$dir/ivf", vecs, idCol, vecCol,
      "__graft_seq", Seq(dir -> tok))
    IvfModel.appendCellBatch(spark, s"$dir/encoded",
      SimSearch.pqEncodeNew(model, vecs, idCol, vecCol,
          keep = Seq("__graft_seq"))
        .withColumnRenamed("__graft_seq", "ingest_seq")
        .repartition(col("cell")),
      Seq(dir -> tok))
  }

  /** Physically drop superseded vector versions from BOTH tables —
    * [[IvfModel.compactUpserts]] applied to each cell-partitioned half.
    */
  def compactUpserts(spark: org.apache.spark.sql.SparkSession, dir: String): Unit = {
    IvfModel.recoverRetrain(spark, dir)
    graft.sources.Fence.begin(spark, dir)
    // the two halves decide and rewrite over disjoint subtrees (encoded
    // cells vs ivf cells + audit map) — overlap them (guide §2.6); a
    // crash leaving one half compacted is the sequential shape already
    graft.SparkUtil.inParallel(
      () => IvfModel.compactUpsertsCells(spark, s"$dir/encoded"),
      () => IvfModel.compactUpserts(spark, s"$dir/ivf"))
  }

  /** Fold BOTH manifest tables' generation fan-out —
    * [[IvfModel.compactGenerations]] applied to each cell-partitioned
    * half (the streaming append path grows both in lockstep).
    */
  def compactGenerations(spark: org.apache.spark.sql.SparkSession,
      dir: String, maxGenLists: Int = 16): Unit = {
    IvfModel.recoverRetrain(spark, dir)
    graft.sources.Fence.begin(spark, dir)
    // disjoint halves again — overlap (guide §2.6)
    graft.SparkUtil.inParallel(
      () => IvfModel.compactGenerationsCells(spark, s"$dir/encoded", maxGenLists),
      () => IvfModel.compactGenerations(spark, s"$dir/ivf", maxGenLists))
  }

  /** OFFLINE RETRAIN of a persisted IVF-PQ index — [[IvfModel.retrain]]
    * extended to the full product quantizer: fresh coarse centroids AND
    * fresh residual codebooks fit over the CURRENT truth (the raw
    * vectors ride in the ivf half's assigned table: newest live version
    * per id, markers applied), then the whole four-component index
    * (ivf subtree, encoded codes, codebooks, meta) swaps through the
    * same flagged side stage — one commit point, every crash window
    * lands on the complete old or complete new index, both tables
    * always from the SAME training run (a component-wise mix would pair
    * codes with foreign codebooks). Seqs carry into BOTH rebuilt
    * tables; markers clear with the swapped ivf subtree (the
    * [[compactDeletes]] redelivery contract); the cell tables keep the
    * source's swap strategy.
    */
  def retrain(spark: org.apache.spark.sql.SparkSession, dir: String,
      nLists: Int, m: Int, ks: Int): Unit = {
    IvfModel.recoverRetrain(spark, dir)
    // snapshot pins reference the current generations of BOTH cell
    // tables — refuse before the fit is paid for, and again at commit
    IvfModel.requirePinFree(spark, s"$dir/ivf", "retrain")
    val fenceTok = graft.sources.Fence.begin(spark, dir)
    val snap = IvfModel.retrainSnapshot(spark, s"$dir/ivf")
    val cur = load(spark, dir) // markers applied in both halves
    val live = IvfModel.newestPerId(cur.ivf.assigned)
    val hasSeq = live.columns.contains("ingest_seq")
    val manifest = graft.sources.CellManifest
      .isManifest(spark, s"$dir/encoded")
    val mm = SimSearch.trainIvfPq(live, "id", "v", nLists, m, ks)
    def carry(df: DataFrame): DataFrame =
      if (hasSeq) df.join(live.select(col("id"), col("ingest_seq")), Seq("id"))
      else df
    val rebuilt = PqModel(
      IvfModel(mm.ivf.centroids, carry(mm.ivf.assigned)),
      mm.codebooks, mm.subDim, carry(mm.encoded))
    val fs = IvfModel.deletedPath(spark, dir).getFileSystem(
      spark.sessionState.newHadoopConf())
    val stage = s"$dir/__retrain_stage"
    fs.delete(new org.apache.hadoop.fs.Path(stage), true)
    rebuilt.save(stage,
      if (manifest) graft.sources.IndexStore.SwapManifest
      else graft.sources.IndexStore.SwapRename)
    mm.unpersist()
    // COMMIT POINT — the IvfModel.retrain contract: seq-guard (both PQ
    // tables rebuild off the assigned truth, so guarding it guards both)
    // then the fence; a refusal leaves the stage unflagged and discarded
    graft.sources.MaintHooks.at("retrain.staged", dir)
    IvfModel.requireRetrainUnmoved(spark, s"$dir/ivf", snap)
    IvfModel.requirePinFree(spark, s"$dir/ivf", "retrain") // a pin landed
    graft.sources.Fence.check(spark, dir, fenceTok)
    fs.create(new org.apache.hadoop.fs.Path(s"$stage/_complete"), true).close()
    IvfModel.finishRetrainSwap(spark, dir)
  }

  /** Physically drop deleted vectors from BOTH cell-partitioned tables,
    * cell-scoped ([[IvfModel.scrubCellTable]]); the encoded side scrubs
    * first because the IVF pass clears the shared marker.
    */
  def compactDeletes(spark: org.apache.spark.sql.SparkSession, dir: String): Unit = {
    IvfModel.recoverRetrain(spark, dir)
    graft.sources.Fence.begin(spark, dir)
    val delDir = IvfModel.deletedPath(spark, s"$dir/ivf")
    val fs = delDir.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(delDir)) return
    IvfModel.scrubCellTable(spark, s"$dir/encoded",
      IvfModel.deletedMarkers(spark, s"$dir/ivf"))
    IvfModel.compactDeletes(spark, s"$dir/ivf")
  }
}

/** A trained IVF index: the (nLists × dim) centroid table (driver-side —
  * nLists is small by construction) plus the cell-assigned corpus. Queries
  * pick the `nProbe` cells nearest the query vector on the driver (nLists
  * dot products) and scan only those cells; `nProbe = nLists` degenerates
  * to exact brute force (pinned in OperatorSpec).
  *
  * [[save]] writes the corpus `partitionBy("cell")` so a LOADED index's
  * probe is a partition-pruned scan — the query reads nProbe/nLists of the
  * files, not a filtered full scan (asserted on the physical plan in
  * OperatorSpec). The centroid table rides along as parquet.
  */
final case class IvfModel(centroids: Seq[Seq[Double]], assigned: DataFrame) {

  def query(queryVec: Seq[Double], k: Int, nProbe: Int,
      excludeId: Option[Long] = None): DataFrame =
    queryFiltered(queryVec, k, nProbe, lit(true), excludeId)

  /** ATTRIBUTE-FILTERED probe (the production vector-search shape:
    * predicate + top-k — language = X, date > Y): the predicate is applied
    * to the candidate rows INSIDE the probed cells BEFORE any distance is
    * computed or ranked. Filtering AFTER top-k instead would
    * under-retrieve — the unfiltered top-k may hold fewer than k rows
    * satisfying the predicate even when the filtered corpus has k good
    * answers. Predicate columns beyond (id, cell, v) must be attached
    * first via [[withAttributes]].
    *
    * Scale shape: unchanged from the unfiltered probe — cell pruning
    * first (partition pruning on a [[save]]d index), then the predicate
    * as a plain scan filter Catalyst pushes below the distance
    * projection, then TakeOrderedAndProject. The filter only ever
    * SHRINKS the scanned set.
    */
  def queryFiltered(queryVec: Seq[Double], k: Int, nProbe: Int,
      predicate: Column, excludeId: Option[Long] = None): DataFrame = {
    require(nProbe >= 1 && nProbe <= centroids.length,
      s"nProbe must be in [1, ${centroids.length}], got $nProbe")
    val probeCells = centroids.zipWithIndex
      .map { case (c, i) => (c.zip(queryVec).map { case (a, b) => a * b }.sum, i) }
      .sortBy { case (s, i) => (-s, i) }.take(nProbe).map(_._2)
    // seq-carrying (maintained) index: per id the NEWEST version within
    // the probed cells answers — a re-embedded vector's stale row loses
    // wherever both versions are scanned (exact once compactUpserts drops
    // the losers; the pre-compaction window where ONLY the stale cell is
    // probed mirrors the text index's documented transient anomaly)
    val scanned = IvfModel.newestPerId(
        assigned.where(col("cell").isin(probeCells: _*)))
      .where(predicate)
      .withColumn("cosine", V.cosine(col("v"), typedlit(queryVec)))
    excludeId.fold(scanned)(id => scanned.where(col("id") =!= id))
      .select(col("id"), col("cell"), col("cosine"))
      .orderBy(col("cosine").desc, col("id").asc)
      .limit(k)
  }

  /** The same index with attribute columns joined onto the assigned
    * corpus (id-keyed equi-join, unhinted — AQE broadcasts a small
    * attribute table, a corpus-wide one co-partitions), so
    * [[queryFiltered]] predicates can reference them. Vectors with no
    * attribute row keep nulls (predicates drop them — SQL semantics).
    */
  def withAttributes(attrs: DataFrame, attrIdCol: String): IvfModel = {
    val cols = col(attrIdCol).cast("long").as("id") +:
      attrs.columns.filter(_ != attrIdCol).map(col).toSeq
    IvfModel(centroids, assigned.join(attrs.select(cols: _*), Seq("id"), "left"))
  }

  def save(dir: String): Unit = save(dir, graft.sources.IndexStore.SwapRename)

  /** Persist with an explicit swap strategy for the cell table's later
    * maintenance rewrites: [[graft.sources.IndexStore.SwapRename]] (the
    * default — rename-aside with crash recovery) or
    * [[graft.sources.IndexStore.SwapManifest]] (object-store-safe: data
    * files never move; appends and rewrites stage as `_gen-N` and commit
    * by one manifest put — [[graft.sources.CellManifest]]).
    */
  def save(dir: String, swap: String): Unit = {
    val spark = assigned.sparkSession
    // a re-save overwrites every generation — refuse while snapshot pins
    // reference them (the same whole-table guard as retrain)
    IvfModel.requirePinFree(spark, dir, "save (overwrite)")
    // a save claims the model; the cell-table overwrite wipes the fence
    // inside it, so the epoch re-seeds past the pre-save value (stale
    // tokens can never collide with post-save claims)
    val preEpoch = graft.sources.Fence.current(spark, s"$dir/assigned")
    graft.sources.Fence.begin(spark, dir)
    assigned.write.mode("overwrite").partitionBy("cell")
      .parquet(s"$dir/assigned")
    if (swap == graft.sources.IndexStore.SwapManifest)
      graft.sources.CellManifest.init(spark, s"$dir/assigned")
    graft.sources.Fence.begin(spark, s"$dir/assigned", preEpoch + 1)
    import spark.implicits._
    // seed the takedown-audit id-map while the table is freshly scanned
    // (one extra narrow job at save time buys id-addressable audits).
    // STRICTLY BEFORE the centroids write: centroids are the save's
    // implicit completion marker (load fails loudly without them), so a
    // crash mid-seed must leave the model unloadable and force a replay —
    // overlapping the two could commit centroids while seed died after
    // its delete, leaving a partial _idmap that hasIdMap treats as
    // complete and the audit mirrors silently diverging. The overlap won
    // only the (driver-sized) centroid write's latency — not worth the
    // crash shape.
    graft.sources.VectorAudit.seed(spark, dir)
    centroids.zipWithIndex.map { case (c, i) => (i, c) }
      .toDF("cell", "centroid")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/centroids")
  }

  def unpersist(): Unit = { assigned.unpersist(); () }
}

object IvfModel {

  /** Resolve a seq-carrying frame to its newest row per id (the text
    * index's winner rule, `MinHashLSH.serveFromInverted`); frames without
    * `ingest_seq` pass through untouched. Ties (a same-seq at-least-once
    * redelivery) carry identical payloads, so max_by's arbitrary pick is
    * value-deterministic.
    */
  private[operators] def newestPerId(df: DataFrame): DataFrame =
    if (!df.columns.contains("ingest_seq")) df
    else {
      val others = df.columns.toSeq.filterNot(c => c == "id" || c == "ingest_seq")
      df.groupBy(col("id"))
        .agg(max_by(struct(others.map(col): _*), col("ingest_seq")).as("__w"),
          max(col("ingest_seq")).as("ingest_seq"))
        .select(col("id") +: others.map(c => col(s"__w.$c").as(c))
          :+ col("ingest_seq"): _*)
    }

  private def loadCentroids(spark: org.apache.spark.sql.SparkSession,
      dir: String): Seq[Seq[Double]] =
    spark.read.parquet(s"$dir/centroids")
      .orderBy("cell").collect()
      .map(_.getSeq[Double](1).toSeq).toSeq

  /** UPSERT ingestion into a persisted IVF index — the vector twin of
    * [[graft.sources.IndexStore.appendInverted]]: new or RE-EMBEDDED
    * vectors assign to their nearest frozen centroid (a zero-shuffle
    * projection, [[SimSearch.assignCells]]) and append to the
    * cell-partitioned table with the given `ingest_seq`. A re-embedded id
    * usually lands in a DIFFERENT cell than its old row — serving resolves
    * newest-per-id within the scanned cells immediately, and
    * [[compactUpserts]] is the maintenance step that physically drops the
    * losers. The table must already carry `ingest_seq` (save the trained
    * model with a seeded seq column); supersession is undefined without
    * an order.
    */
  def appendVectors(spark: org.apache.spark.sql.SparkSession, dir: String,
      vecs: DataFrame, idCol: String, vecCol: String, seq: Long): Unit =
    appendVectorsSeqed(spark, dir,
      vecs.select(col(idCol).cast("long").as("id"), col(vecCol).as("v"),
        lit(seq).as("ingest_seq")))

  /** [[appendVectors]] with the supersession sequence riding IN THE DATA
    * (a per-row `seqCol`) instead of one literal per call — the streaming
    * shape: a change feed carries each event's own order, so the final
    * table state is a pure function of the event set and micro-batch
    * boundaries cannot affect it (the
    * [[graft.streaming.StreamingIndex.streamingInvertedIngest]] contract,
    * on the vector side).
    */
  def appendVectors(spark: org.apache.spark.sql.SparkSession, dir: String,
      vecs: DataFrame, idCol: String, vecCol: String, seqCol: String): Unit =
    appendVectorsSeqed(spark, dir,
      vecs.select(col(idCol).cast("long").as("id"), col(vecCol).as("v"),
        col(seqCol).cast("long").as("ingest_seq")))

  /** [[appendVectors]] carrying an ENCLOSING model's fence claim through
    * to the visibility point — the PQ wrapper appends its ivf half
    * through here so the PQ-dir token (the one
    * [[graft.sources.Snapshots.pinTrainingSet]] claims) re-validates at
    * this half's manifest put too.
    */
  private[operators] def appendVectorsOuterFenced(
      spark: org.apache.spark.sql.SparkSession, dir: String,
      vecs: DataFrame, idCol: String, vecCol: String, seqCol: String,
      outerFence: Seq[(String, Long)]): Unit =
    appendVectorsSeqed(spark, dir,
      vecs.select(col(idCol).cast("long").as("id"), col(vecCol).as("v"),
        col(seqCol).cast("long").as("ingest_seq")), outerFence)

  private def appendVectorsSeqed(spark: org.apache.spark.sql.SparkSession,
      dir: String, prepared: DataFrame,
      outerFence: Seq[(String, Long)] = Nil): Unit = {
    // a committed retrain whose swap crashed must adopt BEFORE the batch
    // lands: appended to the old table it would vanish with the swap
    recoverRetrain(spark, dir)
    // the append claims the model; the token re-validates at the
    // visibility point (the manifest put inside appendCellBatch), so an
    // append still staging when a snapshot-pin window opens is fenced
    // out before anything becomes visible. outerFence carries a PQ
    // wrapper's own model claim through to the same point.
    val tok = graft.sources.Fence.begin(spark, dir)
    val cur = graft.sources.CellManifest.readTable(spark, s"$dir/assigned")
    require(cur.columns.contains("ingest_seq"),
      s"appendVectors needs a seq-carrying index — save the trained model " +
        s"with an ingest_seq column before appending ($dir/assigned lacks it)")
    val centroids = loadCentroids(spark, dir)
    val batch = SimSearch.assignCells(prepared, centroids)
      .select(col("id"), col("v"), col("cell"), col("ingest_seq"))
      .repartition(col("cell"))
    appendCellBatch(spark, s"$dir/assigned", batch, outerFence :+ (dir -> tok))
    graft.sources.VectorAudit.logAppend(spark, dir,
      batch.select(col("id"), col("ingest_seq"), col("cell")))
  }

  /** Land an append batch on a cell table under its swap strategy: a
    * plain table appends in place; a manifest table stages the batch as
    * a fresh generation (no existing file is touched) and commits it
    * with one manifest put — a crash before the put loses the batch
    * (invisible, gc'd next pass) and the caller replays it whole, the
    * [[graft.sources.IndexStore.appendInverted]] contract.
    *
    * `modelFence` carries the MODEL-level claim(s) the append's caller
    * holds (the model dir for a standalone IVF index; the PQ dir AND the
    * ivf-half dir for a PQ index): they re-validate here, right before
    * the manifest put — the append's visibility point — which closes the
    * claim-to-write gap against [[graft.sources.Snapshots.pinTrainingSet]]
    * (an append that claimed before a pin window but is still staging
    * when the window opens is fenced out BEFORE anything becomes
    * visible; the staged generation is abandoned unreferenced and gc'd).
    * Because visibility is ONE atomic manifest put, a pin's manifest
    * read sees the whole batch or none of it — never a torn capture.
    * Plain (rename-mode) tables skip the check: they cannot hold pins
    * (pins require the manifest swap), so the gap has no observer.
    */
  private[operators] def appendCellBatch(
      spark: org.apache.spark.sql.SparkSession, tableDir: String,
      batch: DataFrame,
      modelFence: Seq[(String, Long)] = Nil): Unit =
    if (graft.sources.CellManifest.isManifest(spark, tableDir)) {
      val (gen, stage) = graft.sources.CellManifest.nextGen(spark, tableDir)
      batch.write.mode("overwrite").partitionBy("cell").parquet(stage)
      // staged-but-uncommitted: specs interleave a pin window here to
      // drive the claim-to-write gap deterministically
      graft.sources.MaintHooks.at("vecappend.staged", tableDir)
      // VISIBILITY POINT: the model claims must still be the head —
      // a pin (or any writer) that claimed the model during the stage
      // write refuses this commit; the stage is unreferenced garbage
      modelFence.foreach { case (d, tok) =>
        graft.sources.Fence.check(spark, d, tok)
      }
      graft.sources.CellManifest.commitAppend(spark, tableDir, gen)
    } else {
      graft.sources.Fence.begin(spark, tableDir) // the append claims
      batch.write.mode("append").partitionBy("cell").parquet(tableDir)
    }

  /** Physically drop superseded vector versions, CELL-SCOPED like
    * [[compactDeletes]]: only the cell directories holding ≥ 1 loser row
    * (an id with a newer seq anywhere) rewrite; clean cells stay
    * byte-identical. Queries answer identically before and after wherever
    * both versions were probed — compaction closes the stale-cell window
    * and reclaims space. Decision pass reads narrow columns only
    * (id, seq, cell — never the vectors).
    */
  def compactUpserts(spark: org.apache.spark.sql.SparkSession, dir: String): Unit = {
    recoverRetrain(spark, dir)
    graft.sources.Fence.begin(spark, dir)
    // the cell rewrite and the audit-mirror rewrite decide from DISJOINT
    // states (cell table vs audit id-map) and write disjoint paths; a
    // crash leaving either side un-rewritten is the same idempotent
    // re-run shape as the sequential order — overlap them (guide §2.6)
    graft.SparkUtil.inParallel(
      () => compactUpsertsCells(spark, s"$dir/assigned"),
      () => graft.sources.VectorAudit.compactUpserts(spark, dir)) // mirrors in lockstep
  }

  /** Fold a manifest table's GENERATION FAN-OUT — the maintenance op for
    * the append path's physical debt, which [[compactUpserts]] cannot
    * touch: every micro-batch append commits as its own generation, and
    * the rewrite only replaces the generation lists of cells holding
    * SUPERSEDED rows, so a pure-append stream (all-new ids, nothing to
    * supersede) grows every cell's list by one per batch forever — each
    * read of a cell then unions one directory per surviving append, and
    * at 10k batches that is 10k tiny-file scans per cell. This op folds
    * every cell whose list is LONGER than `maxGenLists` into one fresh
    * generation (the same staged-write + one-manifest-put commit as any
    * rewrite; rows pass through untouched — purely physical, answers
    * identical by construction). Decision cost is O(1) under a manifest
    * (the generation lists ARE the manifest). Rename-mode tables carry
    * the SAME debt as per-cell parquet-FILE fan-out (each append lands
    * one more file per touched cell in place): the threshold applies to
    * the file count there, the decision is one listStatus per cell dir,
    * and the fold runs through the rename-aside swap. The sink's
    * `compactAtGenLists` knob drives both from the `gen_lists_max` debt
    * signal (reported in the table's own units).
    */
  def compactGenerations(spark: org.apache.spark.sql.SparkSession,
      dir: String, maxGenLists: Int = 16): Unit = {
    recoverRetrain(spark, dir)
    graft.sources.Fence.begin(spark, dir)
    compactGenerationsCells(spark, s"$dir/assigned", maxGenLists)
  }

  private[operators] def compactGenerationsCells(
      spark: org.apache.spark.sql.SparkSession, tableDir: String,
      maxGenLists: Int): Unit = {
    require(maxGenLists >= 1, s"maxGenLists must be >= 1: $maxGenLists")
    val fs = new org.apache.hadoop.fs.Path(tableDir)
      .getFileSystem(spark.sessionState.newHadoopConf())
    maintenanceHead(spark, fs, tableDir)
    // per-cell read fan-out, in the table's own units: generation-list
    // length under a manifest, parquet-file count under rename mode
    // (there each append lands one more file per touched cell in place —
    // the same one-footer-per-surviving-append debt, different carrier)
    val dirty: Set[Int] =
      if (graft.sources.CellManifest.isManifest(spark, tableDir))
        graft.sources.CellManifest.read(spark, tableDir)._2
          .filter(_._2.length > maxGenLists).keySet.toSet
      else
        fs.listStatus(new org.apache.hadoop.fs.Path(tableDir))
          .filter(_.getPath.getName.startsWith("cell="))
          .filter(d => fs.listStatus(d.getPath)
            .count(_.getPath.getName.endsWith(".parquet")) > maxGenLists)
          .map(_.getPath.getName.stripPrefix("cell=").toInt).toSet
    if (dirty.isEmpty) return
    val kept = graft.sources.CellManifest.readTable(spark, tableDir)
      .withColumn("cell", col("cell").cast("int"))
      .where(col("cell").isin(dirty.toSeq: _*))
    rewriteCells(spark, fs, tableDir, dirty, kept)
  }

  /** OFFLINE RETRAIN of a persisted IVF index — the vector twin of
    * [[graft.sources.IndexStore.relayoutInverted]]: frozen-centroid
    * ingestion ([[appendVectors]]) accumulates assignment drift as the
    * corpus distribution moves away from the centroids trained at fit
    * time, and `nLists` sized for the starter corpus stops fitting a
    * grown one. Retrain fits fresh centroids (Lloyd, [[SimSearch
    * .trainIvf]]'s deterministic seeding) over the CURRENT truth — the
    * newest version of every live id, takedown markers applied — and
    * rebuilds the whole index (assigned cells + centroids + audit
    * id-map) through a FLAGGED side stage:
    *
    *  1. the stage builds at `__retrain_stage/` — the live index is
    *     NEVER the build site, so a failed rebuild destroys nothing;
    *  2. a `_complete` flag commits the intent; the swap then renames
    *     each live component aside and the staged one in;
    *  3. [[recoverRetrain]] — at the head of every maintenance op —
    *     discards an unflagged fragment, finishes a flagged swap
    *     (rename-idempotent), and restores any aside copy whose live
    *     component went missing: serving resumes from the complete old
    *     or complete new index, never a mix.
    *
    * Markers are APPLIED by the rebuild (deleted ids simply aren't in
    * the new index) and clear with the swap — the [[compactDeletes]]
    * redelivery contract: the caller's at-least-once window must close
    * before retraining. Each id carries its newest `ingest_seq` into the
    * rebuilt table, so post-retrain appends and deletes keep their
    * ordering. Inside the swap window a concurrent reader fails LOUDLY
    * (a component mid-rename), never silently partial — the text index's
    * concurrent-reader contract; single-writer per index, like every
    * maintenance op. The rebuilt table keeps the source's swap strategy
    * (a manifest table re-inits its manifest at generation 0).
    */
  def retrain(spark: org.apache.spark.sql.SparkSession, dir: String,
      nLists: Int, iters: Int = 2): Unit = {
    recoverRetrain(spark, dir)
    // snapshot pins reference the CURRENT generations, which the swap
    // replaces wholesale — refuse at the head (cheap, before the Lloyd
    // fit is paid for) and again at the commit point below
    requirePinFree(spark, dir, "retrain")
    val fenceTok = graft.sources.Fence.begin(spark, dir)
    val snap = retrainSnapshot(spark, dir)
    val cur = load(spark, dir) // markers applied at load
    val live = newestPerId(cur.assigned)
    val hasSeq = live.columns.contains("ingest_seq")
    val manifest = graft.sources.CellManifest
      .isManifest(spark, s"$dir/assigned")
    val m = SimSearch.trainIvf(live, "id", "v", nLists, iters)
    val rebuilt =
      if (hasSeq) m.assigned.join(
        live.select(col("id"), col("ingest_seq")), Seq("id"))
      else m.assigned
    val fs = deletedPath(spark, dir).getFileSystem(
      spark.sessionState.newHadoopConf())
    val stage = s"$dir/__retrain_stage"
    fs.delete(new org.apache.hadoop.fs.Path(stage), true)
    IvfModel(m.centroids, rebuilt).save(stage,
      if (manifest) graft.sources.IndexStore.SwapManifest
      else graft.sources.IndexStore.SwapRename)
    m.unpersist()
    // COMMIT POINT: seq-guard first (an append/takedown that raced the
    // offline rebuild would be silently dropped by the swap), then the
    // writer fence; either refusal leaves the stage UNFLAGGED — the next
    // maintenance head discards it and the live index is unchanged
    graft.sources.MaintHooks.at("retrain.staged", dir)
    requireRetrainUnmoved(spark, dir, snap)
    requirePinFree(spark, dir, "retrain") // a pin landed while staging
    graft.sources.Fence.check(spark, dir, fenceTok)
    // the flag commits the intent: everything below is re-runnable
    fs.create(new org.apache.hadoop.fs.Path(stage, "_complete"), true).close()
    finishRetrainSwap(spark, dir)
  }

  /** [[graft.sources.CellManifest.requireNoPins]] scoped to the index's
    * assigned table — no-op for rename-mode tables (pins need manifests).
    */
  private[operators] def requirePinFree(
      spark: org.apache.spark.sql.SparkSession, dir: String,
      op: String): Unit =
    if (graft.sources.CellManifest.isManifest(spark, s"$dir/assigned"))
      graft.sources.CellManifest.requireNoPins(spark, s"$dir/assigned", op)

  /** What the live index looked like when a retrain snapshotted it: the
    * newest ingest_seq, the physical row count of the assigned table, and
    * the takedown-marker file count. [[requireRetrainUnmoved]] compares
    * at the commit point — any append or delete that landed between
    * snapshot and swap moves at least one of the three (appends advance
    * the max seq by the monotone-seq contract, and always add rows; a
    * same-seq REPLAY is content-identical by the redelivery contract,
    * caught by the row count, and harmless to drop either way).
    */
  private[operators] final case class RetrainSnapshot(
      maxSeq: Option[Long], rows: Long, markerFiles: Int)

  private[operators] def retrainSnapshot(
      spark: org.apache.spark.sql.SparkSession, dir: String): RetrainSnapshot = {
    val raw = graft.sources.CellManifest.readTable(spark, s"$dir/assigned")
    val (maxSeq, rows) =
      if (raw.columns.contains("ingest_seq")) {
        val r = raw.agg(max(col("ingest_seq")), count(lit(1))).collect()(0)
        (if (r.isNullAt(0)) None else Some(r.getLong(0)), r.getLong(1))
      } else (None, raw.count())
    val delDir = deletedPath(spark, dir)
    val fs = delDir.getFileSystem(spark.sessionState.newHadoopConf())
    val markers =
      if (!fs.exists(delDir)) 0
      else fs.listStatus(delDir).count(_.getPath.getName.endsWith(".parquet"))
    RetrainSnapshot(maxSeq, rows, markers)
  }

  /** The retrain seq-guard: refuse the swap when the live table advanced
    * past the staged rebuild's snapshot — LOUD instead of silently
    * dropping the raced write (the fence catches a second WRITER; this
    * catches the same writer interleaving its own ingest with an offline
    * retrain it forgot to quiesce).
    */
  private[operators] def requireRetrainUnmoved(
      spark: org.apache.spark.sql.SparkSession, dir: String,
      snap: RetrainSnapshot): Unit = {
    val now = retrainSnapshot(spark, dir)
    if (now != snap) throw new IllegalStateException(
      s"retrain snapshot of $dir is stale: the live index advanced while " +
        s"the rebuild staged (max ingest_seq ${snap.maxSeq} -> ${now.maxSeq}, " +
        s"rows ${snap.rows} -> ${now.rows}, marker files ${snap.markerFiles} " +
        s"-> ${now.markerFiles}) — an append or takedown raced the offline " +
        "retrain and the swap would silently drop it; the commit was " +
        "refused and nothing changed. Quiesce the writer, then re-run " +
        "retrain (maintenanceDebt shows the backlog).")
  }

  /** The committed half of [[retrain]] — rename-idempotent, so a crash
    * anywhere inside re-runs to completion from the flag. Layout-
    * agnostic: every staged child except the flag swaps in (the IVF
    * stage holds assigned/centroids/_idmap; a PQ stage holds
    * ivf/encoded/codebooks/meta — [[PqModel.retrain]]).
    */
  private[operators] def finishRetrainSwap(
      spark: org.apache.spark.sql.SparkSession, dir: String): Unit = {
    val fs = deletedPath(spark, dir).getFileSystem(
      spark.sessionState.newHadoopConf())
    val stage = new org.apache.hadoop.fs.Path(s"$dir/__retrain_stage")
    val aside = new org.apache.hadoop.fs.Path(s"$dir/__retrain_aside")
    fs.mkdirs(aside)
    fs.listStatus(stage).map(_.getPath.getName)
      .filter(_ != "_complete").foreach { s =>
        val st = new org.apache.hadoop.fs.Path(stage, s)
        val lv = new org.apache.hadoop.fs.Path(s"$dir/$s")
        if (fs.exists(lv)) { fs.rename(lv, new org.apache.hadoop.fs.Path(aside, s)); () }
        fs.rename(st, lv); ()
      }
    // markers were applied by the rebuild — they clear with the swap
    // (a PQ index's markers live inside the swapped ivf/ subtree)
    val del = deletedPath(spark, dir)
    if (fs.exists(del)) { fs.delete(del, true); () }
    fs.delete(aside, true)
    fs.delete(stage, true); ()
  }

  /** Loud-fail guard for READERS ([[load]]/[[PqModel.load]]): a flagged
    * stage or an aside fragment means a committed retrain swap is
    * unfinished, and reading through it could pair components from two
    * training runs. An UNFLAGGED stage is fine to read past — the live
    * index is complete and still the truth (the build site is separate).
    */
  private[operators] def requireNoPendingRetrainSwap(
      spark: org.apache.spark.sql.SparkSession, dir: String): Unit = {
    val fs = deletedPath(spark, dir).getFileSystem(
      spark.sessionState.newHadoopConf())
    val flagged = fs.exists(new org.apache.hadoop.fs.Path(
      s"$dir/__retrain_stage/_complete"))
    val aside = fs.exists(new org.apache.hadoop.fs.Path(s"$dir/__retrain_aside"))
    if (flagged || aside) throw new IllegalStateException(
      s"$dir has a committed retrain swap pending (crashed mid-swap) — " +
        "reading now could pair components from two training runs; run " +
        "IvfModel.recoverRetrain (or any maintenance op) to finish the " +
        "swap, then re-load. The index is complete on disk, never lost.")
  }

  /** Crash recovery for [[retrain]], run at the head of every
    * maintenance op (and callable directly by an operator when a reader
    * hit the pending-swap guard): a FLAGGED stage is a committed retrain
    * — finish its swap; an unflagged stage is a failed build — discard
    * it (the live index was never touched); an aside copy whose live
    * component went missing is a mid-swap fragment — restore it.
    * Single-writer: run this from the maintenance pipeline, not from
    * concurrent readers.
    */
  def recoverRetrain(
      spark: org.apache.spark.sql.SparkSession, dir: String): Unit = {
    val fs = deletedPath(spark, dir).getFileSystem(
      spark.sessionState.newHadoopConf())
    val stage = new org.apache.hadoop.fs.Path(s"$dir/__retrain_stage")
    val aside = new org.apache.hadoop.fs.Path(s"$dir/__retrain_aside")
    if (fs.exists(stage)) {
      if (fs.exists(new org.apache.hadoop.fs.Path(stage, "_complete"))) {
        finishRetrainSwap(spark, dir)
        return
      }
      fs.delete(stage, true); ()
    }
    if (fs.exists(aside)) {
      fs.listStatus(aside).foreach { st =>
        val lv = new org.apache.hadoop.fs.Path(dir, st.getPath.getName)
        if (!fs.exists(lv)) { fs.rename(st.getPath, lv); () }
      }
      fs.delete(aside, true); ()
    }
  }

  /** [[compactUpserts]] over any cell-partitioned seq-carrying table —
    * shared with [[PqModel.compactUpserts]], whose one logical upsert
    * spans TWO such tables (assigned + encoded).
    */
  private[operators] def compactUpsertsCells(
      spark: org.apache.spark.sql.SparkSession, tableDir: String): Unit = {
    val fs = new org.apache.hadoop.fs.Path(tableDir)
      .getFileSystem(spark.sessionState.newHadoopConf())
    maintenanceHead(spark, fs, tableDir)
    val raw = graft.sources.CellManifest.readTable(spark, tableDir)
      .withColumn("cell", col("cell").cast("int"))
    if (!raw.columns.contains("ingest_seq")) return
    // dirty = cells holding a superseded row OR a same-seq duplicate (an
    // at-least-once replay that landed twice) — the duplicate criterion
    // matches [[graft.sources.VectorAudit.compactUpserts]]'s exactly, so
    // the cell table and its audit mirror dedupe the same rows and
    // verifyVectorState stays clean across any compaction order.
    // ONE exchange decides both: per-id version lists are bounded by the
    // ingest history since the last compaction (a handful of structs),
    // so a single groupBy(id) carries max-seq, supersession, and
    // duplicate detection together — the previous three-pass form
    // (winners agg + supersession join + duplicate agg) shuffled the
    // narrow projection three times for the same answer
    val dirty = dirtySlots(
      raw.select(col("id"), col("ingest_seq"), col("cell").as("slot")))
    if (dirty.isEmpty) return
    val winners = raw.groupBy(col("id"))
      .agg(max(col("ingest_seq")).as("__wseq"))
    val kept = raw.where(col("cell").isin(dirty.toSeq: _*))
      .join(winners, Seq("id"))
      .where(col("ingest_seq") === col("__wseq"))
      .drop("__wseq")
      .dropDuplicates("id", "ingest_seq", "cell")
    rewriteCells(spark, fs, tableDir, dirty, kept)
  }

  /** The slots (cells / id-map partitions) holding ≥ 1 row the upsert
    * compaction must drop — a superseded version (seq below the id's
    * max) or a same-seq duplicate — computed in ONE exchange: groupBy(id)
    * folds each id's (seq, slot) versions into a bounded list (ingest
    * history since the last compaction), and the dirty test runs inside
    * the aggregate's projection. Shared by [[compactUpsertsCells]] and
    * [[graft.sources.VectorAudit.compactUpserts]] so the two sides can
    * never drift.
    */
  private[graft] def dirtySlots(narrow: DataFrame): Set[Int] = {
    val perId = narrow.groupBy(col("id")).agg(
      max(col("ingest_seq")).as("__w"),
      collect_list(struct(col("ingest_seq"), col("slot"))).as("__vers"))
    perId.select(explode(col("__vers")).as("v"), col("__w"), col("__vers"))
      .where(col("v.ingest_seq") < col("__w") ||
        size(filter(col("__vers"),
          x => x.getField("ingest_seq") === col("v.ingest_seq") &&
            x.getField("slot") === col("v.slot"))) > 1)
      .select(col("v.slot")).distinct()
      .collect().map(_.getInt(0)).toSet
  }

  /** PIN the index's current ingest state as a named SNAPSHOT — the
    * reproducible-training-corpus primitive: [[load]]`(dir, pin = name)`
    * answers with these exact bytes while the live index keeps appending,
    * upserting, and compacting (pinned generations are retained by the
    * manifest gc; data files never move, so the snapshot costs zero
    * copies). Requires the manifest swap strategy — rename-mode
    * compaction rewrites files in place, which cannot freeze. Reader-
    * initiated (no fence claim); `retrain` and a re-`save` refuse while
    * pins exist (both replace the generations wholesale); takedown
    * markers deliberately pierce the pin (see [[load]]'s pinned overload).
    * Returns the pinned manifest number.
    */
  def pinSnapshot(spark: org.apache.spark.sql.SparkSession, dir: String,
      name: String): Long = {
    // a flagged pending retrain swap means the generations the pin would
    // reference are about to be replaced — same loud guard as readers
    requireNoPendingRetrainSwap(spark, dir)
    graft.sources.CellManifest.pin(spark, s"$dir/assigned", name)
  }

  /** Release a named snapshot: its generations reclaim at the next
    * maintenance pass. The training run that pinned owns the unpin.
    */
  def unpinSnapshot(spark: org.apache.spark.sql.SparkSession, dir: String,
      name: String): Unit =
    graft.sources.CellManifest.unpin(spark, s"$dir/assigned", name)

  /** Every named snapshot on the index: name -> pinned manifest number. */
  def snapshots(spark: org.apache.spark.sql.SparkSession,
      dir: String): Map[String, Long] =
    graft.sources.CellManifest.pins(spark, s"$dir/assigned")

  /** MATERIALIZE a named snapshot as a standalone index at `dest` — the
    * escape hatch the retrain/save refusals point at: a long-lived
    * training snapshot stops blocking whole-table maintenance the moment
    * it is exported and unpinned. The export is the SERVED state of the
    * pin (newest version per id, takedown markers applied — compliance
    * travels with the copy), written through the canonical [[save]] path
    * so the standalone index's meta, audit id-map, and layout are
    * correct by construction. One O(snapshot) distributed write — the
    * only time a snapshot costs data movement, paid exactly when the
    * operator chooses durability over zero-copy.
    */
  def exportSnapshot(spark: org.apache.spark.sql.SparkSession, dir: String,
      name: String, dest: String): Unit = {
    val pinned = load(spark, dir, name) // markers applied at read time
    // collapse to one seq per id — the save contract; the pinned backlog's
    // losers are exactly what serving would never answer from
    IvfModel(pinned.centroids, newestPerId(pinned.assigned)).save(dest)
  }

  def load(spark: org.apache.spark.sql.SparkSession, dir: String): IvfModel = {
    // a committed retrain whose swap crashed leaves a window where new
    // `assigned` and old `centroids` are both live — a load there would
    // probe the new cells with the old geometry, silently degraded. The
    // reader FAILS LOUDLY instead (two fs.exists on a clean index);
    // recovery runs at maintenance heads / recoverRetrain, never from
    // readers (two racing reader-recoveries could strand a component).
    requireNoPendingRetrainSwap(spark, dir)
    // partition column comes back as the pruning key; cast pins the int
    // type the in-memory model uses; a manifest-governed table resolves
    // its live generation directories, a plain one reads directly
    loadResolved(spark, dir,
      graft.sources.CellManifest.readTable(spark, s"$dir/assigned"))
  }

  /** Load the index AT A NAMED SNAPSHOT ([[pinSnapshot]]): the assigned
    * table resolves through the pinned manifest — the exact ingest state
    * the pin froze, however far the live table has appended or compacted
    * past it. Centroids are snapshot-stable by construction (only a
    * retrain replaces them, and retrain REFUSES while pins exist).
    * Takedown markers are NOT frozen: they apply at read time, so a
    * deleted id disappears from every snapshot the moment its marker
    * lands — compliance outranks reproducibility, deliberately (and
    * `compactDeletes` retains marker files while pins exist so the
    * exclusion survives the live table's physical scrub).
    */
  def load(spark: org.apache.spark.sql.SparkSession, dir: String,
      pin: String): IvfModel = {
    requireNoPendingRetrainSwap(spark, dir)
    loadResolved(spark, dir,
      graft.sources.CellManifest.readTable(spark, s"$dir/assigned", pin))
  }

  private def loadResolved(spark: org.apache.spark.sql.SparkSession,
      dir: String, rawAssigned: DataFrame): IvfModel = {
    val centroids = loadCentroids(spark, dir)
    val assigned = rawAssigned
      .withColumn("cell", col("cell").cast("int"))
    // the takedown side file, when present, excludes marked ids from
    // EVERY query the moment the marker lands — broadcast above the
    // cell-pruned scan (the marker set is takedown-sized by construction).
    // On a seq-carrying index the marker's OWN seq decides: a row whose
    // ingest_seq outranks the id's newest marker is a post-delete
    // re-ingest and serves (the text index's tombstone contract); a
    // seq-less index can't order the two events, so markers exclude
    // unconditionally there.
    val delDir = deletedPath(spark, dir)
    val fs = delDir.getFileSystem(spark.sessionState.newHadoopConf())
    val live =
      if (!fs.exists(delDir)) assigned
      else {
        val markers = deletedMarkers(spark, dir)
        if (!assigned.columns.contains("ingest_seq"))
          assigned.join(broadcast(markers.select(col("id"))),
            Seq("id"), "left_anti")
        else
          assigned.join(broadcast(markers), Seq("id"), "left_outer")
            .where(col("__del_seq").isNull || col("ingest_seq") > col("__del_seq"))
            .drop("__del_seq")
      }
    IvfModel(centroids, live)
  }

  /** Append DELETE markers for `ids` to a [[IvfModel.save]]d index — the
    * vector-side takedown path, mirroring the text index's
    * [[graft.sources.IndexStore.appendTombstones]]: a real pipeline's
    * removal request hits BOTH index families. [[load]] excludes marked
    * ids immediately; [[compactDeletes]] is the maintenance step that
    * physically drops their rows. `seq` positions the delete in a
    * seq-carrying index's change order, so a LATER re-ingest
    * ([[appendVectors]] with a higher seq) resurrects the id — the text
    * index's tombstone contract; the default (Long.MaxValue) deletes
    * unconditionally, which is the only coherent reading on a seq-less
    * index. Unlike the text tombstones, vector markers CLEAR at
    * [[compactDeletes]] — redelivery protection is bounded by compaction
    * cadence (documented there).
    */
  def deleteVectors(spark: org.apache.spark.sql.SparkSession, dir: String,
      ids: DataFrame, seq: Long = Long.MaxValue): Unit = {
    // adopt a committed-but-unswapped retrain FIRST: markers clear with
    // the swap, so one written beside a flagged stage would vanish
    // UNAPPLIED when the stage swaps in — the id would resurrect
    recoverRetrain(spark, dir)
    ids.select(col(ids.columns.head).cast("long").as("id"),
        lit(seq).as("__del_seq"))
      .repartition(1) // takedown batches are tiny; one marker file
      .write.mode("append").parquet(deletedPath(spark, dir).toString)
  }

  /** [[deleteVectors]] with the marker sequence riding IN THE DATA (a
    * per-row `seqCol`) — the change-feed shape: one micro-batch can carry
    * takedowns at different points of the event order, and the final
    * serve state stays a pure function of the event set (the
    * [[appendVectors]] seq-column twin, on the delete side).
    */
  def deleteVectors(spark: org.apache.spark.sql.SparkSession, dir: String,
      ids: DataFrame, idCol: String, seqCol: String): Unit = {
    recoverRetrain(spark, dir)
    ids.select(col(idCol).cast("long").as("id"),
        col(seqCol).cast("long").as("__del_seq"))
      .repartition(1)
      .write.mode("append").parquet(deletedPath(spark, dir).toString)
  }

  /** The newest marker per id, schema-tolerant: marker files written
    * before the seq column existed read as unconditional
    * (Long.MaxValue) deletes.
    */
  private[operators] def deletedMarkers(spark: org.apache.spark.sql.SparkSession,
      dir: String): DataFrame = {
    val raw = spark.read.parquet(deletedPath(spark, dir).toString)
    val withSeq =
      if (raw.columns.contains("__del_seq")) raw
      else raw.withColumn("__del_seq", lit(Long.MaxValue))
    withSeq.groupBy(col("id")).agg(max(col("__del_seq")).as("__del_seq"))
  }

  /** Physically drop deleted vectors, PARTITION-SCOPED like
    * [[graft.sources.IndexStore.compactInverted]]: only the cell
    * directories holding ≥ 1 deleted row are rewritten (staged, then
    * per-directory fs swap); clean cells stay byte-identical, and the
    * marker file clears afterwards so [[load]]'s marker filter becomes a
    * no-op. Queries answer identically before and after — compaction
    * reclaims space, never changes results. On a seq-carrying index only
    * the rows each marker OUTRANKS drop (a post-delete re-ingest
    * survives); clearing the marker here is the deliberate divergence
    * from the text index (whose tombstones persist as redelivery
    * guards): a vector batch replayed after its delete compacted will
    * resurrect — protection is bounded by compaction cadence, and the
    * caller's at-least-once window must close before maintenance runs.
    */
  def compactDeletes(spark: org.apache.spark.sql.SparkSession, dir: String): Unit = {
    recoverRetrain(spark, dir)
    graft.sources.Fence.begin(spark, dir)
    val delDir = deletedPath(spark, dir)
    val fs = delDir.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(delDir)) return
    val markers = deletedMarkers(spark, dir)
    // cell scrub and audit-mirror scrub read the same (already-resolved)
    // marker frame and write disjoint paths — overlap them (guide §2.6);
    // the marker FILE clears strictly after both, below
    graft.SparkUtil.inParallel(
      () => scrubCellTable(spark, s"$dir/assigned", markers),
      () => graft.sources.VectorAudit.compactDeletes(spark, dir, markers))
    // snapshot pins keep the PRE-DELETE generations readable, and a
    // pinned read excludes deleted ids through these markers (compliance
    // pierces the pin) — so while any pin exists the markers RETAIN: the
    // physical scrub of the live generations must not un-delete the id
    // for snapshot readers. They clear at the first compactDeletes after
    // the last unpin; the redelivery-protection window (bounded by
    // compaction cadence) stretches with them, never shrinks.
    if (!graft.sources.CellManifest.isManifest(spark, s"$dir/assigned") ||
        graft.sources.CellManifest.pins(spark, s"$dir/assigned").isEmpty) {
      fs.delete(delDir, true); ()
    }
  }

  /** Rewrite ONLY the `cell=` directories of a cell-partitioned table that
    * hold ≥ 1 row the `deleted` markers outrank — the shared scrub of the
    * IVF and PQ takedown paths (a PqModel carries TWO such tables off one
    * marker). `deleted` carries (id) or (id, __del_seq); rows of a
    * seq-carrying table survive when their ingest_seq outranks the marker.
    */
  private[operators] def scrubCellTable(spark: org.apache.spark.sql.SparkSession,
      tableDir: String, deleted: DataFrame): Unit = {
    val fs = new org.apache.hadoop.fs.Path(tableDir)
      .getFileSystem(spark.sessionState.newHadoopConf())
    maintenanceHead(spark, fs, tableDir)
    val raw = graft.sources.CellManifest.readTable(spark, tableDir)
      .withColumn("cell", col("cell").cast("int"))
    val seqAware = raw.columns.contains("ingest_seq") &&
      deleted.columns.contains("__del_seq")
    // a row "drops" when its id is marked and (seq-aware case) the marker
    // outranks it; dirty = cells holding ≥ 1 dropping row — narrow columns
    def dropping(df: DataFrame): DataFrame =
      if (seqAware)
        df.join(broadcast(deleted), Seq("id"))
          .where(col("ingest_seq") <= col("__del_seq"))
      else df.join(broadcast(deleted.select(col("id"))), Seq("id"), "left_semi")
    val dirty = dropping(raw.select(
        col("id") +: col("cell") +:
          (if (seqAware) Seq(col("ingest_seq")) else Nil): _*))
      .select(col("cell")).distinct().collect().map(_.getInt(0)).toSet
    if (dirty.isEmpty) return
    val inDirty = raw.where(col("cell").isin(dirty.toSeq: _*))
    val kept =
      if (seqAware)
        inDirty.join(broadcast(deleted), Seq("id"), "left_outer")
          .where(col("__del_seq").isNull || col("ingest_seq") > col("__del_seq"))
          .drop("__del_seq")
      else inDirty.join(broadcast(deleted.select(col("id"))), Seq("id"), "left_anti")
    rewriteCells(spark, fs, tableDir, dirty, kept)
  }

  /** Stage `kept` and swap it into the dirty `cell=` directories via the
    * rename-aside protocol (the IndexStore.compactInverted contract): the
    * live directory renames ASIDE — never deleted first — the staged one
    * renames in, and the aside copies drop only after EVERY swap landed,
    * so any crash window leaves a recoverable copy ([[recoverCellAside]]
    * restores it at the head of the next maintenance call). A staged cell
    * can be absent (every row dropped) — then the directory just deletes:
    * its content was 100% rows the rewrite was removing.
    */
  /** Crash recovery + space reclamation at the head of a maintenance
    * pass, per the table's swap strategy: a rename-mode table restores
    * any mid-swap aside copies; a manifest table garbage-collects
    * everything its newest manifest no longer references (replaced
    * generations retained for in-flight readers since the last flip, and
    * crashed unflipped stages).
    */
  private def maintenanceHead(spark: org.apache.spark.sql.SparkSession,
      fs: org.apache.hadoop.fs.FileSystem, tableDir: String): Unit =
    if (graft.sources.CellManifest.isManifest(spark, tableDir))
      graft.sources.CellManifest.gc(spark, tableDir)
    else recoverCellAside(fs, tableDir)

  private def rewriteCells(spark: org.apache.spark.sql.SparkSession,
      fs: org.apache.hadoop.fs.FileSystem, tableDir: String,
      dirty: Set[Int], kept: DataFrame): Unit = {
    if (graft.sources.CellManifest.isManifest(spark, tableDir)) {
      // manifest mode: the staged survivors ARE the new generation — the
      // one job that writes them is the only data movement of the whole
      // swap; the commit is a single manifest put. A crashed stage is an
      // unreferenced generation the next pass gc's.
      val (gen, stage) = graft.sources.CellManifest.nextGen(spark, tableDir)
      kept.repartition(col("cell"))
        .write.mode("overwrite").partitionBy("cell").parquet(stage)
      graft.sources.CellManifest.commitRewrite(spark, tableDir, gen, dirty)
      return
    }
    val fenceTok = graft.sources.Fence.begin(spark, tableDir)
    val stage = new org.apache.hadoop.fs.Path(s"$tableDir/__compact_stage")
    val aside = new org.apache.hadoop.fs.Path(s"$tableDir/__compact_aside")
    fs.delete(stage, true)
    kept.repartition(col("cell"))
      .write.mode("overwrite").partitionBy("cell").parquet(stage.toString)
    // COMMIT POINT: a writer that claimed the table during the stage
    // build fences the rename swap out; the stage is recovery garbage
    graft.sources.MaintHooks.at("cells.staged", tableDir)
    graft.sources.Fence.check(spark, tableDir, fenceTok)
    fs.mkdirs(aside)
    dirty.foreach { c =>
      val src = new org.apache.hadoop.fs.Path(stage, s"cell=$c")
      val dst = new org.apache.hadoop.fs.Path(s"$tableDir/cell=$c")
      if (fs.exists(src)) {
        if (fs.exists(dst)) {
          fs.rename(dst, new org.apache.hadoop.fs.Path(aside, s"cell=$c")); ()
        }
        fs.rename(src, dst); ()
      } else { fs.delete(dst, true); () } // absent ⇒ cell fully dropped
    }
    // every dirty cell swapped — only now do the old copies drop
    fs.delete(aside, true)
    fs.delete(stage, true); ()
  }

  /** Crash recovery for [[rewriteCells]]: an aside cell whose live
    * directory is missing was between its two renames — restore it; one
    * whose live directory exists completed its swap — drop the copy.
    */
  private def recoverCellAside(fs: org.apache.hadoop.fs.FileSystem,
      tableDir: String): Unit = {
    val aside = new org.apache.hadoop.fs.Path(s"$tableDir/__compact_aside")
    if (!fs.exists(aside)) return
    fs.listStatus(aside).foreach { st =>
      val dst = new org.apache.hadoop.fs.Path(tableDir, st.getPath.getName)
      if (!fs.exists(dst)) { fs.rename(st.getPath, dst); () }
      else { fs.delete(st.getPath, true); () }
    }
    fs.delete(aside, true); ()
  }

  private[operators] def deletedPath(spark: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.hadoop.fs.Path =
    new org.apache.hadoop.fs.Path(s"$dir/deleted")
}
