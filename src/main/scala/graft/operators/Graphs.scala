package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Link-graph operators for web-corpus curation. Host/page PageRank is a
  * published quality signal in the public crawl pipelines (Common Crawl
  * releases host-level ranks; CCNet/RefinedWeb-class filters consume
  * them), so a corpus engine needs to produce it from an edge list at
  * corpus scale.
  */
object Graphs {

  /** PageRank over a directed edge list, `iterations` synchronous rounds
    * at damping 0.85, simplified dangling handling (a node with no
    * out-edges leaks its mass — the convention of the original
    * formulation; planted gates avoid dangling nodes entirely).
    *
    * EXACT-INTEGER design (the repo's micro-unit convention): ranks live
    * in integer micro-units, r₀ = 1 000 000, and every round computes
    *   r'(v) = 150 000 + (17 · Σ_{u→v} w(u,v) · (r(u) div W(u))) div 20
    * with W(u) the total out-weight of u — floor divisions, so both the
    * per-edge share and the damping are exact integers: aggregation order
    * cannot perturb results and the DuckDB oracle replays every round
    * bit-for-bit. Unweighted multigraph edges each carry their own share.
    *
    * Overflow bound: w·(r div W) ≤ r because w ≤ W, so every per-edge
    * contribution — and hence each node's sum — is bounded by the total
    * corpus mass N·10⁶; 17·c stays under Long.MaxValue up to N ≈ 5×10¹¹
    * nodes, planetary-web headroom.
    *
    * Scale shape: per round, one (src)-keyed join of the rank table onto
    * the edge list and one map-side-combined sum keyed on dst — both
    * exchanges carry (id, long) rows only. Hub nodes (a host every page
    * links) are hot dst keys; the sum partial-aggregates map-side, so a
    * 10⁸-in-degree hub adds one long per upstream partition, not one row
    * per edge. The rank lineage is re-bound through `createDataFrame`
    * each round (the connectedComponents convention) so the plan stays
    * flat across iterations.
    */
  def pageRank(edges: DataFrame, srcCol: String, dstCol: String,
      iterations: Int): DataFrame =
    pageRankKeyed(edges.select(col(srcCol).cast("long").as(srcCol),
      col(dstCol).cast("long").as(dstCol)), srcCol, dstCol, iterations)

  /** [[pageRank]] over arbitrary (orderable, hash-joinable) node keys —
    * host strings in a web host graph — with an optional integer weight
    * column (link multiplicity from [[hostEdges]]). Output `node_id`
    * keeps the input key type. Same exact-integer rounds as [[pageRank]].
    */
  def pageRankKeyed(edges: DataFrame, srcCol: String, dstCol: String,
      iterations: Int, weightCol: Option[String] = None): DataFrame = {
    require(iterations >= 1 && iterations <= 50,
      s"iterations in [1,50], got $iterations")
    val spark = edges.sparkSession
    val w: Column = weightCol.map(c => col(c).cast("long")).getOrElse(lit(1L))
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"),
        w.as("w"))
      .transform(graft.SparkUtil.scopedPersist)
    val deg = e.groupBy("src").agg(sum("w").as("deg"))
    val nodes = e.select(col("src").as("v"))
      .union(e.select(col("dst").as("v"))).distinct()
      .transform(graft.SparkUtil.scopedPersist)
    var ranks = nodes.withColumn("r", lit(1000000L))
    for (_ <- 1 to iterations) {
      // `div` (true integer division) rather than floor(x / y): the
      // double route loses exactness past 2^52, which a planetary-scale
      // rank sum can reach
      val contrib = e.join(deg, Seq("src"))
        .join(ranks.withColumnRenamed("v", "src"), Seq("src"))
        .select(col("dst").as("v"), expr("w * (r div deg)").as("c"))
        .groupBy("v").agg(sum("c").as("c"))
      val next = nodes.join(contrib, Seq("v"), "left")
        .select(col("v"),
          (lit(150000L) + expr("(17 * coalesce(c, CAST(0 AS BIGINT))) div 20"))
            .as("r"))
      ranks = spark.createDataFrame(next.rdd, next.schema)
    }
    ranks.select(col("v").as("node_id"), col("r").as("rank_micro"))
  }

  /** HITS hubs/authorities (Kleinberg 1999, "Authoritative sources in a
    * hyperlinked environment") over a directed edge list, `iterations`
    * synchronous rounds. Complements [[pageRank]]: PageRank scores global
    * endorsement, HITS separates pages that POINT WELL (hubs — link
    * directories, index pages) from pages POINTED AT well (authorities),
    * a useful pair of crawl-curation signals. Duplicate edge rows act as
    * multiplicity weights (multigraph convention, same as [[pageRank]]).
    *
    * EXACT-INTEGER design (micro-unit convention): h₀ = 10⁶; per round
    *   rawA(v) = Σ_{u→v} h(u), then a = rawA div g with
    *   g = max(1, (max_v rawA + 999999) div 10⁶),
    * and symmetrically rawH(u) = Σ_{u→v} a(v) with its own divisor. The
    * divisor normalization replaces the textbook L2 norm: every round
    * stays in exact integers (floor divisions only — aggregation order
    * cannot perturb results, the DuckDB oracle replays bit-for-bit) and
    * scores land in [0, 10⁶] with the round's max pinned near 10⁶.
    *
    * Overflow bound: normalized scores ≤ 10⁶ and raw sums ≤ d_max·10⁶ —
    * there is NO raw×10⁶ product anywhere (the divisor absorbs the
    * scaling), so Long arithmetic holds to d_max ≈ 9×10¹², beyond any
    * real in-degree.
    *
    * Scale shape per round: two (id, long)-keyed join+sum pairs, both
    * map-side combined; the per-round max is ONE broadcast row. Hub
    * nodes are hot keys of the authority sum and partial-aggregate
    * map-side, exactly as in [[pageRank]].
    */
  def hits(edges: DataFrame, srcCol: String, dstCol: String,
      iterations: Int): DataFrame = {
    require(iterations >= 1 && iterations <= 50,
      s"iterations in [1,50], got $iterations")
    val spark = edges.sparkSession
    val e = edges.select(col(srcCol).cast("long").as("src"),
        col(dstCol).cast("long").as("dst"))
      .transform(graft.SparkUtil.scopedPersist)
    val nodes = e.select(col("src").as("v"))
      .union(e.select(col("dst").as("v"))).distinct()
      .transform(graft.SparkUtil.scopedPersist)
    def rebind(df: DataFrame): DataFrame =
      spark.createDataFrame(df.rdd, df.schema)
    // raw is read twice (divisor + normalization) — scoped-persisted so
    // each round computes its sums once; the divisor row broadcasts
    def normalized(raw: DataFrame, c: String): DataFrame = {
      val r = raw.transform(graft.SparkUtil.scopedPersist)
      r.crossJoin(broadcast(r.agg(coalesce(max(col(c)), lit(0L)).as("__mx"))))
        .select(col("v"), expr(
          s"$c div greatest(CAST(1 AS BIGINT), (__mx + 999999) div 1000000)")
          .as(c))
    }
    def gatherOnto(scores: DataFrame, scoreCol: String, fromEnd: String,
        toEnd: String, outCol: String): DataFrame =
      nodes.join(
          e.join(scores.withColumnRenamed("v", fromEnd), Seq(fromEnd))
            .groupBy(col(toEnd).as("v")).agg(sum(scoreCol).as(outCol)),
          Seq("v"), "left")
        .select(col("v"), coalesce(col(outCol), lit(0L)).as(outCol))
    var hub = nodes.withColumn("h", lit(1000000L))
    var auth = nodes.withColumn("a", lit(0L))
    for (_ <- 1 to iterations) {
      auth = rebind(normalized(gatherOnto(hub, "h", "src", "dst", "a"), "a"))
      hub = rebind(normalized(gatherOnto(auth, "a", "dst", "src", "h"), "h"))
    }
    nodes.join(hub, Seq("v")).join(auth, Seq("v"))
      .select(col("v").as("node_id"), col("h").as("hub_micro"),
        col("a").as("auth_micro"))
  }

  /** Per-node LOCAL CLUSTERING COEFFICIENT over an undirected pair list
    * (a < b normalized) — the graph-density audit of a duplicate-family
    * graph: coefficient 1 means the node's neighborhood is a clique (a
    * true duplicate family), near 0 a hub of unrelated accidental pairs.
    * `clustering = 2·triangles(v) / (deg(v)·(deg(v)−1))`, null for
    * degree < 2. Output: (id, degree, n_triangles, clustering6).
    *
    * Scale shape: degrees are one map-side-combined count over the edge
    * endpoints; triangles reuse the cyclic 3-way SELF-JOIN on the
    * normalized edge list (each join keyed on a node id — never an
    * all-pairs product; the [[Dedup.trianglePairs]] convention) and
    * membership counts partial-aggregate map-side. Everything shuffled
    * is (id, count) pairs or edge endpoints.
    */
  def localClustering(pairs: DataFrame, aCol: String = "a_id",
      bCol: String = "b_id"): DataFrame = {
    val e = pairs.select(col(aCol).cast("long").as("u"), col(bCol).cast("long").as("v"))
      .transform(graft.SparkUtil.scopedPersist)
    val deg = e.select(col("u").as("id")).unionAll(e.select(col("v").as("id")))
      .groupBy("id").agg(count(lit(1)).as("degree"))
    val tri = e.as("e1").join(e.as("e2"), col("e1.v") === col("e2.u"))
      .join(e.as("e3"), col("e3.u") === col("e1.u") && col("e3.v") === col("e2.v"))
      .select(col("e1.u").as("i"), col("e1.v").as("j"), col("e2.v").as("k"))
    val perNode = tri.select(explode(array(col("i"), col("j"), col("k"))).as("id"))
      .groupBy("id").agg(count(lit(1)).as("n_triangles"))
    deg.join(perNode, Seq("id"), "left")
      .withColumn("n_triangles", coalesce(col("n_triangles"), lit(0L)))
      .withColumn("clustering6", when(col("degree") >= 2,
        round(lit(2.0) * col("n_triangles") / (col("degree") * (col("degree") - 1)), 6)))
  }

  /** Collapse a page-level link table ([[TextAnalysis.extractLinks]]) to
    * the weighted host graph: drop intra-host links (the host-graph
    * convention — self-mass would swamp the inter-host signal), count
    * multiplicity. One map-side-combined aggregate keyed on the host
    * pair; the exchange carries (host, host, count) partials only.
    */
  def hostEdges(links: DataFrame): DataFrame =
    links.where(!col("internal"))
      .groupBy("src_host", "dst_host").agg(count(lit(1)).as("n_links"))

  /** Neighborhood-Jaccard node similarity (the classic link-prediction /
    * role-similarity score): for every node pair with at least one COMMON
    * neighbor, `|N(a)∩N(b)| / |N(a)∪N(b)|` over the undirected neighbor
    * sets — exact integers until the final ratio, which follows the
    * rounded-6 convention with (a, b) ties pinned.
    *
    * Scale shape: common-neighbor counts come from the 2-path self-join
    * (edges ⋈ edges on the middle node — the triangle-join convention),
    * whose pair volume is Σ deg(m)² — QUADRATIC in any hub's degree. So
    * super-nodes (degree > `maxHubDegree`) are REMOVED first, the
    * standard similarity-mining preprocessing (a node adjacent to
    * everything carries no discriminative signal, exactly like a
    * stopword; measured here: an in-degree-n hub at sf0.1 was 74 MB of
    * pair shuffle, 1.3 MB after the cap). On the capped graph the join
    * aggregates map-side to (a, b, long) rows, degrees join as key-sized
    * frames, and zero-common pairs (the n² of the problem) never
    * materialize.
    */
  def nodeJaccard(edges: DataFrame, srcCol: String, dstCol: String,
      topN: Int, maxHubDegree: Int = 64): DataFrame = {
    require(topN >= 1, s"topN must be >= 1, got $topN")
    require(maxHubDegree >= 1, s"maxHubDegree must be >= 1, got $maxHubDegree")
    val dir = edges.select(col(srcCol).cast("long").as("a"),
      col(dstCol).cast("long").as("b"))
    // undirected simple graph: dedup both orientations, drop self-loops
    val und0 = dir.unionAll(dir.select(col("b").as("a"), col("a").as("b")))
      .where(col("a") =!= col("b")).distinct()
      .transform(graft.SparkUtil.scopedPersist)
    val hubs = und0.groupBy("a").agg(count(lit(1)).as("deg"))
      .where(col("deg") > maxHubDegree).select(col("a").as("__h"))
      .transform(graft.SparkUtil.scopedPersist)
    val und = und0
      .join(hubs.select(col("__h").as("a")), Seq("a"), "left_anti")
      .join(hubs.select(col("__h").as("b")), Seq("b"), "left_anti")
      .transform(graft.SparkUtil.scopedPersist)
    val deg = und.groupBy("a").agg(count(lit(1)).as("deg"))
    val common = und.select(col("a").as("x"), col("b").as("m"))
      .join(und.select(col("a").as("m"), col("b").as("y")), Seq("m"))
      .where(col("x") < col("y"))
      .groupBy(col("x"), col("y")).agg(count(lit(1)).as("common"))
    common
      .join(deg.select(col("a").as("x"), col("deg").as("dx")), Seq("x"))
      .join(deg.select(col("a").as("y"), col("deg").as("dy")), Seq("y"))
      .select(col("x").as("a_id"), col("y").as("b_id"), col("common"),
        round(col("common").cast("double") /
          (col("dx") + col("dy") - col("common")), 6).as("jaccard6"))
      .orderBy(col("jaccard6").desc, col("a_id").asc, col("b_id").asc)
      .limit(topN)
  }

  /** Personalized PageRank (the TrustRank / seed-propagation form,
    * Gyöngyi et al. 2004): identical exact-integer rounds to [[pageRank]]
    * except the teleport mass returns ONLY to the `seeds` set — scores
    * measure endorsement REACHABLE FROM the trusted seeds, the quality
    * signal that separates link spam (high global PageRank, no trusted
    * path) from genuinely endorsed hosts.
    *
    * Exact-integer design: total teleport mass 0.15·n·10⁶ splits evenly
    * over the s seeds (`(15·n·10⁶ div 100) div s` micro-units each, floor
    * division — bit-replayable); per round
    * `r = teleport + (17·contrib) div 20`. Non-seed sinks leak mass like
    * the plain-pageRank convention (no dangling redistribution — same
    * documented choice). Seeds are a broadcastable id frame; everything
    * else is the [[pageRank]] shape: one (id, long) join + map-side
    * combined sum per round.
    */
  def personalizedPageRank(edges: DataFrame, srcCol: String, dstCol: String,
      seeds: DataFrame, seedCol: String, iterations: Int): DataFrame = {
    require(iterations >= 1 && iterations <= 50,
      s"iterations in [1,50], got $iterations")
    val spark = edges.sparkSession
    val e = edges.select(col(srcCol).cast("long").as("src"),
        col(dstCol).cast("long").as("dst"))
      .transform(graft.SparkUtil.scopedPersist)
    val deg = e.groupBy("src").agg(count(lit(1)).as("deg"))
    val nodes = e.select(col("src").as("v"))
      .union(e.select(col("dst").as("v"))).distinct()
      .transform(graft.SparkUtil.scopedPersist)
    val seedIds = seeds.select(col(seedCol).cast("long").as("v")).distinct()
      .transform(graft.SparkUtil.scopedPersist)
    val n = nodes.count()
    val s = seedIds.count()
    require(s > 0, "personalizedPageRank: empty seed set")
    val perSeed = (15L * n * 1000000L / 100L) / s
    val base = nodes.join(broadcast(seedIds.withColumn("__t", lit(perSeed))),
        Seq("v"), "left")
      .select(col("v"), coalesce(col("__t"), lit(0L)).as("t"))
      .transform(graft.SparkUtil.scopedPersist)
    var ranks = base.select(col("v"), col("t").as("r"))
    for (_ <- 1 to iterations) {
      val contrib = e.join(deg, Seq("src"))
        .join(ranks.withColumnRenamed("v", "src"), Seq("src"))
        .select(col("dst").as("v"), expr("r div deg").as("c"))
        .groupBy("v").agg(sum("c").as("c"))
      val next = base.join(contrib, Seq("v"), "left")
        .select(col("v"),
          (col("t") + expr("(17 * coalesce(c, CAST(0 AS BIGINT))) div 20"))
            .as("r"))
      ranks = spark.createDataFrame(next.rdd, next.schema)
    }
    ranks.select(col("v").as("node_id"), col("r").as("ppr_micro"))
  }

  /** Synchronous label propagation (Raghavan et al. 2007, "Near linear
    * time algorithm to detect community structures") over an undirected
    * view of the edge list: labels start as node ids; each round every
    * node adopts the label most frequent among its neighbors (duplicate
    * edges count as multiplicity — multigraph convention, like
    * [[pageRank]]), isolated-in-round nodes keep their label. The
    * textbook algorithm breaks frequency ties RANDOMLY — here ties pin to
    * the SMALLEST label, so every round is a pure function of the graph
    * and the DuckDB oracle replays it bit-for-bit.
    *
    * Scale shape per round: one (long, long) equi-join of edges against
    * the label frame, one map-side-combined (node, label) count, then the
    * per-node argmax as `min(struct(-cnt, label))` — an AGGREGATE, not a
    * window, so hub nodes (the hot keys) partial-aggregate map-side and
    * nothing is ever sorted per partition. Lineage is re-bound per round
    * (the [[pageRank]] convention) so plans stay flat across iterations.
    */
  def labelPropagation(edges: DataFrame, srcCol: String, dstCol: String,
      iterations: Int): DataFrame = {
    require(iterations >= 1 && iterations <= 50,
      s"iterations in [1,50], got $iterations")
    val spark = edges.sparkSession
    val dir = edges.select(col(srcCol).cast("long").as("a"),
      col(dstCol).cast("long").as("b"))
    val e = dir.unionAll(dir.select(col("b").as("a"), col("a").as("b")))
      .transform(graft.SparkUtil.scopedPersist)
    val nodes = e.select(col("a").as("v")).distinct()
      .transform(graft.SparkUtil.scopedPersist)
    var labels = nodes.withColumn("label", col("v"))
    for (_ <- 1 to iterations) {
      val counts = e.join(labels.select(col("v").as("b"), col("label")), Seq("b"))
        .groupBy(col("a"), col("label")).agg(count(lit(1)).as("cnt"))
      val winner = counts.groupBy("a")
        .agg(min(struct((-col("cnt")).as("nc"), col("label").as("l"))).as("w"))
        .select(col("a").as("v"), col("w").getField("l").as("label"))
      // Fallback joins against the PREVIOUS round's labels (not the node
      // id) so an isolated-in-round node genuinely keeps its label, as the
      // scaladoc states. Unreachable with the current `nodes` (every node
      // has >= 1 edge, so a winner always exists) but kept honest.
      val next = labels.select(col("v"), col("label").as("__prev"))
        .join(winner, Seq("v"), "left")
        .select(col("v"), coalesce(col("label"), col("__prev")).as("label"))
      labels = spark.createDataFrame(next.rdd, next.schema)
    }
    labels.select(col("v").as("node_id"), col("label"))
  }

  /** k-core membership by `rounds` SYNCHRONOUS peeling rounds (Seidman
    * 1983, "Network structure and minimum degree"): each round removes
    * every node whose degree in the SURVIVING subgraph is below k; the
    * k-core is the fixpoint. Degrees follow the [[pageRank]] multigraph
    * convention (duplicate edges count, a self-loop contributes 2 via the
    * undirected expansion). The fixed round count keeps the computation a
    * pure function a SQL oracle unrolls exactly; `converged` (same value
    * on every row) reports whether round `rounds`+1 would have removed
    * nothing more — the alive set only SHRINKS, so count equality IS the
    * fixpoint test (the connectedComponents label-sum trick).
    *
    * Scale shape per round: one (long, long) semi-join of the undirected
    * edge list against the alive set per endpoint, one map-side-combined
    * degree count — hub hot keys partial-aggregate. Lineage re-bound per
    * round so plans stay flat.
    */
  def kCore(edges: DataFrame, srcCol: String, dstCol: String, k: Int,
      rounds: Int): DataFrame = {
    require(k >= 1, s"k >= 1, got $k")
    require(rounds >= 1 && rounds <= 50, s"rounds in [1,50], got $rounds")
    val spark = edges.sparkSession
    val dir = edges.select(col(srcCol).cast("long").as("a"),
      col(dstCol).cast("long").as("b"))
    val e = dir.unionAll(dir.select(col("b").as("a"), col("a").as("b")))
      .transform(graft.SparkUtil.scopedPersist)
    val nodes = e.select(col("a").as("v")).distinct()
      .transform(graft.SparkUtil.scopedPersist)
    def peel(alive: DataFrame): DataFrame =
      e.join(alive.select(col("v").as("a")), Seq("a"))
        .join(alive.select(col("v").as("b")), Seq("b"))
        .groupBy(col("a").as("v")).agg(count(lit(1)).as("__d"))
        .where(col("__d") >= k).select("v")
    var alive = nodes
    for (_ <- 1 to rounds) {
      val next = peel(alive)
      alive = spark.createDataFrame(next.rdd, next.schema)
    }
    val nAlive = alive.count()
    val converged = peel(alive).count() == nAlive
    nodes.join(alive.withColumn("__in", lit(true)), Seq("v"), "left")
      .select(col("v").as("node_id"),
        coalesce(col("__in"), lit(false)).as("in_kcore"),
        lit(converged).as("converged"))
  }
}
