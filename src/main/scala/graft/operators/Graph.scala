package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative GRAPH analytics over edge tables — the family the engine's
  * pointer-jumping connected components (Dedup.dupClusters, d6) opened,
  * extended to value-propagating iteration: PageRank over the item
  * co-view graph ("which items are structurally central", the
  * recommendation-seeding and crawl-prioritization primitive).
  *
  * Everything here follows the Pregel execution shape re-expressed in
  * DataFrames: the edge table is hash-partitioned ONCE on the message
  * key and persisted; each superstep is one co-partitioned join + one
  * map-side-combining aggregate; the per-iteration state (one row per
  * node) is the only thing that moves. At 100 TB the edge partitioning
  * is reused across every superstep (no per-iteration edge shuffle) and
  * lineage is cut by checkpointing every few supersteps — at the gated
  * 5 iterations the unrolled plan is fine as-is.
  */
object Graph {

  /** PageRank in EXACT INTEGER e6 units — deterministic by construction
    * (the d6/j13 integer discipline applied to an iterative fixpoint):
    * ranks live in micros (r⁰ = 10⁶ div n), and one superstep is
    *
    *   r⁺(v) = (150000 div n) + Σ_{u→v} (r(u)·85) div (100·deg(u))
    *
    * i.e. damping 0.85 and teleport 0.15/n carried by floor division —
    * every quantity a long, every sum order-free, so the engine and the
    * oracle's chained-CTE replay agree bit-for-bit (float PageRank sums
    * in arbitrary order and cannot hash-match itself, let alone DuckDB).
    * The floor systematically leaks ≤1 micro per in-edge per step —
    * fine for a CENTRALITY ORDERING, which is what PageRank is for;
    * nobody reads absolute rank mass.
    *
    * `edges` must be a directed edge table `(src, dst)`, distinct, with
    * every node appearing as a src (no dangling nodes — automatically
    * true for the symmetric co-view graph from [[coviewEdges]]; a
    * general crawl graph would first add dangling→all or self edges,
    * the standard patch). Output: `(item, deg, rank_e6)` ordered by
    * rank desc, item — deg carried so readers can see centrality ≠
    * degree (the whole point of the recursion).
    */
  def pageRank(edges: DataFrame, iters: Int = 5): DataFrame = {
    // materialize the per-node report, then release the superstep edge
    // cache — repeated harness invocations must not accumulate cached
    // partitions (the seasonalVolumeFromDaily idiom)
    val (lazyOut, cache) = pageRankPlan(edges, iters)
    val out = lazyOut.localCheckpoint(true)
    cache.unpersist()
    out
  }

  /** The lazy plan behind [[pageRank]] plus its edge-cache handle —
    * exposed so plan audits can inspect the superstep shape before the
    * public entry's materialize-and-unpersist hides it.
    */
  private[graft] def pageRankPlan(edges: DataFrame,
                                  iters: Int): (DataFrame, DataFrame) = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    val deg = edges.groupBy("src").agg(count(lit(1)).as("deg"))
    // one edge shuffle for ALL supersteps: partition on the join key and
    // persist — each iteration reuses the layout (the Pregel shape)
    val e = edges.join(deg, "src")
      .repartition(col("src"))
      .persist()
    val n = deg.count()
    require(n > 0, "pageRank needs a non-empty edge table")
    val tele = 150000L / n
    var ranks = deg.select(col("src").as("item"), lit(1000000L / n).as("r"))
    (1 to iters).foreach { _ =>
      ranks = e.join(ranks.withColumnRenamed("item", "src"), "src")
        .groupBy("dst")
        .agg(sum(expr("(r * 85) DIV (100 * deg)")).as("in_sum"))
        .select(col("dst").as("item"), (lit(tele) + col("in_sum")).as("r"))
    }
    val out = ranks.join(deg.select(col("src").as("item"), col("deg")), "item")
      .select(col("item"), col("deg"), col("r").as("rank_e6"))
      .orderBy(col("rank_e6").desc, col("item"))
    (out, e)
  }

  /** WEIGHTED PageRank — [[pageRank]] with each edge carrying a long
    * weight (co-view SUPPORT from [[coviewEdgesWeightedFromPairs]]):
    * a neighbor backed by eighty shared viewers should pull eighty
    * times the rank mass of a single-viewer fluke, which the unweighted
    * walk cannot express. Same exact-integer discipline, the recurrence
    * distributing each node's damped rank proportionally to out-weight:
    *
    *   r⁺(v) = (150000 div n) + Σ_{u→v} (r(u)·85·w(u,v)) div (100·W(u))
    *
    * with W(u) = Σ out-weights of u — every quantity a long, every sum
    * order-free, so the chained-CTE oracle replay hash-matches. The
    * floor leaks ≤1 micro per in-edge per step, fine for an ordering
    * (the g1 argument). Same Pregel plan shape: the weight-annotated
    * edge table partitions ONCE on the message key and persists; each
    * superstep one co-partitioned join + map-side-combining aggregate;
    * cache released after the terminal action.
    *
    * `edges` must be `(src, dst, w)` with positive long weights, every
    * node appearing as a src (symmetric weighted co-view satisfies
    * both). Output: `(item, deg, wsum, rank_e6)` ordered by rank desc,
    * item — degree AND weight-sum carried so readers can see the
    * weighted order diverge from both.
    */
  def pageRankWeighted(edges: DataFrame, iters: Int = 5): DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    val ws = edges.groupBy("src")
      .agg(sum("w").as("wsum"), count(lit(1)).as("deg"))
    val e = edges.join(ws, "src")
      .repartition(col("src"))
      .persist()
    val n = ws.count()
    require(n > 0, "pageRankWeighted needs a non-empty edge table")
    val tele = 150000L / n
    var ranks = ws.select(col("src").as("item"), lit(1000000L / n).as("r"))
    (1 to iters).foreach { _ =>
      ranks = e.join(ranks.withColumnRenamed("item", "src"), "src")
        .groupBy("dst")
        .agg(sum(expr("(r * 85 * w) DIV (100 * wsum)")).as("in_sum"))
        .select(col("dst").as("item"), (lit(tele) + col("in_sum")).as("r"))
    }
    val out = ranks
      .join(ws.select(col("src").as("item"), col("deg"), col("wsum")), "item")
      .select(col("item"), col("deg"), col("wsum"), col("r").as("rank_e6"))
      .orderBy(col("rank_e6").desc, col("item"))
      .localCheckpoint(true)
    e.unpersist()
    out
  }

  /** Per-node TRIANGLE counts and clustering coefficient over a symmetric
    * distinct edge table — the community-structure audit ("how clique-ish
    * is each item's neighborhood"), the signal behind spam-ring detection
    * and recommendation-diversity gates.
    *
    * Algorithm: the classic degree-ordered orientation (each undirected
    * edge kept only low→high by `(deg, id)` — a total order, so exactly
    * one direction survives). A triangle {x≺y≺z} is then found exactly
    * once: as the wedge (y, z) at its LOWEST-ordered apex x, closed by the
    * oriented edge y→z. Wedges are generated only from oriented
    * out-neighbors, whose fan-out is O(√m) per node on any graph — the
    * bound that makes this the standard at-scale triangle algorithm (an
    * unoriented neighbor self-join squares the heaviest hub instead).
    *
    * Plan shape: the oriented edge table is hash-partitioned ONCE on the
    * apex and persisted; the wedge self-join is co-partitioned (zero extra
    * shuffle on the big side), the closing check is a LEFT SEMI join (no
    * row multiplication), and per-node counts come from one map-side-
    * combining aggregate over exploded corners. Everything is exact
    * integers; the clustering coefficient is floor-divided micros
    * `(2·tri·10⁶) div (deg·(deg−1))`, so engine and oracle agree
    * bit-for-bit.
    *
    * Output: `(item, deg, tri, cc_e6)` ordered by (tri desc, item) —
    * degree carried so readers see closure ≠ popularity.
    */
  def triangleStats(edges: DataFrame): DataFrame = {
    val (lazyOut, cache) = triangleStatsPlan(edges)
    val out = lazyOut.localCheckpoint(true)
    cache.unpersist()
    out
  }

  /** The lazy plan behind [[triangleStats]] plus its oriented-edge cache
    * handle — exposed for the plan audit, same split as [[pageRankPlan]].
    */
  private[graft] def triangleStatsPlan(edges: DataFrame): (DataFrame, DataFrame) = {
    val deg = edges.groupBy("src").agg(count(lit(1)).as("deg"))
    val (tris, oriented) = trianglesPlan(edges, deg)
    val perNode = tris
      .select(explode(array(col("a"), col("b"), col("c"))).as("item"))
      .groupBy("item").agg(count(lit(1)).as("tri"))
    val out = deg.select(col("src").as("item"), col("deg"))
      .join(perNode, Seq("item"), "left")
      .select(col("item"), col("deg"),
        coalesce(col("tri"), lit(0L)).as("tri"))
      .withColumn("cc_e6",
        when(col("deg") >= 2,
          expr("(tri * 2000000) DIV (deg * (deg - 1))")).otherwise(0L))
      .orderBy(col("tri").desc, col("item"))
    (out, oriented)
  }

  /** The shared triangle-enumeration core of [[triangleStats]] and
    * [[edgeEmbeddedness]]: degree-ordered orientation (each undirected
    * edge kept low→high by `(deg, id)`), co-partitioned wedge self-join
    * at the lowest-ordered apex, LEFT SEMI close — every triangle
    * emitted exactly once as `(a, b, c)` in orientation order. Returns
    * the lazy triangle stream plus the persisted oriented-edge cache
    * handle (the caller unpersists).
    */
  private[graft] def trianglesPlan(edges: DataFrame,
                                   deg: DataFrame): (DataFrame, DataFrame) = {
    val oriented = edges
      .join(deg.select(col("src"), col("deg").as("sdeg")), "src")
      .join(deg.select(col("src").as("dst"), col("deg").as("ddeg")), "dst")
      .where(struct(col("sdeg"), col("src")) < struct(col("ddeg"), col("dst")))
      .select(col("src"), col("dst"), col("ddeg"))
      .repartition(col("src"))
      .persist()
    // wedge (b, c) at apex a, second leg ordered the same way edges were
    // oriented — so the closing edge b→c is exactly an oriented-table row
    val wedges = oriented.as("e1").join(oriented.as("e2"),
        col("e1.src") === col("e2.src") &&
          struct(col("e1.ddeg"), col("e1.dst")) <
            struct(col("e2.ddeg"), col("e2.dst")))
      .select(col("e1.src").as("a"), col("e1.dst").as("b"), col("e2.dst").as("c"))
    val tris = wedges.join(
      oriented.select(col("src").as("b"), col("dst").as("c")),
      Seq("b", "c"), "left_semi")
    (tris, oriented)
  }

  /** EDGE EMBEDDEDNESS — per-EDGE triangle support and neighborhood
    * Jaccard over a symmetric distinct edge table: how many common
    * neighbors each CONNECTED pair shares, and what fraction of their
    * combined neighborhoods that is — Granovetter tie strength, the
    * edge-level dual of [[triangleStats]]' node view and the mirror of
    * [[linkPrediction]] (which scores NON-adjacent pairs; this scores
    * the existing edges). A support-0 edge is a LOCAL BRIDGE — the only
    * path between its endpoints' neighborhoods, the structural-hole
    * signal behind community-boundary detection and recommendation
    * diversity ("this co-view link crosses communities").
    *
    * Support is computed from the SAME degree-ordered triangle
    * enumeration as g2 (each triangle found once, O(√m) wedge fan-out —
    * never a per-edge neighborhood intersection, which squares the hub
    * neighborhoods): every triangle supports its three edges, exploded
    * and counted map-side. Jaccard in exact floor-div micros:
    * `support·10⁶ div (deg_a + deg_b − 2 − support)` (the union
    * excludes the endpoints themselves); a degree-1–degree-1 edge has
    * an empty union → null ("undefined" never aliases "0 overlap").
    * Output: `(item_a, item_b, support, deg_a, deg_b, jaccard_e6,
    * local_bridge)` ordered by (jaccard desc NULLS LAST, item_a,
    * item_b).
    */
  def edgeEmbeddedness(edges: DataFrame): DataFrame = {
    val deg = edges.groupBy("src").agg(count(lit(1)).as("deg"))
    val (tris, cache) = trianglesPlan(edges, deg)
    val supp = tris.select(explode(array(
        struct(col("a").as("x"), col("b").as("y")),
        struct(col("a").as("x"), col("c").as("y")),
        struct(col("b").as("x"), col("c").as("y")))).as("e"))
      .select(least(col("e.x"), col("e.y")).as("item_a"),
        greatest(col("e.x"), col("e.y")).as("item_b"))
      .groupBy("item_a", "item_b").agg(count(lit(1)).as("support"))
    val out = edges.where(col("src") < col("dst"))
      .select(col("src").as("item_a"), col("dst").as("item_b"))
      .join(supp, Seq("item_a", "item_b"), "left")
      .withColumn("support", coalesce(col("support"), lit(0L)))
      .join(deg.select(col("src").as("item_a"), col("deg").as("deg_a")), "item_a")
      .join(deg.select(col("src").as("item_b"), col("deg").as("deg_b")), "item_b")
      .withColumn("union_n", col("deg_a") + col("deg_b") - 2 - col("support"))
      .withColumn("jaccard_e6",
        when(col("union_n") > 0, expr("support * 1000000 DIV union_n")))
      .withColumn("local_bridge", col("support") === 0L)
      .select("item_a", "item_b", "support", "deg_a", "deg_b",
        "jaccard_e6", "local_bridge")
      .orderBy(col("jaccard_e6").desc_nulls_last, col("item_a"), col("item_b"))
      .localCheckpoint(true)
    cache.unpersist()
    out
  }

  /** LINK PREDICTION by common-neighbor count: for every NON-adjacent
    * item pair, how many graph neighbors they share — the triadic-closure
    * score behind "users who viewed these also viewed…" candidate
    * generation (j14 scores pairs that DO co-occur; this proposes pairs
    * that don't yet).
    *
    * Wedges are generated per apex over the symmetric adjacency (pair
    * order normalized `item_a < item_b`, so each candidate counted once
    * per shared neighbor), counted in one map-side-combining aggregate,
    * then ANTI-joined against the edge table to keep only pairs not
    * already connected. `maxApexDeg` drops super-hub apexes before the
    * self-join — a degree-d apex emits C(d,2) wedges, and a viral item
    * adjacent to everything carries no closure signal anyway (the
    * coviewEdges bot-cap discipline applied to items); dropped hubs are
    * the documented precision/recall trade every production link
    * predictor makes.
    *
    * At 100 TB: adjacency is partitioned once on the apex, the wedge join
    * is co-partitioned, the wedge count never materializes pairs beyond
    * the capped Σ C(deg,2), and the top-k is a TakeOrdered merge — no
    * global sort. Output: `(rank, item_a, item_b, common)`, top-k by
    * (common desc, item_a, item_b).
    */
  def linkPrediction(edges: DataFrame, k: Int = 20,
                     maxApexDeg: Int = 100): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val apexOk = edges.groupBy("src").agg(count(lit(1)).as("deg"))
      .where(col("deg") <= maxApexDeg).select("src")
    val adj = edges.join(apexOk, Seq("src"), "left_semi")
      .repartition(col("src"))
      .persist()
    val counts = adj.as("e1").join(adj.as("e2"),
        col("e1.src") === col("e2.src") && col("e1.dst") < col("e2.dst"))
      .groupBy(col("e1.dst").as("item_a"), col("e2.dst").as("item_b"))
      .agg(count(lit(1)).as("common"))
    val nonAdjacent = counts.join(
      edges.select(col("src").as("item_a"), col("dst").as("item_b")),
      Seq("item_a", "item_b"), "left_anti")
    val top = nonAdjacent
      .orderBy(col("common").desc, col("item_a"), col("item_b"))
      .limit(k)
    val out = top.withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy(col("common").desc, col("item_a"), col("item_b"))))
      .select(col("rank").cast("long").as("rank"),
        col("item_a"), col("item_b"), col("common"))
      .orderBy("rank")
      .localCheckpoint(true)
    adj.unpersist()
    out
  }

  /** PERSONALIZED PageRank — proximity to a SEED SET instead of global
    * centrality: teleport mass returns to the seeds every step, so rank
    * measures "how reachable from these items", the graph-walk
    * recommender primitive ("because you viewed X and Y") and the seed
    * -expansion step of crawl frontier scoring. Same exact-integer
    * discipline as [[pageRank]]:
    *
    *   r⁰(v) = 10⁶ div |seeds| on seeds, absent elsewhere
    *   r⁺(v) = [v ∈ seeds] · (150000 div |seeds|)
    *           + Σ_{u→v} (r(u)·85) div (100·deg(u))
    *
    * — every quantity a long, every sum order-free, so the oracle's
    * chained-CTE replay matches bit-for-bit. The rank vector stays
    * SPARSE: only nodes already reached carry rows (at scale the
    * frontier is tiny vs the graph for small iteration counts — the
    * whole point of personalization), and the final report left-joins
    * the degree table so unreached nodes surface with rank 0 rather
    * than vanishing.
    *
    * Same Pregel plan shape as [[pageRank]]: edges partitioned ONCE on
    * the message key and persisted, one co-partitioned join + map-side-
    * combining aggregate per superstep, the ≤|reached|-row rank vector
    * the only thing that moves.
    *
    * Contract: the report covers GRAPH NODES (the degree table's rows) —
    * a seed id absent from the graph teleports mass into the walk but has
    * no node row to report; callers seeding from an external id space
    * should intersect with the node set first.
    */
  def personalizedPageRank(edges: DataFrame, seeds: Seq[Int],
                           iters: Int = 5): DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    require(seeds.nonEmpty, "personalizedPageRank needs at least one seed")
    val spark = edges.sparkSession
    val deg = edges.groupBy("src").agg(count(lit(1)).as("deg"))
    val e = edges.join(deg, "src")
      .repartition(col("src"))
      .persist()
    val n = seeds.size.toLong
    val seedDf = spark.createDataFrame(seeds.distinct.map(Tuple1(_)))
      .toDF("item")
    require(seeds.distinct.size.toLong == n, s"seeds must be distinct: $seeds")
    val tele = seedDf.select(col("item"), lit(150000L / n).as("t"))
    var ranks = seedDf.select(col("item"), lit(1000000L / n).as("r"))
    (1 to iters).foreach { _ =>
      val inMass = e.join(ranks.withColumnRenamed("item", "src"), "src")
        .groupBy("dst")
        .agg(sum(expr("(r * 85) DIV (100 * deg)")).as("in_sum"))
        .select(col("dst").as("item"), col("in_sum"))
      ranks = inMass.join(tele, Seq("item"), "full_outer")
        .select(col("item"),
          (coalesce(col("t"), lit(0L)) + coalesce(col("in_sum"), lit(0L))).as("r"))
    }
    val out = deg.select(col("src").as("item"), col("deg"))
      .join(ranks, Seq("item"), "left")
      .select(col("item"), col("deg"), coalesce(col("r"), lit(0L)).as("rank_e6"))
      .orderBy(col("rank_e6").desc, col("item"))
      .localCheckpoint(true)
    e.unpersist()
    out
  }

  /** COMMUNITY DETECTION by deterministic min-label propagation to
    * FIXPOINT — the step [[degreeAssortativity]]'s screen defers to: which
    * groups of items form closed viewing neighborhoods (merchandising
    * clusters, crawl seed groups, the "users who view these view only
    * these" partition). Every node starts labeled with its own id; each
    * superstep every node adopts the MINIMUM of its own and its
    * neighbors' labels; at fixpoint every node carries the minimum id
    * reachable from it, so communities are exactly the connected
    * components of the (support-thresholded) graph — deterministic by
    * construction, no float, no tie-break ambiguity, order-free (min is
    * commutative), so the engine and the oracle's recursive-reachability
    * replay agree bit-for-bit. (Frequency-based LPA tie-breaks are
    * seed-order-dependent and cannot hash-match themselves; min-label is
    * the deterministic member of the family.)
    *
    * Same Pregel plan shape as [[pageRank]]: edges hash-partitioned ONCE
    * on the message key and persisted, each superstep ONE co-partitioned
    * join + map-side-combining min + a count action for the convergence
    * check; the per-node label vector is the only thing that moves, and
    * each superstep's labels are persisted while the previous step's are
    * released. Supersteps needed = graph diameter (small for co-view
    * graphs); `maxIters` guards the pathological-path case and the
    * function REFUSES (require) rather than returning a non-fixpoint.
    *
    * Input `edges` must be symmetric (both directions present, as
    * [[coviewEdgesFromPairs]] and [[coviewEdgesWeightedFromPairs]]
    * emit) — on a directed graph min-label would propagate one way only
    * and the result would depend on orientation. Output: `(item, deg,
    * community, csize)` ordered by item — community = min item id of the
    * component, csize its node count (carried so readers can tell a
    * 2-item pair from a 40-item cluster without a second query).
    */
  def labelCommunities(edges: DataFrame, maxIters: Int = 50): DataFrame = {
    require(maxIters >= 1, s"maxIters must be >= 1, got $maxIters")
    val deg = edges.groupBy("src").agg(count(lit(1)).as("deg"))
    val e = edges.repartition(col("src")).persist()
    // each superstep reads `labels` TWICE (message join + keep-own merge),
    // so a lazy lineage would double per step — 2^diameter plan blowup on
    // a path graph. localCheckpoint(eager) truncates the plan to the
    // materialized n-row label vector every step (which the convergence
    // count forces anyway).
    var labels = deg.select(col("src").as("item"),
      col("src").cast("long").as("lbl")).localCheckpoint(true)
    var changed = 1L
    var it = 0
    while (changed > 0 && it < maxIters) {
      val next = labels.join(
          e.join(labels.withColumnRenamed("item", "src"), "src")
            .groupBy("dst").agg(min("lbl").as("nlbl"))
            .withColumnRenamed("dst", "item"),
          Seq("item"), "left")
        .select(col("item"),
          least(col("lbl"), coalesce(col("nlbl"), col("lbl"))).as("lbl"))
        .localCheckpoint(true)
      changed = next
        .join(labels.select(col("item"), col("lbl").as("old")), "item")
        .where(col("lbl") < col("old")).count()
      labels = next
      it += 1
    }
    require(changed == 0,
      s"labelCommunities did not reach fixpoint in $maxIters supersteps")
    val sizes = labels.groupBy("lbl").agg(count(lit(1)).as("csize"))
    val out = deg.select(col("src").as("item"), col("deg"))
      .join(labels, "item")
      .join(sizes, "lbl") // ≤|nodes| rows, usually ≪ — AQE picks broadcast
      .select(col("item"), col("deg"), col("lbl").as("community"), col("csize"))
      .orderBy("item")
      .localCheckpoint(true)
    e.unpersist()
    out
  }

  /** BFS LAYERS — exact hop distance from a SEED SET: the crawl-depth /
    * catalog-reachability primitive beside [[personalizedPageRank]]'s
    * soft proximity (PPR says "how strongly connected", this says "how
    * many hops", and the two disagree usefully on weak long paths).
    * Classic frontier BFS in DataFrames: the frontier starts at the
    * seeds, each round expands one co-partitioned join over the
    * once-partitioned edge cache, anti-joins the already-labeled set
    * (first discovery IS the minimum distance — the BFS invariant), and
    * labels the new nodes with the round number. Exact integers, no
    * tie-breaking anywhere (set semantics per layer), so the oracle's
    * depth-capped recursive-reachability replay (min d per node)
    * hash-matches.
    *
    * The frontier stays SPARSE (the g5 argument) and every round's
    * label/frontier tables are localCheckpoint(eager) — both are read
    * twice per round (anti-join + union), the g6 2^depth-lineage lesson.
    * `maxDepth` bounds the walk; nodes first reachable beyond it report
    * null dist (mirrored by the oracle's recursion cap), and unreached
    * nodes surface as null rather than vanishing (the g5/c13 rule).
    * Output: `(item, deg, dist)` ordered by (dist nulls last, item) —
    * explicit null placement, the engines' defaults disagree.
    */
  def bfsLayers(edges: DataFrame, seeds: Seq[Int],
                maxDepth: Int = 10): DataFrame = {
    require(seeds.nonEmpty, "bfsLayers needs at least one seed")
    require(maxDepth >= 0, s"maxDepth must be >= 0, got $maxDepth")
    val spark = edges.sparkSession
    val deg = edges.groupBy("src").agg(count(lit(1)).as("deg"))
    val e = edges.repartition(col("src")).persist()
    val seedDf = spark.createDataFrame(seeds.distinct.map(Tuple1(_)))
      .toDF("item")
    var dist = seedDf.select(col("item"), lit(0L).as("dist"))
      .localCheckpoint(true)
    var frontier = dist.select("item").localCheckpoint(true)
    var d = 0L
    var cont = true
    while (cont && d < maxDepth) {
      d += 1
      val next = e.join(frontier.withColumnRenamed("item", "src"), "src")
        .select(col("dst").as("item")).distinct()
        .join(dist, Seq("item"), "left_anti")
        .localCheckpoint(true)
      cont = next.count() > 0
      if (cont) {
        dist = dist.union(next.select(col("item"), lit(d).as("dist")))
          .localCheckpoint(true)
        frontier = next
      }
    }
    val out = deg.select(col("src").as("item"), col("deg"))
      .join(dist, Seq("item"), "left")
      .orderBy(col("dist").asc_nulls_last, col("item"))
      .localCheckpoint(true)
    e.unpersist()
    out
  }

  /** WEIGHTED SHORTEST PATHS (SSSP) — exact min-plus distance from a SEED
    * SET over a non-negative integer-weighted edge table: the "cheapest
    * path" member both [[bfsLayers]] (unweighted hops) and
    * [[pageRankWeighted]] (weighted soft rank) point at. Classic
    * Bellman-Ford as Pregel-shaped supersteps: each round relaxes every
    * edge out of the current distance table in one co-partitioned join
    * over the once-partitioned edge cache, folds candidate distances with
    * a min per target, and merges with the incumbent via FULL OUTER +
    * least. Distances are exact longs (min-plus over exact integer
    * weights — no float anywhere), so the oracle's hop-capped recursive
    * min-cost replay hash-matches.
    *
    * Convergence: with w ≥ 0 (enforced) the fixpoint arrives in at most
    * |V|−1 supersteps; the loop stops at the first no-improvement round
    * and REFUSES a non-fixpoint at `maxIters` (the g6 rule — a truncated
    * distance table silently under-reports nothing visible downstream).
    * Both per-round tables are read twice (merge + improvement count), so
    * each is localCheckpoint(eager) — the g6 2^iters-lineage lesson.
    * Unreached nodes report null dist, never vanish (the g8/c13 rule).
    * At 100 TB the per-round cost is one co-partitioned edge join +
    * |V|-row min — the honest Bellman-Ford bill; the distance table stays
    * node-scale, never path-scale. Output: `(item, deg, dist)` ordered by
    * (dist nulls last, item) — explicit null placement, the engines'
    * defaults disagree.
    */
  def sssp(edges: DataFrame, seeds: Seq[Int], maxIters: Int = 50): DataFrame = {
    require(seeds.nonEmpty, "sssp needs at least one seed")
    require(maxIters >= 1, s"maxIters must be >= 1, got $maxIters")
    val spark = edges.sparkSession
    val deg = edges.groupBy("src").agg(count(lit(1)).as("deg"))
    val e = edges.select(col("src"), col("dst"), col("w").cast("long").as("w"))
      .repartition(col("src")).persist()
    require(e.where(col("w") < 0).isEmpty,
      "sssp requires non-negative edge weights (min-plus has no fixpoint " +
        "guarantee under negative cycles)")
    var dist = spark.createDataFrame(seeds.distinct.map(Tuple1(_)))
      .toDF("item").select(col("item"), lit(0L).as("dist"))
      .localCheckpoint(true)
    var improved = 1L
    var it = 0
    while (improved > 0 && it < maxIters) {
      val cand = e.join(dist.withColumnRenamed("item", "src"), "src")
        .groupBy("dst").agg(min(col("dist") + col("w")).as("nd"))
        .withColumnRenamed("dst", "item")
      val next = dist.join(cand, Seq("item"), "full_outer")
        .select(col("item"),
          least(coalesce(col("dist"), col("nd")),
            coalesce(col("nd"), col("dist"))).as("dist"))
        .localCheckpoint(true)
      improved = next
        .join(dist.select(col("item"), col("dist").as("old")), Seq("item"), "left")
        .where(col("old").isNull || col("dist") < col("old")).count()
      dist = next
      it += 1
    }
    require(improved == 0,
      s"sssp did not reach fixpoint in $maxIters supersteps")
    val out = deg.select(col("src").as("item"), col("deg"))
      .join(dist, Seq("item"), "left")
      .orderBy(col("dist").asc_nulls_last, col("item"))
      .localCheckpoint(true)
    e.unpersist()
    out
  }

  /** HITS hubs/authorities (Kleinberg) over the BIPARTITE user→item view
    * graph — the classic application: a user who views many
    * high-authority items is a good HUB, an item viewed by good hubs is
    * a good AUTHORITY. Deliberately run on the directed bipartite table,
    * not the symmetric co-view projection (on an undirected graph hub ≡
    * authority and HITS collapses to degree — the projection would waste
    * the algorithm). The mutual-reinforcement signal separates items
    * curated by broad explorers from items inflated by single-interest
    * repeat viewers — the axis raw view counts and PageRank-on-co-views
    * both miss.
    *
    * Fixed `iters` power iterations in EXACT INTEGER MICROS (the
    * g7/v23 fixed-iteration discipline): aᵗ(i) = Σ_{u→i} hᵗ⁻¹(u) then
    * max-normalized `(a·10⁶) div max(a)` (products DECIMAL-widened —
    * user-count·10⁶·10⁶ overflows a long at warehouse scale), then the
    * transpose pass for h — every sum order-free, every division a floor
    * of non-negative operands, so the chained-MATERIALIZED-CTE oracle
    * replays bit-for-bit.
    *
    * Plan shape: the distinct view-pair table persists TWICE, once
    * hash-partitioned on each message key (user for the a-pass, item for
    * the h-pass), so every superstep is two co-partitioned joins + two
    * map-side-combining aggregates and two 1-row max broadcasts — the
    * honest HITS bill; nothing driver-side, lineage linear in iters.
    * Output: top-k `(item, views, auth_e6)` by authority desc, item.
    */
  def hits(views: DataFrame, iters: Int = 3, k: Int = 20): DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    require(k >= 1, s"k must be >= 1, got $k")
    val byUser = views.select("user_id", "item").distinct()
      .repartition(col("user_id")).persist()
    val byItem = byUser.repartition(col("item")).persist()
    var h = byUser.select(col("user_id")).distinct()
      .withColumn("h", lit(1000000L))
    var a: DataFrame = null
    (1 to iters).foreach { _ =>
      // each raw/normalized table is read TWICE (its own max + the next
      // join), so every one is eagerly checkpointed — a lazy lineage here
      // recomputes the whole prior superstep per reference and compounds
      // 2^iters (the g6 lesson; measured 16.5 s lazy vs ~3 s checkpointed
      // at sf0.1)
      val ar = byUser.join(h, "user_id").groupBy("item")
        .agg(sum("h").as("ar")).localCheckpoint(true)
      a = ar.crossJoin(broadcast(ar.agg(max("ar").as("amax"))))
        .select(col("item"),
          expr("CAST(CAST(ar AS DECIMAL(38,0)) * 1000000 DIV amax AS BIGINT)").as("a"))
        .localCheckpoint(true)
      val hr = byItem.join(a, "item").groupBy("user_id")
        .agg(sum("a").as("hr")).localCheckpoint(true)
      h = hr.crossJoin(broadcast(hr.agg(max("hr").as("hmax"))))
        .select(col("user_id"),
          expr("CAST(CAST(hr AS DECIMAL(38,0)) * 1000000 DIV hmax AS BIGINT)").as("h"))
        .localCheckpoint(true)
    }
    val out = byItem.groupBy("item").agg(count(lit(1)).as("views"))
      .join(a, "item")
      .select(col("item"), col("views"), col("a").as("auth_e6"))
      .orderBy(col("auth_e6").desc, col("item"))
      .limit(k)
      .localCheckpoint(true)
    byUser.unpersist()
    byItem.unpersist()
    out
  }

  /** K-CORE decomposition (membership at a given k) — the classic
    * cohesion screen the whole graph family funnels into: the k-core is
    * the maximal subgraph where EVERY node keeps degree ≥ k after all
    * peeling cascades (a high raw degree means nothing if the neighbors
    * are leaves — the recursive survival criterion is what separates a
    * dense community engine from a star hub, the g4/g6 gap). Computed by
    * the standard iterative peel: drop every node whose degree WITHIN the
    * surviving set is < k, recompute, repeat to fixpoint — monotone
    * (the alive set only shrinks), so the fixpoint is order-free
    * deterministic and unique (it IS the k-core by maximality).
    *
    * Pregel-shaped per round: two LEFT SEMI probes of the once-
    * partitioned persisted edge cache against the alive set (both
    * endpoints alive), one map-side-combining degree aggregate, the
    * threshold filter — the alive table is node-scale, read twice per
    * round (next join + convergence count), hence localCheckpoint(eager)
    * per round (the g6 lineage lesson). REFUSES a non-fixpoint at
    * `maxIters` (the g6 rule); convergence needs ≤ peel-depth rounds —
    * bounded by the degeneracy ordering, tiny on real graphs. Extra
    * rounds past the fixpoint are no-ops, which is what lets the oracle
    * replay a FIXED unroll safely. Output: `(item, core_deg)` — members
    * with their within-core degree, ordered by (core_deg desc, item).
    *
    * PRECONDITION (the same both-directions contract as the other
    * undirected graph ops here): `edges` must be SYMMETRIZED — every
    * undirected edge present as (a,b) AND (b,a), the co-view table's
    * shape. Degrees group by `src` and the initial alive set is distinct
    * `src`, so a one-direction edge list under-counts degrees and drops
    * dst-only nodes silently.
    */
  def kCore(edges: DataFrame, k: Int, maxIters: Int = 30): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(maxIters >= 1, s"maxIters must be >= 1, got $maxIters")
    val e = edges.select("src", "dst").repartition(col("src")).persist()
    var alive = e.select(col("src").as("item")).distinct().localCheckpoint(true)
    var dropped = 1L
    var it = 0
    var deg: DataFrame = null
    while (dropped > 0 && it < maxIters) {
      val survived = e
        .join(alive.withColumnRenamed("item", "src"), Seq("src"), "left_semi")
        .join(alive.withColumnRenamed("item", "dst"), Seq("dst"), "left_semi")
      deg = survived.groupBy("src").agg(count(lit(1)).as("core_deg"))
      val next = deg.where(col("core_deg") >= k)
        .select(col("src").as("item")).localCheckpoint(true)
      dropped = alive.count() - next.count()
      alive = next
      it += 1
    }
    require(dropped == 0, s"kCore did not reach fixpoint in $maxIters rounds")
    val out = deg.where(col("core_deg") >= k)
      .select(col("src").as("item"), col("core_deg"))
      .orderBy(col("core_deg").desc, col("item"))
      .localCheckpoint(true)
    e.unpersist()
    out
  }

  /** Degree ASSORTATIVITY — the one-number graph-health diagnostic beside
    * [[triangleStats]]' local view: the Pearson correlation of endpoint
    * degrees over all edges (Newman's r). Positive = hubs link to hubs
    * (social/citation shape), negative = hubs link to leaves (the
    * spam-ring / scraped-catalog signature), ~0 = neutral wiring — the
    * cheap screen run before anyone pays for community detection.
    *
    * The v22 moment discipline: every sum an exact order-free
    * DECIMAL(38,0) aggregate over the degree-annotated edges (degrees are
    * already exact longs — no quantization step needed), ONE final float
    * expression (the fixed-shape Pearson ratio) rounded to 6, so engines
    * can only differ where round-6 absorbs it. A REGULAR graph (all
    * degrees equal) has zero variance and reports null r — "undefined"
    * and "neutral" must not alias.
    *
    * Plan: degree table joined to both endpoints (co-partitioned with the
    * edge layout), one combine-safe scalar aggregate, a 1-row result. At
    * 100 TB this is two broadcast-or-shuffle joins of 16 B rows and one
    * reduction — no window, no sort.
    */
  def degreeAssortativity(edges: DataFrame): DataFrame = {
    val deg = edges.groupBy("src").agg(count(lit(1)).as("deg"))
    val d38 = "decimal(38,0)"
    val e = edges
      .join(deg.select(col("src"), col("deg").as("dx")), "src")
      .join(deg.select(col("src").as("dst"), col("deg").as("dy")), "dst")
    e.agg(count(lit(1)).cast(d38).as("m"),
        sum(col("dx").cast(d38)).as("sx"),
        sum(col("dy").cast(d38)).as("sy"),
        sum(col("dx").cast(d38) * col("dy").cast(d38)).as("sxy"),
        sum(col("dx").cast(d38) * col("dx").cast(d38)).as("sxx"),
        sum(col("dy").cast(d38) * col("dy").cast(d38)).as("syy"))
      .select(col("m").cast("long").as("n_edges"),
        // explicit zero-variance guard: 0/0 would be NaN, and "undefined
        // on a regular graph" must read as null, not a number
        when(col("m") * col("sxx") - col("sx") * col("sx") > 0 &&
            col("m") * col("syy") - col("sy") * col("sy") > 0,
          round(
            (col("m") * col("sxy") - col("sx") * col("sy")).cast("double") /
              (sqrt((col("m") * col("sxx") - col("sx") * col("sx")).cast("double")) *
                sqrt((col("m") * col("syy") - col("sy") * col("sy")).cast("double"))),
            6)).as("r"))
  }

  /** The symmetric co-view edge table behind [[pageRank]] — j14's
    * capped set-semantics chain (distinct (user, item), bot-tail cap,
    * user-keyed self-join) emitting each co-viewed pair once per
    * direction. Distinct pairs, both directions present, so the graph
    * is symmetric and dangling-free by construction.
    */
  def coviewEdges(events: DataFrame, itemExpr: org.apache.spark.sql.Column,
                  eventType: String = "view",
                  maxUserItems: Int = 50): DataFrame =
    coviewEdgesFromPairs(
      events.where(col("event_type") === eventType)
        .select(col("user_id"), itemExpr.cast("int").as("item"))
        .where(col("item").isNotNull)
        .distinct(),
      maxUserItems)

  /** The cap + pair-join stage of [[coviewEdges]] from an ALREADY-distinct
    * `(user_id, item)` table — the entry point the streaming twin (e31)
    * folds its per-batch view-pair log into: distinct (user, item) is a
    * SET union across batches, so the fold is order-free and the shared
    * code makes stream ≡ batch by construction.
    */
  def coviewEdgesFromPairs(ui: DataFrame, maxUserItems: Int = 50): DataFrame = {
    val capped = ui.join(
      ui.groupBy("user_id").agg(count(lit(1)).as("nu"))
        .where(col("nu") <= maxUserItems),
      Seq("user_id"), "left_semi")
    capped.as("a").join(capped.as("b"),
        col("a.user_id") === col("b.user_id") && col("a.item") =!= col("b.item"))
      .select(col("a.item").as("src"), col("b.item").as("dst"))
      .distinct()
  }

  /** The WEIGHTED co-view edge table — same capped chain as
    * [[coviewEdgesFromPairs]] but keeping per-pair SUPPORT (how many
    * users co-viewed the pair) instead of collapsing to distinct, so
    * callers can threshold: a single shared viewer makes an edge in the
    * distinct graph, which is why it collapses into one giant component
    * on any real corpus — community structure only appears once weak
    * edges are dropped (`where support >= k`). Symmetric by construction
    * (both directions carry the same count). Output: `(src, dst,
    * support)`.
    */
  def coviewEdgesWeightedFromPairs(ui: DataFrame,
                                   maxUserItems: Int = 50): DataFrame = {
    val capped = ui.join(
      ui.groupBy("user_id").agg(count(lit(1)).as("nu"))
        .where(col("nu") <= maxUserItems),
      Seq("user_id"), "left_semi")
    capped.as("a").join(capped.as("b"),
        col("a.user_id") === col("b.user_id") && col("a.item") =!= col("b.item"))
      .groupBy(col("a.item").as("src"), col("b.item").as("dst"))
      .agg(count(lit(1)).as("support"))
  }
}
