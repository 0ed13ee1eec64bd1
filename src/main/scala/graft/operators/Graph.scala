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
    ranks.join(deg.select(col("src").as("item"), col("deg")), "item")
      .select(col("item"), col("deg"), col("r").as("rank_e6"))
      .orderBy(col("rank_e6").desc, col("item"))
  }

  /** The symmetric co-view edge table behind [[pageRank]] — j14's
    * capped set-semantics chain (distinct (user, item), bot-tail cap,
    * user-keyed self-join) emitting each co-viewed pair once per
    * direction. Distinct pairs, both directions present, so the graph
    * is symmetric and dangling-free by construction.
    */
  def coviewEdges(events: DataFrame, itemExpr: org.apache.spark.sql.Column,
                  eventType: String = "view",
                  maxUserItems: Int = 50): DataFrame = {
    val ui = events.where(col("event_type") === eventType)
      .select(col("user_id"), itemExpr.cast("int").as("item"))
      .where(col("item").isNotNull)
      .distinct()
    val capped = ui.join(
      ui.groupBy("user_id").agg(count(lit(1)).as("nu"))
        .where(col("nu") <= maxUserItems),
      Seq("user_id"), "left_semi")
    capped.as("a").join(capped.as("b"),
        col("a.user_id") === col("b.user_id") && col("a.item") =!= col("b.item"))
      .select(col("a.item").as("src"), col("b.item").as("dst"))
      .distinct()
  }
}
