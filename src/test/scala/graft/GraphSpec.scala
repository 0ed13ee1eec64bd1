package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.operators.Graph

class GraphSpec extends AnyFunSuite with Matchers with SparkSupport {
  import spark.implicits._

  private def rankOf(edges: Seq[(Int, Int)], iters: Int = 5) =
    Graph.pageRank(edges.toDF("src", "dst"), iters)
      .as[(Int, Long, Long)].collect().toSeq

  test("pageRank: star hub out-ranks leaves; regular cycle is uniform") {
    // undirected star 0—{1,2,3,4}: hub receives 4 full-rank contributions,
    // each leaf only the hub's quarter — centrality must order hub first
    val star = (1 to 4).flatMap(i => Seq((0, i), (i, 0)))
    val r = rankOf(star)
    r.head._1 shouldBe 0
    r.head._3 should be > r(1)._3
    r.tail.map(_._3).distinct.size shouldBe 1 // leaves symmetric → equal
    // 4-cycle (symmetric): every node degree 2, perfectly regular — all
    // ranks identical and the value is the closed form of the recurrence
    val cyc = (0 to 3).flatMap(i => Seq((i, (i + 1) % 4), ((i + 1) % 4, i)))
    val rc = rankOf(cyc)
    rc.map(_._3).distinct.size shouldBe 1
    // closed form in exact integers: r0 = 250000; step: 37500 + 2*(r*85)//200
    val expect = (1 to 5).foldLeft(250000L)((r, _) => 37500L + 2 * ((r * 85) / 200))
    rc.head._3 shouldBe expect
  }

  test("property: pageRank equals a driver-side integer reference on seeded random graphs") {
    val rnd = new scala.util.Random(23)
    // random directed graph made symmetric, the coviewEdges shape
    val raw = (0 until 120).map(_ => (rnd.nextInt(15), rnd.nextInt(15)))
      .filter { case (a, b) => a != b }
    val edges = raw.flatMap { case (a, b) => Seq((a, b), (b, a)) }.distinct
    val got = rankOf(edges)
    // reference: plain Scala maps, the same floor recurrence
    val out = edges.groupBy(_._1).map { case (s, es) => s -> es.map(_._2) }
    val n = out.size
    var r: Map[Int, Long] = out.keys.map(_ -> 1000000L / n).toMap
    (1 to 5).foreach { _ =>
      val in = out.toSeq.flatMap { case (u, vs) =>
        val c = (r(u) * 85) / (100 * vs.size)
        vs.map(_ -> c)
      }.groupBy(_._1).map { case (v, cs) => v -> cs.map(_._2).sum }
      r = r.keys.map(v => v -> (150000L / n + in.getOrElse(v, 0L))).toMap
    }
    val expect = r.toSeq.map { case (v, rk) => (v, out(v).size.toLong, rk) }
      .sortBy { case (v, _, rk) => (-rk, v) }
    got shouldBe expect
  }

  test("weighted pageRank: heavier edges pull more mass; closed-form star values") {
    // hub 0 → leaves {1, 2} with weights 3 and 1; leaves → hub weight 1.
    // n=3, tele=50000, r0=333333; W(0)=4, W(1)=W(2)=1
    val edges = Seq((0, 1, 3L), (0, 2, 1L), (1, 0, 1L), (2, 0, 1L))
      .toDF("src", "dst", "w")
    val got = Graph.pageRankWeighted(edges)
      .as[(Int, Long, Long, Long)].collect().toSeq
    // driver replay of the same integer recurrence
    var r = Map(0 -> 333333L, 1 -> 333333L, 2 -> 333333L)
    (1 to 5).foreach { _ =>
      r = Map(
        0 -> (50000L + (r(1) * 85 * 1) / (100 * 1) + (r(2) * 85 * 1) / (100 * 1)),
        1 -> (50000L + (r(0) * 85 * 3) / (100 * 4)),
        2 -> (50000L + (r(0) * 85 * 1) / (100 * 4)))
    }
    val expect = Seq((0, 2L, 4L, r(0)), (1, 1L, 1L, r(1)), (2, 1L, 1L, r(2)))
      .sortBy { case (v, _, _, rk) => (-rk, v) }
    got shouldBe expect
    // the weighting is visible: leaf 1 (weight-3 edge) out-ranks leaf 2
    r(1) should be > r(2)
  }

  test("property: weighted pageRank equals a driver-side integer reference on seeded random graphs") {
    val rnd = new scala.util.Random(31)
    val raw = (0 until 120).map(_ => (rnd.nextInt(15), rnd.nextInt(15)))
      .filter { case (a, b) => a != b }
    val und = raw.flatMap { case (a, b) => Seq((a, b), (b, a)) }
    val edges = und.groupBy(identity).map { case ((a, b), xs) =>
      (a, b, xs.size.toLong) }.toSeq // multiplicity as support weight
    val got = Graph.pageRankWeighted(edges.toDF("src", "dst", "w"))
      .as[(Int, Long, Long, Long)].collect().toSeq
    val out = edges.groupBy(_._1)
      .map { case (s, es) => s -> es.map(e => (e._2, e._3)) }
    val n = out.size
    val wsum = out.map { case (s, es) => s -> es.map(_._2).sum }
    var r: Map[Int, Long] = out.keys.map(_ -> 1000000L / n).toMap
    (1 to 5).foreach { _ =>
      val in = out.toSeq.flatMap { case (u, vs) =>
        vs.map { case (v, w) => v -> (r(u) * 85 * w) / (100 * wsum(u)) }
      }.groupBy(_._1).map { case (v, cs) => v -> cs.map(_._2).sum }
      r = r.keys.map(v => v -> (150000L / n + in.getOrElse(v, 0L))).toMap
    }
    val expect = r.toSeq.map { case (v, rk) =>
      (v, out(v).size.toLong, wsum(v), rk) }
      .sortBy { case (v, _, _, rk) => (-rk, v) }
    got shouldBe expect
  }

  test("triangleStats: triangle-plus-pendant graph — exact counts, cc micros, zero rows kept") {
    // triangle 1-2-3 with pendant 4 hanging off 3 (symmetric edges)
    val und = Seq((1, 2), (1, 3), (2, 3), (3, 4))
    val edges = und.flatMap { case (a, b) => Seq((a, b), (b, a)) }
    val out = Graph.triangleStats(edges.toDF("src", "dst"))
      .as[(Int, Long, Long, Long)].collect().toSeq
    // (item, deg, tri, cc_e6) ordered tri desc, item
    out shouldBe Seq(
      (1, 2L, 1L, 1000000L), // 2·1·10⁶ / (2·1)
      (2, 2L, 1L, 1000000L),
      (3, 3L, 1L, 333333L), // 2·1·10⁶ / (3·2), floored
      (4, 1L, 0L, 0L)) // deg-1 pendant: no triangle, cc 0, row KEPT
  }

  test("property: triangleStats equals a driver-side brute-force enumeration on seeded random graphs") {
    val rnd = new scala.util.Random(31)
    val raw = (0 until 200).map(_ => (rnd.nextInt(18), rnd.nextInt(18)))
      .filter { case (a, b) => a != b }
    val edges = raw.flatMap { case (a, b) => Seq((a, b), (b, a)) }.distinct
    val got = Graph.triangleStats(edges.toDF("src", "dst"))
      .as[(Int, Long, Long, Long)].collect().toSeq
    // reference: adjacency sets, count triangles at each node directly
    val adj = edges.groupBy(_._1).map { case (s, es) => s -> es.map(_._2).toSet }
    val expect = adj.toSeq.map { case (v, nb) =>
      val tri = nb.toSeq.combinations(2)
        .count { case Seq(a, b) => adj(a)(b) }
      val deg = nb.size.toLong
      val cc = if (deg >= 2) tri.toLong * 2000000L / (deg * (deg - 1)) else 0L
      (v, deg, tri.toLong, cc)
    }.sortBy { case (v, _, t, _) => (-t, v) }
    got shouldBe expect
  }

  test("linkPrediction: path closes the end pair; triangle yields none; apex cap silences hubs") {
    // path 1-2-3: only non-adjacent pair is (1,3), one shared neighbor
    val path = Seq((1, 2), (2, 3)).flatMap { case (a, b) => Seq((a, b), (b, a)) }
    Graph.linkPrediction(path.toDF("src", "dst"))
      .as[(Long, Int, Int, Long)].collect().toSeq shouldBe Seq((1L, 1, 3, 1L))
    // triangle: every pair already adjacent — nothing to predict
    val tri = Seq((1, 2), (1, 3), (2, 3)).flatMap { case (a, b) => Seq((a, b), (b, a)) }
    Graph.linkPrediction(tri.toDF("src", "dst")).count() shouldBe 0L
    // star hub 0-{1..5}: all closure evidence flows through the deg-5 hub;
    // capping apexes at 4 must silence it (the bot-cap trade, documented)
    val star = (1 to 5).flatMap(i => Seq((0, i), (i, 0)))
    Graph.linkPrediction(star.toDF("src", "dst"), maxApexDeg = 5)
      .count() shouldBe 10L // C(5,2) leaf pairs, all via the hub
    Graph.linkPrediction(star.toDF("src", "dst"), maxApexDeg = 4)
      .count() shouldBe 0L
  }

  test("personalized PR: mass concentrates near the seed; unreached component reports 0") {
    // path 0-1-2-3 plus a DISCONNECTED pair 8-9: seeding at 0 must rank
    // 0 highest, decay along the path, and leave {8,9} at exactly 0
    val edges = (Seq((0, 1), (1, 2), (2, 3), (8, 9))
      .flatMap { case (a, b) => Seq((a, b), (b, a)) }).toDF("src", "dst")
    val r = Graph.personalizedPageRank(edges, seeds = Seq(0))
      .as[(Int, Long, Long)].collect().map(t => t._1 -> t._3).toMap
    // reachability semantics (distance-monotone claims are false on small
    // bipartite paths — mass oscillates by step parity; exactness is the
    // property test's job): every node in the seed's component carries
    // mass, the seed keeps its teleport floor, and the disconnected
    // component is EXACTLY 0 while still reported as rows
    Seq(0, 1, 2, 3).foreach(v => r(v) should be > 0L)
    r(0) should be >= 150000L
    r(8) shouldBe 0L
    r(9) shouldBe 0L
    // the walk is seed-local: the seed component holds all non-teleport
    // mass, so its total dwarfs the dead component's (which is zero)
    Seq(0, 1, 2, 3).map(r).sum should be > 900000L
  }

  test("property: personalized PR equals a driver-side integer reference on seeded random graphs") {
    val rnd = new scala.util.Random(59)
    val raw = (0 until 120).map(_ => (rnd.nextInt(15), rnd.nextInt(15)))
      .filter { case (a, b) => a != b }
    val edges = raw.flatMap { case (a, b) => Seq((a, b), (b, a)) }.distinct
    val seeds = Seq(0, 1)
    val got = Graph.personalizedPageRank(edges.toDF("src", "dst"), seeds)
      .as[(Int, Long, Long)].collect().toSeq
    val out = edges.groupBy(_._1).map { case (s, es) => s -> es.map(_._2) }
    val ns = seeds.size
    var r: Map[Int, Long] = seeds.map(_ -> 1000000L / ns).toMap
    (1 to 5).foreach { _ =>
      val in = r.toSeq.flatMap { case (u, ru) =>
        val outs = out.getOrElse(u, Seq.empty)
        if (outs.isEmpty) Seq.empty
        else outs.map(_ -> (ru * 85) / (100 * outs.size))
      }.groupBy(_._1).map { case (v, cs) => v -> cs.map(_._2).sum }
      val keys = in.keySet ++ seeds
      r = keys.map(v => v ->
        ((if (seeds.contains(v)) 150000L / ns else 0L) + in.getOrElse(v, 0L))).toMap
    }
    val expect = out.keys.toSeq.map(v =>
        (v, out(v).size.toLong, r.getOrElse(v, 0L)))
      .sortBy { case (v, _, rk) => (-rk, v) }
    got shouldBe expect
  }

  test("assortativity: star is exactly -1, regular cycle is null, random graph matches a driver reference") {
    // star 0—{1..4}: every edge pairs deg 4 with deg 1 — the perfectly
    // DISassortative wiring, closed form r = −1 exactly
    val star = (1 to 4).flatMap(i => Seq((0, i), (i, 0)))
    val rs = Graph.degreeAssortativity(star.toDF("src", "dst")).collect().head
    rs.getLong(0) shouldBe 8L
    rs.getDouble(1) shouldBe -1.0
    // 4-cycle: every degree 2 — zero variance must be NULL, not NaN/0
    val cyc = (0 to 3).flatMap(i => Seq((i, (i + 1) % 4), ((i + 1) % 4, i)))
    Graph.degreeAssortativity(cyc.toDF("src", "dst")).collect()
      .head.isNullAt(1) shouldBe true
    // seeded random symmetric graph vs a driver-side Pearson over degrees
    val rnd = new scala.util.Random(47)
    val edges = (0 until 150).map(_ => (rnd.nextInt(14), rnd.nextInt(14)))
      .filter { case (a, b) => a != b }
      .flatMap { case (a, b) => Seq((a, b), (b, a)) }.distinct
    val got = Graph.degreeAssortativity(edges.toDF("src", "dst")).collect().head
    val deg = edges.groupBy(_._1).map { case (v, es) => v -> es.size.toLong }
    val xs = edges.map { case (a, b) => (deg(a), deg(b)) }
    val m = xs.size.toLong
    val (sx, sy) = (xs.map(_._1).sum, xs.map(_._2).sum)
    val sxy = xs.map { case (x, y) => x * y }.sum
    val (sxx, syy) = (xs.map(p => p._1 * p._1).sum, xs.map(p => p._2 * p._2).sum)
    val expect = BigDecimal((m * sxy - sx * sy).toDouble /
        (math.sqrt((m * sxx - sx * sx).toDouble) * math.sqrt((m * syy - sy * sy).toDouble)))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    got.getLong(0) shouldBe m
    got.getDouble(1) shouldBe expect
  }

  test("coviewEdges: symmetric, distinct, bot-capped, repeat views collapse") {
    import java.sql.Timestamp
    val t0 = Timestamp.valueOf("2024-01-01 10:00:00")
    // user 1 views items 1,2 (2 twice: set semantics); user 2 is a bot
    // over the cap viewing 1..4 — its pairs must not appear
    val rows =
      Seq((1L, 1L, "view", """{"k": 1}""", t0),
        (2L, 1L, "view", """{"k": 2}""", t0),
        (3L, 1L, "view", """{"k": 2}""", t0)) ++
        (4 to 7).map(i => (i.toLong, 2L, "view", s"""{"k": $i}""", t0))
    val df = rows.toDF("event_id", "user_id", "event_type", "props", "ts")
    val e = Graph.coviewEdges(df, regexp_extract(col("props"), "(\\d+)", 1),
        maxUserItems = 3)
      .as[(Int, Int)].collect().toSet
    e shouldBe Set((1, 2), (2, 1))
  }

  test("labelCommunities: two components + isolate-free contract — labels, sizes, degrees exact") {
    // component A: path 1—2—3 (min label 1); component B: pair 7—9 (min 7)
    val und = Seq((1, 2), (2, 3), (7, 9))
    val edges = und.flatMap { case (a, b) => Seq((a, b), (b, a)) }
    val got = Graph.labelCommunities(edges.toDF("src", "dst"))
      .as[(Int, Long, Long, Long)].collect().toSeq
    got shouldBe Seq((1, 1L, 1L, 3L), (2, 2L, 1L, 3L), (3, 1L, 1L, 3L),
      (7, 1L, 7L, 2L), (9, 1L, 7L, 2L))
  }

  test("labelCommunities: long path needs diameter supersteps and still reaches the fixpoint") {
    // path 0—1—…—12: min label 0 must walk the full diameter; a too-small
    // cap must refuse rather than return a non-fixpoint
    val und = (0 until 12).map(i => (i, i + 1))
    val edges = und.flatMap { case (a, b) => Seq((a, b), (b, a)) }.toDF("src", "dst")
    val got = Graph.labelCommunities(edges).as[(Int, Long, Long, Long)].collect()
    got.map(_._3).toSet shouldBe Set(0L)
    got.map(_._4).toSet shouldBe Set(13L)
    an[IllegalArgumentException] should be thrownBy
      Graph.labelCommunities(edges, maxIters = 3)
  }

  test("property: labelCommunities equals a driver-side union-find on seeded random graphs") {
    val rnd = new scala.util.Random(41)
    (0 until 3).foreach { round =>
      // sparse random graph: enough nodes vs edges that several
      // components appear, made symmetric (the operator's contract)
      val n = 40
      val raw = (0 until 25).map(_ => (rnd.nextInt(n), rnd.nextInt(n)))
        .filter { case (a, b) => a != b }.distinct
      val edges = raw.flatMap { case (a, b) => Seq((a, b), (b, a)) }.distinct
      val got = Graph.labelCommunities(edges.toDF("src", "dst"))
        .as[(Int, Long, Long, Long)].collect().toSeq
      // reference: plain union-find over the same edges
      val parent = scala.collection.mutable.Map[Int, Int]()
      def find(x: Int): Int = {
        val p = parent.getOrElseUpdate(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      raw.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val nodes = edges.map(_._1).distinct
      val comm = nodes.map(v => v -> nodes.filter(u => find(u) == find(v)).min).toMap
      val deg = edges.groupBy(_._1).map { case (s, es) => s -> es.size.toLong }
      val size = comm.values.toSeq.groupBy(identity).map { case (c, vs) => c -> vs.size.toLong }
      val expect = nodes.sorted.map(v =>
        (v, deg(v), comm(v).toLong, size(comm(v))))
      withClue(s"round $round: ") { got shouldBe expect }
    }
  }

  test("bfsLayers: hop distances from the seed set, min over seeds, cap nulls, unreached nulls") {
    // path 0—1—2—3—4 plus a disjoint pair 8—9; seeds {0, 4}: middle node
    // 2 is 2 hops from EITHER seed (min over seeds), the pair unreached
    val und = Seq((0, 1), (1, 2), (2, 3), (3, 4), (8, 9))
    val edges = und.flatMap { case (a, b) => Seq((a, b), (b, a)) }.toDF("src", "dst")
    val got = Graph.bfsLayers(edges, seeds = Seq(0, 4))
      .as[(Int, Long, Option[Long])].collect().toSeq
    got shouldBe Seq(
      (0, 1L, Some(0L)), (4, 1L, Some(0L)),
      (1, 2L, Some(1L)), (3, 2L, Some(1L)),
      (2, 2L, Some(2L)),
      (8, 1L, None), (9, 1L, None))
    // a depth cap turns beyond-cap nodes into nulls, not wrong numbers
    val capped = Graph.bfsLayers(edges, seeds = Seq(0), maxDepth = 2)
      .as[(Int, Long, Option[Long])].collect().toSeq
    capped.find(_._1 == 2).get._3 shouldBe Some(2L)
    capped.find(_._1 == 3).get._3 shouldBe None
    capped.find(_._1 == 4).get._3 shouldBe None
  }

  test("sssp: min-plus distances, weighted path beats fewer hops, unreached nulls, refusal") {
    // 0→1→2 costs 1+1=2, direct 0→2 costs 5: the cheap 2-hop path wins
    // (the case hop-count BFS gets wrong); pair 8—9 disjoint → null
    val und = Seq((0, 1, 1L), (1, 2, 1L), (0, 2, 5L), (2, 3, 10L), (8, 9, 1L))
    val edges = und.flatMap { case (a, b, w) => Seq((a, b, w), (b, a, w)) }
      .toDF("src", "dst", "w")
    val got = Graph.sssp(edges, seeds = Seq(0))
      .as[(Int, Long, Option[Long])].collect().toSeq
    got shouldBe Seq(
      (0, 2L, Some(0L)), (1, 2L, Some(1L)), (2, 3L, Some(2L)),
      (3, 1L, Some(12L)),
      (8, 1L, None), (9, 1L, None))
    // refusal: an iteration budget below the fixpoint is an error, not a
    // silently truncated distance table
    val path = (0 until 6).map(i => (i, i + 1, 1L))
      .flatMap { case (a, b, w) => Seq((a, b, w), (b, a, w)) }
      .toDF("src", "dst", "w")
    an[IllegalArgumentException] should be thrownBy
      Graph.sssp(path, seeds = Seq(0), maxIters = 2)
    an[IllegalArgumentException] should be thrownBy
      Graph.sssp(Seq((0, 1, -1L)).toDF("src", "dst", "w"), seeds = Seq(0))
  }

  test("sssp: seeded-random graphs match a driver-side Dijkstra reference") {
    val rnd = new scala.util.Random(42)
    for (round <- 1 to 3) {
      val n = 12 + round * 4
      val raw = (1 to n * 2).map(_ =>
        (rnd.nextInt(n), rnd.nextInt(n), (rnd.nextInt(9) + 1).toLong))
        .filter { case (a, b, _) => a != b }
        .groupBy(t => (t._1, t._2)).map(_._2.head).toSeq // one w per arc
      val edges = raw.flatMap { case (a, b, w) => Seq((a, b, w), (b, a, w)) }
        .groupBy(t => (t._1, t._2)).map { case (_, es) => es.minBy(_._3) }.toSeq
      val seeds = Seq(raw.head._1)
      val got = Graph.sssp(edges.toDF("src", "dst", "w"), seeds)
        .as[(Int, Long, Option[Long])].collect().toSeq
      // reference: plain Dijkstra over the same arcs
      val adj = edges.groupBy(_._1).map { case (s, es) =>
        s -> es.map(e => (e._2, e._3))
      }
      val distRef = scala.collection.mutable.Map[Int, Long](seeds.map(_ -> 0L): _*)
      val pq = scala.collection.mutable.PriorityQueue[(Long, Int)](
        seeds.map(s => (0L, s)): _*)(Ordering.by(-_._1))
      while (pq.nonEmpty) {
        val (dv, v) = pq.dequeue()
        if (dv == distRef(v))
          adj.getOrElse(v, Nil).foreach { case (u, w) =>
            if (distRef.get(u).forall(_ > dv + w)) {
              distRef(u) = dv + w; pq.enqueue((dv + w, u))
            }
          }
      }
      val deg = edges.groupBy(_._1).map { case (s, es) => s -> es.size.toLong }
      val expect = edges.map(_._1).distinct
        .map(v => (v, deg(v), distRef.get(v)))
        .sortBy(t => (t._3.getOrElse(Long.MaxValue), t._1))
      withClue(s"round $round: ") { got shouldBe expect }
    }
  }

  test("hits: hand bipartite graph — broad-explorer items outrank; dup views collapse") {
    // u1→{i1,i2}, u2→{i1}, u3→{i1,i3}; u2's view of i1 duplicated (must
    // collapse). i1 is viewed by every user → max authority 1e6 each
    // round; i2 and i3 ride identical hub sets → tie, id-ordered.
    val views = Seq((1L, 1), (1L, 2), (2L, 1), (2L, 1), (3L, 1), (3L, 3))
      .toDF("user_id", "item")
    val got = Graph.hits(views, iters = 3, k = 10)
      .as[(Int, Long, Long)].collect().toSeq
    got.head shouldBe ((1, 3L, 1000000L))
    got.map(_._1) shouldBe Seq(1, 2, 3)
    got(1)._3 shouldBe got(2)._3 // symmetric items tie exactly
    got(1)._3 should be < 1000000L
  }

  test("hits: seeded-random bipartite graphs match a driver-side integer replay") {
    val rnd = new scala.util.Random(11)
    for (_ <- 1 to 3) {
      val nu = 8 + rnd.nextInt(6); val ni = 6 + rnd.nextInt(5)
      val pairs = (1 to nu * 3).map(_ => (rnd.nextInt(nu).toLong, rnd.nextInt(ni))).distinct
      val got = Graph.hits(pairs.toDF("user_id", "item"), iters = 3, k = 1000)
        .as[(Int, Long, Long)].collect().toSeq
      // reference: the same exact-integer recurrence, driver-side
      var h = pairs.map(_._1).distinct.map(_ -> 1000000L).toMap
      var a = Map.empty[Int, Long]
      for (_ <- 1 to 3) {
        val ar = pairs.groupBy(_._2).map { case (i, ps) => i -> ps.map(p => h(p._1)).sum }
        val amax = ar.values.max
        a = ar.map { case (i, v) => i -> (BigInt(v) * 1000000 / amax).toLong }
        val hr = pairs.groupBy(_._1).map { case (u, ps) => u -> ps.map(p => a(p._2)).sum }
        val hmax = hr.values.max
        h = hr.map { case (u, v) => u -> (BigInt(v) * 1000000 / hmax).toLong }
      }
      val views = pairs.groupBy(_._2).view.mapValues(_.size.toLong).toMap
      val ref = a.toSeq.map { case (i, v) => (i, views(i), v) }
        .sortBy { case (i, _, v) => (-v, i) }
      got shouldBe ref
    }
  }

  test("kCore: pendant cascade peels transitively; empty core is empty, not an error; refusal") {
    // 4-clique {1,2,3,4} + pendant path 4—5—6: at k=2, 6 (deg 1) peels,
    // THEN 5 (now deg 1) peels — the cascade a one-shot degree filter
    // would miss; the clique survives with full within-core degrees
    val und = Seq((1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4), (4, 5), (5, 6))
    val edges = und.flatMap { case (a, b) => Seq((a, b), (b, a)) }.toDF("src", "dst")
    Graph.kCore(edges, k = 2).as[(Int, Long)].collect().toSeq shouldBe
      Seq((1, 3L), (2, 3L), (3, 3L), (4, 3L))
    // k above the densest cohesion → empty membership
    Graph.kCore(edges, k = 4).as[(Int, Long)].collect() shouldBe empty
    // refusal: an iteration budget below the cascade depth errors loudly
    an[IllegalArgumentException] should be thrownBy
      Graph.kCore(edges, k = 2, maxIters = 1)
  }

  test("kCore: seeded-random graphs match a driver-side peeling reference") {
    val rnd = new scala.util.Random(23)
    for (round <- 1 to 3) {
      val n = 14 + round * 4
      val und = (1 to n * 2).map(_ => (rnd.nextInt(n), rnd.nextInt(n)))
        .filter { case (a, b) => a != b }.distinct
      val edges = und.flatMap { case (a, b) => Seq((a, b), (b, a)) }
        .distinct.toDF("src", "dst")
      val k = 2 + rnd.nextInt(3)
      val got = Graph.kCore(edges.toDF("src", "dst"), k)
        .as[(Int, Long)].collect().toSeq
      // reference: plain iterative peel
      val adj = und.flatMap { case (a, b) => Seq(a -> b, b -> a) }
        .groupBy(_._1).map { case (v, es) => v -> es.map(_._2).toSet }
      var alive = adj.keySet
      var done = false
      while (!done) {
        val next = alive.filter(v => adj(v).count(alive) >= k)
        done = next == alive; alive = next
      }
      val ref = alive.toSeq.map(v => (v, adj(v).count(alive).toLong))
        .sortBy { case (v, d) => (-d, v) }
      got shouldBe ref
    }
  }

  test("edgeEmbeddedness: triangle support per edge, Jaccard micros, degree-1 pair null, bridge flag") {
    // square 1-2-3-4 with diagonal 1-3 (triangles 123 and 134) plus the
    // isolated edge 5-6 — a LOCAL BRIDGE with an EMPTY union (both
    // endpoints degree 1): jaccard must be null, never 0
    val und = Seq((1, 2), (2, 3), (3, 4), (4, 1), (1, 3), (5, 6))
    val edges = (und ++ und.map(_.swap)).toDF("src", "dst")
    val got = Graph.edgeEmbeddedness(edges)
      .as[(Int, Int, Long, Long, Long, Option[Long], Boolean)].collect().toSeq
    got shouldBe Seq(
      (1, 3, 2L, 3L, 3L, Some(1000000L), false), // both triangles; union {2,4}
      (1, 2, 1L, 3L, 2L, Some(500000L), false),
      (1, 4, 1L, 3L, 2L, Some(500000L), false),
      (2, 3, 1L, 2L, 3L, Some(500000L), false),
      (3, 4, 1L, 3L, 2L, Some(500000L), false),
      (5, 6, 0L, 1L, 1L, None, true))
  }

  test("coviewEdgesWeighted: support counts shared viewers; threshold drops weak edges") {
    // items 1,2 share two viewers (support 2); 2,3 share one (support 1)
    val ui = Seq((1L, 1), (1L, 2), (2L, 1), (2L, 2), (3L, 2), (3L, 3))
      .toDF("user_id", "item")
    val w = Graph.coviewEdgesWeightedFromPairs(ui)
      .as[(Int, Int, Long)].collect().toSet
    w shouldBe Set((1, 2, 2L), (2, 1, 2L), (2, 3, 1L), (3, 2, 1L))
    val strong = Graph.coviewEdgesWeightedFromPairs(ui)
      .where(col("support") >= 2).select("src", "dst")
      .as[(Int, Int)].collect().toSet
    strong shouldBe Set((1, 2), (2, 1))
  }
}
