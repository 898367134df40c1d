package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite

/** Triangle census against hand-countable graphs (the degree-ordered
  * orientation must not change the count) and the column profiler
  * against a frame with known nulls/cardinalities.
  */
class GraphProfileSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private def census(edges: Seq[(Long, Long)]): Row =
    Graph.triangleCensus(edges.toDF("a", "b")).head()

  test("triangle census: K4 has 4 triangles, C(4,2)=6 edges, 12 wedges") {
    val k4 = for { a <- 1L to 4L; b <- (a + 1) to 4L } yield (a, b)
    val r  = census(k4)
    assert(r.getAs[Long]("nodes") === 4L)
    assert(r.getAs[Long]("edges") === 6L)
    assert(r.getAs[Long]("wedges") === 12L) // 4 nodes × C(3,2)
    assert(r.getAs[Long]("triangles") === 4L)
    assert(r.getAs[Long]("closure_ppm") === 1000000L) // complete graph closes every wedge
  }

  test("triangle census: star graph has wedges but zero triangles") {
    val star = (2L to 6L).map(i => (1L, i))
    val r    = census(star)
    assert(r.getAs[Long]("nodes") === 6L)
    assert(r.getAs[Long]("wedges") === 10L) // C(5,2) through the hub
    assert(r.getAs[Long]("triangles") === 0L)
    assert(r.getAs[Long]("closure_ppm") === 0L)
  }

  test("triangle census: hub-heavy graph counts each triangle exactly once") {
    // Hub 1 connects to 2..7; extra edges (2,3) and (4,5) close exactly
    // two triangles. Skewed degrees exercise the orientation path where
    // the hub is the wedge TARGET, never the source.
    val edges = (2L to 7L).map(i => (1L, i)) ++ Seq((2L, 3L), (4L, 5L))
    val r     = census(edges)
    assert(r.getAs[Long]("triangles") === 2L)
  }

  test("triangle census: empty edge list yields an all-zero row, no division error") {
    val r = Graph.triangleCensus(Seq.empty[(Long, Long)].toDF("a", "b")).head()
    assert(r.getAs[Long]("nodes") === 0L)
    assert(r.getAs[Long]("triangles") === 0L)
    assert(r.getAs[Long]("closure_ppm") === 0L)
  }

  test("triangle census equals the naive a<b<c count on an irregular pseudo-random graph") {
    // 60-node graph, edge (a,b) present iff md5("a:b") starts below a
    // threshold — deterministic, degree-irregular, adversarial to the
    // orientation logic in a way hand graphs are not.
    import java.security.MessageDigest
    val md = MessageDigest.getInstance("MD5")
    val edges = for {
      a <- 1L to 60L; b <- (a + 1) to 60L
      h = md.digest(s"$a:$b".getBytes("UTF-8"))
      if (h(0) & 0xff) < 64 // ~25% density
    } yield (a, b)
    val e = edges.toDF("a", "b")
    val naive = e.as("e1")
      .join(e.as("e2"), $"e1.a" === $"e2.a" && $"e2.b" > $"e1.b")
      .join(e.as("e3"), $"e3.a" === $"e1.b" && $"e3.b" === $"e2.b")
      .count()
    val r = Graph.triangleCensus(e).head()
    assert(r.getAs[Long]("triangles") === naive)
    assert(r.getAs[Long]("edges") === edges.size.toLong)
  }

  private def kcoreMap(edges: Seq[(Long, Long)], k: Int, rounds: Int = 8): Map[Long, Long] =
    Graph.kcore(edges.toDF("a", "b"), k, rounds)
      .collect().map(r => r.getAs[Long]("n") -> r.getAs[Long]("deg")).toMap

  test("localClustering: K4 all-1, star center 0, triangle-with-tail hand values") {
    def coeffs(edges: Seq[(Long, Long)]) =
      Graph.localClustering(edges.toDF("a", "b")).collect()
        .map(r => r.getAs[Long]("n") ->
          (r.getAs[Long]("degree"), r.getAs[Long]("triangles"), r.getAs[Long]("coeff_ppm")))
        .toMap
    val k4 = coeffs(for { a <- 1L to 4L; b <- (a + 1) to 4L } yield (a, b))
    assert(k4.values.forall { case (d, t, c) => d == 3L && t == 3L && c == 1000000L })
    val star = coeffs(Seq((1L, 2L), (1L, 3L), (1L, 4L), (1L, 5L)))
    assert(star(1L) === ((4L, 0L, 0L)))
    assert(star(2L) === ((1L, 0L, 0L))) // degree < 2: no wedges, coeff 0
    // triangle {1,2,3} with tail 3-4: node 3 has deg 3 => 2·1·10⁶/(3·2)
    val tail = coeffs(Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 4L)))
    assert(tail(1L) === ((2L, 1L, 1000000L)))
    assert(tail(3L) === ((3L, 1L, 333333L)))
    assert(tail(4L) === ((1L, 0L, 0L)))
  }

  test("kcore: K4 with a pendant tail — the 3-core is exactly the clique") {
    val k4   = for { a <- 1L to 4L; b <- (a + 1) to 4L } yield (a, b)
    val tail = Seq((4L, 5L), (5L, 6L)) // pendant path hanging off the clique
    val core = kcoreMap(k4 ++ tail, k = 3)
    // round 1 peels node 6 (deg 1) and 5 (deg 2); node 4 drops from
    // deg 4 back to 3 — still in. The clique survives intact.
    assert(core === Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
  }

  test("kcore: a path cascades to empty — peeling must actually iterate") {
    // path a-b-c-d: degrees 1,2,2,1. Round 1 removes the ends, which
    // drops b,c to degree 1; only round 2 can remove them. A
    // single-pass 'filter by initial degree' would wrongly keep {b,c}.
    val path = Seq((1L, 2L), (2L, 3L), (3L, 4L))
    assert(kcoreMap(path, k = 2).isEmpty)
    // with k=1 nothing peels: the fixpoint early-exit must still
    // terminate well before the round cap and return everyone
    assert(kcoreMap(path, k = 1) === Map(1L -> 1L, 2L -> 2L, 3L -> 2L, 4L -> 1L))
  }

  test("kcore: round cap binds — a capped run equals the same number of unrolled rounds") {
    // long path: full peeling needs length/2 rounds; cap at 1 round and
    // compare against a hand-computed single peel (ends removed only)
    val path = (1L to 8L).sliding(2).map(s => (s(0), s(1))).toSeq
    val one  = kcoreMap(path, k = 2, rounds = 1)
    assert(one === Map(2L -> 1L, 3L -> 2L, 4L -> 2L, 5L -> 2L, 6L -> 2L, 7L -> 1L))
  }

  private def lpaMap(und: Seq[(String, String)], rounds: Int): Map[String, String] = {
    val sym = und.flatMap { case (a, b) => Seq((a, b), (b, a)) }
    Graph.labelPropagation(sym.toDF("src", "dst"), rounds)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
  }

  test("labelPropagation: two cliques joined by a bridge resolve to two communities") {
    def clique(ns: Seq[String]) = for { a <- ns; b <- ns if a < b } yield (a, b)
    val g = clique(Seq("a1", "a2", "a3", "a4")) ++ clique(Seq("b1", "b2", "b3", "b4")) ++
      Seq(("a4", "b1")) // one bridge edge
    val labels = lpaMap(g, rounds = 3)
    assert(Seq("a1", "a2", "a3", "a4").map(labels).distinct === Seq("a1"),
      s"clique A must converge to its min label: $labels")
    assert(Seq("b2", "b3", "b4").map(labels).distinct === Seq("b1"),
      s"clique B must converge to its min label: $labels")
  }

  test("labelPropagation: self-vote keeps a bipartite pair stable (no oscillation)") {
    // plain synchronous LPA on a single edge swaps labels forever; the
    // self-vote + min tie-break settles on the smaller endpoint label
    // and must be at a FIXPOINT: rounds 2 and 3 agree with round 1 once
    // converged (round parity must not matter)
    val l2 = lpaMap(Seq(("x", "y")), rounds = 2)
    val l3 = lpaMap(Seq(("x", "y")), rounds = 3)
    assert(l2 === Map("x" -> "x", "y" -> "x") && l3 === l2,
      s"bipartite oscillation: rounds 2/3 gave $l2 / $l3")
  }

  test("labelPropagation: duplicate edges are deduplicated — multigraph input equals simple graph") {
    // without the dedup, rounds 2+ weight votes by edge multiplicity
    // while round 1's min shortcut ignores it — inconsistent semantics.
    // Triplicating one edge of the bridge graph must change NOTHING.
    def clique(ns: Seq[String]) = for { a <- ns; b <- ns if a < b } yield (a, b)
    val g = clique(Seq("a1", "a2", "a3")) ++ clique(Seq("b1", "b2", "b3")) ++
      Seq(("a3", "b1"))
    val multi = g ++ Seq(("a3", "b1"), ("a3", "b1")) // triplicate the bridge
    for (r <- 1 to 3)
      assert(lpaMap(multi, r) === lpaMap(g, r), s"round $r diverged on the multigraph")
  }

  test("labelPropagation: edgesDistinct=true matches the default on distinct input") {
    val sym = Seq(("p", "q"), ("q", "p"), ("q", "r"), ("r", "q"))
    val dflt = Graph.labelPropagation(sym.toDF("src", "dst"), rounds = 2)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    val fast = Graph.labelPropagation(sym.toDF("src", "dst"), rounds = 2, edgesDistinct = true)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(dflt === fast)
  }

  test("profiler: nulls, exact cardinality, numeric vs string ranges") {
    val df = Seq(
      (Some(3L), Some("b")),
      (Some(1L), None),
      (None, Some("a")),
      (Some(3L), Some("c")),
    ).toDF("num", "str")
    val out  = Profile.profile(df, Seq(("num", true), ("str", false)))
    val rows = out.collect().map(r => r.getAs[String]("column") -> r).toMap
    val num  = rows("num")
    assert(num.getAs[Long]("n") === 4L)
    assert(num.getAs[Long]("nulls") === 1L)
    assert(num.getAs[Long]("n_distinct") === 2L)
    assert(num.getAs[Long]("min_n") === 1L)
    assert(num.getAs[Long]("max_n") === 3L)
    assert(num.isNullAt(num.fieldIndex("min_s")))
    val str = rows("str")
    assert(str.getAs[Long]("nulls") === 1L)
    assert(str.getAs[Long]("n_distinct") === 3L)
    assert(str.getAs[String]("min_s") === "a")
    assert(str.getAs[String]("max_s") === "c")
    assert(str.isNullAt(str.fieldIndex("min_n")))
  }

  test("approx profiler matches exact on small cardinalities (HLL exact regime)") {
    val df = (1L to 500L).map(i => (i % 37, s"v${i % 11}")).toDF("num", "str")
    val cols   = Seq(("num", true), ("str", false))
    val exact  = Profile.profile(df, cols).collect().map(r => r.getString(0) -> r).toMap
    val approx = Profile.profileApprox(df, cols).collect().map(r => r.getString(0) -> r).toMap
    for (c <- Seq("num", "str")) {
      val e = exact(c).getAs[Long]("n_distinct")
      val a = approx(c).getAs[Long]("n_distinct")
      assert(math.abs(a - e) <= math.max(1L, (3 * 0.05 * e).toLong), s"$c: approx $a vs exact $e")
      assert(approx(c).getAs[Long]("n") === exact(c).getAs[Long]("n"))
    }
  }

  private def bfsMap(
      edges: Seq[(Long, Long)],
      sources: Seq[Long],
      maxHops: Int,
  ): Map[Long, Long] =
    Graph.bfsHops(edges.toDF("a", "b"), sources.toDF("node"), maxHops)
      .collect().map(r => r.getAs[Long]("node") -> r.getAs[Long]("dist")).toMap

  test("bfs: path graph distances from one end") {
    val path = (1L to 5L).map(i => (i, i + 1)) // 1-2-3-4-5-6
    assert(bfsMap(path, Seq(1L), 3) === Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 4L -> 3L))
    assert(bfsMap(path, Seq(1L), 10) ===
      Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 4L -> 3L, 5L -> 4L, 6L -> 5L))
  }

  test("bfs: multi-source takes the minimum over seeds") {
    val path = (1L to 5L).map(i => (i, i + 1))
    // Seeds at both ends: node 3 is 2 hops from 1 and 3 hops from 6.
    assert(bfsMap(path, Seq(1L, 6L), 2) ===
      Map(1L -> 0L, 6L -> 0L, 2L -> 1L, 5L -> 1L, 3L -> 2L, 4L -> 2L))
  }

  test("bfs: disconnected component is never reached; saturation exits early") {
    val edges = Seq((1L, 2L), (2L, 3L), (10L, 11L))
    val m     = bfsMap(edges, Seq(1L), 100) // hop bound far past saturation
    assert(m === Map(1L -> 0L, 2L -> 1L, 3L -> 2L))
  }

  test("bfs: cycle rediscovery keeps the first (minimal) distance") {
    // Triangle 1-2-3 plus a tail; node 3 is reachable at hop 1 (direct)
    // and hop 2 (via 2) — must report 1.
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L))
    assert(bfsMap(edges, Seq(1L), 3) === Map(1L -> 0L, 2L -> 1L, 3L -> 1L, 4L -> 2L))
  }

  test("bfs: maxHops 0 returns the seed set only") {
    val edges = Seq((1L, 2L))
    assert(bfsMap(edges, Seq(1L, 7L), 0) === Map(1L -> 0L, 7L -> 0L))
  }

  private def ssspMap(
      edges: Seq[(Long, Long, Long)],
      sources: Seq[Long],
      rounds: Int,
  ): Map[Long, Long] = {
    val sym = edges.flatMap { case (a, b, w) => Seq((a, b, w), (b, a, w)) }
    Graph.ssspBounded(sym.toDF("src", "dst", "w"), sources.toDF("node"), rounds)
      .collect().map(r => r.getAs[Long]("node") -> r.getAs[Long]("dist")).toMap
  }

  test("sssp: cheap two-edge path beats the expensive direct edge once rounds allow it") {
    // 1-3 direct costs 10; 1-2-3 costs 2+3=5. Round 1 must report 10,
    // round 2 must improve to 5 (the Bellman-Ford relaxation order).
    val edges = Seq((1L, 3L, 10L), (1L, 2L, 2L), (2L, 3L, 3L))
    assert(ssspMap(edges, Seq(1L), 1) === Map(1L -> 0L, 2L -> 2L, 3L -> 10L))
    assert(ssspMap(edges, Seq(1L), 2) === Map(1L -> 0L, 2L -> 2L, 3L -> 5L))
  }

  test("sssp: multi-source min; hop budget excludes farther nodes") {
    val path = Seq((1L, 2L, 1L), (2L, 3L, 1L), (3L, 4L, 1L), (4L, 5L, 1L))
    val m    = ssspMap(path, Seq(1L, 5L), 1)
    assert(m === Map(1L -> 0L, 5L -> 0L, 2L -> 1L, 4L -> 1L)) // 3 needs 2 edges
    assert(ssspMap(path, Seq(1L, 5L), 2)(3L) === 2L)
  }

  test("fkAudit: clean edge all-zero; orphans and null keys counted exactly") {
    val parent = Seq(1L, 2L).toDF("pk")
    val clean  = Seq(Some(1L), Some(2L), Some(1L)).toDF("fk")
    val dirty  = Seq(Some(1L), Some(9L), Some(9L), Some(8L), None).toDF("fk")
    val rows = Profile.fkAudit(Seq(
      ("clean", clean, "fk", parent, "pk"),
      ("dirty", dirty, "fk", parent, "pk"),
    )).collect().map(r => r.getAs[String]("fk") ->
      ((r.getAs[Long]("child_rows"), r.getAs[Long]("null_keys"),
        r.getAs[Long]("orphan_rows"), r.getAs[Long]("orphan_keys")))).toMap
    assert(rows("clean") === ((3L, 0L, 0L, 0L)))
    assert(rows("dirty") === ((5L, 1L, 3L, 2L))) // 9,9,8 orphan rows; {9,8} orphan keys
  }

  test("linkPrediction: path predicts the closing pair, square both diagonals, exact ppm") {
    // Path 1-2-3: the only distance-2 pair is (1,3), cn=1, deg 1+1,
    // jaccard = 1/(1+1-1) = 1.0. Square 5-6-7-8-5: diagonals (5,7) and
    // (6,8), each cn=2, deg 2+2, jaccard = 2/(2+2-2) = 1.0.
    val edges = Seq((1L, 2L), (2L, 3L), (5L, 6L), (6L, 7L), (7L, 8L), (5L, 8L))
    val got = Graph
      .linkPrediction(edges.toDF("a", "b"), k = 10)
      .collect()
      .map(r =>
        (r.getAs[Long]("a"), r.getAs[Long]("b"), r.getAs[Long]("cn"),
          r.getAs[Long]("jaccard_ppm")))
      .toSet
    assert(
      got === Set((1L, 3L, 1L, 1000000L), (5L, 7L, 2L, 1000000L), (6L, 8L, 2L, 1000000L)))
  }

  test("linkPrediction: existing edges are excluded; k cut is deterministic") {
    // Triangle 1-2-3 plus pendant 4 on 1: (2,3) IS an edge (excluded
    // even though cn=1 via node 1); candidates are (2,4) and (3,4)
    // (cn=1 through the hub 1) and nothing else. deg: 1→3, 2→2, 3→2,
    // 4→1. jaccard(2,4) = 1/(2+1-1) = 500000.
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L), (1L, 4L))
    val all = Graph.linkPrediction(edges.toDF("a", "b"), k = 10).collect()
    assert(!all.exists(r => r.getAs[Long]("a") === 2L && r.getAs[Long]("b") === 3L))
    assert(all.map(r => (r.getAs[Long]("a"), r.getAs[Long]("b"))).toSet ===
      Set((2L, 4L), (3L, 4L)))
    assert(all.forall(_.getAs[Long]("jaccard_ppm") === 500000L))
    // k=1 keeps the (jaccard DESC, cn DESC, a, b) leader: (2,4)
    val top = Graph.linkPrediction(edges.toDF("a", "b"), k = 1).collect()
    assert(top.length === 1)
    assert((top.head.getAs[Long]("a"), top.head.getAs[Long]("b")) === ((2L, 4L)))
    assert(top.head.getAs[Int]("rnk") === 1)
  }

  test("markovSteadyState: absorbing state collects all mass; cycle is a fixpoint; weights floor per edge") {
    def pi(edges: Seq[(String, String, Long)], rounds: Int): Map[String, Long] =
      Graph
        .markovSteadyState(edges.toDF("src", "dst", "n"), "src", "dst", "n", rounds)
        .collect()
        .map(r => r.getAs[String]("state") -> r.getAs[Long]("pi_ppm"))
        .toMap

    // A -> B, B absorbing: all mass drains into B after one round and stays
    val chain = pi(Seq(("A", "B", 1L)), rounds = 3)
    assert(chain === Map("A" -> 0L, "B" -> 1000000L))

    // 2-cycle: uniform is the exact fixpoint (no flooring loss)
    val cyc = pi(Seq(("A", "B", 1L), ("B", "A", 1L)), rounds = 3)
    assert(cyc === Map("A" -> 500000L, "B" -> 500000L))

    // weighted fanout, 1 round: A splits 2:1 between absorbing B and C,
    // each edge floors independently: (333333*2) div 3 = 222222,
    // (333333*1) div 3 = 111111
    val fan = pi(Seq(("A", "B", 2L), ("A", "C", 1L)), rounds = 1)
    assert(fan === Map("A" -> 0L, "B" -> 555555L, "C" -> 444444L))
  }

  test("hits: directed star — center is the only hub, leaves the only authorities") {
    val edges = (2L to 5L).map(l => (1L, l)).toDF("src", "dst")
    val got = Graph
      .hits(edges, rounds = 2)
      .collect()
      .map(r => r.getAs[Long]("id") -> ((r.getAs[Long]("hub_ppm"), r.getAs[Long]("auth_ppm"))))
      .toMap
    assert(got(1L) === ((1000000L, 0L)))
    (2L to 5L).foreach(l => assert(got(l) === ((0L, 1000000L))))
  }

  test("hits: bipartite hand values — L∞-normalized integer series, flooring exact") {
    // u1 -> {v1, v2}, u2 -> {v1}; node ids 1,2 hubs / 11,12 authorities
    val edges = Seq((1L, 11L), (1L, 12L), (2L, 11L)).toDF("src", "dst")
    val got = Graph
      .hits(edges, rounds = 2)
      .collect()
      .map(r => r.getAs[Long]("id") -> ((r.getAs[Long]("hub_ppm"), r.getAs[Long]("auth_ppm"))))
      .toMap
    // r1: h = (1e6, 5e5); a = (1e6, 666666)
    // r2: hraw = (1666666, 1e6) -> h = (1e6, 1e12 div 1666666 = 600000)
    //     araw = (1600000, 1e6) -> a = (1e6, 625000)
    assert(got(1L) === ((1000000L, 0L)))
    assert(got(2L) === ((600000L, 0L)))
    assert(got(11L) === ((0L, 1000000L)))
    assert(got(12L) === ((0L, 625000L)))
  }
}
