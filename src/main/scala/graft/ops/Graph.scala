package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Triangle counting over an undirected edge list — the third member
  * of the graph family (connected components in [[Dedup]], power
  * iteration in [[PageRank]]), and the canonical "joins explode if you
  * are naive" graph workload.
  *
  * The implementation is degree-ordered wedge closing (Schank 2007's
  * compact-forward; the same orientation trick every distributed
  * triangle counter uses): orient each undirected edge from its
  * lower-(degree, id) endpoint to its higher one, build wedges by
  * self-joining the oriented list on the common SOURCE, and close each
  * wedge with a semi-probe back into the oriented list. Orientation
  * makes every node's out-degree O(√|E|) regardless of how skewed the
  * raw degree distribution is — a hub of degree d contributes C(d,2)
  * wedges if edges point out of it, but after orientation the hub is
  * almost always the wedge TARGET, so the self-join fanout is bounded
  * by the arboricity, not the max degree. Each triangle {a,b,c} is
  * produced exactly once (from its lowest-ordered corner), so no /3 or
  * /6 correction is needed.
  *
  * Scale shape: two equi-joins (wedge build on `src`, closure probe on
  * the canonical (lo, hi) pair) plus one degree aggregation — all
  * shuffle on keys, never on payloads. The count is invariant to the
  * ordering used, so the SQL oracle replays it with the simpler
  * id-ordered a<b<c form and must produce the same number.
  */
object Graph {

  /** Global triangle census of an undirected graph.
    *
    * @param edges one row per undirected edge, columns `a`, `b`,
    *              already deduplicated with a < b (canonical form).
    * @return a single row: `nodes`, `edges`, `wedges` (open paths of
    *         length 2, Σ C(deg,2)), `triangles`, and `closure_ppm`
    *         (the global clustering coefficient 3·triangles/wedges in
    *         integer parts-per-million — `div`, not float, so the row
    *         is bit-identical across engines and partitionings).
    */
  def triangleCensus(edges: DataFrame): DataFrame = {
    val spark = edges.sparkSession
    val e = edges
      .select(col("a").cast("long").as("a"), col("b").cast("long").as("b"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val row =
      try censusPlan(e).head()
      finally e.unpersist()
    import spark.implicits._
    Seq(
      (
        row.getAs[Long]("nodes"),
        row.getAs[Long]("edges"),
        row.getAs[Long]("wedges"),
        row.getAs[Long]("triangles"),
        row.getAs[Long]("closure_ppm"),
      )
    ).toDF("nodes", "edges", "wedges", "triangles", "closure_ppm")
  }

  /** k-core decomposition by iterative peeling — the fourth graph-family
    * member (components, PageRank, triangles): repeatedly delete every
    * node of degree < k until none remains; what survives is the
    * maximal subgraph with minimum degree ≥ k, the standard "dense
    * cohesive core" extraction (Seidman 1983) used for spam/bot cluster
    * isolation and influence seeding.
    *
    * Each round is exactly the connected-components/PageRank shape: one
    * degree aggregation (union of both endpoint projections) plus two
    * semi-joins filtering the edge list — shuffles carry node keys
    * only. Rounds are lineage-cut with `localCheckpoint` (the
    * [[PageRank]] cadence), whose eager materialization also yields the
    * per-round edge count for FREE — and since peeling only ever
    * REMOVES edges, an unchanged count is a proven fixpoint, so the
    * loop exits early instead of running no-op rounds (`rounds` is the
    * safety bound that keeps the unrolled SQL-oracle form finite; extra
    * rounds past the fixpoint are no-ops in both engines, so a capped
    * run and a converged run agree bit-for-bit whenever the cap is not
    * binding).
    *
    * @param edges canonical undirected edge list (`a`, `b`),
    *              deduplicated, a ≠ b (the [[triangleCensus]] contract).
    * @return one row per surviving node: `n`, `deg` (its degree inside
    *         the peeled subgraph — ≥ k at a reached fixpoint). */
  def kcore(edges: DataFrame, k: Int, rounds: Int): DataFrame = {
    require(k >= 1, s"k-core needs k >= 1, got $k")
    require(rounds >= 1, s"k-core needs rounds >= 1, got $rounds")
    // lazy + count = one setup action (same cadence as the rounds)
    var e = edges.select(col("a"), col("b")).localCheckpoint(eager = false)
    var prev = e.count()
    var done = false
    var i    = 0
    while (i < rounds && !done) {
      i += 1
      val deg = e
        .select(col("a").as("n"))
        .unionAll(e.select(col("b").as("n")))
        .groupBy("n")
        .agg(count(lit(1)).as("d"))
      val keep = deg.where(col("d") >= k).select("n")
      // LAZY checkpoint + count = ONE action per round: the count job
      // both materializes the lineage-cut blocks and delivers the
      // convergence statistic (the eager form paid a second scheduled
      // job per round just to read back the cached blocks — measurable
      // drift on this, the suite's most round-serialized gate)
      val next = e
        .join(keep.withColumnRenamed("n", "a"), Seq("a"), "left_semi")
        .join(keep.withColumnRenamed("n", "b"), Seq("b"), "left_semi")
        .select("a", "b")
        .localCheckpoint(eager = false)
      val c = next.count()
      done = c == prev // removal-only ⇒ equal count ⇒ identical edge set
      prev = c
      e = next
    }
    e.select(col("a").as("n"))
      .unionAll(e.select(col("b").as("n")))
      .groupBy("n")
      .agg(count(lit(1)).as("deg"))
  }

  /** Multi-source breadth-first search with a hop bound — the
    * frontier-expansion (Pregel) shape that every distributed graph
    * engine uses for reachability, seed expansion, and "within N
    * degrees" audience queries. Each round is one equi-join of the
    * CURRENT FRONTIER onto the symmetric edge list plus a distinct and
    * an anti-join against the visited set — shuffles carry node ids
    * only, and the join's stream side is the frontier, which is
    * typically a small fraction of the graph (AQE broadcasts it when
    * it is). State is one (node, dist) row per reached node; rounds
    * are lineage-cut with `localCheckpoint` (the [[PageRank]] cadence),
    * whose eager materialization doubles as the empty-frontier check,
    * so the loop exits as soon as the reachable set saturates instead
    * of running no-op rounds. First discovery hop IS the BFS distance
    * (a node enters `dist` exactly once, at its minimal hop), so the
    * result is deterministic integers under any partitioning — the SQL
    * oracle replays it as a recursive CTE with `min(d)` and must
    * hash-match exactly.
    *
    * @param edges   canonical undirected edge list (`a`, `b`),
    *                deduplicated, a ≠ b (the [[triangleCensus]]
    *                contract).
    * @param sources one `node` per BFS seed (multi-source is the
    *                general form; a single seed is a 1-row frame).
    * @return (`node`, `dist`): every node within `maxHops` of a seed,
    *         with its exact BFS distance (seeds at 0). */
  def bfsHops(edges: DataFrame, sources: DataFrame, maxHops: Int): DataFrame =
    bfsHopsSym(
      edges
        .select(col("a").cast("long").as("s"), col("b").cast("long").as("t"))
        .unionAll(edges.select(col("b").cast("long").as("s"), col("a").cast("long").as("t")))
        .localCheckpoint(eager = false), // materializes in hop 1's job
      sources,
      maxHops,
    )

  /** [[bfsHops]] over a prebuilt (already materialized) SYMMETRIC edge
    * list `(s, t)` — callers running several sweeps over one graph
    * (the double-sweep diameter) build the symmetric list once. */
  private[graft] def bfsHopsSym(
      sym: DataFrame,
      sources: DataFrame,
      maxHops: Int,
  ): DataFrame = {
    require(maxHops >= 0, s"BFS needs maxHops >= 0, got $maxHops")
    var dist = sources
      .select(col("node").cast("long").as("node"))
      .distinct()
      .select(col("node"), lit(0L).as("dist"))
      .localCheckpoint(eager = false)
    var frontier = dist.select("node")
    // ZERO actions in the loop (r17): a saturated frontier makes every
    // later hop's `next` EMPTY (the anti-join removes everything), and
    // unioning empty frames is a no-op on the result — so the
    // empty-frontier exit test the r16 form paid one count job per hop
    // to read is not needed for correctness, only as a work-saver, and
    // at these hop budgets the no-op hops are empty cached scans. All
    // lineage cuts are lazy; the consumer's one action materializes
    // the whole chain, each frontier persisting at first touch (it is
    // consumed by the next hop's join AND the dist union).
    for (hop <- 1L to maxHops.toLong) {
      val next = frontier
        .join(sym, col("node") === col("s"))
        .select(col("t").as("node"))
        .distinct()
        .join(dist, Seq("node"), "left_anti")
        .select(col("node"), lit(hop).as("dist"))
        .localCheckpoint(eager = false)
      dist = dist.unionAll(next)
      frontier = next.select("node")
    }
    dist
  }

  /** Double-sweep diameter lower bound (the classic 2-BFS heuristic:
    * Magnien, Latapy & Habib, JEA 2009): BFS from a deterministic seed
    * (the minimum node id), take the farthest node found (ties → min
    * id), BFS again from it — the second eccentricity is a lower
    * bound on the graph diameter that is exact on trees and near-exact
    * on most real graphs, at the cost of TWO sweeps instead of
    * all-pairs. Both sweeps are [[bfsHops]] frontier rounds bounded at
    * `maxHops`, so the reported value is "diameter lower bound within
    * a hop budget" — exact whenever maxHops ≥ the true eccentricities.
    * Everything stays a DataFrame: the seed is a 1-row aggregate, each
    * argmax a TakeOrdered(1), the result a cross join of three 1-row
    * frames — no corpus-sized driver materialization anywhere.
    * Output: 1 row `(seed, peripheral, ecc_seed, far_node,
    * diameter_lb)`. */
  def diameterSweep(edges: DataFrame, maxHops: Int): DataFrame = {
    // both sweeps walk one materialized symmetric list (the un-hoisted
    // form built and checkpointed it once per sweep); lazy — the one
    // consumer job materializes it at first touch
    val sym = edges
      .select(col("a").cast("long").as("s"), col("b").cast("long").as("t"))
      .unionAll(edges.select(col("b").cast("long").as("s"), col("a").cast("long").as("t")))
      .localCheckpoint(eager = false)
    val seed = sym.agg(min(col("s")).as("node"))
    val far1 = bfsHopsSym(sym, seed, maxHops)
      .orderBy(col("dist").desc, col("node"))
      .limit(1)
    val far2 = bfsHopsSym(sym, far1.select("node"), maxHops)
      .orderBy(col("dist").desc, col("node"))
      .limit(1)
    seed
      .select(col("node").as("seed"))
      .crossJoin(far1.select(col("node").as("peripheral"), col("dist").as("ecc_seed")))
      .crossJoin(far2.select(col("node").as("far_node"), col("dist").as("diameter_lb")))
  }

  /** Bounded-round single/multi-source shortest paths over a WEIGHTED
    * directed edge list — distributed Bellman-Ford on the (min, +)
    * semiring, the weighted sibling of [[bfsHops]] (which is this with
    * unit weights and a frontier optimization). Each round relaxes
    * every edge once: dist ⋈ edges on the source key, add the weight,
    * union the previous distances, take the per-node min — one
    * equi-join plus one aggregation per round, shuffling (node, dist)
    * longs only. After r rounds the result is EXACTLY "minimum-cost
    * path using ≤ r edges" — a well-defined semantics in itself (cost
    * within a hop budget), and equal to the true shortest path
    * whenever r ≥ the graph's hop diameter. Integer weights make every
    * round a deterministic function of the last, so a SQL oracle
    * replays the rounds as unrolled CTEs and hash-matches.
    *
    * @param edges   directed weighted edges (`src`, `dst`, `w` ≥ 0,
    *                integral); pass both directions for undirected.
    * @param sources one `node` per seed (distance 0).
    * @param rounds  relaxation rounds = max path length in edges.
    * @return (`node`, `dist`): min cost over paths of ≤ `rounds` edges
    *         from any seed; unreachable-within-budget nodes absent. */
  def ssspBounded(edges: DataFrame, sources: DataFrame, rounds: Int): DataFrame = {
    require(rounds >= 1, s"SSSP needs rounds >= 1, got $rounds")
    // lazy setup + the every-3rd-round checkpoint cadence
    // ([[PageRank.pageRank]]'s loop discipline, r16 optimization
    // round): relaxation is integer (min, +) — order-free — so
    // batching three rounds into one job cannot change a distance.
    val e = edges
      .select(col("src").cast("long").as("src"), col("dst").cast("long").as("dst"),
        col("w").cast("long").as("w"))
      .localCheckpoint(eager = false)
    var dist = sources
      .select(col("node").cast("long").as("node"))
      .distinct()
      .select(col("node"), lit(0L).as("dist"))
      .localCheckpoint(eager = false)
    for (i <- 1 to rounds) {
      dist = dist
        .join(e, col("node") === col("src"))
        .select(col("dst").as("node"), (col("dist") + col("w")).as("dist"))
        .unionAll(dist)
        .groupBy("node")
        .agg(min(col("dist")).as("dist"))
      // lazy cuts (r17): fixed round count, no convergence read — the
      // consumer's one action runs the whole chain
      if (i % 3 == 0 || i == rounds) dist = dist.localCheckpoint(eager = false)
    }
    dist
  }

  /** Synchronous label propagation (Raghavan 2007's LPA, the
    * near-linear community detector) — the fifth graph-family member:
    * every node starts labeled with itself; each round it adopts the
    * most frequent label among its neighbors AND itself (the self-vote
    * variant — without it, synchronous LPA provably oscillates on
    * bipartite graphs, and the trade graph IS bipartite), ties broken
    * by SMALLEST label so every round is a deterministic function of
    * the previous labeling — the property that lets a SQL oracle
    * replay `rounds` rounds as unrolled CTEs and hash-match exactly
    * (classic LPA randomizes update order; determinism here is a
    * deliberate semantic choice, same as the integer-ppm PageRank).
    *
    * Round shape: one join (labels onto edge sources) + one
    * (node, label) count + one per-node argmax — all equi-keyed; the
    * argmax is `min(struct(-count, label))`, a plain aggregation, NOT
    * a per-node window (no sort, ties resolved inside the struct
    * comparison). Labels are node ids, so state is one row per node
    * per round; lineage is cut on the [[PageRank]] cadence.
    *
    * The semantics are defined over a SIMPLE graph: duplicate
    * (src, dst) rows would weight rounds 2+'s count votes by
    * multiplicity while round 1's min shortcut ignores it, so the edge
    * list is deduplicated here unless the caller vouches for it —
    * every round then provably sees the same (unweighted) neighbor
    * sets. For multiplicity-weighted voting use a weighted edge list
    * explicitly; silence is not a semantics.
    *
    * @param edges symmetric directed edge list (`src`, `dst`) — pass
    *              both directions for an undirected graph.
    * @param edgesDistinct set true ONLY when the edge list is distinct
    *              by construction (e.g. built from a DISTINCT
    *              projection) to skip the dedup exchange — on the big
    *              gates the edge build already ends in a distinct, and
    *              re-paying |E| shuffle for a no-op matters at scale.
    * @return (`id`, `label`) after `rounds` synchronous rounds. */
  def labelPropagation(
      edges: DataFrame,
      rounds: Int,
      edgesDistinct: Boolean = false,
  ): DataFrame = {
    require(rounds >= 1, s"label propagation needs rounds >= 1, got $rounds")
    val e0 = edges.select(col("src"), col("dst"))
    // lazy: materializes inside round 1's checkpoint job
    val e =
      (if (edgesDistinct) e0 else e0.dropDuplicates("src", "dst"))
        .localCheckpoint(eager = false)
    // Round 1 from identity labels NEVER needs the vote table: every
    // neighbor label is that neighbor's id, each occurs exactly once
    // (the edge list is deduplicated, no self-loops), and the
    // self-vote is one more count-1 entry — so every count ties at 1
    // and the smallest-label rule selects min(neighbors ∪ self). One
    // aggregate replaces a join + two aggregates: on a dense graph
    // round 1 has the largest vote table of any round, so this is the
    // single biggest cut in the loop (provably bit-identical to the
    // generic round — the oracle replays the generic form).
    var labels = e
      .groupBy(col("dst"))
      .agg(min(col("src")).as("__m"))
      .select(col("dst").as("id"), least(col("__m"), col("dst")).as("label"))
      .localCheckpoint(eager = false)
    for (i <- 2 to rounds) {
      val votes = e
        .join(labels.withColumnRenamed("id", "src"), Seq("src"))
        .select(col("dst").as("id"), col("label"))
        .unionAll(labels) // the self-vote
        .groupBy(col("id"), col("label"))
        .agg(count(lit(1)).as("c"))
      labels = votes
        .groupBy(col("id"))
        .agg(min(struct((-col("c")).as("nc"), col("label").as("l"))).as("m"))
        .select(col("id"), col("m.l").as("label"))
      if (i % 3 == 0 || i == rounds) labels = labels.localCheckpoint()
    }
    labels
  }

  /** The lazy census dataflow over a (possibly persisted) canonical
    * edge list — separated from [[triangleCensus]]'s eager wrapper so
    * its physical plan can be pinned in PlanSpec (the eager form's
    * returned frame is a LocalRelation). */
  /** Per-node clustering coefficient — the local form of
    * [[triangleCensus]]'s global closure: for each node, the fraction
    * of its neighbor pairs that are themselves connected,
    * 2·T_v / (deg·(deg−1)) in integer ppm. Same degree-ordered wedge
    * closing as the census (work bounded by arboricity), but the
    * closing probe keeps the wedge's THIRD node so each triangle can
    * credit all three corners — one explode, one count per node.
    * Nodes with fewer than two neighbors have no wedges and report 0.
    *
    * @param edges undirected, canonical a < b, deduplicated (the
    *              [[triangleCensus]] contract). */
  def localClustering(edges: DataFrame): DataFrame = {
    val deg = edges
      .select(col("a").as("n"))
      .unionAll(edges.select(col("b").as("n")))
      .groupBy("n")
      .agg(count(lit(1)).as("degree"))
    val withDeg = edges
      .join(deg.withColumnRenamed("n", "a").withColumnRenamed("degree", "da"), "a")
      .join(deg.withColumnRenamed("n", "b").withColumnRenamed("degree", "db"), "b")
    val aFirst = (col("da") < col("db")) || (col("da") === col("db") && col("a") < col("b"))
    val oriented = withDeg.select(
      when(aFirst, col("a")).otherwise(col("b")).as("src"),
      when(aFirst, col("b")).otherwise(col("a")).as("dst"),
      when(aFirst, col("db")).otherwise(col("da")).as("dd"),
    )
    val e1 = oriented.select(col("src"), col("dst").as("v"), col("dd").as("vd"))
    val e2 = oriented.select(col("src"), col("dst").as("w"), col("dd").as("wd"))
    val wedgeOrder =
      (col("vd") < col("wd")) || (col("vd") === col("wd") && col("v") < col("w"))
    // inner join (not semi): the closed wedge must keep src so the
    // triangle can credit all three corners
    val tri = e1
      .join(e2, Seq("src"))
      .where(wedgeOrder)
      .select(col("src"), col("v"), col("w"))
      .join(oriented.select(col("src").as("v"), col("dst").as("w")), Seq("v", "w"))
    val perNode = tri
      .select(explode(array(col("src"), col("v"), col("w"))).as("n"))
      .groupBy("n")
      .agg(count(lit(1)).as("triangles"))
    deg
      .join(perNode, Seq("n"), "left")
      .select(
        col("n"),
        col("degree"),
        coalesce(col("triangles"), lit(0L)).as("triangles"),
        when(col("degree") < 2, lit(0L))
          .otherwise(expr(
            "(2 * coalesce(triangles, 0L) * 1000000) div (degree * (degree - 1))"))
          .as("coeff_ppm"),
      )
  }

  /** Link prediction by common-neighbor counting + neighborhood
    * Jaccard (Liben-Nowell & Kleinberg 2003's two strongest "local"
    * predictors): score every non-adjacent pair at distance 2 and
    * return the top-k most likely future edges — the
    * recommender/record-linkage primitive ("customers who should be
    * connected but aren't").
    *
    * Shape: one wedge self-join on the middle node (every candidate
    * pair is produced once per common neighbor, so the pair-count
    * aggregation yields CN(u,v) exactly), one anti-join removing
    * already-present edges, two broadcast-free degree joins, and a
    * TakeOrdered top-k — no global sort, no cartesian. The wedge space
    * Σ_m C(deg(m), 2) is the OUTPUT-SIZE lower bound of exact
    * common-neighbor counting (each wedge witnesses one CN unit), so
    * it is the cost floor, not an implementation artifact; on skewed
    * graphs the caller bounds it upstream by capping the projection
    * that built the edge list (the co-purchase cap), exactly as every
    * production similarity-graph pipeline does.
    *
    * Jaccard is |N(u)∩N(v)| / |N(u)∪N(v)| = cn / (deg(u)+deg(v)−cn),
    * emitted in exact integer ppm (`div`) so rows are bit-identical
    * across engines and partitionings.
    *
    * @param edges canonical undirected edge list (`a`, `b`), a < b,
    *              deduplicated (the [[triangleCensus]] contract).
    * @param k     number of top-scored candidate pairs to return.
    * @return top-k rows (a, b, cn, deg_a, deg_b, jaccard_ppm, rnk)
    *         ordered by (jaccard_ppm DESC, cn DESC, a, b) — a total
    *         deterministic order, so the cut is replayable. */
  def linkPrediction(edges: DataFrame, k: Int): DataFrame = {
    require(k >= 1, s"link prediction needs k >= 1, got $k")
    val e = edges.select(col("a").cast("long").as("a"), col("b").cast("long").as("b"))
    val adj = e
      .select(col("a").as("m"), col("b").as("n"))
      .unionAll(e.select(col("b").as("m"), col("a").as("n")))
    val deg = adj.groupBy(col("n")).agg(count(lit(1)).as("degree"))
    val cand = adj
      .select(col("m"), col("n").as("u"))
      .join(adj.select(col("m"), col("n").as("v")), Seq("m"))
      .where(col("u") < col("v"))
      .groupBy(col("u"), col("v"))
      .agg(count(lit(1)).as("cn"))
      // distance-2 only: drop pairs already connected (anti on the
      // canonical form — u < v matches the edge list's a < b)
      .join(
        e.select(col("a").as("u"), col("b").as("v")),
        Seq("u", "v"),
        "left_anti",
      )
    cand
      .join(deg.select(col("n").as("u"), col("degree").as("deg_a")), "u")
      .join(deg.select(col("n").as("v"), col("degree").as("deg_b")), "v")
      .select(
        col("u").as("a"),
        col("v").as("b"),
        col("cn"),
        col("deg_a"),
        col("deg_b"),
        expr("(cn * 1000000L) div (deg_a + deg_b - cn)").as("jaccard_ppm"),
      )
      .orderBy(col("jaccard_ppm").desc, col("cn").desc, col("a"), col("b"))
      .limit(k)
      .withColumn(
        "rnk",
        row_number().over(
          org.apache.spark.sql.expressions.Window
            .orderBy(col("jaccard_ppm").desc, col("cn").desc, col("a"), col("b"))
        ),
      )
  }

  private[graft] def censusPlan(e: DataFrame): DataFrame = {

    // Degrees over both endpoints: one union + one aggregation.
    val deg = e
      .select(col("a").as("n"))
      .unionAll(e.select(col("b").as("n")))
      .groupBy("n")
      .agg(count(lit(1)).as("d"))

    // Orient each edge lower-(degree, id) -> higher-(degree, id); the
    // pair comparison stays two primitive comparisons inside codegen
    // (a dense rank would need a global window — a single-partition
    // bottleneck this deliberately avoids).
    val withDeg = e
      .join(deg.withColumnRenamed("n", "a").withColumnRenamed("d", "da"), "a")
      .join(deg.withColumnRenamed("n", "b").withColumnRenamed("d", "db"), "b")
    val aFirst = (col("da") < col("db")) || (col("da") === col("db") && col("a") < col("b"))
    val oriented = withDeg
      .select(
        when(aFirst, col("a")).otherwise(col("b")).as("src"),
        when(aFirst, col("b")).otherwise(col("a")).as("dst"),
        when(aFirst, col("da")).otherwise(col("db")).as("sd"),
        when(aFirst, col("db")).otherwise(col("da")).as("dd"),
      )

    // Wedges from the common (low-ordered) source; the order predicate
    // keeps exactly one of the two (v,w)/(w,v) forms, and — because v
    // and w both rank above src — the closing edge, if present, is
    // oriented v -> w in the same list.
    val e1 = oriented.select(col("src"), col("dst").as("v"), col("dd").as("vd"))
    val e2 = oriented.select(col("src"), col("dst").as("w"), col("dd").as("wd"))
    val wedgeOrder =
      (col("vd") < col("wd")) || (col("vd") === col("wd") && col("v") < col("w"))
    val wedges = e1.join(e2, Seq("src")).where(wedgeOrder).select(col("v"), col("w"))

    val closed = wedges.join(
      oriented.select(col("src").as("v"), col("dst").as("w")),
      Seq("v", "w"),
      "left_semi",
    )

    // All four census numbers are tiny aggregates over frames sharing
    // the edge-list lineage; the caller persists `e` so the branches
    // read one cached copy (keys only — bytes ∝ |E|, never payloads)
    // instead of re-projecting the input four times. The caller
    // materializes the single bounded row EAGERLY (the count-probe
    // precedent: a 1-row collect is driver-bounded at any graph size)
    // and releases the cache — a lazy result would either leak the
    // persist or recompute the lineage per downstream action.
    deg
      .agg(
        count(lit(1)).as("nodes"),
        coalesce(sum(col("d") * (col("d") - 1)), lit(0L)).as("wedges2"),
      )
      .crossJoin(e.agg(count(lit(1)).as("edges")))
      .crossJoin(closed.agg(count(lit(1)).as("triangles")))
      .select(
        col("nodes"),
        col("edges"),
        expr("wedges2 div 2").as("wedges"),
        col("triangles"),
        when(col("wedges2") === 0, lit(0L))
          .otherwise(expr("(3 * triangles * 1000000) div (wedges2 div 2)"))
          .as("closure_ppm"),
      )
  }

  /** Markov-chain steady-state estimate by power iteration over an
    * empirical weighted transition list — where does a behavior chain
    * spend its time in equilibrium (the un-teleported cousin of
    * [[PageRank]]: no damping, mass moves ONLY along observed
    * transitions; absorbing states — no outgoing edges — keep their
    * mass instead of receiving the dangling redistribution).
    *
    * Integer-ppm arithmetic throughout (the [[PageRank]] discipline):
    * π₀ = ⌊10⁶/|states|⌋ uniform; each round sends ⌊π(src)·n/out(src)⌋
    * along every edge — one flooring division per edge per round, so
    * the series is engine-exact; the ≤|E| ppm lost to flooring per
    * round is the documented price of exactness (same as PageRank's).
    *
    * Scale shape: per round, ONE join of the |states|-row rank vector
    * against the edge list plus one keyed aggregate — |E| rows moved
    * per round, rounds a small constant. |states| is dimension-bounded
    * (event types, not events), so the state census cross-join is a
    * broadcast of one 1-row count, not a driver collect.
    *
    * @param edges (src, dst, n) weighted transition counts, n > 0.
    * @param rounds power-iteration rounds (small constant).
    * @return (state, pi_ppm) after `rounds` iterations. */
  /** HITS hubs-and-authorities (Kleinberg 1999) by power iteration
    * over a DIRECTED edge list — the link-analysis dual of
    * [[PageRank]]: a good hub points at good authorities, a good
    * authority is pointed at by good hubs. Two mutually-recursive
    * score vectors instead of one.
    *
    * Integer-ppm arithmetic throughout (the [[PageRank]] discipline),
    * with the per-round L∞ normalization HITS needs to converge done
    * as an exact integer rescale: score·10⁶ div max(score), the max a
    * broadcast 1-row aggregate. Every engine replays the series
    * bit-for-bit; the ≤1 ppm flooring loss per node per round is the
    * documented price of exactness.
    *
    * Scale shape: per round, two (rank-vector ⋈ edges) joins + two
    * keyed aggregates + two 1-row maxes — 2·|E| rows moved per round,
    * rounds a small constant; nothing corpus-sized gathers.
    *
    * @param edges directed (src, dst); pre-dedup if multiplicity must
    *              not weight the sums.
    * @param rounds full hub+authority update rounds (small constant).
    * @return one row per node: (id, hub_ppm, auth_ppm). */
  def hits(edges: DataFrame, rounds: Int = 2): DataFrame = {
    require(rounds >= 1 && rounds <= 20, s"rounds must be in [1, 20], got $rounds")
    val e = edges.select(col("src"), col("dst")).localCheckpoint()
    val nodes = e
      .select(col("src").as("id"))
      .unionAll(e.select(col("dst").as("id")))
      .distinct()
      .localCheckpoint()
    def normalized(raw: DataFrame, scoreCol: String): DataFrame = {
      // L∞ normalize: max is ONE row, broadcast; flooring div is exact
      val mx = raw.agg(max(col(scoreCol)).as("__mx"))
      raw
        .crossJoin(broadcast(mx))
        .select(
          col("id"),
          when(col("__mx") > 0, expr(s"($scoreCol * 1000000L) div __mx"))
            .otherwise(lit(0L))
            .as(scoreCol),
        )
    }
    var auth = nodes.withColumn("auth", lit(1000000L))
    var hub  = nodes.withColumn("hub", lit(1000000L))
    for (i <- 1 to rounds) {
      // The 264-Exchange plan this loop builds at rounds=2 LOOKS like
      // 16× re-evaluation of the first-round joins, and round 16 cut it
      // with a localCheckpoint per raw half-round vector. Re-measured
      // quiet in r17, that cure was the regression: identical Exchange
      // subtrees inside ONE plan (including the L∞-max broadcast
      // builds, which are part of the same plan tree) collapse via
      // ReusedExchange at execution, so the uncut form computes each
      // join once — while the per-half-round cuts paid 4 scheduler
      // round-trips per round (eager: 6.8 s cold / 3.3 s warm; lazy:
      // 5.3 / 2.6; uncut: 1.0 s ≈ the pre-r16 anchor, bit-identical
      // results). The i%3 cadence below still bounds the PLANNING-time
      // growth for high round counts; rounds is capped at 20.
      val hubRaw = nodes
        .join(
          e.join(auth.withColumnRenamed("id", "dst"), Seq("dst"))
            .groupBy(col("src").as("id"))
            .agg(sum(col("auth")).as("__s")),
          Seq("id"),
          "left",
        )
        .select(col("id"), coalesce(col("__s"), lit(0L)).as("hub"))
      hub = normalized(hubRaw, "hub")
      val authRaw = nodes
        .join(
          e.join(hub.withColumnRenamed("id", "src"), Seq("src"))
            .groupBy(col("dst").as("id"))
            .agg(sum(col("hub")).as("__s")),
          Seq("id"),
          "left",
        )
        .select(col("id"), coalesce(col("__s"), lit(0L)).as("auth"))
      auth = normalized(authRaw, "auth")
      if (i % 3 == 0) { hub = hub.localCheckpoint(); auth = auth.localCheckpoint() }
    }
    nodes
      .join(hub, Seq("id"))
      .join(auth, Seq("id"))
      .select(col("id"), col("hub").as("hub_ppm"), col("auth").as("auth_ppm"))
  }

  def markovSteadyState(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      nCol: String,
      rounds: Int = 3,
  ): DataFrame = {
    require(rounds >= 1 && rounds <= 20, s"rounds must be in [1, 20], got $rounds")
    // e materializes inside the states checkpoint's job (lazy setup)
    val e = edges
      .select(col(srcCol).as("src"), col(dstCol).as("dst"), col(nCol).as("n"))
      .localCheckpoint(eager = false)
    val outs = e.groupBy("src").agg(sum(col("n")).as("out_n"))
    val states = e
      .select(col("src").as("state"))
      .unionAll(e.select(col("dst").as("state")))
      .distinct()
      .localCheckpoint()
    var pi = states
      .crossJoin(broadcast(states.agg(count(lit(1)).as("__c"))))
      .select(col("state"), expr("1000000L div __c").as("pi"))
    for (i <- 1 to rounds) {
      val contrib = pi
        .join(e, pi("state") === e("src"))
        .join(outs, "src")
        .select(col("dst").as("state"), expr("(pi * n) div out_n").as("m"))
        .groupBy("state")
        .agg(sum(col("m")).as("m"))
      // absorbing states (no outgoing edges) hold their current mass
      val held = pi
        .join(outs, pi("state") === outs("src"), "left_anti")
        .select(col("state"), col("pi").as("held_pi"))
      pi = states
        .join(contrib, Seq("state"), "left")
        .join(held, Seq("state"), "left")
        .select(
          col("state"),
          (coalesce(col("m"), lit(0L)) + coalesce(col("held_pi"), lit(0L))).as("pi"),
        )
      if (i % 3 == 0 || i == rounds) pi = pi.localCheckpoint()
    }
    pi.select(col("state"), col("pi").as("pi_ppm"))
  }
}
