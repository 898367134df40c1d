package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bounded-iteration PageRank in pure integer arithmetic — the
  * iterative-graph companion to [[Dedup.clusterPairs]]' connected
  * components (Page et al. 1999; the power-iteration form every
  * distributed graph engine runs).
  *
  * Ranks are parts-per-million integers: r₀(v) = 1 000 000, and each
  * round computes
  *
  *   r'(v) = (1 − d)·10⁶  +  ⌊ d_ppt · Σ_{u→v} ⌊ r(u) / out(u) ⌋ / 1000 ⌋
  *
  * with d_ppt the damping in parts-per-thousand (850 = the classic
  * 0.85). Every operation is an integer sum or an integer floor
  * division (`div`), so a round is a pure function of the previous
  * integer rank vector: results are bit-identical under any
  * partitioning, shuffle order, or engine — the property that lets a
  * SQL oracle replay N unrolled rounds exactly, with no
  * floating-point tolerance anywhere. (The classic float formulation
  * is order-sensitive through its += accumulation; the decimal-exact
  * trick used by [[graft.expr.Parity]] would work too, but integer
  * ppm units make the floor explicit.) Mass lost to the two floors
  * (≤ 1 ppm per edge per round) and to dangling nodes (no out-edges)
  * is NOT redistributed — the "leaked dangling mass" PageRank
  * variant; with a symmetric edge list there are no dangling nodes.
  *
  * Scale shape per round: one equi-join of the rank vector against
  * the edge list on `src` (both sides hash-partition on src — AQE
  * free to broadcast the rank side while it fits, but never forced:
  * ranks are node-proportional), one shuffle-sum on `dst`, one left
  * join back to the node set for teleport-only nodes. The edge list
  * and its out-degrees are computed once and reused every round;
  * the rank vector is localCheckpointed per round so lineage stays
  * flat over the iteration count ([[Dedup.clusterPairs]]' loop
  * discipline). Rounds are a fixed constant (power iteration
  * converges geometrically; production runs 10–50 rounds at any
  * graph size), so total cost is O(iters · |E|) with no quadratic
  * term.
  */
object PageRank {

  /** @param edges directed edge list: columns `src`, `dst`. Pass each
    *              undirected edge in both directions for the
    *              symmetric form.
    * @param noDangling caller-asserted "every node has an in-edge AND
    *              an out-edge" (true by construction for a symmetric
    *              edge list). Skips the per-round left join against
    *              the node set — the contribution aggregate already
    *              covers every node — saving one join per iteration;
    *              also lets the node set be `distinct src` alone.
    * @return one row per node: (id, rank_ppm). */
  def pageRank(
      edges: DataFrame,
      iters: Int,
      dampingPpt: Int = 850,
      r0Ppm: Long = 1000000L,
      noDangling: Boolean = false,
      weightCol: Option[String] = None,
  ): DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    require(dampingPpt >= 0 && dampingPpt <= 1000, s"dampingPpt in [0,1000], got $dampingPpt")
    val basePpm = r0Ppm * (1000L - dampingPpt) / 1000L
    // weighted form: a node distributes its rank proportionally to
    // positive integer edge weights — contribution ⌊r·w / W(u)⌋ with
    // W(u) the total out-weight; the unweighted form is w ≡ 1.
    // Still all-integer, still order-free.
    // LAZY checkpoints on the setup frames (r16 optimization round):
    // `e` materializes inside the edgesDeg checkpoint's own job and
    // `nodes` inside the first round-batch job — the eager form paid
    // one scheduled job per frame (3 setup jobs) to build tables the
    // next job would have materialized anyway. Same blocks, same
    // lineage cuts, 1 setup action instead of 3.
    val e = edges
      .select(col("src") +: col("dst") +: weightCol.map(w => col(w).cast("long").as("__w")).toSeq: _*)
      .localCheckpoint(eager = false)
    val deg = e
      .groupBy("src")
      .agg(weightCol.map(_ => sum(col("__w"))).getOrElse(count(lit(1))).as("__d"))
    // out-degree rides WITH the edge list so the per-round join is a
    // single probe of the rank vector (degrees never change)
    val edgesDeg = e.join(deg, Seq("src")).localCheckpoint()
    val nodes =
      if (noDangling) e.select(col("src").as("id")).distinct().localCheckpoint(eager = false)
      else
        e.select(col("src").as("id"))
          .union(e.select(col("dst").as("id")))
          .distinct()
          .localCheckpoint(eager = false)
    val newRank =
      (lit(basePpm) + expr(s"(${dampingPpt}L * coalesce(__m, 0L)) div 1000L")).as("rank_ppm")
    var ranks = nodes.withColumn("rank_ppm", lit(r0Ppm))
    for (i <- 1 to iters) {
      val contribExpr =
        if (weightCol.isDefined) expr("(rank_ppm * __w) div __d") else expr("rank_ppm div __d")
      val contribs = edgesDeg
        .join(ranks.withColumnRenamed("id", "src"), Seq("src"))
        .select(col("dst").as("id"), contribExpr.as("__c"))
        .groupBy("id")
        .agg(sum(col("__c")).as("__m"))
      ranks =
        if (noDangling) contribs.select(col("id"), newRank)
        else nodes.join(contribs, Seq("id"), "left").select(col("id"), newRank)
      // Checkpoint every third round (and on the last): each eager
      // localCheckpoint is its own job, so per-round checkpointing pays
      // `iters` scheduler round-trips to keep lineage depth at 1;
      // letting three rounds chain keeps plans shallow enough for the
      // optimizer while cutting the materialization count 3×. The
      // arithmetic is integer (order-free), so batching rounds into one
      // job cannot change a single rank value. (r17 re-measured the
      // all-lazy single-job form: a wash here, a clear loss on the
      // personalized/markov shapes — kept eager.)
      if (i % 3 == 0 || i == iters) ranks = ranks.localCheckpoint()
    }
    ranks
  }

  /** Personalized PageRank (random walk with restart, Haveliwala 2002)
    * — the recommender/similarity form: the teleport mass lands ONLY
    * on the `sources` seed set, so ranks measure proximity TO the
    * seeds instead of global centrality. Same integer-ppm arithmetic
    * and per-round dataflow as [[pageRank]] (one join on src, one
    * shuffle-sum on dst, flat lineage); the only changes are the
    * start vector (r₀ on seeds, 0 elsewhere) and the restart term
    * ((1−d)·10⁶ on seeds, 0 elsewhere — unnormalized e_S, exactly
    * replayable). The seed flag rides the node set, so
    * personalization costs ONE extra left-semi-style join at setup,
    * nothing per round.
    *
    * @param edges   directed edge list (`src`, `dst`); symmetric form
    *                for undirected graphs.
    * @param sources seed set: one column `id`. */
  def personalized(
      edges: DataFrame,
      sources: DataFrame,
      iters: Int,
      dampingPpt: Int = 850,
      r0Ppm: Long = 1000000L,
  ): DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    require(dampingPpt >= 0 && dampingPpt <= 1000, s"dampingPpt in [0,1000], got $dampingPpt")
    val basePpm = r0Ppm * (1000L - dampingPpt) / 1000L
    // lazy setup checkpoints — the [[pageRank]] r16 cadence: one
    // materializing action (edgesDeg) instead of three
    val e = edges.select(col("src"), col("dst")).localCheckpoint(eager = false)
    val deg      = e.groupBy("src").agg(count(lit(1)).as("__d"))
    val edgesDeg = e.join(deg, Seq("src")).localCheckpoint()
    val nodes = e
      .select(col("src").as("id"))
      .union(e.select(col("dst").as("id")))
      .distinct()
      .join(sources.select(col("id")).distinct().withColumn("__s", lit(1)), Seq("id"), "left")
      .select(col("id"), coalesce(col("__s"), lit(0)).as("__s"))
      .localCheckpoint(eager = false)
    val restart = when(col("__s") === 1, lit(basePpm)).otherwise(lit(0L))
    val newRank =
      (restart + expr(s"(${dampingPpt}L * coalesce(__m, 0L)) div 1000L")).as("rank_ppm")
    var ranks = nodes.withColumn(
      "rank_ppm",
      when(col("__s") === 1, lit(r0Ppm)).otherwise(lit(0L)),
    )
    for (i <- 1 to iters) {
      val contribs = edgesDeg
        .join(ranks.select(col("id").as("src"), col("rank_ppm")), Seq("src"))
        .select(col("dst").as("id"), expr("rank_ppm div __d").as("__c"))
        .groupBy("id")
        .agg(sum(col("__c")).as("__m"))
      ranks = nodes.join(contribs, Seq("id"), "left").select(col("id"), col("__s"), newRank)
      if (i % 3 == 0 || i == iters) ranks = ranks.localCheckpoint()
    }
    ranks.select(col("id"), col("rank_ppm"))
  }
}
