package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Reciprocal-rank fusion (Cormack, Clarke & Büttcher, SIGIR 2009) —
  * the standard way to combine rankings from incomparable scorers
  * (BM25 + embedding ANN is the "hybrid search" every RAG stack
  * runs): each ranking contributes 1/(k + rank) per item, scores
  * sum, items re-rank. Absent items simply contribute nothing —
  * no score normalization needed, which is the method's whole point.
  *
  * Kept in integer ppm (10⁶ div (k + rank)) so fused scores are
  * bit-identical across engines. With k = 60 the ppm floor keeps
  * ~2300 distinct rank values before truncation collides — far past
  * any real per-query candidate depth.
  *
  * Scale shape: a union of the (already small, top-k per query)
  * ranking tables, one keyed aggregate, one per-query window. The
  * expensive work happened upstream in the rankers; fusion itself is
  * candidate-proportional.
  */
object Fusion {

  /** Fuse rankings (each with `groupCols` + `itemCol` + an integer
    * rank column named `rankCol`, rank 1 = best) into a fused
    * ranking: `rrf_ppm` score, `n_lists` (how many rankings carried
    * the item), and `rnk` recomputed per group (ties break on
    * ascending item). */
  def rrf(
      rankings: Seq[DataFrame],
      groupCols: Seq[String],
      itemCol: String,
      rankCol: String,
      kConst: Int = 60,
  ): DataFrame = {
    require(rankings.nonEmpty, "need at least one ranking")
    require(kConst >= 0, s"kConst must be >= 0, got $kConst")
    val slim = rankings.map(
      _.select((groupCols :+ itemCol :+ rankCol).map(col): _*)
    )
    val unioned = slim.reduce(_ unionByName _)
    val keys    = (groupCols :+ itemCol).map(col)
    val fused = unioned
      .groupBy(keys: _*)
      .agg(
        sum(expr(s"1000000L div ($kConst + $rankCol)")).cast("long").as("rrf_ppm"),
        count(lit(1)).as("n_lists"),
      )
    val w = Window
      .partitionBy(groupCols.map(col): _*)
      .orderBy(col("rrf_ppm").desc, col(itemCol).asc)
    fused.withColumn("rnk", row_number().over(w))
  }
}
