package graft.queries

import graft.Tables._
import graft.ops.Similarity
import org.apache.spark.sql.functions._

/** Embedding similarity-search queries over the `embeddings` table
  * (SURVEY.md §2.10). The cosine score is a strict left-to-right double
  * fold in both engines (Spark `aggregate`, DuckDB `list_reduce`), so
  * scores — and therefore rankings — are bit-identical.
  */
object SimilarityQueries {

  /** Oracle fragment: left-fold dot product of two list expressions. */
  private def duckDot(a: String, b: String): String =
    s"""list_reduce(list_transform(generate_series(1, len($a)),
       |            i -> CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE)), (x, y) -> x + y)""".stripMargin

  private val norms = Q(
    "sim_embedding_norms",
    s"""SELECT vec_id, sqrt(${duckDot("embedding", "embedding")}) AS nrm
       |FROM embeddings""".stripMargin,
  ) { (s, d) =>
    Similarity.withNorm(embeddings(s, d), "embedding").select("vec_id", "nrm")
  }

  /** Brute-force exact top-3 cosine neighbors for the first 10 vectors:
    * query side broadcast, candidates stay partitioned, per-query
    * window top-k. */
  private val cosineTopK = Q(
    "sim_cosine_topk",
    s"""WITH e AS (
       |  SELECT vec_id, embedding, sqrt(${duckDot("embedding", "embedding")}) AS nrm
       |  FROM embeddings),
       |pairs AS (
       |  SELECT q.vec_id AS q_id, c.vec_id AS n_id,
       |    ${duckDot("q.embedding", "c.embedding")} / (q.nrm * c.nrm) AS cos
       |  FROM e q JOIN e c ON c.vec_id <> q.vec_id
       |  WHERE q.vec_id < 10)
       |SELECT q_id, n_id, cos, rnk FROM (
       |  SELECT *, row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, n_id) AS rnk
       |  FROM pairs)
       |WHERE rnk <= 3""".stripMargin,
  ) { (s, d) =>
    val emb = embeddings(s, d)
    Similarity
      .bruteForceTopK(
        queries = emb.filter(col("vec_id") < 10),
        candidates = emb,
        idCol = "vec_id",
        embCol = "embedding",
        k = 3,
      )
      .select("q_id", "n_id", "cos", "rnk")
  }

  val all: Seq[Q] = Seq(norms, cosineTopK)
}
