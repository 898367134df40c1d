package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** End-to-end training-corpus preparation: the operator suites composed
  * the way a 100 TB data pipeline uses them —
  *
  *   quality filter → language filter → exact dedup → fuzzy dedup
  *
  * Each stage is DataFrame-in/DataFrame-out; the quality and language
  * gates are pure Column predicates (scan-local, pushdown-friendly, run
  * before anything shuffles), exact dedup is one hash-groupBy, and the
  * fuzzy stage pairs only LSH-colliding documents before clustering and
  * canonical selection.
  */
object CorpusPipeline {

  final case class Config(
      minTokens: Int = 10,
      maxTokens: Int = 100000,
      languages: Set[String] = Set("en"),
      shingleN: Int = 3,
      minhashK: Int = 16,
      rowsPerBand: Int = 4,
      minJaccard: Double = 0.8,
  )

  /** Returns the cleaned corpus (same schema as `docs`). */
  def prepare(docs: DataFrame, idCol: String, textCol: String, cfg: Config = Config()): DataFrame = {
    // 1. quality gate: token-count bounds (scan-local predicate)
    val nTok    = Text.tokenCount(col(textCol))
    val quality = docs.filter(nTok >= cfg.minTokens && nTok <= cfg.maxTokens)

    // 2. language gate: heuristic marker-word ID
    val inLang = quality.filter(Text.langId(col(textCol)).isin(cfg.languages.toSeq: _*))

    // 3. exact dedup: keep the smallest id per normalized fingerprint.
    // The surviving subset feeds two downstream consumers (the shingle
    // build and the final canonical anti-join); localCheckpoint
    // materializes the gates + dedup once instead of re-running the
    // regex predicates and fingerprint groupBy per consumer.
    val keep = Dedup
      .exactGroups(inLang, idCol, textCol)
      .select(col("keep_id").as("__keep_id"))
    // lazy: materializes at the first action, not at plan construction,
    // so prepare() keeps its DataFrame-in/DataFrame-out laziness
    val exactDeduped = inLang
      .join(keep, inLang(idCol) === col("__keep_id"), "left_semi")
      .localCheckpoint(eager = false)

    // 4. fuzzy dedup: MinHash-LSH candidates → verified pairs →
    //    components → canonical member per component. The shingle table
    //    feeds both the signature aggregation and the Jaccard verify —
    //    materialized once, the "write the shingle table before the
    //    dedup suite" pattern at pipeline scope.
    val shingles = Dedup
      .shingleSets(exactDeduped, idCol, textCol, cfg.shingleN)
      .localCheckpoint(eager = false)
    val pairs = Dedup
      .minhashLshPairs(shingles, cfg.minhashK, cfg.rowsPerBand, cfg.minJaccard)
      .select("a_id", "b_id")
    Dedup.dedupByPairs(exactDeduped, idCol, pairs)
  }

  /** [[prepare]] chained with an embedding near-duplicate stage — the
    * order a real LLM corpus pipeline runs: text-level dedup first
    * (cheap signals, removes exact/boilerplate copies), then
    * embedding-cosine near-dup over the survivors (catches semantic
    * duplicates that share few shingles). The embedding stage pairs
    * only SRP band-collision candidates
    * ([[Similarity.embeddingDupPairs]] — map-only signatures, a join
    * keyed on (band, key), never an all-pairs product), clusters them,
    * and keeps each component's minimum-id member. Survivors without an
    * embedding row pass through the stage untouched (they can never be
    * a candidate), so a partially-embedded corpus degrades to
    * text-only dedup rather than dropping documents.
    *
    * The survivor set feeds both the embedding join and the final
    * anti-join; it is lazily checkpointed once, the same
    * twice-consumed-stage pattern [[prepare]] uses internally. */
  def prepareWithEmbeddings(
      docs: DataFrame,
      embeddings: DataFrame,
      idCol: String,
      textCol: String,
      embIdCol: String,
      embCol: String,
      embTau: Double,
      cfg: Config = Config(),
      nPlanes: Int = 0,
      bands: Int = 0,
  ): DataFrame = {
    val survivors = prepare(docs, idCol, textCol, cfg).localCheckpoint(eager = false)
    embeddingStage(survivors, embeddings, idCol, embIdCol, embCol, embTau, nPlanes, bands)
  }

  /** The embedding near-dup stage of [[prepareWithEmbeddings]], over an
    * already-materialized survivor set — callers that consume both the
    * text-stage output AND the chained result (a pipeline writing
    * intermediate tables, or the gate running both as separate queries)
    * materialize `survivors` once and feed it here instead of
    * re-running the text pipeline per consumer. */
  def embeddingStage(
      survivors: DataFrame,
      embeddings: DataFrame,
      idCol: String,
      embIdCol: String,
      embCol: String,
      embTau: Double,
      nPlanes: Int = 0,
      bands: Int = 0,
  ): DataFrame = {
    // The embedding dimension is a property of the embeddings input
    // alone — probe it there (LIMIT 1 on one table) instead of letting
    // the operator infer through the survivors join, which would
    // materialize the whole text pipeline at construction time. An
    // embeddings side with no non-null vector degrades to text-only
    // dedup, as documented: nothing can be an embedding candidate.
    val dim = embeddings
      .filter(col(embCol).isNotNull)
      .select(size(col(embCol)).cast("int").as("n"))
      .head(1)
      .headOption
      .map(_.getInt(0))
    dim match {
      case None => survivors
      case Some(d) =>
        val embedded = survivors
          .join(embeddings, survivors(idCol) === embeddings(embIdCol))
          .select(survivors(idCol), col(embCol))
          .localCheckpoint(eager = false)
        // nPlanes/bands <= 0 (the default): size the banding to the
        // embedded-survivor count ([[Similarity.chooseBanding]]) — the
        // fixed demo config saturates quadratically past a few thousand
        // vectors. Explicit values are honored unchanged.
        val (np, b) =
          if (nPlanes > 0 && bands > 0) (nPlanes, bands)
          else Similarity.chooseBanding(embedded.count())
        val pairs = Similarity
          .embeddingDupPairs(embedded, idCol, embCol, embTau, np, b, dim = d)
          .select("a_id", "b_id")
        Dedup.dedupByPairs(survivors, idCol, pairs)
    }
  }

  /** The final MIXING stage — curation output → training mix: rebalance
    * the survivors' per-stratum shares at temperature α = 1/2
    * ([[Sampling.temperatureSqrt]] — low-resource sources lifted, the
    * mT5/XLM-R recipe, IEEE-exact arithmetic) and assign each kept
    * document its training shard by content hash
    * ([[Sampling.shardAssign]] — `df.write.partitionBy("shard")` then
    * emits the shard files). Both stages are scan-local predicates /
    * projections over the survivor set: the whole mix adds ZERO
    * shuffles beyond the one bounded strata-count probe. */
  def mix(
      survivors: DataFrame,
      idCol: String,
      strataCol: String,
      budget: Long,
      nShards: Int,
  ): DataFrame =
    Sampling.shardAssign(
      Sampling.temperatureSqrt(survivors, idCol, strataCol, budget),
      idCol,
      nShards,
    )
}
