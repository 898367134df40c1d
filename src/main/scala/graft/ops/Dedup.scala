package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines, from exact to
  * fuzzy: content-hash groups, n-gram Jaccard, MinHash+LSH banding, and
  * SimHash. All are DataFrame-in/DataFrame-out compositions of built-in
  * operators (hash-aggregate + shuffle joins), so they inherit Spark's
  * partial aggregation, AQE, and skew handling — nothing collects to the
  * driver.
  *
  * Scale notes (100 TB posture):
  *  - exact dedup: one hash-groupBy shuffle on the 128-bit fingerprint.
  *  - jaccardPairs: the shingle self-join is bounded by shingle document
  *    frequency; cap ubiquitous shingles with `maxDocFreq` (boilerplate
  *    shingles otherwise quadratically dominate the join).
  *  - MinHash+LSH: fixed k hashes per shingle (linear), then a self-join
  *    keyed on (band, band_hash) — only colliding docs meet, which is
  *    the point of LSH. Tune bands×rows for the target similarity.
  *  - SimHash: linear signature computation, then pair generation should
  *    be bucketed (e.g. by 16-bit prefix) rather than all-pairs; the
  *    all-pairs form here is for oracle-checkable correctness at test SF.
  */
object Dedup {

  /** Distinct (doc_id, shingle) pairs: the set representation used by
    * every fuzzy-dedup operator below. */
  def shingleSets(docs: DataFrame, idCol: String, textCol: String, n: Int): DataFrame =
    docs.select(
      col(idCol).as("doc_id"),
      explode(array_distinct(Text.shingles(Text.tokens(col(textCol)), n))).as("sh"),
    )

  /** Exact dedup groups: normalize-and-hash fingerprint → smallest id
    * kept as the canonical representative, copy count retained. */
  def exactGroups(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs
      .groupBy(Text.fingerprint(col(textCol)).as("fp"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_copies"))

  /** All pairs with shingle-set Jaccard >= `minJaccard` (a < b).
    * `maxDocFreq` drops shingles occurring in more documents than the
    * cap before the self-join — the standard skew guard at scale. */
  def jaccardPairs(
      shingles: DataFrame,
      minJaccard: Double,
      maxDocFreq: Option[Long] = None,
  ): DataFrame = {
    val pruned = maxDocFreq match {
      case Some(cap) =>
        val df = shingles.groupBy("sh").agg(count(lit(1)).as("__df")).filter(col("__df") <= cap)
        shingles.join(df.select("sh"), "sh")
      case None => shingles
    }
    val sizes = pruned.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val common = pruned
      .as("a")
      .join(pruned.as("b"), col("a.sh") === col("b.sh") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("a_id"), col("b.doc_id").as("b_id"))
      .agg(count(lit(1)).as("c"))
    common
      .join(sizes.as("na"), col("a_id") === col("na.doc_id"))
      .join(sizes.as("nb"), col("b_id") === col("nb.doc_id"))
      .select(
        col("a_id"),
        col("b_id"),
        (col("c").cast("double") / (col("na.n") + col("nb.n") - col("c"))).as("jaccard"),
      )
      .filter(col("jaccard") >= minJaccard)
  }

  /** MinHash signatures: one row per (doc, seed), `mh` = min over the
    * doc's shingles of md5(seed ':' shingle). md5 keeps the signature
    * engine-independent (byte-identical in any SQL engine) — the scale
    * path swaps in xxhash64 without changing the dataflow. */
  def minhashSignatures(shingles: DataFrame, k: Int): DataFrame =
    shingles
      .withColumn("seed", explode(sequence(lit(0), lit(k - 1))))
      .groupBy(col("doc_id"), col("seed"))
      .agg(min(md5(concat(col("seed").cast("string"), lit(":"), col("sh")))).as("mh"))

  /** LSH banding: group each doc's signature into bands of
    * `rowsPerBand` consecutive seeds; `band_hash` = md5 of the
    * seed-ordered minhashes in the band. */
  def lshBands(signatures: DataFrame, rowsPerBand: Int): DataFrame =
    signatures
      .withColumn("band", expr(s"seed div $rowsPerBand"))
      .groupBy("doc_id", "band")
      .agg(
        md5(
          array_join(
            transform(array_sort(collect_list(struct(col("seed"), col("mh")))), _.getField("mh")),
            ",",
          )
        ).as("band_hash")
      )

  /** Candidate pairs: docs sharing any LSH band (a < b, distinct).
    * This is the only pair-producing join and it is keyed on
    * (band, band_hash) — non-colliding documents never meet. */
  def lshCandidates(bands: DataFrame): DataFrame =
    bands
      .as("a")
      .join(
        bands.as("b"),
        col("a.band") === col("b.band") && col("a.band_hash") === col("b.band_hash") &&
          col("a.doc_id") < col("b.doc_id"),
      )
      .select(col("a.doc_id").as("a_id"), col("b.doc_id").as("b_id"))
      .distinct()

  /** End-to-end MinHash-LSH near-dup detection: LSH candidates verified
    * with the true shingle Jaccard (computed only for candidates). */
  def minhashLshPairs(
      shingles: DataFrame,
      k: Int,
      rowsPerBand: Int,
      minJaccard: Double,
  ): DataFrame = {
    val cands = lshCandidates(lshBands(minhashSignatures(shingles, k), rowsPerBand))
    val sizes = shingles.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val common = cands
      .join(shingles.as("sa"), col("a_id") === col("sa.doc_id"))
      .join(shingles.as("sb"), col("b_id") === col("sb.doc_id") && col("sa.sh") === col("sb.sh"))
      .groupBy("a_id", "b_id")
      .agg(count(lit(1)).as("c"))
    common
      .join(sizes.as("na"), col("a_id") === col("na.doc_id"))
      .join(sizes.as("nb"), col("b_id") === col("nb.doc_id"))
      .select(
        col("a_id"),
        col("b_id"),
        (col("c").cast("double") / (col("na.n") + col("nb.n") - col("c"))).as("jaccard"),
      )
      .filter(col("jaccard") >= minJaccard)
  }

  /** 32-bit SimHash over the shingle set. Bit j of md5(shingle) (taken
    * as hex-nibble high bits) votes ±1; the sign of each position's vote
    * sum becomes signature bit j. Pure integer arithmetic — identical in
    * any engine, and order-independent (sums). */
  def simhash32(shingles: DataFrame): DataFrame =
    shingles
      .withColumn("pos", explode(sequence(lit(1), lit(32))))
      .groupBy("doc_id", "pos")
      .agg(
        sum(
          when(
            expr("instr('0123456789abcdef', substring(md5(sh), pos, 1)) - 1") >= 8,
            1,
          ).otherwise(-1)
        ).as("s")
      )
      .groupBy("doc_id")
      .agg(
        sum(
          when(col("s") > 0, expr("shiftleft(CAST(1 AS BIGINT), pos - 1)")).otherwise(0L)
        ).as("simhash")
      )

  /** Near-dup pairs by SimHash Hamming distance (a < b). All-pairs form
    * for verifiable correctness; bucket by signature prefix at scale. */
  def simhashPairs(sigs: DataFrame, maxHamming: Int): DataFrame =
    sigs
      .as("a")
      .join(sigs.as("b"), col("a.doc_id") < col("b.doc_id"))
      .select(
        col("a.doc_id").as("a_id"),
        col("b.doc_id").as("b_id"),
        bit_count(col("a.simhash").bitwiseXOR(col("b.simhash"))).as("hamming"),
      )
      .filter(col("hamming") <= maxHamming)
}
