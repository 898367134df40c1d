package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: opaque `binary` payloads carried beside
  * relational columns, with typed metadata and batched feature
  * extraction.
  *
  * Parquet stores binary natively, so images/audio/video ride the same
  * partitioning, predicate pushdown, and column pruning as everything
  * else; only the `content` column pays the byte cost, and queries that
  * don't touch it never read it.
  *
  * The decode step is a STUB by design (no media codecs in this
  * environment): [[extractFeatures]] implements the real Spark-side
  * contract — schema, per-partition batching (the seam where a
  * vectorized decoder amortizes model/codec init), deterministic
  * output — with a fake decoder that derives features from the raw
  * bytes. Swapping in a real decoder changes only the closure body.
  */
object Multimodal {

  /** Deterministic per-item features the stub "decoder" emits. */
  final case class MediaFeature(doc_id: Long, n_bytes: Int, head_byte: Int, checksum: String)

  /** Pack a text corpus into the multimodal shape: (doc_id, content
    * binary, meta struct) — the layout a real pipeline would land
    * images into. */
  def packDocuments(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      col("text").cast("binary").as("content"),
      struct(
        lit("text/plain").as("mime"),
        octet_length(col("text")).as("n_bytes"),
        col("source").as("source"),
      ).as("meta"),
    )

  /** Batched feature extraction over the binary column.
    *
    * `mapPartitions` + `grouped(batchSize)` is the Scala analog of a
    * pandas-batch UDF: the decoder (stubbed here) sees `batchSize`
    * payloads at a time, so a real implementation can vectorize and
    * reuse expensive per-batch state. Runs fully parallel per partition;
    * no state crosses batches.
    */
  def extractFeatures(media: DataFrame, batchSize: Int = 64): Dataset[MediaFeature] = {
    val spark = media.sparkSession
    import spark.implicits._
    media
      .select(col("doc_id"), col("content"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.grouped(batchSize).flatMap { batch =>
          // ---- stubbed vectorized decode over `batch` ----
          batch.map { case (id, bytes) =>
            MediaFeature(
              doc_id = id,
              n_bytes = bytes.length,
              head_byte = if (bytes.isEmpty) -1 else bytes(0) & 0xff,
              checksum = md5Hex(bytes),
            )
          }
        }
      }
  }

  /** Deterministic fake "frame sampling": n evenly spaced fixed-width
    * byte slices of the payload (a real video pipeline returns decoded
    * frames; the slicing/array shape is what downstream operators see). */
  def frameSample(content: org.apache.spark.sql.Column, n: Int, frameBytes: Int): org.apache.spark.sql.Column =
    transform(
      sequence(lit(0), lit(n - 1)),
      i => content.substr(lit(1) + i * greatest(octet_length(content).cast("int") / n, lit(1)).cast("int"), lit(frameBytes)),
    )

  /** Exact dedup over the binary payload — the multimodal twin of
    * [[Dedup.exactGroups]]: identical byte streams (re-crawled images,
    * re-encoded copies of the same upload) collapse on their 128-bit
    * content hash; the smallest id is the canonical keep, the copy
    * count is retained for curation stats. One hash-groupBy shuffle
    * keyed on the digest — the payload bytes never travel the wire,
    * only (checksum, id) pairs after the map-side hash, which is what
    * makes this viable when the payload column is the 100 TB. */
  def dedupBinary(media: DataFrame, idCol: String, contentCol: String): DataFrame =
    media
      .groupBy(md5(col(contentCol)).as("checksum"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_copies"))

  private def md5Hex(bytes: Array[Byte]): String =
    java.security.MessageDigest
      .getInstance("MD5")
      .digest(bytes)
      .map("%02x".format(_))
      .mkString
}
