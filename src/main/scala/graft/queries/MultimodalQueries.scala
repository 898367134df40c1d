package graft.queries

import graft.Tables._
import graft.ops.Multimodal
import org.apache.spark.sql.functions._

/** Multimodal-column queries (SURVEY.md §2.10): binary payloads beside
  * relational columns, metadata projection, and the batched
  * feature-extraction pipeline ([[graft.ops.Multimodal]]). The stub
  * decoder derives features from raw bytes, so even the mapPartitions
  * path is oracle-checkable (md5/byte arithmetic match any engine).
  */
object MultimodalQueries {

  /** Metadata projection over the packed binary column — queries that
    * only touch metadata never read the payload bytes. */
  private val binaryMeta = Q(
    "mm_binary_meta",
    """SELECT doc_id, octet_length(encode(text)) AS n_bytes, 'text/plain' AS mime
      |FROM documents""".stripMargin,
  ) { (s, d) =>
    Multimodal
      .packDocuments(documents(s, d))
      .select(col("doc_id"), col("meta.n_bytes").as("n_bytes"), col("meta.mime").as("mime"))
  }

  /** Batched (mapPartitions) feature extraction over binary payloads —
    * the stub decode emits byte-derived features the oracle reproduces
    * with plain SQL. */
  private val features = Q(
    "mm_features",
    """SELECT doc_id, octet_length(encode(text)) AS n_bytes,
      |  ascii(substr(text, 1, 1)) AS head_byte, md5(text) AS checksum
      |FROM documents""".stripMargin,
  ) { (s, d) =>
    Multimodal
      .extractFeatures(Multimodal.packDocuments(documents(s, d)))
      .toDF()
  }

  /** Binary-payload exact dedup ([[Multimodal.dedupBinary]]): the
    * packed corpus unioned with a re-id'd copy of itself — every
    * payload has exactly one planted duplicate; the original (smaller
    * id) must be the keep. */
  private val dedupBinary = Q(
    "mm_dedup_binary",
    """SELECT md5(text) AS checksum, min(doc_id) AS keep_id, count(*) AS n_copies
      |FROM (SELECT doc_id, text FROM documents
      |      UNION ALL SELECT doc_id + 100000 AS doc_id, text FROM documents)
      |GROUP BY 1""".stripMargin,
  ) { (s, d) =>
    val media = Multimodal.packDocuments(documents(s, d))
    val copies = media.withColumn("doc_id", col("doc_id") + 100000)
    Multimodal.dedupBinary(media.unionAll(copies), "doc_id", "content")
  }

  /** Frame sampling over the binary payload
    * ([[Multimodal.frameSample]]): 4 evenly spaced 16-byte slices per
    * payload, one output row per (doc, frame index), frames base64'd
    * so the compare is string-typed. The deterministic byte-slice
    * stand-in for video frame extraction — what the gate pins is the
    * slicing arithmetic and batch shape a real codec would feed.
    * (DuckDB 1.0 cannot substring a BLOB, so the oracle slices the
    * VARCHAR and encodes the slice — byte-identical here because the
    * corpus is pure ASCII, asserted: octet_length(encode(text)) ==
    * length(text) for every row at both gate SFs.) */
  private val frameSampleQ = Q(
    "mm_frame_sample",
    """SELECT doc_id, i AS frame_idx,
      |  to_base64(encode(substring(text, 1 + i * greatest(length(text) // 4, 1), 16))) AS frame_b64
      |FROM documents, (SELECT unnest(generate_series(0, 3)) AS i)""".stripMargin,
  ) { (s, d) =>
    Multimodal
      .packDocuments(documents(s, d))
      .select(
        col("doc_id"),
        posexplode(Multimodal.frameSample(col("content"), n = 4, frameBytes = 16))
          .as(Seq("frame_idx", "frame")),
      )
      .select(col("doc_id"), col("frame_idx"), base64(col("frame")).as("frame_b64"))
  }

  /** ViT-style patch grid ([[Multimodal.patchGrid]]): the payload as
    * 32-byte raster rows tiled into complete 16×16 patches — grid
    * coordinates, pixel box, byte offset per patch, the coordinate
    * plan a vision tokenizer feeds its decode kernel. Clipping (only
    * fully-backed patches) and the empty-payload case are part of the
    * differential. */
  private val patchGridQ = Q(
    "mm_patch_grid",
    """SELECT doc_id, CAST(i AS INT) AS patch_id,
      |  CAST(i % 2 AS INT) AS px, CAST(i // 2 AS INT) AS py,
      |  CAST((i % 2) * 16 AS INT) AS x0, CAST((i // 2) * 16 AS INT) AS y0,
      |  CAST((i // 2) * 16 * 32 + (i % 2) * 16 AS BIGINT) AS byte_offset
      |FROM (SELECT doc_id, octet_length(encode(text)) // 32 // 16 * 2 AS np FROM documents) d,
      |     unnest(generate_series(0, np - 1)) AS t(i)""".stripMargin,
  ) { (s, d) =>
    Multimodal
      .packDocuments(documents(s, d))
      .select(
        col("doc_id"),
        explode(Multimodal.patchGrid(col("content"), rowBytes = 32, patchW = 16, patchH = 16))
          .as("p"),
      )
      .select(
        col("doc_id"),
        col("p.patch_id").as("patch_id"),
        col("p.px").as("px"),
        col("p.py").as("py"),
        col("p.x0").as("x0"),
        col("p.y0").as("y0"),
        col("p.byte_offset").as("byte_offset"),
      )
  }

  /** Windowed audio-style energy ([[Multimodal.audioWindowEnergy]]):
    * the payload as a mono sample stream, 256-sample windows, integer
    * Σ s² per window through the batched mapPartitions decoder. The
    * oracle replays the byte arithmetic per position (pure-ASCII
    * corpus ⇒ byte == codepoint) and must match bit-for-bit — the
    * whole flatMap-shaped decode path (one media row → many feature
    * rows) is differentially checked, not just row counts. */
  private val audioWindows = Q(
    "mm_audio_windows",
    """WITH b AS (
      |  SELECT doc_id, CAST((i - 1) // 256 AS INT) AS window_id,
      |    ascii(substr(text, CAST(i AS INT), 1)) AS v
      |  FROM documents, unnest(generate_series(1, octet_length(encode(text)))) AS t(i))
      |SELECT doc_id, window_id, CAST(count(*) AS INT) AS n_samples,
      |  CAST(sum(v * v) AS BIGINT) AS energy
      |FROM b GROUP BY 1, 2""".stripMargin,
  ) { (s, d) =>
    Multimodal.audioWindowEnergy(Multimodal.packDocuments(documents(s, d)))
  }

  /** Perceptual-hash dedup groups ([[Multimodal.phashGroups]]): the
    * aHash signature (16 mean-thresholded cell energies over the
    * decoded byte grid) grouped exactly — the robustness step above
    * byte-identical `mm_dedup_binary`. The oracle replays the byte
    * arithmetic (`ascii(substr(...))`, pure-ASCII corpus), the
    * per-doc mean threshold, and the bit assembly. */
  private val phashGroupsQ = Q(
    "mm_phash_groups",
    """WITH b AS (
      |  SELECT doc_id, CAST((i - 1) // 64 AS INT) AS w,
      |    ascii(substr(text, CAST(i AS INT), 1)) AS v
      |  FROM documents, unnest(generate_series(1, octet_length(encode(text)))) AS t(i)),
      |cell AS (
      |  SELECT doc_id, w, CAST(sum(v * v) AS BIGINT) AS e
      |  FROM b WHERE w < 16 GROUP BY 1, 2),
      |st AS (
      |  SELECT doc_id, w, e, sum(e) OVER (PARTITION BY doc_id) AS tot,
      |         count(*) OVER (PARTITION BY doc_id) AS n
      |  FROM cell),
      |ph AS (
      |  SELECT doc_id,
      |    CAST(sum(CASE WHEN e * n > tot THEN (CAST(1 AS BIGINT) << w) ELSE 0 END)
      |      AS BIGINT) AS phash
      |  FROM st GROUP BY 1)
      |SELECT phash, min(doc_id) AS keep_id, count(*) AS n_docs FROM ph GROUP BY 1""".stripMargin,
  ) { (s, d) =>
    Multimodal.phashGroups(Multimodal.packDocuments(documents(s, d)))
  }

  /** Near-duplicate perceptual-hash pairs
    * ([[Multimodal.phashNearPairs]]): SimHash-style pigeonhole banding
    * over the 16-bit aHash (4 bands of 4 — complete for Hamming ≤ 3)
    * plus the exact `bit_count(xor)` verify. The oracle replays hash
    * build, band split, candidate join, and distance. */
  private val phashNearQ = Q(
    "mm_phash_near",
    """WITH b AS (
      |  SELECT doc_id, CAST((i - 1) // 64 AS INT) AS w,
      |    ascii(substr(text, CAST(i AS INT), 1)) AS v
      |  FROM documents, unnest(generate_series(1, octet_length(encode(text)))) AS t(i)),
      |cell AS (
      |  SELECT doc_id, w, CAST(sum(v * v) AS BIGINT) AS e
      |  FROM b WHERE w < 16 GROUP BY 1, 2),
      |st AS (
      |  SELECT doc_id, w, e, sum(e) OVER (PARTITION BY doc_id) AS tot,
      |         count(*) OVER (PARTITION BY doc_id) AS n
      |  FROM cell),
      |ph AS (
      |  SELECT doc_id,
      |    CAST(sum(CASE WHEN e * n > tot THEN (CAST(1 AS BIGINT) << w) ELSE 0 END)
      |      AS BIGINT) AS phash
      |  FROM st GROUP BY 1),
      |banded AS (
      |  SELECT doc_id, g.band, (phash >> (g.band * 4)) & 15 AS bval
      |  FROM ph, (SELECT unnest(generate_series(0, 3)) AS band) g),
      |cand AS (
      |  SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
      |  FROM banded a JOIN banded b
      |    ON a.band = b.band AND a.bval = b.bval AND a.doc_id < b.doc_id)
      |SELECT c.a_id, c.b_id,
      |  CAST(bit_count(xor(pa.phash, pb.phash)) AS BIGINT) AS hamming
      |FROM cand c JOIN ph pa ON pa.doc_id = c.a_id JOIN ph pb ON pb.doc_id = c.b_id
      |WHERE bit_count(xor(pa.phash, pb.phash)) <= 3""".stripMargin,
  ) { (s, d) =>
    Multimodal.phashNearPairs(Multimodal.packDocuments(documents(s, d)))
  }

  /** Production twin of `mm_phash_near`: a 48-bit signature (48 cells
    * of 8 bytes — sized so the median payload fills most of the hash,
    * where the 16×64 demo config leaves most docs under 9 meaningful
    * bits and collides quadratically) with 12-bit bands. Same
    * pigeonhole + verify machinery, same exact oracle; the wide hash
    * space is what keeps the candidate set near-linear at scale. */
  private val phashNear48Q = Q(
    "mm_phash_near48",
    """WITH b AS (
      |  SELECT doc_id, CAST((i - 1) // 8 AS INT) AS w,
      |    ascii(substr(text, CAST(i AS INT), 1)) AS v
      |  FROM documents, unnest(generate_series(1, octet_length(encode(text)))) AS t(i)),
      |cell AS (
      |  SELECT doc_id, w, CAST(sum(v * v) AS BIGINT) AS e
      |  FROM b WHERE w < 48 GROUP BY 1, 2),
      |st AS (
      |  SELECT doc_id, w, e, sum(e) OVER (PARTITION BY doc_id) AS tot,
      |         count(*) OVER (PARTITION BY doc_id) AS n
      |  FROM cell),
      |ph AS (
      |  SELECT doc_id,
      |    CAST(sum(CASE WHEN e * n > tot THEN (CAST(1 AS BIGINT) << w) ELSE 0 END)
      |      AS BIGINT) AS phash
      |  FROM st GROUP BY 1),
      |banded AS (
      |  SELECT doc_id, g.band, (phash >> (g.band * 12)) & 4095 AS bval
      |  FROM ph, (SELECT unnest(generate_series(0, 3)) AS band) g),
      |cand AS (
      |  SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
      |  FROM banded a JOIN banded b
      |    ON a.band = b.band AND a.bval = b.bval AND a.doc_id < b.doc_id)
      |SELECT c.a_id, c.b_id,
      |  CAST(bit_count(xor(pa.phash, pb.phash)) AS BIGINT) AS hamming
      |FROM cand c JOIN ph pa ON pa.doc_id = c.a_id JOIN ph pb ON pb.doc_id = c.b_id
      |WHERE bit_count(xor(pa.phash, pb.phash)) <= 3""".stripMargin,
  ) { (s, d) =>
    Multimodal.phashNearPairs(
      Multimodal.packDocuments(documents(s, d)),
      cells = 48, cellBytes = 8, bands = 4, maxHamming = 3)
  }

  /** Shot-boundary (keyframe) detection over the sampled frame track:
    * a frame is a keyframe iff its content differs from the previous
    * frame's — one lag window per media row after the same
    * deterministic frame slicing as [[frameSampleQ]]. The batch shape
    * of video scene segmentation: payload bytes never shuffle (the
    * comparison runs on the 16-byte frame signatures). */
  private val keyframesQ = Q(
    "mm_keyframes",
    """WITH f AS (
      |  SELECT doc_id, i AS frame_idx,
      |    to_base64(encode(substring(text, 1 + i * greatest(length(text) // 4, 1), 16))) AS fb
      |  FROM documents, (SELECT unnest(generate_series(0, 3)) AS i)),
      |l AS (
      |  SELECT doc_id, frame_idx, fb,
      |    lag(fb) OVER (PARTITION BY doc_id ORDER BY frame_idx) AS prev
      |  FROM f)
      |SELECT doc_id, frame_idx, (prev IS NULL OR fb <> prev) AS is_keyframe FROM l""".stripMargin,
  ) { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("doc_id").orderBy("frame_idx")
    Multimodal
      .packDocuments(documents(s, d))
      .select(
        col("doc_id"),
        posexplode(Multimodal.frameSample(col("content"), n = 4, frameBytes = 16))
          .as(Seq("frame_idx", "frame")),
      )
      .withColumn("fb", base64(col("frame")))
      .withColumn("prev", lag(col("fb"), 1).over(w))
      .select(
        col("doc_id"),
        col("frame_idx"),
        (col("prev").isNull || col("fb") =!= col("prev")).as("is_keyframe"),
      )
  }

  /** Aspect-ratio bucket assignment ([[Multimodal.aspectBuckets]]) —
    * the diffusion/ViT batching planner: each image joins the ladder
    * bucket nearest its aspect ratio, nearness as the exact integer
    * `⌊|w·bh − h·bw|·10⁹ / (h·bh)⌋`, ties to the smallest bucket id.
    * Dims are synthesized deterministically from the payload (byte
    * length + md5 nibble), so the oracle replays the whole assignment;
    * the Spark side is a map-only fold over the literal ladder — no
    * explode, no shuffle. */
  private val aspectBucketsQ = Q(
    "mm_aspect_buckets",
    """WITH dims AS (
      |  SELECT doc_id,
      |    CAST(128 + octet_length(encode(text)) % 1024 AS BIGINT) AS w,
      |    CAST(128 + CAST(('0x' || substr(md5(text), 1, 4)) AS BIGINT) % 1024 AS BIGINT) AS h
      |  FROM documents),
      |lad(bid, bw, bh) AS (VALUES
      |  (0, 512, 2048), (1, 640, 1536), (2, 768, 1344), (3, 1024, 1024),
      |  (4, 1344, 768), (5, 1536, 640), (6, 2048, 512)),
      |sc AS (
      |  SELECT d.doc_id, d.w, d.h, l.bid, l.bw, l.bh,
      |    CAST((abs(d.w * l.bh - d.h * l.bw) * 1000000000) // (d.h * l.bh) AS BIGINT) AS score_e9
      |  FROM dims d CROSS JOIN lad l),
      |r AS (SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY score_e9, bid) AS rn
      |      FROM sc)
      |SELECT doc_id, w, h, bid AS bucket_id, bw AS bucket_w, bh AS bucket_h, score_e9
      |FROM r WHERE rn = 1""".stripMargin,
  ) { (s, d) =>
    val dims = documents(s, d).select(
      col("doc_id"),
      (lit(128L) + octet_length(col("text")) % 1024).cast("long").as("w"),
      (lit(128L) + conv(substring(md5(col("text")), 1, 4), 16, 10).cast("long") % 1024)
        .cast("long")
        .as("h"),
    )
    Multimodal.aspectBuckets(
      dims,
      "doc_id",
      "w",
      "h",
      ladder = Seq((512, 2048), (640, 1536), (768, 1344), (1024, 1024),
        (1344, 768), (1536, 640), (2048, 512)),
    )
  }

  val all: Seq[Q] =
    Seq(binaryMeta, features, dedupBinary, frameSampleQ, patchGridQ, audioWindows, phashGroupsQ,
      phashNearQ, phashNear48Q, keyframesQ, aspectBucketsQ)
}
