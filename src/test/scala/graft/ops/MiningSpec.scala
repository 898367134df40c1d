package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Behavior tests for the round-10 training-data mining operators:
  * semi-hard negative mining, MMR diversified top-k, PMI/lift
  * collocations, and the group-disjoint split.
  */
class MiningSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  // Hand-placed unit-ish vectors on known angles so cosine ordering is
  // obvious: axis-aligned plus diagonals.
  private def embs = Seq(
    // id, vector, label
    (0L, Seq(1f, 0f), 0),   // query: label 0
    (1L, Seq(0.9f, 0.1f), 0), // positive, very close to q
    (2L, Seq(0.8f, 0.2f), 1), // negative, closer than the positive? cos < pos
    (3L, Seq(0f, 1f), 1),     // negative, far
    (4L, Seq(1f, 0.05f), 1),  // negative HARDER than the positive (cos > pos_best)
    (5L, Seq(-1f, 0f), 2),    // negative, opposite
  ).toDF("vec_id", "embedding", "label")

  test("semi-hard negatives exclude negatives above the positive ceiling") {
    val got = Similarity
      .semiHardNegatives(
        queries = embs.filter(col("vec_id") === 0L),
        candidates = embs,
        idCol = "vec_id",
        embCol = "embedding",
        labelCol = "label",
        k = 10,
      )
      .orderBy("rnk")
      .select("n_id")
      .as[Long]
      .collect()
      .toSeq
    // vec 4 scores ABOVE the best positive (vec 1) => excluded even
    // though it is the hardest negative; 2 then 3 then 5 rank by cosine.
    assert(got === Seq(2L, 3L, 5L))
  }

  test("semi-hard negatives fall back to plain hard when no positive exists") {
    // query label 7 matches nothing => every different-label candidate
    // is eligible, including the near-duplicate
    val q = Seq((9L, Seq(1f, 0f), 7)).toDF("vec_id", "embedding", "label")
    val got = Similarity
      .semiHardNegatives(q, embs, "vec_id", "embedding", "label", k = 2)
      .orderBy("rnk")
      .select("n_id")
      .as[Long]
      .collect()
      .toSeq
    // hardest overall: vec 0 (identical direction), then vec 4
    assert(got === Seq(0L, 4L))
  }

  test("MMR round 1 is pure relevance; later rounds trade off diversity") {
    // query along x; candidates at +25°, +30° (near-dup of the first)
    // and −60° (the other side of the query). Pure top-2 by relevance
    // takes 25° then 30°; at λ=½ the −60° candidate wins round 2:
    // cos30−cos5 ≈ −0.13 < cos60−cos85 ≈ +0.41.
    val q = Seq((100L, Seq(1f, 0f))).toDF("vec_id", "embedding")
    val cands = Seq(
      (1L, Seq(0.9063f, 0.4226f)), // +25°: most relevant
      (2L, Seq(0.8660f, 0.5f)),    // +30°: near-dup of 1
      (3L, Seq(0.5f, -0.8660f)),   // −60°: diverse
    ).toDF("vec_id", "embedding")
    val got = Similarity
      .mmrTopK(q, cands, "vec_id", "embedding", k = 2)
      .orderBy("rnk")
      .select("n_id")
      .as[Long]
      .collect()
      .toSeq
    assert(got === Seq(1L, 3L))
  }

  test("MMR emits exactly one row per query per round with distinct picks") {
    val q     = Seq((100L, Seq(1f, 0f)), (101L, Seq(0f, 1f))).toDF("vec_id", "embedding")
    val cands = embs.select("vec_id", "embedding")
    val got = Similarity
      .mmrTopK(q, cands, "vec_id", "embedding", k = 3)
      .collect()
    assert(got.length === 6) // 2 queries x 3 rounds
    val perQ = got.groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet)
    assert(perQ.values.forall(_.size == 3), "picks must be distinct per query")
  }

  test("collocations rank a planted pair above independent fillers") {
    // "spark shuffle" always co-occur; a/b/c occur widely and
    // independently. 8 docs so every count clears minCount=2.
    val docs = Seq(
      "spark shuffle a b", "spark shuffle b c", "spark shuffle c a",
      "a b c a b c", "b a c b a c", "c b a c b a",
      "spark shuffle a c", "spark shuffle b a",
    ).toDF("text")
    val top = Text
      .collocations(docs, "text", minCount = 2L, k = 3)
      .orderBy("rnk")
      .select("w1", "w2")
      .as[(String, String)]
      .collect()
      .toSeq
    assert(top.head === ("spark", "shuffle"))
  }

  test("collocations tolerate empty and single-token documents") {
    // sequence(1, size-1) DESCENDS for size<2 in Spark — the guard
    // must drop these docs from the bigram branch (oracle semantics:
    // empty generate_series), not crash element_at
    val docs = Seq("", "solo", "x y x y", "x y x y").toDF("text")
    val got = Text.collocations(docs, "text", minCount = 2L, k = 10)
    val pairs = got.select("w1", "w2").as[(String, String)].collect().toSet
    assert(pairs.contains(("x", "y")))
  }

  test("MMR is generic over the id column type (string keys)") {
    val q     = Seq(("qa", Seq(1f, 0f))).toDF("vec_id", "embedding")
    val cands = Seq(
      ("c1", Seq(0.9063f, 0.4226f)),
      ("c2", Seq(0.8660f, 0.5f)),
      ("c3", Seq(0.5f, -0.8660f)),
    ).toDF("vec_id", "embedding")
    val got = Similarity
      .mmrTopK(q, cands, "vec_id", "embedding", k = 2)
      .orderBy("rnk")
      .select("n_id")
      .as[String]
      .collect()
      .toSeq
    assert(got === Seq("c1", "c3"))
  }

  test("collocations drop pairs below minCount") {
    val docs = Seq("x y", "x y", "rare pair").toDF("text")
    val got = Text.collocations(docs, "text", minCount = 2L, k = 10)
    val pairs = got.select("w1", "w2").as[(String, String)].collect().toSet
    assert(pairs.contains(("x", "y")))
    assert(!pairs.contains(("rare", "pair")))
  }

  test("skip-gram pairs: symmetric window, edge clamping, exact counts") {
    val docs = Seq("a b c").toDF("text")
    val got = Text
      .skipGramPairs(docs, "text", window = 2)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
      .toMap
    // positions: a(1) b(2) c(3); window 2, offsets ±1 ±2 clamped:
    // a -> b, c; b -> a, c; c -> a, b — each pair once
    val expect = Map(
      ("a", "b") -> 1L, ("a", "c") -> 1L,
      ("b", "a") -> 1L, ("b", "c") -> 1L,
      ("c", "a") -> 1L, ("c", "b") -> 1L,
    )
    assert(got === expect)
    // repeated tokens multiply the count; single-token docs contribute nothing
    val got2 = Text
      .skipGramPairs(Seq("x y x", "solo").toDF("text"), "text", window = 1)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
      .toMap
    assert(got2 === Map(("x", "y") -> 2L, ("y", "x") -> 2L))
  }

  test("negative-sampling table: sublinear ^(3/4) weights, ppm shares conserve") {
    val docs = Seq("a a a a a a a a a a a a a a a a b b c").toDF("text")
    val rows = Text
      .negSamplingTable(docs, "text")
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2), r.getLong(3)))
      .toMap
    // c=16 -> 16^(3/4) = 8 exactly (sqrt(16*4)); c=1 -> 1
    assert(rows("a")._2 === 8.0)
    assert(rows("c")._2 === 1.0)
    // sublinearity: 16x the count buys only 8x the weight
    assert(rows("a")._1 === 16L && rows("a")._3 < 16L * rows("c")._3)
    assert(rows("a")._3 > rows("b")._3 && rows("b")._3 > rows("c")._3)
    // flooring shares: sum within 1e6, close to it (3 floors lose < 3 ppm)
    val tot = rows.values.map(_._3).sum
    assert(tot <= 1000000L && tot >= 1000000L - 3L, s"shares sum $tot")
  }

  test("epoch expansion: repeat copies, fractional extras, untouched defaults") {
    val df = (0 until 40)
      .map(i => (i.toLong, if (i < 20) "hot" else if (i < 30) "cold" else "rest"))
      .toDF("id", "s")
    // hot: n=20, budget 50 -> repeat 2 + frac 0.5; cold: n=10, budget 0
    // -> dropped entirely; rest: no budget -> exactly one copy
    val exp = Sampling
      .epochExpand(df, "id", "s", Map("hot" -> 50L, "cold" -> 0L))
      .groupBy("s", "epoch")
      .count()
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    assert(exp(("hot", 1L)) === 20L, "every hot row appears at epoch 1")
    assert(exp(("hot", 2L)) === 20L, "every hot row appears at epoch 2")
    val extras = exp.getOrElse(("hot", 3L), 0L)
    assert(extras > 0L && extras < 20L, s"fractional extras should be ~10, got $extras")
    assert(!exp.keys.exists(_._1 == "cold"), "budget 0 drops the stratum")
    assert(exp(("rest", 1L)) === 10L && !exp.contains(("rest", 2L)), "default is one copy")
    // deterministic under re-execution
    val again = Sampling
      .epochExpand(df.repartition(5), "id", "s", Map("hot" -> 50L, "cold" -> 0L))
      .groupBy("s", "epoch").count()
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(again === exp)
  }

  test("mean-pool embeddings: exact dimension means, partitioning-independent") {
    val chunks = Seq(
      (1L, Seq(1f, 2f, 3f)),
      (1L, Seq(3f, 2f, 1f)),
      (1L, Seq(2f, 2f, 2f)),
      (2L, Seq(5f, 0f, 0f)),
    ).toDF("doc_id", "emb")
    def pool(df: org.apache.spark.sql.DataFrame) =
      Similarity
        .meanPoolEmbeddings(df, "doc_id", "emb")
        .orderBy("doc_id")
        .collect()
        .map(r => (r.getLong(0), r.getSeq[Float](1).toList))
        .toList
    val got = pool(chunks)
    assert(got === List((1L, List(2f, 2f, 2f)), (2L, List(5f, 0f, 0f))))
    // DECIMAL sums make the mean independent of partition layout
    assert(pool(chunks.repartition(7)) === got)
  }

  test("group-disjoint split: every group lands in exactly one split") {
    val df = (0 until 200)
      .map(i => (i.toLong, s"grp${i % 23}"))
      .toDF("id", "g")
    val split = Sampling.groupDisjointSplit(df, "g", testPpm = 300000L, valPpm = 300000L)
    val perGroup = split
      .groupBy("g")
      .agg(countDistinct(col("split")).as("ns"))
      .agg(max(col("ns")))
      .as[Long]
      .head()
    assert(perGroup === 1L, "a group straddled splits")
    // with 23 groups and 30/30/40 cuts, all three splits should be hit
    val splits = split.select("split").distinct().as[String].collect().toSet
    assert(splits === Set("train", "val", "test"))
  }

  test("fuzzy decontamination drops a paraphrase but keeps a stray shared phrase") {
    // bench doc and corpus doc 1 share most 3-grams (paraphrase-level
    // overlap); corpus doc 2 shares exactly one 3-gram (a common
    // phrase) — the exact rule would kill it, Jaccard >= 0.3 keeps it.
    val bench = Seq((100L, "alpha beta gamma delta epsilon zeta eta theta"))
      .toDF("doc_id", "text")
    val corpus = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta iota"), // near-copy
      (2L, "alpha beta gamma completely different words here now"), // one shared phrase
      (3L, "nothing in common with anything at all"),
    ).toDF("doc_id", "text")
    val kept = Dedup
      .decontaminateFuzzy(corpus, bench, "doc_id", "text", n = 3, tauPpm = 300000L)
      .select("doc_id")
      .as[Long]
      .collect()
      .toSet
    assert(kept === Set(2L, 3L))
  }

  test("k-anonymity census counts violating classes, rows at risk, singletons") {
    val df = Seq(
      ("us", "a"),                                     // class size 1 (singleton)
      ("us", "b"), ("us", "b"),                        // class size 2
      ("de", "a"), ("de", "a"), ("de", "a"), ("de", "a"), ("de", "a"), // size 5
    ).toDF("nation", "seg")
    val r = Profile.kAnonymity(df, Seq("nation", "seg"), k = 3L).head()
    assert(r.getAs[Long]("n_classes") === 3L)
    assert(r.getAs[Long]("violating_classes") === 2L)
    assert(r.getAs[Long]("rows_at_risk") === 3L)
    assert(r.getAs[Long]("anonymity_level") === 1L)
    assert(r.getAs[Long]("singletons") === 1L)
  }

  test("k-anonymity treats NULL as a quasi-identifier value") {
    val df = Seq(
      (Some("us"), "a"), (Some("us"), "a"),
      (None, "a"), (None, "a"), (None, "a"),
    ).toDF("nation", "seg")
    val r = Profile.kAnonymity(df, Seq("nation", "seg"), k = 3L).head()
    // two classes: (us,a) size 2 violates; (NULL,a) size 3 passes
    assert(r.getAs[Long]("n_classes") === 2L)
    assert(r.getAs[Long]("violating_classes") === 1L)
    assert(r.getAs[Long]("rows_at_risk") === 2L)
  }

  test("vocabulary census: token mass, types, hapax per stratum") {
    val docs = Seq(("s1", "a a b"), ("s2", "c")).toDF("source", "text")
    val got = Text
      .vocabStats(docs, "source", "text")
      .orderBy("stratum")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSeq
    assert(got === Seq(("s1", 3L, 2L, 1L, 500000L), ("s2", 1L, 1L, 1L, 1000000L)))
  }

  test("group-disjoint split boundaries are ppm-exact and monotone") {
    // a larger test cut's groups are a superset of a smaller one's
    val df     = (0 until 500).map(i => (i.toLong, s"g$i")).toDF("id", "g")
    def testGroups(ppm: Long): Set[String] =
      Sampling
        .groupDisjointSplit(df, "g", testPpm = ppm, valPpm = 0L)
        .filter(col("split") === "test")
        .select("g")
        .as[String]
        .collect()
        .toSet
    val small = testGroups(100000L)
    val large = testGroups(300000L)
    assert(small.subsetOf(large), "test split not subset-monotone in the cut")
  }

  test("perturbNames: deterministic, one of three edits, suffix tokens untouched") {
    val ents = Seq((1L, "alpha beta Brand#1 TYPE"), (2L, "gamma delta Brand#2 TYPE"),
      (3L, "omega phi Brand#3 TYPE")).toDF("id", "name")
    def run() = Blocking.perturbNames(ents, "id", "name")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).sortBy(_._1).toSeq
    val a = run()
    assert(a === run(), "perturbation must be deterministic across runs")
    a.zip(Seq("alpha beta", "gamma delta", "omega phi")).foreach { case ((id, nm, c), orig) =>
      assert(c >= 0 && c <= 2, s"choice out of range for $id")
      assert(nm.endsWith(" Brand#" + id + " TYPE"), s"suffix perturbed for $id: $nm")
      val Array(w1, w2) = orig.split(" ")
      val head = nm.stripSuffix(" Brand#" + id + " TYPE")
      val expected = c match {
        case 0 => s"$w2 $w1"                      // token swap
        case 1 => s"${w1.take(3)} $w2"            // abbreviation
        case _ => s"$w1 ${w2.dropRight(1)}"       // typo
      }
      assert(head === expected, s"id $id choice $c: got '$head', want '$expected'")
    }
  }

  test("curriculumOrder: pos is a permutation that round-robins buckets, easiest-first within") {
    // 7 rows, 3 buckets → sizes (ceil boundaries) 3,2,2. Difficulty
    // order by (score, id). Expected interleave: k=0 → buckets 0,1,2;
    // k=1 → 0,1,2; k=2 → bucket 0 only.
    val docs = Seq((10L, 5L), (11L, 3L), (12L, 9L), (13L, 3L), (14L, 7L), (15L, 1L), (16L, 9L))
      .toDF("doc_id", "n_chars")
    val got = Sampling
      .curriculumOrder(docs, "doc_id", "n_chars", buckets = 3)
      .collect()
      .map(r => (r.getAs[Long]("pos"), r.getAs[Long]("id"), r.getAs[Long]("bucket"),
        r.getAs[Long]("pos_in_bucket"), r.getAs[Long]("difficulty_rank")))
      .sortBy(_._1)
    assert(got.map(_._1).toSeq === (0L until 7L).toSeq, "pos must be a dense permutation")
    // difficulty order: 15(1) 11(3) 13(3) 10(5) 14(7) 12(9) 16(9) →
    // ranks 0..6; buckets (r*3) div 7: 0,0,0,1,1,2,2.
    assert(got.map(_._5).toSeq === Seq(0L, 3L, 5L, 1L, 4L, 6L, 2L),
      "interleave must take rank 0,3,5 then 1,4,6 then 2")
    assert(got.map(_._3).toSeq === Seq(0L, 1L, 2L, 0L, 1L, 2L, 0L))
    assert(got.map(_._2).toSeq === Seq(15L, 10L, 12L, 11L, 14L, 16L, 13L))
    // lexicographic (pos_in_bucket, bucket) must be strictly increasing in pos
    val lex = got.map(r => (r._4, r._3)).toSeq
    assert(lex === lex.sorted, "pos order must equal (pos_in_bucket, bucket) order")
  }

  test("curriculumOrder: arithmetic position matches a window-rank replay on an uneven corpus") {
    // 23 rows over a tiny score domain (heavy ties) across 5 buckets —
    // the closed-form Σ min(size, k) + carry must equal the plain
    // row_number-over-(k, bucket) spec.
    val docs = (1L to 23L).map(i => (i, (i * 7) % 5)).toDF("doc_id", "n_chars")
    val out = Sampling.curriculumOrder(docs, "doc_id", "n_chars", buckets = 5).collect()
    val spec = out
      .sortBy(r => (r.getAs[Long]("pos_in_bucket"), r.getAs[Long]("bucket")))
      .zipWithIndex
    spec.foreach { case (r, i) =>
      assert(r.getAs[Long]("pos") === i.toLong,
        s"row ${r.getAs[Long]("id")}: arithmetic pos ${r.getAs[Long]("pos")} != spec rank $i")
    }
  }

  test("preferencePairs: extrema pair per group, strict margin required, ties break to smallest id") {
    val docs = Seq(
      ("a", 1L, 5L), ("a", 2L, 3L), ("a", 3L, 1L),   // clean spread
      ("b", 4L, 7L), ("b", 5L, 7L),                  // no margin → dropped
      ("c", 6L, 9L), ("c", 7L, 9L), ("c", 8L, 2L),   // max tie → chosen = smallest id 6
      ("d", 9L, 4L),                                 // singleton → margin 0 → dropped
    ).toDF("g", "id", "score")
    val got = Sampling
      .preferencePairs(docs, Seq("g"), "id", "score")
      .collect()
      .map(r => r.getAs[String]("g") ->
        ((r.getAs[Long]("chosen_id"), r.getAs[Long]("rejected_id"), r.getAs[Long]("margin"),
          r.getAs[Long]("n_docs"))))
      .toMap
    assert(got.keySet === Set("a", "c"))
    assert(got("a") === ((1L, 3L, 4L, 3L)))
    assert(got("c") === ((6L, 8L, 7L, 3L)))
  }

  test("purgedFolds: counts conserve, embargo purges the boundary, test totals cover the corpus") {
    // 100 events at micros 0..99 (as timestamps), 4 folds, embargo
    // covering 5 micros... embargoHours granularity is hours, so build
    // hour-spaced data instead: 48 events one per hour over 2 days.
    val df = (0 until 48)
      .map(h => java.sql.Timestamp.valueOf(f"2024-01-0${1 + h / 24} ${h % 24}%02d:00:00"))
      .toDF("ts")
    val got = Sampling
      .purgedFolds(df, "ts", folds = 4, embargoHours = 2)
      .collect()
      .map(r => (r.getAs[Long]("fold"),
        (r.getAs[Long]("n_test"), r.getAs[Long]("n_train"), r.getAs[Long]("n_purged"))))
      .toMap
    assert(got.keySet === Set(0L, 1L, 2L, 3L))
    // every fold: 12 test rows; purge = 2 rows per open boundary
    // (strictly inside (start-emb, start) ∪ [end, end+emb) outside test)
    assert(got.values.map(_._1).toSeq.forall(_ === 12L))
    got.foreach { case (f, (t, tr, p)) =>
      assert(t + tr + p === 48L, s"fold $f must classify every row")
      val boundaries = if (f == 0L || f == 3L) 1 else 2 // edge folds purge one side only
      assert(p === 2L * boundaries, s"fold $f: expected ${2 * boundaries} purged, got $p")
    }
  }

  test("matchBest: blocking scopes candidates; argmax ties break by smallest canon id") {
    val canon = Seq((10L, "a b k1", "k1"), (11L, "a c k1", "k1"), (20L, "a b k2", "k2"))
      .toDF("id", "name", "block")
    // dirty 'a x k1' ties 333333 vs both k1 canons; only block k1 is probed
    val dirty = Seq((1L, "a x k1", "k1")).toDF("id", "name", "block")
    val got = Blocking.matchBest(dirty, canon, minSimPpm = 300000L).collect()
    assert(got.length === 1)
    val r = got.head
    assert(r.getAs[Long]("canon_id") === 10L, "tie must break by smallest canon id")
    assert(r.getAs[Long]("n_candidates") === 2L, "block k2 must never be probed")
    assert(r.getAs[Long]("sim_ppm") === 500000L) // |{a,k1}| / |{a,x,b,k1}| = 2/4
  }
}
