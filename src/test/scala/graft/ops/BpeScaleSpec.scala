package graft.ops

import graft.SparkTestBase
import org.scalatest.funsuite.AnyFunSuite

/** r9 verdict item 8: the BPE gates run 8 merges, but a real
  * vocabulary is 1k–32k — and [[Bpe.applyMerges]]'s original
  * expression fold builds a plan tree as DEEP as the merge list.
  * This spec (a) measures where the fold mechanism actually stops
  * being viable, (b) proves the runtime-loop mechanism handles a
  * realistic vocabulary, and (c) pins the two mechanisms
  * bit-equivalent where both run, so the mechanism switch can never
  * change tokenization.
  */
class BpeScaleSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private def docs =
    Seq(
      (1L, "low lower lowest newer newest wider widest low low newer"),
      (2L, "the quick brown fox jumps over the lazy dog the the"),
      (3L, "aaa aaaa abab ababab banana bandana"),
    ).toDF("doc_id", "text")

  /** Real merges learned from the fixture corpus, extended with inert
    * pairs (symbols that never occur) up to `n` — rank order and the
    * anchored-replace semantics are exercised by the real prefix, the
    * plan/loop SIZE by the inert tail. */
  private def mergesOf(n: Int): Seq[(String, String)] = {
    val learned = Bpe
      .learnMerges(docs, "text", numMerges = math.min(n, 8))
      .orderBy("merge_rank")
      .collect()
      .map(r => (r.getString(1), r.getString(2)))
      .toSeq
    learned ++ (learned.size until n).map(i => (s"«x$i»", s"«y$i»"))
  }

  test("loop mechanism ≡ fold mechanism where both run (60 merges)") {
    val ms   = mergesOf(60)
    val fold = Bpe.applyMergesImpl(docs, "text", ms, foldLimit = Int.MaxValue)
      .select("doc_id", "bpe_tokens").collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val loop = Bpe.applyMergesImpl(docs, "text", ms, foldLimit = 0)
      .select("doc_id", "bpe_tokens").collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(fold === loop, "mechanism switch must not change tokenization")
    assert(fold.nonEmpty && fold.forall(_._2.nonEmpty))
  }

  test("a realistic vocabulary (1000 merges) tokenizes through the runtime loop") {
    val ms = mergesOf(1000)
    assert(ms.size === 1000)
    val t0  = System.nanoTime()
    val out = Bpe.applyMerges(docs, "text", ms) // > FoldLimit -> loop mechanism
      .select("doc_id", "bpe_tokens").collect().map(r => (r.getLong(0), r.getString(1))).toMap
    val dt = (System.nanoTime() - t0) / 1e9
    info(f"1000-merge applyMerges (loop): $dt%.2f s")
    // the 8 real merges still applied exactly: spot-check one word
    val small = Bpe.applyMerges(docs, "text", ms.take(8))
      .select("doc_id", "bpe_tokens").collect().map(r => (r.getLong(0), r.getString(1))).toMap
    assert(out === small, "inert tail merges must not perturb tokenization")
    assert(dt < 60.0, f"1000-merge tokenization too slow: $dt%.1f s")
  }

  test("fold viability is stack-bound (info) and the loop is bit-equal wherever the fold runs") {
    // The fold's depth limit is ENVIRONMENT-dependent: on a fresh
    // test thread it dies with StackOverflowError at 400 merges
    // (measured solo, r10); under a warmed-up suite the same depth
    // can survive — residual stack varies by thread. That
    // non-determinism is itself the argument for the loop mechanism
    // (a plan whose viability depends on the caller's stack is not
    // shippable), so this test does NOT assert where the fold dies.
    // It asserts the invariant that makes the mechanism switch safe:
    // wherever the fold DOES run, the loop output is bit-identical.
    def tryFold(n: Int): Option[Map[Long, String]] =
      try {
        Some(
          Bpe.applyMergesImpl(docs, "text", mergesOf(n), foldLimit = Int.MaxValue)
            .select("doc_id", "bpe_tokens").collect()
            .map(r => r.getLong(0) -> r.getString(1)).toMap
        )
      } catch {
        case _: StackOverflowError => None
        case e: Throwable
            if Option(e.getMessage).exists(m =>
              m.contains("StackOverflow") || m.contains("grows beyond") || m.contains("Code of method")
            ) =>
          None
      }
    val steps = Seq(64, 400, 1000)
    val viability = steps.map { n =>
      tryFold(n) match {
        case Some(foldOut) =>
          val loopOut = Bpe.applyMergesImpl(docs, "text", mergesOf(n), foldLimit = 0)
            .select("doc_id", "bpe_tokens").collect()
            .map(r => r.getLong(0) -> r.getString(1)).toMap
          assert(loopOut === foldOut, s"mechanisms diverge at $n merges")
          s"$n=ok(bit-equal)"
        case None => s"$n=DIES(StackOverflow)"
      }
    }
    info(s"fold viability this run: ${viability.mkString(", ")}")
    assert(viability.head.endsWith("(bit-equal)"), "the FoldLimit rung itself must work on the fold")
  }
}
