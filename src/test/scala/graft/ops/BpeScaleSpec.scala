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

  test("measured bound: the expression fold stops being viable far below 1000 merges") {
    // Binary evidence for the FoldLimit choice, not a benchmark: the
    // fold either dies (StackOverflowError in analysis/codegen) or
    // degrades pathologically at vocabulary scale. Probe upward until
    // failure or until 1000 works.
    def tryFold(n: Int): Boolean =
      try {
        Bpe.applyMergesImpl(docs, "text", mergesOf(n), foldLimit = Int.MaxValue)
          .select("bpe_tokens").count()
        true
      } catch {
        case _: StackOverflowError => false
        case e: Throwable
            if Option(e.getMessage).exists(m =>
              m.contains("StackOverflow") || m.contains("grows beyond") || m.contains("Code of method")
            ) =>
          false
      }
    val steps   = Seq(64, 200, 400, 700, 1000)
    val results = steps.map(n => n -> tryFold(n))
    info(s"fold viability: ${results.map { case (n, ok) => s"$n=${if (ok) "ok" else "DIES"}" }.mkString(", ")}")
    assert(results.head._2, "the FoldLimit rung itself must work on the fold")
    // the switch exists because the fold does NOT survive vocabulary
    // scale; if this ever starts passing at 1000, FoldLimit can rise
    assert(results.exists(!_._2), "expression fold unexpectedly survives 1000 merges — revisit FoldLimit")
  }
}
