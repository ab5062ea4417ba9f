package graft.text

import org.apache.spark.sql.functions._

import graft.SparkSpec

class BpeSpec extends SparkSpec {
  import Bpe._

  test("applyMerge is greedy left-to-right and boundary-safe") {
    assert(applyMerge(Seq("a", "a", "a"), "a", "a") === Seq("aa", "a"))
    assert(applyMerge(Seq("a", "b", "a", "b"), "a", "b") === Seq("ab", "ab"))
    assert(applyMerge(Seq("x"), "a", "b") === Seq("x"))
    assert(applyMerge(Seq.empty, "a", "b") === Seq.empty)
  }

  test("learn reproduces the classic Sennrich example") {
    // the canonical corpus: low x5, lower x2, newest x6, widest x3.
    // first merge must be (e, s) with freq 9 (newest 6 + widest 3),
    // then (es, t) 9, then (est, </w>) 9.
    import spark.implicits._
    val wf = Seq(("low", 5L), ("lower", 2L), ("newest", 6L), ("widest", 3L))
      .toDF("word", "freq")
    val merges = learn(spark, wf, 5)
    assert(merges.take(3).map(m => (m.left, m.right, m.pair_freq)) === Seq(
      ("e", "s", 9L), ("es", "t", 9L), ("est", EOW, 9L)))
    assert(merges.map(_.rank) === merges.indices, "ranks are dense")
    // encode with the learned table: "newest" collapses through the merges
    val enc = encode("newest", merges)
    assert(enc.contains("est</w>") || enc.exists(_.endsWith(EOW)))
    assert(enc.mkString.replace(EOW, "") === "newest", "encoding is lossless")
  }

  test("learn is deterministic on frequency ties (lexicographic)") {
    import spark.implicits._
    // every pair occurs exactly once -> pure lexicographic order decides
    val wf = Seq(("ba", 1L), ("dc", 1L)).toDF("word", "freq")
    val m1 = learn(spark, wf, 2)
    val m2 = learn(spark, wf, 2)
    assert(m1 === m2)
    // pairs: (a,</w>) (b,a) (c,</w>) (d,c), all freq 1 — (a,</w>) sorts first
    assert((m1.head.left, m1.head.right) === ("a", EOW),
      "lexicographically smallest pair wins the tie")
  }

  test("driver and distributed paths learn identical merge tables") {
    import spark.implicits._
    val wf = Seq(("low", 5L), ("lower", 2L), ("newest", 6L), ("widest", 3L))
      .toDF("word", "freq")
    val local = learnLocal(
      Array(("low", 5L), ("lower", 2L), ("newest", 6L), ("widest", 3L)), 6)
    val dist = learnDistributed(spark, wf, 6)
    assert(local === dist)
  }

  test("text_bpe gate query: merges are well-formed over the corpus") {
    val rows = graft.SparkEntry.queries("text_bpe")(spark, "/root/testdata/sf0.001")
      .orderBy("rank").collect()
    assert(rows.length === 16)
    // pair frequencies never increase as ranks advance? NOT guaranteed by
    // BPE in general (a merge can create a new frequent pair) — assert
    // the invariants that DO hold: positive freqs, dense ranks, and every
    // merged symbol decomposes back to base characters
    assert(rows.forall(_.getLong(3) > 0))
    assert(rows.map(_.getInt(0)).toSeq === (0 until 16))
    val vocab = rows.map(r => (r.getString(1) + r.getString(2)).replace(EOW, ""))
    assert(vocab.forall(_.forall(c => c.isLetterOrDigit || c.isSurrogate || !c.isWhitespace)))
  }
}
