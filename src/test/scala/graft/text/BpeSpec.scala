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

  test("supplementary characters survive both paths identically (no surrogate mangling)") {
    import spark.implicits._
    val emoji = "😀" // U+1F600, outside the BMP
    val vocab = Array(("lo" + emoji + "w", 3L), ("hi" + emoji, 2L), ("low", 1L))
    val local = learnLocal(vocab, 5)
    val dist = learnDistributed(spark, vocab.toSeq.toDF("word", "freq"), 5)
    assert(local === dist)
    // the emoji must appear intact as a base symbol, never as '?' (the
    // UTF-8 encoder's lone-surrogate replacement) or a half surrogate
    val merged = local.map(m => m.left + m.right).mkString
    assert(!merged.contains("?"))
    assert(local.exists(m => m.left.contains(emoji) || m.right.contains(emoji)),
      s"emoji should participate in merges: $local")
  }

  test("BpeEncodeTokens kernel matches the per-word encode, and is lossless") {
    import spark.implicits._
    import org.apache.spark.sql.GraftBridge
    import org.apache.spark.sql.functions._
    val vocab = Array(("low", 5L), ("lower", 2L), ("newest", 6L), ("widest", 3L))
    val merges = learnLocal(vocab, 6)
    val tbl = merges.sortBy(_.rank).map(m => (m.left, m.right)).toArray
    val docs = Seq((1L, "low lower"), (2L, "newest"), (3L, "")).toDF("id", "text")
    val enc = GraftBridge.column(BpeEncodeTokens(
      GraftBridge.expression(split(col("text"), "\\s+")), tbl))
    val got = docs.select(col("id"), enc.as("subwords")).collect()
      .map(r => r.getLong(0) -> r.getSeq[String](1).toSeq).toMap
    // parity with the driver-side encode, word by word
    assert(got(1L) === (Bpe.encode("low", merges) ++ Bpe.encode("lower", merges)))
    assert(got(2L) === Bpe.encode("newest", merges))
    // losslessness: stripping EOW and concatenating restores the text
    assert(got(1L).mkString.replace(EOW, "") === "lowlower")
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
    // every merged symbol must decompose to characters that actually
    // occur in the corpus tokens (plus the EOW sentinel) — a merge
    // concatenating wrong symbols or splitting the sentinel would leak
    // characters from outside the corpus alphabet
    import org.apache.spark.sql.functions._
    val alphabet = graft.queries.Tables(spark, "/root/testdata/sf0.001", "documents")
      .select(explode(TextFunctions.tokens(col("text"))).as("w"))
      .collect().flatMap(_.getString(0)).toSet
    val vocab = rows.map(r => r.getString(1) + r.getString(2))
    vocab.foreach { sym =>
      assert(sym.replace(EOW, "").forall(alphabet.contains),
        s"merged symbol '$sym' contains characters outside the corpus alphabet")
      assert(!sym.replace(EOW, "").contains("<"), "EOW must never split mid-symbol")
    }
  }
}
