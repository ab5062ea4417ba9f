package graft.text

import graft.SparkSpec

class PipelineSpec extends SparkSpec {
  import org.apache.spark.sql.functions._

  test("packSequences: per-group token budget, greedy by id order") {
    import spark.implicits._
    // lang a: 3 docs of 4 tokens -> budget 8 packs two per sequence
    val docs = Seq(
      (1L, "w w w w", "a"), (2L, "w w w w", "a"), (3L, "w w w w", "a"),
      (10L, "w w w w w w w w w w", "b")) // longer than budget: still one bin
      .toDF("doc_id", "text", "lang")
    val packed = Pipeline.packSequences(docs, "doc_id", "text", "lang", tokenBudget = 8)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(packed(1L) === 0L && packed(2L) === 0L) // 4+4 fills seq 0
    assert(packed(3L) === 1L)
    assert(packed(10L) === 0L) // oversized doc occupies its group's first bin
  }

  test("packSequences: groups pack independently") {
    import spark.implicits._
    val docs = (0L until 20L).map(i => (i, "t t t t t", if (i % 2 == 0) "x" else "y"))
      .toDF("doc_id", "text", "lang")
    val rows = Pipeline.packSequences(docs, "doc_id", "text", "lang", tokenBudget = 10)
      .collect()
    // 10 docs per lang, 5 tokens each, budget 10 -> 2 docs per sequence, 5 sequences
    rows.groupBy(_.getString(1)).foreach { case (_, rs) =>
      assert(rs.map(_.getLong(3)).distinct.sorted.toSeq === (0L until 5L))
    }
  }

  test("contamination: planted eval overlap is counted, clean docs are zero") {
    import spark.implicits._
    val docs = Seq(
      (0L, "alpha beta gamma delta epsilon zeta"), // eval
      (10L, "alpha beta gamma delta something else entirely"), // shares 3-grams with eval
      (11L, "utterly unrelated text with no shared phrases at all"))
      .toDF("doc_id", "text")
    val res = Pipeline.contamination(docs, "doc_id", "text", col("doc_id") < 10, 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(!res.contains(0L)) // eval docs excluded from output
    assert(res(10L) === 2L) // "alpha beta gamma", "beta gamma delta"
    assert(res(11L) === 0L)
  }

  test("contaminationBloom matches contamination bit-for-bit") {
    import spark.implicits._
    val docs = (
      Seq((0L, "alpha beta gamma delta epsilon zeta"),
        (1L, "the quick brown fox jumps over the lazy dog")) ++ // eval
        (10L until 60L).map(i => (i, s"filler document number $i with unique words u$i v$i w$i")) ++
        Seq((60L, "alpha beta gamma delta something else entirely"),
          (61L, "jumps over the lazy dog and keeps running"))
      ).toDF("doc_id", "text")
    val exact = Pipeline.contamination(docs, "doc_id", "text", col("doc_id") < 10, 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val bloom = Pipeline.contaminationBloom(docs, "doc_id", "text", col("doc_id") < 10, 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(bloom === exact)
    assert(bloom(60L) > 0L && bloom(61L) > 0L) // planted overlaps flagged
    assert(bloom(10L) === 0L)
  }

  test("contaminationBloom: empty eval set flags nothing, returns all zeros") {
    import spark.implicits._
    val docs = (10L until 20L).map(i => (i, s"doc number $i with words w$i x$i y$i z$i"))
      .toDF("doc_id", "text")
    // predicate selects NO eval docs: the Bloom is empty, every train
    // doc must survive with n_overlap = 0 (and nothing throws)
    val res = Pipeline.contaminationBloom(docs, "doc_id", "text", col("doc_id") < 0, 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(res.keySet === (10L until 20L).toSet)
    assert(res.values.forall(_ === 0L))
  }

  test("bloomHitCount: zero for misses, counts multiset hits") {
    import spark.implicits._
    val members = spark.range(0, 100).select(col("id"))
    val bf = members.stat.bloomFilter("id", 100, 0.001)
    val got = Seq(
      (1L, Seq(5L, 5L, 99L)), // 3 hits incl. duplicate
      (2L, Seq(1000000L, 2000000L)), // misses (fpp 1e-3 on 2 probes)
      (3L, Seq.empty[Long]))
      .toDF("id", "hs")
      .select(col("id"), graft.functions.hashes.bloomHitCount(col("hs"), bf).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got(1L) === 3L)
    assert(got(2L) === 0L)
    assert(got(3L) === 0L)
  }

  test("topShingleRatio matches the explode+group-by definition") {
    import spark.implicits._
    val docs = Seq(
      (0L, "a b a b a b"), // bigrams: ab ba ab ba ab -> top "a b" 3/5
      (1L, "x y z w"), // all distinct -> 1/3
      (2L, "r r r r")) // "r r" x3 -> 3/3
      .toDF("doc_id", "text")
    val got = docs.select(col("doc_id"),
        TextFunctions.topShingleRatio(TextFunctions.tokens(col("text")), 2).as("r"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got(0L) === 3.0 / 5.0)
    assert(got(1L) === 1.0 / 3.0)
    assert(got(2L) === 1.0)
  }
}
