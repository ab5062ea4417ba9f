package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Invariant checks for BM25 / hybrid-RRF retrieval and span dedup
  * (value-level correctness is DuckDB-oracle-gated; these pin the
  * semantics a refactor could silently break). */
class RetrievalQueriesSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private def run(q: String) = graft.SparkEntry.queries(q)(spark, dir)

  test("text_bm25: scores positive, sorted output unique, rarity rewarded") {
    val rows = run("text_bm25").collect()
    assert(rows.nonEmpty && rows.length <= 20)
    assert(rows.map(_.getLong(0)).distinct.length === rows.length)
    rows.foreach(r => assert(r.getDouble(1) > 0.0))
    // every returned doc actually contains at least one query term
    val hits = Tables(spark, dir, "documents")
      .where(RetrievalQueries.Terms
        .map(t => array_contains(split(lower(trim(col("text"))), "\\s+"), t))
        .reduce(_ || _))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    rows.foreach(r => assert(hits.contains(r.getLong(0))))
  }

  test("text_bm25: a doc with more occurrences of the rare term outranks sparser docs of equal length") {
    // construct a controlled corpus: identical lengths, tf of 'dup' varies
    val docs = Seq(
      (1L, "dup dup dup pad pad pad", "en", "s", 23L),
      (2L, "dup dup pad pad pad pad", "en", "s", 23L),
      (3L, "dup pad pad pad pad pad", "en", "s", 23L),
      (4L, "pad pad pad pad pad pad", "en", "s", 23L))
    val tmp = java.nio.file.Files.createTempDirectory("bm25spec").toString
    spark.createDataFrame(docs).toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    // embeddings table unused by text_bm25 but Tables.wide only reads documents
    val got = graft.SparkEntry.queries("text_bm25")(spark, tmp).collect()
    val order = got.sortBy(-_.getDouble(1)).map(_.getLong(0)).toSeq
    assert(order.take(3) === Seq(1L, 2L, 3L), s"got $order")
  }

  test("hybrid_rrf: fused score equals 1/(60+r_kw) + 1/(60+r_vec) with 0 for absent sides") {
    val rows = run("hybrid_rrf").collect()
    assert(rows.nonEmpty && rows.length <= 20)
    rows.foreach { r =>
      val (kw, vec, s) = (r.getLong(1), r.getLong(2), r.getDouble(3))
      val expect = (if (kw > 0) 1.0 / (60.0 + kw) else 0.0) +
        (if (vec > 0) 1.0 / (60.0 + vec) else 0.0)
      assert(math.abs(s - expect) < 1e-8, s"doc ${r.getLong(0)}")
      assert(kw > 0 || vec > 0)
    }
    // fusion actually fuses: a doc ranked on BOTH sides beats the same
    // single-side rank (1/(60+r) monotone in participation)
    val both = rows.filter(r => r.getLong(1) > 0 && r.getLong(2) > 0)
    assert(both.nonEmpty, "at least one doc ranked by both modalities")
  }

  test("dedup_spans: exact duplicate docs have dup_frac 1.0, unique text 0.0") {
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta", "en", "s", 35L),
      (2L, "alpha beta gamma delta epsilon zeta", "en", "s", 35L), // exact dup of 1
      (3L, "one two three four five six seven", "en", "s", 33L), // unique
      (4L, "tiny doc", "en", "s", 8L)) // under span length
    val tmp = java.nio.file.Files.createTempDirectory("spanspec").toString
    spark.createDataFrame(docs).toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val got = graft.SparkEntry.queries("dedup_spans")(spark, tmp)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(got(1L)._3 === 1.0)
    assert(got(2L)._3 === 1.0)
    assert(got(3L)._3 === 0.0)
    assert(got(4L) === ((0L, 0L, 0.0)), "short doc: zero spans, zero frac")
    assert(got(1L)._1 === 3L, "6 tokens -> 3 distinct 4-gram spans")
  }
}
