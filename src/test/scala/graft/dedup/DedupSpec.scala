package graft.dedup

import graft.SparkSpec

class DedupSpec extends SparkSpec {
  import org.apache.spark.sql.functions._

  private def base = "the quick brown fox jumps over the lazy dog and runs far away " +
    "while the sun sets slowly behind the tall green hills of the old country"

  private lazy val docs = {
    import spark.implicits._
    val near = base.replace("quick", "rapid") // one-token change -> near-dup
    val far = "completely different content about spark partitions shuffles and codegen " +
      "stages with nothing shared at all in any shingle of this text whatsoever here"
    Seq((0L, base), (1L, base), (2L, near), (3L, far))
      .toDF("doc_id", "text")
  }

  test("span removal: shared runs merge to maximal cut spans, intra-doc repeats both marked") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft_spanrm").toString
    val u = (0 until 10).map(i => s"u$i"); val sh = (0 until 12).map(i => s"s$i")
    val v = (0 until 10).map(i => s"v$i"); val w = (0 until 10).map(i => s"w$i")
    val a = (0 until 8).map(i => s"a$i"); val b = (0 until 6).map(i => s"b$i")
    Seq(
      // docs 0/1 share a 12-token run at token offset 10 (W=8 windows
      // fully inside it repeat; boundary-straddling windows are unique)
      (0L, (u ++ sh ++ v).mkString(" ")),
      (1L, (w ++ sh ++ w.map(_ + "x")).mkString(" ")),
      // all-unique doc: no output row at all
      (2L, (0 until 30).map(i => s"z$i").mkString(" ")),
      // intra-doc repetition: the same 8-token phrase twice in ONE doc
      // marks both occurrences as separate spans (gap > 1 keeps them apart)
      (3L, (a ++ b ++ a).mkString(" ")))
      .toDF("doc_id", "text")
      .write.parquet(s"$tmp/documents.parquet")
    val got = graft.SparkEntry.queries("dedup_span_removal")(spark, tmp)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(got === Set(
      (0L, 10L, 21L, 12L), (1L, 10L, 21L, 12L),
      (3L, 0L, 7L, 8L), (3L, 14L, 21L, 8L)))
  }

  test("exact dedup groups identical texts under min id") {
    val res = Dedup.exact(docs, "doc_id", "text").collect()
    val byKeep = res.map(r => r.getLong(1) -> r.getLong(2)).toMap
    assert(byKeep(0L) === 2L) // docs 0 and 1 collapse
    assert(res.length === 3)
  }

  test("incremental dedup: corpus recrawls dropped, within-batch dups collapse, new docs survive") {
    import spark.implicits._
    val corpus = Seq((0L, "alpha doc"), (1L, "beta doc")).toDF("doc_id", "text")
    val batch = Seq(
      (10L, "alpha doc"),  // recrawl of corpus content -> dropped
      (11L, "gamma doc"), (12L, "gamma doc"), // within-batch dup -> min id kept
      (13L, "delta doc")) // genuinely new
      .toDF("doc_id", "text")
    val res = Dedup.incremental(corpus, batch, "doc_id", "text")
      .collect().map(r => r.getLong(1) -> r.getLong(2)).toMap
    assert(res === Map(11L -> 2L, 13L -> 1L))
  }

  test("incremental dedup of an empty batch or empty corpus") {
    import spark.implicits._
    val corpus = Seq((0L, "alpha doc")).toDF("doc_id", "text")
    val empty = corpus.where(lit(false))
    assert(Dedup.incremental(corpus, empty, "doc_id", "text").count() === 0)
    // empty corpus: incremental == plain exact dedup of the batch
    val batch = Seq((5L, "x y z"), (6L, "x y z")).toDF("doc_id", "text")
    val res = Dedup.incremental(empty, batch, "doc_id", "text").collect()
    assert(res.map(r => (r.getLong(1), r.getLong(2))).toSeq === Seq((5L, 2L)))
  }

  test("incremental near-dup flags lightly-edited recrawls, not unrelated docs") {
    import spark.implicits._
    val far = "completely different content about spark partitions shuffles and codegen " +
      "stages with nothing shared at all in any shingle of this text whatsoever here"
    val corpus = Seq((0L, base), (1L, far)).toDF("doc_id", "text")
    val batch = Seq(
      (10L, base.replace("quick", "rapid")), // one-token edit of corpus doc 0
      (11L, far.replace("different", "distinct").replace("spark", "flink")
        .reverse)) // unrelated shingles
      .toDF("doc_id", "text")
    val res = Dedup.incrementalNearDup(corpus, batch, "doc_id", "text", minJaccard = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(res.map(t => (t._1, t._2)).toSet === Set((10L, 0L)),
      s"expected exactly the edited recrawl pair, got ${res.mkString(",")}")
    assert(res.head._3 >= 0.5 && res.head._3 < 1.0)
  }

  test("winnow pairing surfaces partial overlap that whole-doc hashing misses") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    import graft.text.TextFunctions._
    // two docs sharing ONLY a 12-token quoted run (plus unrelated halves)
    val quote = "to be or not to be that is the question we ask"
    val d = Seq(
      (0L, s"opening words before anything else $quote"),
      (1L, s"$quote and then entirely different closing material follows here"),
      (2L, "unrelated third document about morning coffee and newspaper reading"))
      .toDF("doc_id", "text")
    val fp = d
      .withColumn("hs", shingleHashes15(tokens(col("text")), 3))
      .select(col("doc_id"), explode(winnowSelect(col("hs"), 4)).as("fp"))
    val pairs = fp.select(col("fp"), col("doc_id").as("a_id"))
      .join(fp.select(col("fp"), col("doc_id").as("b_id")), Seq("fp"))
      .where(col("a_id") < col("b_id"))
      .groupBy("a_id", "b_id").agg(count(lit(1)).as("n_shared"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(pairs.getOrElse((0L, 1L), 0L) >= 2L,
      s"quote-sharing docs must share >= 2 fingerprints, got $pairs")
    assert(!pairs.contains((0L, 2L)) && !pairs.contains((1L, 2L)),
      s"unrelated doc must not pair: $pairs")
    // whole-doc hashing sees three distinct docs — the contrast
    assert(d.select(md5(col("text"))).distinct().count() === 3)
  }

  test("minhash LSH finds planted near-duplicates, not unrelated docs") {
    val cands = Dedup.minhashCandidates(docs, "doc_id", "text", numHashes = 64, bands = 32)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(cands.contains((0L, 1L)))
    assert(cands.contains((0L, 2L)) || cands.contains((1L, 2L)))
    assert(!cands.exists { case (a, b) => b == 3L || a == 3L })
  }

  test("simhash finds near-duplicates within hamming radius") {
    val cands = Dedup.simhashCandidates(docs, "doc_id", "text", maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(cands.contains((0L, 1L))) // identical -> hamming 0
    assert(!cands.exists { case (a, b) => b == 3L })
  }

  test("ngram jaccard: identical=1.0, near-dup high, unrelated 0") {
    import spark.implicits._
    val pairs = Seq((0L, 1L), (0L, 2L), (0L, 3L)).toDF("a_id", "b_id")
    val j = Dedup.ngramJaccard(docs, "doc_id", "text", pairs)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(j((0L, 1L)) === 1.0)
    assert(j((0L, 2L)) > 0.5 && j((0L, 2L)) < 1.0)
    assert(j((0L, 3L)) === 0.0)
  }

  test("containment: a quoted subset scores 1.0 where jaccard dilutes") {
    import spark.implicits._
    // doc 5 is doc 4 QUOTED inside a much larger doc: containment must
    // say 1.0 while jaccard is diluted by the container's extra text
    val snippet = "alpha beta gamma delta epsilon zeta eta theta"
    val container = base + " " + snippet + " " + base.replace("quick", "swift")
    val d = Seq((4L, snippet), (5L, container), (6L, base)).toDF("doc_id", "text")
    val c = Dedup.containmentWindow(d, "doc_id", "text", window = 25, shingleSize = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(c((4L, 5L)) === 1.0, s"subset should be fully contained: $c")
    val j = Dedup.ngramJaccardWindow(d, "doc_id", "text", window = 25, shingleSize = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(j((4L, 5L)) < 0.5, "jaccard should be diluted by the container")
    // overlap coefficient dominates jaccard on every pair
    j.keys.foreach(k => assert(c(k) >= j(k) - 1e-12, s"pair $k: c=${c(k)} j=${j(k)}"))
  }

  test("dedup_df_profile: buckets are bit-lengths, shingle mass reconciles") {
    val sf = "/root/testdata/sf0.01"
    val rows = graft.SparkEntry.queries("dedup_df_profile")(spark, sf).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    assert(rows.nonEmpty)
    rows.foreach { case (b, _, maxDf) =>
      assert(64 - java.lang.Long.numberOfLeadingZeros(maxDf) === b,
        s"max df $maxDf outside bucket $b")
    }
    // bucket-1 mass (df = 1, unique shingles) dominates a natural corpus
    val total = rows.map(_._2).sum
    assert(rows.find(_._1 == 1).exists(_._2 > total / 2), "unique shingles should dominate")
  }

  test("dedup_impact: removals reconcile with the exact-dedup survivor count") {
    val sf = "/root/testdata/sf0.01"
    val rows = graft.SparkEntry.queries("dedup_impact")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    val total = graft.queries.Tables(spark, sf, "documents").count()
    val survivors = graft.SparkEntry.queries("dedup_exact")(spark, sf).count()
    assert(rows.map(_._2).sum === total)
    assert(rows.map(_._3).sum === total - survivors, "removed = corpus - survivors")
    rows.foreach { case (_, n, rem, toks, bytes) =>
      assert(rem <= n)
      assert((rem == 0) == (toks == 0L && bytes == 0L))
    }
  }

  test("minhash estimator audit: lane-agreement estimate tracks true jaccard") {
    val rows = graft.SparkEntry.queries("dedup_minhash_eval")(
        spark, "/root/testdata/sf0.001").collect()
      .map(r => (r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(rows.nonEmpty, "planted dups should produce candidate pairs")
    rows.foreach { case (est, tru, err) =>
      assert(est >= 0 && est <= 10000 && tru >= 0 && tru <= 10000)
      assert(err === math.abs(est - tru))
    }
    val meanErr = rows.map(_._3).sum.toDouble / rows.length
    // estimator std dev is ~1/sqrt(128) = 880bp; candidates average well inside it
    assert(meanErr <= 900.0, s"mean |est-true| = $meanErr bp")
    assert(rows.map(_._3).max <= 3 * 880, s"max error ${rows.map(_._3).max} bp")
  }

  test("connected components: chains collapse to min id, components stay separate") {
    import spark.implicits._
    // 1-2, 2-3, 3-4 chain (diameter 3, exercises multiple rounds); 10-11 separate
    val pairs = Seq((2L, 1L), (2L, 3L), (3L, 4L), (10L, 11L)).toDF("a_id", "b_id")
    val cc = Dedup.connectedComponents(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cc === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 10L -> 10L, 11L -> 10L))
  }

  test("connected components: long chain converges past the checkpoint boundary") {
    import spark.implicits._
    // a 14-edge path needs >5 propagation rounds (crosses the lineage cut);
    // localEdgeLimit=0 forces the distributed label-propagation path
    val pairs = (0L until 14L).map(i => (i, i + 1)).toDF("a_id", "b_id")
    val cc = Dedup.connectedComponents(pairs, localEdgeLimit = 0).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cc === (0L to 14L).map(_ -> 0L).toMap)
  }

  test("connected components: refusing to return unconverged labels") {
    import spark.implicits._
    val pairs = (0L until 6L).map(i => (i, i + 1)).toDF("a_id", "b_id")
    val ex = intercept[IllegalStateException](
      Dedup.connectedComponents(pairs, maxIter = 2, localEdgeLimit = 0).collect())
    assert(ex.getMessage.contains("did not converge"))
  }

  test("connected components: local union-find and distributed propagation agree") {
    import spark.implicits._
    val pairs = Seq((5L, 9L), (9L, 2L), (7L, 8L), (3L, 3L), (11L, 10L), (10L, 12L))
      .toDF("a_id", "b_id")
    val local = Dedup.connectedComponents(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val dist = Dedup.connectedComponents(pairs, localEdgeLimit = 0).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(local === dist)
    assert(local(5L) === 2L && local(12L) === 10L && local(8L) === 7L)
  }

  test("embedding near-dup honors the cosine threshold") {
    import spark.implicits._
    val embs = Seq(
      (0L, Array(1.0f, 0.0f)), (1L, Array(0.99f, 0.01f)), (2L, Array(0.0f, 1.0f)))
      .toDF("vec_id", "embedding")
    val pairs = Seq((0L, 1L), (0L, 2L)).toDF("a_id", "b_id")
    val res = Dedup.embeddingNearDup(embs, "vec_id", "embedding", pairs, maxCosineDist = 0.1)
      .collect()
    assert(res.map(r => (r.getLong(0), r.getLong(1))).toSet === Set((0L, 1L)))
  }

  test("dedup_semantic matches a driver-side SemDeDup replay (assignment + intra-cluster prune)") {
    val dir = "/root/testdata/sf0.001"
    val rows = graft.SparkEntry.queries("dedup_semantic")(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val embs = spark.read.parquet(s"$dir/embeddings.parquet").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray.map(_.toDouble)))
      .sortBy(_._1)
    val cents = embs.filter(_._1 < 8).map(_._2)
    def l2sq(a: Array[Double], b: Array[Double]) =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    def cosDist(a: Array[Double], b: Array[Double]) = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      1.0 - dot / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    val assigned = embs.map { case (id, v) =>
      (id, v, cents.zipWithIndex.minBy { case (c, i) => (l2sq(v, c), i) }._2.toLong)
    }
    val expected = assigned.groupBy(_._3).map { case (cid, members) =>
      val pruned = members.count { case (id, v, _) =>
        members.exists { case (id2, v2, _) =>
          id2 < id && BigDecimal(cosDist(v2, v)).setScale(4,
            BigDecimal.RoundingMode.HALF_UP).toDouble <= 0.65
        }
      }
      cid -> (members.length.toLong, pruned.toLong)
    }
    assert(rows === expected)
    // every vector lands in exactly one cluster
    assert(rows.values.map(_._1).sum === embs.length.toLong)
  }
}
