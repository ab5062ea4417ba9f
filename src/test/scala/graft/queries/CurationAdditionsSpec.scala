package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.VectorMath
import graft.text.TextFunctions

/** Invariant checks for the round-5 additions (text_chunk, knn_hamming,
  * sample_quota, events_top_paths); value-level correctness is
  * DuckDB-oracle-gated, these pin semantics a refactor could break. */
class CurationAdditionsSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private def run(q: String) = graft.SparkEntry.queries(q)(spark, dir)

  test("text_chunk: dense chunk ids, full windows except the tail, overlap reconstructs the doc") {
    val chunks = run("text_chunk")
      .select(col("doc_id"), col("chunk_idx"), col("chunk_text"))
      .collect()
      .groupBy(_.getLong(0))
      .map { case (id, rs) =>
        id -> rs.sortBy(_.getInt(1)).map(_.getString(2).split(" ").toSeq)
      }
    val toks = Tables(spark, dir, "documents")
      .select(col("doc_id"), TextFunctions.tokens(col("text")).as("t"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(chunks.nonEmpty && chunks.keySet === toks.keySet)
    chunks.foreach { case (id, cs) =>
      cs.init.foreach(c => assert(c.length === 64, s"non-tail chunk short for doc $id"))
      assert(cs.last.length <= 64)
      // stride 48 / window 64 => every chunk after the first re-covers
      // exactly the previous chunk's final 16 tokens
      val rebuilt = cs.head ++ cs.tail.flatMap(_.drop(16))
      assert(rebuilt === toks(id), s"overlap reconstruction failed for doc $id")
    }
  }

  test("signBits kernel: bit i tracks v(i) >= 0, Hamming via XOR/popcount matches sign mismatches") {
    def bits(v: Array[Float]): Long =
      VectorMath.signBits(new org.apache.spark.sql.catalyst.util.GenericArrayData(v))
    val a = Array(1.0f, -2.0f, 0.0f, -0.0f, Float.NaN, 3.5f)
    assert(bits(a) === ((1L << 0) | (1L << 2) | (1L << 3) | (1L << 5)), "-0.0 counts as >= 0, NaN does not")
    val rnd = new scala.util.Random(7)
    val v1 = Array.fill(64)(rnd.nextFloat() - 0.5f)
    val v2 = Array.fill(64)(rnd.nextFloat() - 0.5f)
    val expected = v1.indices.count(i => (v1(i) >= 0) != (v2(i) >= 0))
    assert(java.lang.Long.bitCount(bits(v1) ^ bits(v2)) === expected)
  }

  test("knn_hamming: rank 0 is the query itself at distance 0, distances bounded and ascending") {
    val rows = run("knn_hamming").collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getLong(0)).foreach { case (qid, rs) =>
      val sorted = rs.sortBy(_.getInt(1))
      assert(sorted.head.getLong(2) === qid && sorted.head.getLong(3) === 0L)
      val ds = sorted.map(_.getLong(3))
      assert(ds.forall(d => d >= 0 && d <= 64))
      assert(ds === ds.sorted)
    }
  }

  test("knn_binary_rerank: exact self-hit at rank 0, recall@5 >= 0.7 vs the exact scan") {
    val approx = run("knn_binary_rerank").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    approx.filter(_._2 == 0).foreach { case (qid, _, label) => assert(label === qid) }
    val exact = run("knn_flat_l2").collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    val hits = approx.count { case (qid, _, label) => exact((qid, label)) }
    val recall = hits.toDouble / exact.size
    assert(recall >= 0.7, f"recall@5 = $recall%.2f")
  }

  test("knn_binary_ivf: exhaustive probe equals brute-force Hamming; partial probe recalls") {
    // nprobe = nlist scans every list — must equal the flat Hamming scan
    val full = VectorQueries.binaryIvf(spark, dir, nlist = 16, nprobe = 16).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3))).sorted
    val flat = run("knn_hamming").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3))).sorted
    assert(full === flat, "exhaustive binary IVF diverges from the flat Hamming scan")
    // partial probe: bounded result shape + useful recall vs the flat scan
    val part = run("knn_binary_ivf").collect()
      .map(r => (r.getLong(0), r.getLong(2)))
    assert(part.nonEmpty)
    val exact = flat.map(t => (t._1, t._3)).toSet
    val recall = part.count(exact).toDouble / exact.size
    assert(recall >= 0.5, f"recall@5 at nprobe=4 = $recall%.2f")
  }

  test("text_token_lengths + docs_profile: masses and distincts reconcile") {
    import org.apache.spark.sql.functions.col
    val hist = run("text_token_lengths").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    assert(hist.nonEmpty && hist.forall(_._1 > 0))
    val totalToks = Tables(spark, dir, "documents")
      .select(org.apache.spark.sql.functions.size(
        graft.text.TextFunctions.tokens(col("text"))).cast("long").as("n"))
      .agg(org.apache.spark.sql.functions.sum("n")).head.getLong(0)
    assert(hist.map(_._2).sum === totalToks)
    assert(hist.map(_._3).sum <= 10000L)
    val prof = run("docs_profile").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(prof.keySet === Set("text", "lang", "source"))
    assert(prof("lang")._3 <= 10 && prof("lang")._1 === 0L)
    assert(prof("text")._3 <= Tables(spark, dir, "documents").count())
  }

  test("text_vocab_growth: both curves monotone, vocab growth decelerates vs tokens") {
    val rows = run("text_vocab_growth").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(rows.map(_._1).toSeq === (1 to 10))
    val toks = rows.map(_._2)
    val vocab = rows.map(_._3)
    assert(toks.toSeq === toks.sorted.toSeq && vocab.toSeq === vocab.sorted.toSeq)
    assert(vocab.last <= toks.last, "vocab can't exceed token occurrences")
    // Heaps: vocab grows sublinearly — final vocab/token ratio below the first
    val r1 = vocab.head.toDouble / toks.head
    val r10 = vocab.last.toDouble / toks.last
    assert(r10 <= r1 + 1e-9, s"vocab ratio should fall: $r1 -> $r10")
  }

  test("docs_source_quality: counts cover, reject rate replays the 0.6 gate") {
    import org.apache.spark.sql.functions.col
    val rows = run("docs_source_quality").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3), r.getLong(4)))
    val total = Tables(spark, dir, "documents").count()
    assert(rows.map(_._2).sum === total)
    val quality = Tables(spark, dir, "documents")
      .select(col("source"), graft.text.TextFunctions.qualityScore(col("text")).as("q"))
      .collect().map(r => (r.getString(0), r.getDouble(1)))
    rows.foreach { case (src, n, meanQfp, p50, rejBp) =>
      val qs = quality.filter(_._1 == src).map(_._2)
      assert(qs.length.toLong === n)
      val rejects = qs.count(q => math.floor(q * 10000 + 0.5) < 6000)
      assert(rejBp === rejects.toLong * 10000L / n, s"$src reject rate")
      assert(meanQfp >= 0 && meanQfp <= 10000 && p50 >= 0 && p50 <= 10000)
    }
  }

  test("text_lang_confusion: cells reconcile to langid rows, shares sum per label") {
    val cells = run("text_lang_confusion").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(cells.nonEmpty)
    val preds = run("text_langid").collect()
      .map(r => (r.getString(2), r.getString(1)))
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    cells.foreach { case (t, p, n, _) =>
      assert(preds((t, p)) === n, s"cell ($t,$p) count drifted")
    }
    cells.groupBy(_._1).foreach { case (t, rs) =>
      val s2 = rs.map(_._4).sum
      assert(s2 <= 10000L && s2 > 10000L - rs.length, s"share sum $s2 for $t")
    }
  }

  test("text_ngram_novelty: first doc fully novel, later exact copies score zero") {
    val rows = run("text_ngram_novelty").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty)
    rows.foreach { case (_, ns, nn, bp) =>
      assert(nn >= 0 && nn <= ns)
      assert(bp === nn * 10000L / ns)
    }
    val byId = rows.map(r => r._1 -> r._4).toMap
    assert(byId(rows.map(_._1).min) === 10000L, "the earliest doc must be fully novel")
    // exact duplicate pairs exist in testdata: the LATER copy has novelty 0
    import org.apache.spark.sql.functions.{col, md5, min => smin, count => scount, lit}
    val dups = Tables(spark, dir, "documents")
      .groupBy(md5(col("text"))).agg(
        smin(col("doc_id")).as("first"), scount(lit(1)).as("n"),
        org.apache.spark.sql.functions.max(col("doc_id")).as("last"))
      .where(col("n") > 1).collect()
    // sf0.001 has no planted dup pairs; where they exist the later copy
    // must be 0-novel
    dups.foreach { r =>
      val later = r.getLong(2)
      if (byId.contains(later)) assert(byId(later) === 0L, s"dup copy $later not 0-novel")
    }
  }

  test("sample_curriculum: stages order by quality, positions dense, corpus covered") {
    val rows = run("sample_curriculum").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getLong(3)))
    val n = Tables(spark, dir, "documents").count()
    assert(rows.length.toLong === n, "every doc gets a curriculum slot")
    rows.groupBy(_._2).foreach { case (_, rs) =>
      assert(rs.map(_._3).sorted.toSeq === (1 to rs.length), "positions not dense")
    }
    // min quality of an earlier stage >= max quality of a later stage
    val byStage = rows.groupBy(_._2).view.mapValues(rs => (rs.map(_._4).min, rs.map(_._4).max))
    for (s1 <- 1 to 3; s2 <- (s1 + 1) to 4
         if byStage.contains(s1) && byStage.contains(s2)) {
      assert(byStage(s1)._1 >= byStage(s2)._2,
        s"stage $s1 min ${byStage(s1)._1} < stage $s2 max ${byStage(s2)._2}")
    }
  }

  test("text_compressibility: sizes replay through the JDK deflater, repetition compresses harder") {
    val rows = run("text_compressibility").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getLong(3)))
    assert(rows.nonEmpty)
    def deflate(s: String): Int = {
      val d = new java.util.zip.Deflater(java.util.zip.Deflater.DEFAULT_COMPRESSION, true)
      try {
        d.setInput(s.getBytes("UTF-8")); d.finish()
        val buf = new Array[Byte](8192); var n = 0
        while (!d.finished()) n += d.deflate(buf)
        n
      } finally d.end()
    }
    val texts = Tables(spark, dir, "documents").select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    rows.foreach { case (id, nb, nd, bp) =>
      assert(nb === texts(id).getBytes("UTF-8").length)
      assert(nd === deflate(texts(id)), s"doc $id deflate size drifted")
      assert(bp === nd.toLong * 10000L / nb)
    }
    // a pathologically repetitive text must compress far below prose
    val spam = "spam " * 200
    val prose = texts.values.maxBy(_.length)
    val spamBp = deflate(spam).toLong * 10000 / spam.getBytes("UTF-8").length
    val proseBp = deflate(prose).toLong * 10000 / prose.getBytes("UTF-8").length
    assert(spamBp < proseBp / 2,
      s"repetition should compress much harder: spam=$spamBp prose=$proseBp")
  }

  test("text_keywords: 3 ranked keywords per doc, rare terms outrank stopwords") {
    val rows = run("text_keywords").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2), r.getLong(3)))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (id, ks) =>
      val ranked = ks.sortBy(_._2)
      assert(ranked.map(_._2).toSeq === (1 to ranked.length), s"ranks not dense for doc $id")
      assert(ranked.length <= 3)
      // scores weakly decrease down the ranks
      assert(ranked.map(_._4).toSeq === ranked.map(_._4).sorted.reverse.toSeq)
    }
    // a corpus-wide stopword (max df) should essentially never be a top keyword
    val topTok = run("text_topterms").collect().head.getString(0)
    val stopHits = rows.count(_._3 == topTok)
    assert(stopHits <= rows.length / 20, s"stopword '$topTok' keyworded $stopHits times")
  }

  test("text_readability: every doc scored, counts sane, formula replays") {
    val rows = run("text_readability").collect()
    val n = Tables(spark, dir, "documents").count()
    assert(rows.length.toLong === n, "every non-empty doc gets a score")
    rows.foreach { r =>
      val (w, s2, syl, f) = (r.getInt(1), r.getInt(2), r.getInt(3), r.getDouble(4))
      assert(w > 0 && s2 >= 1 && syl >= 0)
      val expect = (206835L * s2 * w - 1015L * w.toLong * w - 84600L * syl * s2).toDouble /
        (1000L * s2 * w).toDouble
      val q4 = BigDecimal(expect).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(f === q4, s"doc ${r.getLong(0)}: $f vs $q4")
    }
  }

  test("embed_outliers: flags the far tail of each cluster, deterministic") {
    val rows = run("embed_outliers").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(rows.nonEmpty, "no outliers at sf0.001 — threshold drifted?")
    assert(rows.forall(_._3 > 1.5), "z at or below the 1.5σ cut leaked through")
    assert(rows.forall(r => r._2 >= 0 && r._2 < 8), "cluster id outside the seed range")
    val again = run("embed_outliers").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(rows.sorted.toSeq === again.sorted.toSeq)
  }

  test("sample_temperature: flattens the mix toward small sources, realized sizes track rates") {
    val kept = run("sample_temperature").collect()
    assert(kept.nonEmpty)
    val keptBySrc = kept.groupBy(_.getString(1)).view.mapValues(_.length.toLong).toMap
    val totBySrc = Tables(spark, dir, "documents").groupBy("source")
      .agg(count(lit(1)).as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // sqrt temperature flattens: keep RATE must be (weakly) higher for
    // smaller sources wherever neither rate saturates at 1.0
    val rates = totBySrc.map { case (s, n) =>
      s -> (keptBySrc.getOrElse(s, 0L).toDouble / n, n)
    }
    for {
      (s1, (r1, n1)) <- rates; (s2, (r2, n2)) <- rates
      if n1 < n2 && r1 < 0.98 && r2 < 0.98
    } assert(r1 >= r2 - 0.05, s"smaller source $s1 (rate $r1) vs $s2 (rate $r2)")
    // realized total tracks the M = N/2 budget (bucket granularity slack)
    val total = kept.length.toDouble / totBySrc.values.sum
    assert(total > 0.35 && total < 0.65, s"realized fraction $total far from 0.5")
    // deterministic: re-run selects the identical id set
    val again = run("sample_temperature").collect().map(_.getLong(0)).toSet
    assert(again === kept.map(_.getLong(0)).toSet)
  }

  test("sample_quota: at most 15 docs per source, exactly 15 where supply allows, deterministic") {
    val kept = run("sample_quota").collect()
    val supply = Tables(spark, dir, "documents").groupBy("source").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val perSource = kept.groupBy(_.getString(1)).view.mapValues(_.length).toMap
    perSource.foreach { case (src, n) =>
      assert(n === math.min(15L, supply(src)).toInt, s"quota wrong for $src")
    }
    val again = run("sample_quota").collect()
    assert(kept.map(_.toString).sorted.toSeq === again.map(_.toString).sorted.toSeq)
  }

  test("embed_pca_variance: 16-dim spectrum, positive and near-descending") {
    val rows = run("embed_pca_variance").collect()
      .map(r => (r.getInt(0), r.getDouble(1), r.getLong(2))).sortBy(_._1)
    assert(rows.map(_._1).toSeq === (0 until 16))
    assert(rows.forall(_._2 > 0.0))
    // eigen-order: corpus variance per coordinate descends up to
    // sample-vs-corpus estimation noise
    rows.map(_._2).toSeq.sliding(2).foreach { w =>
      assert(w(1) <= w(0) * 1.10 + 1e-9, s"spectrum inversion: ${w(0)} then ${w(1)}")
    }
    assert(rows.map(_._3).sum <= 10000L)
  }

  test("vs_rerank_eval: recall non-decreasing in the rerank budget") {
    val rows = run("vs_rerank_eval").collect()
      .map(r => (r.getInt(0), r.getDouble(1))).sortBy(_._1)
    assert(rows.map(_._1).toSeq === Seq(1, 2, 5, 10))
    val rec = rows.map(_._2)
    assert(rec.forall(r => r >= 0.0 && r <= 1.0))
    assert(rec.zip(rec.tail).forall { case (a, b) => b >= a - 1e-9 },
      s"recall not monotone in factor: ${rec.toSeq}")
    assert(rec.last > rec.head, "widening the budget should help on sign-bit ordering")
  }

  test("vs_ef_eval: recall non-decreasing in beam width, wide beam near-exact") {
    val rows = run("vs_ef_eval").collect()
      .map(r => (r.getInt(0), r.getDouble(1))).sortBy(_._1)
    assert(rows.map(_._1).toSeq === Seq(5, 8, 32, 128))
    val recalls = rows.map(_._2)
    assert(recalls.forall(r => r >= 0.0 && r <= 1.0))
    assert(recalls.zip(recalls.tail).forall { case (a, b) => b >= a - 1e-9 },
      s"recall not monotone in efSearch: ${recalls.toSeq}")
    assert(recalls.last >= 0.95, s"wide beam should be near-exact: ${recalls.last}")
  }

  test("vs_compression_eval: one row per tier, flat is exact, recalls bounded") {
    val rows = run("vs_compression_eval").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(rows.map(_._1).sorted.toSeq === Seq("flat", "fp16", "lsh", "pq8", "sq4", "sq8"))
    assert(rows.forall(r => r._3 >= 0.0 && r._3 <= 1.0))
    assert(rows.find(_._1 == "flat").get._3 === 1.0, "flat must recall perfectly")
    // fp16 codes are ~2^-11 relative error: indistinguishable at k=5
    assert(rows.find(_._1 == "fp16").get._3 >= 0.95)
  }

  test("vs_recall_eval: recall non-decreasing in nprobe, exhaustive probe is exact") {
    val rows = run("vs_recall_eval").collect()
      .map(r => (r.getInt(0), r.getDouble(1))).sortBy(_._1)
    assert(rows.map(_._1).toSeq === IndexQueries.RecallNprobes)
    assert(rows.last._1 === 16, "sweep max must stay = nlist for the exhaustive-exact pin")
    rows.foreach { case (_, rec) => assert(rec >= 0.0 && rec <= 1.0) }
    assert(rows.map(_._2).toSeq === rows.map(_._2).sorted.toSeq, "recall must not drop as nprobe grows")
    assert(rows.last._2 === 1.0, "nprobe = nlist probes every list -> exact")
  }

  test("text_script: planted multilingual docs land on the right dominant script") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft_script").toString
    Seq(
      (0L, "hello plain english text", "x", "x", 0L),
      (1L, "привет мир как дела сегодня", "x", "x", 0L),
      (2L, "你好世界这是中文文本", "x", "x", 0L),
      (3L, "مرحبا بالعالم نص عربي", "x", "x", 0L),
      (4L, "12345 67890", "x", "x", 0L), // digits only -> unknown
      (5L, "год 2024 mixed год год", "x", "x", 0L)) // cyrillic beats latin
      .toDF("doc_id", "text", "lang", "source", "n_dummy")
      .write.parquet(s"$tmp/documents.parquet")
    val got = graft.SparkEntry.queries("text_script")(spark, tmp)
      .select("doc_id", "script").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got === Map(0L -> "latin", 1L -> "cyrillic", 2L -> "cjk",
      3L -> "arabic", 4L -> "unknown", 5L -> "cyrillic"))
  }

  test("vs_refine_eval: recall non-decreasing in refine at exhaustive probing") {
    val rows = run("vs_refine_eval").collect()
      .map(r => (r.getInt(0), r.getDouble(1))).sortBy(_._1)
    assert(rows.map(_._1).toSeq === IndexQueries.RefineFactors)
    rows.foreach { case (_, rec) => assert(rec >= 0.0 && rec <= 1.0) }
    // nested candidate sets under a consistent (dist, label) order mean a
    // bigger re-rank budget can only displace a true top-5 member with
    // another true top-5 member — recall is monotone in refine
    assert(rows.map(_._2).toSeq === rows.map(_._2).sorted.toSeq, "recall must not drop as refine grows")
    assert(rows.last._2 > rows.head._2 || rows.head._2 === 1.0,
      "the sweep must show the knob doing something (or already be exact at refine=1)")
  }

  test("dedup_chunks: one survivor per distinct chunk text, canonical = min (doc_id, chunk_idx)") {
    val survivors = run("dedup_chunks").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2)))
    val all = run("text_chunk").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(3)))
    assert(survivors.map(_._3).distinct.length === survivors.length, "one row per hash")
    assert(survivors.map(_._3).toSet.size === all.map(_._3).distinct.length,
      "every distinct chunk text survives exactly once")
    val expected = all.groupBy(_._3).values.map(_.minBy(c => (c._1, c._2))).toSet
    assert(survivors.map(c => (c._1, c._2)).toSet === expected.map(c => (c._1, c._2)))
  }

  test("corpus_stats: partitions the corpus exactly, token totals and quality bounds hold") {
    val rows = run("corpus_stats").collect()
    val docs = Tables(spark, dir, "documents")
    assert(rows.map(_.getLong(2)).sum === docs.count(), "n_docs partitions the corpus")
    assert(rows.map(_.getLong(3)).sum ===
      docs.select(sum(size(TextFunctions.tokens(col("text"))))).collect()(0).getLong(0),
      "token volume preserved")
    rows.foreach(r => assert(r.getDouble(4) >= 0.0 && r.getDouble(4) <= 1.0))
    assert(rows.map(r => (r.getString(0), r.getString(1))).distinct.length === rows.length)
  }

  test("vs_index_stats: ntotal exact, imbalance bounded, planted balance measures exactly 1.0") {
    val r = run("vs_index_stats").collect()(0)
    val nVecs = Tables(spark, dir, "embeddings").count()
    assert(r.getLong(0) === nVecs)
    assert(r.getInt(1) === 16)
    val f = r.getDouble(2)
    assert(f >= 1.0 && f <= 16.0, s"imbalance $f out of [1, nlist]")

    // planted perfectly-balanced corpus: 4 clusters x 25 points at
    // axis-aligned corners, manually trained on the exact corners
    import spark.implicits._
    import graft.index.IndexCatalog
    import graft.functions.vec
    import org.apache.spark.sql.functions._
    val dim = 8
    def corner(c: Int): Array[Float] =
      Array.tabulate(dim)(i => if (i == c) 10f else 0f)
    val pts = for (c <- 0 until 4; j <- 0 until 25)
      yield ((c * 25 + j).toLong, corner(c).map(_ + (j % 3) * 0.01f).toSeq)
    if (IndexCatalog.exists("t_stats_bal")) IndexCatalog.destroy("t_stats_bal")
    IndexCatalog.create("t_stats_bal", dim, "IDMap,IVF4,Flat", "l2sq")
    IndexCatalog.add(
      pts.toDF("label", "v").select(col("label"), vec.vector(col("v")).as("vec")),
      "t_stats_bal")
    IndexCatalog.manualTrain(
      (0 until 4).map(c => Tuple1(corner(c).toSeq)).toDF("v")
        .select(vec.vector(col("v")).as("vec")),
      "t_stats_bal")
    val bal = IndexCatalog.stats("t_stats_bal").collect()(0)
    assert(bal.getLong(0) === 100L && bal.getInt(1) === 4)
    assert(bal.getDouble(2) === 1.0, "equal lists must measure exactly 1.0")
    IndexCatalog.destroy("t_stats_bal")
  }

  test("events_top_paths: matches an independently computed trigram ranking") {
    val got = run("events_top_paths").collect().map(r => (r.getString(0), r.getLong(1)))
    // recompute driver-side from raw events (small at sf0.001); order by
    // MICROsecond ts like the query's window, not Timestamp.getTime's
    // millis (sub-ms pairs would sort differently)
    val ev = Tables.events(spark, dir)
      .select(col("user_id"), col("ts").cast("long").as("sec"),
        unix_micros(col("ts")).as("micros"), col("event_id"), col("event_type"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))
    val paths = ev.groupBy(_._1).toSeq.flatMap { case (_, rows) =>
      val sorted = rows.sortBy(r => (r._3, r._4))
      // split into sessions on >30min gaps (same floored-second rule)
      val sessions = sorted.foldLeft(Vector.empty[Vector[String]]) { (acc, r) =>
        acc.lastOption match {
          case Some(_) if r._2 - sorted(acc.map(_.size).sum - 1)._2 <= 1800 =>
            acc.init :+ (acc.last :+ r._5)
          case _ => acc :+ Vector(r._5)
        }
      }
      sessions.flatMap(s => s.sliding(3).filter(_.size == 3).map(_.mkString(">")))
    }
    val expected = paths.groupBy(identity).view.mapValues(_.size.toLong).toSeq
      .sortBy { case (p, n) => (-n, p) }.take(10)
    assert(got.toSeq === expected)
  }

  test("text_classifier: every doc scored once, keep tracks the logit sign, bit-stable on any partitioning") {
    val res = run("text_classifier").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getBoolean(2)))
    val nDocs = Tables(spark, dir, "documents").count()
    assert(res.length.toLong === nDocs)
    // logits are mean milli-weights in [-1.001, 1.001]
    assert(res.forall { case (_, l, _) => l >= -1.001 && l <= 1.001 })
    assert(res.forall { case (_, l, k) => k === (l > 0.0) || l == 0.0 },
      "keep must be the logit's sign (keep uses the exact long sum, not the quantized logit)")
    // independent driver-side replay of the hash → bucket → milli-weight
    // chain for a sample of docs (pins the exact arithmetic the oracle
    // mirrors, independent of Catalyst)
    val md = java.security.MessageDigest.getInstance("MD5")
    def milli(tok: String): Long = {
      val hex = md.digest(tok.getBytes("UTF-8")).map("%02x".format(_)).mkString
      val bucket = java.lang.Long.parseLong(hex.substring(0, 4), 16) % 1024L
      (bucket * 2654435761L) % 2003L - 1001L
    }
    val docs = Tables(spark, dir, "documents").where(col("doc_id") < 20)
      .select(col("doc_id"), TextFunctions.tokens(col("text")).as("t"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    val byId = res.map(r => r._1 -> r).toMap
    docs.foreach { case (id, toks) =>
      val wsum = toks.map(milli).sum
      val want = wsum.toDouble / (toks.length * 1000L).toDouble
      assert(byId(id)._2 === want, s"logit replay mismatch for doc $id")
      assert(byId(id)._3 === (wsum > 0))
    }
  }

  test("sample_shards: exact cover, dense per-shard positions, rerun-stable") {
    val rows = graft.SparkEntry.queries("sample_shards")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2)))
    val nDocs = Tables(spark, dir, "documents").count()
    assert(rows.length.toLong === nDocs) // every doc in exactly one shard
    assert(rows.map(_._1).distinct.length === rows.length)
    rows.groupBy(_._2).foreach { case (shard, rs) =>
      assert(rs.map(_._3).sorted.toSeq === (1 to rs.length).toSeq, s"shard $shard not dense")
    }
    // deterministic: a rerun (fresh plan) assigns identical (shard, pos)
    val again = graft.SparkEntry.queries("sample_shards")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2)))
    assert(again.toSet === rows.toSet)
  }

  test("text_heavy_hitters: unpurged sketch counts match the exact groupBy") {
    import graft.text.TextFunctions
    // max_err = 0 proves no purge happened -> estimates are exact
    val raw = Tables.wide(spark, dir, "documents")
      .select(TextFunctions.shinglesAll(TextFunctions.tokens(col("text")), 3).as("g"))
      .agg(graft.functions.freqitems.agg(col("g")).as("sk"))
      .select(explode(graft.functions.freqitems.topK(col("sk"), 25)).as("h"))
      .select(col("h.term"), col("h.n"), col("h.max_err"))
      .collect()
    assert(raw.nonEmpty)
    raw.foreach(r => assert(r.getLong(2) === 0L, "sketch purged — counts no longer exact"))
    val exact = Tables(spark, dir, "documents")
      .select(explode(TextFunctions.shinglesAll(TextFunctions.tokens(col("text")), 3)).as("term"))
      .groupBy("term").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("term")).limit(25)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(raw.map(r => (r.getString(0), r.getLong(1))).toSeq === exact.toSeq)
  }

  test("freq_items_agg: purged sketch still bounds error and keeps true heavy hitters") {
    import spark.implicits._
    // 1 dominant term + 1000 singletons through a tiny 64-slot map:
    // the sketch must purge, report a nonzero error bound, and STILL
    // surface the heavy hitter with estimate within max_err of truth
    val docs = ((1 to 500).map(_ => "hot") ++ (1 to 1000).map(i => s"cold$i"))
      .map(t => Seq(t)).toDF("g")
    val h = docs.agg(graft.functions.freqitems.agg(col("g"), maxMapSize = 64).as("sk"))
      .select(explode(graft.functions.freqitems.topK(col("sk"), 5)).as("h"))
      .select(col("h.term"), col("h.n"), col("h.max_err"))
      .collect()
    val hot = h.find(_.getString(0) == "hot")
    assert(hot.isDefined, "dominant term must survive purging")
    val (est, err) = (hot.get.getLong(1), hot.get.getLong(2))
    assert(err > 0L)
    assert(est >= 500L && est <= 500L + err)
  }

  test("sample_kcenter: greedy selection replays exactly, radii non-increasing, centers distinct") {
    import graft.functions.VectorMath
    val out = run("sample_kcenter").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2))).sortBy(_._1)
    assert(out.length === 16)
    assert(out.map(_._2).distinct.length === 16, "centers must be distinct")
    // covering radius is non-increasing after the seed
    out.drop(1).sliding(2).foreach { case Array(a, b) =>
      assert(b._3 <= a._3 + 1e-9, s"radius grew: $a -> $b")
    }
    // exact driver replay of the greedy recurrence (same float math,
    // same (dist desc, label asc) tie-break)
    val vecs = Tables(spark, dir, "embeddings")
      .select(col("vec_id"), graft.functions.vec.vector(col("embedding")))
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).sortBy(_._1)
    def d(a: Array[Float], b: Array[Float]) = VectorMath.distArr(VectorMath.L2SQ, a, b, 3.0)
    var centers = Vector((0, vecs.head._1, 0.0))
    val mind = scala.collection.mutable.Map(vecs.map { case (l, v) =>
      l -> d(v, vecs.head._2) }: _*)
    val byId = vecs.toMap
    for (rank <- 1 until 16) {
      val far = vecs.map { case (l, _) => (l, mind(l)) }
        .maxBy { case (l, dist) => (dist, -l.toDouble) }
      centers :+= ((rank, far._1, far._2))
      vecs.foreach { case (l, v) => mind(l) = math.min(mind(l), d(v, byId(far._1))) }
    }
    val expect = centers.map { case (r, l, rad) =>
      (r, l, BigDecimal(rad).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble) }
    assert(out.toVector === expect)
  }

  test("embed_centrality: degrees bounded by k, edge-count parity, outliers covered") {
    val out = run("embed_centrality").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    val nVecs = Tables(spark, dir, "embeddings").count()
    assert(out.length.toLong === nVecs, "one row per vector, including zero-degree outliers")
    out.foreach { case (id, deg, core) =>
      assert(deg >= 0L && deg <= 10L, s"vec $id degree $deg out of [0,10]")
      assert(core === (deg >= 5L))
    }
    // mutual edges are symmetric: every edge contributes to exactly two
    // degrees, so the total is even
    assert(out.map(_._2).sum % 2 === 0L)
    assert(out.exists(_._2 > 0L), "a dense corpus must have mutual neighbors")
  }

  test("embed_drift: cohorts partition each label, drift replays the centroid-delta L2") {
    val out = run("embed_drift").collect()
      .map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(out.nonEmpty)
    val raw = Tables(spark, dir, "embeddings")
      .select(col("label"), col("vec_id"), col("embedding").cast("array<double>"))
      .collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getSeq[Double](2).toArray))
    val byLabel = raw.groupBy(_._1)
    assert(out.keySet === byLabel.keySet.filter { l =>
      byLabel(l).exists(_._2 % 2 == 0) && byLabel(l).exists(_._2 % 2 == 1)
    })
    byLabel.foreach { case (l, rows) =>
      out.get(l).foreach { case (nA, nB, drift) =>
        assert(nA === rows.count(_._2 % 2 == 0).toLong)
        assert(nB === rows.count(_._2 % 2 == 1).toLong)
        // replay the fixed-point chain: micro-quantized long sums per
        // dim, squared-delta re-quantization, then the across-dims fold
        val dims = rows.head._3.length
        val sqSum = (0 until dims).map { d =>
          def side(p: Int) = {
            val vs = rows.filter(_._2 % 2 == p)
            vs.map(r => math.floor(r._3(d) * 1e6 + 0.5).toLong).sum.toDouble / vs.length
          }
          val delta = (side(0) - side(1)) / 1e6
          math.floor(delta * delta * 1e8 + 0.5).toLong
        }.sum
        val expect = BigDecimal(math.sqrt(sqSum.toDouble / 1e8))
          .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
        assert(drift === expect, s"label $l")
        assert(drift >= 0.0)
      }
    }
  }

  test("knn_classify: one prediction per query, never self-voted, votes bounded by k") {
    val out = run("knn_classify").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    val nQueries = Tables(spark, dir, "embeddings")
      .where(col("vec_id") < 100).count()
    assert(out.length === nQueries, "exactly one prediction per query")
    val classes = Tables(spark, dir, "embeddings")
      .select("label").distinct().collect().map(_.getInt(0)).toSet
    out.foreach { case (qid, pred, votes) =>
      assert(classes.contains(pred), s"query $qid predicted unknown class $pred")
      assert(votes >= 1 && votes <= 5, s"query $qid votes $votes out of range")
    }
    // majority property: a prediction with >= 3 of 5 votes is the
    // strict majority class of the neighborhood — re-derive one case
    assert(out.exists(_._3 >= 2), "degenerate vote distribution")
  }

  test("embed_dim_stats: one row per dimension, variance non-negative, n = corpus size") {
    val out = run("embed_dim_stats").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    val n = Tables(spark, dir, "embeddings").count()
    assert(out.length === 64, "one row per dimension")
    assert(out.map(_._1).toSet === (0 until 64).toSet)
    out.foreach { case (dim, cnt, _, variance) =>
      assert(cnt === n, s"dim $dim cell count")
      assert(variance >= -1e-9, s"dim $dim variance $variance negative")
    }
  }
}
