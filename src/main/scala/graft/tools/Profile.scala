package graft.tools

import org.apache.spark.sql.SparkSession

/**
 * Dev profiler: times one query (arg 1) from SparkEntry at a given sf
 * dir (arg 2, default sf0.1), printing per-run wall times after a
 * warmup. Usage: runMain graft.tools.Profile knn_ivf_big /root/testdata/sf0.1
 */
object Profile {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // GRAFT_PROFILE_SIMD=1 flips the opt-in SIMD gate for per-query
    // profiling (local mode: executors share the JVM, the static flag
    // applies) — the gate-scale A/B instrument for the Panama kernels
    if (sys.env.get("GRAFT_PROFILE_SIMD").contains("1")) {
      graft.functions.VectorMath.Simd.enabled = true
      System.err.println(
        s"[profile] SIMD gate ON (available=${graft.functions.VectorMath.Simd.available})")
    }
    if (name == "simd-ab") { simdAb(spark, sfDir); spark.stop(); return }
    if (name == "coded-simd-ab") { codedSimdAb(); spark.stop(); return }
    if (name == "flatbig-simd-ab") { flatBigSimdAb(spark, sfDir); spark.stop(); return }
    if (name == "colloc-breakdown") { collocBreakdown(spark, sfDir); spark.stop(); return }
    if (name == "flatbig-breakdown") { flatBigBreakdown(spark, sfDir); spark.stop(); return }
    if (name == "ivfbig-breakdown") { ivfBigBreakdown(spark, sfDir); spark.stop(); return }
    if (name == "curate-breakdown") { curateBreakdown(spark, sfDir); spark.stop(); return }
    if (name == "saveload-breakdown") { saveLoadBreakdown(spark, sfDir); spark.stop(); return }
    if (name == "pqbig-breakdown") { pqBigBreakdown(spark, sfDir); spark.stop(); return }
    if (name == "pretrain-breakdown") { pretrainBreakdown(spark, sfDir); spark.stop(); return }
    if (name == "bloomwide-explain") { bloomWideExplain(spark, sfDir); spark.stop(); return }
    if (name == "shingle-micro") { shingleMicro(spark, sfDir); spark.stop(); return }
    val fn = graft.SparkEntry.queries(name)
    val warmDir = {
      val w = "/root/testdata/sf0.001"
      if (new java.io.File(w).isDirectory) w else sfDir
    }
    fn(spark, warmDir).count() // warmup
    val passes = sys.env.getOrElse("SPARK_GRAFT_PROFILE_PASSES", "3").toInt
    (1 to passes).foreach { i =>
      val t0 = System.nanoTime()
      val n = fn(spark, sfDir).count()
      System.err.println(f"[profile] $name run$i: ${(System.nanoTime() - t0) / 1e9}%.3f s ($n rows)")
    }
    spark.stop()
  }

  private def t[A](label: String)(f: => A): A = {
    val t0 = System.nanoTime()
    val r = f
    System.err.println(f"[profile]   $label: ${(System.nanoTime() - t0) / 1e9}%.3f s")
    r
  }

  /** stage-level decomposition of the pipeline_curate chain */
  private def curateBreakdown(spark: SparkSession, dir: String): Unit = {
    import org.apache.spark.sql.functions._
    import graft.text.TextFunctions
    (1 to 2).foreach { round =>
      System.err.println(s"[profile] -- round $round --")
      val d = graft.queries.Tables.wide(spark, dir, "documents")
      t("scan.count") { d.count() }
      t("md5-groupBy only") {
        d.groupBy(md5(col("text")).as("_h"))
          .agg(min(struct(col("doc_id"), col("lang"))).as("c")).count()
      }
      t("gate only") {
        d.where(TextFunctions.qualityScore(col("text")) >= 0.6).count()
      }
      t("gate+dedup") {
        d.where(TextFunctions.qualityScore(col("text")) >= 0.6)
          .groupBy(md5(col("text")).as("_h"))
          .agg(min(struct(col("doc_id"), col("lang"))).as("c")).count()
      }
      t("full query") {
        graft.SparkEntry.queries("pipeline_curate")(spark, dir).count()
      }
    }
  }

  /** stage-level timing of the vs_index_saveload lifecycle */
  private def saveLoadBreakdown(spark: SparkSession, dir: String): Unit = {
    import org.apache.spark.sql.functions._
    import graft.functions.vec
    import graft.index.IndexCatalog
    (1 to 2).foreach { round =>
      System.err.println(s"[profile] -- round $round --")
      if (IndexCatalog.exists("prof_svl")) IndexCatalog.destroy("prof_svl")
      val data = graft.queries.Tables(spark, dir, "embeddings")
        .select(col("vec_id").as("label"), vec.vector(col("embedding")).as("vec"))
      val qs = graft.queries.Tables(spark, dir, "embeddings").where(col("vec_id") < 10)
        .select(col("vec_id").as("qid"), vec.vector(col("embedding")).as("qvec"))
      val path = new java.io.File(
        System.getProperty("java.io.tmpdir"), "graft_prof_svl").getAbsolutePath
      t("create+add") {
        IndexCatalog.create("prof_svl", 64, "IDMap,IVF16,Flat", "l2sq", Map("nprobe" -> "16"))
        IndexCatalog.add(data, "prof_svl")
      }
      t("build") { IndexCatalog.build("prof_svl") }
      t("save") { IndexCatalog.save("prof_svl", path) }
      t("destroy") { IndexCatalog.destroy("prof_svl") }
      t("load") { IndexCatalog.load("prof_svl", path, spark) }
      t("search") { IndexCatalog.search("prof_svl", 5, qs).count() }
    }
  }

  /** stage-level timing of the knn_ivfpq_big lifecycle */
  /** micro-timing of the shingle expression chain at a given sf dir */
  private def shingleMicro(spark: SparkSession, dir: String): Unit = {
    import org.apache.spark.sql.functions._
    import graft.text.TextFunctions
    val d = graft.queries.Tables.wide(spark, dir, "documents")
    for (round <- 1 to 2) {
      System.err.println(s"[profile] -- round $round --")
      t("tokens size sum") {
        d.select(TextFunctions.tokens(col("text")).as("_t"))
          .select(size(col("_t")).as("n")).agg(sum(col("n"))).collect()
      }
      t("shingles size sum (bound toks)") {
        d.select(TextFunctions.tokens(col("text")).as("_t"))
          .select(size(TextFunctions.shingles(col("_t"), 3)).as("n"))
          .agg(sum(col("n"))).collect()
      }
      t("shingles+xxhash size sum") {
        d.select(TextFunctions.tokens(col("text")).as("_t"))
          .select(size(transform(TextFunctions.shingles(col("_t"), 3),
            s => xxhash64(s))).as("n"))
          .agg(sum(col("n"))).collect()
      }
      t("bigram md5 (feats-style) size sum") {
        val toks = col("_t")
        d.select(TextFunctions.tokens(col("text")).as("_t"))
          .select(size(when(size(toks) >= 2,
            transform(sequence(lit(1), size(toks) - 1),
              i => conv(substring(md5(concat(
                  element_at(toks, i), lit(" "), element_at(toks, i + 1))), 1, 4), 16, 10)
                .cast("long") % 4096L))
            .otherwise(array().cast("array<long>"))).as("n"))
          .agg(sum(col("n"))).collect()
      }
    }
  }

  /** plan diff: contaminationBloom over a widened vs raw input */
  private def bloomWideExplain(spark: SparkSession, dir: String): Unit = {
    import org.apache.spark.sql.functions._
    val raw = graft.queries.Tables(spark, dir, "documents")
    val wide = graft.queries.Tables.wide(spark, dir, "documents")
    for (round <- 1 to 2; (label, src) <- Seq("raw" -> raw, "wide" -> wide)) {
      val q = t(s"$label construct (eval collect) r$round") {
        graft.text.Pipeline.contaminationBloom(src, "doc_id", "text",
          col("doc_id") < 20L, 3).where(col("n_overlap") === 0L)
      }
      if (round == 1 && label == "raw")
        System.err.println(q.queryExecution.explainString(
          org.apache.spark.sql.execution.SimpleMode))
      t(s"$label execute r$round") { q.count() }
    }
  }

  /** stage-level decomposition of the pipeline_pretrain chain */
  private def pretrainBreakdown(spark: SparkSession, dir: String): Unit = {
    import org.apache.spark.sql.functions._
    import graft.text.TextFunctions
    (1 to 2).foreach { round =>
      System.err.println(s"[profile] -- round $round --")
      val d = graft.queries.Tables.wide(spark, dir, "documents")
      t("scan.count") { d.count() }
      val gated = d.where(TextFunctions.qualityScore(col("text")) >= 0.6)
      t("quality gate") { gated.count() }
      t("dedup groupBy(text)") {
        gated.groupBy(col("text"))
          .agg(min(struct(col("doc_id"), col("lang"))).as("c")).count()
      }
      t("dedup groupBy(md5)") {
        gated.groupBy(md5(col("text")).as("_h"))
          .agg(min(struct(col("doc_id"), col("lang"))).as("c")).count()
      }
      t("gate qualityScoreT bound") {
        d.select(col("doc_id"), col("lang"), col("text"),
            TextFunctions.tokens(col("text")).as("_toks"))
          .where(TextFunctions.qualityScoreT(col("text"), col("_toks")) >= 0.6)
          .count()
      }
      t("contamination clean-ids") {
        graft.text.Pipeline.contamination(d, "doc_id", "text",
            col("doc_id") < 20L, 3)
          .where(col("n_overlap") === 0L).count()
      }
      t("contaminationBloom clean-ids") {
        graft.text.Pipeline.contaminationBloom(d, "doc_id", "text",
            col("doc_id") < 20L, 3)
          .where(col("n_overlap") === 0L).count()
      }
      t("contaminationBloom bench-form (no wide)") {
        graft.text.Pipeline.contaminationBloom(
            graft.queries.Tables(spark, dir, "documents"), "doc_id", "text",
            col("doc_id") < 20L, 3)
          .select(col("id").as("doc_id"), col("n_overlap")).count()
      }
      val toks = col("toks")
      val feats = d
        .select(col("doc_id"), col("lang"), TextFunctions.tokens(col("text")).as("toks"))
        .select(col("doc_id"), col("lang"),
          explode(
            when(size(toks) >= 2,
              transform(sequence(lit(1), size(toks) - 1),
                i => conv(substring(md5(concat(
                    element_at(toks, i), lit(" "), element_at(toks, i + 1))), 1, 4), 16, 10)
                  .cast("long") % 4096L))
              .otherwise(array().cast("array<long>"))).as("b"))
      t("bigram md5 explode (all docs)") { feats.count() }
      t("ppm agg") {
        feats.groupBy("b").agg(count(lit(1)).as("c_raw"),
          count(when(col("lang") === "en", 1)).as("c_tgt")).count()
      }
      t("full pipeline_pretrain") {
        graft.SparkEntry.queries("pipeline_pretrain")(spark, dir).count()
      }
    }
  }

  private def pqBigBreakdown(spark: SparkSession, dir: String): Unit = {
    import org.apache.spark.sql.functions._
    import graft.functions.vec
    import graft.index.IndexCatalog
    (1 to 2).foreach { round =>
      System.err.println(s"[profile] -- round $round --")
      if (IndexCatalog.exists("prof_pq")) IndexCatalog.destroy("prof_pq")
      val copies = spark.range(0, 50).select(col("id").as("copy"))
      val data = copies
        .join(broadcast(graft.queries.Tables(spark, dir, "embeddings")))
        .select((col("vec_id") + col("copy") * 1000000L).as("label"),
          vec.vector(col("embedding")).as("vec"))
      val qs = graft.queries.Tables(spark, dir, "embeddings").where(col("vec_id") < 100)
        .select(col("vec_id").as("qid"), vec.vector(col("embedding")).as("qvec"))
      t("create+add") {
        IndexCatalog.create("prof_pq", 64, "IDMap,IVF16,PQ8", "l2sq",
          Map("nprobe" -> "4", "refine" -> "16"))
        IndexCatalog.add(data, "prof_pq")
      }
      t("build(train+encode+cache)") { IndexCatalog.build("prof_pq") }
      t("search") { IndexCatalog.search("prof_pq", 5, qs).count() }
      t("search2") { IndexCatalog.search("prof_pq", 5, qs).count() }
    }
  }

  /** stage-level timing of the knn_ivf_big lifecycle */
  /** phase split of the exact big scan: corpus generation alone vs
    * generation + distance (no top-k) vs the full search — attributes
    * the 1000x rung's superlinear factor to a phase */
  /** A/B of the opt-in Panama SIMD kernels (VERDICT r10 #1): the
    * pure-JVM 1e9-pair loop (kernel-level ceiling, one core) and the
    * Spark-level fast flat scan at the replicated rung, each with the
    * gate off vs on. local-mode executors share the JVM, so flipping
    * the volatile flips every task's kernel. */
  /** A/B the coded-scan SIMD kernels (SQ8 decode-distance, RQ/LSQ
    * additive decode-distance) against their scalar twins in a raw
    * packed-buffer loop — the exact shape CodedTopKScan scores per
    * chunk: contiguous codes, one query context, a bounded heap. */
  private def codedSimdAb(): Unit = {
    import graft.functions.VectorMath
    import graft.index.{Rq, Sq}
    val dim = 64; val nCodes = 100000; val nQ = 100; val reps = 20 // 2e8 pairs
    val rnd = new java.util.Random(42)
    def fvec() = Array.fill(dim)(rnd.nextFloat())
    System.err.println(s"[profile] simd available=${VectorMath.Simd.available}" +
      (if (VectorMath.Simd.available) s" species=${graft.functions.SimdKernels.species()}" else ""))
    // SQ8: packed nCodes x dim byte buffer
    val vmin = fvec(); val vdiff = Array.fill(dim)(rnd.nextFloat() * 2f)
    val sqCodes = new Array[Byte](nCodes * dim); rnd.nextBytes(sqCodes)
    // RQ: m=8 stages of 256 x dim codebooks, packed nCodes x m codes
    val m = 8
    val books = Array.fill(m)(Array.fill(256)(fvec()))
    val rqCodes = new Array[Byte](nCodes * m); rnd.nextBytes(rqCodes)
    val queries = Array.fill(nQ)(fvec())
    def sqLoop(): Double = {
      var acc = 0.0; var r = 0
      while (r < reps / 10) { // SQ at 2e7 pairs x 10 below via outer mult
        var q = 0
        while (q < nQ) {
          val heap = new graft.functions.TopKHeap(5, true)
          val qv = queries(q); var c = 0
          while (c < nCodes) {
            heap.insert(Sq.l2DistanceAt(sqCodes, c * dim, dim, qv, vmin, vdiff, Sq.V8), c.toLong)
            c += 1
          }
          acc += heap.sorted.head._1; q += 1
        }
        r += 1
      }
      acc
    }
    def rqLoop(): Double = {
      val scratch = new Array[Float](dim)
      var acc = 0.0; var r = 0
      while (r < reps / 10) {
        var q = 0
        while (q < nQ) {
          val heap = new graft.functions.TopKHeap(5, true)
          val qv = queries(q); var c = 0
          while (c < nCodes) {
            heap.insert(Rq.l2DistanceAt(rqCodes, c * m, m, qv, books, scratch), c.toLong)
            c += 1
          }
          acc += heap.sorted.head._1; q += 1
        }
        r += 1
      }
      acc
    }
    // build-side loops: RQ encode (per-corpus-row at scale) and IVF
    // coarse assignment (the 100x rung's pre-packing dominant term)
    val encVecs = Array.fill(10000)(
      new org.apache.spark.sql.catalyst.util.GenericArrayData(fvec()))
    def encLoop(): Int = {
      var acc = 0; var i = 0
      while (i < encVecs.length) { acc += Rq.encodeOne(encVecs(i), books)(m - 1); i += 1 }
      acc
    }
    val rawVecs = Array.fill(2000)(fvec())
    def lsqEncLoop(): Int = {
      var acc = 0; var i = 0
      while (i < rawVecs.length) {
        acc += graft.index.Lsq.encodeArr(rawVecs(i), books)(m - 1); i += 1
      }
      acc
    }
    val cents = Array.fill(4096)(fvec())
    val rawKm = Array.fill(5000)(fvec())
    val imiBooks = Array.fill(2)(Array.fill(256)(Array.fill(dim / 2)(rnd.nextFloat())))
    val pcaMean = fvec()
    val pcaComps = Array.fill(dim)(fvec())
    def assignLoop(): Long = {
      var acc = 0L; var i = 0
      while (i < 5000) {
        acc += graft.index.NearestCentroids
          .nearest(encVecs(i), cents, 1, VectorMath.L2SQ).getInt(0)
        i += 1
      }
      acc
    }
    for (round <- 1 to 2; on <- Seq(false, true)) {
      VectorMath.Simd.enabled = on
      val tag = if (on) "SIMD" else "scalar"
      t(s"sq8 2e7-pair packed loop round$round $tag") {
        System.err.println(s"[profile]    (acc=${sqLoop()})")
      }
      t(s"rq8x${m} 2e7-pair packed loop round$round $tag") {
        System.err.println(s"[profile]    (acc=${rqLoop()})")
      }
      t(s"rq8x$m encode 10k vectors round$round $tag") {
        System.err.println(s"[profile]    (acc=${encLoop()})")
      }
      t(s"ivf assign 5k x 4096 cents round$round $tag") {
        System.err.println(s"[profile]    (acc=${assignLoop()})")
      }
      t(s"lsq8x$m icm-encode 2k vectors round$round $tag") {
        System.err.println(s"[profile]    (acc=${lsqEncLoop()})")
      }
      t(s"kmeans-train 5k x 256 x 8it round$round $tag") {
        System.err.println(s"[profile]    (acc=${graft.index.Rq.train(rawKm.map(_.clone()), 1, 7L, 8)(0)(0)(0)})")
      }
      t(s"imi assign 100k x 2x256 halves round$round $tag") {
        var acc = 0L; var i = 0
        while (i < 100000) {
          acc += graft.index.Imi.assignCell(rawVecs(i % rawVecs.length), imiBooks); i += 1
        }
        System.err.println(s"[profile]    (acc=$acc)")
      }
      t(s"pca/opq project 100k x ${dim}x$dim round$round $tag") {
        var acc = 0.0; var i = 0
        while (i < 100000) {
          acc += graft.index.Pca.projectArr(rawVecs(i % rawVecs.length), pcaMean, pcaComps)(0)
          i += 1
        }
        System.err.println(s"[profile]    (acc=$acc)")
      }
    }
    VectorMath.Simd.enabled = false
  }

  /** interleaved in-process scalar/SIMD A/B of the knn_flat_big plan
    * at a rung dir — alternation cancels the shared-VM steal drift
    * that makes separate-process A/Bs at this scale 2-5x noisy.
    * Needs SPARK_DRIVER_MEM=64g at the 1e10-pair rung. */
  private def flatBigSimdAb(spark: SparkSession, dir: String): Unit = {
    import graft.functions.VectorMath
    val q = graft.SparkEntry.queries("knn_flat_big")
    q(spark, dir).count() // warm: codegen + page cache for both arms
    for (round <- 1 to 3; on <- Seq(false, true)) {
      VectorMath.Simd.enabled = on
      t(s"knn_flat_big round$round ${if (on) "SIMD" else "scalar"}") {
        q(spark, dir).count()
      }
    }
    VectorMath.Simd.enabled = false
  }

  private def simdAb(spark: SparkSession, dir: String): Unit = {
    import org.apache.spark.sql.functions._
    import graft.functions.{VectorMath, vec}
    System.err.println(s"[profile] simd available=${VectorMath.Simd.available}" +
      (if (VectorMath.Simd.available) s" species=${graft.functions.SimdKernels.species()}" else ""))
    def rawLoop(metric: Int): Double = {
      val rnd = new java.util.Random(42)
      val corpus = Array.fill(10000)(Array.fill(64)(rnd.nextFloat()))
      val queries = Array.fill(100)(Array.fill(64)(rnd.nextFloat()))
      val heaps = Array.fill(100)(new graft.functions.TopKHeap(5, true))
      var i = 0
      while (i < 1000) { // 1000 x 10000 x 100 = 1e9 pairs
        var c = 0
        while (c < 10000) {
          var q = 0
          while (q < 100) {
            heaps(q).insert(VectorMath.distArr(metric, corpus(c), queries(q), 3.0), c.toLong)
            q += 1
          }
          c += 1
        }
        i += 1
      }
      heaps(0).sorted.head._1
    }
    for (round <- 1 to 2; on <- Seq(false, true); metric <- Seq(VectorMath.L2SQ, VectorMath.IP)) {
      VectorMath.Simd.enabled = on
      val mname = if (metric == VectorMath.L2SQ) "l2sq" else "ip"
      t(s"raw 1e9-pair loop round$round $mname ${if (on) "SIMD" else "scalar"}") {
        System.err.println(s"[profile]    (acc=${rawLoop(metric)})")
      }
    }
    // Spark level: the fast flat kernel over a 50x-replicated corpus
    val copies = spark.range(0, 50).select(col("id").as("copy"))
    val data = copies
      .join(broadcast(graft.queries.Tables(spark, dir, "embeddings")))
      .select((col("vec_id") + col("copy") * 1000000L).as("label"),
        vec.vector(col("embedding")).as("vec"))
    val qs = graft.queries.Tables(spark, dir, "embeddings").where(col("vec_id") < 100)
      .select(col("vec_id").as("qid"), vec.vector(col("embedding")).as("qvec"))
    for (round <- 1 to 2; on <- Seq(false, true)) {
      VectorMath.Simd.enabled = on
      t(s"searchFlatFast round$round ${if (on) "SIMD" else "scalar"}") {
        graft.search.Knn.searchFlatFast(data, qs, 5, "l2sq").count()
      }
    }
    VectorMath.Simd.enabled = false
  }

  /** stage-level breakdown of text_collocations at a rung (round 11:
    * 10M docs read 4.5x the 5M wall — which pass is superlinear?) */
  private def collocBreakdown(spark: SparkSession, dir: String): Unit = {
    import org.apache.spark.sql.functions._
    val d = graft.queries.Tables.wide(spark, dir, "documents")
    val toks = col("toks")
    def pairs = d.select(graft.text.TextFunctions.tokens(col("text")).as("toks")).select(explode(
        when(size(toks) >= 2,
          transform(sequence(lit(1), size(toks) - 1),
            i => struct(element_at(toks, i).as("x"), element_at(toks, i + 1).as("y"))))
          .otherwise(array().cast("array<struct<x:string,y:string>>"))).as("p"))
      .select(col("p.x").as("x"), col("p.y").as("y"))
    (1 to 2).foreach { round =>
      System.err.println(s"[profile] -- round $round --")
      t("docs scan only") { d.agg(sum(length(col("text")))).collect() }
      t("tokenize+pairs, count only") { System.err.println(s"[profile]    pairs=${pairs.count()}") }
      t("cxy groupBy") { pairs.groupBy("x", "y").agg(count(lit(1))).count() }
      t("cx groupBy") { pairs.groupBy("x").agg(count(lit(1))).count() }
      t("full query") {
        graft.SparkEntry.queries("text_collocations")(spark, dir).count()
      }
    }
  }

  private def flatBigBreakdown(spark: SparkSession, dir: String): Unit = {
    import org.apache.spark.sql.functions._
    import graft.functions.vec
    (1 to 2).foreach { round =>
      System.err.println(s"[profile] -- round $round --")
      val copies = spark.range(0, 50).select(col("id").as("copy"))
      val data = copies
        .join(broadcast(graft.queries.Tables(spark, dir, "embeddings")))
        .select((col("vec_id") + col("copy") * 1000000L).as("label"),
          vec.vector(col("embedding")).as("vec"))
      val qs = graft.queries.Tables(spark, dir, "embeddings").where(col("vec_id") < 100)
        .select(col("vec_id").as("qid"), vec.vector(col("embedding")).as("qvec"))
      System.err.println(s"[profile] bigData stats.sizeInBytes = " +
        data.queryExecution.optimizedPlan.stats.sizeInBytes)
      t("generate only") { // sum defeats count-pushdown; one full pass
        data.agg(sum(element_at(col("vec"), 1))).collect()
      }
      val packedChunks = {
        val normalized = data.select(col("label").cast("long").as("label"), col("vec"))
        val chunkSchema = org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("items",
            org.apache.spark.sql.types.ArrayType(normalized.schema))))
        val rdd = normalized.queryExecution.toRdd.mapPartitions { it =>
          it.map(_.copy()).grouped(65536).map { rows =>
            new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
              Array[Any](new org.apache.spark.sql.catalyst.util.GenericArrayData(
                rows.toArray[Any]))): org.apache.spark.sql.catalyst.InternalRow
          }
        }
        org.apache.spark.sql.GraftBridge.internalCreateDataFrame(spark, rdd, chunkSchema)
      }
      val _ = packedChunks // binary-pack phase measured round 1: 215 s (kept for reference)
      t("fast kernel (partition heaps)") {
        graft.search.Knn.searchFlatFast(data, qs, 5, "l2sq").count()
      }
      // pure-JVM reference for the same pair loop: what the hardware
      // can do with zero Spark in the way
      t("raw distArr loop, 1e9 pairs, 1 core") {
        val rnd = new java.util.Random(42)
        val corpus = Array.fill(10000)(Array.fill(64)(rnd.nextFloat()))
        val queries = Array.fill(100)(Array.fill(64)(rnd.nextFloat()))
        val heaps = Array.fill(100)(new graft.functions.TopKHeap(5, true))
        var acc = 0.0
        var i = 0
        while (i < 1000) { // 1000 x 10000 x 100 = 1e9 pairs
          var c = 0
          while (c < 10000) {
            var q = 0
            while (q < 100) {
              heaps(q).insert(
                graft.functions.VectorMath.distArr(
                  graft.functions.VectorMath.L2SQ, corpus(c), queries(q), 3.0), c.toLong)
              q += 1
            }
            c += 1
          }
          i += 1
        }
        acc += heaps(0).sorted.head._1
        System.err.println(s"[profile]    (acc=$acc)")
      }
    }
  }

  private def ivfBigBreakdown(spark: SparkSession, dir: String): Unit = {
    import org.apache.spark.sql.functions._
    import graft.functions.vec
    import graft.index.IndexCatalog
    (1 to 2).foreach { round =>
      System.err.println(s"[profile] -- round $round --")
      if (IndexCatalog.exists("prof_ivf")) IndexCatalog.destroy("prof_ivf")
      val copies = spark.range(0, 50).select(col("id").as("copy"))
      val data = graft.queries.Tables(spark, dir, "embeddings")
        .crossJoin(copies)
        .select((col("vec_id") + col("copy") * 1000000L).as("label"),
          vec.vector(col("embedding")).as("vec"))
      val qs = graft.queries.Tables(spark, dir, "embeddings").where(col("vec_id") < 100)
        .select(col("vec_id").as("qid"), vec.vector(col("embedding")).as("qvec"))
      t("create+add") {
        IndexCatalog.create("prof_ivf", 64, "IDMap,IVF64,Flat", "l2sq", Map("nprobe" -> "4"))
        IndexCatalog.add(data, "prof_ivf")
      }
      t("train") { IndexCatalog.manualTrain(data.select(col("vec")).limit(16384), "prof_ivf") }
      t("build(assign+cache)") { IndexCatalog.build("prof_ivf") }
      t("search") { IndexCatalog.search("prof_ivf", 5, qs).count() }
      t("search2") { IndexCatalog.search("prof_ivf", 5, qs).count() }
    }
  }
}
