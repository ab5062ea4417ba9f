package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Training-data pipeline assembly operators: sequence packing and
 * benchmark-contamination screening. Both are single-pass,
 * bounded-shuffle plans (one window / one hash join), so they hold at
 * corpus scale.
 */
object Pipeline {

  /**
   * RAG/context chunking: split each document into overlapping token
   * windows (`window` tokens, `stride` step → `window - stride` token
   * overlap). Chunk starts walk 0, stride, 2·stride, … until the
   * window reaches the end; the final chunk may be short but always
   * contributes new tokens. A stateless scan-stage explode — no
   * shuffle, streams as-is; output rows ≈ n_tokens/stride per doc.
   * Expects (doc_id, text) columns; emits (doc_id, chunk_idx,
   * chunk_tokens, chunk_text).
   */
  def chunk(df: DataFrame, window: Int = 64, stride: Int = 48): DataFrame = {
    require(window > 0 && stride > 0 && stride <= window,
      s"need 0 < stride <= window, got window=$window stride=$stride")
    val lastIdx = floor(
      (greatest(size(col("toks")) - lit(window), lit(0)) + lit(stride - 1)) / lit(stride))
      .cast("int")
    df.select(col("doc_id"), TextFunctions.tokens(col("text")).as("toks"))
      .where(size(col("toks")) >= 1) // no zero-token chunk for empty docs
      .select(col("doc_id"), explode(transform(
        sequence(lit(0), lastIdx),
        i => struct(i.as("ci"), slice(col("toks"), i * lit(stride) + 1, lit(window)).as("ch")))).as("u"))
      .select(col("doc_id"),
        col("u.ci").as("chunk_idx"),
        size(col("u.ch")).as("chunk_tokens"),
        array_join(col("u.ch"), " ").as("chunk_text"))
  }

  /**
   * Pack documents into token-budget training sequences. Docs are laid
   * out in deterministic (groupCol, orderCol) order; each doc joins the
   * sequence holding the running token total so far:
   * seq_no = floor((cumulative_tokens - own_tokens) / budget).
   *
   * The window partitions by `groupCol` (e.g. language), so the running
   * sum never becomes a single global ordering bottleneck — at 100 TB
   * you pack within natural corpus partitions (lang, source, shard),
   * which is also what training mixtures want. A doc longer than the
   * budget still lands in exactly one sequence (greedy, no splitting).
   */
  def packSequences(
      docs: DataFrame, idCol: String, textCol: String, groupCol: String,
      tokenBudget: Int): DataFrame = {
    // explicit ROWS frame: the orderBy default is RANGE, which hands
    // every duplicate orderCol value the whole tie-block's total and
    // breaks the "tokens strictly before this doc" invariant
    val w = Window.partitionBy(groupCol).orderBy(idCol)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs
      .select(col(idCol), col(groupCol),
        size(TextFunctions.tokens(col(textCol))).cast("long").as("n_tokens"))
      .withColumn("_cum", sum(col("n_tokens")).over(w))
      .select(col(idCol), col(groupCol), col("n_tokens"),
        floor((col("_cum") - col("n_tokens")) / tokenBudget).as("seq_no"))
  }

  /**
   * True bin-packing counterpart of [[packSequences]]: best-fit
   * decreasing within each group. The cumulative packer never overflows
   * a SEQUENCE COUNT but can overflow a bin by up to one doc (a doc
   * spanning a budget boundary keeps its whole length in the earlier
   * bin); BFD instead guarantees every bin respects the budget (an
   * oversize doc still lands alone in its own bin) at the cost of a
   * per-group sequential fold — the classical packing-efficiency
   * tradeoff a training pipeline chooses per corpus.
   *
   * Scale shape: ONE shuffle on groupCol + an in-partition sort by
   * (group, tokens desc, id); the fold walks each group once with a
   * TreeSet of open bins (log-time best-fit lookup), so cost is
   * O(n log bins) per group and memory is the OPEN-BIN set, not the
   * group. The sequential dependency is inherent to bin packing — at
   * 100 TB you bound it exactly like packSequences: pack within
   * composite groups (lang, source, shard), which is what training
   * mixtures want anyway. Deterministic on any partitioning: hash
   * repartition by group + a total in-partition order + a
   * deterministic fold.
   */
  def packBestFit(
      docs: DataFrame, idCol: String, textCol: String, groupCol: String,
      tokenBudget: Int): DataFrame = {
    require(tokenBudget > 0, s"tokenBudget must be positive, got $tokenBudget")
    val spark = docs.sparkSession
    import spark.implicits._
    docs
      .select(col(idCol).cast("long").as("id"), col(groupCol).cast("string").as("grp"),
        size(TextFunctions.tokens(col(textCol))).cast("long").as("n_tokens"))
      .repartition(col("grp"))
      .sortWithinPartitions(col("grp"), col("n_tokens").desc, col("id"))
      .as[(Long, String, Long)]
      .mapPartitions { it =>
        // groups are contiguous after the sort; open bins keyed by
        // (remaining, seq_no) — smallest remaining that fits = best fit,
        // ties to the oldest bin
        var curGrp: String = null
        val bins = scala.collection.mutable.TreeSet.empty[(Long, Int)]
        var nextSeq = 0
        it.map { case (id, grp, n) =>
          if (grp != curGrp) { curGrp = grp; bins.clear(); nextSeq = 0 }
          val seq = bins.rangeFrom((n, -1)).headOption match {
            case Some(bin @ (rem, s)) =>
              bins.remove(bin)
              if (rem - n > 0) bins.add((rem - n, s))
              s
            case None =>
              val s = nextSeq
              nextSeq += 1
              if (tokenBudget - n > 0) bins.add((tokenBudget - n, s))
              s
          }
          (id, grp, n, seq)
        }
      }
      .toDF("doc_id", groupCol, "n_tokens", "seq_no")
  }

  /**
   * Benchmark-contamination screen: for every candidate doc, the number
   * of its distinct word n-gram shingles that also occur anywhere in
   * the eval set. Shingles compare as 64-bit hashes (sorted-merge-free
   * here: a plain semi-ish join on the hash), the same collision-exact
   * trick the dedup family uses; the eval side is tiny relative to the
   * corpus, so the join broadcasts at scale.
   *
   * @param evalPred  predicate selecting eval docs (excluded from output)
   */
  def contamination(
      docs: DataFrame, idCol: String, textCol: String,
      evalPred: org.apache.spark.sql.Column, shingleSize: Int): DataFrame = {
    // one compiled kernel call per row (ShingleHashesXx) instead of the
    // zip_with tree: predicate pushdown re-substitutes projection
    // aliases into scan Filters unconditionally, and the declarative
    // chain re-ran the regex split per reference when that happened —
    // the kernel references its token input exactly once, so even a
    // duplicated eval stays one split + one pass
    val sh = graft.search.Knn.widen(docs)
      .select(col(idCol).as("id"), evalPred.as("_is_eval"),
        TextFunctions.tokens(col(textCol)).as("_t"))
      .select(col("id"), col("_is_eval"),
        TextFunctions.shingleHashesXx(col("_t"), shingleSize).as("sh"))
    val evalShingles = sh.where(col("_is_eval"))
      .select(explode(col("sh")).as("s")).distinct()
    val trainShingles = sh.where(!col("_is_eval"))
      .select(col("id"), explode(col("sh")).as("s"))
    val overlap = trainShingles
      .join(evalShingles, Seq("s")) // distinct eval side -> no fanout
      .groupBy("id")
      .agg(count(lit(1)).as("n_overlap"))
    // the left-join base needs ids only — derive it WITHOUT the shingle
    // projection, or this third subtree would re-tokenize the corpus
    docs.where(!evalPred).select(col(idCol).as("id"))
      .join(overlap, Seq("id"), "left")
      .select(col("id"), coalesce(col("n_overlap"), lit(0L)).as("n_overlap"))
  }

  /**
   * [[contamination]] rebuilt for the 100 TB corpus / small eval-set
   * asymmetry: the distinct eval shingle hashes fold into a driver-side
   * Bloom filter (a few MB at fpp=1e-3 even for millions of shingles)
   * that ships in the task closure, and the training side is screened
   * map-side — zero training shingles cross a shuffle. Only docs with
   * at least one Bloom hit (true overlaps plus the fpp sliver) explode
   * their shingles into the exact verify join, so the join input is
   * proportional to the CONTAMINATED corpus fraction, not the corpus.
   * Blooms have no false negatives and the verify join is exact, so the
   * result equals [[contamination]] bit-for-bit — same oracle.
   */
  def contaminationBloom(
      docs: DataFrame, idCol: String, textCol: String,
      evalPred: org.apache.spark.sql.Column, shingleSize: Int,
      fpp: Double = 0.001): DataFrame = {
    // one kernel call per row, token input referenced once — immune to
    // the pushdown alias re-substitution trap (see contamination())
    def shingled(df: DataFrame): DataFrame = df
      .select(col(idCol).as("id"), TextFunctions.tokens(col(textCol)).as("_t"))
      .select(col("id"),
        TextFunctions.shingleHashesXx(col("_t"), shingleSize).as("sh"))
    // the eval side is small by contract (it's a benchmark suite):
    // ONE tiny job (no widen shuffle) collects its distinct shingle
    // hashes, the Bloom is built driver-side, and the exact verify set
    // rides the same broadcast-sized local relation — no eval-side
    // reshuffle, and the cap fails loudly instead of silently OOMing
    // the driver
    val maxEval = 4 << 20
    val evalRows = shingled(docs.where(evalPred))
      .select(explode(col("sh")).as("s")).distinct()
      .limit(maxEval + 1).collect()
    if (evalRows.length > maxEval)
      throw new IllegalStateException(
        s"eval set exceeds $maxEval distinct shingles; use contamination() — its " +
          "shuffle join handles an unbounded eval side")
    // Small eval set (the overwhelmingly common case — it's a benchmark
    // suite): ship the distinct hashes as ONE sorted array and count
    // hits in a scan-stage projection. Zero joins, zero shuffles, zero
    // explode — the exact semantics of explode+join+count against a
    // DISTINCT eval side, one binary search per shingle (the streaming
    // contamination path's kernel, reused for batch). Above the array
    // bound, fall back to Bloom screen + broadcast exact-verify join:
    // the Bloom is ~5x smaller than the sorted array, which matters for
    // a task closure at the 4M cap.
    val maxSorted = 1 << 20 // 8 MB closure
    if (evalRows.length <= maxSorted) {
      val sorted = evalRows.map(_.getLong(0)).sorted
      // coalesce: NULL text -> null shingle array -> null hit count on
      // this path, but contamination() and the Bloom fallback emit 0 via
      // left-join+coalesce; without it pipeline_pretrain's
      // where(n_overlap === 0) would drop NULL-text docs only here
      return shingled(graft.search.Knn.widen(docs.where(!evalPred)))
        .select(col("id"),
          coalesce(graft.functions.hashes.sortedSetHitCount(col("sh"), sorted), lit(0L))
            .as("n_overlap"))
    }
    val bloom = org.apache.spark.util.sketch.BloomFilter
      .create(math.max(evalRows.length.toLong, 1L), fpp)
    evalRows.foreach(r => bloom.putLong(r.getLong(0)))
    val spark = docs.sparkSession
    val evalDf = spark.createDataFrame(
      java.util.Arrays.asList(evalRows: _*),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("s",
          org.apache.spark.sql.types.LongType, nullable = false))))
    // Bloom screen per SHINGLE, above the explode: a condition on the
    // generated column cannot be pushed below the Generate, so the
    // shingle projection runs exactly once per document. The earlier
    // array-level bloomHitCount filter was pushed into the scan and
    // re-substituted per conjunct — four evaluations of the whole
    // shingle chain per document at the 100x rung. Join input volume
    // is identical (blooms have no false negatives; non-hit shingles
    // die before the broadcast verify join either way).
    val overlap = shingled(graft.search.Knn.widen(docs.where(!evalPred)))
      .select(col("id"), explode(col("sh")).as("s"))
      .where(graft.functions.hashes.bloomMightContain(col("s"), bloom))
      .join(broadcast(evalDf), Seq("s")) // exact verify over survivors only
      .groupBy("id")
      .agg(count(lit(1)).as("n_overlap"))
    docs.where(!evalPred).select(col(idCol).as("id"))
      .join(overlap, Seq("id"), "left")
      .select(col("id"), coalesce(col("n_overlap"), lit(0L)).as("n_overlap"))
  }
}
