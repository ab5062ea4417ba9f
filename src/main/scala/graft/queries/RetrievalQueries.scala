package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.vec
import graft.text.TextFunctions.tokens

/**
 * Keyword + hybrid retrieval over the documents corpus — the workload a
 * user of the reference engine (FAISS index inside an OLAP host) actually
 * runs: lexical BM25 ranking next to vector ranking, fused per query.
 *
 * Scale shape: BM25 is one corpus scan for the per-term stats (a 1-row
 * aggregate, broadcast back) plus one scoring scan; top-k goes through
 * TakeOrderedAndProject (per-partition heaps, k rows per partition to the
 * driver-side merge — never a global sort). The RRF fusion then operates
 * on two k-row lists, so the window rank / full-outer join are O(k), not
 * O(corpus). At 100 TB the only full-data costs are the two scans.
 *
 * Numeric discipline: idf uses the rational Robertson form
 * (N - df + 0.5)/(df + 0.5) — no transcendental, so every score is a
 * fixed chain of correctly-rounded IEEE ops over integer-valued inputs
 * and the DuckDB oracle reproduces it bit-for-bit (the ln() of classic
 * BM25 would put us in text_surprisal's libm-ULP territory; ranking is
 * unaffected because the map df -> idf stays strictly monotone).
 */
object RetrievalQueries {

  private[queries] val Terms = Seq("dup", "vector", "scan")
  private val TopN = 100 // per-modality candidate depth fed to fusion
  private val OutK = 20
  // written as the same literals the oracle SQL uses — never as
  // Scala-computed constants (1.2 + 1.0 need not re-parse as 2.2)
  private def k1 = lit(1.2)
  private def k1p1 = lit(2.2)
  private def b = lit(0.75)

  /** (doc_id, score) for every document, BM25 over [[Terms]]. */
  private[queries] def bm25Scored(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.wide(s, dir, "documents")
    val base = d
      .select(col("doc_id"), tokens(col("text")).as("toks"))
      .withColumn("dl", size(col("toks")).cast("double"))
    // one corpus pass -> 1 row of (N, total length, df per term)
    val aggs = Seq(
      count(lit(1)).cast("double").as("n_docs"),
      sum(col("dl")).as("sum_dl")) ++
      Terms.map(t =>
        sum(when(array_contains(col("toks"), t), 1L).otherwise(0L))
          .cast("double").as(s"df_$t"))
    val stats = base.agg(aggs.head, aggs.tail: _*)
    // per-term contribution; op order mirrors the oracle SQL exactly
    def termWeight(t: String): Column = {
      val tf = size(filter(col("toks"), x => x === lit(t))).cast("double")
      val idf = (col("n_docs") - col(s"df_$t") + lit(0.5)) / (col(s"df_$t") + lit(0.5))
      ((tf * k1p1) /
        (tf + k1 * (lit(0.25) + b * col("dl") / (col("sum_dl") / col("n_docs"))))) * idf
    }
    base.crossJoin(broadcast(stats))
      .select(col("doc_id"), Terms.map(termWeight).reduce(_ + _).as("score"))
  }

  /** rank within an already-truncated top-N list (N rows — the window's
    * single partition is intentional and bounded) */
  private def rankTop(df: DataFrame, order: Seq[Column], rankCol: String): DataFrame =
    df.withColumn(rankCol, row_number().over(Window.orderBy(order: _*)).cast("long"))

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // lexical top-20: two scans (stats + score), TakeOrdered top-k
    "text_bm25" -> { (s, dir) =>
      bm25Scored(s, dir)
        .orderBy(col("score").desc, col("doc_id")).limit(OutK)
        .select(col("doc_id"), Tables.quant4(col("score")).as("bm25"))
    },
    // hybrid retrieval: BM25 top-100 and cosine-kNN top-100 fused by
    // reciprocal-rank fusion (1/(60+r), Cormack et al.) — the standard
    // lexical+vector serving pattern, here as ONE Catalyst plan
    "hybrid_rrf" -> { (s, dir) =>
      val kwTop = bm25Scored(s, dir)
        .orderBy(col("score").desc, col("doc_id")).limit(TopN)
      val kw = rankTop(kwTop, Seq(col("score").desc, col("doc_id")), "rank_kw")
        .select(col("doc_id"), col("rank_kw"))

      val e = Tables(s, dir, "embeddings")
      val q = e.where(col("vec_id") === 0)
        .select(vec.vector(col("embedding")).as("qv"))
      val vdTop = e.crossJoin(broadcast(q))
        .select(col("vec_id").as("doc_id"),
          vec.dist("cosine", vec.vector(col("embedding")), col("qv")).as("dist"))
        .orderBy(col("dist").asc, col("doc_id")).limit(TopN)
      val vr = rankTop(vdTop, Seq(col("dist").asc, col("doc_id")), "rank_vec")
        .select(col("doc_id"), col("rank_vec"))

      val rrf =
        when(col("rank_kw").isNull, lit(0.0))
          .otherwise(lit(1.0) / (lit(60.0) + col("rank_kw").cast("double"))) +
        when(col("rank_vec").isNull, lit(0.0))
          .otherwise(lit(1.0) / (lit(60.0) + col("rank_vec").cast("double")))
      kw.join(vr, Seq("doc_id"), "outer")
        .select(col("doc_id"),
          coalesce(col("rank_kw"), lit(0L)).as("rank_kw"),
          coalesce(col("rank_vec"), lit(0L)).as("rank_vec"),
          rrf.as("rrf"))
        .orderBy(col("rrf").desc, col("doc_id")).limit(OutK)
        .select(col("doc_id"), col("rank_kw"), col("rank_vec"),
          Tables.quant8(col("rrf")).as("rrf_score"))
    },
    // the RAG corpus-build flagship: quality gate -> exact-dedup
    // survivors -> join their embeddings -> CATALOG INDEX build ->
    // top-5 serve, curation and indexing composed the way a retrieval
    // corpus actually ships. Exhaustive probing keeps the whole
    // composition exact, so the oracle replays it as filtered brute
    // force. At scale only the gate scan and the one index-build
    // assignment touch the corpus; serving reads probed lists.
    "pipeline_rag" -> { (s, dir) =>
      import graft.index.IndexCatalog
      val d = Tables.wide(s, dir, "documents")
      // partial-aggregating groupBy min over the CONTENT HASH (not the
      // text, not a window): duplicates collapse map-side and only
      // 24-byte (hash, min id) partials shuffle — nothing downstream
      // needs the text column back
      val surv = d
        .select(col("doc_id"), col("text"),
          graft.text.TextFunctions.tokens(col("text")).as("_toks"))
        .where(graft.text.TextFunctions.qualityScoreT(col("text"), col("_toks")) >= 0.6)
        .groupBy(md5(col("text")).as("_h"))
        .agg(min(col("doc_id")).as("doc_id"))
        .select(col("doc_id"))
      val e = Tables(s, dir, "embeddings")
      // r15 (guide §2.4): the corpus frame feeds TWO eager consumers
      // inside the build — the 16384-row training-sample collect and
      // the list-layout cache fill — and each re-ran the quality gate +
      // dedup rollup over documents (2 full kernel passes, r15
      // before-plan). shareExchange finalizes the join once: the
      // survivor aggregate's shuffle and the broadcast build run once,
      // and both consumers re-run only the narrow embeddings-probe
      // tail. Results are invariant: nprobe = nlist = 16 makes the
      // search exhaustive, so even the trained centroids (which the
      // sample feeds) cannot affect the output — and the sample rows
      // themselves are unchanged (the corpus is far below the 16384
      // cap at every gated SF).
      val corpus = graft.sql.PlanPin.shareExchange(
        e.join(surv, e("vec_id") === surv("doc_id"))
          .select(col("vec_id").as("label"), vec.vector(col("embedding")).as("vec")))
      val name = "q_rag_ivf"
      if (IndexCatalog.exists(name)) IndexCatalog.destroy(name)
      IndexCatalog.create(name, 64, "IDMap,IVF16,Flat", "l2sq", Map("nprobe" -> "16"))
      IndexCatalog.add(corpus, name)
      val qs = e.where(col("vec_id") < 10)
        .select(col("vec_id").as("qid"), vec.vector(col("embedding")).as("qvec"))
      IndexCatalog.search(name, 5, qs)
        .select(col("qid"), col("rank"), col("label"),
          Tables.quant4(col("distance")).as("distance"))
    })

  private val toksSql = "string_split_regex(lower(trim(text)), '\\s+')"

  private def termWeightSql(t: String): String = {
    val tf = s"CAST(len(list_filter(toks, x -> x = '$t')) AS DOUBLE)"
    val idf = s"((n_docs - df_$t + 0.5) / (df_$t + 0.5))"
    s"(($tf * 2.2) / ($tf + 1.2 * (0.25 + 0.75 * dl / (sum_dl / n_docs)))) * $idf"
  }

  private val bm25CtesSql: String = {
    val dfAggs = Terms.map(t =>
      s"CAST(sum(CASE WHEN list_contains(toks,'$t') THEN 1 ELSE 0 END) AS DOUBLE) AS df_$t")
      .mkString(",\n  ")
    val score = Terms.map(termWeightSql).mkString(" + ")
    s"""t AS (SELECT doc_id, $toksSql AS toks FROM documents),
       |b AS (SELECT doc_id, toks, CAST(len(toks) AS DOUBLE) AS dl FROM t),
       |st AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs, CAST(sum(dl) AS DOUBLE) AS sum_dl,
       |  $dfAggs
       |  FROM b),
       |sc AS (SELECT doc_id, $score AS score FROM b CROSS JOIN st)""".stripMargin
  }

  def oracles: Map[String, String] = Map(
    "text_bm25" ->
      s"""WITH $bm25CtesSql
         |SELECT doc_id, ${Tables.quant4Sql("score")} AS bm25
         |FROM sc ORDER BY score DESC, doc_id LIMIT $OutK""".stripMargin,
    "hybrid_rrf" ->
      s"""WITH $bm25CtesSql,
         |kw AS (SELECT doc_id, CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS BIGINT) AS rank_kw
         |       FROM sc ORDER BY score DESC, doc_id LIMIT $TopN),
         |q AS (SELECT embedding AS a FROM embeddings WHERE vec_id = 0),
         |vd AS (SELECT e.vec_id AS doc_id,
         |         1.0 - list_cosine_similarity(CAST(q.a AS DOUBLE[]), CAST(e.embedding AS DOUBLE[])) AS dist
         |       FROM embeddings e CROSS JOIN q),
         |vr AS (SELECT doc_id, CAST(row_number() OVER (ORDER BY dist ASC, doc_id) AS BIGINT) AS rank_vec
         |       FROM vd ORDER BY dist ASC, doc_id LIMIT $TopN),
         |fused AS (
         |  SELECT coalesce(kw.doc_id, vr.doc_id) AS doc_id,
         |    coalesce(kw.rank_kw, CAST(0 AS BIGINT)) AS rank_kw,
         |    coalesce(vr.rank_vec, CAST(0 AS BIGINT)) AS rank_vec,
         |    (CASE WHEN kw.rank_kw IS NULL THEN 0.0 ELSE 1.0 / (60.0 + CAST(kw.rank_kw AS DOUBLE)) END)
         |    + (CASE WHEN vr.rank_vec IS NULL THEN 0.0 ELSE 1.0 / (60.0 + CAST(vr.rank_vec AS DOUBLE)) END) AS rrf
         |  FROM kw FULL OUTER JOIN vr ON kw.doc_id = vr.doc_id)
         |SELECT doc_id, rank_kw, rank_vec, ${Tables.quant8Sql("rrf")} AS rrf_score
         |FROM fused ORDER BY rrf DESC, doc_id LIMIT $OutK""".stripMargin,
    // the composed build replayed as filtered brute force: same gate,
    // same canonical-dedup, exhaustive probe = exact L2 top-5
    "pipeline_rag" ->
      s"""WITH ${TextQueries.qualityCtesSql},
         |gated AS (
         |  SELECT doc_id, text FROM f
         |  WHERE ${TextQueries.qualityExprSql} >= 0.6
         |),
         |surv AS (
         |  SELECT doc_id FROM gated
         |  QUALIFY doc_id = min(doc_id) OVER (PARTITION BY text)
         |),
         |q AS (SELECT vec_id AS qid, embedding AS a FROM embeddings WHERE vec_id < 10),
         |c AS (SELECT e.vec_id, e.embedding AS b FROM embeddings e JOIN surv ON e.vec_id = surv.doc_id),
         |d AS (
         |  SELECT q.qid, c.vec_id AS label, ${VectorQueries.l2sqSql} AS dist
         |  FROM q CROSS JOIN c
         |),
         |r AS (
         |  SELECT qid, label, dist,
         |    CAST(row_number() OVER (PARTITION BY qid ORDER BY dist ASC, label) - 1 AS INTEGER) AS rank
         |  FROM d
         |)
         |SELECT qid, rank, label, ${Tables.quant4Sql("dist")} AS distance
         |FROM r WHERE rank < 5""".stripMargin)
}
