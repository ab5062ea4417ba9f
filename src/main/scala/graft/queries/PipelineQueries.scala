package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.text.Pipeline

/**
 * Training-data pipeline assembly + extra host-engine parity queries:
 * sequence packing, contamination screening, int8 embedding
 * quantization, time-range attribution join, EXISTS semi-join.
 */
object PipelineQueries {

  private val TokenBudget = 2048
  private val AttribDays = 3
  private val EvalCutoff = 20L // doc_id < 20 = "benchmark" eval set

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // corpus VERSION diff: what a retrain actually needs to know about
    // a new crawl snapshot — per doc id: added / removed / changed
    // (by content hash). Both sides reduce to (id, md5) projections
    // BEFORE the full-outer id join, so document text never shuffles;
    // at 100 TB the movement is two id+16B-hash streams. Simulated
    // versions from the given table: v1 = ids < 400, v2 = ids >= 100
    // with a text edit planted on 200..209. Exact oracle.
    "corpus_delta" -> { (s, dir) =>
      val d = Tables.wide(s, dir, "documents")
      val v1 = d.where(col("doc_id") < 400).select(col("doc_id"), col("text"))
      val v2 = d.where(col("doc_id") >= 100)
        .select(col("doc_id"),
          when(col("doc_id").between(200, 209), concat(col("text"), lit(" edited")))
            .otherwise(col("text")).as("text"))
      val h1 = v1.select(col("doc_id"), md5(col("text")).as("h1"))
      val h2 = v2.select(col("doc_id"), md5(col("text")).as("h2"))
      h1.join(h2, Seq("doc_id"), "full_outer")
        .select(col("doc_id"),
          when(col("h1").isNull, "added")
            .when(col("h2").isNull, "removed")
            .when(col("h1") =!= col("h2"), "changed")
            .otherwise("unchanged").as("status"))
        .where(col("status") =!= "unchanged")
    },
    // composed end-to-end curation: quality gate -> exact-dedup
    // survivors -> deterministic mixture sample -> train/val split, the
    // operators chained the way a production corpus build runs them.
    // One Catalyst plan end-to-end: the gate is a scan-stage filter,
    // dedup is the single text-key shuffle, sampling/split are
    // content-hash projections — nothing materializes between stages.
    "pipeline_curate" -> { (s, dir) =>
      val d = Tables.wide(s, dir, "documents")
      // tokenize ONCE into a bound column for the gate (see qualityScoreT)
      val gated = d
        .withColumn("_toks", graft.text.TextFunctions.tokens(col("text")))
        .where(graft.text.TextFunctions.qualityScoreT(col("text"), col("_toks")) >= 0.6)
        .drop("_toks")
      // canonical survivor per CONTENT HASH via a partial-aggregating
      // struct min (map-side combine collapses duplicate texts BEFORE
      // the shuffle, and the shuffle carries ~50-byte (hash, id, lang)
      // rows — never document text); the downstream sample/split
      // buckets are md5-prefix functions, so they re-derive from the
      // same hash instead of needing the text column back
      val surv = gated
        .groupBy(md5(col("text")).as("_h"))
        .agg(min(struct(col("doc_id"), col("lang"))).as("c"))
        .select(col("c.doc_id").as("doc_id"), col("c.lang").as("lang"), col("_h"))
      val bucket = conv(substring(col("_h"), 1, 4), 16, 10).cast("int") % 10000
      val rate = when(col("lang") === "en", 9000)
        .when(col("lang") === "de", 5000)
        .otherwise(2500)
      surv.where(bucket < rate)
        .select(col("doc_id"), col("lang"),
          when(bucket % 10 < 9, lit("train")).otherwise(lit("val")).as("split"))
    },
    // token-budget sequence packing, windowed per language (the packing
    // partition a real mixture pipeline would use at 100 TB)
    "pack_sequences" -> { (s, dir) =>
      Pipeline.packSequences(Tables(s, dir, "documents"), "doc_id", "text", "lang", TokenBudget)
    },
    // best-fit-decreasing packing: every bin respects the token budget
    // (the cumulative packer can overflow a bin by one doc). EXACT
    // since round 9: the stateful fold replays in a DuckDB recursive
    // CTE (open-bin list as sorted STRUCT array, one doc per recursion
    // step per group) — plus the budget-cap and partitioning-invariance
    // specs (PipelineQueriesSpec).
    "pack_bestfit" -> { (s, dir) =>
      Pipeline.packBestFit(Tables(s, dir, "documents"), "doc_id", "text", "lang", TokenBudget)
    },
    // eval-set n-gram overlap per training doc (contamination screen)
    "contamination" -> { (s, dir) =>
      Pipeline.contamination(
          Tables(s, dir, "documents"), "doc_id", "text",
          col("doc_id") < EvalCutoff, shingleSize = 3)
        .select(col("id").as("doc_id"), col("n_overlap"))
    },
    // broadcast-Bloom twin of `contamination`: eval shingles fold to a
    // driver Bloom shipped in the closure, training shingles never
    // shuffle, and only Bloom-hit docs reach the exact verify join.
    // No false negatives + exact verify -> bit-identical output, SAME
    // exact oracle as `contamination`.
    "contamination_bloom" -> { (s, dir) =>
      Pipeline.contaminationBloom(
          Tables(s, dir, "documents"), "doc_id", "text",
          col("doc_id") < EvalCutoff, shingleSize = 3)
        .select(col("id").as("doc_id"), col("n_overlap"))
    },
    // symmetric int8 quantization round-trip: per-vector scale and the
    // max absolute dequantization error (the compression/fidelity
    // tradeoff check before shipping embeddings at scale)
    "embed_quantize" -> { (s, dir) =>
      val va = col("embedding").cast("array<double>")
      val withScale = Tables(s, dir, "embeddings")
        .select(col("vec_id"), va.as("va"),
          array_max(transform(va, x => abs(x))).as("scale"))
      // `scale` is a bound attribute here, so lambda references are
      // cheap (re-evaluating a full expression per element is the
      // HOF O(n^2) trap). Quantize with floor(v + 0.5), not round():
      // engines disagree on round() ties (decimal-string HALF_UP vs
      // binary std::round), while floor/+/*// are IEEE-exact both sides.
      val codes = transform(col("va"), x => floor(x / col("scale") * 127 + 0.5))
      val errs = zip_with(col("va"), codes, (x, c) => abs(x - c * col("scale") / 127.0))
      // quantize in a SEPARATE projection: aliasing quant4(scale) AS
      // "scale" in the same select shadows the input column, and HOF
      // lambda refs resolve late — they'd silently bind to the
      // quantized output instead of the raw scale the math needs
      withScale
        .select(col("vec_id"), col("scale"),
          when(col("scale") === 0, 0.0).otherwise(array_max(errs)).as("_max_err"))
        .select(
          col("vec_id"),
          Tables.quant4(col("scale")).as("scale"),
          Tables.quant4(col("_max_err")).as("max_err"))
    },
    // time-range attribution join: events a customer produced within
    // AttribDays after each of their orders (equi-join on the customer
    // key + range predicate -> one bounded hash-join shuffle at scale)
    "events_range_join" -> { (s, dir) =>
      val ev = Tables.events(s, dir)
        .select(col("user_id"), col("ts"), col("event_id"), col("value"))
      Tables(s, dir, "orders")
        .join(ev,
          col("user_id") === col("o_custkey") &&
            col("ts") >= col("o_orderdate") &&
            col("ts") < col("o_orderdate") + expr(s"INTERVAL $AttribDays DAYS"),
          "left")
        .groupBy("o_orderkey")
        .agg(
          count(col("event_id")).as("n_events"),
          coalesce(Tables.moneySum(col("value")), lit(0.0)).as("value_sum"))
    },
    // domain-mixture sampling: per-language keep rates applied on a
    // content-hash bucket — deterministic across runs, engines, and
    // partitionings (never random() in a pipeline), the weighted
    // counterpart of sample_split
    "mixture_sample" -> { (s, dir) =>
      val bucket = contentBucket
      val rate = when(col("lang") === "en", 9000)
        .when(col("lang") === "de", 5000)
        .otherwise(2500)
      Tables(s, dir, "documents")
        .where(bucket < rate)
        .select(col("doc_id"), col("lang"))
    },
    // temperature-scaled source mixture (the multilingual-LM sqrt-
    // sampling rule, alpha = 0.5): unlike mixture_sample's HANDED-IN
    // weights, the keep rates are COMPUTED from corpus counts —
    // p_s ∝ sqrt(n_s), budget M = N/2 — then applied as the same
    // deterministic content-hash bucket threshold. Every number is
    // either an exact integer aggregate or a fixed single-expression
    // IEEE chain (sqrt is correctly rounded; the cross-source
    // normalizer sums FIXED-POINT sqrt values so no order-dependent
    // double addition survives), so the realized sample is
    // bit-identical across engines/runs/partitionings. Plan: tiny
    // source rollup → 1-row total → broadcast rate join → scan-stage
    // bucket filter; documents shuffle once for the map-side-combined
    // count, never for the sampling itself.
    "sample_temperature" -> { (s, dir) =>
      val docs = Tables(s, dir, "documents")
      val stats = docs.groupBy("source").agg(count(lit(1)).as("n_s"))
        .withColumn("ssq",
          floor(sqrt(col("n_s").cast("double")) * lit(1000000.0)).cast("long"))
      val tot = stats.agg(
        sum("ssq").as("s_fp"), sum("n_s").as("n_tot"))
      val rates = stats.crossJoin(broadcast(tot))
        .withColumn("m", floor(col("n_tot").cast("double") / 2).cast("long"))
        .withColumn("rate_bp",
          least(lit(10000.0),
            floor(lit(10000.0) * col("m").cast("double") * col("ssq").cast("double")
              / col("s_fp").cast("double") / col("n_s").cast("double")))
            .cast("int"))
        .select("source", "rate_bp")
      docs.join(broadcast(rates), "source")
        .where(contentBucket < col("rate_bp"))
        .select(col("doc_id"), col("source"))
    },
    // mixture QA: realized vs target keep rate per language for
    // mixture_sample's handed-in rates — the report that catches a
    // drifted content-hash bucket or a bad rate table before a mix
    // ships. One conditional rollup per lang; deviation in signed bp.
    // Exact (the bucket predicate is the engine-wide deterministic
    // contract).
    "mixture_report" -> { (s, dir) =>
      val bucket = contentBucket
      val rate = when(col("lang") === "en", 9000)
        .when(col("lang") === "de", 5000)
        .otherwise(2500)
      Tables(s, dir, "documents")
        .select(col("lang"), rate.as("target_bp"),
          when(bucket < rate, 1L).otherwise(0L).as("kept"))
        .groupBy("lang", "target_bp")
        .agg(count(lit(1)).as("n_total"), sum("kept").as("n_kept"))
        .select(col("lang"), col("n_total"), col("n_kept"), col("target_bp"),
          expr("(n_kept * 10000L) div n_total").as("realized_bp"),
          (expr("(n_kept * 10000L) div n_total") - col("target_bp")).as("deviation_bp"))
    },
    // TOKEN-budget mixture (what a real pretraining mix specifies —
    // "30B tokens of code, 10B of wiki" — rather than doc-count
    // rates): per language, docs admit in deterministic content-hash
    // order until the language's token budget fills; the boundary doc
    // that crosses the line is included (budgets are soft caps). One
    // shuffle per lang window over (id, bucket, n_tokens) longs — the
    // doc text never moves. Exact: integer token counts, integer
    // budgets, the same total (bucket, doc_id) order both engines.
    "mixture_token_budget" -> { (s, dir) =>
      val budget = when(col("lang") === "en", 12000L)
        .when(col("lang") === "de", 6000L)
        .otherwise(3000L)
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("lang").orderBy(col("bucket"), col("doc_id"))
      Tables(s, dir, "documents")
        .select(col("doc_id"), col("lang"), contentBucket.as("bucket"),
          size(graft.text.TextFunctions.tokens(col("text"))).cast("long").as("n_tokens"))
        .withColumn("cum", sum("n_tokens").over(w))
        .where(col("cum") - col("n_tokens") < budget)
        .select(col("doc_id"), col("lang"), col("n_tokens"), col("cum"))
    },
    // the >1-epoch complement of mixture_sample: per-domain epoch
    // weights (DoReMi-style) materialized as deterministic row copies —
    // floor(epochs) guaranteed copies plus one more for the content-hash
    // bucket fraction, so the REALIZED mix converges to the weights with
    // zero randomness (same rows on any engine/partitioning/run). The
    // expansion is a scan-stage explode of a per-row sequence: no
    // shuffle, and output size is exactly sum(epochs_d * |domain d|).
    "mixture_upsample" -> { (s, dir) =>
      val bucket = contentBucket
      // epochs: en 2.3, zh 1.0, es 0.6, de 1.5, fr 0.0 (dropped) —
      // written as integer + fractional-bucket parts (no float division)
      val intPart = when(col("lang") === "en", 2L)
        .when(col("lang") === "zh", 1L)
        .when(col("lang") === "de", 1L)
        .otherwise(0L)
      val fracBuckets = when(col("lang") === "en", 3000)
        .when(col("lang") === "es", 6000)
        .when(col("lang") === "de", 5000)
        .otherwise(0)
      val nCopies = intPart + when(bucket < fracBuckets, 1L).otherwise(0L)
      Tables(s, dir, "documents")
        .select(col("doc_id"), col("lang"), nCopies.as("n_copies"))
        .where(col("n_copies") > 0)
        .select(col("doc_id"), col("lang"),
          explode(sequence(lit(0L), col("n_copies") - 1L)).as("copy"))
    },
    // referential-integrity audit between the text corpus and its
    // embedding table (the orphan report every multi-table corpus needs
    // before training): docs without vectors, vectors without docs,
    // and the matched count — two full-outer-joined id projections,
    // nothing but ids shuffle. Exact.
    "corpus_integrity" -> { (s, dir) =>
      val d = Tables(s, dir, "documents").select(col("doc_id").as("id"))
        .withColumn("has_doc", lit(1))
      val e = Tables(s, dir, "embeddings").select(col("vec_id").as("id"))
        .withColumn("has_vec", lit(1))
      d.join(e, Seq("id"), "full_outer")
        .agg(count(when(col("has_doc").isNotNull && col("has_vec").isNotNull, 1))
            .as("n_matched"),
          count(when(col("has_vec").isNull, 1)).as("n_docs_without_vec"),
          count(when(col("has_doc").isNull, 1)).as("n_vecs_without_doc"))
    },
    // the NIGHTLY INCREMENT: what actually enters the corpus from a new
    // crawl snapshot — recrawls of unchanged content drop against the
    // existing corpus's content hashes (Dedup.incremental: only id +
    // 16-byte hashes cross the wire from the old corpus), within-batch
    // dups collapse, and the survivors pass the quality gate. Same
    // simulated versions as corpus_delta (v1 = ids < 400, v2 = ids ≥
    // 100 with planted edits on 200..209). One plan; exact oracle.
    "pipeline_increment" -> { (s, dir) =>
      val d = Tables.wide(s, dir, "documents")
      val v1 = d.where(col("doc_id") < 400).select(col("doc_id"), col("text"))
      val v2 = d.where(col("doc_id") >= 100)
        .select(col("doc_id"), col("lang"),
          when(col("doc_id").between(200, 209), concat(col("text"), lit(" edited")))
            .otherwise(col("text")).as("text"))
      val fresh = graft.dedup.Dedup.incremental(v1, v2, "doc_id", "text")
      // tokens bound once; the score is then used twice (gate + the
      // fixed-point emit) without re-splitting per reference
      v2.join(fresh.select(col("keep_id").as("doc_id")), Seq("doc_id"), "left_semi")
        .select(col("doc_id"), col("lang"), col("text"),
          graft.text.TextFunctions.tokens(col("text")).as("_toks"))
        .where(graft.text.TextFunctions.qualityScoreT(col("text"), col("_toks")) >= 0.6)
        .select(col("doc_id"), col("lang"),
          floor(graft.text.TextFunctions.qualityScoreT(col("text"), col("_toks")) * 10000 + 0.5)
            .cast("long").as("quality_fp"))
        .orderBy("doc_id")
    },
    // the FLAGSHIP pretraining corpus build — quality gate →
    // exact-dedup survivors → benchmark decontamination → DSIR
    // importance selection → deterministic shard/position layout, the
    // five stages a production corpus build chains, in ONE Catalyst
    // plan with nothing materialized between stages. Every stage is
    // individually oracle-gated elsewhere; because each is
    // deterministic-exact, the COMPOSITION carries a full chained SQL
    // oracle too. Scale: the dedup stage moves each DISTINCT surviving
    // text exactly once (map-side combine collapses duplicates before
    // the shuffle — the minimum possible when the text feeds the
    // decontam/DSIR stages downstream; operators that don't need text
    // back, like pipeline_curate/pipeline_rag, dedup on the 16-byte
    // hash instead), decontam shuffles shingle hashes only, DSIR is
    // the two-pass count+score shape over the CLEAN candidates, and
    // the final layout windows over the 300-row selection.
    "pipeline_pretrain" -> { (s, dir) =>
      import graft.text.TextFunctions
      val d = Tables.wide(s, dir, "documents")
      // tokens bound BEFORE the gate: qualityScore reads the token
      // array ~6 times, and on a raw split expression that is 6 regex
      // splits per row (measured 4x the whole gate at the 100x rung)
      val gated = d
        .select(col("doc_id"), col("lang"), col("text"),
          TextFunctions.tokens(col("text")).as("_toks"))
        .where(TextFunctions.qualityScoreT(col("text"), col("_toks")) >= 0.6)
      val surv = gated.groupBy(col("text"))
        .agg(min(struct(col("doc_id"), col("lang"))).as("c"))
        .select(col("c.doc_id").as("doc_id"), col("c.lang").as("lang"), col("text"))
      // Bloom twin, not the join-based screen: bit-identical output
      // (no false negatives + exact verify join — contamination_bloom
      // shares contamination's oracle verbatim) at ~1/4 the cost; the
      // 100x rung put the join-based screen at 62 s of pretrain's 69 s
      val clean = surv.where(col("doc_id") >= EvalCutoff)
        .join(Pipeline.contaminationBloom(d, "doc_id", "text", col("doc_id") < EvalCutoff, 3)
            .where(col("n_overlap") === 0L).select(col("id").as("doc_id")),
          Seq("doc_id"), "left_semi")
      // bound column, not the raw split expr — see sample_importance
      val toks = col("toks")
      val feats = clean
        .select(col("doc_id"), col("lang"),
          TextFunctions.tokens(col("text")).as("toks"))
        .select(col("doc_id"), col("lang"),
        explode(
          when(size(toks) >= 2,
            transform(sequence(lit(1), size(toks) - 1),
              i => conv(substring(md5(concat(
                  element_at(toks, i), lit(" "), element_at(toks, i + 1))), 1, 4), 16, 10)
                .cast("long") % 4096L))
            .otherwise(array().cast("array<long>"))).as("b"))
      val ppm = feats.groupBy("b")
        .agg(count(lit(1)).as("c_raw"),
          count(when(col("lang") === "en", 1)).as("c_tgt"))
        .select(col("b"),
          expr("((c_tgt + 1L) * 1000000L) div (c_raw + 1L)").as("ppm"))
      val picked = feats.join(broadcast(ppm), "b")
        .groupBy("doc_id")
        .agg(expr("sum(ppm) div count(*)").as("avg_ppm"))
        .orderBy(col("avg_ppm").desc, col("doc_id"))
        .limit(300)
      val h = md5(concat(lit("shard:"), col("doc_id").cast("string")))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("shard").orderBy(col("h"), col("doc_id"))
      picked.select(col("doc_id"), col("avg_ppm"), h.as("h"),
          (conv(substring(h, 1, 4), 16, 10).cast("int") % 8).as("shard"))
        .withColumn("pos", row_number().over(w))
        .select(col("doc_id"), col("shard"), col("pos"), col("avg_ppm"))
    },
    // DSIR-style importance resampling (Xie et al. 2023, "Data
    // Selection for Language Models via Importance Resampling"): score
    // each doc by how much likelier its hashed word-bigram features are
    // under the TARGET distribution (the lang='en' slice stands in for
    // "high-quality target domain") than under the raw corpus, keep the
    // top-M. The paper's score is sum log(p_tgt(f)/p_raw(f)); log is a
    // libm-ULP hazard cross-engine (the text_surprisal lesson), so the
    // ratio stays RATIONAL: bucket f contributes
    // ((c_tgt+1)*1e6) div (c_raw+1) ppm (add-one smoothing) and a doc
    // scores the integer mean over its feature occurrences — same
    // ordering intent, bit-exact on any engine. Plan: ONE bigram-hash
    // TWO corpus passes — the count-building pass and the scoring pass,
    // the same two passes the published DSIR pipeline makes (a shared
    // materialization would shuffle or cache every exploded pair;
    // re-scanning the source columns is cheaper at any scale). The
    // count pass map-side-combines into ≤4096 buckets before its only
    // shuffle; the ≤4096-row
    // ppm table broadcasts back; top-M is a distributed TakeOrdered —
    // at 100 TB nothing but (doc_id, bucket) pairs and one tiny ratio
    // table ever move.
    "sample_importance" -> { (s, dir) =>
      // tokenize into a BOUND column first: element_at(<split expr>, i)
      // inside the bigram lambda would re-run the regex split per
      // element (the HOF O(n^2) trap) — measured 5x the query at the
      // 100x rung. With `toks` an attribute, the lambda is O(1) lookups.
      val toks = col("toks")
      val feats = Tables.wide(s, dir, "documents")
        .select(col("doc_id"), col("lang"),
          graft.text.TextFunctions.tokens(col("text")).as("toks"))
        .select(col("doc_id"), col("lang"),
          explode(
            when(size(toks) >= 2,
              transform(sequence(lit(1), size(toks) - 1),
                i => conv(substring(md5(concat(
                    element_at(toks, i), lit(" "), element_at(toks, i + 1))), 1, 4), 16, 10)
                  .cast("long") % 4096L))
              .otherwise(array().cast("array<long>"))).as("b"))
      // raw and target tallies in ONE conditional aggregate — a second
      // target-filtered rollup would cost another corpus pass
      val ppm = feats.groupBy("b")
        .agg(count(lit(1)).as("c_raw"),
          count(when(col("lang") === "en", 1)).as("c_tgt"))
        .select(col("b"),
          expr("((c_tgt + 1L) * 1000000L) div (c_raw + 1L)").as("ppm"))
      feats.join(broadcast(ppm), "b")
        .groupBy("doc_id", "lang")
        .agg(expr("sum(ppm) div count(*)").as("avg_ppm"))
        .orderBy(col("avg_ppm").desc, col("doc_id"))
        .limit(200)
    },
    // TPC-H Q4-style EXISTS: orders with any late-shipping lineitem
    "q4_priority" -> { (s, dir) =>
      val li = Tables(s, dir, "lineitem").select(col("l_orderkey"), col("l_shipdate"))
      Tables(s, dir, "orders")
        .join(li,
          col("l_orderkey") === col("o_orderkey") &&
            col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS"),
          "left_semi")
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n_orders"))
    })

  /** deterministic content-hash bucket in [0, 10000): the cross-engine
    * sampling contract shared by mixture/upsample/split — ONE definition
    * so the Spark and DuckDB sides can never drift apart per query */
  private def contentBucket =
    conv(substring(md5(col("text")), 1, 4), 16, 10).cast("int") % 10000

  private val contentBucketSql =
    "CAST(('0x' || substring(md5(text), 1, 4)) AS INTEGER) % 10000"

  private val toksSql = "string_split_regex(lower(trim(text)), '\\s+')"
  private val shingles3Sql =
    """list_distinct(CASE WHEN len(toks) >= 3
      |  THEN [toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] FOR i IN range(1, len(toks)-1)]
      |  ELSE [] END)""".stripMargin

  def oracles: Map[String, String] = Map(
    "corpus_delta" ->
      """WITH v1 AS (SELECT doc_id, md5(text) AS h1 FROM documents WHERE doc_id < 400),
        |v2 AS (
        |  SELECT doc_id,
        |    md5(CASE WHEN doc_id BETWEEN 200 AND 209 THEN text || ' edited' ELSE text END) AS h2
        |  FROM documents WHERE doc_id >= 100
        |)
        |SELECT COALESCE(v1.doc_id, v2.doc_id) AS doc_id,
        |  CASE WHEN v1.doc_id IS NULL THEN 'added'
        |       WHEN v2.doc_id IS NULL THEN 'removed'
        |       WHEN h1 <> h2 THEN 'changed'
        |       ELSE 'unchanged' END AS status
        |FROM v1 FULL OUTER JOIN v2 ON v1.doc_id = v2.doc_id
        |WHERE (CASE WHEN v1.doc_id IS NULL THEN 'added'
        |            WHEN v2.doc_id IS NULL THEN 'removed'
        |            WHEN h1 <> h2 THEN 'changed'
        |            ELSE 'unchanged' END) <> 'unchanged'""".stripMargin,
    "pipeline_curate" ->
      s"""WITH ${TextQueries.qualityCtesSql},
         |gated AS (
         |  SELECT doc_id, lang, text FROM f
         |  WHERE ${TextQueries.qualityExprSql} >= 0.6
         |),
         |surv AS (
         |  SELECT doc_id, lang, text,
         |    $contentBucketSql AS bucket
         |  FROM gated
         |  QUALIFY doc_id = min(doc_id) OVER (PARTITION BY text)
         |)
         |SELECT doc_id, lang,
         |  CASE WHEN bucket % 10 < 9 THEN 'train' ELSE 'val' END AS split
         |FROM surv
         |WHERE bucket < CASE lang WHEN 'en' THEN 9000 WHEN 'de' THEN 5000 ELSE 2500 END""".stripMargin,
    "pack_sequences" ->
      s"""WITH t AS (
         |  SELECT doc_id, lang, CAST(len($toksSql) AS BIGINT) AS n_tokens FROM documents
         |)
         |SELECT doc_id, lang, n_tokens,
         |  CAST(floor((sum(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
         |    ROWS UNBOUNDED PRECEDING) - n_tokens) / $TokenBudget) AS BIGINT) AS seq_no
         |FROM t""".stripMargin,
    // BFD replayed as a sequential fold: one recursion step per doc
    // (parallel across groups), open bins carried as a sorted
    // STRUCT(rem, s) list — "smallest remaining that fits, ties to the
    // oldest bin" is list_sort + first-match, exactly the TreeSet
    // rangeFrom((n, -1)) rule in Pipeline.packBestFit
    "pack_bestfit" ->
      s"""WITH RECURSIVE t AS (
         |  SELECT lang AS grp, doc_id, CAST(len($toksSql) AS BIGINT) AS n,
         |    row_number() OVER (PARTITION BY lang
         |      ORDER BY CAST(len($toksSql) AS BIGINT) DESC, doc_id) AS rn
         |  FROM documents
         |),
         |steps AS (
         |  SELECT grp, 0::BIGINT AS rn, CAST(NULL AS BIGINT) AS doc_id,
         |         CAST(NULL AS BIGINT) AS n, CAST(NULL AS INTEGER) AS seq,
         |         CAST([] AS STRUCT(rem BIGINT, s INTEGER)[]) AS bins, 0 AS next_seq
         |  FROM (SELECT DISTINCT grp FROM t)
         |  UNION ALL
         |  SELECT s.grp, t.rn, t.doc_id, t.n,
         |    CASE WHEN fit IS NOT NULL THEN fit.s ELSE s.next_seq END AS seq,
         |    CASE WHEN fit IS NOT NULL THEN
         |      list_sort(
         |        CASE WHEN fit.rem - t.n > 0
         |          THEN list_append(list_filter(s.bins, b -> b <> fit),
         |                           {'rem': fit.rem - t.n, 's': fit.s})
         |          ELSE list_filter(s.bins, b -> b <> fit) END)
         |    ELSE
         |      CASE WHEN $TokenBudget - t.n > 0
         |        THEN list_sort(list_append(s.bins, {'rem': $TokenBudget - t.n, 's': s.next_seq}))
         |        ELSE s.bins END
         |    END AS bins,
         |    CASE WHEN fit IS NOT NULL THEN s.next_seq ELSE s.next_seq + 1 END AS next_seq
         |  FROM steps s
         |  JOIN t ON t.grp = s.grp AND t.rn = s.rn + 1
         |  LEFT JOIN LATERAL (
         |    SELECT list_sort(list_filter(s.bins, b -> b.rem >= t.n))[1] AS fit
         |  ) ON TRUE
         |)
         |SELECT doc_id, grp AS lang, n AS n_tokens, CAST(seq AS INTEGER) AS seq_no
         |FROM steps WHERE rn > 0""".stripMargin,
    "contamination" ->
      s"""WITH t AS (SELECT doc_id, $toksSql AS toks FROM documents),
         |sh AS (SELECT doc_id, $shingles3Sql AS sh FROM t),
         |ev AS (SELECT DISTINCT unnest(sh) AS s FROM sh WHERE doc_id < $EvalCutoff),
         |tr AS (SELECT doc_id, unnest(sh) AS s FROM sh WHERE doc_id >= $EvalCutoff),
         |cnt AS (SELECT doc_id, count(*) AS n_overlap FROM tr JOIN ev USING (s) GROUP BY doc_id)
         |SELECT s2.doc_id, coalesce(c.n_overlap, CAST(0 AS BIGINT)) AS n_overlap
         |FROM (SELECT doc_id FROM sh WHERE doc_id >= $EvalCutoff) s2
         |LEFT JOIN cnt c USING (doc_id)""".stripMargin,
    // the Bloom screen is exact end-to-end (no false negatives + exact
    // verify join), so it shares contamination's oracle verbatim
    "contamination_bloom" ->
      s"""WITH t AS (SELECT doc_id, $toksSql AS toks FROM documents),
         |sh AS (SELECT doc_id, $shingles3Sql AS sh FROM t),
         |ev AS (SELECT DISTINCT unnest(sh) AS s FROM sh WHERE doc_id < $EvalCutoff),
         |tr AS (SELECT doc_id, unnest(sh) AS s FROM sh WHERE doc_id >= $EvalCutoff),
         |cnt AS (SELECT doc_id, count(*) AS n_overlap FROM tr JOIN ev USING (s) GROUP BY doc_id)
         |SELECT s2.doc_id, coalesce(c.n_overlap, CAST(0 AS BIGINT)) AS n_overlap
         |FROM (SELECT doc_id FROM sh WHERE doc_id >= $EvalCutoff) s2
         |LEFT JOIN cnt c USING (doc_id)""".stripMargin,
    "embed_quantize" ->
      s"""WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS va FROM embeddings),
         |s AS (SELECT vec_id, va, list_max([abs(x) FOR x IN va]) AS scale FROM v)
         |SELECT vec_id,
         |  ${Tables.quant4Sql("scale")} AS scale,
         |  ${Tables.quant4Sql(
             "CASE WHEN scale = 0 THEN 0.0 ELSE " +
               "list_max([abs(x - floor(x / scale * 127 + 0.5) * scale / 127.0) FOR x IN va]) END")} AS max_err
         |FROM s""".stripMargin,
    "events_range_join" ->
      s"""SELECT o.o_orderkey,
         |  count(e.event_id) AS n_events,
         |  coalesce(${Tables.moneySumSql("e.value")}, 0.0) AS value_sum
         |FROM orders o LEFT JOIN events e
         |  ON e.user_id = o.o_custkey
         | AND CAST(e.ts AS TIMESTAMP) >= o.o_orderdate
         | AND CAST(e.ts AS TIMESTAMP) < o.o_orderdate + INTERVAL $AttribDays DAY
         |GROUP BY o.o_orderkey""".stripMargin,
    "mixture_sample" ->
      s"""SELECT doc_id, lang FROM documents
        |WHERE $contentBucketSql <
        |  CASE WHEN lang = 'en' THEN 9000 WHEN lang = 'de' THEN 5000 ELSE 2500 END""".stripMargin,
    "corpus_integrity" ->
      """SELECT
        |  count(CASE WHEN d.doc_id IS NOT NULL AND e.vec_id IS NOT NULL THEN 1 END) AS n_matched,
        |  count(CASE WHEN e.vec_id IS NULL THEN 1 END) AS n_docs_without_vec,
        |  count(CASE WHEN d.doc_id IS NULL THEN 1 END) AS n_vecs_without_doc
        |FROM documents d FULL OUTER JOIN embeddings e ON d.doc_id = e.vec_id""".stripMargin,
    // version diff + incremental-dedup survivor + quality gate replayed
    "pipeline_increment" ->
      s"""WITH v1 AS (SELECT doc_id, text FROM documents WHERE doc_id < 400),
         |v2 AS (
         |  SELECT doc_id, lang,
         |    CASE WHEN doc_id BETWEEN 200 AND 209 THEN text || ' edited' ELSE text END AS text
         |  FROM documents WHERE doc_id >= 100
         |),
         |ch AS (SELECT DISTINCT md5(text) AS h FROM v1),
         |canon AS (
         |  SELECT md5(text) AS h, min(doc_id) AS keep_id FROM v2 GROUP BY text
         |),
         |surv AS (
         |  SELECT keep_id AS doc_id FROM canon
         |  WHERE h NOT IN (SELECT h FROM ch)
         |),
         |kept AS (
         |  SELECT v2.doc_id, v2.lang, v2.text FROM v2 JOIN surv USING (doc_id)
         |),
         |t AS (SELECT doc_id, lang, text, string_split_regex(lower(trim(text)), '\\s+') AS toks FROM kept),
         |f AS (
         |  SELECT doc_id, lang, text, toks,
         |    CASE WHEN len(toks) > 0
         |      THEN CAST(len(list_distinct(toks)) AS DOUBLE) / CAST(len(toks) AS DOUBLE)
         |      ELSE 0.0 END AS uniq_ratio,
         |    CASE WHEN len(toks) > 0
         |      THEN CAST(len(list_filter(toks, x -> list_contains(['the','a','an','and','or','of','to','in','is','it','for','on','with','as','at','by'], x))) AS DOUBLE)
         |           / CAST(len(toks) AS DOUBLE)
         |      ELSE 0.0 END AS stop_ratio,
         |    CASE WHEN length(text) > 0
         |      THEN CAST(length(text) - length(regexp_replace(text, '[.,;:!?''"()\\[\\]{}-]', '', 'g')) AS DOUBLE)
         |           / CAST(length(text) AS DOUBLE)
         |      ELSE 0.0 END AS punct_ratio,
         |    least(CAST(len(toks) AS DOUBLE) / 64.0, 1.0) AS len_score
         |  FROM t
         |)
         |SELECT doc_id, lang,
         |  CAST(floor((${TextQueries.qualityExprSql}) * 10000 + 0.5) AS BIGINT) AS quality_fp
         |FROM f
         |WHERE ${TextQueries.qualityExprSql} >= 0.6""".stripMargin,
    // the full five-stage chain replayed: quality CTEs + min-id dedup +
    // shingle decontamination + bigram-ppm DSIR + md5 shard layout
    "pipeline_pretrain" ->
      s"""WITH ${TextQueries.qualityCtesSql},
         |gated AS (
         |  SELECT doc_id, lang, text FROM f
         |  WHERE ${TextQueries.qualityExprSql} >= 0.6
         |),
         |surv AS (
         |  SELECT doc_id, lang, text FROM gated
         |  QUALIFY doc_id = min(doc_id) OVER (PARTITION BY text)
         |),
         |sh AS (SELECT doc_id, $shingles3Sql AS sh FROM t),
         |ev AS (SELECT DISTINCT unnest(sh) AS s FROM sh WHERE doc_id < $EvalCutoff),
         |tr AS (SELECT doc_id, unnest(sh) AS s FROM sh WHERE doc_id >= $EvalCutoff),
         |dirty AS (SELECT DISTINCT tr.doc_id FROM tr JOIN ev USING (s)),
         |clean AS (
         |  SELECT doc_id, lang, text FROM surv
         |  WHERE doc_id >= $EvalCutoff
         |    AND doc_id NOT IN (SELECT doc_id FROM dirty)
         |),
         |ct AS (SELECT doc_id, lang, $toksSql AS toks FROM clean),
         |fb AS (
         |  SELECT doc_id, lang,
         |    unnest([CAST(('0x' || substring(md5(toks[i] || ' ' || toks[i+1]), 1, 4)) AS BIGINT) % 4096
         |            FOR i IN range(1, len(toks))]) AS b
         |  FROM ct WHERE len(toks) >= 2
         |),
         |cr AS (
         |  SELECT b, count(*) AS c_raw,
         |    count(*) FILTER (lang = 'en') AS c_tgt
         |  FROM fb GROUP BY b
         |),
         |r AS (
         |  SELECT b, CAST(((c_tgt + 1) * 1000000) // (c_raw + 1) AS BIGINT) AS ppm FROM cr
         |),
         |sc AS (
         |  SELECT doc_id, CAST(sum(ppm) // count(*) AS BIGINT) AS avg_ppm
         |  FROM fb JOIN r USING (b) GROUP BY doc_id
         |),
         |picked AS (
         |  SELECT doc_id, avg_ppm FROM sc ORDER BY avg_ppm DESC, doc_id LIMIT 300
         |),
         |laid AS (
         |  SELECT doc_id, avg_ppm, md5('shard:' || CAST(doc_id AS VARCHAR)) AS h,
         |    CAST(('0x' || substring(md5('shard:' || CAST(doc_id AS VARCHAR)), 1, 4)) AS INTEGER) % 8 AS shard
         |  FROM picked
         |)
         |SELECT doc_id, shard,
         |  CAST(row_number() OVER (PARTITION BY shard ORDER BY h, doc_id) AS INTEGER) AS pos,
         |  avg_ppm
         |FROM laid""".stripMargin,
    // identical hash→bucket→integer-ppm chain; integer division (div
    // vs //) truncates identically for the all-positive operands here
    "sample_importance" ->
      s"""WITH t AS (SELECT doc_id, lang, $toksSql AS toks FROM documents),
         |f AS (
         |  SELECT doc_id, lang,
         |    unnest([CAST(('0x' || substring(md5(toks[i] || ' ' || toks[i+1]), 1, 4)) AS BIGINT) % 4096
         |            FOR i IN range(1, len(toks))]) AS b
         |  FROM t WHERE len(toks) >= 2
         |),
         |cr AS (SELECT b, count(*) AS c_raw FROM f GROUP BY b),
         |ct AS (SELECT b, count(*) AS c_tgt FROM f WHERE lang = 'en' GROUP BY b),
         |r AS (
         |  SELECT cr.b AS b,
         |    CAST(((coalesce(c_tgt, 0) + 1) * 1000000) // (c_raw + 1) AS BIGINT) AS ppm
         |  FROM cr LEFT JOIN ct ON cr.b = ct.b
         |)
         |SELECT doc_id, lang, CAST(sum(ppm) // count(*) AS BIGINT) AS avg_ppm
         |FROM f JOIN r USING (b)
         |GROUP BY doc_id, lang
         |ORDER BY avg_ppm DESC, doc_id
         |LIMIT 200""".stripMargin,
    // same fixed-point normalizer and identical IEEE expression chain
    // for the rate, so the bucket comparison lands identically
    "sample_temperature" ->
      s"""WITH st AS (
        |  SELECT source, count(*) AS n_s,
        |    CAST(floor(sqrt(CAST(count(*) AS DOUBLE)) * 1000000.0) AS BIGINT) AS ssq
        |  FROM documents GROUP BY source
        |), tot AS (
        |  SELECT CAST(sum(ssq) AS BIGINT) AS s_fp, CAST(sum(n_s) AS BIGINT) AS n_tot FROM st
        |), r AS (
        |  SELECT source,
        |    CAST(least(10000.0,
        |      floor(10000.0 * CAST(CAST(floor(CAST(n_tot AS DOUBLE) / 2) AS BIGINT) AS DOUBLE)
        |        * CAST(ssq AS DOUBLE) / CAST(s_fp AS DOUBLE) / CAST(n_s AS DOUBLE)))
        |      AS INTEGER) AS rate_bp
        |  FROM st, tot
        |)
        |SELECT d.doc_id, d.source
        |FROM documents d JOIN r USING (source)
        |WHERE $contentBucketSql < r.rate_bp""".stripMargin,
    "mixture_report" ->
      s"""WITH d AS (
         |  SELECT lang,
         |    CASE WHEN lang = 'en' THEN 9000 WHEN lang = 'de' THEN 5000 ELSE 2500 END AS target_bp,
         |    CASE WHEN $contentBucketSql <
         |      CASE WHEN lang = 'en' THEN 9000 WHEN lang = 'de' THEN 5000 ELSE 2500 END
         |      THEN 1 ELSE 0 END AS kept
         |  FROM documents
         |), g AS (
         |  SELECT lang, target_bp, count(*) AS n_total,
         |    CAST(sum(kept) AS BIGINT) AS n_kept
         |  FROM d GROUP BY 1, 2
         |)
         |SELECT lang, n_total, n_kept, CAST(target_bp AS INTEGER) AS target_bp,
         |  CAST((n_kept * 10000) // n_total AS BIGINT) AS realized_bp,
         |  CAST((n_kept * 10000) // n_total - target_bp AS BIGINT) AS deviation_bp
         |FROM g""".stripMargin,
    "mixture_token_budget" ->
      s"""WITH d AS (
         |  SELECT doc_id, lang, $contentBucketSql AS bucket,
         |    CAST(len($toksSql) AS BIGINT) AS n_tokens
         |  FROM documents
         |), c AS (
         |  SELECT doc_id, lang, n_tokens,
         |    CAST(sum(n_tokens) OVER (PARTITION BY lang ORDER BY bucket, doc_id
         |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
         |  FROM d
         |)
         |SELECT doc_id, lang, n_tokens, cum FROM c
         |WHERE cum - n_tokens <
         |  CASE lang WHEN 'en' THEN 12000 WHEN 'de' THEN 6000 ELSE 3000 END""".stripMargin,
    "mixture_upsample" ->
      s"""WITH n AS (
        |  SELECT doc_id, lang,
        |    (CASE WHEN lang = 'en' THEN 2 WHEN lang = 'zh' THEN 1 WHEN lang = 'de' THEN 1 ELSE 0 END)
        |    + (CASE WHEN $contentBucketSql <
        |         (CASE WHEN lang = 'en' THEN 3000 WHEN lang = 'es' THEN 6000 WHEN lang = 'de' THEN 5000 ELSE 0 END)
        |       THEN 1 ELSE 0 END) AS n_copies
        |  FROM documents
        |)
        |SELECT doc_id, lang, CAST(unnest(range(0, n_copies)) AS BIGINT) AS copy
        |FROM n WHERE n_copies > 0""".stripMargin,
    "q4_priority" ->
      """SELECT o_orderpriority, count(*) AS n_orders
        |FROM orders o
        |WHERE EXISTS (
        |  SELECT 1 FROM lineitem l
        |  WHERE l.l_orderkey = o.o_orderkey
        |    AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
        |)
        |GROUP BY o_orderpriority""".stripMargin)
}
