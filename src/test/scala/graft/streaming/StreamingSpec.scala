package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec

class StreamingSpec extends SparkSpec {

  private def ts(hour: Int, min: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 $hour%02d:$min%02d:00")

  test("streaming distinct sketch: theta unions across micro-batches, equals batch") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, Long)]
    val df = mem.toDF.toDF("ts", "user_id")
    val q = Streaming.windowDistinctSketch(df)
      .writeStream.format("memory").queryName("s_sketch").outputMode("complete").start()
    try {
      // overlapping users across two micro-batches of the SAME window:
      // only a correct sketch UNION in the state store (not re-count)
      // yields the distinct cardinality
      mem.addData((1L to 5L).map(u => (ts(1, 5), u)): _*)
      q.processAllAvailable()
      mem.addData(((4L to 8L).map(u => (ts(1, 30), u)) ++ (1L to 3L).map(u => (ts(2, 10), u))): _*)
      q.processAllAvailable()
      val rows = spark.table("s_sketch").collect()
        .map(r => r.getTimestamp(0) -> r.getLong(1)).toMap
      assert(rows === Map(ts(1, 0) -> 8L, ts(2, 0) -> 3L))
      // batch twin on the same rows agrees
      val batch = ((1L to 5L).map(u => (ts(1, 5), u)) ++ (4L to 8L).map(u => (ts(1, 30), u)) ++
        (1L to 3L).map(u => (ts(2, 10), u))).toDF("ts", "user_id")
      val batchRows = Streaming.windowDistinctSketch(batch).collect()
        .map(r => r.getTimestamp(0) -> r.getLong(1)).toMap
      assert(batchRows === rows)
    } finally q.stop()
  }

  test("streaming heavy hitters: Misra-Gries merges across micro-batches, equals batch") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, Long)]
    val df = mem.toDF.toDF("ts", "user_id")
    val q = Streaming.windowHeavyHitters(df, k = 2)
      .writeStream.format("memory").queryName("s_hh").outputMode("complete").start()
    // user 7 dominates across BOTH micro-batches of the same window —
    // only a correct map merge in the state store sees the total count
    val b1 = Seq.fill(5)((ts(1, 5), 7L)) ++ Seq((ts(1, 10), 1L), (ts(1, 11), 2L))
    val b2 = Seq.fill(4)((ts(1, 40), 7L)) ++ Seq.fill(3)((ts(1, 45), 2L))
    val streamed = try {
      mem.addData(b1: _*); q.processAllAvailable()
      mem.addData(b2: _*); q.processAllAvailable()
      spark.table("s_hh").collect()
        .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2), r.getLong(3))).toSet
    } finally q.stop()
    val top = streamed.toSeq.sortBy(-_._3)
    assert(top.head._2 === "7" && top.head._3 === 9L && top.head._4 === 0L)
    assert(top(1)._2 === "2" && top(1)._3 === 4L)
    val batch = Streaming.windowHeavyHitters((b1 ++ b2).toDF("ts", "user_id"), k = 2)
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2), r.getLong(3))).toSet
    assert(batch === streamed)
  }

  test("streaming quantile sketch: KLL merges across micro-batches, equals batch") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, String, Double)]
    val df = mem.toDF.toDF("ts", "event_type", "value")
    val q = Streaming.windowQuantileSketch(df)
      .writeStream.format("memory").queryName("s_kll").outputMode("complete").start()
    try {
      // the same window split across two micro-batches: quantiles are
      // only right if the state-store KLL MERGE equals one-shot build
      val b1 = (1 to 50).map(i => (ts(1, i % 60), "lat", i.toDouble))
      val b2 = (51 to 100).map(i => (ts(1, i % 60), "lat", i.toDouble))
      mem.addData(b1: _*)
      q.processAllAvailable()
      mem.addData(b2: _*)
      q.processAllAvailable()
      val got = spark.table("s_kll").collect()
        .map(r => (r.getTimestamp(0), r.getString(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))
      assert(got.length === 1)
      val (_, _, p50, p95, p99) = got.head
      assert(p50 <= p95 && p95 <= p99)
      assert(Set(p50, p95, p99).subsetOf((1 to 100).map(_.toDouble).toSet),
        "small-n KLL quantiles are actual observed values")
      // batch twin on the same rows agrees exactly (same deterministic
      // sketch build + merge)
      val batch = Streaming.windowQuantileSketch((b1 ++ b2).toDF("ts", "event_type", "value"))
        .collect()
        .map(r => (r.getTimestamp(0), r.getString(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))
      assert(batch.toSet === got.toSet)
    } finally q.stop()
  }

  test("streaming top-k: bounded heap merges across micro-batches, equals batch") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, String, Long, Double)]
    // event_id rides in the user_id slot position; schema below renames
    val df = mem.toDF.toDF("ts", "event_type", "event_id", "value")
    val q = Streaming.windowTopK(df, k = 2)
      .writeStream.format("memory").queryName("s_topk").outputMode("complete").start()
    try {
      // two separate micro-batches for the SAME window: the second
      // batch's values displace the first's only via heap MERGE in the
      // state store, not within one partial aggregation
      mem.addData((ts(1, 5), "click", 101L, 5.0), (ts(1, 10), "click", 102L, 1.0))
      q.processAllAvailable()
      mem.addData((ts(1, 20), "click", 103L, 9.0), (ts(1, 30), "click", 104L, 0.5),
        (ts(2, 5), "view", 201L, 4.0))
      q.processAllAvailable()
      val rows = spark.table("s_topk").collect()
        .map(r => (r.getTimestamp(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSet
      assert(rows === Set(
        (ts(1, 0), 0, 103L, 9.0), // batch-2 event outranks batch-1 leader
        (ts(1, 0), 1, 101L, 5.0),
        (ts(2, 0), 0, 201L, 4.0)))
      // batch twin on the same rows agrees
      val batch = Seq(
        (ts(1, 5), "click", 101L, 5.0), (ts(1, 10), "click", 102L, 1.0),
        (ts(1, 20), "click", 103L, 9.0), (ts(1, 30), "click", 104L, 0.5),
        (ts(2, 5), "view", 201L, 4.0)).toDF("ts", "event_type", "event_id", "value")
      val batchRows = Streaming.windowTopK(batch, k = 2).collect()
        .map(r => (r.getTimestamp(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSet
      assert(batchRows === rows)
    } finally q.stop()
  }

  test("hourly window aggregation over a stream") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, String, Long, Double)]
    val df = mem.toDF.toDF("ts", "event_type", "user_id", "value")
    val q = Streaming.hourlyWindowAgg(df)
      .writeStream.format("memory").queryName("s_hourly").outputMode("complete").start()
    try {
      mem.addData((ts(1, 10), "click", 1L, 1.0), (ts(1, 20), "click", 2L, 2.0), (ts(2, 5), "view", 1L, 3.0))
      q.processAllAvailable()
      val rows = spark.table("s_hourly").collect()
        .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSet
      assert(rows === Set(
        (ts(1, 0), "click", 2L),
        (ts(2, 0), "view", 1L)))
    } finally q.stop()
  }

  test("text-pipeline operators compose on a stream (stateless Column exprs stream as-is)") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    import graft.text.TextFunctions
    implicit val ctx = spark.sqlContext
    val mem = MemoryStream[(Long, String, String)]
    val df = mem.toDF.toDF("doc_id", "text", "lang")
    // quality-gate + mixture-sample + token-count: one codegen'd
    // projection, identical semantics batch or stream
    val bucket = conv(substring(md5(col("text")), 1, 4), 16, 10).cast("int") % 10000
    val out = df
      .select(col("doc_id"), col("lang"),
        size(TextFunctions.tokens(col("text"))).as("n_tokens"),
        TextFunctions.langId(TextFunctions.tokens(col("text"))).as("lang_pred"))
      .where(col("n_tokens") >= 3)
    val q = out.writeStream.format("memory").queryName("s_textpipe").outputMode("append").start()
    try {
      mem.addData(
        (1L, "the quick brown fox and the dog", "en"),
        (2L, "und der die das nicht ist", "de"),
        (3L, "too short", "en"))
      q.processAllAvailable()
      val rows = spark.table("s_textpipe").collect()
        .map(r => r.getLong(0) -> ((r.getInt(2), r.getString(3)))).toMap
      assert(rows.keySet === Set(1L, 2L)) // 3L gated out
      assert(rows(1L)._2 === "en" && rows(2L)._2 === "de")
    } finally q.stop()
  }

  test("RAG chunking streams as-is and matches the batch chunker on identical docs") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    implicit val ctx = spark.sqlContext
    // THE production chunker (same function text_chunk serves), not a
    // local re-implementation — parity here must track the real code
    def chunked(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
      graft.text.Pipeline.chunk(df)
        .select(col("doc_id"), col("chunk_idx"), col("chunk_text"))
    val docs = Seq(
      (1L, (1 to 150).map(i => s"tok$i").mkString(" ")), // 3 chunks
      (2L, "short doc"))
    val mem = MemoryStream[(Long, String)]
    val q = chunked(mem.toDF.toDF("doc_id", "text"))
      .writeStream.format("memory").queryName("s_chunk").outputMode("append").start()
    try {
      mem.addData(docs: _*)
      q.processAllAvailable()
      val streamed = spark.table("s_chunk").collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getString(2))).sorted.toSeq
      val batch = chunked(docs.toDF("doc_id", "text")).collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getString(2))).sorted.toSeq
      assert(streamed === batch)
      assert(streamed.count(_._1 == 1L) === 3 && streamed.count(_._1 == 2L) === 1)
    } finally q.stop()
  }

  test("curation gate: quality filter + watermarked dedup + scrub on a stream") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    import graft.text.TextFunctions
    implicit val ctx = spark.sqlContext
    val mem = MemoryStream[(Long, String, Timestamp)]
    val df = mem.toDF.toDF("doc_id", "text", "ts")
    val good = "the quick brown fox jumps over the lazy dog and runs far away home tonight"
    val q = Streaming.curationGate(df, minQuality = 0.4)
      .writeStream.format("memory").queryName("s_curate").outputMode("append").start()
    try {
      mem.addData(
        (1L, good, ts(1, 0)),
        (2L, good, ts(1, 5)), // exact dup of 1 within the watermark -> dropped
        (3L, "zzz zzz zzz zzz zzz zzz zzz zzz zzz zzz zzz zzz", ts(1, 10)), // low quality -> gated
        (4L, good + " with an email x@y.com inside", ts(1, 15)))
      q.processAllAvailable()
      val rows = spark.table("s_curate").collect()
        .map(r => r.getLong(0) -> r.getString(3)).toMap
      assert(rows.keySet === Set(1L, 4L))
      assert(rows(4L).contains("<EMAIL>") && !rows(4L).contains("x@y.com"))
      // observability rides the same micro-batch (CollectMetrics): the
      // gate reports ingest vs survivor counts without a second scan
      val observed = q.recentProgress.filter(_.observedMetrics.containsKey("curation_in"))
      val nIn = observed.map(_.observedMetrics.get("curation_in").getLong(0)).sum
      val nOut = observed
        .filter(_.observedMetrics.containsKey("curation_out"))
        .map(_.observedMetrics.get("curation_out").getLong(0)).sum
      assert(nIn === 4, s"ingest counter saw $nIn rows")
      assert(nOut === 2, s"survivor counter saw $nOut rows")
      // gate threshold matches the batch expression exactly
      val batchQ = Seq((3L, "zzz zzz zzz zzz zzz zzz zzz zzz zzz zzz zzz zzz")).toDF("doc_id", "text")
        .select(TextFunctions.qualityScore(col("text"))).collect()(0).getDouble(0)
      assert(batchQ < 0.4)
    } finally q.stop()
  }

  test("native session_window closes sessions once the watermark passes") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val mem = MemoryStream[(Long, Long, Timestamp)]
    val df = mem.toDF.toDF("user_id", "event_id", "ts")
    val q = Streaming.sessionWindowAgg(df, gap = "30 minutes", watermark = "1 minute")
      .writeStream.format("memory").queryName("s_sess").outputMode("append").start()
    try {
      mem.addData((7L, 1L, ts(1, 0)), (7L, 2L, ts(1, 10)))
      q.processAllAvailable()
      // jump far ahead: watermark passes session end + gap -> session emitted
      mem.addData((7L, 3L, ts(9, 0)))
      q.processAllAvailable()
      mem.addData((8L, 4L, ts(15, 0)))
      q.processAllAvailable()
      val rows = spark.table("s_sess").collect()
        .map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(3))).toSet
      assert(rows.contains((7L, ts(1, 0), 2L)))
    } finally q.stop()
  }

  test("streaming exact dedup drops duplicate texts within the watermark") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val mem = MemoryStream[(Long, String, Timestamp)]
    val df = mem.toDF.toDF("doc_id", "text", "ts")
      .withWatermark("ts", "1 hour")
      .dropDuplicatesWithinWatermark("text")
    val q = df.writeStream.format("memory").queryName("s_dedup").outputMode("append").start()
    try {
      mem.addData((1L, "same body", ts(1, 0)), (2L, "same body", ts(1, 5)), (3L, "other", ts(1, 6)))
      q.processAllAvailable()
      val texts = spark.table("s_dedup").collect().map(_.getString(1)).sorted.toSeq
      assert(texts === Seq("other", "same body"))
    } finally q.stop()
  }

  test("streaming near-dup screen flags planted near-dups and equals the batch fold") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val base = graft.queries.Tables(spark, "/root/testdata/sf0.001", "documents")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1))).take(30)
    // near-dup copies (one appended token) arrive strictly after their originals
    val copies = base.take(5).map { case (id, t) => (id + 10000L, t + " tailmarker") }
    val b1 = base.zipWithIndex.map { case ((id, t), i) => (id, t, ts(1, i % 50)) }.toSeq
    val b2 = copies.zipWithIndex.map { case ((id, t), i) => (id, t, ts(2, i)) }.toSeq

    val mem = MemoryStream[(Long, String, Timestamp)]
    val q = Streaming.nearDedupFMGWS(mem.toDF.toDF("doc_id", "text", "ts"))
      .writeStream.format("memory").queryName("s_neardup").outputMode("append").start()
    val streamed = try {
      mem.addData(b1: _*); q.processAllAvailable()
      mem.addData(b2: _*); q.processAllAvailable()
      spark.table("s_neardup").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    } finally q.stop()

    // every planted copy must flag its original, high lane agreement
    copies.map(_._1).zip(base.take(5).map(_._1)).foreach { case (cid, oid) =>
      val hit = streamed.find(p => p._1 == cid && p._2 == oid)
      assert(hit.isDefined, s"copy $cid missed its original $oid")
      assert(hit.get._3 >= 100, s"lane agreement ${hit.get._3} unexpectedly low")
    }
    // batch run of the SAME function over the union = the streaming emission set
    val batch = Streaming.nearDedupFMGWS((b1 ++ b2).toDF("doc_id", "text", "ts"))
      .collect().map(o => (o.doc_id, o.dup_of, o.overlap)).toSet
    assert(streamed === batch, "stream/batch fold divergence")
  }

  test("streaming markov transitions match the batch lead-window on the same events") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val mem = MemoryStream[Streaming.TransEv]
    val q = Streaming.markovFMGWS(mem.toDS(), idleCloseMs = 3600 * 1000L)
      .writeStream.format("memory").queryName("s_markov").outputMode("append").start()
    try {
      // user 1 delivered OUT OF ORDER within the watermark: the final
      // transition sequence must follow event time, not arrival time
      mem.addData(
        Streaming.TransEv(1L, 3L, "purchase", ts(1, 30)),
        Streaming.TransEv(1L, 1L, "view", ts(1, 0)),
        Streaming.TransEv(1L, 2L, "click", ts(1, 10)),
        Streaming.TransEv(2L, 4L, "view", ts(1, 0)),
        Streaming.TransEv(2L, 5L, "view", ts(1, 5)))
      q.processAllAvailable()
      // push the watermark far past every buffered event, then idle-close
      mem.addData(Streaming.TransEv(99L, 9L, "view", ts(9, 0)))
      q.processAllAvailable()
      mem.addData(Streaming.TransEv(98L, 10L, "view", ts(20, 0)))
      q.processAllAvailable()
      val got = spark.table("s_markov").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
        .groupBy(identity).view.mapValues(_.length).toMap
      // batch twin: lead over (ts, event_id) per user
      val batch = Seq(
        (1L, 3L, "purchase", ts(1, 30)), (1L, 1L, "view", ts(1, 0)), (1L, 2L, "click", ts(1, 10)),
        (2L, 4L, "view", ts(1, 0)), (2L, 5L, "view", ts(1, 5)))
        .toDF("user_id", "event_id", "event_type", "ts")
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id").orderBy("ts", "event_id")
      val want = batch
        .withColumn("to_type", org.apache.spark.sql.functions.lead("event_type", 1).over(w))
        .where($"to_type".isNotNull)
        .select($"user_id", $"event_type", $"to_type").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
        .groupBy(identity).view.mapValues(_.length).toMap
      assert(got.view.filterKeys(k => k._1 <= 2L).toMap === want,
        s"stream $got vs batch $want")
    } finally q.stop()
  }

  test("streaming contamination screen matches the batch join doc for doc") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    import org.apache.spark.sql.functions._
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "text")
    val evalPred = col("doc_id") < 20L
    val train = docs.where(!evalPred).limit(150)
      .collect().map(r => (r.getLong(0), r.getString(1)))
    // batch truth on exactly the streamed train docs
    val trainDf = train.toSeq.toDF("doc_id", "text")
    val want = graft.text.Pipeline.contamination(
        trainDf.unionByName(docs.where(evalPred)), "doc_id", "text", evalPred, 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val mem = MemoryStream[(Long, String)]
    val q = Streaming.contaminationScreen(
        mem.toDF.toDF("doc_id", "text"), docs.where(evalPred))
      .writeStream.format("memory").queryName("s_contam").outputMode("append").start()
    try {
      val (a, b) = train.splitAt(train.length / 2)
      mem.addData(a: _*); q.processAllAvailable()
      mem.addData(b: _*); q.processAllAvailable()
      val got = spark.table("s_contam").collect()
        .map(r => (r.getLong(0), r.getLong(2), r.getBoolean(3)))
      assert(got.length === train.length, "stateless screen emits one row per doc")
      got.foreach { case (id, n, keep) =>
        assert(n === want(id), s"doc $id: stream $n vs batch ${want(id)}")
        assert(keep === (n === 0L))
      }
      assert(got.exists(_._2 > 0L), "sample must contain contaminated docs")
      assert(got.exists(_._3), "sample must contain clean docs")
    } finally q.stop()
  }

  test("streaming attribution matches the batch last-touch window on the same events") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val mem = MemoryStream[Streaming.AttrEv]
    val q = Streaming.attributionFMGWS(mem.toDS(), idleCloseMs = 3600 * 1000L)
      .writeStream.format("memory").queryName("s_attr").outputMode("append").start()
    try {
      // user 1 delivered OUT OF ORDER within the watermark: the purchase
      // arrives before the click that must end up crediting it; user 2
      // purchases with no preceding touch (direct) then again after a
      // view; user 3 only touches (no output rows)
      val evs = Seq(
        Streaming.AttrEv(1L, 3L, "purchase", 30.0, ts(1, 30)),
        Streaming.AttrEv(1L, 1L, "view", 0.0, ts(1, 0)),
        Streaming.AttrEv(1L, 2L, "click", 0.0, ts(1, 10)),
        Streaming.AttrEv(2L, 4L, "purchase", 10.0, ts(1, 0)),
        Streaming.AttrEv(2L, 5L, "view", 0.0, ts(1, 5)),
        Streaming.AttrEv(2L, 6L, "purchase", 20.0, ts(1, 20)),
        Streaming.AttrEv(3L, 7L, "signup", 0.0, ts(1, 0)))
      mem.addData(evs: _*)
      q.processAllAvailable()
      // advance the watermark past everything, then trigger idle close
      mem.addData(Streaming.AttrEv(99L, 9L, "view", 0.0, ts(9, 0)))
      q.processAllAvailable()
      mem.addData(Streaming.AttrEv(98L, 10L, "view", 0.0, ts(20, 0)))
      q.processAllAvailable()
      val got = spark.table("s_attr").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getDouble(3)))
        .filter(_._1 <= 3L).toSet
      // batch twin: events_attribution's carried-touch window
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id").orderBy("ts", "event_id")
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
      val fn = org.apache.spark.sql.functions
      val want = evs.map(e => (e.user_id, e.event_id, e.event_type, e.value, e.ts))
        .toDF("user_id", "event_id", "event_type", "value", "ts")
        .withColumn("channel", fn.last(
          fn.when(fn.col("event_type").isin("click", "view", "signup"),
            fn.col("event_type")), ignoreNulls = true).over(w))
        .where(fn.col("event_type") === "purchase")
        .select(fn.col("user_id"), fn.col("event_id"),
          fn.coalesce(fn.col("channel"), fn.lit("direct")).as("channel"),
          fn.col("value"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getDouble(3)))
        .toSet
      assert(got === want, s"stream $got vs batch $want")
    } finally q.stop()
  }

  test("streaming funnel matches the batch funnel semantics on the same events") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val mem = MemoryStream[Streaming.TypedEv]
    val q = Streaming.funnelFMGWS(mem.toDS(), idleCloseMs = 3600 * 1000L)
      .writeStream.format("memory").queryName("s_funnel").outputMode("append").start()
    try {
      // user 1: full ordered funnel; user 2: click before view (depth 1);
      // user 3: view+click ordered, no purchase (depth 2) — delivered
      // out of order WITHIN the watermark to prove order-insensitivity
      mem.addData(
        Streaming.TypedEv(1L, "purchase", ts(1, 30)), // arrives first, happened last
        Streaming.TypedEv(1L, "view", ts(1, 0)),
        Streaming.TypedEv(1L, "click", ts(1, 10)),
        Streaming.TypedEv(2L, "click", ts(1, 0)),
        Streaming.TypedEv(2L, "view", ts(1, 5)),
        Streaming.TypedEv(3L, "view", ts(1, 0)),
        Streaming.TypedEv(3L, "click", ts(1, 20)))
      q.processAllAvailable()
      // watermark far past every user's idle timeout -> all users close
      mem.addData(Streaming.TypedEv(99L, "view", ts(9, 0)))
      q.processAllAvailable()
      val got = spark.table("s_funnel").collect()
        .map(r => r.getLong(0) -> r.getInt(1)).toMap
      assert(got === Map(1L -> 3, 2L -> 1, 3L -> 2))
      // batch twin on the identical rows agrees
      val batch = Seq(
        (1L, "purchase", ts(1, 30)), (1L, "view", ts(1, 0)), (1L, "click", ts(1, 10)),
        (2L, "click", ts(1, 0)), (2L, "view", ts(1, 5)),
        (3L, "view", ts(1, 0)), (3L, "click", ts(1, 20)))
        .toDF("user_id", "event_type", "ts")
      val m = batch.groupBy("user_id").agg(
        org.apache.spark.sql.functions.min(org.apache.spark.sql.functions.when(
          $"event_type" === "view", $"ts")).as("t1"),
        org.apache.spark.sql.functions.min(org.apache.spark.sql.functions.when(
          $"event_type" === "click", $"ts")).as("t2"),
        org.apache.spark.sql.functions.min(org.apache.spark.sql.functions.when(
          $"event_type" === "purchase", $"ts")).as("t3"))
      import org.apache.spark.sql.functions.when
      val batchDepths = m.select($"user_id",
          when($"t1".isNotNull && $"t2".isNotNull && $"t3".isNotNull &&
            $"t1" < $"t2" && $"t2" < $"t3", 3)
            .when($"t1".isNotNull && $"t2".isNotNull && $"t1" < $"t2", 2)
            .when($"t1".isNotNull, 1).otherwise(0).as("d"))
        .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
      assert(batchDepths === got)
    } finally q.stop()
  }

  test("sessionization handles late-but-in-watermark events (split and merge both correct)") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val mem = MemoryStream[Streaming.Ev]
    val q = Streaming.sessionizeFMGWS(mem.toDS(), gapSeconds = 1800L)
      .writeStream.format("memory").queryName("s_late").outputMode("append").start()
    try {
      mem.addData(Streaming.Ev(5L, 1L, ts(12, 30)), Streaming.Ev(6L, 2L, ts(12, 0)))
      q.processAllAvailable()
      // late arrivals, both above the 10:30 watermark (12:30 - 2h):
      // user 5: 10:45 is 105min before its 12:30 event -> separate session
      // user 6: 11:50 is 10min before its 12:00 event -> merges, start moves DOWN
      mem.addData(Streaming.Ev(5L, 3L, ts(10, 45)), Streaming.Ev(6L, 4L, ts(11, 50)))
      q.processAllAvailable()
      // watermark far ahead -> everything closes
      mem.addData(Streaming.Ev(99L, 5L, ts(23, 0)))
      q.processAllAvailable()
      val rows = spark.table("s_late").collect()
        .map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2), r.getLong(3))).toSet
      assert(rows.contains((5L, ts(10, 45), ts(10, 45), 1L)), rows.toString)
      assert(rows.contains((5L, ts(12, 30), ts(12, 30), 1L)), rows.toString)
      assert(rows.contains((6L, ts(11, 50), ts(12, 0), 2L)), rows.toString)
    } finally q.stop()
  }

  test("flatMapGroupsWithState sessionization emits closed sessions") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val mem = MemoryStream[Streaming.Ev]
    val q = Streaming.sessionizeFMGWS(mem.toDS(), gapSeconds = 1800L)
      .writeStream.format("memory").queryName("s_fmgws").outputMode("append").start()
    try {
      mem.addData(Streaming.Ev(1L, 1L, ts(1, 0)), Streaming.Ev(1L, 2L, ts(1, 15)))
      q.processAllAvailable()
      // same user far later: closes the first session in-stream
      mem.addData(Streaming.Ev(1L, 3L, ts(5, 0)))
      q.processAllAvailable()
      val rows = spark.table("s_fmgws").collect()
        .map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2), r.getLong(3))).toSet
      assert(rows === Set((1L, ts(1, 0), ts(1, 15), 2L)))
    } finally q.stop()
  }

  test("stream-static enrichment joins the dimension without dropping unmatched events") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val memE = MemoryStream[(Long, Long, Double)]
    val edf = memE.toDF.toDF("event_id", "user_id", "value")
    val dim = Seq((1L, "alice", "DE"), (2L, "bob", "FR"))
      .toDF("c_custkey", "c_name", "c_country")
    val q = Streaming.enrich(edf, dim, "user_id", "c_custkey")
      .select("event_id", "c_name")
      .writeStream.format("memory").queryName("s_enrich").outputMode("append").start()
    try {
      memE.addData((100L, 1L, 5.0), (101L, 2L, 6.0), (102L, 9L, 7.0))
      q.processAllAvailable()
      val got = spark.table("s_enrich").collect()
        .map(r => r.getLong(0) -> Option(r.getString(1))).toMap
      assert(got === Map(100L -> Some("alice"), 101L -> Some("bob"), 102L -> None))
    } finally q.stop()
  }

  test("stream-static enrichment works when both sides share the key column name") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val memE = MemoryStream[(Long, Long)]
    val edf = memE.toDF.toDF("event_id", "user_id")
    val dim = Seq((1L, "alice")).toDF("user_id", "c_name") // SAME key name
    val q = Streaming.enrich(edf, dim, "user_id", "user_id")
      .select(edf("event_id"), dim("c_name"))
      .writeStream.format("memory").queryName("s_enrich2").outputMode("append").start()
    try {
      memE.addData((100L, 1L), (101L, 9L))
      q.processAllAvailable()
      val got = spark.table("s_enrich2").collect()
        .map(r => r.getLong(0) -> Option(r.getString(1))).toMap
      assert(got === Map(100L -> Some("alice"), 101L -> None))
    } finally q.stop()
  }

  test("stream-stream interval join matches the batch join on the same rows") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val memO = MemoryStream[(Long, Long, Timestamp)]
    val memE = MemoryStream[(Long, Long, Timestamp, Double)]
    val odf = memO.toDF.toDF("o_orderkey", "o_custkey", "o_ts")
    val edf = memE.toDF.toDF("user_id", "event_id", "ts", "value")
    val q = Streaming.intervalJoin(odf, edf, windowHours = 2)
      .writeStream.format("memory").queryName("s_ivjoin").outputMode("append").start()
    val orders = Seq((10L, 1L, ts(1, 0)), (11L, 2L, ts(3, 0)))
    val events = Seq(
      (1L, 100L, ts(1, 30), 5.0),  // in order 10's window
      (1L, 101L, ts(4, 0), 6.0),   // same user, outside the 2h window
      (2L, 102L, ts(3, 59), 7.0),  // in order 11's window
      (3L, 103L, ts(1, 0), 8.0))   // no matching order
    try {
      memO.addData(orders: _*)
      memE.addData(events: _*)
      q.processAllAvailable()
      val got = spark.table("s_ivjoin").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      // batch reference: identical join on static frames
      val expect = Streaming.intervalJoin(
          orders.toDF("o_orderkey", "o_custkey", "o_ts"),
          events.toDF("user_id", "event_id", "ts", "value"), windowHours = 2)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got === expect)
      assert(got === Set((10L, 100L), (11L, 102L)))
    } finally q.stop()
  }

  test("streaming anomaly gate matches the batch running-prefix z-score on out-of-order input") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val mem = MemoryStream[Streaming.AnomEv]
    val q = Streaming.anomalyFMGWS(mem.toDS(), idleCloseMs = 3600 * 1000L)
      .writeStream.format("memory").queryName("s_anom").outputMode("append").start()
    try {
      // 'pay' delivered OUT OF ORDER: the spike (id 6) arrives first but
      // must be scored against the stats of the five earlier-in-event-time
      // normal values; 'tick' has too few events to ever flag
      val evs = Seq(
        Streaming.AnomEv(6L, "pay", 500.0, ts(1, 50)),
        Streaming.AnomEv(1L, "pay", 10.0, ts(1, 0)),
        Streaming.AnomEv(2L, "pay", 12.0, ts(1, 10)),
        Streaming.AnomEv(3L, "pay", 11.0, ts(1, 20)),
        Streaming.AnomEv(4L, "pay", 9.0, ts(1, 30)),
        Streaming.AnomEv(5L, "pay", 13.0, ts(1, 40)),
        Streaming.AnomEv(7L, "tick", 1.0, ts(1, 0)),
        Streaming.AnomEv(8L, "tick", 2.0, ts(1, 5)))
      mem.addData(evs: _*)
      q.processAllAvailable()
      // advance the watermark past everything, then trigger idle close
      mem.addData(Streaming.AnomEv(99L, "wm", 0.0, ts(9, 0)))
      q.processAllAvailable()
      mem.addData(Streaming.AnomEv(98L, "wm2", 0.0, ts(20, 0)))
      q.processAllAvailable()
      val got = spark.table("s_anom").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getDouble(2), r.getBoolean(3)))
        .filter(r => r._2 == "pay" || r._2 == "tick").toSet
      // batch twin: replay the identical cents-fixed-point prefix fold
      // in event-time order
      val want = evs.groupBy(_.event_type).flatMap { case (t, es) =>
        var n = 0L; var s = 0L; var ss = 0L
        es.sortBy(e => (e.ts.getTime, e.event_id)).map { e =>
          val out = if (n < 2) (e.event_id, t, 0.0, false) else {
            val mean = s.toDouble / 100.0 / n.toDouble
            val std = math.sqrt(math.max(ss.toDouble / 10000.0 / n - mean * mean, 0.0))
            if (std <= 0.0) (e.event_id, t, 0.0, false)
            else (e.event_id, t, (e.value - mean) / std,
              math.abs(e.value - mean) > 3.0 * std)
          }
          val c = math.round(e.value * 100); n += 1; s += c; ss += c * c
          out
        }
      }.toSet
      assert(got === want)
      assert(got.exists(r => r._1 === 6L && r._4), "the spike must flag")
      assert(got.count(_._4) === 1, "only the spike flags")
    } finally q.stop()
  }

  test("streaming anomaly running stats survive an idle close (lifetime baseline)") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val mem = MemoryStream[Streaming.AnomEv]
    val q = Streaming.anomalyFMGWS(mem.toDS(), idleCloseMs = 60 * 1000L)
      .writeStream.format("memory").queryName("s_anom2").outputMode("append").start()
    try {
      mem.addData(
        Streaming.AnomEv(1L, "m", 10.0, ts(1, 0)),
        Streaming.AnomEv(2L, "m", 12.0, ts(1, 1)),
        Streaming.AnomEv(3L, "m", 11.0, ts(1, 2)))
      q.processAllAvailable()
      // idle-close 'm' (watermark jumps hours ahead), then resume it
      mem.addData(Streaming.AnomEv(90L, "wm", 0.0, ts(8, 0)))
      q.processAllAvailable()
      mem.addData(Streaming.AnomEv(4L, "m", 300.0, ts(8, 30)))
      q.processAllAvailable()
      mem.addData(Streaming.AnomEv(91L, "wm", 0.0, ts(23, 0)))
      q.processAllAvailable()
      mem.addData(Streaming.AnomEv(92L, "wm", 0.0, ts(23, 30)))
      q.processAllAvailable()
      val flagged = spark.table("s_anom2").collect()
        .filter(r => r.getString(1) == "m" && r.getLong(0) == 4L)
      assert(flagged.length === 1, "resumed event must be scored")
      assert(flagged.head.getBoolean(3),
        "the baseline from before the idle close must still flag the spike")
    } finally q.stop()
  }
}
