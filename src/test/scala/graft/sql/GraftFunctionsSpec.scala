package graft.sql

import graft.SparkSpec

class GraftFunctionsSpec extends SparkSpec {

  override def beforeAll(): Unit = {
    super.beforeAll()
    GraftFunctions.registerAll(spark)
  }

  test("vec_* scalar functions work from SQL") {
    val r = spark.sql(
      """SELECT vec_l2sq(CAST(array(1.0,2.0) AS array<float>), CAST(array(4.0,6.0) AS array<float>)) d,
        |       vec_ip(CAST(array(1.0,2.0) AS array<float>), CAST(array(4.0,6.0) AS array<float>)) ip
        |""".stripMargin).collect()(0)
    assert(r.getDouble(0) === 25.0)
    assert(r.getDouble(1) === 16.0)
  }

  test("vec_topk aggregate works from SQL") {
    spark.sql("SELECT * FROM VALUES (1, 1.0), (2, 0.5), (3, 2.0) AS t(id, d)")
      .createOrReplaceTempView("pts")
    val r = spark.sql(
      "SELECT vec_topk(2, d, CAST(id AS BIGINT)) FROM pts").collect()(0)
    val top = r.getSeq[org.apache.spark.sql.Row](0).map(x => x.getLong(1))
    assert(top === Seq(2L, 1L))
  }

  test("vec_lp accepts a plain SQL decimal literal for p") {
    val r = spark.sql(
      "SELECT vec_lp(CAST(array(1.0,2.0) AS array<float>), CAST(array(2.0,4.0) AS array<float>), 3.0) d")
      .collect()(0)
    assert(math.abs(r.getDouble(0) - 9.0) < 1e-9) // 1^3 + 2^3
  }

  test("text and vector helper functions work from SQL") {
    val r = spark.sql(
      """SELECT top_shingle_ratio(split('a b a b a b', ' '), 2) ratio,
        |       dup_shingle_fraction(split('a b c a b', ' '), 2) dup,
        |       vec_normalize(CAST(array(3.0, 4.0) AS array<float>)) unit,
        |       sorted_intersect_count(array(1L, 2L, 5L), array(2L, 3L, 5L)) n,
        |       vec_sign_bits(CAST(array(1.0, -2.0, 3.0) AS array<float>)) bits
        |""".stripMargin).collect()(0)
    assert(r.getDouble(0) === 3.0 / 5.0)
    assert(r.getDouble(1) === 2.0 / 4.0)
    assert(r.getSeq[Float](2).toSeq === Seq(0.6f, 0.8f))
    assert(r.getInt(3) === 2)
    assert(r.getLong(4) === 5L) // bits 0 and 2 set
  }

  test("winnowing functions work from SQL and agree with the Column API") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val text = "one two three four five six seven eight nine ten"
    val viaSql = spark.sql(
      s"""SELECT winnow_select(
         |  shingle_hashes15(split('$text', ' '), 3), 4) fps""".stripMargin)
      .collect()(0).getSeq[Long](0).toSet
    val viaApi = Seq(text).toDF("text")
      .select(graft.text.TextFunctions.winnowSelect(
        graft.text.TextFunctions.shingleHashes15(split(col("text"), " "), 3), 4).as("fps"))
      .collect()(0).getSeq[Long](0).toSet
    assert(viaSql === viaApi && viaSql.nonEmpty)
  }

  test("hash functions work from SQL") {
    val r = spark.sql(
      """SELECT fingerprint64('abc') f,
        |       simhash64(array('a','b')) s,
        |       size(minhash_signature(array('a','b'), 16, 42L)) n,
        |       deflate_size(repeat('spam ', 100)) dz
        |""".stripMargin).collect()(0)
    assert(r.getInt(2) === 16)
    assert(r.getLong(0) !== 0L)
    assert(r.getInt(3) > 0 && r.getInt(3) < 100, "500 repetitive bytes must deflate far down")
  }

  test("curation kernels work from SQL and match the Column API") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val docs = graft.queries.Tables(spark, "/root/testdata/sf0.001", "documents")
    docs.createOrReplaceTempView("gfs_docs")
    val viaSql = spark.sql(
      """SELECT doc_id, graft_quality(text) q, graft_langid(text) l,
        |       md5(graft_scrub(text)) s
        |FROM gfs_docs""".stripMargin).collect()
      .map(r => r.getLong(0) -> (r.getDouble(1), r.getString(2), r.getString(3))).toMap
    import graft.text.TextFunctions._
    val viaApi = docs.select(col("doc_id"), qualityScore(col("text")),
        langId(tokens(col("text"))),
        org.apache.spark.sql.functions.md5(scrub(col("text")))).collect()
      .map(r => r.getLong(0) -> (r.getDouble(1), r.getString(2), r.getString(3))).toMap
    assert(viaSql === viaApi && viaSql.nonEmpty)
  }

  test("sketch functions work from SQL") {
    spark.range(0, 100).selectExpr("id", "id % 3 AS g", "CAST(id AS DOUBLE) AS v")
      .createOrReplaceTempView("sk_in")
    // theta: per-group sketches, set algebra across two groups
    val theta = spark.sql(
      """WITH s AS (SELECT g, theta_sketch_agg(id) sk FROM sk_in GROUP BY g)
        |SELECT CAST(theta_estimate(a.sk) AS BIGINT) na,
        |       CAST(theta_estimate(theta_a_not_b(a.sk, b.sk)) AS BIGINT) diff,
        |       CAST(theta_estimate(theta_intersect(a.sk, b.sk)) AS BIGINT) inter
        |FROM (SELECT sk FROM s WHERE g = 0) a CROSS JOIN (SELECT sk FROM s WHERE g = 1) b
        |""".stripMargin).collect()(0)
    assert(theta.getLong(0) === 34L) // ids 0,3,...,99
    assert(theta.getLong(1) === 34L) // disjoint groups
    assert(theta.getLong(2) === 0L)
    // theta_union_agg re-aggregates the per-group sketches
    val union = spark.sql(
      """SELECT CAST(theta_estimate(theta_union_agg(sk)) AS BIGINT) n
        |FROM (SELECT g, theta_sketch_agg(id) sk FROM sk_in GROUP BY g)
        |""".stripMargin).collect()(0)
    assert(union.getLong(0) === 100L)
    // kll: quantiles of 0..99 via a sketch-of-sketches
    val kllRow = spark.sql(
      """SELECT kll_quantiles(kll_merge_agg(sk), array(0.5D, 0.99D)) q
        |FROM (SELECT g, kll_sketch_agg(v) sk FROM sk_in GROUP BY g)
        |""".stripMargin).collect()(0)
    val q = kllRow.getSeq[Double](0)
    assert(math.abs(q(0) - 49.5) <= 5.0, s"p50=${q(0)}")
    assert(q(1) >= 90.0)
    // frequent items over term arrays
    val fi = spark.sql(
      """SELECT freq_items_topk(freq_items_agg(t), 1) top
        |FROM (SELECT CASE WHEN id < 60 THEN array('hot') ELSE array('c' || id) END t FROM sk_in)
        |""".stripMargin).collect()(0)
    val top = fi.getSeq[org.apache.spark.sql.Row](0)
    assert(top.head.getString(0) === "hot" && top.head.getLong(1) === 60L)
  }
}
