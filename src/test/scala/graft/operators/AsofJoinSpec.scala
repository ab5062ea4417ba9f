package graft.operators

import java.sql.Timestamp

import graft.SparkSpec

class AsofJoinSpec extends SparkSpec {

  private def ts(h: Int): Timestamp = Timestamp.valueOf(f"2024-01-01 $h%02d:00:00")

  test("asof join picks the latest preceding right row per key") {
    import spark.implicits._
    val left = Seq(
      (100L, 1L, ts(5)), // after r2 -> matches 20
      (101L, 1L, ts(2)), // between r1 and r2 -> matches 10
      (102L, 1L, ts(0)), // before everything -> null
      (103L, 2L, ts(9))  // other key -> matches 30
    ).toDF("event_id", "user_id", "ts")
    val right = Seq(
      (10L, 1L, ts(1)),
      (20L, 1L, ts(4)),
      (30L, 2L, ts(3))
    ).toDF("o_orderkey", "o_custkey", "o_orderdate")
      .withColumnRenamed("o_custkey", "user_id")

    val res = AsofJoin.join(left, right, "user_id", "ts", "o_orderdate",
        Seq("o_orderkey"), "o_orderkey")
      .collect().map(r => r.getLong(0) -> Option(r.get(3)).map(_.asInstanceOf[Long])).toMap
    assert(res === Map(
      100L -> Some(20L), 101L -> Some(10L), 102L -> None, 103L -> Some(30L)))
  }

  test("latest preceding row wins even when its payload field is null (no stale carry)") {
    import spark.implicits._
    val left = Seq((1L, 7L, ts(5))).toDF("event_id", "user_id", "ts")
    val right = Seq(
      (Some(111L), 7L, ts(1)), // older row with a value
      (None, 7L, ts(4))        // newest preceding row: payload null
    ).toDF("o_orderkey", "user_id", "o_orderdate")
      .withColumn("rid", org.apache.spark.sql.functions.monotonically_increasing_id())
    val res = AsofJoin.join(left, right, "user_id", "ts", "o_orderdate",
        Seq("o_orderkey"), "rid").collect()
    // DuckDB ASOF semantics: the newest row is carried as-is, null and all
    assert(res(0).isNullAt(3), res(0).toString)
  }

  test("null keys and null right timestamps never match") {
    import spark.implicits._
    val left = Seq((1L, Option.empty[Long], ts(5)), (2L, Some(7L), ts(5)))
      .toDF("event_id", "user_id", "ts")
    val right = Seq(
      (10L, Option.empty[Long], Some(ts(1))), // null key: unmatchable
      (20L, Some(7L), Option.empty[Timestamp]) // null ts: unmatchable
    ).toDF("o_orderkey", "user_id", "o_orderdate")
    val res = AsofJoin.join(left, right, "user_id", "ts", "o_orderdate",
        Seq("o_orderkey"), "o_orderkey")
      .collect().map(r => r.getLong(0) -> r.isNullAt(3)).toMap
    assert(res === Map(1L -> true, 2L -> true))
  }

  test("nearest join picks the closer side in either direction") {
    import spark.implicits._
    val left = Seq(
      (100L, 1L, ts(5)), // r at 4 (d=1h) vs r at 9 (d=4h) -> 20
      (101L, 1L, ts(8)), // r at 9 (d=1h) closer than 4 (d=4h) -> 40
      (102L, 2L, ts(0)), // only a later order exists -> forward match
      (103L, 3L, ts(0))  // no orders for this user -> null
    ).toDF("event_id", "user_id", "ts")
    val right = Seq(
      (20L, 1L, ts(4)),
      (40L, 1L, ts(9)),
      (30L, 2L, ts(6))
    ).toDF("o_orderkey", "user_id", "o_orderdate")
    val res = AsofJoin.joinNearest(left, right, "user_id", "ts", "o_orderdate",
        Seq("o_orderkey"), "o_orderkey")
      .collect().map(r => r.getLong(0) -> Option(r.get(3)).map(_.asInstanceOf[Long])).toMap
    assert(res === Map(
      100L -> Some(20L), 101L -> Some(40L), 102L -> Some(30L), 103L -> None))
  }

  test("nearest join: equidistant sides and equal-ts blocks break to max tiebreak") {
    import spark.implicits._
    val left = Seq(
      (1L, 7L, ts(5)), // orders at 3 and 7: both d=2h -> larger key (9)
      (2L, 8L, ts(5))  // two orders both AT ts 5: d=0 -> larger key (6)
    ).toDF("event_id", "user_id", "ts")
    val right = Seq(
      (4L, 7L, ts(3)), (9L, 7L, ts(7)),
      (3L, 8L, ts(5)), (6L, 8L, ts(5))
    ).toDF("o_orderkey", "user_id", "o_orderdate")
    val res = AsofJoin.joinNearest(left, right, "user_id", "ts", "o_orderdate",
        Seq("o_orderkey"), "o_orderkey")
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(res === Map(1L -> 9L, 2L -> 6L))
  }

  test("nearest join matches a brute-force replay on random data") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val left = (0 until 200).map(i =>
      (i.toLong, rnd.nextInt(8).toLong, ts(rnd.nextInt(23)))).toSeq
      .toDF("event_id", "user_id", "ts")
    val right = (0 until 60).map(i =>
      (i.toLong, rnd.nextInt(10).toLong, ts(rnd.nextInt(23)))).toSeq
      .toDF("o_orderkey", "user_id", "o_orderdate")
    val res = AsofJoin.joinNearest(left, right, "user_id", "ts", "o_orderdate",
        Seq("o_orderkey"), "o_orderkey")
      .collect().map(r => r.getLong(0) -> Option(r.get(3)).map(_.asInstanceOf[Long])).toMap
    val rights = right.collect().map(r => (r.getLong(0), r.getLong(1), r.getTimestamp(2)))
    left.collect().foreach { l =>
      val cands = rights.filter(_._2 == l.getLong(1))
      val expect =
        if (cands.isEmpty) None
        else Some(cands.minBy { case (k, _, t) =>
          (math.abs(t.getTime - l.getTimestamp(2).getTime), -k) }._1)
      assert(res(l.getLong(0)) === expect, s"event ${l.getLong(0)}")
    }
  }

  test("equal timestamps: right row at same ts is visible (<=), max tiebreak wins") {
    import spark.implicits._
    val left = Seq((1L, 7L, ts(3))).toDF("event_id", "user_id", "ts")
    val right = Seq(
      (5L, 7L, ts(3)), (9L, 7L, ts(3)) // duplicate ts -> larger id carried
    ).toDF("o_orderkey", "user_id", "o_orderdate")
    val res = AsofJoin.join(left, right, "user_id", "ts", "o_orderdate",
        Seq("o_orderkey"), "o_orderkey").collect()
    assert(res(0).getLong(3) === 9L)
  }
}
