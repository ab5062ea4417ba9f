package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Edge-case behavior of the sketch family: empty inputs, null inputs,
  * and degenerate groups must yield empty-but-well-formed sketches,
  * never exceptions — at corpus scale a partition with zero rows for
  * some group is routine, not exceptional. */
class SketchSpec extends SparkSpec {

  test("theta: empty input yields estimate 0; nulls are skipped") {
    import spark.implicits._
    val empty = spark.range(0).select(col("id"))
      .agg(theta.estimate(theta.sketchAgg(col("id"))).cast("long").as("n"))
      .collect()
    assert(empty.head.getLong(0) === 0L)
    val withNulls = Seq(Some(1L), None, Some(2L), None, Some(1L)).toDF("v")
      .agg(theta.estimate(theta.sketchAgg(col("v"))).cast("long").as("n"))
      .collect()
    assert(withNulls.head.getLong(0) === 2L)
  }

  test("theta: algebra against an empty sketch is identity / empty") {
    import spark.implicits._
    val row = Seq((1L)).toDF("v")
      .agg(theta.sketchAgg(col("v")).as("a"))
      .crossJoin(spark.range(0).select(col("id"))
        .agg(theta.sketchAgg(col("id")).as("b")))
      .select(
        theta.estimate(theta.aNotB(col("a"), col("b"))).cast("long").as("diff"),
        theta.estimate(theta.aNotB(col("b"), col("a"))).cast("long").as("rdiff"),
        theta.estimate(theta.intersect(col("a"), col("b"))).cast("long").as("inter"))
      .collect().head
    assert(row.getLong(0) === 1L) // A \ {} = A
    assert(row.getLong(1) === 0L) // {} \ A = {}
    assert(row.getLong(2) === 0L) // A n {} = {}
  }

  test("freq items: empty and all-empty-array inputs yield an empty top-k") {
    import spark.implicits._
    val none = spark.range(0).select(array().cast("array<string>").as("g"))
      .agg(freqitems.topK(freqitems.agg(col("g")), 5).as("t"))
      .collect().head.getSeq[Any](0)
    assert(none.isEmpty)
    val emptyArrays = Seq(Seq.empty[String], Seq.empty[String]).toDF("g")
      .agg(freqitems.topK(freqitems.agg(col("g")), 5).as("t"))
      .collect().head.getSeq[Any](0)
    assert(emptyArrays.isEmpty)
  }

  test("bloomHitCount: null array rows stay null-safe (expression contract)") {
    import spark.implicits._
    val bf = spark.range(0, 10).stat.bloomFilter("id", 10, 0.01)
    val got = Seq((1L, Some(Seq(1L, 99L))), (2L, None))
      .toDF("id", "hs")
      .select(col("id"), hashes.bloomHitCount(col("hs"), bf).as("n"))
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    assert(got(1L) === 1L)
    assert(got(2L) === -1L) // null in -> null out, never a crash
  }
}
