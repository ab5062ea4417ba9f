package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * As-of join: for every left row, the latest right row with
 * `rightTs <= leftTs` within the same key — the temporal-alignment
 * primitive (events -> most recent order, trade -> last quote) that
 * Spark has no built-in operator for.
 *
 * Implementation is the declarative tagged-union trick (compose
 * existing ops): union both sides with a side tag, window per key
 * ordered by (ts, side, tiebreak), and carry the latest right row
 * forward as ONE struct (so a right row whose payload field is null is
 * carried as-is — never mixed with older rows, matching DuckDB ASOF
 * semantics). One shuffle on the key, incremental window — scales like
 * a sort-merge join at 100 TB, with AQE handling key skew.
 *
 * Right rows with a null key or null timestamp can never match and are
 * dropped up front (equality + range semantics); left rows always
 * survive (payload null when nothing precedes).
 */
object AsofJoin {

  /**
   * @param left      probe side
   * @param right     reference side (its `payload` columns are carried)
   * @param key       equality key column name present on both sides
   *                  (same type both sides; rename the right key first)
   * @param leftTs    event-time column on `left`
   * @param rightTs   event-time column on `right`
   * @param payload   right-side columns to attach to each left row
   * @param tiebreak  right-side column ordering ties on equal rightTs
   *                  (largest wins), e.g. a unique id
   * @return left rows + payload columns (null when no right row precedes)
   */
  def join(
      left: DataFrame, right: DataFrame, key: String,
      leftTs: String, rightTs: String,
      payload: Seq[String], tiebreak: String): DataFrame = {
    val leftCols = left.columns.toSeq
    val reserved = Seq("_ts", "_side", "_tb", "_p", "_c")
    require(!leftCols.exists(reserved.contains),
      s"left columns collide with asof-join internals: ${leftCols.intersect(reserved).mkString(",")}")
    require(payload.forall(c => !leftCols.contains(c)),
      s"payload columns already exist on the left side: ${payload.intersect(leftCols).mkString(",")}")
    require(left.columns.contains(key) && right.columns.contains(key),
      s"key '$key' must exist on both sides (rename the right key first)")

    val payloadStruct = struct(payload.map(c => col(c).as(c)): _*)
    val taggedRight = right
      .where(col(key).isNotNull && col(rightTs).isNotNull)
      .select(
        (col(key) +:
          col(rightTs).cast("timestamp").as("_ts") +:
          lit(1).as("_side") +:
          col(tiebreak).as("_tb") +:
          payloadStruct.as("_p") +:
          leftCols.filterNot(_ == key).map(c => lit(null).cast(left.schema(c).dataType).as(c))): _*)
    val nullTb = lit(null).cast(right.schema(tiebreak).dataType)
    val nullPayload = lit(null).cast(
      org.apache.spark.sql.types.StructType(payload.map(c => right.schema(c).copy(name = c))))
    val taggedLeft = left.select(
      (col(key) +:
        col(leftTs).cast("timestamp").as("_ts") +:
        lit(0).as("_side") +:
        nullTb.as("_tb") +:
        nullPayload.as("_p") +:
        leftCols.filterNot(_ == key).map(col)): _*)
    // right rows at the same timestamp sort BEFORE left rows (<= semantics);
    // among right ties the largest tiebreak lands last; nulls_first keeps
    // left sentinel tiebreaks out of the way
    val w = Window
      .partitionBy(col(key))
      .orderBy(col("_ts").asc, col("_side").desc, col("_tb").asc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    taggedRight.unionByName(taggedLeft)
      .withColumn("_c", last(col("_p"), ignoreNulls = true).over(w))
      .where(col("_side") === 0)
      .select(leftCols.map(col) ++ payload.map(c => col(s"_c.$c").as(c)): _*)
  }

  /**
   * Nearest-in-time join: for every left row, the right row with the
   * SMALLEST |rightTs - leftTs| within the same key, either direction
   * (sensor alignment, closest-order attribution). Ties on equal
   * distance break to the largest `tiebreak` value — fully
   * deterministic, so the composition has an exact oracle.
   *
   * Same tagged-union shape as [[join]]: ONE shuffle on the key, then
   * TWO incremental window passes over the sorted partition (forward
   * carry = latest right at ts <= left, backward carry = earliest right
   * at ts >= left; both carry max-tiebreak within their boundary ts),
   * and a scan-stage pick of the nearer side. No per-key right-side
   * expansion — at 100 TB this scales like the as-of join, not like the
   * naive key-join + per-left sort (which explodes on hot keys).
   */
  def joinNearest(
      left: DataFrame, right: DataFrame, key: String,
      leftTs: String, rightTs: String,
      payload: Seq[String], tiebreak: String): DataFrame = {
    val leftCols = left.columns.toSeq
    val reserved = Seq("_ts", "_side", "_tb", "_p", "_prev", "_next")
    require(!leftCols.exists(reserved.contains),
      s"left columns collide with asof-join internals: ${leftCols.intersect(reserved).mkString(",")}")
    require(payload.forall(c => !leftCols.contains(c)),
      s"payload columns already exist on the left side: ${payload.intersect(leftCols).mkString(",")}")
    require(left.columns.contains(key) && right.columns.contains(key),
      s"key '$key' must exist on both sides (rename the right key first)")

    // carried struct leads with (ts, tiebreak) so the pick stage can
    // compute |delta| and break ties without re-joining the right side
    val payloadStruct = struct(
      col(rightTs).cast("timestamp").as("_rts") +:
        col(tiebreak).as("_rtb") +:
        payload.map(c => col(c).as(c)): _*)
    val taggedRight = right
      .where(col(key).isNotNull && col(rightTs).isNotNull)
      .select(
        (col(key) +:
          col(rightTs).cast("timestamp").as("_ts") +:
          lit(1).as("_side") +:
          col(tiebreak).as("_tb") +:
          payloadStruct.as("_p") +:
          leftCols.filterNot(_ == key).map(c => lit(null).cast(left.schema(c).dataType).as(c))): _*)
    val nullTb = lit(null).cast(right.schema(tiebreak).dataType)
    val nullPayload = lit(null).cast(org.apache.spark.sql.types.StructType(
      right.schema(rightTs).copy(name = "_rts") +:
        right.schema(tiebreak).copy(name = "_rtb") +:
        payload.map(c => right.schema(c).copy(name = c))))
    val taggedLeft = left.select(
      (col(key) +:
        col(leftTs).cast("timestamp").as("_ts") +:
        lit(0).as("_side") +:
        nullTb.as("_tb") +:
        nullPayload.as("_p") +:
        leftCols.filterNot(_ == key).map(col)): _*)
    // forward pass: right rows at the same ts sort before left (so an
    // exact-ts match is visible at distance 0), max tiebreak lands last
    val wPrev = Window
      .partitionBy(col(key))
      .orderBy(col("_ts").asc, col("_side").desc, col("_tb").asc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // backward pass: reversed ts; _tb still ASC so the LAST right row of
    // an equal-ts block (the one the carry sees) is again max tiebreak
    val wNext = Window
      .partitionBy(col(key))
      .orderBy(col("_ts").desc, col("_side").desc, col("_tb").asc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val prevD = unix_micros(col("_ts")) - unix_micros(col("_prev._rts"))
    val nextD = unix_micros(col("_next._rts")) - unix_micros(col("_ts"))
    val pickPrev = col("_next").isNull ||
      (col("_prev").isNotNull &&
        (prevD < nextD || (prevD === nextD && col("_prev._rtb") >= col("_next._rtb"))))
    taggedRight.unionByName(taggedLeft)
      .withColumn("_prev", last(col("_p"), ignoreNulls = true).over(wPrev))
      .withColumn("_next", last(col("_p"), ignoreNulls = true).over(wNext))
      .where(col("_side") === 0)
      .withColumn("_p", when(pickPrev, col("_prev")).otherwise(col("_next")))
      .select(leftCols.map(col) ++ payload.map(c => col(s"_p.$c").as(c)): _*)
  }
}
