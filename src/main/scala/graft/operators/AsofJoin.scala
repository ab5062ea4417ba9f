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
 * Implementation is the declarative tagged-union trick (the prompt's
 * preferred option (a) — compose existing ops): union both sides with a
 * side tag, window per key ordered by (ts, side, tiebreak), and carry
 * the last right payload forward with `last(..., ignoreNulls)`. One
 * shuffle on the key (same as any join), no range-join nested loop, and
 * the window is incremental — this scales exactly like a sort-merge
 * join at 100 TB, with AQE handling key skew.
 */
object AsofJoin {

  /**
   * @param left      probe side
   * @param right     reference side (its `payload` columns are carried)
   * @param key       equality key column name present on both sides
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
    val reserved = Seq("_ts", "_side", "_tb") ++ payload.flatMap(c => Seq(s"_p_$c", s"_c_$c"))
    require(!leftCols.exists(reserved.contains),
      s"left columns collide with asof-join internals: ${leftCols.intersect(reserved).mkString(",")}")
    require(payload.forall(c => !leftCols.contains(c)),
      s"payload columns already exist on the left side: ${payload.intersect(leftCols).mkString(",")}")
    require(left.columns.contains(key) && right.columns.contains(key),
      s"key '$key' must exist on both sides (rename the right key first)")
    val taggedRight = right.select(
      (col(key).cast("long").as(key) +:
        col(rightTs).cast("timestamp").as("_ts") +:
        lit(1).as("_side") +:
        col(tiebreak).cast("long").as("_tb") +:
        payload.map(c => col(c).as(s"_p_$c"))) ++
        leftCols.filterNot(_ == key).map(c => lit(null).cast(left.schema(c).dataType).as(c)): _*)
    val taggedLeft = left.select(
      (col(key).cast("long").as(key) +:
        col(leftTs).cast("timestamp").as("_ts") +:
        lit(0).as("_side") +:
        lit(Long.MaxValue).as("_tb") +:
        payload.map(c => lit(null).cast(right.schema(c).dataType).as(s"_p_$c"))) ++
        leftCols.filterNot(_ == key).map(col): _*)
    // right rows at the same timestamp sort BEFORE left rows (<= semantics);
    // among right ties the largest tiebreak lands last and is carried
    val w = Window
      .partitionBy(col(key))
      .orderBy(col("_ts"), col("_side").desc, col("_tb"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = payload.foldLeft(taggedRight.unionByName(taggedLeft)) { (df, c) =>
      df.withColumn(s"_c_$c", last(col(s"_p_$c"), ignoreNulls = true).over(w))
    }
    carried
      .where(col("_side") === 0)
      .select(leftCols.map(col) ++ payload.map(c => col(s"_c_$c").as(c)): _*)
  }
}
