package graft.operators

import org.apache.spark.sql.{DataFrame, functions => F}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.StructType

/** Keyed as-of join: for each left row, the most recent right row with
  * `rightTime <= leftTime` within the same key group.
  *
  * Spark has no built-in as-of join; the naive formulation (inequality
  * join + groupBy-max) shuffles |L|×|R| candidate pairs. This operator uses
  * the union-and-carry formulation instead: tag both sides, union them,
  * and run a single `last(_, ignoreNulls)` window partitioned by key and
  * ordered by (time, side, tie) — right rows sort before left rows at equal
  * timestamps, so an exactly-simultaneous right row is visible to the left
  * row ("at or before" semantics). One shuffle on the key, no pair blowup,
  * scales to arbitrarily many rows per key because the window frame is
  * `rowsBetween(unboundedPreceding, currentRow)` computed streamingly.
  */
object AsOfJoin {

  /** @param left       left frame
    * @param right      right frame
    * @param on         key column name present on both sides
    * @param leftTime   event-time column on `left`
    * @param rightTime  event-time column on `right`
    * @param rightVals  columns of `right` to carry onto matched left rows
    *                   (emitted as `asof_<name>`)
    * @param leftTie    unique tiebreak column on `left` (determinism)
    * @param rightTie   unique tiebreak column on `right`; among equal-time
    *                   right rows the one with the greatest tie value wins
    */
  def join(
      left: DataFrame,
      right: DataFrame,
      on: String,
      leftTime: String,
      rightTime: String,
      rightVals: Seq[String],
      leftTie: String,
      rightTie: String): DataFrame =
    unionCarry(left, right, on, leftTime, rightTime, rightVals, leftTie, rightTie,
      forward = false)

  /** Forward as-of: for each left row, the FIRST right row with
    * `rightTime >= leftTime` in the same key group ("what happened next").
    * Same union-and-carry plan looking at the following frame; at an equal
    * timestamp the right row counts (at-or-after), and among equal-time
    * right rows the smallest `rightTie` wins. */
  def joinForward(
      left: DataFrame,
      right: DataFrame,
      on: String,
      leftTime: String,
      rightTime: String,
      rightVals: Seq[String],
      leftTie: String,
      rightTie: String): DataFrame =
    unionCarry(left, right, on, leftTime, rightTime, rightVals, leftTie, rightTie,
      forward = true)

  private def unionCarry(
      left: DataFrame,
      right: DataFrame,
      on: String,
      leftTime: String,
      rightTime: String,
      rightVals: Seq[String],
      leftTie: String,
      rightTie: String,
      forward: Boolean): DataFrame = {
    val leftCols = left.columns.toSeq
    val metaCols = Seq("__t", "__side", "__tie", "__payload")
    val outOrder = (leftCols ++ metaCols).map(F.col)

    val lTagged = left
      .withColumn("__t", F.col(leftTime))
      .withColumn("__side", F.lit(1))
      .withColumn("__tie", F.col(leftTie).cast("string"))
      .withColumn("__payload", F.lit(null).cast("string"))
      .select(outOrder: _*)

    // Carried right columns ride as one JSON payload so the union schema is
    // independent of rightVals' types; right rows null-pad the left columns.
    val packed = F.to_json(F.struct(rightVals.map(F.col): _*))
    val rBase = right.select(
      F.col(on),
      F.col(rightTime).as("__t"),
      F.lit(0).as("__side"),
      F.col(rightTie).cast("string").as("__tie"),
      packed.as("__payload"))
    val rTagged = leftCols.filterNot(_ == on)
      .foldLeft(rBase) { (df, c) => df.withColumn(c, F.lit(null).cast(left.schema(c).dataType)) }
      .select(outOrder: _*)

    // Backward: right rows sort BEFORE left at equal time (at-or-before
    // includes the simultaneous right row) and the LAST right in the
    // preceding frame wins. Forward: left sorts before right and the FIRST
    // right in the following frame wins.
    val w =
      if (forward)
        Window.partitionBy(F.col(on))
          .orderBy(F.col("__t").asc, F.col("__side").desc, F.col("__tie").asc)
          .rowsBetween(Window.currentRow, Window.unboundedFollowing)
      else
        Window.partitionBy(F.col(on))
          .orderBy(F.col("__t").asc, F.col("__side").asc, F.col("__tie").asc)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carryExpr = F.when(F.col("__side") === 0, F.col("__payload"))
    val payloadSchema = StructType(rightVals.map(v =>
      org.apache.spark.sql.types.StructField(v, right.schema(v).dataType)))
    val carried = lTagged.unionByName(rTagged)
      .withColumn("__carry",
        (if (forward) F.first(carryExpr, ignoreNulls = true)
         else F.last(carryExpr, ignoreNulls = true)).over(w))
      .filter(F.col("__side") === 1)
      .withColumn("__s", F.from_json(F.col("__carry"), payloadSchema))

    val unpacked = rightVals.foldLeft(carried) { (df, v) =>
      df.withColumn(s"asof_$v", F.col("__s").getField(v))
    }
    unpacked.select((leftCols ++ rightVals.map(v => s"asof_$v")).map(F.col): _*)
  }

  /** Native physical form: a custom `LogicalPlan` + `SparkStrategy` +
    * `SparkPlan` ([[org.apache.spark.sql.graftnative.AsOfJoinExec]]) whose
    * exec merges the two hash-clustered, (key, time)-sorted children in a
    * single `zipPartitions` pass — one shuffle per side, no window
    * evaluation, no payload serialization. Same semantics as [[join]] when
    * right-side (key, time) pairs are unique; with duplicates the carried
    * row among equal timestamps is sort-order-dependent rather than
    * tie-broken. */
  def joinNative(
      left: DataFrame,
      right: DataFrame,
      on: String,
      leftTime: String,
      rightTime: String,
      rightVals: Seq[String]): DataFrame =
    org.apache.spark.sql.graftnative.AsOfJoinNative.join(
      left, right, on, leftTime, rightTime, rightVals)
}
