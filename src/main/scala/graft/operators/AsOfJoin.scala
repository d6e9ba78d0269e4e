package graft.operators

import org.apache.spark.sql.{Column, DataFrame, functions => F}
import org.apache.spark.sql.expressions.Window

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
      rightTie: String): DataFrame = {
    val leftCols = left.columns.toSeq
    val l = left
      .withColumn("__t", F.col(leftTime))
      .withColumn("__side", F.lit(1))
      .withColumn("__tie", F.col(leftTie).cast("string"))
      .withColumn("__payload", F.lit(null).cast("string"))
    // Pack the carried right values into one JSON column so both sides of
    // the union share a schema regardless of rightVals' types.
    val packed = F.to_json(F.struct(rightVals.map(F.col): _*))
    val r = right
      .withColumn("__t", F.col(rightTime))
      .withColumn("__side", F.lit(0))
      .withColumn("__tie", F.col(rightTie).cast("string"))
      .withColumn("__payload", packed)
      .select((Seq(on, "__t", "__side", "__tie", "__payload") ++ Nil).map(F.col): _*)
    val lSel = l.select((Seq(on, "__t", "__side", "__tie", "__payload") ++ leftCols.filterNot(c =>
      c == on)).distinct.map(F.col): _*)
    // Align schemas: right side lacks the left payload columns.
    val rAligned = leftCols.filterNot(_ == on).foldLeft(r) { (df, c) =>
      if (Seq("__t", "__side", "__tie", "__payload").contains(c)) df
      else df.withColumn(c, F.lit(null).cast(left.schema(c).dataType))
    }.select(lSel.columns.map(F.col): _*)

    val w = Window
      .partitionBy(F.col(on))
      .orderBy(F.col("__t").asc, F.col("__side").asc, F.col("__tie").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = lSel
      .unionByName(rAligned)
      .withColumn("__carry",
        F.last(F.when(F.col("__side") === 0, F.col("__payload")), ignoreNulls = true).over(w))
    val schema = org.apache.spark.sql.types.StructType(
      rightVals.map(v => org.apache.spark.sql.types.StructField(v, right.schema(v).dataType)))
    val unpacked = carried
      .filter(F.col("__side") === 1)
      .withColumn("__s", F.from_json(F.col("__carry"), schema))
    val out = rightVals.foldLeft(unpacked) { (df, v) =>
      df.withColumn(s"asof_$v", F.col("__s").getField(v))
    }
    out.select((leftCols ++ rightVals.map(v => s"asof_$v")).map(F.col): _*)
  }
}
