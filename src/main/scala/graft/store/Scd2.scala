package graft.store

import org.apache.spark.sql.{DataFrame, functions => F}

/** Slowly-changing-dimension Type 2 maintenance over a [[ManifestTable]]:
  * the dimension keeps FULL HISTORY as validity intervals — each row is
  * (row_key, key, attrs..., valid_from, valid_to) with `valid_to IS NULL`
  * marking the current version. Applying an update batch closes the
  * current row of every key whose attributes changed (valid_to := batch
  * ts) and opens a new current row; unchanged keys are untouched — and
  * because the write goes through [[ManifestTable.merge]] keyed on the
  * SURROGATE `row_key` (key @ valid_from), only files holding touched
  * rows rewrite, history rows never do.
  *
  * The usual pairing: `snapshotAt` answers "the dimension as the TABLE
  * changed" (commit history), the validity intervals answer "the entity
  * as the WORLD changed" (business time) — both exist here, and the
  * as-of business-time read is [[asOf]]. */
object Scd2 {

  /** Apply `updates` (one row per key: the key column, the attribute
    * columns, and `tsCol` — the business time of the change) to the
    * dimension. Idempotent for identical attribute values: a key whose
    * attrs equal its current row is skipped entirely. */
  def applyUpdates(table: ManifestTable, updates: DataFrame, keyCol: String,
                   attrCols: Seq[String], tsCol: String): Unit = {
    val upd = updates.select(
      (Seq(F.col(keyCol).cast("string").as("k"), F.col(tsCol).cast("long").as("ts")) ++
        attrCols.map(F.col)): _*)
    val existing = table.snapshot
    val current =
      if (existing.columns.isEmpty) None
      else Some(existing.filter(F.col("valid_to").isNull))
    val changed = current match {
      case None => upd
      case Some(cur) =>
        val curAttrs = cur.select(
          (Seq(F.col("k"), F.lit(1).as("__has_cur")) ++
            attrCols.map(c => F.col(c).as(s"__old_$c"))): _*)
        upd.join(curAttrs, Seq("k"), "left")
          .filter(F.col("__has_cur").isNull || // brand-new key
            attrCols.map(c => !(F.col(c) <=> F.col(s"__old_$c"))).reduce(_ || _))
          .drop(attrCols.map(c => s"__old_$c"): _*)
          .drop("__has_cur")
    }
    // rows to close: the current versions of changed keys, valid_to := ts
    val closed = current match {
      case None => None
      case Some(cur) =>
        val c = cur.join(changed.select(F.col("k"), F.col("ts").as("__close_ts")), Seq("k"))
          .withColumn("valid_to", F.col("__close_ts")).drop("__close_ts")
        Some(c)
    }
    val opened = changed
      .withColumn("valid_from", F.col("ts"))
      .withColumn("valid_to", F.lit(null).cast("long"))
      .withColumn("row_key", F.concat_ws("@", F.col("k"), F.col("valid_from")))
      .drop("ts")
    val source = closed match {
      case Some(c) => c.select(opened.columns.map(F.col): _*).unionByName(opened)
      case None => opened
    }
    if (!source.isEmpty) { table.merge(source, "row_key"); () }
  }

  /** The dimension as the WORLD was at business time `ts`: rows whose
    * validity interval covers it. */
  def asOf(table: ManifestTable, ts: Long): DataFrame =
    table.snapshot.filter(
      F.col("valid_from") <= ts && (F.col("valid_to").isNull || F.col("valid_to") > ts))

  /** The current dimension state. */
  def current(table: ManifestTable): DataFrame =
    table.snapshot.filter(F.col("valid_to").isNull)
}
