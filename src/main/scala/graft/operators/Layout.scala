package graft.operators

import org.apache.spark.sql.{Column, DataFrame, functions => F}

/** Multi-dimensional data layout (z-order clustering) for file skipping.
  *
  * At 100 TB the dominant cost of a selective scan is how many FILES the
  * planner must open: per-file column min/max statistics prune a file only
  * when the file's value RANGE is narrow on the filtered column. A 1-D
  * sort gives narrow ranges on one column and full-width ranges on every
  * other, so a predicate on any non-sort column reads the whole table. A
  * z-order (Morton) layout interleaves the bits of two normalized columns
  * into one clustering key and range-partitions files on it, so every
  * file's range is narrow on BOTH columns and a 2-D box predicate prunes
  * multiplicatively — the standard lakehouse OPTIMIZE ZORDER BY shape,
  * here as a plain declarative plan (one bounds aggregate, a map-only
  * bit-interleave expression, one range exchange; no UDF, no collect).
  *
  * All arithmetic is integer-exact and mirrored verbatim by the DuckDB
  * oracle (q_zorder): min-max normalize each column into [0, 65535] with
  * integer `div`, then interleave the 16 bits (bit i of column j lands at
  * position 2*i + j).
  */
object Layout {

  /** Exact integer min-max normalization of `c` into [0, 65535] given
    * 1-row broadcast inclusive bounds. `(c - lo) * 65536 div (hi - lo + 1)`
    * — pure BIGINT ops (no float rounding to drift between engines).
    * Caller guarantees `(hi - lo) * 65536` fits a long (span < 2^47). */
  def normalize16(c: Column, lo: Column, hi: Column): Column =
    F.call_function("div",
      (c.cast("long") - lo) * F.lit(65536L),
      hi - lo + F.lit(1L))

  /** Morton interleave of two 16-bit values: bit i of `a` at 2i, bit i of
    * `b` at 2i+1. 32 disjoint shifted-bit terms summed — one codegen'd
    * projection, no UDF. */
  def interleave16(a: Column, b: Column): Column =
    (0 until 16).map { i =>
      F.shiftleft(F.shiftright(a, i).bitwiseAND(F.lit(1L)), 2 * i) +
        F.shiftleft(F.shiftright(b, i).bitwiseAND(F.lit(1L)), 2 * i + 1)
    }.reduce(_ + _)

  /** The matching DuckDB expression text over columns `na`/`nb` (already
    * normalized) — kept beside the Column form so query and oracle are
    * generated from one definition of the bit placement. */
  def interleave16Sql(na: String, nb: String): String =
    (0 until 16).map { i =>
      s"((($na >> $i) & 1) << ${2 * i}) + ((($nb >> $i) & 1) << ${2 * i + 1})"
    }.mkString(" + ")

  /** Append z-value column `out` interleaving `aCol` and `bCol`:
    * one combinable bounds aggregate broadcast onto a map-only
    * normalize+interleave projection. */
  def zValue2(df: DataFrame, aCol: Column, bCol: Column, out: String): DataFrame = {
    val bounds = df.agg(
      F.min(aCol).cast("long").as("__alo"), F.max(aCol).cast("long").as("__ahi"),
      F.min(bCol).cast("long").as("__blo"), F.max(bCol).cast("long").as("__bhi"))
    df.crossJoin(F.broadcast(bounds))
      .withColumn(out, interleave16(
        normalize16(aCol, F.col("__alo"), F.col("__ahi")),
        normalize16(bCol, F.col("__blo"), F.col("__bhi"))))
      .drop("__alo", "__ahi", "__blo", "__bhi")
  }

  /** Cluster `df` into `numFiles` range-partitioned files by the z-value
    * of (`aCol`, `bCol`): write the result with `.write.parquet` and each
    * file carries a narrow min/max range on BOTH columns. The z column is
    * dropped after partitioning (it exists only to steer the exchange). */
  def zOrderLayout(df: DataFrame, aCol: Column, bCol: Column, numFiles: Int): DataFrame = {
    val z = zValue2(df, aCol, bCol, "__z")
    z.repartitionByRange(numFiles, F.col("__z"))
      .sortWithinPartitions(F.col("__z"))
      .drop("__z")
  }

  /** Per-file min/max statistics of `cols` for a written parquet dataset —
    * the information a stats-aware scan planner prunes with. One grouped
    * aggregate over `input_file_name()`. */
  def fileRanges(df: DataFrame, cols: Seq[Column]): DataFrame = {
    val aggs = cols.zipWithIndex.flatMap { case (c, i) =>
      Seq(F.min(c).as(s"min_$i"), F.max(c).as(s"max_$i"))
    }
    df.groupBy(F.input_file_name().as("file")).agg(aggs.head, aggs.tail: _*)
  }

  /** How many files a box predicate `lo_i <= col_i <= hi_i` must read,
    * given `fileRanges` output: a file is skipped iff its [min,max] range
    * misses the box on ANY dimension (the min/max pruning rule). */
  def filesTouched(ranges: DataFrame, box: Seq[(Long, Long)]): Long =
    ranges.filter(
      box.zipWithIndex.map { case ((lo, hi), i) =>
        F.col(s"max_$i") >= lo && F.col(s"min_$i") <= hi
      }.reduce(_ && _)).count()
}
