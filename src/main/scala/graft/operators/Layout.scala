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

  /** [[normalize16]] generalized to `bits`-wide targets: exact integer
    * min-max normalization of `c` into [0, 2^bits - 1]. */
  def normalizeBits(c: Column, lo: Column, hi: Column, bits: Int): Column =
    F.call_function("div",
      (c.cast("long") - lo) * F.lit(1L << bits),
      hi - lo + F.lit(1L))

  /** Bits per dimension for a k-column interleave: 16 where it fits, else
    * the widest that keeps every bit position under 63 (bit 63 is the
    * sign — a set sign bit would invert the range-partition order). k=2,3
    * keep 16 bits; k=4 gets 15. */
  def bitsPerDim(k: Int): Int = math.min(16, 63 / k)

  /** Morton interleave of k `bits`-wide values: bit i of column j lands at
    * position k*i + j — the [[interleave16]] placement for any k. Still
    * one codegen'd projection of disjoint shifted-bit terms. */
  def interleaveN(cols: Seq[Column], bits: Int): Column = {
    val k = cols.size
    (for { i <- 0 until bits; (c, j) <- cols.zipWithIndex } yield
      F.shiftleft(F.shiftright(c, i).bitwiseAND(F.lit(1L)), k * i + j))
      .reduce(_ + _)
  }

  /** The matching DuckDB expression for [[interleaveN]] over already-
    * normalized column names — one generator for both engines' bit
    * placement, like [[interleave16Sql]]. */
  def interleaveNSql(names: Seq[String], bits: Int): String = {
    val k = names.size
    (for { i <- 0 until bits; (n, j) <- names.zipWithIndex } yield
      s"((($n >> $i) & 1) << ${k * i + j})").mkString(" + ")
  }

  /** N-column z-value: the real OPTIMIZE ZORDER BY shape (cluster on any
    * number of dimensions — the reference keeps 6 single-column indexes,
    * create_cf_audit_events.sql:19-24, of which created_at/org/space/
    * event_type are plausible clustering dims). One combinable bounds
    * aggregate over ALL columns, broadcast onto one map-only
    * normalize+interleave projection — cost independent of k. */
  def zValueN(df: DataFrame, cols: Seq[Column], out: String): DataFrame = {
    require(cols.size >= 2, "z-order needs at least 2 dimensions")
    val bits = bitsPerDim(cols.size)
    val bounds = df.agg(
      F.min(cols.head).cast("long").as("__lo0"),
      (F.max(cols.head).cast("long").as("__hi0") +:
        cols.tail.zipWithIndex.flatMap { case (c, i) =>
          Seq(F.min(c).cast("long").as(s"__lo${i + 1}"),
            F.max(c).cast("long").as(s"__hi${i + 1}"))
        }): _*)
    val normed = cols.zipWithIndex.map { case (c, i) =>
      normalizeBits(c, F.col(s"__lo$i"), F.col(s"__hi$i"), bits)
    }
    val drop = cols.indices.flatMap(i => Seq(s"__lo$i", s"__hi$i"))
    df.crossJoin(F.broadcast(bounds))
      .withColumn(out, interleaveN(normed, bits))
      .drop(drop: _*)
  }

  /** [[zOrderLayout]] for N dimensions. */
  def zOrderLayoutN(df: DataFrame, cols: Seq[Column], numFiles: Int): DataFrame =
    zValueN(df, cols, "__z")
      .repartitionByRange(numFiles, F.col("__z"))
      .sortWithinPartitions(F.col("__z"))
      .drop("__z")

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
    survivors(ranges, box).count()

  private def survivors(ranges: DataFrame, box: Seq[(Long, Long)]): DataFrame =
    ranges.filter(
      box.zipWithIndex.map { case ((lo, hi), i) =>
        F.col(s"max_$i") >= lo && F.col(s"min_$i") <= hi
      }.reduce(_ && _))

  /** Execute the pruned scan the stats promise: read ONLY the files whose
    * min/max ranges intersect the box, then apply the exact box filter to
    * the survivors. Row-identical to filtering the full dataset — the
    * stats pass is a superset by construction — but opens the touched
    * corner of a z-ordered layout instead of every file. The per-file
    * stats come from a one-off ranges scan here; a catalog/footer-stats
    * deployment feeds the same `fileRanges` schema from metadata, with
    * the file-list collect bounded by the file count. */
  def prunedRead(spark: org.apache.spark.sql.SparkSession, dir: String,
                 cols: Seq[Column], box: Seq[(Long, Long)]): DataFrame = {
    require(cols.size == box.size, "one (lo, hi) per pruning column")
    val ranges = fileRanges(spark.read.parquet(dir), cols)
    val files = survivors(ranges, box).select("file")
      .collect().map(_.getString(0)).toSeq
    val base =
      if (files.isEmpty)
        spark.read.parquet(dir).limit(0) // schema-stable empty
      else spark.read.parquet(files: _*)
    base.filter(
      cols.zip(box).map { case (c, (lo, hi)) => c >= lo && c <= hi }
        .reduce(_ && _))
  }
}
