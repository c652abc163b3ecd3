package graft.operators

import java.nio.file.Files

import graft.{QueryDef, Tables}
import graft.QueryDef.withOracle
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multi-dimensional data layout: z-order (Morton-curve) clustering for
  * the master-store write path (SURVEY.md §4 layout toolkit; the
  * reference's Pail only shards by fact kind — BatchWorkflow.java:146-162
  * — leaving intra-shard order arbitrary).
  *
  * Why it matters at 100 TB: parquet row-group min/max stats prune reads
  * only when values are clustered. A linear sort clusters ONE dimension —
  * a filter on any other column still scans every row group. Interleaving
  * the bits of two bucketed dimensions (the Morton code) keeps BOTH
  * partially clustered: each of F sorted output files covers ~1/√F of
  * each dimension's range instead of 1/F of one and all of the other, so
  * a 2-D rectangle filter skips most row groups on either predicate.
  * This is the standard lakehouse OPTIMIZE ZORDER layout, built from
  * Spark primitives: min/max bucketing → bit-interleave (all codegen'd
  * built-in bitwise ops, no UDF) → repartitionByRange + sortWithin
  * Partitions on the code → write.
  *
  * Correctness is layout-independent by construction: the z-ordered copy
  * holds exactly the input rows, so the declared query round-trips the
  * write and runs a 2-D rectangle aggregate that the oracle computes on
  * the original table. ZOrderSpec asserts the layout PROPERTY (per-file
  * span of both dims ≪ global span; a linear sort fails this on dim 2).
  */
object Layout {

  /** Spread the low 16 bits of x so bit i lands at position 2i — the
    * classic mask-shift Morton spread, five codegen'd bitwise ops.
    */
  private def spread16(x: Column): Column = {
    val m = Seq(0x00FF00FFL, 0x0F0F0F0FL, 0x33333333L, 0x55555555L)
    val shifts = Seq(8, 4, 2, 1)
    shifts.zip(m).foldLeft(x.bitwiseAND(lit(0xFFFFL))) { case (v, (s, mask)) =>
      v.bitwiseOR(shiftleft(v, s)).bitwiseAND(lit(mask))
    }
  }

  /** Min-max bucket a numeric column onto the 16-bit grid. Constant
    * (mn == mx) columns collapse to bucket 0.
    */
  private def bucket16(c: Column, mn: Column, mx: Column): Column =
    when(mx <= mn, lit(0L)).otherwise(
      floor((c - mn).cast("double") / (mx - mn).cast("double") * 65535.0).cast("long"))

  /** 32-bit Morton code of two numeric dims, each min-max bucketed to 16
    * bits against the given (driver-computed, broadcast-as-literal)
    * bounds. Entirely built-in expressions — stays in whole-stage codegen.
    */
  def zorderCode(c1: Column, mn1: Column, mx1: Column,
      c2: Column, mn2: Column, mx2: Column): Column =
    spread16(bucket16(c1, mn1, mx1))
      .bitwiseOR(shiftleft(spread16(bucket16(c2, mn2, mx2)), 1))

  /** Write `df` to `path` as parquet globally clustered on the z-order of
    * (dim1, dim2): one bounds aggregate (4 scalars to the driver), then a
    * single range exchange on the code and a per-partition sort. `nFiles`
    * bounds output file count; at cluster scale set it from target file
    * size, exactly like any range-partitioned write.
    */
  def writeZOrdered(df: DataFrame, dim1: String, dim2: String, path: String,
      nFiles: Int = 32): Unit = {
    val b = df.agg(min(dim1).as("mn1"), max(dim1).as("mx1"),
      min(dim2).as("mn2"), max(dim2).as("mx2")).head()
    val z = zorderCode(
      col(dim1), lit(b.get(0)), lit(b.get(1)),
      col(dim2), lit(b.get(2)), lit(b.get(3)))
    df.withColumn("zcode", z)
      .repartitionByRange(nFiles, col("zcode"))
      .sortWithinPartitions("zcode")
      .drop("zcode")
      .write.mode("overwrite").parquet(path)
  }

  /** Write `df` globally range-clustered on `dim`: one range exchange
    * (sampled split points), per-partition sort, `nFiles` output files.
    * The 1-D complement of [[writeZOrdered]]: when queries filter ONE
    * dominant column (time, tenant, shard key), a linear sort gives each
    * file a narrow disjoint slice of that column's range, so parquet
    * row-group min/max stats (and any file-stats-aware table format)
    * skip everything outside the predicate — the cheapest layout win
    * there is. Filters on OTHER columns get nothing, which is exactly
    * when z-order takes over (ZOrderSpec shows the contrast).
    */
  def writeRangeSorted(df: DataFrame, dim: String, path: String,
      nFiles: Int = 32): Unit =
    df.repartitionByRange(nFiles, col(dim))
      .sortWithinPartitions(dim)
      .write.mode("overwrite").parquet(path)

  val defs: Seq[QueryDef] = Seq(

    // Range-sort layout roundtrip: write lineitem clustered on l_partkey,
    // answer a narrow partkey-band aggregate from the copy; the oracle
    // runs the same band on the ORIGINAL table (content is
    // layout-invariant). The skipping property — the band touches 1-2 of
    // the 32 files — is pinned in ZOrderSpec, invisible to row content.
    withOracle(
      "layout_range_sort",
      """SELECT count(*) AS n_rows,
        |       round(sum(l_extendedprice), 2) AS revenue
        |FROM lineitem
        |WHERE l_partkey BETWEEN 100 AND 120""".stripMargin) { (s, dir) =>
      val path = graft.Scratch.dir("graft_rangesort") + "/lineitem"
      writeRangeSorted(
        Tables.lineitem(s, dir)
          .select("l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice"),
        "l_partkey", path)
      s.read.parquet(path)
        .where(col("l_partkey").between(100, 120))
        .agg(count(lit(1)).as("n_rows"),
          round(sum("l_extendedprice"), 2).as("revenue"))
    },

    // Z-order layout roundtrip: write lineitem clustered on
    // (l_partkey, l_suppkey), read the copy back, and answer a 2-D
    // rectangle aggregate from it. The oracle runs the same rectangle on
    // the ORIGINAL table — content must be layout-invariant. The
    // clustering property itself (row-group skippability) is pinned by
    // ZOrderSpec, which parquet stats make unobservable from row content.
    withOracle(
      "layout_zorder",
      """SELECT count(*) AS n_rows,
        |       round(sum(l_extendedprice), 2) AS revenue
        |FROM lineitem
        |WHERE l_partkey <= 40 AND l_suppkey <= 4""".stripMargin) { (s, dir) =>
      val path = graft.Scratch.dir("graft_zorder") + "/lineitem"
      writeZOrdered(
        Tables.lineitem(s, dir)
          .select("l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice"),
        "l_partkey", "l_suppkey", path)
      s.read.parquet(path)
        .where(col("l_partkey") <= 40 && col("l_suppkey") <= 4)
        .agg(count(lit(1)).as("n_rows"),
          round(sum("l_extendedprice"), 2).as("revenue"))
    }
  )
}
