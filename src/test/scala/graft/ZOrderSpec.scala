package graft

import java.nio.file.Files

import graft.operators.Layout
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Z-order layout: the content roundtrip is oracle-checked by
  * layout_zorder; this spec pins the CLUSTERING property the oracle
  * cannot see — that every output file covers a small fraction of BOTH
  * dimensions' ranges (so parquet row-group min/max stats prune 2-D
  * rectangle filters), where a linear sort clusters only its sort key.
  */
class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  // deterministic pseudo-uniform 2-D points: multiplicative-hash mixes of
  // the row id (no Random — repeatable across runs and partitions)
  private def points(n: Int): DataFrame =
    spark.range(n.toLong)
      .select(
        (pmod(col("id") * 2654435761L + 12345L, lit(65536L))).as("x"),
        (pmod(col("id") * 40503L + 54321L, lit(65536L))).as("y"))

  /** Mean per-file (max-min) span of `dim`, as a fraction of its global
    * span, over the parquet files at `path`.
    */
  private def meanFileSpanFrac(path: String, dim: String): Double = {
    val df = spark.read.parquet(path)
    val g = df.agg((max(dim) - min(dim)).cast("double")).head().getDouble(0)
    val per = df.groupBy(input_file_name())
      .agg((max(dim) - min(dim)).cast("double").as("span"))
      .agg(avg("span")).head().getDouble(0)
    per / g
  }

  test("z-order write clusters BOTH dims; a linear sort clusters only its key") {
    val n = 50000
    val files = 16
    val root = Files.createTempDirectory("graft_zspec").toString
    val zPath = root + "/z"
    val linPath = root + "/lin"
    Layout.writeZOrdered(points(n), "x", "y", zPath, nFiles = files)
    points(n).repartitionByRange(files, col("x")).sortWithinPartitions("x")
      .write.mode("overwrite").parquet(linPath)

    // a perfect 16-file Morton layout covers ~1/4 of each dim per file
    // (√16); allow generous slack for curve jumps and range-sampling skew
    val zx = meanFileSpanFrac(zPath, "x")
    val zy = meanFileSpanFrac(zPath, "y")
    assert(zx <= 0.5, s"z-order mean per-file x-span frac $zx should be ≪ 1")
    assert(zy <= 0.5, s"z-order mean per-file y-span frac $zy should be ≪ 1")

    // the linear layout's non-key dim stays unclustered (≈ full range per
    // file) — this is exactly what z-order buys over sorting
    val linY = meanFileSpanFrac(linPath, "y")
    assert(linY >= 0.8, s"linear sort leaves y unclustered, got $linY")
  }

  test("z-ordered copy holds exactly the input rows") {
    val n = 5000
    val path = Files.createTempDirectory("graft_zspec_rt").toString + "/rt"
    val in = points(n)
    Layout.writeZOrdered(in, "x", "y", path, nFiles = 4)
    val back = spark.read.parquet(path)
    assert(back.count() == n.toLong)
    assert(in.exceptAll(back).isEmpty && back.exceptAll(in).isEmpty)
  }

  test("zorderCode orders a 2x2 quadrant grid in Morton sequence") {
    // bucket boundaries: with bounds [0, 65535], values 0 and 65535 land
    // in buckets 0 and 65535 — use the two extreme corners per dim so the
    // interleave order is the textbook z: (0,0) < (1,0) < (0,1) < (1,1)
    // reading bit 0 of each dim from the top interleaved bits
    val df = Seq((0L, 0L), (65535L, 0L), (0L, 65535L), (65535L, 65535L))
      .toDF("x", "y")
      .select(col("x"), col("y"),
        Layout.zorderCode(col("x"), lit(0L), lit(65535L),
          col("y"), lit(0L), lit(65535L)).as("z"))
    val order = df.orderBy("z").select("x", "y").as[(Long, Long)].collect().toSeq
    assert(order == Seq((0L, 0L), (65535L, 0L), (0L, 65535L), (65535L, 65535L)))
  }

  test("range-sort layout: disjoint per-file key slices, narrow band touches few files") {
    val n = 50000
    val files = 16
    val path = Files.createTempDirectory("graft_rsort").toString + "/rs"
    Layout.writeRangeSorted(points(n), "x", path, nFiles = files)
    val back = spark.read.parquet(path)

    // per-file [min,max] slices of the sort key are pairwise disjoint
    // (range partitioning assigns each key interval to exactly one file)
    val slices = back.groupBy(input_file_name().as("f"))
      .agg(min("x").as("mn"), max("x").as("mx"))
      .orderBy("mn")
      .select("mn", "mx").as[(Long, Long)].collect()
    assert(slices.length > 1)
    slices.sliding(2).foreach {
      case Array((_, aMax), (bMin, _)) =>
        assert(aMax <= bMin, s"file slices overlap: max $aMax > next min $bMin")
      case _ =>
    }

    // a 1% key band intersects 1-2 of the 16 slices — every other file
    // is skippable from its stats alone
    val touched = back.where(col("x").between(1000, 1600))
      .select(input_file_name()).distinct().count()
    assert(touched <= 2, s"narrow band touched $touched of $files files")

    // content is layout-invariant (exact multiset roundtrip)
    assert(back.count() == n.toLong)
    assert(points(n).exceptAll(back).isEmpty)
  }
}
