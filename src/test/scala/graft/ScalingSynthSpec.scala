package graft

import org.apache.spark.sql.functions._

/** The scaling-corpus generator (Scaling.synthScale): replicas must be
  * id-disjoint, token-decorrelated (tagged), and isometric on the
  * embedding side — the properties that keep a synthesized 10×/100×
  * corpus the SAME WORKLOAD at a bigger n rather than one giant
  * near-dup cluster. Pinned here because r15 swapped the factor−1
  * chained unions for one row-local explode and the scaling artifact's
  * history is only comparable if the generated rows didn't change.
  */
class ScalingSynthSpec extends SparkSpec {
  import spark.implicits._

  test("synthScale(3): replica mapping matches the documented formulas row-for-row") {
    val dir = Scaling.synthScale(spark, sf0001, 3)
    val Stride = 10000000L

    val base = spark.read.parquet(s"$sf0001/documents.parquet")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    assert(docs.count() == 3 * base.count())
    // base replica rides through untouched
    assert(docs.where($"doc_id" < Stride).select("doc_id", "text")
      .exceptAll(base.select("doc_id", "text")).isEmpty)
    // replica k's tokens all carry the r{k-1}_ tag, ids stride by k
    for (k <- 1 to 2) {
      val rep = docs.where($"doc_id" >= k * Stride && $"doc_id" < (k + 1) * Stride)
      assert(rep.count() == base.count(), s"replica $k row count")
      val untagged = rep.select(explode(split($"text", "\\s+")).as("t"))
        .where(!$"t".startsWith(s"r${k - 1}_")).count()
      assert(untagged == 0, s"replica $k: $untagged tokens missing the tag")
    }
    // no cross-replica shingle collisions by construction -> exact-dedup
    // finds no pair across replicas (spot: distinct texts stay distinct)
    assert(docs.select("text").distinct().count() == 3 * base.select("text").distinct().count())

    val baseEmb = spark.read.parquet(s"$sf0001/embeddings.parquet")
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    assert(emb.count() == 3 * baseEmb.count())
    // replica embeddings are sign-pattern isometries: |v| preserved
    // exactly (same floats, only signs flip), pattern = hash(i, k-1)
    for (k <- 1 to 2) {
      val joined = emb.where($"vec_id" >= k * Stride && $"vec_id" < (k + 1) * Stride)
        .select(($"vec_id" - k * Stride).as("vec_id"), $"embedding".as("rep"))
        .join(baseEmb.select($"vec_id", $"embedding".as("orig")), "vec_id")
      val bad = joined.select(explode(arrays_zip(
          $"rep", $"orig",
          transform($"orig", (x, i) =>
            when(pmod(hash(i, lit(k - 1)), lit(2)) === 0, x)
              .otherwise(-x).cast("float")))).as("z"))
        .where($"z.rep" =!= $"z.2").count()
      assert(bad == 0, s"replica $k: $bad positions diverge from the sign formula")
    }
  }
}
