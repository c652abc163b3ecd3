package graft

import graft.operators.GraphOps

class GraphOpsSpec extends SparkSpec {
  import spark.implicits._

  test("pageRank matches a sequential power-iteration reference (dangling mass leaks)") {
    // two hubs, a chain, and a dangling sink
    val edges = Seq((1L, 2L), (2L, 1L), (1L, 3L), (3L, 4L), (2L, 4L), (5L, 1L))
      .toDF("src", "dst")
    val got = GraphOps.pageRank(edges, iters = 3)
      .orderBy("node").collect().map(r => (r.getLong(0), r.getDouble(1)))
    val nodes = Seq(1L, 2L, 3L, 4L, 5L)
    val out = Map(1L -> Seq(2L, 3L), 2L -> Seq(1L, 4L), 3L -> Seq(4L), 5L -> Seq(1L))
    var pr = nodes.map(_ -> 1.0 / 5).toMap
    (1 to 3).foreach { _ =>
      pr = nodes.map { v =>
        val in = out.collect { case (u, ds) if ds.contains(v) => pr(u) / ds.size }
        v -> (0.15 / 5 + 0.85 * in.sum)
      }.toMap
    }
    got.foreach { case (n, p) =>
      assert(math.abs(p - pr(n)) < 1e-12, s"node $n: got $p want ${pr(n)}")
    }
    // node 4 is dangling: its mass leaves the system, total < 1
    val total = got.map(_._2).sum
    assert(total < 1.0 && total > 0.5, s"total rank $total")
  }
}
