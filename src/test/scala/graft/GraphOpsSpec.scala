package graft

import graft.operators.GraphOps

class GraphOpsSpec extends SparkSpec {

  test("pageRank matches an independent local reference on a known graph") {
    import spark.implicits._
    // 5 nodes; node 4 is a dangling sink (no out-edges)
    val edges = Seq((0L, 1L), (0L, 2L), (1L, 2L), (2L, 0L), (3L, 2L),
      (2L, 4L)).toDF("src", "dst")
    val got = GraphOps.pageRank(spark, edges, "src", "dst", 25, 0.85)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap

    // local reference: same simplified formulation, dense loop
    val n = 5
    val out = Map(0L -> 2, 1L -> 1, 2L -> 2, 3L -> 1)
    val es = Seq((0L, 1L), (0L, 2L), (1L, 2L), (2L, 0L), (3L, 2L), (2L, 4L))
    var r = Map((0L until 5L).map(_ -> 1.0 / n): _*)
    for (_ <- 0 until 25) {
      val cin = es.groupBy(_._2).map { case (d, in) =>
        d -> in.map { case (s, _) => r(s) / out(s) }.sum
      }
      r = (0L until 5L).map(v => v -> (0.15 / n + 0.85 * cin.getOrElse(v, 0.0))).toMap
    }
    (0L until 5L).foreach { v =>
      assert(math.abs(got(v) - r(v)) < 1e-12, s"node $v: ${got(v)} vs ${r(v)}")
    }
    // structure sanity: the hub (2) outranks everyone; the source-only
    // node (3) sits at the damping floor
    assert(got(2L) > got(0L) && got(2L) > got(4L))
    assert(math.abs(got(3L) - 0.15 / n) < 1e-12)
  }
}
