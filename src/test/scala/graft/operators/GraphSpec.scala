package graft.operators

import graft.SparkSpec

class GraphSpec extends SparkSpec {
  import spark.implicits._

  /** Local reference PageRank (dense, same convention as Graph.pageRank). */
  private def ref(
      edges: Seq[(String, String)], iters: Int, d: Double): Map[String, Double] = {
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct.sorted
    val n = nodes.length
    val out = edges.distinct.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    var r = nodes.map(_ -> 1.0 / n).toMap
    for (_ <- 1 to iters) {
      val dangling = nodes.filterNot(out.contains).map(r).sum
      r = nodes.map { v =>
        val in = edges.distinct.collect {
          case (s, dst) if dst == v => r(s) / out(s).length
        }.sum
        v -> ((1.0 - d) / n + d * (in + dangling / n))
      }.toMap
    }
    r
  }

  test("pageRank matches a dense reference on a known graph (dangling node included)") {
    val edges = Seq(("a", "b"), ("a", "c"), ("b", "c"), ("c", "a"), ("c", "d"))
    // d is dangling: no out-edges — its mass must redistribute, not leak
    val got = Graph.pageRank(edges.toDF("src", "dst"), iterations = 12)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val want = ref(edges, 12, 0.85)
    assert(got.keySet == want.keySet)
    for ((k, v) <- want)
      assert(math.abs(got(k) - v) < 1e-9, s"node $k: got ${got(k)} want $v")
    assert(math.abs(got.values.sum - 1.0) < 1e-9, "ranks must sum to 1")
  }

  test("pageRankIntScaled tracks the float iteration on a sink-free graph") {
    // symmetrized (sink-free) graph — the int variant's documented
    // domain; micro-unit floor rounding loses < ~1e-9 of mass per step,
    // so scaled/1e12 must track the float ranks to ~1e-6
    val base = Seq(("a", "b"), ("b", "c"), ("c", "a"), ("c", "d"), ("d", "a"))
    val edges = (base ++ base.map(_.swap)).distinct
    val intR = Graph.pageRankIntScaled(edges.toDF("src", "dst"), iterations = 3)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val want = ref(edges, 3, 0.85)
    assert(intR.keySet == want.keySet)
    for ((k, v) <- want)
      assert(math.abs(intR(k) / 1e12 - v) < 1e-6,
        s"node $k: scaled ${intR(k)} (${intR(k) / 1e12}) want $v")
    // determinism: a second run is bit-identical (integer algebra has
    // no partition-order sensitivity)
    val again = Graph.pageRankIntScaled(edges.toDF("src", "dst"), iterations = 3)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(again == intR)
  }

  test("pageRank ranks the hub above leaves") {
    // star: everyone links to h
    val edges = (1 to 6).map(i => (s"n$i", "h"))
    val got = Graph.pageRank(edges.toDF("src", "dst"), iterations = 8)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(got("h") > got("n1") * 3)
  }
}
