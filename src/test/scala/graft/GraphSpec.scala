package graft

import org.apache.spark.sql.functions._

import graft.ops.Graph

/** PageRank semantics: hand-computed ranks on small graphs, rank
  * conservation (Σ pr == 1 every round), dangling redistribution,
  * edge-set (not edge-bag) semantics. */
class GraphSpec extends SparkSpec {
  import spark.implicits._

  private def ranks(edges: Seq[(String, String)], iters: Int): Map[String, Double] =
    Graph.pageRank(edges.toDF("src", "dst"), iters).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap

  test("symmetric cycles are fixpoints: every node keeps 1/N") {
    val two = ranks(Seq(("a", "b"), ("b", "a")), iters = 4)
    assert(two.values.forall(v => math.abs(v - 0.5) < 1e-12), two.toString)
    val three = ranks(Seq(("a", "b"), ("b", "c"), ("c", "a")), iters = 4)
    assert(three.values.forall(v => math.abs(v - 1.0 / 3) < 1e-12), three.toString)
  }

  test("star with a dangling hub: hand-computed one-round ranks; mass conserved") {
    // a→b, c→b: b is dangling. After one round:
    //   pr(b) = 0.05 + 0.85·(2/3 + (1/3)/3) = 0.05 + 0.85·7/9
    //   pr(a) = pr(c) = 0.05 + 0.85·(1/9)
    val r = ranks(Seq(("a", "b"), ("c", "b")), iters = 1)
    assert(math.abs(r("b") - (0.05 + 0.85 * 7 / 9)) < 1e-12, r.toString)
    assert(math.abs(r("a") - (0.05 + 0.85 / 9)) < 1e-12, r.toString)
    assert(math.abs(r("a") - r("c")) < 1e-15)
    assert(math.abs(r.values.sum - 1.0) < 1e-9, "rank mass must conserve")
  }

  test("rank conserves across many rounds and duplicate edges count once") {
    val edges = Seq(("a", "b"), ("b", "c"), ("c", "a"), ("a", "c"),
      ("d", "a"), ("b", "d"))
    val r5 = ranks(edges, iters = 5)
    assert(math.abs(r5.values.sum - 1.0) < 1e-9, r5.toString)
    val dup = ranks(edges ++ edges ++ Seq(("a", "b")), iters = 5)
    assert(r5.keys.forall(k => math.abs(r5(k) - dup(k)) < 1e-12),
      "duplicate edges must not change the graph")
  }

  test("degrees: edge-set in/out counts with zero-filled missing directions") {
    val d = Graph.degrees(Seq(("a", "b"), ("a", "c"), ("b", "c"), ("a", "b"))
        .toDF("src", "dst")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(d === Set(("a", 2L, 0L), ("b", 1L, 1L), ("c", 0L, 2L)))
  }
}
