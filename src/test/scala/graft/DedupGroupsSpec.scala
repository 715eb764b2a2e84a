package graft

import org.apache.spark.sql.functions._
import graft.queries.Dedup

/** Connected components: correctness on multi-component graphs and the
  * pointer-jumping round bound — a planted chain of length n must
  * converge in O(log n) rounds, not O(n) (the property that keeps a
  * long-chain component from costing 40 shuffle rounds at scale).
  */
class DedupGroupsSpec extends SparkSpec {

  test("chain converges in O(log n) rounds with pointer jumping") {
    import spark.implicits._
    // 0-1-2-...-15: diameter 15. Plain propagation needs ~15 rounds;
    // doubling must finish in ≤ ceil(log2(15)) + 2 = 6.
    val edges = (0L until 15L).map(i => (i, i + 1)).toDF("src", "dst")
    val (labels, rounds) = Dedup.connectedComponents(edges)
    val lbls = labels.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(lbls.size == 16 && lbls.values.forall(_ == 0L),
      s"single chain component labeled by its min: $lbls")
    assert(rounds <= 6, s"pointer jumping should need ≤6 rounds for diameter 15, took $rounds")
    labels.unpersist()
  }

  test("disjoint components get distinct min labels") {
    import spark.implicits._
    val edges = Seq((1L, 2L), (2L, 3L), (10L, 11L), (20L, 21L), (21L, 22L), (22L, 20L))
      .toDF("src", "dst")
    val (labels, _) = Dedup.connectedComponents(edges)
    val lbls = labels.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(Seq(1L, 2L, 3L).forall(lbls(_) == 1L))
    assert(Seq(10L, 11L).forall(lbls(_) == 10L))
    assert(Seq(20L, 21L, 22L).forall(lbls(_) == 20L))
    labels.unpersist()
  }
}
