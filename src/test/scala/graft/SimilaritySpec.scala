package graft

import graft.queries.Similarity

/** Blocked exact pair join: the block count B only partitions the work —
  * the emitted pair set must be identical for any B (and to the unblocked
  * q_embed_neardup oracle, which the correctness gate checks).
  */
class SimilaritySpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  test("embed near-dup output is independent of the block count B") {
    val b3 = Similarity.embedNearDupBlocked(3)(spark, sfDir).collect().toSeq
    val b8 = Similarity.embedNearDupBlocked(8)(spark, sfDir).collect().toSeq
    assert(b3.nonEmpty, "expected some near-dup pairs at sf0.001")
    assert(b3 == b8, s"pair sets differ between B=3 (${b3.size}) and B=8 (${b8.size})")
  }

  test("auto-blocked query matches an explicit block count") {
    val auto = Similarity.queries("q_embed_neardup")(spark, sfDir).collect().toSeq
    val b5 = Similarity.embedNearDupBlocked(5)(spark, sfDir).collect().toSeq
    assert(auto == b5)
  }

  test("centroid report: label partition is exhaustive and Jensen-bounded") {
    val emb = Tables.embeddings(spark, sfDir)
    val rows = Similarity.queries("q_embed_centroid")(spark, sfDir).collect()
    assert(rows.map(_.getAs[Int]("label")).toSet ==
      emb.select("label").distinct().collect().map(_.getInt(0)).toSet)
    assert(rows.map(_.getAs[Long]("n_vecs")).sum == emb.count())
    rows.foreach { r =>
      val (cn, avg) = (r.getAs[Double]("centroid_norm"), r.getAs[Double]("avg_vec_norm"))
      // ‖E x‖ ≤ E‖x‖ (Jensen) ⇒ dispersion ∈ [0, 1]; rounding slack 1e-6.
      assert(cn >= 0.0 && cn <= avg + 1e-6)
      val d = r.getAs[Double]("dispersion")
      assert(d >= -1e-6 && d <= 1.0 + 1e-6)
    }
  }
}
