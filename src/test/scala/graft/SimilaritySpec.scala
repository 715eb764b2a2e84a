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

  test("int8 quantization: hand goldens, zero-vector guard, error bound") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_emb").toString
    Seq(
      (0L, Array(1.0f, -2.0f, 0.5f, 0.0f), 1),
      (1L, Array(0.0f, 0.0f, 0.0f, 0.0f), 2))
      .toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val r = Similarity.queries("q_embed_quantize")(spark, dir).collect()
    assert(r.length == 2)
    val v0 = r(0)
    assert(v0.getAs[Long]("dim") == 4L)
    assert(v0.getAs[Double]("vmin") == -2.0 && v0.getAs[Double]("vmax") == 1.0)
    assert(v0.getAs[Double]("scale") == 0.015748) // r6(2/127)
    assert(v0.getAs[Long]("n_sat") == 1L)         // only the -2 component hits ±127
    assert(v0.getAs[Double]("max_abs_err") <= v0.getAs[Double]("scale") / 2 + 1e-6)
    val v1 = r(1) // all-zero vector: scale 0 must not divide
    assert(v1.getAs[Double]("scale") == 0.0)
    assert(v1.getAs[Long]("n_sat") == 0L)
    assert(v1.getAs[Double]("max_abs_err") == 0.0)
  }

  test("int8 quantization on the harness corpus: bound holds, max element saturates") {
    val rows = Similarity.queries("q_embed_quantize")(spark, sfDir).collect()
    assert(rows.length == Tables.embeddings(spark, sfDir).count())
    rows.foreach { r =>
      assert(r.getAs[Long]("dim") == 64L)
      assert(r.getAs[Double]("vmin") <= r.getAs[Double]("vmax"))
      // Quantization error is bounded by half a step; the max-|x| component
      // always quantizes to ±127, so every nonzero vector saturates once.
      assert(r.getAs[Double]("max_abs_err") <= r.getAs[Double]("scale") / 2 + 1e-6)
      assert(r.getAs[Long]("n_sat") >= 1L)
    }
  }

  test("hard negatives: cross-label only, margin consistent with the knn ranking") {
    val negs = Similarity.queries("q_hard_negatives")(spark, sfDir).collect()
    assert(negs.length == 50) // 10 probes × 5 negatives
    val byQuery = negs.groupBy(_.getAs[Long]("query_id"))
    assert(byQuery.size == 10)
    byQuery.values.foreach { rows =>
      val sorted = rows.sortBy(_.getAs[Long]("rank"))
      assert(sorted.map(_.getAs[Long]("rank")).toSeq == (1L to 5L))
      // Every mined negative must truly be a different class.
      sorted.foreach(r =>
        assert(r.getAs[Int]("neighbor_label") != r.getAs[Int]("q_label")))
      // Harder negatives (higher cosine) come first ⇒ margins ascend.
      val margins = sorted.map(_.getAs[Double]("margin")).toSeq
      assert(margins == margins.sorted)
    }
    // Cross-check against q_knn_brute: a rank-1 negative with positive
    // margin means the probe's nearest overall neighbor shares its label.
    val brute = Similarity.queries("q_knn_brute")(spark, sfDir).collect()
      .filter(_.getAs[Long]("rank") == 1L)
      .map(r => r.getAs[Long]("query_id") -> r.getAs[Int]("neighbor_label")).toMap
    negs.filter(_.getAs[Long]("rank") == 1L).foreach { r =>
      val qid = r.getAs[Long]("query_id")
      if (r.getAs[Double]("margin") > 0)
        assert(brute(qid) == r.getAs[Int]("q_label"),
          s"probe $qid: positive margin but overall-NN label ${brute(qid)} != query label")
    }
  }

  test("diversity selection: every cluster keeps exactly its proportional budget") {
    val rows = Similarity.queries("q_select_diverse")(spark, sfDir).collect()
    val emb = Tables.embeddings(spark, sfDir)
    val cellSizes = emb.groupBy("label").count().collect()
      .map(r => r.getAs[Int]("label") -> r.getAs[Long]("count")).toMap
    val byLabel = rows.groupBy(_.getAs[Int]("label"))
    // No cluster starved: all labels appear, each with budget ⌈n/4⌉.
    assert(byLabel.keySet == cellSizes.keySet)
    byLabel.foreach { case (label, kept) =>
      val budget = (cellSizes(label) + 3) / 4
      assert(kept.length == budget, s"label $label: ${kept.length} != $budget")
      val sorted = kept.sortBy(_.getAs[Long]("quality_rank"))
      assert(sorted.map(_.getAs[Long]("quality_rank")).toSeq ==
        (1L to budget).toSeq)
      // Quality-ordered: token counts never increase down the ranking.
      val toks = sorted.map(_.getAs[Long]("n_tokens")).toSeq
      assert(toks == toks.sorted.reverse)
      assert(sorted.forall(_.getAs[Long]("n_cell") == cellSizes(label)))
    }
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
