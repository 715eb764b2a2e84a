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

  test("k-means IVF is label-free: permuting every label changes nothing") {
    // The whole point of the learned quantizer (ivfCentroids reads the
    // ground-truth label column; real corpora have none): rewrite the
    // corpus with permuted labels and the q_knn_ivf_kmeans result —
    // clusters, probes, neighbors, cosines — must be bit-identical.
    import graft.queries.Det
    import org.apache.spark.sql.functions.{col, lit, pmod}
    val src = Tables.embeddings(spark, sfDir)
    val dir = java.nio.file.Files.createTempDirectory("graft_kmfree").toString
    src.withColumn("label",
        pmod(col("label") * 5 + 3, lit(7)).cast(src.schema("label").dataType))
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val base = Similarity.queries("q_knn_ivf_kmeans")(spark, sfDir).collect().toSeq
    val perm = Similarity.queries("q_knn_ivf_kmeans")(spark, dir).collect().toSeq
    assert(base.nonEmpty && base == perm,
      s"label permutation leaked into the k-means index (${base.size} vs ${perm.size} rows)")
    Det.releasePins(spark)
  }

  test("k-means nprobe=3 beats the label-IVF recall on the harness embeddings") {
    // The VERDICT r8 bar: the learned quantizer must not lose to the
    // label-derived one it replaces. On the near-random harness
    // embeddings the label clusters carry almost no geometry, so the
    // learned centroids win comfortably (measured 0.56 vs 0.34 vs 0.18
    // at sf0.001) — pinned here at the conservative single-probe bar
    // plus non-inferiority against the 3-probe label index.
    import graft.queries.Det
    val rows = Similarity.queries("q_ann_recall_mp")(spark, sfDir).collect()
    def mean(c: String) = rows.map(_.getAs[Double](c)).sum / rows.length
    val (i1, i3, k3) = (mean("ivf1_recall"), mean("ivf3_recall"), mean("kmeans3_recall"))
    assert(k3 >= i1, s"kmeans3 $k3 must beat single-probe label IVF $i1")
    assert(k3 >= i3, s"kmeans3 $k3 must not lose to 3-probe label IVF $i3")
    Det.releasePins(spark)
  }

  test("k-means IVF recovers planted cluster structure (recall ≈ 1 on blobs)") {
    // The harness embeddings are near-random — the regime where ANY
    // coarse quantizer is weak (NOTES.md records that honestly). This
    // corpus has the structure IVF exists for: 10 tight blobs, 30
    // points each, probes spread one per blob. A query's true top-5
    // all live in its own blob; whether Lloyd's split or merged blobs,
    // the 3 probed centroids cover the query's own region, so recall
    // must be near-perfect — the operator-works proof no near-random
    // corpus can give.
    import spark.implicits._
    import graft.queries.Det
    val pts = for (p <- 0 until 300) yield {
      val blob = p % 10
      val emb = Array.tabulate(64) { i =>
        val proto = ((blob * 31 + i * 7) % 13 - 6).toFloat * 10f
        val jitter = ((p * 17 + i * 3) % 5 - 2).toFloat * 0.01f
        proto + jitter
      }
      (p.toLong, emb, blob)
    }
    val dir = java.nio.file.Files.createTempDirectory("graft_kmblobs").toString
    pts.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val rows = Similarity.queries("q_ann_recall_mp")(spark, dir).collect()
    assert(rows.length == 10)
    val k3 = rows.map(_.getAs[Double]("kmeans3_recall")).sum / rows.length
    assert(k3 >= 0.8, s"kmeans3 recall on planted blobs must be near-perfect, got $k3")
    Det.releasePins(spark)
  }

  test("PQ code table: exactly 8 codes per vector, every code within 1..16") {
    import graft.queries.Det
    val n = Tables.embeddings(spark, sfDir).count()
    val codes = Similarity.pqCodes(spark, sfDir).collect()
    assert(codes.length == n * 8, s"expected ${n * 8} (vec, sub) codes, got ${codes.length}")
    assert(codes.map(r => (r.getAs[Long]("vec_id"), r.getAs[Int]("sub"))).distinct.length
      == codes.length, "a (vector, subspace) pair must get exactly one code")
    val cs = codes.map(_.getAs[Long]("code"))
    assert(cs.forall(c => c >= 1 && c <= 16), s"code out of range: ${cs.min}..${cs.max}")
    Det.releasePins(spark)
  }

  test("PQ keeps planted blob structure: every ADC neighbor is from the query's own blob") {
    // Within a tight blob the exact cosines are near-ties, so top-5
    // OVERLAP with brute force is not the robust property (tie order
    // is arbitrary-but-deterministic on both sides); what quantization
    // must preserve is the geometry: all ADC-ranked neighbors of a
    // query live in the query's own blob — for the full code scan AND
    // for the IVF-pruned composition.
    import spark.implicits._
    import graft.queries.Det
    val pts = for (p <- 0 until 300) yield {
      val blob = p % 10
      val emb = Array.tabulate(64) { i =>
        val proto = ((blob * 31 + i * 7) % 13 - 6).toFloat * 10f
        val jitter = ((p * 17 + i * 3) % 5 - 2).toFloat * 0.01f
        proto + jitter
      }
      (p.toLong, emb, blob)
    }
    val dir = java.nio.file.Files.createTempDirectory("graft_pqblobs").toString
    pts.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    for (q <- Seq("q_knn_pq", "q_knn_ivfpq", "q_knn_ivfpq_res")) {
      val rows = Similarity.queries(q)(spark, dir).collect()
      assert(rows.length == 50, s"$q: 10 queries x top-5 expected, got ${rows.length}")
      val strays = rows.filter(r =>
        r.getAs[Long]("neighbor_id") % 10 != r.getAs[Long]("query_id") % 10)
      assert(strays.isEmpty,
        s"$q: ADC neighbor left the query's blob: ${strays.toSeq}")
    }
    Det.releasePins(spark)
  }

  test("filtered search: post-filter IVF returns ZERO results when the label lives in an unprobed blob") {
    // The filtered-ANN pathology, planted: query 0 sits in blob A but
    // its label-7 peers all live in blob B, 1000 away per dim. The
    // coarse quantizer probes query 0's 3 nearest clusters — all blob-A
    // clusters — so the post-filtered candidate set is EMPTY while the
    // filtered brute finds 5 real neighbors in B. Control queries
    // (label 1, peers in-blob) keep full result sets. This is the
    // verified form of "post-filtering breaks on selective predicates;
    // over-probe or partition the index by the filter key".
    import spark.implicits._
    import graft.queries.Det
    val pts =
      (0 until 60).map { p =>
        val emb = Array.tabulate(64) { i =>
          ((i * 7) % 13 - 6).toFloat * 10f +
            ((p * 17 + i * 3) % 5 - 2).toFloat * 0.01f
        }
        (p.toLong, emb, if (p == 0) 7 else 1)
      } ++
      (60 until 90).map { p =>
        val emb = Array.tabulate(64) { i =>
          1000f + ((i * 11) % 9 - 4).toFloat * 10f +
            ((p * 13 + i * 5) % 5 - 2).toFloat * 0.01f
        }
        (p.toLong, emb, 7)
      }
    val dir = java.nio.file.Files.createTempDirectory("graft_filtblobs").toString
    pts.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val brute = Similarity.knnFiltered(spark, dir).collect()
    val q0Brute = brute.filter(_.getAs[Long]("query_id") == 0L)
    assert(q0Brute.length == 5 && q0Brute.forall(_.getAs[Long]("neighbor_id") >= 60L),
      "filtered brute must find query 0's label-7 peers in blob B")
    val rec = Similarity.annRecallFiltered(spark, dir).collect()
      .map(r => r.getAs[Long]("query_id") ->
        (r.getAs[Long]("n_exact"), r.getAs[Long]("n_ivf"), r.getAs[Double]("recall"))).toMap
    assert(rec(0L) == (5L, 0L, 0.0),
      s"query 0 must hit the empty-post-filter pathology: ${rec(0L)}")
    (1L to 9L).foreach { q =>
      assert(rec(q)._2 == 5L, s"control query $q should keep a full result set: ${rec(q)}")
    }
    Det.releasePins(spark)
  }

  test("incremental IVF: base/new accounting is exact and keyed on the trained centroids") {
    import graft.queries.Det
    val emb = Tables.embeddings(spark, sfDir)
    val nBase = emb.filter("vec_id % 5 <> 0").count()
    val nNew = emb.filter("vec_id % 5 = 0").count()
    val rows = Similarity.queries("q_knn_ivf_incr")(spark, sfDir).collect()
    // k-means can drop an emptied cluster, never invent one.
    assert(rows.length >= 1 && rows.length <= 10)
    assert(rows.map(_.getAs[Long]("cluster")).distinct.length == rows.length)
    // Every vector of both generations lands in exactly one cluster:
    // the split accounting must reproduce the corpus partition exactly.
    assert(rows.map(_.getAs[Long]("n_base")).sum == nBase)
    assert(rows.map(_.getAs[Long]("n_new")).sum == nNew)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_total") ==
        r.getAs[Long]("n_base") + r.getAs[Long]("n_new"))
      assert(r.getAs[Double]("mean_dist_new") >= 0.0)
    }
    Det.releasePins(spark)
  }

  test("incremental PQ: per-subspace holdout accounting is exact; drift is a finite positive ratio") {
    import graft.queries.Det
    val emb = Tables.embeddings(spark, sfDir)
    val nBase = emb.filter("vec_id % 5 <> 0").count()
    val nNew = emb.filter("vec_id % 5 = 0").count()
    val rows = Similarity.queries("q_knn_pq_incr")(spark, sfDir).collect()
    // All 8 subspaces report, each exactly once; every vector of both
    // generations is encoded in every subspace — the holdout split must
    // reproduce the corpus partition per subspace, not just in total.
    assert(rows.length == 8)
    assert(rows.map(_.getAs[Long]("sub")).sorted.toSeq == (0L to 7L))
    rows.foreach { r =>
      assert(r.getAs[Long]("n_base") == nBase)
      assert(r.getAs[Long]("n_new") == nNew)
      assert(r.getAs[Double]("mse_base") >= 0.0)
      assert(r.getAs[Double]("mse_new") >= 0.0)
      val drift = r.getAs[Double]("drift_ratio")
      assert(drift > 0.0 && !drift.isInfinite && !drift.isNaN,
        s"drift must be a finite positive ratio, got $drift")
    }
    Det.releasePins(spark)
  }

  test("incremental IVF assigns a new batch to FROZEN centroids (blobs: no strays)") {
    // The operator's contract is that ingesting a batch does NOT move
    // the quantizer. Blobs are laid out CONSECUTIVELY (blob = p / 30) so
    // the vec_id % 5 = 0 holdout takes 6 of every blob's 30 members —
    // each blob contributes to training AND to the new batch. (With
    // interleaved blobs = p % 10, the holdout would be blobs 0 and 5 in
    // their entirety: a quantizer that never saw a blob legitimately
    // assigns its points far away — that's retrain-needed drift, not a
    // bug, and exactly what mean_dist_new exists to surface.)
    import spark.implicits._
    import graft.queries.Det
    val pts = for (p <- 0 until 300) yield {
      val blob = p / 30
      val emb = Array.tabulate(64) { i =>
        val proto = ((blob * 31 + i * 7) % 13 - 6).toFloat * 10f
        val jitter = ((p * 17 + i * 3) % 5 - 2).toFloat * 0.01f
        proto + jitter
      }
      (p.toLong, emb, blob)
    }
    val dir = java.nio.file.Files.createTempDirectory("graft_incrblobs").toString
    pts.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val rows = Similarity.queries("q_knn_ivf_incr")(spark, dir).collect()
    assert(rows.map(_.getAs[Long]("n_base")).sum == 240L)
    assert(rows.map(_.getAs[Long]("n_new")).sum == 60L)
    // Every blob's new members sit ~0.01 from the blob's own base
    // members. Lloyd's may SPLIT a tight blob between two seeds or
    // MERGE blobs into one cell — both are legitimate quantizer
    // outcomes — but the frozen-centroid assignment must keep a new
    // member with base members of its OWN blob: per cluster, the blob
    // set of new members ⊆ the blob set of base members.
    val asg = Similarity.ivfIncrParts(spark, dir)._2.collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Long]("cluster"), r.getAs[Boolean]("is_new")))
    val baseBlobs = asg.filter(!_._3).groupBy(_._2)
      .map { case (c, vs) => c -> vs.map(_._1 / 30).toSet }
    asg.filter(_._3).foreach { case (v, c, _) =>
      assert(baseBlobs.getOrElse(c, Set.empty).contains(v / 30),
        s"new vec $v (blob ${v / 30}) landed in cluster $c with base blobs ${baseBlobs.get(c)}")
    }
    Det.releasePins(spark)
  }

  test("random projection preserves planted blob structure (no cross-blob neighbors)") {
    // Same robust property as the PQ blob specs: within a blob the
    // exact top-5 are near-ties (overlap with brute is tie-order
    // noise), so what the 64→16 projection must preserve is the
    // geometry — every projected-space neighbor stays in the query's
    // own blob.
    import spark.implicits._
    import graft.queries.Det
    val pts = for (p <- 0 until 300) yield {
      val blob = p % 10
      val emb = Array.tabulate(64) { i =>
        val proto = ((blob * 31 + i * 7) % 13 - 6).toFloat * 10f
        val jitter = ((p * 17 + i * 3) % 5 - 2).toFloat * 0.01f
        proto + jitter
      }
      (p.toLong, emb, blob)
    }
    val dir = java.nio.file.Files.createTempDirectory("graft_rpblobs").toString
    pts.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val rp5 = Similarity.rpTop5(spark, dir).collect()
    assert(rp5.length == 50, s"10 queries x top-5 expected, got ${rp5.length}")
    val strays = rp5.filter(r =>
      r.getAs[Long]("nr") % 10 != r.getAs[Long]("qr") % 10)
    assert(strays.isEmpty, s"projected neighbor left the query's blob: ${strays.toSeq}")
    // And the recall report agrees: the projected top-5 of a blob
    // query can only hit same-blob members, all of which are genuine
    // near-ties, so recall is well-defined in [0, 1] with full k.
    val rec = Similarity.queries("q_embed_rp")(spark, dir).collect()
    assert(rec.length == 10)
    rec.foreach { r =>
      val v = r.getAs[Double]("rp_recall_at5")
      assert(v >= 0.0 && v <= 1.0)
    }
    Det.releasePins(spark)
  }

  test("rerank recall dominates raw projected recall (candidate-superset law)") {
    import graft.queries.Det
    // The exact-cosine rerank of the projected top-20 keeps every true
    // top-5 neighbor the wide net caught (a true neighbor in the
    // candidate set outranks every non-true candidate by definition of
    // the true top-5), so per query rerank_hits ≥ rp_hits — a LAW of
    // the two-stage composition, not a tuning outcome. Measured on the
    // harness corpus the lift is real (mean 0.14 → 0.26 at sf0.001).
    val rec = Similarity.queries("q_embed_rp")(spark, sfDir).collect()
    assert(rec.length == 10)
    rec.foreach { r =>
      assert(r.getAs[Long]("rerank_hits") >= r.getAs[Long]("rp_hits"),
        s"rerank lost a caught neighbor: $r")
    }
    // And the rerank output is a well-formed per-query top-5.
    val rr = Similarity.queries("q_knn_rp_rerank")(spark, sfDir).collect()
    assert(rr.length == 50)
    val byQ = rr.groupBy(_.getAs[Long]("query_id"))
    assert(byQ.size == 10 && byQ.values.forall(_.length == 5))
    byQ.values.foreach { rows =>
      val ranked = rows.sortBy(_.getAs[Long]("rank"))
      val cos = ranked.map(_.getAs[Double]("cosine"))
      assert(cos.zip(cos.tail).forall { case (a, b) => a >= b - 1e-9 },
        "rerank must order by exact cosine")
    }
    Det.releasePins(spark)
  }
}
