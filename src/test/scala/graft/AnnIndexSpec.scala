package graft

import graft.ext.AnnIndex
import graft.queries.{Det, Similarity}

/** Persisted ANN index lifecycle: train-once → save → a FRESH session
  * (no Det memos, nothing in-memory) serves bit-identical results from
  * the parquet artifacts with zero training work in the plan.
  */
class AnnIndexSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"
  private lazy val idxDir =
    java.nio.file.Files.createTempDirectory("graft_annidx").toString

  test("ensure trains once, then loads from disk (no retrain)") {
    assert(AnnIndex.ensure(spark, sfDir, idxDir),
      "first ensure must train and save")
    assert(AnnIndex.isBuilt(idxDir))
    assert(!AnnIndex.ensure(spark, sfDir, idxDir),
      "second ensure must be a pure load — the index is current")
  }

  test("a fresh session serves IVF search from disk, bit-identical to the trained chain") {
    AnnIndex.ensure(spark, sfDir, idxDir)
    val trained = Similarity.queries("q_knn_ivf_kmeans")(spark, sfDir)
      .collect().map(_.toSeq)
    // newSession: same cluster, EMPTY session state — Det memos are keyed
    // by session, so nothing trained in this suite is visible to it. The
    // serve path must not need any of it.
    val fresh = spark.newSession()
    assert(!AnnIndex.ensure(fresh, sfDir, idxDir),
      "fresh session must find the index current (no retrain)")
    val served = AnnIndex.searchIvf(fresh, sfDir, idxDir)
    assert(served.collect().map(_.toSeq).toSeq == trained.toSeq,
      "served-from-disk result must equal the oracle-verified trained result")
    Det.releasePins(fresh)
  }

  test("the served plan contains no training work (seed-hash absent); the trained plan does") {
    AnnIndex.ensure(spark, sfDir, idxDir)
    val fresh = spark.newSession()
    val servedQe = AnnIndex.searchIvf(fresh, sfDir, idxDir).queryExecution
    assert(!servedQe.optimizedPlan.toString.contains("kmseed"),
      "serving must not re-run Lloyd's (kmseed seed derivation found in plan)")
    // File paths surface only in the physical scan nodes.
    assert(servedQe.executedPlan.toString.contains(idxDir),
      "served plan must scan the persisted index dir")
    val trainedPlan = Similarity.ivfSearch(fresh, sfDir,
      Similarity.ivfCentroidsFor(fresh, sfDir),
      Similarity.ivfMembershipFor(fresh, sfDir))
      .queryExecution.optimizedPlan.toString
    assert(trainedPlan.contains("kmseed"),
      "sanity: the in-session chain DOES carry the seed derivation")
    Det.releasePins(fresh)
  }

  test("PQ artifacts round-trip: loaded codes/codebook equal the trained ones; served ADC matches") {
    AnnIndex.ensure(spark, sfDir, idxDir)
    val trainedCodes = Similarity.pqCodes(spark, sfDir)
      .orderBy("vec_id", "sub").collect().map(_.toSeq)
    val fresh = spark.newSession()
    val loadedCodes = AnnIndex.pqCodes(fresh, idxDir)
      .orderBy("vec_id", "sub").collect().map(_.toSeq)
    assert(loadedCodes.toSeq == trainedCodes.toSeq,
      "persisted code table must equal the trained one")
    val trainedPq = Similarity.queries("q_knn_pq")(spark, sfDir)
      .collect().map(_.toSeq)
    val servedPq = AnnIndex.searchPq(fresh, sfDir, idxDir)
      .collect().map(_.toSeq)
    assert(servedPq.toSeq == trainedPq.toSeq,
      "served ADC search must equal the in-session q_knn_pq")
    assert(!AnnIndex.searchPq(fresh, sfDir, idxDir)
      .queryExecution.optimizedPlan.toString.contains("pqseed"),
      "serving PQ must not retrain the codebook")
    Det.releasePins(fresh)
  }

  test("residual IVFADC serves from disk: equal to the trained chain, no training in the plan") {
    AnnIndex.ensure(spark, sfDir, idxDir)
    val trained = Similarity.queries("q_knn_ivfpq_res")(spark, sfDir)
      .collect().map(_.toSeq)
    val fresh = spark.newSession()
    assert(!AnnIndex.ensure(fresh, sfDir, idxDir),
      "fresh session must find the v2 index current (no retrain)")
    val served = AnnIndex.searchRes(fresh, sfDir, idxDir)
    assert(served.collect().map(_.toSeq).toSeq == trained.toSeq,
      "served residual ADC must equal the in-session q_knn_ivfpq_res")
    val plan = AnnIndex.searchRes(fresh, sfDir, idxDir)
      .queryExecution.optimizedPlan.toString
    assert(!plan.contains("kmseed") && !plan.contains("pqrseed"),
      "serving the residual chain must train NEITHER the coarse quantizer nor the residual codebook")
    Det.releasePins(fresh)
  }

  test("a pre-v2 index layout reads as stale and rebuilds (schema_version gate)") {
    val tmpIdx = java.nio.file.Files.createTempDirectory("graft_annidx_v1").toString
    assert(AnnIndex.ensure(spark, sfDir, tmpIdx))
    // Rewrite meta WITHOUT the schema_version column — the v1 layout.
    val n = graft.Tables.embeddings(spark, sfDir).count()
    spark.createDataFrame(Seq((n, sfDir))).toDF("n_vectors", "corpus_dir")
      .coalesce(1).write.mode("overwrite").parquet(s"$tmpIdx/meta")
    assert(AnnIndex.ensure(spark, sfDir, tmpIdx),
      "an index written by an older layout must rebuild, not serve a partial artifact set")
  }

  test("a corpus swap under the same path invalidates the index (count mismatch retrains)") {
    val tmpIdx = java.nio.file.Files.createTempDirectory("graft_annidx2").toString
    assert(AnnIndex.ensure(spark, sfDir, tmpIdx))
    // Same index dir, different corpus → meta count mismatch → retrain.
    assert(AnnIndex.ensure(spark, "/root/testdata/sf0.01", tmpIdx),
      "stale meta (different corpus) must force a rebuild")
  }

  test("shard indexes merge into an index that serves identically to the full build") {
    import org.apache.spark.sql.functions.expr
    AnnIndex.ensure(spark, sfDir, idxDir)
    // Carve two shards out of the full build: frozen model tables copied
    // verbatim (train once, ship everywhere), per-vector tables split by
    // vec_id parity (each worker encoded its disjoint subset).
    val dirs = Seq("graft_shard_a", "graft_shard_b")
      .map(p => java.nio.file.Files.createTempDirectory(p).toString)
    for ((d, par) <- dirs.zipWithIndex) {
      for (t <- Seq("centroids", "pq_codebook", "res_codebook"))
        spark.read.parquet(s"$idxDir/$t").write.parquet(s"$d/$t")
      for (t <- Seq("membership", "pq_codes", "res_codes"))
        spark.read.parquet(s"$idxDir/$t").filter(expr(s"vec_id % 2 = $par"))
          .write.parquet(s"$d/$t")
    }
    val merged = java.nio.file.Files.createTempDirectory("graft_merged").toString
    AnnIndex.mergeShards(spark, dirs, merged, sfDir)
    assert(!AnnIndex.ensure(spark, sfDir, merged),
      "merged index covering the corpus must read as current (no retrain)")
    for (search <- Seq(AnnIndex.searchIvf _, AnnIndex.searchPq _, AnnIndex.searchRes _)) {
      val full = search(spark, sfDir, idxDir).collect().toSet
      val m = search(spark, sfDir, merged).collect().toSet
      assert(m == full, "merged-index search diverged from the full build")
    }
  }

  test("merging shards encoded under different models is refused") {
    import org.apache.spark.sql.functions.{col, expr}
    AnnIndex.ensure(spark, sfDir, idxDir)
    val dirs = Seq("graft_shard_c", "graft_shard_d")
      .map(p => java.nio.file.Files.createTempDirectory(p).toString)
    for ((d, par) <- dirs.zipWithIndex) {
      for (t <- Seq("centroids", "pq_codebook", "res_codebook"))
        spark.read.parquet(s"$idxDir/$t").write.parquet(s"$d/$t")
      for (t <- Seq("membership", "pq_codes", "res_codes"))
        spark.read.parquet(s"$idxDir/$t").filter(expr(s"vec_id % 2 = $par"))
          .write.parquet(s"$d/$t")
    }
    // Drift shard d's coarse model by dropping a centroid (ids are
    // row_number-based, 1..k).
    spark.read.parquet(s"$idxDir/centroids").filter(col("cluster") =!= 1L)
      .write.mode("overwrite").parquet(s"${dirs(1)}/centroids")
    val out = java.nio.file.Files.createTempDirectory("graft_merged_bad").toString
    intercept[IllegalArgumentException] {
      AnnIndex.mergeShards(spark, dirs, out, sfDir)
    }
  }

  override def afterAll(): Unit = {
    Det.releasePins(spark)
    super.afterAll()
  }
}
