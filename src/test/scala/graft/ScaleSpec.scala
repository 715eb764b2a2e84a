package graft

import org.apache.spark.sql.functions._

/** Scale-pattern evidence on real plans: bucketed co-located joins
  * eliminate the join shuffle; approximate aggregates land within their
  * error bounds (the 100 TB replacement for exact countDistinct).
  *
  * The VOLUME tests (10^6-doc pipeline, 100k-doc packing) grew past the
  * CI time budget (`sbt test` was killed mid-suite in round 15): they
  * now run only when SPARK_GRAFT_SCALE_TESTS=1 (a local/BenchScale
  * concern, not a per-commit gate). Each keeps a small smoke twin
  * in-suite so the assertions themselves stay exercised per commit.
  */
class ScaleSpec extends SparkSpec {

  /** Register `name` as a live test only under SPARK_GRAFT_SCALE_TESTS=1;
    * otherwise it reports ignored (visible in the run, zero cost).
    */
  private def volumeTest(name: String)(body: => Unit): Unit =
    if (sys.env.get("SPARK_GRAFT_SCALE_TESTS").contains("1")) test(name)(body)
    else ignore(name)(body)

  test("bucketed tables join with zero shuffle exchanges") {
    val dir = java.nio.file.Files.createTempDirectory("buckets").toString
    val sf = "/root/testdata/sf0.001"
    spark.sql(s"CREATE DATABASE IF NOT EXISTS graft_bucket_test LOCATION '$dir/db'")
    spark.sql("USE graft_bucket_test")
    Tables.orders(spark, sf).write
      .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .mode("overwrite").saveAsTable("orders_b")
    Tables.lineitem(spark, sf).write
      .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .mode("overwrite").saveAsTable("lineitem_b")
    val joined = spark.table("lineitem_b")
      .join(spark.table("orders_b"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n"))
    joined.collect() // force final adaptive plan
    val plan = joined.queryExecution.executedPlan.toString
    // The join itself must not shuffle: both sides are bucketed on the
    // key. (The groupBy after it may exchange on its own key.)
    assert(plan.contains("SortMergeJoin") || plan.contains("BroadcastHashJoin"))
    if (plan.contains("SortMergeJoin")) {
      // count exchanges BELOW the join: bucketed SMJ needs none
      val below = plan.substring(plan.indexOf("SortMergeJoin"))
      assert(!below.contains("Exchange"), s"bucketed join should not shuffle:\n$plan")
    }
    spark.sql("DROP TABLE IF EXISTS lineitem_b")
    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("USE default")
  }

  test("AQE splits a skewed join partition at runtime") {
    // A manufactured hot key (98% of rows on k=0) joined under forced
    // sort-merge: with the skew thresholds scaled to test size, AQE must
    // re-plan the hot partition into splits (skew=true on the join) —
    // the runtime answer to skew that salting solves statically
    // (q_salted_agg); at 100 TB both paths matter.
    val restore = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.forceOptimizeSkewedJoin")
      .map(k => k -> spark.conf.getOption(k)).toMap
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB")
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "32KB")
      spark.conf.set("spark.sql.adaptive.forceOptimizeSkewedJoin", "true")
      val skewed = spark.range(200000).select(
        when(col("id") < 196000, 0L).otherwise(pmod(col("id"), lit(97)) + 1L).as("k"),
        col("id").as("v"))
      val dim = spark.range(100).select(col("id").as("k"),
        concat(lit("name_"), col("id")).as("name"))
      // Correctness through the grouped form (a downstream groupBy on the
      // join key suppresses the skew split — it would break the agg's
      // co-partitioning — so the plan assertion uses the plain join).
      val grouped = skewed.join(dim, "k").groupBy(col("k")).agg(count(lit(1)).as("n"))
      assert(grouped.collect().find(_.getLong(0) == 0L).get.getAs[Long]("n") == 196000L)
      val joined = skewed.join(dim, "k")
      assert(joined.collect().length == 200000)
      // The final adaptive plan only prints its tree through explainString.
      val plan = joined.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      assert(plan.contains("skew=true"),
        s"AQE did not mark the skewed join for splitting:\n$plan")
    } finally restore.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("approx_count_distinct within rsd bound of exact") {
    val l = Tables.lineitem(spark, "/root/testdata/sf0.01")
    val row = l.agg(
      countDistinct(col("l_partkey")).as("exact"),
      approx_count_distinct(col("l_partkey"), 0.05).as("approx")).collect()(0)
    val (exact, approx) = (row.getLong(0).toDouble, row.getLong(1).toDouble)
    assert(math.abs(approx - exact) / exact < 0.15, s"approx=$approx exact=$exact")
  }

  test("approx_percentile brackets the exact median") {
    val o = Tables.orders(spark, "/root/testdata/sf0.01")
    val approx = o.agg(percentile_approx(col("o_totalprice"), lit(0.5), lit(1000)))
      .collect()(0).getDouble(0)
    val exact = o.stat.approxQuantile("o_totalprice", Array(0.5), 0.0)(0)
    assert(math.abs(approx - exact) / exact < 0.05)
  }

  // The end-to-end scrub→gate→exact→near→pack pipeline, parameterized by
  // scale. Corpus (all deterministic in doc_id, token namespaces
  // disjoint across docs so no accidental shingle sharing):
  //   nBase base docs of 10..29 unique tokens;
  //   nClones EXACT clones of docs 0..nClones-1 (same text, higher id);
  //   [nearLo, nearHi) NEAR variants (last token → 'zz'):
  //     jaccard = (L−3)/(L−1), ≥ 0.8 iff L ≥ 11, so the L=10 variants
  //     (id%20==0) are planted BELOW the gate and must survive — the
  //     threshold does semantic work at volume.
  // LSH recall at j ∈ [0.8, 0.93] with 4×3 bands is 1−(1−j³)⁴ ≈
  // 0.94..0.998 (deterministic for fixed texts, not enumerable a
  // priori), hence the ≥ 90% removal bound rather than equality.
  private def plantedCorpus(dir: String, nBase: Long, nClones: Long,
                            nearLo: Long, nearHi: Long): Unit = {
    val baseText =
      "concat_ws(' ', transform(sequence(0, CAST(id % 20 + 9 AS INT)), j -> concat('t', CAST(id AS STRING), 'x', CAST(j AS STRING))))"
    val nearText =
      "concat(concat_ws(' ', transform(sequence(0, CAST(id % 20 + 8 AS INT)), j -> concat('t', CAST(id AS STRING), 'x', CAST(j AS STRING)))), ' zz')"
    spark.range(0, nBase).selectExpr("id AS doc_id", s"$baseText AS text")
      .union(spark.range(0, nClones).selectExpr("id + 2000000 AS doc_id", s"$baseText AS text"))
      .union(spark.range(nearLo, nearHi).selectExpr("id + 3000000 AS doc_id", s"$nearText AS text"))
      .selectExpr("doc_id", "text",
        "concat('l', CAST(doc_id % 4 AS STRING)) AS lang",
        "concat('s', CAST(doc_id % 8 AS STRING)) AS source",
        "CAST(length(text) AS LONG) AS n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
  }

  /** Run the pipeline on a planted corpus and check the stage counts,
    * threshold semantics, LSH recall bound and token conservation —
    * the same assertions at every scale.
    */
  private def checkPlantedPipeline(nBase: Long, nClones: Long,
                                   nearLo: Long, nearHi: Long): Double = {
    val dir = java.nio.file.Files.createTempDirectory("corpus_planted").toString
    val t0 = System.nanoTime()
    plantedCorpus(dir, nBase, nClones, nearLo, nearHi)
    val report = graft.ext.CorpusPipeline.run(spark, dir, s"$dir/out")
    val secs = (System.nanoTime() - t0) / 1e9
    graft.queries.Det.releasePins(spark)

    val nNear = nearHi - nearLo
    val total = nBase + nClones + nNear
    assert(report.input == total, s"input: ${report.input}")
    assert(report.afterQuality == total,
      s"all-unique-token docs must pass the gate: ${report.afterQuality}")
    assert(report.afterExact == nBase + nNear,
      s"exactly the $nClones clones drop at the exact stage: ${report.afterExact}")
    val eligible = nNear - (nearLo until nearHi).count(_ % 20 == 0) // L=10 survive
    val removedNear = report.afterExact - report.afterNear
    assert(removedNear <= eligible,
      s"below-threshold variants must survive: removed $removedNear > $eligible")
    assert(removedNear >= (0.9 * eligible).toLong, // ≥ 90% of the eligible
      s"LSH recall collapsed: removed only $removedNear of $eligible")

    // Token conservation through packing.
    val clean = spark.read.parquet(s"$dir/out/corpus_clean")
    val corpusToks = clean.select(sum(size(split(col("text"), " ")).cast("long"))).head.getLong(0)
    val packedToks = spark.read.parquet(s"$dir/out/sequences")
      .select(sum(col("seq_tokens"))).head.getLong(0)
    assert(packedToks == corpusToks, s"token conservation broke: $packedToks != $corpusToks")
    secs
  }

  test("corpus pipeline smoke: planted dups removed, tokens conserved") {
    // Per-commit twin of the 10^6-doc volume test below: same pipeline,
    // same assertions, 20× smaller (CI-budget-sized).
    checkPlantedPipeline(nBase = 50000L, nClones = 500L, nearLo = 1000L, nearHi = 1500L)
  }

  volumeTest("corpus pipeline at volume: 10^6 docs, planted dups removed, tokens conserved") {
    // Machine calibration (same discipline as the fixpoint volume spec):
    // the identical pipeline on a 10×-smaller corpus, on both sides of
    // the volume run. A real plan regression (bucket blowup, lost
    // pushdown, quadratic re-planning) inflates the big run far more
    // than the small one; a host-wide slowdown inflates both. The
    // calibration scale matters: a 100×-smaller calibration was pure
    // fixed overhead (~9 s warm), decoupled from what actually costs at
    // volume (per-row work, GC pressure in a long-lived suite JVM), and
    // its ratio flaked; at 10× the calibration pays the same cost class
    // the volume run does, so the ratio tracks the environment.
    def calibrate(): Double =
      checkPlantedPipeline(nBase = 100000L, nClones = 500L, nearLo = 1000L, nearHi = 1500L)
    val calibBefore = calibrate()
    val secs =
      checkPlantedPipeline(nBase = 1000000L, nClones = 5000L, nearLo = 10000L, nearHi = 15000L)
    val calibAfter = calibrate()
    // The budget exists to catch CATASTROPHIC regressions — an
    // accidental all-pairs join or per-doc re-plan lands at hours, not
    // minutes — so 15× the slower same-cost-class calibration (10× the
    // data) with a 300 s floor: ample headroom over the honest ~6-10×
    // wall ratio, far below any quadratic blowup.
    val budget = math.max(300.0, 15.0 * math.max(calibBefore, calibAfter))
    assert(secs < budget,
      s"volume pipeline took ${secs}s vs budget ${budget}s " +
        s"(calibration before=${calibBefore}s after=${calibAfter}s)")
  }

  test("sequence packing smoke: 10k docs, tokens conserved, all sequences full") {
    // Per-commit twin of the 100k-doc volume test below (CI-budget-sized:
    // ~670k tokens, ~330 sequences per shard).
    checkPacking(10000L)
  }

  volumeTest("sequence packing at volume: 100k docs, tokens conserved, all sequences full") {
    // ~6.7M tokens across 8 source shards — the window-cumsum +
    // range-explode shape must hold well past the harness corpus size
    // (each shard's stream is ~840k tokens ≈ 3.3k sequences).
    checkPacking(100000L)
  }

  private def checkPacking(nDocs: Long): Unit = {
    val docs = spark.range(nDocs).select(
      col("id").as("doc_id"),
      concat(lit("s"), pmod(col("id"), lit(8))).as("source"),
      expr("concat_ws(' ', array_repeat('w', CAST(pmod(id, 120) + 8 AS INT)))").as("text"))
    val packed = graft.queries.TextOps.packSequencesOver(docs, 256).collect()
    val expectedTokens = (0L until nDocs).map(i => (i % 120) + 8).sum
    val packedTokens = packed.map(_.getAs[Long]("seq_tokens")).sum
    assert(packedTokens == expectedTokens,
      s"token conservation broke: $packedTokens != $expectedTokens")
    val bySource = packed.groupBy(_.getAs[String]("source"))
    assert(bySource.size == 8)
    bySource.values.foreach { seqs =>
      val sorted = seqs.sortBy(_.getAs[Long]("seq_id"))
      assert(sorted.init.forall(_.getAs[Long]("seq_tokens") == 256L))
      assert(sorted.map(_.getAs[Long]("seq_id")).toSeq ==
        sorted.indices.map(_.toLong))
    }
  }
}
