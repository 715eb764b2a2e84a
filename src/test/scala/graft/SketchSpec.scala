package graft

import org.apache.spark.sql.functions._

/** KMV sketch semantics on planted fixtures: exact small-range answers,
  * duplicate insensitivity, the union/merge law, and the bounded-buffer
  * aggregator agreeing with the windowed bottom-k the oracle uses.
  */
class SketchSpec extends SparkSpec {
  import spark.implicits._

  private def stage(rows: Seq[(Long, String, String)]): String = {
    val dir = java.nio.file.Files.createTempDirectory("sketch").toString
    rows.map { case (id, t, src) => (id, t, "en", src, t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("small sources report exact counts; duplicates never inflate the sketch") {
    // s0 has 4 distinct tokens spread over 2 docs WITH heavy repetition;
    // s1 has 2. Both are below k=64, so est == exact and rel_err == 0.
    val dir = stage(Seq(
      (1L, "a b a b a b c", "s0"),
      (2L, "c d c d c d", "s0"),
      (3L, "x y x y", "s1")))
    val rows = queries.Sketch.sketchKmv(spark, dir).collect()
      .map(r => r.getAs[String]("source") ->
        (r.getAs[Long]("n_exact"), r.getAs[Long]("k_used"),
          r.getAs[Double]("est_distinct"), r.getAs[Double]("rel_err"))).toMap
    assert(rows("s0") == (4L, 4L, 4.0, 0.0))
    assert(rows("s1") == (2L, 2L, 2.0, 0.0))
    queries.Det.releasePins(spark)
  }

  test("above k the estimate lands within the sketch's error regime") {
    // One source with 1000 distinct tokens — k=64 ⇒ SE ≈ 13%; assert a
    // generous 4-sigma band so the test pins sanity, not luck.
    val toks = (1 to 1000).map(i => s"tok$i").mkString(" ")
    val dir = stage(Seq((1L, toks, "big")))
    val r = queries.Sketch.sketchKmv(spark, dir).collect().head
    assert(r.getAs[Long]("n_exact") == 1000L)
    assert(r.getAs[Long]("k_used") == 64L)
    val est = r.getAs[Double]("est_distinct")
    assert(est > 480 && est < 1520, s"est $est outside 1000 ± 52%")
    queries.Det.releasePins(spark)
  }

  test("CMS is one-sided: estimate never undercounts, heavy hitter ranks first") {
    // 200 distinct fillers ×1 + one hot token ×500 packed into w=128
    // buckets: collisions can only ADD to a counter, so est ≥ exact for
    // every candidate (the CMS guarantee), and the hot token must hold
    // rank 1 with its exact count recovered up to a small overcount
    // (min over d=4 rows; expected collision mass ≈ N/w per row).
    val fillers = (1 to 200).map(i => s"f$i").mkString(" ")
    val hot = Seq.fill(500)("hot").mkString(" ")
    val dir = stage(Seq((1L, fillers, "s0"), (2L, hot, "s0")))
    val rows = queries.Sketch.sketchCms(spark, dir).collect()
    assert(rows.length == 20)
    rows.foreach { r =>
      assert(r.getAs[Long]("overcount") >= 0L,
        s"CMS undercounted ${r.getAs[String]("tok")}")
      assert(r.getAs[Long]("est_cms") ==
        r.getAs[Long]("n_exact") + r.getAs[Long]("overcount"))
    }
    val top = rows.find(_.getAs[Long]("rank") == 1L).get
    assert(top.getAs[String]("tok") == "hot")
    assert(top.getAs[Long]("n_exact") == 500L)
    assert(top.getAs[Long]("overcount") <= 20L,
      s"overcount ${top.getAs[Long]("overcount")} far above the e·N/w regime")
    queries.Det.releasePins(spark)
  }

  test("CMS with vocabulary below bucket width is exact on a collision-free fixture") {
    // 3 tokens over 4×128 counters: the frozen md5 bucket assignment has
    // no full-row collision set, so every estimate is exact.
    val dir = stage(Seq((1L, "a a a a a b b b c", "s0")))
    val rows = queries.Sketch.sketchCms(spark, dir).collect()
      .map(r => r.getAs[String]("tok") ->
        (r.getAs[Long]("n_exact"), r.getAs[Long]("est_cms"))).toMap
    assert(rows("a") == (5L, 5L))
    assert(rows("b") == (3L, 3L))
    assert(rows("c") == (1L, 1L))
    queries.Det.releasePins(spark)
  }

  test("merge law: union of per-source sketches equals the direct global sketch") {
    // Overlapping vocabularies across three sources, all above trivial
    // size; the k-th minima must agree EXACTLY, not approximately.
    val dir = stage(Seq(
      (1L, (1 to 300).map(i => s"a$i").mkString(" "), "s0"),
      (2L, (150 to 450).map(i => s"a$i").mkString(" "), "s1"),
      (3L, (1 to 200).map(i => s"b$i").mkString(" "), "s2")))
    val r = queries.Sketch.sketchKmvMerge(spark, dir).collect().head
    assert(r.getAs[Boolean]("merge_exact"), "k-th minimum differed between paths")
    assert(r.getAs[Double]("est_direct") == r.getAs[Double]("est_merged"))
    assert(r.getAs[Long]("n_exact") == 650L) // 450 a's + 200 b's
    queries.Det.releasePins(spark)
  }

  test("HLL registers merge by max: sharded register tables equal the global ones") {
    // The HLL merge law — register-wise max — is what lets 1000
    // executors sketch disjoint shards and a coordinator combine them
    // without touching data. Pin it on the register table itself.
    val docs = (0L until 60L)
      .map(i => (i, (0 until 20).map(j => s"t${(i * 7 + j * 3) % 97}").mkString(" "),
        "en", s"src${i % 3}", 40L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = java.nio.file.Files.createTempDirectory("hll_merge").toString
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val ht = graft.Tables.documents(spark, dir)
      .select(col("source"), explode(split(col("text"), " ")).as("tok"))
      .withColumn("hv", expr((1 to 12).map { i =>
        s"(instr('0123456789abcdef', substr(md5(tok), $i, 1)) - 1) * ${1L << (4 * (12 - i))}L"
      }.mkString("CAST(", " + ", " AS BIGINT)")))
    val global = queries.Sketch.hllRegisters(ht)
      .collect().map(_.toSeq).toSet
    val shardA = queries.Sketch.hllRegisters(ht.filter(col("tok") < "t5"))
    val shardB = queries.Sketch.hllRegisters(ht.filter(col("tok") >= "t5"))
    val merged = shardA.unionByName(shardB)
      .groupBy(col("source"), col("j")).agg(max(col("mj")).as("mj"))
      .collect().map(_.toSeq).toSet
    assert(merged == global, "shard registers must merge by max into the global registers")
    queries.Det.releasePins(spark)
  }

  test("aggregator sketch is partitioning-invariant (1 vs 32 shuffle partitions)") {
    val toks = (1 to 500).map(i => s"w$i").mkString(" ")
    val dir = stage(Seq((1L, toks, "s0"), (2L, toks, "s1")))
    val base = queries.Sketch.sketchKmv(spark, dir).collect().map(_.toString).toSeq
    queries.Det.releasePins(spark)
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    try {
      spark.conf.set("spark.sql.shuffle.partitions", "1")
      val single = queries.Sketch.sketchKmv(spark, dir).collect().map(_.toString).toSeq
      assert(single == base, "sketch changed under repartitioning")
    } finally {
      spark.conf.set("spark.sql.shuffle.partitions", prev)
      queries.Det.releasePins(spark)
    }
  }
}
