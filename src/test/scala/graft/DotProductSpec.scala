package graft

import org.apache.spark.sql.functions._

/** The native dot_f32 expression (DotProductF32 + GraftExtensions):
  * value semantics, null handling, and bit-equality with the SQL fold it
  * replaces (the determinism contract the oracle relies on).
  */
class DotProductSpec extends SparkSpec {
  import spark.implicits._

  private val df = Seq(
    (1L, Array(1.0f, 2.0f, 3.0f), Array(4.0f, 5.0f, 6.0f)),
    (2L, Array(0.1f, -0.2f, 0.3f), Array(-0.4f, 0.5f, 0.6f))
  ).toDF("id", "a", "b")

  test("dot_f32 computes the sequential dot product") {
    val got = df.orderBy("id").select(expr("dot_f32(a, b)")).collect().map(_.getDouble(0))
    assert(got(0) == (4.0 + 10.0 + 18.0))
    val expected2 = 0.1f.toDouble * -0.4f.toDouble + -0.2f.toDouble * 0.5f.toDouble +
      0.3f.toDouble * 0.6f.toDouble
    assert(got(1) == expected2)
  }

  test("dot_f32 is bit-identical to the 0-seeded HOF fold") {
    val n = 64
    val vecs = (0 until 50).map(i =>
      (i.toLong, Array.tabulate(n)(d => (math.sin(i * n + d) * 3).toFloat),
        Array.tabulate(n)(d => (math.cos(i * n + d) * 2).toFloat)))
      .toDF("id", "a", "b")
    val fold = s"aggregate(sequence(1, $n), CAST(0 AS DOUBLE), " +
      "(acc, i) -> acc + CAST(element_at(a, i) AS DOUBLE) * CAST(element_at(b, i) AS DOUBLE))"
    val diff = vecs.select((expr("dot_f32(a, b)") =!= expr(fold)).as("d"))
      .filter(col("d")).count()
    assert(diff == 0)
  }

  test("dot_f32 is null-safe and folds the shorter prefix") {
    val d2 = Seq(
      (1L, Array(1.0f, 2.0f), Array(3.0f)),
      (2L, null.asInstanceOf[Array[Float]], Array(1.0f))
    ).toDF("id", "a", "b")
    val rows = d2.orderBy("id").select(expr("dot_f32(a, b)")).collect()
    assert(rows(0).getDouble(0) == 3.0) // min length = 1
    assert(rows(1).isNullAt(0))
  }
}

/** TopKByScore Aggregator: bounded buffer, total-order determinism. */
class TopKSpec extends SparkSpec {
  import spark.implicits._
  import graft.functions.{Scored, TopKByScore}

  test("top-k keeps k best by (score desc, id asc), any arrival order") {
    val agg = new TopKByScore(3)
    val rows = Seq(
      Scored(0.9, 7, 0), Scored(0.9, 3, 0), Scored(0.1, 1, 0),
      Scored(0.5, 2, 0), Scored(0.9, 5, 0), Scored(0.7, 9, 0))
    val expected = Seq(Scored(0.9, 3, 0), Scored(0.9, 5, 0), Scored(0.9, 7, 0))
    // direct reduce in two arrival orders
    val r1 = rows.foldLeft(agg.zero)(agg.reduce)
    val r2 = rows.reverse.foldLeft(agg.zero)(agg.reduce)
    assert(agg.finish(r1) == expected && agg.finish(r2) == expected)
    // split-merge in arbitrary partitioning
    val (p1, p2) = rows.splitAt(2)
    val merged = agg.merge(p1.foldLeft(agg.zero)(agg.reduce), p2.foldLeft(agg.zero)(agg.reduce))
    assert(agg.finish(merged) == expected)
  }

  test("udaf path groups and explodes identically to window rank") {
    val topk = org.apache.spark.sql.functions.udaf(new TopKByScore(2))
    import org.apache.spark.sql.functions._
    val df = Seq((1L, 0.5, 10L, 0), (1L, 0.9, 11L, 1), (1L, 0.7, 12L, 2), (2L, 0.2, 13L, 3))
      .toDF("g", "score", "id", "label")
    val got = df.groupBy(col("g")).agg(topk(col("score"), col("id"), col("label")).as("top"))
      .select(col("g"), explode(col("top")).as("s"))
      .select(col("g"), col("s.id")).orderBy(col("g"), col("s.id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == Seq((1L, 11L), (1L, 12L), (2L, 13L)))
  }
}
