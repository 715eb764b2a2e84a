package graft

import org.apache.spark.sql.functions._

/** Bounded-sampler semantics: the MinKDraws aggregate must be a pure
  * function of the input SET — independent of partitioning and merge
  * order — and equal the windowed rank-filter it replaced.
  */
class SamplingSpec extends SparkSpec {
  import spark.implicits._

  test("MinKDraws equals the window-rank sample and is partitioning-invariant") {
    val rows = (1L to 5000L).map(i => (if (i % 3 == 0) "A" else "B", i, i * 1.5))
    def result(parts: Int): Seq[(String, Long, Long)] = {
      val df = rows.toDF("st", "id", "price").repartition(parts)
        .select(col("st"), md5(col("id").cast("string")).as("h"),
          col("id"), col("price"))
      val minK = udaf(new functions.MinKDraws(20))
      df.groupBy(col("st")).agg(minK(col("h"), col("id"), col("price")).as("ds"))
        .select(col("st"), posexplode(col("ds")).as(Seq("p", "d")))
        .select(col("st"), (col("p") + 1).cast("long").as("rk"), col("d.id"))
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq.sorted
    }
    val one = result(1)
    assert(one == result(32), "sample depends on partitioning")
    // Window-rank twin over the same rows.
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("st"))
      .orderBy(md5(col("id").cast("string")), col("id"))
    val windowed = rows.toDF("st", "id", "price")
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= 20)
      .select(col("st"), col("rk"), col("id"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq.sorted
    assert(one == windowed, "bounded sampler diverged from the window-rank sample")
  }
}
