package graft

import org.apache.spark.sql.functions._
import graft.queries.Det

/** Det numeric convention: floor-round determinism and order-independent
  * decimal sums (the cross-engine hashing contract, Det.scala).
  */
class DetSpec extends SparkSpec {
  import spark.implicits._

  test("r2 rounds to 2 decimals, ties toward +inf, consistently") {
    val df = Seq(1.005, 2.675, -1.005, 931.71, 0.0).toDF("x")
      .select(Det.r2(col("x")).as("r"))
    val got = df.collect().map(_.getDouble(0)).toSeq
    // Deterministic IEEE semantics, not textbook decimal rounding:
    // 1.005 is stored as 1.00499…, so *100+0.5 floors to 100 → 1.0;
    // 2.675*100 = 267.50000000000003 → 2.68. What matters is that BOTH
    // engines run these exact ops and agree bit-for-bit.
    assert(got == Seq(1.0, 2.68, -1.0, 931.71, 0.0))
  }

  test("dsum is order-independent where double sum is not") {
    val vals = (1 to 2000).map(i => math.Pi * i * 0.37)
    val a = vals.toDF("x").repartition(16)
    val sequential = BigDecimal(
      vals.map(v => BigDecimal(v).setScale(8, BigDecimal.RoundingMode.HALF_UP)).sum
        .setScale(8, BigDecimal.RoundingMode.HALF_UP).toString).toDouble
    val got = a.agg(Det.dsum(col("x"))).collect()(0).getDouble(0)
    assert(got == sequential) // bit-exact regardless of partitioning
  }

  test("davg matches exact-decimal sum / count") {
    val df = Seq(1.1, 2.2, 3.3).toDF("x").repartition(3)
    val got = df.agg(Det.davg(col("x"))).collect()(0).getDouble(0)
    assert(math.abs(got - 2.2) < 1e-12)
  }

  test("dsum invariant under permutation and partitioning (seeded trials)") {
    val rnd = new scala.util.Random(42)
    for (_ <- 1 to 5) {
      val clean = List.fill(500)((rnd.nextDouble() - 0.5) * math.pow(10, rnd.nextInt(8)))
      val d1 = clean.toDF("x").repartition(7).agg(Det.dsum(col("x"))).collect()(0).getDouble(0)
      val d2 = rnd.shuffle(clean).toDF("x").repartition(3).agg(Det.dsum(col("x"))).collect()(0).getDouble(0)
      assert(d1 == d2)
    }
  }

  test("value memos release on releasePins/releaseForDir and rebuild fresh") {
    // Staleness contract of the driver-value memo layer (r15 ADVICE): an
    // in-place corpus mutation clears the value memos wholesale via
    // releaseForDir, and a post-release consumer re-collects — a stale
    // cached array must never survive a release.
    Det.releasePins(spark) // isolate from whatever earlier suites pinned
    var builds = 0
    def build(): Int = { builds += 1; builds }
    assert(Det.memoValue(spark, "detspec.v1")(build()) == 1)
    assert(Det.memoValue(spark, "detspec.v1")(build()) == 1) // memo hit, no rebuild
    assert(Det.valueMemoCount(spark) == 1)

    Det.releaseForDir(spark, "/no/such/dir") // value memos go wholesale, any dir
    assert(Det.valueMemoCount(spark) == 0, "releaseForDir must clear value memos")
    assert(Det.memoValue(spark, "detspec.v1")(build()) == 2, "post-release rebuild must re-collect")

    Det.releasePins(spark)
    assert(Det.valueMemoCount(spark) == 0, "releasePins must clear value memos")
    assert(Det.memoValue(spark, "detspec.v1")(build()) == 3)
    Det.releasePins(spark)
  }
}
