package graft

/** Z-order layout semantics on the harness `orders` table: the bucket
  * envelopes must actually BE the disjoint quadtree rectangles the
  * operator's pruning claim rests on — not just any partition of rows.
  */
class LayoutSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  private case class B(bucket: Long, n: Long, ckMin: Long, ckMax: Long,
                       dayMin: Long, dayMax: Long, area: Long)

  private lazy val buckets: Seq[B] =
    queries.Layout.zorderLayout(spark, sfDir).collect().toSeq.map { r =>
      B(r.getAs[Long]("bucket"), r.getAs[Long]("n"),
        r.getAs[Long]("ck_min"), r.getAs[Long]("ck_max"),
        r.getAs[Long]("day_min"), r.getAs[Long]("day_max"),
        r.getAs[Long]("rect_area"))
    }

  test("buckets partition the table: counts sum to the row count, ids in range") {
    val total = Tables.orders(spark, sfDir).count()
    assert(buckets.map(_.n).sum == total)
    assert(buckets.forall(b => b.bucket >= 0 && b.bucket < 32))
    assert(buckets.map(_.bucket).distinct.length == buckets.length)
  }

  test("bucket envelopes are pairwise disjoint rectangles (the pruning guarantee)") {
    // The top-5-bit Morton prefix fixes an x-quadrant and a y-octant of
    // the rank-normalized space; preimages under the monotone scaling
    // are disjoint intervals, so no two buckets may overlap in BOTH
    // dimensions. This is exactly what lets a scan with a predicate on
    // either column skip every file whose envelope misses it.
    for (a <- buckets; b <- buckets if a.bucket < b.bucket) {
      val xOverlap = a.ckMin <= b.ckMax && b.ckMin <= a.ckMax
      val yOverlap = a.dayMin <= b.dayMax && b.dayMin <= a.dayMax
      assert(!(xOverlap && yOverlap),
        s"buckets ${a.bucket} and ${b.bucket} overlap: $a vs $b")
    }
  }

  test("written z-order files prune a 2-D query box that round-robin files cannot") {
    import org.apache.spark.sql.functions._
    // Materialize both layouts, read back per-file envelopes, and count
    // the files a scan with predicates on BOTH dims would have to open.
    val zDir = java.nio.file.Files.createTempDirectory("zorder").toString
    val rrDir = java.nio.file.Files.createTempDirectory("rrobin").toString
    queries.Layout.zorderWriteOrders(spark, sfDir, zDir, nFiles = 32)
    Tables.orders(spark, sfDir).select(
        col("o_custkey").as("ck"),
        datediff(to_date(col("o_orderdate")), to_date(lit("1995-01-01")))
          .cast("long").as("day"))
      .repartition(32)
      .write.mode("overwrite").parquet(rrDir)

    def intersecting(dir: String): (Long, Long) = {
      val env = queries.Layout.fileEnvelopes(spark, dir).collect()
      val ckLo = env.map(_.getAs[Long]("ck_min")).min
      val ckHi = env.map(_.getAs[Long]("ck_max")).max
      val dLo = env.map(_.getAs[Long]("day_min")).min
      val dHi = env.map(_.getAs[Long]("day_max")).max
      // Query box: the lower-left eighth in both dimensions.
      val (bCkHi, bDayHi) = (ckLo + (ckHi - ckLo) / 8, dLo + (dHi - dLo) / 8)
      val hit = env.count { r =>
        r.getAs[Long]("ck_min") <= bCkHi && r.getAs[Long]("day_min") <= bDayHi
      }
      (hit.toLong, env.length.toLong)
    }
    val (zHit, zFiles) = intersecting(zDir)
    val (rHit, rFiles) = intersecting(rrDir)
    assert(rHit == rFiles, s"round-robin baseline should prune nothing ($rHit/$rFiles)")
    assert(zHit.toDouble / zFiles <= 0.4,
      s"z-order layout opens $zHit of $zFiles files for an eighth-box scan")
  }

  test("envelopes are tight: every bucket covers a small fraction of the corpus area") {
    val ckSpan = buckets.map(_.ckMax).max - buckets.map(_.ckMin).min + 1
    val daySpan = buckets.map(_.dayMax).max - buckets.map(_.dayMin).min + 1
    val corpusArea = ckSpan * daySpan
    val maxArea = buckets.map(_.area).max
    assert(maxArea.toDouble <= corpusArea.toDouble / 8.0,
      s"largest bucket rectangle $maxArea vs corpus $corpusArea — layout not clustering")
  }
}
