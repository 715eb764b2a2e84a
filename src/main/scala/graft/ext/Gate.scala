package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Append-path admission control (r13 VERDICT #2), shared by every
  * incremental artifact writer (PostingsIndex.appendDocs,
  * RpIndex.appendVecs, AnnIndex.maintainStream): the "append ≡ rebuild
  * EXACTLY" and "partials sum exact" guarantees hold ONLY for increments
  * disjoint from the committed corpus, so disjointness is enforced, not
  * documented. A replayed drop file — the at-least-once delivery failure
  * every real feed eventually produces — raises
  * OverlappingAppendException instead of silently double-counting
  * statistics and corrupting the incremental fingerprint (which currency
  * would only catch at the NEXT ensure, after serving wrong numbers).
  */
object Gate {

  final class OverlappingAppendException(msg: String)
    extends IllegalArgumentException(msg)

  /** Refuse an increment that is internally duplicated on `idCol` or
    * overlaps the committed id set. Cost: one aggregate over the
    * increment; the committed side is touched ONLY when the cheap
    * monotone-feed check fails (min(new id) ≤ committed max id, from the
    * stored fingerprint — no committed read at all for an id-ascending
    * feed), in which case one semi-join against `committedIds` decides
    * exactly. At 100 TB that join is O(increment + committed-id scan) —
    * the honest price of admitting a non-monotone feed.
    */
  def requireDisjoint(increment: DataFrame, idCol: String, committedMaxId: Long,
                      committedIds: => DataFrame, what: String): Unit = {
    val agg = increment.agg(
      count(lit(1)).as("n"),
      countDistinct(col(idCol)).as("nd"),
      min(col(idCol)).as("mn")).head()
    val n = agg.getAs[Long]("n")
    val nd = agg.getAs[Long]("nd")
    if (n != nd)
      throw new OverlappingAppendException(
        s"$what increment carries ${n - nd} duplicated $idCol row(s) — " +
          "an append must deliver each id at most once")
    val mn = Option(agg.get(2)).map(_.toString.toLong).getOrElse(Long.MaxValue)
    if (n > 0 && mn <= committedMaxId) {
      val overlap = increment.select(col(idCol))
        .join(committedIds.select(col(idCol)), Seq(idCol), "left_semi").count()
      if (overlap > 0)
        throw new OverlappingAppendException(
          s"$what increment re-delivers $overlap already-committed $idCol(s) " +
            "(e.g. a replayed drop file) — appending would double-count; " +
            "dedup the feed or rebuild")
    }
  }
}
