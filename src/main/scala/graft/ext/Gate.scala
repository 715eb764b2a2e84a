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
    * overlaps the committed id set. Cost ladder (cheapest proof wins):
    *
    *   1. one aggregate over the increment (dup check + min id); a
    *      monotone feed (min(new id) > committed max id, from the stored
    *      fingerprint) is proven disjoint with NO committed read;
    *   2. `blooms` (the artifact's per-segment id blooms — no false
    *      negatives): if no bloom might-contain any increment id, the
    *      increment is proven disjoint by an O(increment) distributed
    *      probe — the committed side is still never read;
    *   3. otherwise one semi-join against `committedIds` decides exactly
    *      (bloom false positives land here, as does a bloom-less
    *      artifact). At 100 TB this is O(increment + committed-id scan)
    *      — the honest price of an id-reusing feed, paid only when the
    *      cheaper proofs fail.
    *
    * `committedIds` is by-name: rungs 1 and 2 never evaluate it (the
    * GateSpec pin).
    */
  def requireDisjoint(increment: DataFrame, idCol: String, committedMaxId: Long,
                      committedIds: => DataFrame, what: String,
                      blooms: Seq[org.apache.spark.util.sketch.BloomFilter] =
                        Seq.empty): Unit = {
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
      val bc =
        if (blooms.isEmpty) None
        else Some(increment.sparkSession.sparkContext.broadcast(blooms))
      try {
        val candidates = bc match {
          case None => increment.select(col(idCol))
          case Some(b) =>
            // Broadcast the segment blooms and keep only ids SOME bloom
            // might contain — no false negatives, so an empty survivor set
            // proves disjointness without touching the committed table. A
            // UDF (not a built-in) because the probe has no SQL surface;
            // it runs over the INCREMENT only, never corpus-sized data.
            val might = udf((id: Long) => b.value.exists(_.mightContainLong(id)))
            // Pinned so the emptiness probe and the semi-join that follows
            // a non-empty survivor set share ONE evaluation of the probe.
            increment.select(col(idCol)).filter(might(col(idCol))).persist()
        }
        try {
          if (bc.isEmpty || !candidates.isEmpty) {
            exactRungRuns.incrementAndGet()
            val overlap = candidates
              .join(committedIds.select(col(idCol)), Seq(idCol), "left_semi").count()
            if (overlap > 0)
              throw new OverlappingAppendException(
                s"$what increment re-delivers $overlap already-committed $idCol(s) " +
                  "(e.g. a replayed drop file) — appending would double-count; " +
                  "dedup the feed or rebuild")
          }
        } finally bc.foreach(_ => candidates.unpersist())
      } finally
        // The probe broadcast is per-admission scrap: without an explicit
        // destroy, every gated append in a long-running streaming
        // maintainer would leak one broadcast of all segment blooms on
        // the driver and executors.
        bc.foreach(_.destroy())
    }
  }

  /** How many times the EXACT rung (the committed-id semi-join) has run —
    * the by-name `committedIds` is evaluated iff this advances. Test
    * hook: specs pin "blooms/watermark proved disjointness without
    * reading the committed table" by DELTA.
    */
  private[graft] val exactRungRuns = new java.util.concurrent.atomic.AtomicLong(0L)
}
