package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** One scored candidate flowing into the top-k aggregate. */
case class Scored(score: Double, id: Long, label: Int)

/** Exact top-k by (score DESC, id ASC) as a typed Aggregator — the
  * custom-aggregate tier of the builder brief (SURVEY.md §7.4): unlike
  * the window-rank formulation (sort ALL candidates per group, then
  * filter rank ≤ k), the aggregation buffer never holds more than k
  * rows, so partial aggregation ships k rows per partition per group
  * through the shuffle instead of the full candidate set — the shape
  * that matters when a 100 TB corpus scores billions of candidates per
  * probe.
  *
  * The comparator is total (score desc, id asc tie-break), so the result
  * is independent of arrival and merge order — deterministic under any
  * partitioning, which keeps it oracle-comparable.
  */
class TopKByScore(k: Int) extends Aggregator[Scored, Seq[Scored], Seq[Scored]] {

  private val ord: Ordering[Scored] =
    Ordering.by((s: Scored) => (-s.score, s.id))

  override def zero: Seq[Scored] = Seq.empty

  override def reduce(buf: Seq[Scored], a: Scored): Seq[Scored] = {
    if (buf.size >= k && ord.lteq(buf.last, a)) buf
    else (buf :+ a).sorted(ord).take(k)
  }

  override def merge(b1: Seq[Scored], b2: Seq[Scored]): Seq[Scored] =
    (b1 ++ b2).sorted(ord).take(k)

  override def finish(reduction: Seq[Scored]): Seq[Scored] = reduction.sorted(ord)

  override def bufferEncoder: Encoder[Seq[Scored]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Scored]]()
  override def outputEncoder: Encoder[Seq[Scored]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Scored]]()
}
