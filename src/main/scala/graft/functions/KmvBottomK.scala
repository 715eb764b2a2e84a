package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** One hashed value flowing into the KMV sketch: the 48-bit value hash
  * and the value itself (carried for deterministic tie-break and so the
  * sketch doubles as a distinct-value sample).
  */
case class HashedVal(hv: Long, v: String)

/** KMV (bottom-k) sketch state as a typed Aggregator: the k smallest
  * DISTINCT (hash, value) pairs seen, in ascending order. Same
  * bounded-buffer two-stage shape as [[TopKByScore]], with one twist:
  * insertion deduplicates, so the aggregator runs directly over the raw
  * token multiset — duplicates of a value carry the same hash and
  * collapse in-buffer, which removes the distinct() pre-shuffle a
  * window formulation needs. Partial aggregation then ships ≤ k rows
  * per (partition, group) however many billions of raw tokens a group
  * holds — the constant-state property that makes the sketch a one-pass
  * 100 TB operator.
  *
  * Total comparator (hv asc, value asc) + dedup ⇒ the result is a pure
  * function of the input SET, independent of partitioning and merge
  * order — oracle-comparable against a windowed bottom-k over DISTINCT
  * values in SQL.
  */
class KmvBottomK(k: Int) extends Aggregator[HashedVal, Seq[HashedVal], Seq[HashedVal]] {

  private val ord: Ordering[HashedVal] =
    Ordering.by((s: HashedVal) => (s.hv, s.v))

  override def zero: Seq[HashedVal] = Seq.empty

  override def reduce(buf: Seq[HashedVal], a: HashedVal): Seq[HashedVal] = {
    if (buf.size >= k && ord.lt(buf.last, a)) buf
    else if (buf.contains(a)) buf
    else (buf :+ a).sorted(ord).take(k)
  }

  override def merge(b1: Seq[HashedVal], b2: Seq[HashedVal]): Seq[HashedVal] =
    (b1 ++ b2).distinct.sorted(ord).take(k)

  override def finish(reduction: Seq[HashedVal]): Seq[HashedVal] =
    reduction.sorted(ord)

  override def bufferEncoder: Encoder[Seq[HashedVal]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[HashedVal]]()
  override def outputEncoder: Encoder[Seq[HashedVal]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[HashedVal]]()
}
