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

/** One scored term flowing into the per-document top-k (BM25 keyword
  * extraction): tf/df ride along so the output needs no join back.
  */
case class TermScored(term: String, tf: Double, df: Double, score: Double)

/** Exact top-k terms by (score DESC, term ASC) — same bounded-buffer
  * two-stage shape as [[TopKByScore]], for STRING-keyed candidates. The
  * window-rank formulation it replaces in q_text_bm25 shuffles every
  * (doc, term) row to sort per doc; here partial aggregation caps the
  * shuffle at k rows per (partition, doc) — the difference between
  * shipping every term of every probed document and shipping 3, once the
  * probe set is a corpus and not 50 docs. Total comparator (term is
  * unique per doc) → deterministic under any partitioning → still
  * oracle-comparable against the window-rank SQL.
  */
class TopKTerms(k: Int) extends Aggregator[TermScored, Seq[TermScored], Seq[TermScored]] {

  private val ord: Ordering[TermScored] =
    Ordering.by((s: TermScored) => (-s.score, s.term))

  override def zero: Seq[TermScored] = Seq.empty

  override def reduce(buf: Seq[TermScored], a: TermScored): Seq[TermScored] = {
    if (buf.size >= k && ord.lteq(buf.last, a)) buf
    else (buf :+ a).sorted(ord).take(k)
  }

  override def merge(b1: Seq[TermScored], b2: Seq[TermScored]): Seq[TermScored] =
    (b1 ++ b2).sorted(ord).take(k)

  override def finish(reduction: Seq[TermScored]): Seq[TermScored] = reduction.sorted(ord)

  override def bufferEncoder: Encoder[Seq[TermScored]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[TermScored]]()
  override def outputEncoder: Encoder[Seq[TermScored]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[TermScored]]()
}

/** One stratum candidate flowing into the bounded sampler: the md5 draw
  * key, the row key (tie-break — md5 of a unique key cannot actually
  * tie), and the payload column.
  */
case class Drawn(h: String, id: Long, price: Double)

/** Exact min-k by (hash ASC, id ASC) — deterministic per-stratum sampling
  * as a bounded two-stage aggregate. The window-rank formulation it
  * replaces sorts EVERY row of every stratum to keep k (at sf0.1: three
  * ~50k-row sorts for 60 kept rows); here the buffer never exceeds k, so
  * partial aggregation ships ≤ k rows per (partition, stratum) through
  * the shuffle — per-stratum sampling at scan speed however large the
  * strata grow. Total comparator → merge-order independent → still
  * oracle-comparable against the window-rank SQL.
  */
class MinKDraws(k: Int) extends Aggregator[Drawn, Seq[Drawn], Seq[Drawn]] {

  private val ord: Ordering[Drawn] = Ordering.by((d: Drawn) => (d.h, d.id))

  override def zero: Seq[Drawn] = Seq.empty

  override def reduce(buf: Seq[Drawn], a: Drawn): Seq[Drawn] = {
    if (buf.size >= k && ord.lteq(buf.last, a)) buf
    else (buf :+ a).sorted(ord).take(k)
  }

  override def merge(b1: Seq[Drawn], b2: Seq[Drawn]): Seq[Drawn] =
    (b1 ++ b2).sorted(ord).take(k)

  override def finish(reduction: Seq[Drawn]): Seq[Drawn] = reduction.sorted(ord)

  override def bufferEncoder: Encoder[Seq[Drawn]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Drawn]]()
  override def outputEncoder: Encoder[Seq[Drawn]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Drawn]]()
}
