package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

import scala.collection.mutable

/** Misra–Gries heavy-hitter summary over a string key column, as a
  * typed [[Aggregator]] — the deterministic-guarantee counterpart of
  * [[CountMinSketchAgg]] in the engine's mergeable-sketch family
  * (reference scope: the funnel pipeline's GROUP-BY-count reports,
  * e.g. `report_engine.py`'s fetch_status counts, generalized to the
  * bounded-memory form a 100 TB key stream needs).
  *
  * The summary holds at most `capacity` counters. reduce: an arriving
  * key increments its counter, opens a new one if there is room, and
  * otherwise decrements EVERY counter by one (dropping zeros) — the
  * classic Misra–Gries (1982) step. merge: counters add by key; if the
  * union exceeds `capacity`, the (capacity+1)-th largest count is
  * subtracted from all and non-positive entries drop — the mergeable-
  * summaries form (Agarwal, Cormode, Huang, Phillips, Wei, Yi, PODS
  * 2012) that makes the aggregate ALGEBRAIC: partial aggregation,
  * AQE re-planning, and any merge tree give the same guarantee.
  *
  * Guarantee (either path): for every key,
  * `true − n/(capacity+1) ≤ counter ≤ true`, and any key with
  * frequency above `n/(capacity+1)` is PRESENT in the summary. The
  * counter VALUES on the eviction path depend on arrival order (as in
  * any MG implementation), so the oracle-gated query runs the summary
  * in its exact regime (`capacity ≥` distinct keys — no eviction, no
  * decrement, counters are plain counts and order-free), while the
  * eviction/merge path is property-tested in SketchSpec against a
  * brute-force reference on random orders, asserting the two-sided
  * bound and the must-contain property.
  *
  * At 100 TB the summary replaces a full (key → count) shuffle with a
  * `capacity`-entry map per partition — the top-k idiom when the key
  * space (urls, ngrams, user agents) is unbounded but only the head
  * matters.
  */
final class MisraGriesAgg(val capacity: Int)
    extends Aggregator[String, Map[String, Long], Map[String, Long]] {

  override def zero: Map[String, Long] = Map.empty

  override def reduce(buf: Map[String, Long], key: String): Map[String, Long] =
    buf.get(key) match {
      case Some(c) => buf.updated(key, c + 1L)
      case None if buf.size < capacity => buf.updated(key, 1L)
      case None =>
        // decrement-all: the arriving key and one unit of every counter
        // annihilate; zeros drop, freeing room for later arrivals
        buf.iterator
          .map { case (k, c) => (k, c - 1L) }
          .filter(_._2 > 0L)
          .toMap
    }

  override def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] = {
    val m = mutable.HashMap.empty[String, Long]
    a.foreach { case (k, c) => m.update(k, m.getOrElse(k, 0L) + c) }
    b.foreach { case (k, c) => m.update(k, m.getOrElse(k, 0L) + c) }
    if (m.size <= capacity) m.toMap
    else {
      // subtract the (capacity+1)-th largest count from everything;
      // entries at or below it reach zero and drop. Deterministic in
      // the multiset of counts — key order never matters.
      val cut = m.values.toArray.sortBy(-_).apply(capacity)
      m.iterator
        .map { case (k, c) => (k, c - cut) }
        .filter(_._2 > 0L)
        .toMap
    }
  }

  override def finish(buf: Map[String, Long]): Map[String, Long] = buf

  override def bufferEncoder: Encoder[Map[String, Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[String, Long]]()
  override def outputEncoder: Encoder[Map[String, Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[String, Long]]()
}

object MisraGriesAgg {

  /** Brute-force reference for the property tests: exact counts of the
    * stream — the object the MG guarantee is stated against.
    */
  def exactCounts(xs: Seq[String]): Map[String, Long] =
    xs.groupBy(identity).map { case (k, v) => (k, v.size.toLong) }
}
