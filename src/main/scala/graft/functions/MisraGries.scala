package graft.functions

import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.{Column, Encoder, Encoders}

/** Misra–Gries heavy-hitters summary as a typed [[Aggregator]]: at
  * most `k` counters, mergeable by per-key summation followed by
  * re-bounding (subtract the (k+1)-largest counter, drop non-positive
  * — Berinde et al., "Space-optimal heavy hitters with strong error
  * bounds", PODS'09, the MERGEABLE formulation of classic Misra–Gries
  * decrement). The invariant every partitioning/merge order preserves:
  * each key's counter undercounts its true frequency by at most N/k,
  * so every key with true count > N/k has a POSITIVE counter in the
  * final summary — a guaranteed superset of the heavy hitters from k
  * counters of state per partition, no shuffle of the key universe.
  *
  * At 100 TB this is the hot-key detector: the summary is a few KB
  * per partition, combines map-side like any aggregate, and its
  * output is exactly the salting list a skewed join wants
  * ([[graft.transform.Skew]]); the exact-count verification pass the
  * audit query runs beside it is the EXPENSIVE side (a full shuffle
  * of the keys) that a production pipeline would skip.
  *
  * Which non-heavy keys ride along depends on the merge order (only
  * the guarantee is order-independent), so audits must witness the
  * superset property — "every true heavy hitter present" — never the
  * exact counter set.
  */
class MisraGries(k: Int) extends Aggregator[String, Map[String, Long], Map[String, Long]] {

  def zero: Map[String, Long] = Map.empty

  private def bound(m: Map[String, Long]): Map[String, Long] =
    if (m.size <= k) m
    else {
      val cut = m.valuesIterator.toArray.sorted(Ordering[Long].reverse).apply(k)
      m.collect { case (key, c) if c > cut => key -> (c - cut) }
    }

  def reduce(b: Map[String, Long], a: String): Map[String, Long] =
    b.get(a) match {
      case Some(c) => b.updated(a, c + 1L) // hot path: O(1), no sort
      case None if b.size < k => b.updated(a, 1L)
      case None =>
        // classic Misra–Gries decrement on a full-map miss: the new
        // element's 1 cancels against every counter — O(k) only here,
        // amortized O(1) per input (each decrement repays an earlier
        // increment), where sort-based re-bounding would pay
        // O(k log k) per TAIL element of the stream. The sort-based
        // bound stays in merge(), where the (k+1)-largest subtraction
        // is what makes the summary mergeable.
        b.collect { case (key, c) if c > 1L => key -> (c - 1L) }
    }

  def merge(x: Map[String, Long], y: Map[String, Long]): Map[String, Long] =
    bound(y.foldLeft(x) { case (acc, (key, c)) =>
      acc.updated(key, acc.getOrElse(key, 0L) + c)
    })

  def finish(r: Map[String, Long]): Map[String, Long] = r

  def bufferEncoder: Encoder[Map[String, Long]] = ExpressionEncoder()
  def outputEncoder: Encoder[Map[String, Long]] = ExpressionEncoder()
}

object MisraGries {
  /** The summary as an aggregate column over a string key. */
  def sketch(k: Int, key: Column): Column =
    org.apache.spark.sql.functions.udaf(new MisraGries(k), Encoders.STRING)(key)
}
