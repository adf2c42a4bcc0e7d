package graft.operators

import scala.collection.mutable

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.{Aggregator, UserDefinedFunction}
import org.apache.spark.sql.functions.udaf

/** One frequent-item estimate: `est` is a LOWER bound on the item's true
  * count; the true count exceeds it by at most the sketch's error bound
  * `n / (k+1)` (n = stream length, k = sketch capacity). */
case class FreqItem(item: String, est: Long)

/** Misra–Gries heavy-hitters state: at most `k` (item, counter) pairs.
  *
  * Update (classic MG): a tracked item increments its counter; an
  * untracked item inserts at 1 if a slot is free, otherwise EVERY
  * counter decrements by 1 (the newcomer's implicit 1 included) and
  * zeroed items vacate. Each decrement event burns k+1 stream
  * occurrences, so there are at most n/(k+1) of them — hence the
  * deterministic guarantee: `true − n/(k+1) ≤ est ≤ true`, and any item
  * with `true > n/(k+1)` is STILL TRACKED at the end.
  *
  * Merge (mergeable-summaries reduction, Agarwal et al. 2012): sum
  * counters pointwise; if more than k survive, subtract the (k+1)-th
  * largest counter from all and keep the positive ones. Error bounds
  * add across merged partials, staying ≤ n_total/(k+1) — which is what
  * makes this a valid PARTIAL aggregate: map-side sketches of size
  * O(k) merge in the shuffle, the exchange never carries per-item
  * rows. The 100 TB "top domains / top tokens" shape.
  *
  * When the distinct-item count never exceeds k, no decrement ever
  * fires anywhere and the sketch is EXACT under any partitioning —
  * the regime the oracle query gates end-to-end; the eviction regime's
  * bounds are spec-pinned on adversarial streams (estimates there are
  * merge-order-dependent within the bound, as with any MG).
  */
final class MgBuffer(val k: Int) extends Serializable {
  val counts: mutable.HashMap[String, Long] = mutable.HashMap.empty

  def add(item: String): Unit = counts.get(item) match {
    case Some(c) => counts.update(item, c + 1)
    case None if counts.size < k => counts.update(item, 1L)
    case None =>
      val dead = List.newBuilder[String]
      for ((key, c) <- counts)
        if (c == 1L) dead += key else counts.update(key, c - 1L)
      dead.result().foreach(counts.remove)
  }

  def mergeWith(o: MgBuffer): MgBuffer = {
    for ((key, c) <- o.counts)
      counts.update(key, counts.getOrElse(key, 0L) + c)
    if (counts.size > k) {
      val sub = counts.values.toArray.sortBy(-_).apply(k) // (k+1)-th largest
      val kept = counts.iterator
        .filter { case (_, c) => c > sub }
        .map { case (key, c) => key -> (c - sub) }
        .toList
      counts.clear()
      kept.foreach { case (key, c) => counts.update(key, c) }
    }
    this
  }

  /** Deterministic output order: (est desc, item asc). */
  def result: Seq[FreqItem] =
    counts.toSeq.sortBy { case (t, c) => (-c, t) }
      .map { case (t, c) => FreqItem(t, c) }
}

final class MisraGriesAggregator(k: Int)
    extends Aggregator[String, MgBuffer, Seq[FreqItem]] {
  require(k >= 1, "k must be >= 1")
  override def zero: MgBuffer = new MgBuffer(k)
  override def reduce(b: MgBuffer, a: String): MgBuffer = {
    if (a != null) b.add(a)
    b
  }
  override def merge(b1: MgBuffer, b2: MgBuffer): MgBuffer = b1.mergeWith(b2)
  override def finish(b: MgBuffer): Seq[FreqItem] = b.result
  override def bufferEncoder: Encoder[MgBuffer] = Encoders.kryo[MgBuffer]
  override def outputEncoder: Encoder[Seq[FreqItem]] =
    ExpressionEncoder[Seq[FreqItem]]()
}

object FrequentItems {
  /** DataFrame-facing UDAF: `misraGries(k)(col)` →
    * `array<struct<item,est>>` sorted (est desc, item asc). O(k) state
    * per group at every stage — map-side partial sketches merge in the
    * shuffle; the exchange carries k pairs per partition per group, not
    * the item stream. */
  def misraGries(k: Int): UserDefinedFunction =
    udaf(new MisraGriesAggregator(k), Encoders.STRING)
}
