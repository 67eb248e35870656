package graft.ops

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Misra-Gries heavy-hitters summary as a typed mergeable UDAF — the
  * one-pass, bounded-state sibling of [[TextAnalysis.heavyHitters]]'s
  * count-min path (SURVEY.md §2.2 UDAF/sketch rows).
  *
  * State is at most `k` (token, counter) pairs regardless of stream
  * length. Per element: increment a present key, insert when below
  * capacity, else decrement every counter (dropping zeros) — the
  * classic frequent-items algorithm. Partial buffers merge by pointwise
  * sum followed by subtracting the (k+1)-th largest counter from every
  * entry (the mergeable-summaries rule), which preserves the guarantee
  * ACROSS ANY MERGE TREE: every token with true count > n/(k+1) is
  * present in the final summary, and each surviving counter
  * underestimates its true count by at most n/(k+1). Which
  * below-threshold tokens also survive IS merge-order-dependent — so
  * the summary is a candidate generator, not a result;
  * [[TextAnalysis.heavyHittersMG]] exact-confirms candidates to make
  * the output deterministic.
  *
  * Scale: the shuffle carries ≤ k pairs per partial aggregate (map-side
  * combine does the heavy lifting), and only one ≤ k-entry row ever
  * reaches the driver. The decrement pass is O(k) but fires at most
  * once per n/(k+1) stream elements in aggregate, so amortized cost
  * stays O(1) per token. The immutable-Map buffer makes per-element
  * updates O(1) HAMT ops; serialization cost only applies at partition
  * boundaries (Spark keeps typed buffers as objects in memory). */
final case class MisraGriesAgg(k: Int)
    extends Aggregator[String, Map[String, Long], Seq[(String, Long)]] {
  require(k >= 1, s"k must be >= 1, got $k")

  override def zero: Map[String, Long] = Map.empty

  override def reduce(buf: Map[String, Long], tok: String): Map[String, Long] =
    buf.get(tok) match {
      case Some(c)                  => buf.updated(tok, c + 1L)
      case None if buf.size < k     => buf.updated(tok, 1L)
      case None                     =>
        // full and unseen: decrement all, drop zeros (the new token's
        // implicit +1 and −1 cancel — it is not inserted)
        buf.collect { case (t, c) if c > 1L => t -> (c - 1L) }
    }

  override def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] = {
    val summed = b.foldLeft(a) { case (m, (t, c)) =>
      m.updated(t, m.getOrElse(t, 0L) + c)
    }
    if (summed.size <= k) summed
    else {
      // subtract the (k+1)-th largest counter from everything, keep > 0
      val cut = summed.valuesIterator.toArray.sortInPlace()(
        Ordering.Long.reverse).apply(k)
      summed.collect { case (t, c) if c > cut => t -> (c - cut) }
    }
  }

  /** Deterministic rendering of the (merge-order-dependent) summary:
    * sorted by estimated count desc, then token. */
  override def finish(buf: Map[String, Long]): Seq[(String, Long)] =
    buf.toSeq.sortBy { case (t, c) => (-c, t) }

  override def bufferEncoder: Encoder[Map[String, Long]] = ExpressionEncoder()
  override def outputEncoder: Encoder[Seq[(String, Long)]] = ExpressionEncoder()
}
