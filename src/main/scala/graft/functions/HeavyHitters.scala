package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Misra-Gries heavy-hitters summary as a typed, MERGEABLE Spark
  * `Aggregator` (the Dataset-API counterpart of the codegen'd expressions in
  * this package — a sketch with algebraic merge is aggregation STATE, which
  * is an Aggregator's job, not an Expression's).
  *
  * Guarantees (Misra-Gries 1982; mergeability per Agarwal et al., "Mergeable
  * Summaries", PODS 2012): with k counters over n items, every estimate
  * satisfies f(x) - n/(k+1) <= est(x) <= f(x), so every x with
  * f(x) > n/(k+1) is guaranteed present — at 100 TB this finds the hot
  * series/terms in ONE pass with O(k) state per partition and O(k) merge,
  * where an exact count would shuffle every distinct key.
  */
object HeavyHitters {

  /** Bounded counter map; at most k entries between operations. */
  final case class MGBuffer(counts: Map[String, Long], n: Long)

  final class MisraGries(k: Int)
      extends Aggregator[String, MGBuffer, Map[String, Long]] {
    require(k >= 1, "k must be >= 1")

    override def zero: MGBuffer = MGBuffer(Map.empty, 0L)

    override def reduce(b: MGBuffer, x: String): MGBuffer = {
      val c = b.counts
      val updated =
        if (c.contains(x)) c.updated(x, c(x) + 1)
        else if (c.size < k) c.updated(x, 1L)
        else {
          // decrement-all step: drop one "vote" from every counter
          c.flatMap { case (t, v) => if (v > 1) Some(t -> (v - 1)) else None }
        }
      MGBuffer(updated, b.n + 1)
    }

    override def merge(b1: MGBuffer, b2: MGBuffer): MGBuffer = {
      val combined = (b1.counts.keySet ++ b2.counts.keySet).map { t =>
        t -> (b1.counts.getOrElse(t, 0L) + b2.counts.getOrElse(t, 0L))
      }.toMap
      val trimmed =
        if (combined.size <= k) combined
        else {
          // subtract the (k+1)-th largest count from all, drop the non-positive
          val t = combined.values.toSeq.sorted(Ordering[Long].reverse)(k)
          combined.flatMap { case (key, v) =>
            if (v - t > 0) Some(key -> (v - t)) else None
          }
        }
      MGBuffer(trimmed, b1.n + b2.n)
    }

    override def finish(b: MGBuffer): Map[String, Long] = b.counts

    override def bufferEncoder: Encoder[MGBuffer] = Encoders.product[MGBuffer]
    override def outputEncoder: Encoder[Map[String, Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[String, Long]]()
  }

  /** A stored MG summary: the bounded counter map plus the TOTAL item
    * count it saw (`finish` above drops n, but a persisted partial needs
    * it — the reader's guarantee threshold is n/(k+1) over the MERGED
    * total).
    */
  final case class MGSummary(counts: Map[String, Long], n: Long)

  /** Merges stored [[MGSummary]] rows — the reader side of a heavy-hitters
    * MV ([[graft.streaming.Streams.hhMvSink]]): same O(k) merge-and-trim
    * as [[MisraGries.merge]], lifted to summaries so per-batch partials
    * re-combine without rescanning raw rows (Agarwal et al., PODS 2012
    * mergeability).
    */
  final class MisraGriesMerge(k: Int)
      extends Aggregator[MGSummary, MGBuffer, MGSummary] {
    private val mg = new MisraGries(k)
    override def zero: MGBuffer = mg.zero
    override def reduce(b: MGBuffer, s: MGSummary): MGBuffer =
      mg.merge(b, MGBuffer(s.counts, s.n))
    override def merge(b1: MGBuffer, b2: MGBuffer): MGBuffer = mg.merge(b1, b2)
    override def finish(b: MGBuffer): MGSummary = MGSummary(b.counts, b.n)
    override def bufferEncoder: Encoder[MGBuffer] = Encoders.product[MGBuffer]
    override def outputEncoder: Encoder[MGSummary] = Encoders.product[MGSummary]
  }
}
