package graft.expr

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** SURVEY §2.J(2): the TTM aggregate as a typed
  * `Aggregator[IN, BUF, OUT]` — sum of the values at the 4 most-recent
  * (ts, event_id) keys, nulls→0, fewer than 4 allowed
  * (`fetch_data.py:29-36` semantics).
  *
  * The buffer keeps only the current top-4 keys (constant size), so each
  * partial is O(1) memory and the merge is O(1) work — safe at any scale
  * and skew, unlike a collect-then-sort formulation. Input is
  * (epochMicros, event_id, value); recency order is (ts, event_id).
  */
object TtmAggregator
    extends Aggregator[(Long, Long, Double), Seq[(Long, Long, Double)], Double] {

  private val K = 4
  private val keyOrd: Ordering[(Long, Long, Double)] =
    Ordering.by((t: (Long, Long, Double)) => (t._1, t._2))

  override def zero: Seq[(Long, Long, Double)] = Seq.empty

  override def reduce(buf: Seq[(Long, Long, Double)],
                      in: (Long, Long, Double)): Seq[(Long, Long, Double)] =
    (buf :+ in).sorted(keyOrd).takeRight(K)

  override def merge(a: Seq[(Long, Long, Double)],
                     b: Seq[(Long, Long, Double)]): Seq[(Long, Long, Double)] =
    (a ++ b).sorted(keyOrd).takeRight(K)

  override def finish(buf: Seq[(Long, Long, Double)]): Double =
    buf.map(_._3).sum

  override def bufferEncoder: Encoder[Seq[(Long, Long, Double)]] =
    ExpressionEncoder[Seq[(Long, Long, Double)]]()

  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}
