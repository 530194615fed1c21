package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** One-pass Count-Min sketch aggregator (SURVEY.md §2.5 custom
  * aggregate; Cormode & Muthukrishnan, "An improved data stream summary:
  * the count-min sketch and its applications", J.Algorithms 2005).
  *
  * Input: the item's base hash h ∈ [0, p); buffer/output: the d×w counter
  * matrix flattened row-major — row i bucket ((aᵢ·h + bᵢ) mod p) mod w is
  * incremented per occurrence. Estimates (min over rows of the item's
  * bucket) are never below the true count, and overshoot ≤ e/w·N with
  * probability ≥ 1 − e^(−d).
  *
  * Scale shape: the whole corpus folds into one fixed d·w·8-byte state
  * (32 KB at the q48b parameters) per partition, merged once — the
  * frequency surface of a 100 TB token stream crosses the network as a
  * few KB per task, vs a full (token, count) shuffle for the exact form
  * (q48). All arithmetic is md5-derived and closed-form, so the DuckDB
  * oracle rebuilds the identical sketch in SQL (FrequentItems.q48b).
  */
class CountMinAggregator(d: Int, w: Int, p: Long, a: Array[Long], b: Array[Long])
    extends Aggregator[Long, Array[Long], Array[Long]] {

  require(a.length == d && b.length == d)

  override def zero: Array[Long] = new Array[Long](d * w)

  override def reduce(buf: Array[Long], h: Long): Array[Long] = {
    // explicit precondition: a negative h would index negative buckets
    // (raw AIOOBE otherwise) — callers reduce their base hash into [0, p)
    require(h >= 0 && h < p, s"count-min input hash out of [0, $p): $h")
    var i = 0
    while (i < d) {
      buf(i * w + (((a(i) * h + b(i)) % p) % w).toInt) += 1L
      i += 1
    }
    buf
  }

  override def merge(x: Array[Long], y: Array[Long]): Array[Long] = {
    var i = 0
    while (i < d * w) {
      x(i) += y(i)
      i += 1
    }
    x
  }

  override def finish(buf: Array[Long]): Array[Long] = buf

  override def bufferEncoder: Encoder[Array[Long]] =
    ExpressionEncoderHelper.longArray

  override def outputEncoder: Encoder[Array[Long]] =
    ExpressionEncoderHelper.longArray
}
