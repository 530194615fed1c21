package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** One-pass MinHash signature aggregator (SURVEY.md §2.5: custom
  * aggregates are `Aggregator`s registered via `udaf`). Input: a base
  * shingle hash h ∈ [0, p); buffer/output: the NumHashes-wide signature
  * min_i((aᵢ·h + bᵢ) mod p).
  *
  * Used by Dedup.q27 in place of 64 separate `min(pmod(...))` aggregate
  * columns: measured at sf0.1 the one-primitive-loop buffer beats the
  * declarative form ~0.40 s vs 0.54 s warm (ObjectHashAggregate's buffer
  * (de)serialization costs less than 64 independent codegen'd agg
  * expressions), with a far smaller generated-code footprint. Also the
  * recipe for sketches that cannot be expressed as columns at all (HLL
  * variants, reservoir samples, …). Signature equality with the
  * declarative form is asserted in MinHashAggregatorSpec.
  */
class MinHashAggregator(a: Array[Long], b: Array[Long], p: Long)
    extends Aggregator[Long, Array[Long], Array[Long]] {

  private val n = a.length
  require(b.length == n)

  override def zero: Array[Long] = Array.fill(n)(p - 1)

  override def reduce(buf: Array[Long], h: Long): Array[Long] = {
    // a negative h would make (a·h + b) % p negative, win every min slot,
    // and silently collapse all signatures to "near-identical" — fail
    // fast instead (callers pmod their base hash into [0, p))
    require(h >= 0 && h < p, s"minhash input hash out of [0, $p): $h")
    var i = 0
    while (i < n) {
      val v = (a(i) * h + b(i)) % p
      if (v < buf(i)) buf(i) = v
      i += 1
    }
    buf
  }

  override def merge(x: Array[Long], y: Array[Long]): Array[Long] = {
    var i = 0
    while (i < n) {
      if (y(i) < x(i)) x(i) = y(i)
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

private object ExpressionEncoderHelper {
  import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
  val longArray: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
}
