package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** The Jaro-Winkler similarity loop, as a plain static method so the
  * generated code can call it directly (a matching algorithm with two
  * flag arrays is too stateful to inline as an expression string; a
  * static call keeps the expression inside whole-stage codegen with no
  * boxing or virtual dispatch — the same shape Spark's own string
  * expressions use for their UTF8String helpers).
  *
  * Semantics pinned to the textbook definition (Winkler '90) AND
  * bit-verified against DuckDB's `jaro_winkler_similarity` (the q121
  * oracle): match window ⌊max/2⌋−1, transpositions = half the
  * out-of-order matches, jaro = (m/l1 + m/l2 + (m−t)/m)/3 in exactly
  * that operand order, prefix boost j + ℓ·0.1·(1−j) with ℓ = common
  * prefix capped at 4 applied only when j > 0.7, and EITHER input
  * empty → 0.0 (DuckDB returns 0.0 even for ""≡"" — pinned by
  * JaroWinklerSpec, not special-cased to 1).
  *
  * Operates on UTF-16 code units of the decoded string; supplementary-
  * plane code points count as two units (the gate corpus is ASCII —
  * identical to DuckDB's byte-wise view there).
  */
object JaroWinklerImpl {

  def sim(lu: UTF8String, ru: UTF8String): Double = {
    val s1 = lu.toString
    val s2 = ru.toString
    val l1 = s1.length
    val l2 = s2.length
    if (l1 == 0 || l2 == 0) return 0.0
    // clamp at 0: for max-length-1 pairs ⌊max/2⌋−1 is −1, which would
    // forbid ANY match and score sim("a","a")=0.0; DuckDB's
    // jaro_winkler_similarity('a','a') is 1.0 (the oracle), so a zero
    // window (exact-position matches only) is the correct floor —
    // max=2 already yields window 0, so only 1-char pairs are affected
    val window = math.max(0, math.max(l1, l2) / 2 - 1)
    val f1 = new Array[Boolean](l1)
    val f2 = new Array[Boolean](l2)
    var m = 0
    var i = 0
    while (i < l1) {
      val lo = math.max(0, i - window)
      val hi = math.min(i + window + 1, l2)
      var j = lo
      var done = false
      while (j < hi && !done) {
        if (!f2(j) && s1.charAt(i) == s2.charAt(j)) {
          f1(i) = true; f2(j) = true; m += 1; done = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    var t = 0
    var k = 0
    i = 0
    while (i < l1) {
      if (f1(i)) {
        while (!f2(k)) k += 1
        if (s1.charAt(i) != s2.charAt(k)) t += 1
        k += 1
      }
      i += 1
    }
    t /= 2
    val md = m.toDouble
    val jaro = (md / l1 + md / l2 + (md - t) / md) / 3.0
    if (jaro <= 0.7) return jaro
    var l = 0
    val pmax = math.min(4, math.min(l1, l2))
    while (l < pmax && s1.charAt(l) == s2.charAt(l)) l += 1
    jaro + l * 0.1 * (1.0 - jaro)
  }
}

/** Codegen'd Jaro-Winkler similarity over two string columns — the
  * fuzzy-match scorer for entity resolution / master-data linkage
  * (q121). Null-in null-out; otherwise always a double in [0, 1].
  */
case class JaroWinkler(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires string, got ${left.dataType.sql}"
      )
    else if (right.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires string, got ${right.dataType.sql}"
      )
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = left.nullable || right.nullable

  override def nullSafeEval(l: Any, r: Any): Any =
    JaroWinklerImpl.sim(l.asInstanceOf[UTF8String], r.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(
      ctx,
      ev,
      (a, b) => s"graft.functions.JaroWinklerImpl.sim($a, $b)"
    )

  override protected def withNewChildrenInternal(
      newLeft: Expression,
      newRight: Expression
  ): Expression = copy(left = newLeft, right = newRight)

  override def prettyName: String = "graft_jaro_winkler"
}
