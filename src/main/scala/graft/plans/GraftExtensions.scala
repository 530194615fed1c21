package graft.plans

import graft.functions.{FloatVectorCosine, FloatVectorDot, FloatVectorNormalize}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer rule: cosine similarity is invariant under per-argument
  * scaling, so `float_vector_cosine(normalize(a), normalize(b))` (either
  * side, nested arbitrarily) computes the same value as
  * `float_vector_cosine(a, b)` — the normalization work (a full pass plus
  * a materialized array per row) is pure waste. This folds it away.
  *
  * Why this is safe:
  *  - Values: cosine divides by both norms itself, so the folded form is
  *    the mathematically identical — and strictly MORE precise — value:
  *    it skips normalize's per-element narrowing to float32. The two
  *    forms can differ by up to float32 rounding (~1e-7 relative; bound
  *    asserted against a driver-side reference in ExtensionRuleSpec),
  *    the same approximation class as reassociating a sum. A deployment
  *    that needs the unfolded bits sets
  *    `spark.graft.simplifyNormalizedCosine=false` (checked per
  *    invocation, so it can be flipped per session or per query without
  *    dropping the extension class — and without losing any other rule
  *    GraftExtensions registers).
  *  - Nulls: `normalize(a)` is null exactly when `a` has a null element
  *    or zero norm — precisely the inputs for which `cosine(a, …)` is
  *    already null. The rewrite therefore never changes the null surface.
  *
  * At 100 TB this pattern is common and expensive: pipelines store
  * unit-normalized embeddings "to make cosine cheaper", then call a
  * cosine kernel that normalizes anyway — O(rows · dim) of redundant
  * multiply-adds plus one transient array allocation per row, eliminated
  * at plan time.
  *
  * The rule is idempotent (the guard only fires while a normalize child
  * remains), so running inside the operator-optimization fixpoint batch
  * is fine.
  */
object SimplifyNormalizedCosine extends Rule[LogicalPlan] {

  /** Runtime opt-out; `Rule`'s SQLConf is session-scoped, so a SET
    * command flips this mid-session.
    */
  val EnabledKey = "spark.graft.simplifyNormalizedCosine"

  private def strip(e: Expression): Expression = e match {
    case FloatVectorNormalize(c) => strip(c)
    case other                   => other
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    // lenient parse: only the literal "false" disables the fold — a
    // malformed value must not make every optimizer invocation throw an
    // error that never names this conf key
    if (conf.getConfString(EnabledKey, "true").trim.equalsIgnoreCase("false")) plan
    else plan.transformAllExpressions {
      case FloatVectorCosine(l, r)
          if l.isInstanceOf[FloatVectorNormalize] ||
            r.isInstanceOf[FloatVectorNormalize] =>
        FloatVectorCosine(strip(l), strip(r))
      // the other common spelling of the same algebra: a dot product of
      // two unit-normalized vectors IS their cosine — fold the two
      // normalization passes into the cosine kernel's own divide. Only
      // when BOTH sides are normalized (a one-sided dot(normalize(a), b)
      // is a different value and stays untouched). Null surface is
      // unchanged for the same reason as the cosine fold.
      case FloatVectorDot(l: FloatVectorNormalize, r: FloatVectorNormalize) =>
        FloatVectorCosine(strip(l), strip(r))
    }
}

/** The engine's `SparkSessionExtensions` hook — where whole-plan
  * extensions (optimizer rules, strategies, custom parsers) register.
  * Wired into every session by `Sessions.local`; cluster deployments get
  * the same via `spark.sql.extensions=graft.plans.GraftExtensions`.
  *
  * Besides the optimizer rule, the codegen vector kernels register as
  * SQL functions (`float_vector_dot` / `float_vector_cosine` /
  * `float_vector_normalize`), so `spark.sql("…")` users — notebooks, JDBC,
  * SQL files — get the same tight primitive loops as the Column API,
  * including the normalize-fold rule over the SQL spelling.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectOptimizerRule(_ => SimplifyNormalizedCosine)
    e.injectOptimizerRule(_ => RewriteAggregateToSummary)
    e.injectPlannerStrategy(_ => AsOfJoinStrategy)
    GraftExtensions.functions.foreach(e.injectFunction)
  }
}

object GraftExtensions {

  private def description(
      name: String,
      clazz: Class[_],
      usage: String
  ): ExpressionInfo =
    new ExpressionInfo(clazz.getName, null, name, usage, "")

  private def binary(
      name: String,
      clazz: Class[_],
      usage: String,
      build: (Expression, Expression) => Expression
  ): (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (
      FunctionIdentifier(name),
      description(name, clazz, usage),
      (children: Seq[Expression]) => {
        if (children.length != 2)
          throw new IllegalArgumentException(
            s"$name expects 2 arguments (array<float>, array<float>), got ${children.length}"
          )
        build(children(0), children(1))
      }
    )

  /** The SQL registrations — one per codegen kernel, names identical to
    * the expressions' prettyName so plans read the same either way.
    */
  val functions: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] =
    Seq(
      binary(
        "float_vector_dot",
        classOf[FloatVectorDot],
        "_FUNC_(a, b) - dot product of two array<float> vectors (double; null on length mismatch).",
        FloatVectorDot.apply
      ),
      binary(
        "float_vector_cosine",
        classOf[FloatVectorCosine],
        "_FUNC_(a, b) - cosine similarity of two array<float> vectors (double; null on zero norm or length mismatch).",
        FloatVectorCosine.apply
      ),
      (
        FunctionIdentifier("float_vector_normalize"),
        description(
          "float_vector_normalize",
          classOf[FloatVectorNormalize],
          "_FUNC_(a) - unit-normalize an array<float> vector (null on zero norm)."
        ),
        (children: Seq[Expression]) => {
          if (children.length != 1)
            throw new IllegalArgumentException(
              s"float_vector_normalize expects 1 argument (array<float>), got ${children.length}"
            )
          FloatVectorNormalize(children.head)
        }
      ),
      (
        FunctionIdentifier("graft_nfc_normalize"),
        description(
          "graft_nfc_normalize",
          classOf[graft.functions.UnicodeNfc],
          "_FUNC_(s) - Unicode NFC canonical normalization of a string (codegen'd; already-NFC rows are returned without copying)."
        ),
        (children: Seq[Expression]) => {
          if (children.length != 1)
            throw new IllegalArgumentException(
              s"graft_nfc_normalize expects 1 argument (string), got ${children.length}"
            )
          graft.functions.UnicodeNfc(children.head)
        }
      ),
      // The bloom-filter pair InjectRuntimeFilter plants internally,
      // surfaced as SQL so the explicit pruning pattern (BloomJoin /
      // q75) is writable as a scalar subquery from pure spark.sql.
      // Both take PRE-HASHED int64 keys (xxhash64) per the aggregate's
      // contract; the analyzer wraps the bare AggregateFunction itself.
      (
        FunctionIdentifier("graft_bloom_filter_agg"),
        description(
          "graft_bloom_filter_agg",
          classOf[BloomFilterAggregate],
          "_FUNC_(xxhash64_key[, expected_items]) - build a bloom filter (binary) over pre-hashed int64 keys."
        ),
        (children: Seq[Expression]) =>
          children match {
            case Seq(key) => new BloomFilterAggregate(key)
            case Seq(key, nExp) =>
              // SQL integer literals parse as INT; the aggregate's type
              // check demands a foldable BIGINT — a foldable Cast
              // satisfies both and folds before execution
              new BloomFilterAggregate(
                key,
                org.apache.spark.sql.catalyst.expressions.Cast(
                  nExp,
                  org.apache.spark.sql.types.LongType
                )
              )
            case other =>
              throw new IllegalArgumentException(
                s"graft_bloom_filter_agg expects 1-2 arguments (xxhash64 key [, expected items]), got ${other.length}"
              )
          }
      ),
      (
        FunctionIdentifier("graft_might_contain"),
        description(
          "graft_might_contain",
          classOf[BloomFilterMightContain],
          "_FUNC_(bloom, xxhash64_key) - true if the pre-hashed key might be in the bloom filter (false = definitely absent)."
        ),
        (children: Seq[Expression]) => {
          if (children.length != 2)
            throw new IllegalArgumentException(
              s"graft_might_contain expects 2 arguments (bloom binary, xxhash64 key), got ${children.length}"
            )
          BloomFilterMightContain(children(0), children(1))
        }
      )
    )
}
