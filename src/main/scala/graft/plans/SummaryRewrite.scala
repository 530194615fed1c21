package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{
  Alias,
  AttributeReference,
  Cast,
  Divide,
  Expression,
  Literal,
  NamedExpression,
  PlanExpression
}
import org.apache.spark.sql.catalyst.expressions.aggregate.{
  AggregateExpression,
  Average,
  Count,
  Max,
  Min,
  Sum
}
import org.apache.spark.sql.catalyst.plans.logical.{
  Aggregate,
  Filter,
  LogicalPlan,
  Project
}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.types.LongType

/** Materialized-view registry: base-table root path → summary-table
  * path, plus a cached analyzed plan of the summary relation (resolved
  * once, `newInstance()`d per rewrite so attribute ids never collide
  * between — or within — query plans).
  *
  * Registration is an explicit contract: the caller asserts the summary
  * at `summaryPath` is a CURRENT per-(account, dt) `IncrementalAgg`
  * partials table of the base at `basePath` (q103's maintenance loop is
  * what keeps that true). The rewrite rule trusts the registry;
  * freshness is the registrant's responsibility, which is why the gate
  * (de)registers around its own maintained pair rather than anything
  * shared.
  */
object MvRegistry {

  private case class Entry(summaryPath: String, plan: LogicalRelation)

  @volatile private var mvs: Map[String, Entry] = Map.empty

  /** Path normalization for matching scan root paths (which arrive as
    * qualified `file:/…` Hadoop paths) against registered local paths.
    */
  private def normalize(p: String): String =
    new org.apache.hadoop.fs.Path(p).toUri.getPath.stripSuffix("/")

  def register(spark: SparkSession, basePath: String, summaryPath: String): Unit = {
    val analyzed = spark.read
      .parquet(summaryPath)
      .queryExecution
      .analyzed
      .collectFirst { case l: LogicalRelation => l }
      .getOrElse(
        throw new IllegalStateException(s"summary at $summaryPath is not a file relation")
      )
    synchronized {
      mvs += normalize(basePath) -> Entry(summaryPath, analyzed)
    }
  }

  def unregister(basePath: String): Unit =
    synchronized { mvs -= normalize(basePath) }

  def isEmpty: Boolean = mvs.isEmpty

  /** A FRESH-attribute-id copy of the summary relation for the base
    * scanned at exactly these root paths (single-root scans only).
    */
  private[plans] def summaryFor(rootPaths: Seq[String]): Option[LogicalRelation] =
    rootPaths match {
      case Seq(p) => mvs.get(normalize(p)).map(_.plan.newInstance())
      case _      => None
    }
}

/** Optimizer rule: rewrite an aggregate over a registered base table to
  * the equivalent aggregate over its maintained per-partition summary —
  * the materialized-view rewrite a 100 TB warehouse lives on. q103
  * maintains partition-grained partials (n_rows, sum_bytes,
  * sum_packets per (account, dt)) precisely so that the hot rollups
  * never rescan history; this rule closes the loop by letting the USER
  * QUERY keep addressing the base table while the plan reads the
  * catalog-sized summary: a scan of |partitions| rows replaces a scan
  * of the full store, turning an O(data) aggregate into an O(catalog)
  * one with byte-identical results.
  *
  * Soundness bounds (anything outside them leaves the plan untouched):
  *  - the aggregate's child must be the registered relation, optionally
  *    under attribute-only Projects (the shapes column pruning makes)
  *    and/or deterministic, subquery-free Filters referencing ONLY the
  *    partition keys {account, dt} — every summary row's keys equal its
  *    partials' group, so a partition-key predicate keeps exactly the
  *    partials of the surviving partitions (this is the pushed-down
  *    WHERE dt≥… / HAVING-on-keys shape; the predicate transplants onto
  *    the summary scan and prunes it the same way);
  *  - grouping keys must be a subset of the summary's partition keys
  *    {account, dt} — grouping coarser than the partition grain
  *    re-aggregates partials ALGEBRAICALLY (sum of sums, sum of counts,
  *    min of mins, max of maxes), which is exact. The GLOBAL (empty
  *    grouping) case is included since r12: the one empty-base mismatch
  *    — count yields 0 while a sum over the empty summary yields null —
  *    is closed by coalescing the count rewrites to 0; sums/min/max/avg
  *    are null over an empty input on both sides already;
  *  - aggregates must be count(1) (→ sum(n_rows)), sum(bytes∷long) /
  *    sum(packets∷long) (→ sums of pre-widened partials; the ∷long cast
  *    requirement keeps the rewrite type-preserving), count(bytes) /
  *    count(packets) (→ sums of the non-null-count partials),
  *    min/max(bytes|packets) (→ min/max of the same-typed partials), or
  *    avg(bytes|packets) (→ Σsum-partials ∷double / Σcount-partials
  *    ∷double — exactly Average's own evaluate expression, with the
  *    long total exact because per-row values are ints), all undistinct
  *    and unfiltered. Each mapped aggregate only requires ITS partial
  *    columns, so older narrower summaries keep rewriting the queries
  *    they can.
  *  - every replacement keeps the ORIGINAL output exprIds (grouping
  *    attrs re-aliased, aggregate aliases rebuilt), so parent operators
  *    never see the substitution.
  *
  * Idempotent by construction: the rewritten child scans the summary
  * path, which is never registered as a base. Disable per session with
  * `spark.graft.rewriteToSummary=false` (MvRewriteSpec's control pins
  * that the disabled plan scans the base and agrees value-for-value).
  */
object RewriteAggregateToSummary extends Rule[LogicalPlan] {

  val EnabledKey = "spark.graft.rewriteToSummary"

  private val PartitionKeys = Set("account", "dt")

  /** Peel attribute-only Projects and partition-key-only Filters off the
    * aggregate's child, returning the relation plus the collected filter
    * conditions (to transplant onto the summary scan).
    */
  private def baseScan(p: LogicalPlan): Option[(LogicalRelation, Seq[Expression])] =
    p match {
      case l: LogicalRelation => Some((l, Seq.empty))
      case Project(projList, child)
          if projList.forall(_.isInstanceOf[AttributeReference]) =>
        baseScan(child)
      case Filter(cond, child)
          if cond.deterministic &&
            !cond.exists(_.isInstanceOf[PlanExpression[_]]) &&
            cond.references.forall(a => PartitionKeys.contains(a.name)) =>
        baseScan(child).map { case (rel, fs) => (rel, cond +: fs) }
      case _ => None
    }

  private def rootPaths(l: LogicalRelation): Seq[String] = l.relation match {
    case fs: HadoopFsRelation => fs.location.rootPaths.map(_.toString)
    case _                    => Seq.empty
  }

  /** sum(x∷long) over the base column named `col` (cast optional when
    * the column is already long).
    */
  private def isLongSumOf(e: Expression, colName: String): Boolean = e match {
    case Sum(Cast(a: AttributeReference, LongType, _, _), _) => a.name == colName
    case Sum(a: AttributeReference, _) => a.name == colName && a.dataType == LongType
    case _                             => false
  }

  private def isCountStar(e: Expression): Boolean = e match {
    case Count(Seq(Literal(1, _))) => true
    case _                         => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (
      MvRegistry.isEmpty ||
      conf.getConfString(EnabledKey, "true").trim.equalsIgnoreCase("false")
    ) plan
    else
      plan.transformDown { case agg @ Aggregate(groups, aggExprs, child, _) =>
        rewrite(agg, groups, aggExprs, child).getOrElse(agg)
      }

  /** The summary partial backing each base column's min/max/avg/count. */
  private val MeasureCols = Set("bytes", "packets")

  private def rewrite(
      agg: Aggregate,
      groups: Seq[Expression],
      aggExprs: Seq[NamedExpression],
      child: LogicalPlan
  ): Option[LogicalPlan] = {
    val groupAttrs = groups.collect { case a: AttributeReference => a }
    if (groupAttrs.size != groups.size) return None
    if (!groupAttrs.forall(a => PartitionKeys.contains(a.name))) return None
    val global = groupAttrs.isEmpty
    val (rel, filters) = baseScan(child).getOrElse(return None)
    val summary = MvRegistry.summaryFor(rootPaths(rel)).getOrElse(return None)
    val sOut: Map[String, AttributeReference] =
      summary.output.collect { case a: AttributeReference => a.name -> a }.toMap
    if (!groupAttrs.forall(a => sOut.contains(a.name))) return None

    // each mapped aggregate requires only ITS partial columns — a
    // narrower summary (older build) keeps rewriting what it can and
    // bows out (whole-aggregate, never partially) of what it can't
    def sumOver(colName: String): Option[Expression] =
      sOut.get(colName).map(Sum(_).toAggregateExpression())
    // GLOBAL count over an empty base is 0; a sum over the empty summary
    // is null — coalesce closes the one empty-input mismatch (grouped
    // aggregates can't see an empty group: groups come from rows)
    def countOver(colName: String): Option[Expression] =
      sumOver(colName).map { s =>
        if (global)
          org.apache.spark.sql.catalyst.expressions
            .Coalesce(Seq(s, Literal(0L, LongType)))
        else s
      }
    def minMaxOver(isMin: Boolean, base: AttributeReference): Option[Expression] = {
      val partial = (if (isMin) "min_" else "max_") + base.name
      sOut.get(partial).filter(_.dataType == base.dataType).map { a =>
        (if (isMin) Min(a) else Max(a)).toAggregateExpression()
      }
    }
    // Average's own evaluate shape: exact long totals, one cast each,
    // one divide — value-identical to the unrewritten plan because the
    // per-row values are ints (every double partial sum is exact)
    def avgOver(base: AttributeReference): Option[Expression] =
      for {
        s <- sumOver("sum_" + base.name)
        n <- sumOver("n_" + base.name)
      } yield Divide(
        Cast(s, org.apache.spark.sql.types.DoubleType),
        Cast(n, org.apache.spark.sql.types.DoubleType),
        org.apache.spark.sql.catalyst.expressions.EvalMode.LEGACY
      )

    def mapped(f: Expression): Option[Expression] = f match {
      case _ if isCountStar(f)            => countOver("n_rows")
      case _ if isLongSumOf(f, "bytes")   => sumOver("sum_bytes")
      case _ if isLongSumOf(f, "packets") => sumOver("sum_packets")
      case Count(Seq(a: AttributeReference)) if MeasureCols.contains(a.name) =>
        countOver("n_" + a.name)
      case Min(a: AttributeReference) if MeasureCols.contains(a.name) =>
        minMaxOver(isMin = true, a)
      case Max(a: AttributeReference) if MeasureCols.contains(a.name) =>
        minMaxOver(isMin = false, a)
      case Average(a: AttributeReference, _)
          if MeasureCols.contains(a.name) &&
            (a.dataType == org.apache.spark.sql.types.IntegerType ||
              a.dataType == LongType) =>
        avgOver(a)
      case _ => None
    }

    val newGroups: Seq[Expression] = groupAttrs.map(a => sOut(a.name))
    val newAggExprs: Seq[NamedExpression] = aggExprs.map {
      case a: AttributeReference if groupAttrs.exists(_.exprId == a.exprId) =>
        Alias(sOut(a.name), a.name)(exprId = a.exprId)
      case al @ Alias(AggregateExpression(f, _, false, None, _), name) =>
        Alias(mapped(f).getOrElse(return None), name)(exprId = al.exprId)
      case _ => return None
    }
    // transplant the peeled partition-key predicates onto the summary:
    // summary rows carry exactly the base partitions' key values
    val newChild = filters.foldRight(summary: LogicalPlan) { (cond, acc) =>
      val remapped = cond.transform {
        case a: AttributeReference => sOut.getOrElse(a.name, return None)
      }
      Filter(remapped, acc)
    }
    Some(Aggregate(newGroups, newAggExprs, newChild, None))
  }
}
