package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{
  Alias,
  AttributeReference,
  Cast,
  Expression,
  Literal,
  NamedExpression
}
import org.apache.spark.sql.catalyst.expressions.aggregate.{
  AggregateExpression,
  Count,
  Sum
}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan, Project}
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
  *  - the aggregate's child must be the registered relation (optionally
  *    under attribute-only Projects — the shapes column pruning makes);
  *  - grouping keys must be a non-empty subset of the summary's
  *    partition keys {account, dt} — grouping coarser than the
  *    partition grain re-aggregates partials ALGEBRAICALLY (sum of
  *    sums, sum of counts), which is exact; non-empty because a global
  *    aggregate over an empty base yields count=0 while a sum over an
  *    empty summary yields null;
  *  - aggregates must be count(1) (→ sum(n_rows)), sum(bytes∷long)
  *    (→ sum(sum_bytes)) or sum(packets∷long) (→ sum(sum_packets)),
  *    undistinct and unfiltered; the ∷long cast requirement keeps the
  *    rewrite type-preserving (partials are pre-widened to long).
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

  private def baseScan(p: LogicalPlan): Option[LogicalRelation] = p match {
    case l: LogicalRelation => Some(l)
    case Project(projList, child) if projList.forall(_.isInstanceOf[AttributeReference]) =>
      baseScan(child)
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

  private def rewrite(
      agg: Aggregate,
      groups: Seq[Expression],
      aggExprs: Seq[NamedExpression],
      child: LogicalPlan
  ): Option[LogicalPlan] = {
    val groupAttrs = groups.collect { case a: AttributeReference => a }
    if (groupAttrs.size != groups.size || groupAttrs.isEmpty) return None
    if (!groupAttrs.forall(a => PartitionKeys.contains(a.name))) return None
    val rel = baseScan(child).getOrElse(return None)
    val summary = MvRegistry.summaryFor(rootPaths(rel)).getOrElse(return None)
    val sOut: Map[String, AttributeReference] =
      summary.output.collect { case a: AttributeReference => a.name -> a }.toMap
    val needed = groupAttrs.map(_.name).toSet ++ Set("n_rows", "sum_bytes", "sum_packets")
    if (!needed.subsetOf(sOut.keySet)) return None

    def aggOver(colName: String): AggregateExpression =
      Sum(sOut(colName)).toAggregateExpression()

    val newGroups: Seq[Expression] = groupAttrs.map(a => sOut(a.name))
    val newAggExprs: Seq[NamedExpression] = aggExprs.map {
      case a: AttributeReference if groupAttrs.exists(_.exprId == a.exprId) =>
        Alias(sOut(a.name), a.name)(exprId = a.exprId)
      case al @ Alias(AggregateExpression(f, _, false, None, _), name) =>
        val mapped =
          if (isCountStar(f)) aggOver("n_rows")
          else if (isLongSumOf(f, "bytes")) aggOver("sum_bytes")
          else if (isLongSumOf(f, "packets")) aggOver("sum_packets")
          else return None
        Alias(mapped, name)(exprId = al.exprId)
      case _ => return None
    }
    Some(Aggregate(newGroups, newAggExprs, summary, None))
  }
}
