package graft.plans

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate._
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DataType

/** Materialized-rollup registry + the query-rewrite rule that serves
  * matching aggregates from the rollup instead of the base table — the
  * classic MV answer path: a 100 TB fact table's daily dashboard
  * queries collapse to a scan of a |groups|-row summary, and queries at
  * COARSER granularity re-aggregate the summary (count → Σcnt,
  * sum → Σsum; both exact), never the facts.
  *
  * Registration is explicit and path-anchored: [[MaterializedViews.build]]
  * writes `SELECT groupCols, count(*) AS __cnt, sum(measureᵢ) AS __sum_i
  * GROUP BY groupCols` to parquet, and [[MaterializedViews.register]]
  * records (source rootPaths → MV relation + column map). The rewrite
  * ([[RewriteToMv]], installed via `extraOptimizations` or
  * `GraftExtensions`) is CONSERVATIVE — it fires only when every piece
  * is provably answerable from the rollup, and leaves the plan
  * untouched otherwise:
  *
  *   - the aggregate's child is the registered base relation (bare or
  *     under a column-pruning Project — no Filter, no join);
  *   - every grouping expression is a bare column from the rollup's
  *     grouping set (any SUBSET: coarser rollups re-aggregate);
  *   - every aggregate call is `count(*)`/`count(1)` or a `sum` whose
  *     argument structurally equals a registered measure (bare column
  *     or CAST(column AS t) with the same t); no DISTINCT, no FILTER;
  *   - output names, exprIds, and types are preserved exactly (the
  *     re-aggregated sum is cast back to the original sum's result
  *     type — exact for decimals within precision), so parent plan
  *     references never dangle and results are bit-identical.
  */
object MaterializedViews {

  /** One registered rollup. `sumCols` keys are "col" or "col:castSql". */
  final case class MvDef(
      sourcePaths: Set[String],
      relation: LogicalRelation,
      groupCols: Set[String],
      sumCols: Map[String, String])

  private val registry = new java.util.concurrent.CopyOnWriteArrayList[MvDef]

  def defs: Seq[MvDef] = { import scala.jdk.CollectionConverters._
    registry.asScala.toSeq }

  /** Measure key for a sum argument: bare column or single cast. */
  private[plans] def measureKey(e: Expression): Option[String] = e match {
    case a: AttributeReference => Some(a.name)
    case Cast(a: AttributeReference, dt, _, _) => Some(s"${a.name}:${dt.sql}")
    case _ => None
  }

  private def rootPaths(lr: LogicalRelation): Set[String] = lr.relation match {
    case fs: HadoopFsRelation => fs.location.rootPaths.map(_.toString).toSet
    case _ => Set.empty
  }

  /** Build + write the rollup parquet for `sourcePath` grouped by
    * `groupCols` with `count(*)` and the given sum measures (each a
    * SQL expression string that must be a bare column or a single
    * CAST of one). Returns the measure keys in order. */
  def build(spark: SparkSession, sourcePath: String, mvPath: String,
      groupCols: Seq[String], sumMeasures: Seq[String]): Seq[String] = {
    val src = spark.read.parquet(sourcePath)
    val keys = sumMeasures.map { m =>
      val e = src.selectExpr(m).queryExecution.analyzed
        .expressions.head.children.headOption
        .getOrElse(src.selectExpr(m).queryExecution.analyzed.expressions.head)
      measureKey(e match { case al: Alias => al.child; case other => other })
        .getOrElse(sys.error(
          s"MaterializedViews.build: measure must be a column or CAST(col), got $m"))
    }
    val aggs = count(lit(1)).as("__cnt") +:
      sumMeasures.zipWithIndex.map { case (m, i) =>
        sum(expr(m)).as(s"__sum_$i") }
    src.groupBy(groupCols.map(col): _*).agg(aggs.head, aggs.tail: _*)
      .write.mode("overwrite").parquet(mvPath)
    keys
  }

  /** Register a built rollup for rewriting. Idempotent per (source,
    * mv) pair. */
  def register(spark: SparkSession, sourcePath: String, mvPath: String,
      groupCols: Seq[String], sumKeys: Seq[String]): Unit = {
    val srcLr = spark.read.parquet(sourcePath).queryExecution.analyzed
      .collectFirst { case lr: LogicalRelation => lr }
      .getOrElse(sys.error("MaterializedViews.register: source is not a file relation"))
    val mvLr = spark.read.parquet(mvPath).queryExecution.analyzed
      .collectFirst { case lr: LogicalRelation => lr }
      .getOrElse(sys.error("MaterializedViews.register: MV is not a file relation"))
    val d = MvDef(rootPaths(srcLr), mvLr, groupCols.toSet,
      sumKeys.zipWithIndex.map { case (k, i) => k -> s"__sum_$i" }.toMap)
    if (!defs.exists(x => x.sourcePaths == d.sourcePaths &&
        rootPaths(x.relation) == rootPaths(mvLr))) { registry.add(d); () }
  }

  def clear(): Unit = registry.clear()

  /** Install the rewrite into a live session (idempotent). Cluster
    * deployments get it from `GraftExtensions` instead. */
  def install(spark: SparkSession): Unit =
    if (!spark.experimental.extraOptimizations.exists(_ eq RewriteToMv))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ RewriteToMv

  private[plans] def findFor(lr: LogicalRelation): Option[MvDef] = {
    val paths = rootPaths(lr)
    defs.find(d => d.sourcePaths.nonEmpty && d.sourcePaths == paths)
  }
}

/** The rewrite rule — see [[MaterializedViews]]. Runs as an extra
  * optimizer batch, after pruning, so it sees the settled
  * Aggregate → (Project) → LogicalRelation shape. */
object RewriteToMv extends Rule[LogicalPlan] {
  import MaterializedViews._

  private object MatchAbort extends Exception { override def fillInStackTrace(): Throwable = this }

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (MaterializedViews.defs.isEmpty) plan
    else plan.transformUp {
      case agg @ Aggregate(groupExprs, aggExprs, child, _) =>
        val base = child match {
          case lr: LogicalRelation => Some(lr)
          case Project(pl, lr: LogicalRelation)
              if pl.forall(_.isInstanceOf[AttributeReference]) => Some(lr)
          case _ => None
        }
        base.flatMap(findFor).flatMap(rewrite(agg, groupExprs, aggExprs, _))
          .getOrElse(agg)
    }

  private def rewrite(agg: Aggregate, groupExprs: Seq[Expression],
      aggExprs: Seq[NamedExpression], mv: MvDef): Option[Aggregate] = {
    // fresh attribute ids per use-site, so one MV can serve several
    // aggregates in the same query tree
    val fresh = mv.relation.newInstance()
    val byName = fresh.output.map(a => a.name -> a).toMap
    def groupAttr(e: Expression): Option[Attribute] = e match {
      case a: AttributeReference if mv.groupCols.contains(a.name) =>
        byName.get(a.name)
      case _ => None
    }
    try {
      val newGroups = groupExprs.map(e =>
        groupAttr(e).getOrElse(throw MatchAbort))
      val cnt = byName.getOrElse("__cnt", throw MatchAbort)
      def rewriteAggFn(ae: AggregateExpression): Expression = {
        if (ae.isDistinct || ae.filter.isDefined) throw MatchAbort
        ae.aggregateFunction match {
          case Count(Seq(Literal(1, _))) | Count(Seq()) =>
            // count over base = exact sum of per-group counts; Sum(long)
            // is long-typed like Count, no cast needed
            ae.copy(aggregateFunction = Sum(cnt))
          case s @ Sum(arg, _) =>
            val key = measureKey(arg).getOrElse(throw MatchAbort)
            val mvCol = mv.sumCols.get(key).flatMap(byName.get)
              .getOrElse(throw MatchAbort)
            val reAgg = ae.copy(aggregateFunction = Sum(mvCol))
            // exact re-aggregation, cast back to the original result
            // type (decimal precision widens one more level in the MV)
            if (reAgg.dataType == s.dataType) reAgg
            else Cast(reAgg, s.dataType)
          case _ => throw MatchAbort
        }
      }
      val newAggExprs = aggExprs.map { ne =>
        val rewritten = ne match {
          case a: AttributeReference =>
            Alias(groupAttr(a).getOrElse(throw MatchAbort), a.name)(
              exprId = a.exprId, qualifier = a.qualifier)
          case al @ Alias(childExpr, name) =>
            // manual recursion: an AggregateExpression is rewritten as a
            // unit (its argument names a MEASURE, not a group column);
            // everywhere else only group-column references may appear
            def rewriteExpr(e: Expression): Expression = e match {
              case ae: AggregateExpression => rewriteAggFn(ae)
              case a: AttributeReference =>
                groupAttr(a).getOrElse(throw MatchAbort)
              case other => other.mapChildren(rewriteExpr)
            }
            Alias(rewriteExpr(childExpr), name)(exprId = al.exprId,
              qualifier = al.qualifier, explicitMetadata = al.explicitMetadata)
          case _ => throw MatchAbort
        }
        rewritten.asInstanceOf[NamedExpression]
      }
      logInfo(s"RewriteToMv: served ${agg.groupingExpressions.map(_.sql)} " +
        s"aggregate from rollup ${rootOf(mv)}")
      Some(Aggregate(newGroups, newAggExprs, fresh, None))
    } catch { case MatchAbort => None }
  }

  private def rootOf(mv: MvDef): String = mv.relation.relation match {
    case fs: HadoopFsRelation => fs.location.rootPaths.headOption
      .map(_.toString).getOrElse("?")
    case _ => "?"
  }
}
