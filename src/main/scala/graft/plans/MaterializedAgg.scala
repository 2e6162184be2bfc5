package graft.plans

import scala.collection.concurrent.TrieMap

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Alias, AttributeReference,
  Expression, Literal, NamedExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression,
  Count, Sum}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan,
  Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation,
  LogicalRelation}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, LongType}

/** Materialized aggregate views with transparent query rewrite — the
  * warehouse accelerator pattern: maintain a small pre-aggregated table
  * keyed on the base table's common grouping columns, and let the
  * OPTIMIZER answer matching aggregations from it, so a 100 TB fact scan
  * becomes a scan of (cardinality-of-keys) rows. The query text does not
  * change; registration is the opt-in.
  *
  * Exactness is non-negotiable (the engine's de-floating discipline), so
  * the scope is exactly what re-aggregates losslessly:
  *  - measures: `count(*)`/`count(1)` (→ Σ of partial counts) and
  *    `sum(col)` over INTEGRAL columns (→ Σ of partial sums — integer
  *    addition is associative, and Sum(long)'s result type is LongType at
  *    both levels so the output schema is bit-identical; float partials
  *    would re-aggregate in a different order, and decimal partials
  *    re-widen the precision — both refused at [[create]] time);
  *  - grouping keys: any SUBSET of the view's key columns (a coarser
  *    group-by re-aggregates the partials; this is why the partial count
  *    rides along);
  *  - the aggregate must sit DIRECTLY over the base relation (or a pure
  *    column-pruning Project) — a Filter between them would need
  *    containment reasoning this rule deliberately does not claim.
  *
  * The rewrite preserves every output attribute's name and ExprId (group
  * keys re-alias the view's columns under the original ids), so parent
  * plans re-resolve nothing.
  *
  * Staleness is the caller's contract, as with every materialized view:
  * [[create]] (re)builds the view from the base table; a base write
  * without a matching re-create serves stale results — call sites own
  * that cadence (the reference pipeline's idempotent-overwrite stages
  * would re-create after each Combine).
  */
object MaterializedAgg {

  /** A registered view: base parquet path → (view path, keys, summed
    * source columns). */
  private[plans] case class MvDef(mvPath: String, keys: Seq[String],
      sumCols: Seq[String])

  private val registry = TrieMap.empty[String, MvDef]

  /** Canonical registry key: scheme + authority + path. Stripping to the
    * bare path would collide `s3a://bucketA/data` with `file:/data` (or two
    * buckets sharing a prefix) and serve one table's view for the other's
    * query; schemeless registrations and Hadoop's `file:/…` root-path
    * rendering must still meet, so an absent scheme defaults to `file`. */
  private def norm(p: String): String = {
    val uri = new Path(p).toUri
    val scheme = Option(uri.getScheme).getOrElse("file")
    val auth = Option(uri.getAuthority).getOrElse("")
    s"$scheme://$auth${uri.getPath.stripSuffix("/")}"
  }

  /** Build (overwrite) the view parquet from the CURRENT base table state
    * and register it for rewriting: one row per distinct key combination,
    * with `__mv_n` (partial count) and `__mv_sum_<col>` partial sums. */
  def create(spark: SparkSession, basePath: String, keys: Seq[String],
      sumCols: Seq[String], mvPath: String): Unit = {
    require(keys.nonEmpty, "at least one key column")
    val base = spark.read.parquet(basePath)
    sumCols.foreach { c =>
      val ok = base.schema(c).dataType match {
        case LongType | IntegerType => true
        case _ => false
      }
      require(ok, s"sum column $c must be integral: float partials would " +
        "re-aggregate in a different order, decimal partials re-widen " +
        "the result precision")
    }
    base.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("__mv_n"),
        sumCols.map(c => sum(col(c)).as(s"__mv_sum_$c")): _*)
      .write.mode("overwrite").parquet(mvPath)
    registry.put(norm(basePath), MvDef(mvPath, keys, sumCols))
  }

  /** Drop a registration (the files stay). */
  def drop(basePath: String): Unit = registry.remove(norm(basePath))

  private[plans] def lookup(basePath: String): Option[MvDef] =
    registry.get(norm(basePath))

  /** The rewrite rule (registered alongside [[ApproxDistinctRewrite]]). */
  case class Rewrite() extends Rule[LogicalPlan] {

    private def baseOf(plan: LogicalPlan): Option[MvDef] =
      plan match {
        case lr: LogicalRelation => lr.relation match {
          // single-root relations only: a multi-path scan (read.parquet(a, b))
          // that merely CONTAINS the registered base must not be answered
          // from the base's view — the other paths' rows would vanish
          case fs: HadoopFsRelation if fs.location.rootPaths.size == 1 =>
            lookup(norm(fs.location.rootPaths.head.toString))
          case _ => None
        }
        case Project(projList, child)
            if projList.forall(_.isInstanceOf[AttributeReference]) =>
          baseOf(child)
        case _ => None
      }

    private def isCountStar(e: Expression): Boolean = e match {
      case Count(Seq(Literal(_, _))) => true
      case Count(Seq()) => true
      case _ => false
    }

    override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
      // groupExprs must be non-empty: a GLOBAL count(*) over an empty base
      // must return 0, but the rewritten Sum of partial counts over the
      // (zero-row) view would return NULL — grouped aggregates cannot hit
      // this (a group only exists where base rows exist, so the partials
      // a group re-aggregates are never empty)
      case agg @ Aggregate(groupExprs, aggExprs, child, hint)
          if groupExprs.nonEmpty =>
        baseOf(child) match {
          case None => agg
          case Some(mv) => rewriteOrKeep(agg, groupExprs, aggExprs, hint, mv)
        }
    }

    private def rewriteOrKeep(agg: Aggregate, groupExprs: Seq[Expression],
        aggExprs: Seq[NamedExpression],
        hint: Option[org.apache.spark.sql.catalyst.plans.logical.AggregateHint],
        mv: MvDef): LogicalPlan = {
        val groupNames = groupExprs.map {
          case a: AttributeReference => Some(a.name)
          case _ => None
        }
        // every aggregate output must be a group key attribute or an
        // Alias over exactly one rewritable AggregateExpression
        val rewritable = groupNames.forall(_.exists(mv.keys.contains)) &&
          aggExprs.forall {
            case a: AttributeReference => groupNames.contains(Some(a.name))
            case Alias(AggregateExpression(f, _, false, None, _), _) =>
              f match {
                case c: Count => isCountStar(c)
                case Sum(a: AttributeReference, _) =>
                  mv.sumCols.contains(a.name)
                case _ => false
              }
            case _ => false
          }
        if (!rewritable) agg
        else {
          val spark = SparkSession.active
          val mvPlan = spark.read.parquet(mv.mvPath).queryExecution.analyzed
          val mvAttr = mvPlan.output.map(a => a.name -> a).toMap
          val newGroup = groupExprs.map {
            case a: AttributeReference => mvAttr(a.name)
          }
          val newAggs: Seq[NamedExpression] = aggExprs.map {
            case a: AttributeReference =>
              Alias(mvAttr(a.name), a.name)(exprId = a.exprId)
            case al @ Alias(ae @ AggregateExpression(f, _, _, _, _), name) =>
              val src = f match {
                case c: Count if isCountStar(c) => mvAttr("__mv_n")
                case Sum(a: AttributeReference, _) =>
                  mvAttr(s"__mv_sum_${a.name}")
              }
              // Sum(long partial counts) widens to LongType like Count;
              // Sum(sum-typed partials) keeps the original Sum's type
              Alias(
                ae.copy(aggregateFunction = Sum(src)),
                name)(exprId = al.exprId)
          }
          Aggregate(newGroup, newAggs, mvPlan, hint)
        }
    }
  }
}
