package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan, TakeOrderedAndProjectExec}
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.BroadcastExchangeExec
import org.apache.spark.sql.execution.joins.{BroadcastHashJoinExec, SortMergeJoinExec}

/** Physical-plan regression guards: the scale properties that were verified
  * by hand with .explain (SURVEY §4) are asserted here so a future refactor
  * can't silently lose them. These check plan SHAPE, not results — results
  * are the oracle's job.
  */
class PlanSpec extends SparkSpec {

  /** Shape assertions need the whole operator tree; AQE wraps finished
    * stages in QueryStageExec nodes that collect() can't see through, so
    * plan-shape tests run with AQE off (results are unaffected — the
    * oracle gate runs with AQE on).
    */
  /** Build AND execute inside the conf scope — QueryExecution reads the
    * session conf lazily at action time, so both must happen with AQE off.
    */
  private def executed(df: => DataFrame): SparkPlan =
    withPlanShapeConf()(executedPlan(df))

  private def q(name: String): DataFrame =
    SparkEntry.queries(name)(spark, sfDir)

  test("q_select_by_id_range: series AND time-range predicates reach the parquet scan") {
    val scan = executed(q("q_select_by_id_range"))
      .collectLeaves().collectFirst { case s: FileSourceScanExec => s }.get
    val pushed = scan.metadata.getOrElse("PushedFilters", "")
    assert(pushed.contains("EqualTo(user_id,7)"), s"series filter not pushed: $pushed")
    assert(pushed.contains("GreaterThanOrEqual(ts,"), s"range start not pushed: $pushed")
    assert(pushed.contains("LessThanOrEqual(ts,"), s"range end not pushed: $pushed")
  }

  test("q_scan_project: ReadSchema prunes to exactly the 3 selected columns") {
    val scan = executed(q("q_scan_project"))
      .collectLeaves().collectFirst { case s: FileSourceScanExec => s }.get
    val readSchema = scan.requiredSchema.fieldNames.toSet
    assert(readSchema === Set("l_orderkey", "l_linenumber", "l_extendedprice"),
      s"scan reads $readSchema")
  }

  test("q_orderby_limit plans as TakeOrderedAndProject (per-partition top-k, no global sort)") {
    val plan = executed(q("q_orderby_limit"))
    assert(plan.collect { case t: TakeOrderedAndProjectExec => t }.nonEmpty,
      s"expected TakeOrderedAndProject in:\n$plan")
  }

  test("q_join_broadcast: both dimension joins are broadcast-hash, fact side never exchanged before the join") {
    val plan = executed(q("q_join_broadcast"))
    val bhj = plan.collect { case j: BroadcastHashJoinExec => j }
    assert(bhj.length === 2, s"expected 2 broadcast joins, got ${bhj.length}")
    val bcasts = plan.collect { case b: BroadcastExchangeExec => b }
    assert(bcasts.nonEmpty)
  }

  test("q_join_shuffle: the pinned merge hint yields a sort-merge join") {
    val plan = executed(q("q_join_shuffle"))
    assert(plan.collect { case j: SortMergeJoinExec => j }.nonEmpty,
      s"expected SortMergeJoin in:\n$plan")
  }

  test("q_join_asof is a window pass: zero join operators of ANY kind in the plan") {
    import org.apache.spark.sql.execution.joins.{
      BaseJoinExec, BroadcastNestedLoopJoinExec, CartesianProductExec}
    val plan = executed(q("q_join_asof"))
    val joins = plan.collect {
      case j: BaseJoinExec => j // covers BHJ/SMJ/SHJ/BNLJ
      case j: CartesianProductExec => j
    }
    assert(joins.isEmpty, s"as-of must not plan a join, found ${joins.length}")
  }

  test("q_agg_hash: aggregation is two-phase (partial before the exchange)") {
    import org.apache.spark.sql.execution.aggregate.HashAggregateExec
    val plan = executed(q("q_agg_hash"))
    val aggs = plan.collect { case a: HashAggregateExec => a }
    assert(aggs.length >= 2, s"expected partial+final HashAggregate, got ${aggs.length}")
  }
}
