package graft

import graft.analytics.Relational

/** Plan-shape regression tests: the properties that matter at 100 TB —
  * column pruning, filter pushdown into the parquet scan, broadcast joins
  * for small dimensions — must survive refactors. */
class PlanSpec extends SparkSpec {

  private def planOf(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("scanProjectFilter pushes filters and prunes columns at the scan") {
    val plan = planOf(Relational.scanProjectFilter(spark, sfDir))
    assert(plan.contains("PushedFilters: [IsNotNull(l_quantity), IsNotNull(l_extendedprice)]"), plan)
    // pruned read schema — never all 16 lineitem columns
    val readSchema = plan.linesIterator.find(_.contains("ReadSchema")).get
    assert(!readSchema.contains("l_comment") && !readSchema.contains("l_suppkey"), readSchema)
  }

  test("joinRevenuePerNation broadcasts both dimension tables") {
    val plan = planOf(Relational.joinRevenuePerNation(spark, sfDir))
    assert("BroadcastHashJoin".r.findAllIn(plan).length === 2, plan)
    assert(!plan.contains("SortMergeJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("filterRangeSet pushes range and set predicates to the scan") {
    // (the rendered plan truncates long PushedFilters lists, so assert on
    // the range predicate and the untruncated DataFilters entry)
    val plan = planOf(Relational.filterRangeSet(spark, sfDir))
    assert(plan.contains("GreaterThanOrEqual(o_totalprice,1000.0)"), plan)
    assert(plan.contains("o_orderstatus#") && plan.contains("IN (F,O)"), plan)
  }

  test("groupCount is a two-phase hash aggregate (map-side partial)") {
    val plan = planOf(Relational.groupCount(spark, sfDir))
    assert("HashAggregate".r.findAllIn(plan).length >= 2, plan)
  }

  test("LSH ANN join is an equi hash join on the bucket key, not a cross product") {
    val plan = planOf(graft.similarity.Similarity.annLsh(spark, sfDir))
    assert(plan.contains("BroadcastHashJoin [bkt"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
  }
}
