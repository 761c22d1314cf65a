package graft.queries

import graft.SparkSpec
import graft.SparkEntry

/** Plan-shape regression guards: the scale properties that make these
  * queries survive a 100× scale-up are asserted against the physical plan,
  * so a refactor that silently loses a pushdown or a broadcast fails CI.
  */
class PlanSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sf).queryExecution.executedPlan.toString

  test("r4: not-null filter reaches the parquet scan; projection pruned to 2 columns") {
    val p = plan("r4_group_avg")
    assert(p.contains("PushedFilters: [IsNotNull(event_type)]"))
    assert(p.contains("ReadSchema: struct<event_type:string,value:double>"))
    assert(p.contains("partial_sum"), "aggregate must be two-phase (map-side partial)")
  }

  test("x1: both dimension joins broadcast — fact side never shuffles") {
    val p = plan("x1_join_broadcast")
    assert("BroadcastHashJoin".r.findAllIn(p).size == 2)
    assert(!p.contains("SortMergeJoin"))
  }

  test("x3: anti join planned as broadcast/shuffle anti, with status filter pushed") {
    val p = plan("x3_join_anti")
    assert(p.contains("LeftAnti"))
    assert(p.contains("EqualTo(o_orderstatus,P)"), "status filter must reach the scan")
  }

  test("r6/x9: top-k plans as TakeOrderedAndProject, not a full global sort") {
    assert(plan("r6_topk").contains("TakeOrderedAndProject"))
    assert(plan("x9_text_tokens").contains("TakeOrderedAndProject"))
  }

  test("x11: native float_dot expression in the plan (no higher-order zip_with)") {
    val p = plan("x11_cosine_topk")
    assert(p.contains("float_dot"))
    assert(!p.contains("zip_with"))
  }

  test("x21: bucket pruning join is a broadcast of the 1-row query side") {
    val p = plan("x21_ann_bucketed")
    assert(p.contains("BroadcastHashJoin"))
  }

  test("x22: as-of join is one window pass — no inequality (NestedLoop/Cartesian) join") {
    val p = plan("x22_asof_join")
    assert(p.contains("RunningWindowFunction") || p.contains("Window"))
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"))
  }

  test("r2: the whole DQ profile is a single aggregation job") {
    val p = plan("r2_dq_profile")
    // one partial+final agg pair over one scan — no join, no second scan
    assert("FileScan parquet".r.findAllIn(p).size <= 1)
  }
}
