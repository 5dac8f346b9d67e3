package graft.tools

import org.scalatest.funsuite.AnyFunSuite

/** Pins the textual plan-count extraction PLANS.json is built from.
  * Pure-function tests on synthetic plan dumps — no SparkSession. The
  * regexes parse the user-facing `.explain` vocabulary, so each pitfall
  * they were written around gets its own assertion: `Exchange ` must not
  * match inside `BroadcastExchange`/`ReusedExchange`, codegen stars are
  * counted per member NODE (span ids are AQE-nondeterministic — see
  * PlanAudit scaladoc), and only non-empty `PushedFilters: [...]` count.
  */
class PlanAuditSpec extends AnyFunSuite {

  test("shuffle exchanges exclude Broadcast/Reused exchanges") {
    val plan =
      """AdaptiveSparkPlan isFinalPlan=true
        |+- Exchange hashpartitioning(k#1, 32), ENSURE_REQUIREMENTS
        |   +- BroadcastExchange HashedRelationBroadcastMode(List(k#2))
        |      +- ReusedExchange [k#3], Exchange hashpartitioning(k#1, 32)
        |""".stripMargin
    val c = PlanAudit.countsOf(plan)
    // the ReusedExchange line names its source "Exchange hashpartitioning"
    // after the comma — that reference is a reuse, but the regex counts
    // the "Exchange " token itself, so document the convention: reused
    // shuffles re-count. Here: 1 real + 1 referenced = 2.
    assert(c.shuffleExchanges == 2)
    assert(c.broadcastExchanges == 1)
  }

  test("join kinds are counted independently") {
    val plan =
      """*(3) BroadcastHashJoin [a#1], [b#2], Inner, BuildRight
        |+- SortMergeJoin [c#3], [d#4], LeftOuter
        |   +- ShuffledHashJoin [e#5], [f#6], Inner, BuildLeft
        |      +- BroadcastNestedLoopJoin BuildRight, Inner
        |         +- CartesianProduct
        |""".stripMargin
    val c = PlanAudit.countsOf(plan)
    assert(c.broadcastHashJoins == 1)
    assert(c.sortMergeJoins == 1)
    assert(c.shuffledHashJoins == 1)
    assert(c.nestedLoopJoins == 1)
    assert(c.cartesianProducts == 1)
  }

  test("codegen membership counts starred nodes, not span ids") {
    // two spans (ids 1 and 2) with three member nodes total: the audit
    // signal is 3 — a node falling OUT of codegen changes it, a span
    // merely splitting does not.
    val plan =
      """*(2) HashAggregate(keys=[k#1], functions=[sum(v#2)])
        |+- *(2) Project [k#1, v#2]
        |   +- Exchange hashpartitioning(k#1, 32)
        |      +- *(1) Filter isnotnull(k#1)
        |""".stripMargin
    assert(PlanAudit.countsOf(plan).codegenNodes == 3)
  }

  test("only scans with non-empty PushedFilters count as pushed") {
    val plan =
      """FileScan parquet [a#1] ... PushedFilters: [IsNotNull(a)], ReadSchema: ...
        |FileScan parquet [b#2] ... PushedFilters: [], ReadSchema: ...
        |""".stripMargin
    val c = PlanAudit.countsOf(plan)
    assert(c.parquetScans == 2)
    assert(c.scansWithPushedFilters == 1)
  }

  test("maxScanCols is the widest ReadSchema; decimal commas don't count") {
    val plan =
      """FileScan parquet ... ReadSchema: struct<l_quantity:decimal(12,2),l_orderkey:bigint>
        |FileScan parquet ... ReadSchema: struct<a:bigint,b:string,c:double,d:timestamp_ntz>
        |""".stripMargin
    assert(PlanAudit.countsOf(plan).maxScanCols == 4)
    assert(PlanAudit.countsOf("no scans here").maxScanCols == 0)
  }

  test("a truncated (unterminated) ReadSchema never gobbles the next scan's") {
    // Spark cuts metadata at maxMetadataStringLength with no closing '>':
    // the wide scan must contribute nothing, not absorb the next line
    val plan =
      """FileScan parquet ... ReadSchema: struct<a:bigint,b:string,c:dou
        |FileScan parquet ... ReadSchema: struct<x:bigint,y:string>
        |""".stripMargin
    assert(PlanAudit.countsOf(plan).maxScanCols == 2)
  }

  test("empty-relation collapse is counted (the too-small-SF canary)") {
    val plan =
      """*(2) HashAggregate(keys=[], functions=[partial_sum(x#1)])
        |+- *(2) EmptyRelation [plan_id=80]
        |   +- EmptyRelation Join Inner, (a#1 = b#2)
        |""".stripMargin
    assert(PlanAudit.countsOf(plan).emptyRelations == 2)
  }

  test("streamCountsOf: stateful operators counted from micro-batch plans") {
    val plan =
      """*(4) StateStoreSave [user_id#1L, window#2], state info [...], Update
        |+- StateStoreRestore [user_id#1L, window#2], state info [...]
        |   +- StreamingDeduplicateWithinWatermark [k#3], state info [...]
        |      +- StreamingSymmetricHashJoin [p_user#4L], [c_user#5L], Inner
        |         +- FlatMapGroupsWithState f, keys: [g#6], Update
        |            +- SessionWindowStateStoreSave [u#7L], session window...
        |""".stripMargin
    val s = StreamPlanAudit.streamCountsOf(plan)
    assert(s.stateStoreSaves == 1)
    assert(s.stateStoreRestores == 1)
    // the WithinWatermark variant counts as a dedup (prefix match, by design)
    assert(s.streamingDedups == 1)
    assert(s.symmetricHashJoins == 1)
    assert(s.flatMapGroupsWithState == 1)
    assert(s.sessionWindowStores == 1)
  }

  test("finalPlanText drops the echoed initial plan") {
    val full =
      """AdaptiveSparkPlan isFinalPlan=true
        |+- *(1) Filter isnotnull(k#1)
        |+- == Initial Plan ==
        |   SortMergeJoin [a#1], [b#2], Inner
        |""".stripMargin
    val finalPart = full.split("== Initial Plan ==")(0)
    assert(PlanAudit.countsOf(finalPart).sortMergeJoins == 0)
    assert(PlanAudit.countsOf(full).sortMergeJoins == 1)
  }
}
