package graft

import graft.queries.Registry

/** Plan-shape audit for the round-11 additions: the operators whose
  * naive formulation would degrade at scale must plan the shape they
  * were designed for — keyed equijoins (never a nested loop over the
  * corpus), TakeOrdered slices (never a global sort of the
  * vocabulary), and bounded fan-in aggregates.
  */
class NewOpsPlanSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def plan(name: String): String =
    Registry.all(name).build(spark, dir).queryExecution.executedPlan.toString

  test("q_attribution_linear: bounded-lookback pairing is a keyed equijoin") {
    val p = plan("q_attribution_linear")
    assert(!p.contains("CartesianProduct"),
      "linear attribution plans a CartesianProduct")
    assert(!p.contains("BroadcastNestedLoopJoin"),
      "linear attribution degrades to a nested loop — the windowJoin " +
        "bucketing must make it an equijoin")
  }

  test("q_zipf: top-1000 slice is a TakeOrdered, never a global vocabulary sort") {
    val p = plan("q_zipf")
    assert(p.contains("TakeOrderedAndProject"),
      "q_zipf must slice the vocabulary with TakeOrdered")
  }

  test("q_seq_support: pair mining joins the keyed summaries, no nested loop") {
    val p = plan("q_seq_support")
    assert(!p.contains("CartesianProduct"),
      "sequence support plans a CartesianProduct")
    // exactly one nested-loop is legitimate: the 1-row user-count
    // scalar crossJoin. The per-user A×B pairing itself must be a
    // keyed join — a second BNLJ means the summary self-join degraded.
    val bnlj = "BroadcastNestedLoopJoin".r.findAllIn(p).size
    assert(bnlj <= 1, s"$bnlj nested loops — the per-user summary " +
      "self-join must be a keyed equijoin")
    assert(p.contains("user_id"), "pairing join key missing from plan")
  }

  test("q_outliers_mad: per-source stats join back broadcast") {
    val p = plan("q_outliers_mad")
    assert(p.contains("BroadcastHashJoin"),
      "the med/MAD tables are group-cardinality — they must broadcast")
    assert(!p.contains("SortMergeJoin"),
      "a SortMergeJoin here shuffles the corpus twice for stats joins")
  }
}
