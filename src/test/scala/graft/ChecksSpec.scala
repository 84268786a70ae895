package graft

import org.apache.spark.sql.functions._

import graft.operators.Checks
import graft.operators.Checks._

/** Data-quality constraint suite (`Checks.run`): planted violations of
  * every check kind produce exact (passed, total) counts, and the
  * row-local checks share one scan.
  */
class ChecksSpec extends SparkSpec {

  import spark.implicits._

  // 6 rows: one null key (breaks not_null + fk), one negative amount,
  // one duplicated id pair (breaks unique), one orphan fk (99)
  private def fact = Seq(
    (Some(1L), Some(10L), 5L),
    (Some(2L), Some(10L), -3L),
    (Some(3L), Some(20L), 7L),
    (Some(3L), Some(20L), 8L),
    (Some(4L), Some(99L), 1L),
    (Some(5L), None, 2L))
    .toDF("id", "cust", "amount")
    .select(col("id"), col("cust"), col("amount"))

  private def dim = Seq(10L, 20L, 30L).toDF("c_id")

  test("every check kind reports exact planted counts") {
    val got = Checks.run(fact, Seq(
        NotNull("cust"),
        Predicate("pred:amount_pos", col("amount") > 0),
        Unique("id"),
        ForeignKey("cust", dim, "c_id")))
      .as[(String, Long, Long)].collect()
      .map { case (k, p, t) => k -> ((p, t)) }.toMap
    assert(got == Map(
      "not_null:cust" -> ((5L, 6L)),
      "pred:amount_pos" -> ((5L, 6L)),
      "unique:id" -> ((4L, 6L)),   // the duplicated id 3 fails twice
      "fk:cust" -> ((4L, 6L))))    // orphan 99 and the null both fail
  }

  test("clean table passes everything") {
    val clean = Seq((1L, 10L), (2L, 20L)).toDF("id", "cust")
    val got = Checks.run(clean, Seq(
        NotNull("id"), Unique("id"), ForeignKey("cust", dim, "c_id")))
      .as[(String, Long, Long)].collect()
    assert(got.forall { case (_, p, t) => p == 2L && t == 2L })
  }

  test("row-local checks compile into one scan of the fact table") {
    val plan = Checks.run(fact, Seq(
        NotNull("cust"),
        Predicate("a", col("amount") > 0),
        Predicate("b", col("amount") < 100)))
      .queryExecution.optimizedPlan
    val scans = plan.collect {
      case l: org.apache.spark.sql.catalyst.plans.logical.LocalRelation => l
    }
    // one aggregate over one relation — adding predicates must not
    // add passes over the data
    assert(scans.size == 1, s"expected 1 scan, got ${scans.size}")
  }

  test("duplicate check names are rejected up front") {
    val e = intercept[IllegalArgumentException] {
      Checks.run(fact, Seq(NotNull("cust"), NotNull("cust")))
    }
    assert(e.getMessage.contains("not_null:cust"))
    // a Predicate shadowing a NotNull's derived name is the sneaky case
    intercept[IllegalArgumentException] {
      Checks.run(fact, Seq(NotNull("cust"),
        Predicate("not_null:cust", col("cust") > 0)))
    }
  }

  test("empty table reports (0, 0) for every check kind") {
    val empty = fact.where(lit(false))
    val got = Checks.run(empty, Seq(
        NotNull("cust"), Predicate("pred:pos", col("amount") > 0),
        Unique("id"), ForeignKey("cust", dim, "c_id")))
      .as[(String, Long, Long)].collect()
    assert(got.length == 4)
    assert(got.forall { case (_, p, t) => p == 0L && t == 0L })
  }
}
