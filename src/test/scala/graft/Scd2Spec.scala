package graft

import org.apache.spark.sql.functions._

import graft.operators.Temporal
import graft.queries.Cdc

/** SCD Type 2 compile (`Temporal.scd2`): run-collapse, interval
  * chaining, exactly one current version per key, and the point-in-time
  * contract — reconstructing state as of any offset from the version
  * table must equal latest-per-key over the changelog prefix.
  */
class Scd2Spec extends SparkSpec {

  test("planted changelog: runs collapse, intervals chain, open version is current") {
    import spark.implicits._
    val log = Seq(
      (1L, 1L, "a"), (1L, 2L, "a"), (1L, 3L, "b"), (1L, 4L, "a"),
      (2L, 5L, "x")).toDF("k", "off", "v")
    val got = Temporal.scd2(log, "k", "v", "off")
      .orderBy("k", "valid_from")
      .as[(Long, String, Long, Long, Long)].collect().toSeq
    assert(got == Seq(
      (1L, "a", 1L, 3L, 0L), (1L, "b", 3L, 4L, 0L), (1L, "a", 4L, -1L, 1L),
      (2L, "x", 5L, -1L, 1L)))
  }

  test("multi-attribute SCD2 falls out of struct equality") {
    import spark.implicits._
    // runs break when ANY tracked field changes (v at 3, t at 4)
    val log = Seq(
      (1L, 1L, "a", 10L), (1L, 2L, "a", 10L), (1L, 3L, "a", 20L),
      (1L, 4L, "b", 20L))
      .toDF("k", "off", "t", "v")
      .select(col("k"), col("off"), struct(col("t"), col("v")).as("attr"))
    val got = Temporal.scd2(log, "k", "attr", "off")
      .select(col("k"), col("attr.t"), col("attr.v"),
        col("valid_from"), col("valid_to"))
      .as[(Long, String, Long, Long, Long)].collect().toSeq.sortBy(_._4)
    assert(got == Seq(
      (1L, "a", 10L, 1L, 3L), (1L, "a", 20L, 3L, 4L), (1L, "b", 20L, 4L, -1L)))
  }

  test("real changelog invariants: one current per key, contiguous intervals, current == latest") {
    import spark.implicits._
    val events = graft.core.Tables.load(spark, "/root/testdata/sf0.001", "events")
    val v = Temporal.scd2(events, "user_id", "event_type", "event_id").cache()
    try {
      // exactly one open (current) version per key
      val perKey = v.groupBy("user_id")
        .agg(sum(col("is_current")).as("n_cur")).collect()
      assert(perKey.nonEmpty && perKey.forall(_.getLong(1) == 1L))

      // versions chain: each closed version's valid_to opens the next
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id")).orderBy(col("valid_from"))
      val broken = v
        .withColumn("__next_from", lead(col("valid_from"), 1).over(w))
        .where(col("valid_to") =!= -1L &&
          col("valid_to") =!= col("__next_from"))
        .count()
      assert(broken == 0L)

      // the current version's attribute equals latest-per-key
      val cur = v.where(col("is_current") === 1L)
        .select(col("user_id"), col("event_type"))
      val latest = Cdc.latestPerKey(events)
        .select(col("user_id"), col("event_type"))
      assert(cur.except(latest).isEmpty && latest.except(cur).isEmpty)

      // point-in-time: as-of offset K, the covering version's attr ==
      // latest event_type over the changelog prefix (event_id <= K)
      for (k <- Seq(100L, 500L, 900L)) {
        val asOf = v.where(col("valid_from") <= k &&
            (col("valid_to") === -1L || col("valid_to") > k))
          .select(col("user_id"), col("event_type"))
        val prefix = Cdc.latestPerKey(events.where(col("event_id") <= k))
          .select(col("user_id"), col("event_type"))
        assert(asOf.except(prefix).isEmpty && prefix.except(asOf).isEmpty,
          s"as-of $k mismatch")
      }
    } finally v.unpersist()
  }

  test("dwell: run durations sum per state, open interval closes at the horizon") {
    import spark.implicits._
    // key 1: a@0..10, b@10..25, a@25..horizon(100) — 'a' holds 10+75,
    // 'b' holds 15; key 2: b@5..horizon — 95. No-op repeat (a@7) must
    // not split a run.
    val log = Seq(
      (1L, 0L, "a"), (1L, 7L, "a"), (1L, 10L, "b"), (1L, 25L, "a"),
      (2L, 5L, "b"))
      .toDF("k", "t", "s")
    val got = Temporal.dwell(log, "k", "s", "t", horizon = 100L)
      .as[(String, Long, Long)].collect()
      .map { case (s, d, n) => s -> ((d, n)) }.toMap
    assert(got == Map("a" -> ((85L, 2L)), "b" -> ((110L, 2L))))
  }

  test("asofJoin forward: earliest right at-or-after, exact-ts tie matches, trailing left is null") {
    import spark.implicits._
    val left = Seq((1L, 5L, "l5"), (1L, 10L, "l10"), (1L, 20L, "l20"),
      (2L, 1L, "x")).toDF("k", "t", "tag")
    val right = Seq((1L, 10L, 100.0), (1L, 15L, 150.0)).toDF("k", "t", "cv")
    val got = Temporal.asofJoin(left, right, Seq("k"), "t", Seq("cv"),
        direction = "forward")
      .as[(Long, Long, String, Option[Double])].collect()
      .map { case (_, t, tag, cv) => (tag, cv) }.toMap
    assert(got == Map(
      "l5" -> Some(100.0),   // next right after 5 is t=10
      "l10" -> Some(100.0),  // exact tie: at-or-after matches
      "l20" -> None,         // nothing after 20
      "x" -> None))          // key 2 has no right rows
  }

  test("mergeIntervals: overlaps and touches merge, gaps split islands, no double count") {
    import spark.implicits._
    // key 1: [0,10) ∪ [5,15) overlap → [0,15); [15,20) TOUCHES (end
    // exclusive: 15 > 15 is false) → still one island [0,20); [30,35)
    // is a gap → second island. Covered 20 + 5 = 25.
    // key 2: nested [0,100) ⊃ [10,20) → one island, covered 100 (the
    // cummax-over-PREVIOUS-rows guard: a later interval ending before
    // the running max must not close the island).
    val iv = Seq(
      (1L, 0L, 10L), (1L, 5L, 15L), (1L, 15L, 20L), (1L, 30L, 35L),
      (2L, 0L, 100L), (2L, 10L, 20L))
      .toDF("k", "s", "e")
    val got = Temporal.mergeIntervals(iv, "k", "s", "e")
      .as[(Long, Long, Long)].collect()
      .map { case (k, n, c) => k -> ((n, c)) }.toMap
    assert(got == Map(1L -> ((2L, 25L)), 2L -> ((1L, 100L))))
  }

  test("transitions: lag pairs per key, row-normalized p, tiebreak pins equal timestamps") {
    import spark.implicits._
    // key 1: a->b->a->b; key 2: b->b. Cross-key pairs must not exist.
    // Two rows at t=5 for key 1 order by the id tiebreak (3 before 4).
    val ev = Seq(
      (1L, 0L, 1L, "a"), (1L, 5L, 3L, "b"), (1L, 5L, 4L, "a"),
      (1L, 9L, 5L, "b"), (2L, 0L, 6L, "b"), (2L, 1L, 7L, "b"))
      .toDF("k", "t", "id", "s")
    val got = Temporal.transitions(ev, "k", "t", "id", "s")
      .as[(String, String, Long, Double)].collect()
      .map { case (f, to, c, p) => (f, to) -> ((c, p)) }.toMap
    assert(got == Map(
      ("a", "b") -> ((2L, 1.0)),
      ("b", "a") -> ((1L, 0.5)),
      ("b", "b") -> ((1L, 0.5))))
  }
}
