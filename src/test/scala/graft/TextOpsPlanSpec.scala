package graft

import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec

import graft.queries.Registry

/** Scale-shape assertions for the round-4 text/statistics operators:
  * TF-IDF must not plan a nested-loop product for the corpus-size
  * factor (a 1-row broadcast is the only acceptable product), the
  * quantile query must be a single aggregation exchange, and no
  * registered query anywhere may plan a CartesianProduct.
  */
class TextOpsPlanSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.01"

  private def withoutAqe[A](f: => A): A = {
    val prev = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try f finally spark.conf.set("spark.sql.adaptive.enabled", prev)
  }

  test("tfidf joins document frequencies keyed and broadcasts only the 1-row corpus count") {
    withoutAqe {
      val p = Registry.all("q_tfidf").build(spark, dir)
        .queryExecution.executedPlan.toString
      assert(!p.contains("CartesianProduct"), s"no cartesian product:\n$p")
      // the N factor rides a broadcast nested loop of a 1-row aggregate —
      // assert it broadcasts (BuildRight/Left of BroadcastExchange), and
      // that the term-df join itself is a hash join, not a product
      assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"),
        s"corpus count must broadcast:\n$p")
      assert(p.contains("HashJoin") || p.contains("SortMergeJoin"),
        s"df join must be keyed:\n$p")
    }
  }

  test("round-7 operators prune the documents scan to the columns they touch") {
    // column pruning must reach the parquet scan: a 5-column table read
    // for a 2-3 column operator is wasted IO at corpus scale
    def readSchema(q: String): String = {
      val p = Registry.all(q).build(spark, dir).queryExecution.executedPlan.toString
      "ReadSchema: struct<([^>]*)>".r.findFirstMatchIn(p)
        .map(_.group(1)).getOrElse(fail(s"no parquet ReadSchema in plan of $q:\n$p"))
    }
    val span = readSchema("q_span_dedup")
    assert(span.contains("doc_id") && span.contains("text") &&
      !span.contains("lang") && !span.contains("n_chars"),
      s"q_span_dedup over-reads: $span")
    val line = readSchema("q_line_dedup")
    assert(!line.contains("source") && !line.contains("lang"),
      s"q_line_dedup over-reads: $line")
    val budget = readSchema("q_budget_select")
    assert(budget.contains("source") && !budget.contains("lang") &&
      !budget.contains("n_chars"), s"q_budget_select over-reads: $budget")
    // (q_cms_count / q_hll_distinct checkpoint their token streams
    // during build, so the parquet scan is not in the final plan; the
    // scan under the checkpoint projects only the touched columns.)
  }

  test("scrubPii redacts planted emails, IPs, and card numbers and counts them") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val rows = Seq(
      (1L, "contact bob.smith+x@example.co.uk or 10.0.254.3 now"),
      (2L, "card 4111111111111111 expires; backup 12 digits 123456789012 stays"),
      (3L, "email inside number zone 9999@x.io 99999999999999999"),
      (4L, "clean text, nothing to redact")).toDF("doc_id", "text")
    val got = rows
      .select(col("doc_id"), graft.operators.TextAnalysis.scrubPii(col("text")).as("s"))
      .select(col("doc_id"), col("s.clean"), col("s.n_emails"), col("s.n_ips"), col("s.n_nums"))
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got(1L) == (("contact <EMAIL> or <IP> now", 1L, 1L, 0L)))
    // 12-digit run is below the 13-digit card floor
    assert(got(2L) == (("card <NUM> expires; backup 12 digits 123456789012 stays", 0L, 0L, 1L)))
    // the email eats its digits first; the free-standing 17-digit run is caught
    assert(got(3L) == (("email inside number zone <EMAIL> <NUM>", 1L, 0L, 1L)))
    assert(got(4L) == (("clean text, nothing to redact", 0L, 0L, 0L)))
  }

  test("hashed linear classifier joins its weight table by BROADCAST") {
    val plan = Registry.all("q_classifier_score").build(spark, dir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"weights must broadcast, not shuffle the corpus-side tf rows:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"no corpus-side shuffle join for a 64-row model:\n$plan")
  }

  test("grouped quantiles plan exactly one aggregation exchange (map-side partials)") {
    withoutAqe {
      val plan = Registry.all("q_quantiles").build(spark, dir)
        .queryExecution.executedPlan
      val shuffles = plan.collect { case s: ShuffleExchangeExec => s }
      // one exchange for groupBy(l_returnflag); the orderBy adds a range
      // exchange — nothing else may shuffle
      assert(shuffles.size <= 2,
        s"expected ≤2 exchanges (agg + sort), got ${shuffles.size}:\n$plan")
    }
  }

  test("lmScore scoreIds prunes the scoring side to members, values unchanged") {
    import org.apache.spark.sql.functions.col
    val d = graft.core.Tables.load(spark, dir, "documents")
    val members = d.select("doc_id").where(col("doc_id") % 7 === 0)
    val full = graft.operators.TextAnalysis.lmScore(d, "doc_id", "text")
    val pruned = graft.operators.TextAnalysis
      .lmScore(d, "doc_id", "text", scoreIds = Some(members))
    // semantics: pruned == full restricted to members (the MODEL stays
    // corpus-wide, so scores must be identical — this is what keeps
    // the q_dedup_keep_quality oracle unchanged)
    val expected = full.join(members, Seq("doc_id"), "left_semi")
      .orderBy("doc_id").collect().toSeq
    val got = pruned.orderBy("doc_id").collect().toSeq
    assert(got == expected,
      "member-pruned scores must equal the full run restricted to members")
    // plan: the scoring branch semi-joins BEFORE the logp join — a
    // LeftSemi must appear in the optimized plan, and it must sit on
    // the tf side (scoring work |members|, not |corpus|)
    val hasSemi = pruned.queryExecution.optimizedPlan.exists {
      case j: org.apache.spark.sql.catalyst.plans.logical.Join =>
        j.joinType == org.apache.spark.sql.catalyst.plans.LeftSemi
      case _ => false
    }
    assert(hasSemi, "scoring side must be member-pruned via a semi-join")
  }
}
