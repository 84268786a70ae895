package graft

import graft.operators.TextAnalysis

/** BPE merge induction (TextAnalysis.bpeMerges): known-answer merges on
  * a hand-built corpus, the overlapping-pair rewrite contract, the
  * count-tie and top-vocab determinism rules, and partitioning
  * invariance of the corpus-side aggregation.
  */
class BpeSpec extends SparkSpec {

  import spark.implicits._

  private def run(texts: Seq[String], vocab: Int = 1000, merges: Int = 5) =
    TextAnalysis.bpeMerges(texts.toDF("text"), "text", vocab, merges)
      .orderBy("rank")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))

  test("known merges on a planted corpus") {
    // "lower lower lowest": 'l o' and 'o w' appear in every word (3×),
    // 'l o' wins the count tie lexicographically; merge 2 then pairs
    // 'lo w' (3), winning over 'e r' (2).
    val m = run(Seq("lower lower lowest"), merges = 2)
    assert(m(0) == (1L, "l o", "lo", 3L))
    assert(m(1) == (2L, "lo w", "low", 3L))
  }

  test("rewrite is leftmost non-overlapping: 'aaaa' → 'aa a a' → 'aa aa'") {
    // word "aaaa" → "a a a a": pair 'a a' has THREE adjacent positions
    // (overlap counting ⇒ cnt 3), but the rewrite replaces leftmost
    // non-overlapping and resumes AFTER the consumed match, giving
    // "aa a a" (not "aa aa"). Merge 2 then ties 'a a' (1) with 'aa a'
    // (1) and 'a a' wins lexicographically; merge 3 finally forms
    // "aa aa". Pins the exact replace semantics the oracle replays.
    val m = run(Seq("aaaa"), merges = 3)
    assert(m(0) == (1L, "a a", "aa", 3L))
    assert(m(1) == (2L, "a a", "aa", 1L))
    assert(m(2) == (3L, "aa aa", "aaaa", 1L))
  }

  test("count ties break lexicographically") {
    // "cb ba": pairs 'c b' and 'b a' both count 1 → 'b a' wins.
    val m = run(Seq("cb ba"), merges = 1)
    assert(m(0) == (1L, "b a", "ba", 1L))
  }

  test("word frequency weights pair counts") {
    // 'x y' appears in one word type but many tokens; 'p q' in many
    // types but fewer tokens. Counts follow token frequency.
    val m = run(Seq(Seq.fill(5)("xy").mkString(" ") + " pq pqr"), merges = 1)
    assert(m(0) == (1L, "x y", "xy", 5L))
  }

  test("vocab cut orders by (n desc, word asc) before merging") {
    // vocab=1: only the most frequent word ("bb" ties "aa" on count,
    // "aa" wins lexicographically) survives to the merge loop.
    val m = run(Seq("aa bb"), vocab = 1, merges = 1)
    assert(m(0) == (1L, "a a", "aa", 1L))
  }

  test("corpus pass plans map-side partials + TakeOrdered, no global sort") {
    val prev = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val plan = TextAnalysis.bpeWordCounts(
          spark.read.parquet("/root/testdata/sf0.01/documents.parquet"),
          "text", 1000)
        .queryExecution.executedPlan.toString
      assert(plan.contains("TakeOrderedAndProject"),
        s"vocab cut must be TakeOrdered (limit+sort fused), not a global sort:\n$plan")
      assert("HashAggregate.*partial_count".r.findFirstIn(plan.replace("\n", " ")).isDefined
          || plan.contains("partial_count"),
        s"word counting must partial-aggregate map-side:\n$plan")
    } finally spark.conf.set("spark.sql.adaptive.enabled", prev)
  }

  test("result is invariant to input partitioning") {
    val texts = Seq("the quick brown fox jumps over the lazy dog",
      "pack my box with five dozen liquor jugs",
      "how vexingly quick daft zebras jump")
    val one = TextAnalysis.bpeMerges(
      texts.toDF("text").coalesce(1), "text", 1000, 3).orderBy("rank").collect()
    val many = TextAnalysis.bpeMerges(
      texts.toDF("text").repartition(7), "text", 1000, 3).orderBy("rank").collect()
    assert(one.map(_.toSeq).toSeq == many.map(_.toSeq).toSeq)
  }
}
