package graft

import org.apache.spark.sql.functions._

import graft.operators.TextAnalysis
import graft.queries.Registry

/** BM25 ranked retrieval: value-exact scores on a hand-computed
  * corpus, ranking/tiebreak behavior, and the no-corpus-shuffle plan
  * shape (tf per literal term is an array projection; the only join
  * is the broadcast of the 1-row stats aggregate).
  */
class Bm25Spec extends SparkSpec {

  import spark.implicits._

  // 4 docs, query = {cat, dog}: doc 1 has both terms, doc 2 one,
  // doc 3 the other (longer), doc 4 neither.
  private val corpus = Seq(
    (1L, "cat dog cat"),
    (2L, "dog fish bird"),
    (3L, "cat mouse mouse mouse mouse mouse"),
    (4L, "fish bird fish")
  ).toDF("doc_id", "text")

  private val k1 = 1.25
  private val b = 0.75

  /** The textbook formula, computed independently of the operator. */
  private def expectedScore(tfs: Map[String, Long], dl: Long,
      nDocs: Long, avgdl: Double, dfs: Map[String, Long]): Double = {
    val terms = tfs.keySet
    BigDecimal(terms.toSeq.sorted.map { t =>
      val idf = BigDecimal(math.log(
        ((nDocs - dfs(t)).toDouble + 0.5) / (dfs(t).toDouble + 0.5) + 1.0))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      val tf = tfs(t).toDouble
      BigDecimal(idf * (tf * (k1 + 1)) /
        (tf + k1 * ((1.0 - b) + b * (dl / avgdl))))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP)
    }.sum.toDouble).toDouble
  }

  test("scores match the hand-computed Okapi formula exactly") {
    val out = TextAnalysis.bm25(corpus, "doc_id", "text",
        Seq("cat", "dog"), 10, k1, b)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    // corpus stats: dl = 3,3,6,3; N=4, avgdl=15/4; df(cat)=2, df(dog)=2
    val avgdl = 15.0 / 4
    val dfs = Map("cat" -> 2L, "dog" -> 2L)
    val exp1 = expectedScore(Map("cat" -> 2L, "dog" -> 1L), 3L, 4, avgdl, dfs)
    val exp2 = expectedScore(Map("cat" -> 0L, "dog" -> 1L), 3L, 4, avgdl, dfs)
    val exp3 = expectedScore(Map("cat" -> 1L, "dog" -> 0L), 6L, 4, avgdl, dfs)
    assert(out.map(_._1).toSeq == Seq(1L, 2L, 3L)) // doc 4 filtered (score 0)
    assert(out(0) == ((1L, 3L, exp1)))
    assert(out(1) == ((2L, 3L, exp2)))
    assert(out(2) == ((3L, 6L, exp3)))
    // two-term doc outranks either single-term doc; the short
    // single-term doc outranks the long one (length normalization)
    assert(exp1 > exp2 && exp2 > exp3)
  }

  test("ties rank by doc id and k caps the answer") {
    val tied = Seq((10L, "cat x"), (7L, "cat x"), (9L, "cat x"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.bm25(tied, "doc_id", "text", Seq("cat"), 2, k1, b)
      .select("doc_id").as[Long].collect().toSeq
    assert(out == Seq(7L, 9L))
  }

  test("plan: corpus never shuffle-joins — only the 1-row stats broadcast") {
    val prev = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val p = Registry.all("q_bm25").build(spark, "/root/testdata/sf0.001")
        .queryExecution.executedPlan.toString
      assert(!p.contains("CartesianProduct"), s"no cartesian:\n$p")
      assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin"),
        s"corpus must not shuffle-join:\n$p")
      assert(p.contains("BroadcastNestedLoopJoin"),
        s"stats row must broadcast:\n$p")
      assert(p.contains("TakeOrderedAndProject"),
        s"top-k must be a sort-limit, not a global sort:\n$p")
    } finally spark.conf.set("spark.sql.adaptive.enabled", prev)
  }
}
