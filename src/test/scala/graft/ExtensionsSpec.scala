package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.functions.CanonicalKey

/** SQL function surface: GraftFunctions.register on a live session and
  * the GraftExtensions (spark.sql.extensions) path on a fresh session
  * sharing the same SparkContext.
  */
class ExtensionsSpec extends SparkSpec {

  test("registered SQL functions match the Column API") {
    GraftFunctions.register(spark)
    import spark.implicits._

    // canonical PK: SQL vs Column expression, composite + widening
    val viaSql = spark.sql(
      "SELECT hex(graft_canonical_pk(5, 'ab')) AS h").as[String].head()
    val viaCol = Seq(1).toDF("x")
      .select(hex(CanonicalKey.canonicalPk(Seq(lit(5), lit("ab")))).as("h"))
      .as[String].head()
    assert(viaSql == viaCol)

    // cosine: identical vectors → 1.0; orthogonal → 0.0
    val cos = spark.sql(
      """SELECT round(graft_cosine(array(1.0d, 2.0d), array(1.0d, 2.0d)), 6) AS a,
        |       round(graft_cosine(array(1.0d, 0.0d), array(0.0d, 3.0d)), 6) AS b"""
        .stripMargin).collect().head
    assert(cos.getDouble(0) == 1.0 && cos.getDouble(1) == 0.0)

    // top-k aggregate through SQL: best-first, id tiebreak ascending
    val top = spark.sql(
      """SELECT graft_top_k(struct(CAST(s AS DOUBLE), CAST(i AS BIGINT)), 2) AS t
        |FROM VALUES (1.0, 10), (3.0, 7), (3.0, 5), (2.0, 1) AS v(s, i)"""
        .stripMargin).collect().head.getSeq[org.apache.spark.sql.Row](0)
    assert(top.map(r => (r.getLong(0), r.getDouble(1))) == Seq((5L, 3.0), (7L, 3.0)))

    // non-literal k is rejected with a clear message
    val err = intercept[Exception] {
      spark.sql("SELECT graft_top_k(struct(1.0d, 1L), 1 + 1)").collect()
    }
    assert(err.getMessage.contains("integer literal") ||
      Option(err.getCause).exists(_.getMessage.contains("integer literal")))
  }

  test("spark.sql.extensions path injects the functions at session build") {
    // build a genuinely new session over the same SparkContext with the
    // extensions applied (getOrCreate would return the shared session,
    // so default/active are cleared for the build and restored after)
    val prior = spark
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val fresh = SparkSession.builder()
        .master("local[2]")
        .withExtensions(new GraftExtensions)
        .getOrCreate()
      assert(fresh ne prior)
      val got = fresh.sql(
        "SELECT round(graft_cosine(array(2.0d, 0.0d), array(4.0d, 0.0d)), 6) AS c")
        .collect().head.getDouble(0)
      assert(got == 1.0)
      // the shared session is untouched unless register() was called on it
      assert(fresh.catalog.functionExists("graft_cosine"))
    } finally {
      SparkSession.setDefaultSession(prior)
      SparkSession.setActiveSession(prior)
    }
  }
}
