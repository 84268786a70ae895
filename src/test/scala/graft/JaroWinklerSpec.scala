package graft

import graft.functions.JaroWinklerExpr
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

/** Parity fuzz for the native Jaro-Winkler expression against 6k
  * DuckDB-computed values (jaro_winkler_fixture.tsv — edge cases plus
  * high-collision random pairs; regenerate with the script in the
  * fixture header commit). Bit-exact doubles, not epsilon: the oracle
  * gate compares rounded values, so the underlying doubles must agree
  * to the last ulp on the op order both engines share. */
class JaroWinklerSpec extends SparkSpec {

  private def fixture: Seq[(String, String, Double)] = {
    val in = getClass.getResourceAsStream("/jaro_winkler_fixture.tsv")
    val src = scala.io.Source.fromInputStream(in, "UTF-8")
    try src.getLines().map { line =>
      val parts = line.split("\t", -1)
      (parts(0), parts(1), parts(2).toDouble)
    }.toList
    finally src.close()
  }

  test("sim matches DuckDB bit-exactly on 6k fuzz pairs") {
    val rows = fixture
    assert(rows.size > 6000)
    val bad = rows.filter { case (a, b, want) =>
      JaroWinklerExpr.sim(
        UTF8String.fromString(a), UTF8String.fromString(b)) != want
    }
    assert(bad.isEmpty, s"${bad.size} mismatches, first: ${bad.take(3)}")
  }

  test("column form evaluates through codegen identically to sim") {
    import spark.implicits._
    val df = fixture.take(500).toDF("a", "b", "want")
    val got = df.select(col("want"),
        JaroWinklerExpr.jaroWinkler(col("a"), col("b")).as("got"))
      .where(col("want") =!= col("got"))
    assert(got.count() == 0)
  }

  test("null propagates") {
    import spark.implicits._
    val df = Seq((Some("ab"), None: Option[String])).toDF("a", "b")
    val r = df.select(JaroWinklerExpr.jaroWinkler(col("a"), col("b")))
      .collect()
    assert(r(0).isNullAt(0))
  }
}
