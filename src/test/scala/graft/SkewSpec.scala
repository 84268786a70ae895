package graft

import org.apache.spark.sql.functions._

import graft.operators.Skew

/** Salted join equivalence: same result as a plain equi-join on
  * skewed data (one key holding most rows). */
class SkewSpec extends SparkSpec {
  import spark.implicits._

  test("saltedJoin equals plain join on skewed keys") {
    val left = (1 to 10000).map(i => (if (i % 10 == 0) i else 1, i))
      .toDF("k", "v") // key 1 holds ~90% of rows
    val right = (1 to 100).map(i => (i, s"dim$i")).toDF("k", "name")
    val plain = left.join(right, Seq("k"), "inner")
      .select("k", "v", "name").collect().map(_.toSeq).toSet
    val salted = Skew.saltedJoin(left, right, "k", 8)
      .select("k", "v", "name").collect().map(_.toSeq).toSet
    assert(salted == plain)
    assert(plain.nonEmpty)
  }

  test("salted left join preserves unmatched rows") {
    val left = Seq((1, "a"), (2, "b"), (99, "no-match")).toDF("k", "v")
    val right = Seq((1, "x"), (2, "y")).toDF("k", "w")
    val salted = Skew.saltedJoin(left, right, "k", 4, "left_outer")
      .select("k", "v", "w").collect().map(_.toSeq).toSet
    val plain = left.join(right, Seq("k"), "left_outer")
      .select("k", "v", "w").collect().map(_.toSeq).toSet
    assert(salted == plain)
  }
}
