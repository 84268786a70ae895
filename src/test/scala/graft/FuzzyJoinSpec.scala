package graft

import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** FastSS-blocked fuzzy matching (`Dedup.editDistancePairs`): every
  * edit kind is found, distance-2 pairs are not, and the blocked plan
  * equals the naive all-pairs scan on randomized strings — the
  * completeness property the deletion-neighborhood argument claims.
  */
class FuzzyJoinSpec extends SparkSpec {

  test("substitution, insertion, deletion, equality found; distance 2 not") {
    import spark.implicits._
    val rows = Seq(
      (1L, "kitten"), (2L, "mitten"), // substitution
      (3L, "kittens"), // insertion vs 1
      (4L, "kitte"), // deletion vs 1
      (5L, "kitten"), // equal to 1
      (6L, "mutton") // distance 2 from 2, > 1 from all
    ).toDF("id", "s")
    val got = Dedup.editDistancePairs(rows, "id", "s")
      .as[(Long, Long, Long)].collect().toSet
    assert(got == Set(
      (1L, 2L, 1L), (1L, 3L, 1L), (1L, 4L, 1L), (1L, 5L, 0L),
      (2L, 5L, 1L), (3L, 5L, 1L), (4L, 5L, 1L)))
  }

  test("blocked result equals the naive all-pairs scan on random strings") {
    import spark.implicits._
    val rnd = new scala.util.Random(31)
    // short random strings over a 3-letter alphabet → dense 1-edit pairs
    val rows = (1L to 300L).map { i =>
      (i, Seq.fill(3 + rnd.nextInt(3))("abc" (rnd.nextInt(3))).mkString)
    }.toDF("id", "s")
    val blocked = Dedup.editDistancePairs(rows, "id", "s")
      .as[(Long, Long, Long)].collect().toSet
    val a = rows.select(col("id").as("id_a"), col("s").as("s_a"))
    val b = rows.select(col("id").as("id_b"), col("s").as("s_b"))
    val naive = a.crossJoin(b)
      .where(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        levenshtein(col("s_a"), col("s_b")).cast("long").as("dist"))
      .where(col("dist") <= 1)
      .as[(Long, Long, Long)].collect().toSet
    assert(blocked == naive,
      s"missing=${(naive -- blocked).take(5)} extra=${(blocked -- naive).take(5)}")
  }
}
