package graft

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.operators.TrainingData

/** Properties of sketch-based budgeted corpus selection
  * ([[TrainingData.budgetSelectBySketch]]), the 100 TB path of
  * `q_budget_select`'s exact greedy:
  *
  *  1. within-budget: per group, selected token mass never exceeds
  *     `total div budgetDen`;
  *  2. subset-of-greedy: the selection is always a subset of the exact
  *     greedy set (descending score, running token sum up to the
  *     budget) — the sketch truncates at the last WHOLE score class,
  *     the conservative direction for a training-mix cut.
  */
class BudgetSketchSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("src", StringType),
    StructField("doc", LongType),
    StructField("score", IntegerType),
    StructField("tok", LongType)))

  /** Three groups with distinct shapes: `a` has a score class that
    * exactly fills the budget, `b` a partial class the greedy would
    * split, `c` a TOP class that alone exceeds the budget (the sketch
    * must then select nothing). */
  private def scored(): DataFrame = {
    val rows =
      // a: total 40, budget 20; score 5 holds exactly 20 tokens
      Seq(Row("a", 1L, 5, 12L), Row("a", 2L, 5, 8L),
        Row("a", 3L, 4, 10L), Row("a", 4L, 3, 10L)) ++
      // b: total 60, budget 30; score 5 = 18, score 4 = 20 (partial)
      Seq(Row("b", 10L, 5, 18L), Row("b", 11L, 4, 11L),
        Row("b", 12L, 4, 9L), Row("b", 13L, 2, 22L)) ++
      // c: total 50, budget 25; top class alone = 40
      Seq(Row("c", 20L, 9, 40L), Row("c", 21L, 1, 10L))
    spark.createDataFrame(java.util.Arrays.asList(rows: _*), schema)
  }

  private def select(df: DataFrame, den: Long): DataFrame =
    TrainingData.budgetSelectBySketch(df, "src", "score", "tok", den)

  /** The exact greedy set: descending score (doc id as tie-break),
    * running token sum, stop once the budget would be exceeded. */
  private def greedySet(df: DataFrame, den: Long): Set[(String, Long)] = {
    val byGroup = df.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getInt(2), r.getLong(3)))
      .groupBy(_._1)
    byGroup.toSeq.flatMap { case (g, rows) =>
      val budget = rows.map(_._4).sum / den
      var spent = 0L
      rows.sortBy(r => (-r._3, r._2)).flatMap { r =>
        if (spent + r._4 <= budget) { spent += r._4; Some((g, r._2)) }
        else None // skip any doc that would overflow the budget
      }
    }.toSet
  }

  test("selection stays within budget per group") {
    val sel = select(scored(), 2L).groupBy("src").agg(sum("tok").as("t"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val budgets = scored().groupBy("src").agg(sum("tok").as("t"))
      .collect().map(r => r.getString(0) -> r.getLong(1) / 2).toMap
    sel.foreach { case (g, t) =>
      assert(t <= budgets(g), s"group $g over budget: $t > ${budgets(g)}")
    }
    // group c's top class exceeds its budget outright → nothing selected
    assert(!sel.contains("c"))
  }

  test("selection is a subset of the exact greedy set, cut at whole score classes") {
    val df = scored()
    val sel = select(df, 2L).select("src", "doc").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    val greedy = greedySet(df, 2L)
    assert(sel.subsetOf(greedy),
      s"sketch selected outside the greedy set: ${sel.diff(greedy)}")
    // concrete expectations: a keeps its exactly-fitting top class,
    // b keeps only score 5 (class 4 is partial), c keeps nothing
    assert(sel == Set(("a", 1L), ("a", 2L), ("b", 10L)))
  }

  test("whole-class semantics: every selected score class is complete") {
    val df = scored()
    val sel = select(df, 2L)
    // every (group, score) class present in the selection is present
    // in full — the sketch never splits a class
    val selClasses = sel.groupBy("src", "score").count()
      .withColumnRenamed("count", "n_sel")
    val allClasses = df.groupBy("src", "score").count()
      .withColumnRenamed("count", "n_all")
    val split = selClasses.join(allClasses, Seq("src", "score"))
      .where(col("n_sel") =!= col("n_all"))
    assert(split.count() == 0, "sketch split a score class")
  }
}
