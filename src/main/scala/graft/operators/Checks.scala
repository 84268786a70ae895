package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality constraint suite (the Deequ/dbt-test
  * shape): a set of named checks over one table, evaluated together,
  * each reporting (passed, total) row counts so callers gate a
  * pipeline on exact numbers rather than a boolean (a 100 TB ingest
  * wants "how many rows broke" and "which check", not "false").
  *
  * Evaluation shape at scale: every ROW-LOCAL check (not-null,
  * predicate, accepted-values) compiles into one conditional-sum
  * aggregate over a SINGLE shared scan — adding a check adds a column
  * to the aggregate, not a pass over the data. The two non-local
  * checks each need their own keyed shape and are unioned in:
  * uniqueness is a two-level aggregate on the key (map-side combined;
  * shuffle carries one row per distinct key), and referential
  * integrity is a LEFT SEMI count against the dimension's key set
  * (broadcast when small — the planner's call). Nothing reaches the
  * driver; the result is |checks| rows.
  */
object Checks {

  sealed trait Check { def name: String }

  /** Rows where `colName` is non-null pass. */
  final case class NotNull(colName: String) extends Check {
    def name: String = s"not_null:$colName"
  }

  /** Rows satisfying `cond` pass (null counts as fail). */
  final case class Predicate(name: String, cond: Column) extends Check

  /** Rows whose `colName` value occurs exactly once pass — strict row
    * uniqueness, so passed == total iff the column is a key. */
  final case class Unique(colName: String) extends Check {
    def name: String = s"unique:$colName"
  }

  /** Rows whose `colName` exists in `dim.dimCol` pass (null fails —
    * an orphan FK and a missing FK are both integrity breaks). */
  final case class ForeignKey(colName: String, dim: DataFrame,
      dimCol: String) extends Check {
    def name: String = s"fk:$colName"
  }

  /** Run every check; returns (check_name, passed, total) sorted by
    * check_name. */
  def run(df: DataFrame, checks: Seq[Check]): DataFrame = {
    require(checks.nonEmpty, "Checks.run needs at least one check")
    // Duplicate names would collide as map() keys (the default
    // spark.sql.mapKeyDedupPolicy=EXCEPTION throws at runtime) and
    // make the agg aliases ambiguous — reject them up front.
    val dups = checks.groupBy(_.name).collect { case (n, cs) if cs.size > 1 => n }
    require(dups.isEmpty, s"duplicate check names: ${dups.mkString(", ")}")
    // coalesce(..., 0): on an EMPTY table sum() is NULL; every check
    // must report (0, 0), matching the Unique/ForeignKey arms.
    val rowLocal = checks.collect {
      case c: NotNull => c.name ->
        coalesce(sum(when(col(c.colName).isNotNull, 1L).otherwise(0L)), lit(0L))
      case c: Predicate => c.name ->
        coalesce(sum(when(c.cond, 1L).otherwise(0L)), lit(0L))
    }
    val parts = Seq.newBuilder[DataFrame]
    if (rowLocal.nonEmpty) {
      // one scan, one partial row per partition; explode the single
      // aggregate row into one output row per row-local check
      val aggCols = rowLocal.map { case (n, c) => c.as(n) } :+
        count(lit(1)).as("__total")
      val one = df.agg(aggCols.head, aggCols.tail: _*)
      val pairs = rowLocal.flatMap { case (n, _) =>
        Seq(lit(n), col(n)) }
      parts += one.select(
        explode(map(pairs: _*)).as(Seq("check_name", "passed")),
        col("__total").as("total"))
    }
    checks.foreach {
      case c: Unique =>
        parts += df.groupBy(col(c.colName)).agg(count(lit(1)).as("n"))
          .agg(
            coalesce(sum(when(col("n") === 1L, col("n"))), lit(0L))
              .as("passed"),
            coalesce(sum(col("n")), lit(0L)).as("total"))
          .select(lit(c.name).as("check_name"), col("passed"),
            col("total"))
      case c: ForeignKey =>
        val keys = c.dim.select(col(c.dimCol).as("__k")).distinct()
        val matched = df.select(col(c.colName).as("__k"))
          .join(keys, Seq("__k"), "left_semi")
          .agg(count(lit(1)).as("passed"))
        parts += matched.crossJoin(df.agg(count(lit(1)).as("total")))
          .select(lit(c.name).as("check_name"), col("passed"),
            col("total"))
      case _ => // row-local, handled above
    }
    parts.result().reduce(_ unionAll _).orderBy("check_name")
  }

  /** Offset-continuity audit: every maximal run of MISSING ids in a
    * dense offset column — "did the changelog lose records?". Output:
    * (gap_start, next_present, n_missing), one row per gap.
    *
    * Scale shape (the same two-level trick as
    * [[graft.operators.PrefixScan]]): ids bucket by integer `div`,
    * so gaps INTERIOR to a bucket come from a per-bucket (keyed,
    * parallel) lag window, and gaps SPANNING bucket boundaries come
    * from the bucket min/max summary — a |buckets|-row table whose
    * global lag window is not a scale trap. The naive global
    * `Window.orderBy(id)` over the data (what the DuckDB oracle
    * states) would be one task holding the whole log. Empty buckets
    * between present ones are handled by construction: the summary
    * lag skips them and the boundary gap covers the whole span.
    * `idCol` must be non-negative (same `div` contract as
    * PrefixScan). */
  def offsetGaps(df: DataFrame, idCol: String, bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive: $bucketWidth")
    import org.apache.spark.sql.expressions.Window
    val b = df.select(col(idCol).as("__id"))
      .withColumn("__b", expr(s"__id div ${bucketWidth}L"))
    val inner = b
      .withColumn("__prev", lag(col("__id"), 1).over(
        Window.partitionBy(col("__b")).orderBy(col("__id"))))
      .where(col("__prev").isNotNull && col("__id") > col("__prev") + 1)
      .select((col("__prev") + 1).as("gap_start"),
        col("__id").as("next_present"))
    val summary = b.groupBy("__b")
      .agg(min(col("__id")).as("__mn"), max(col("__id")).as("__mx"))
    val boundary = summary
      .withColumn("__pmx", lag(col("__mx"), 1).over(
        Window.orderBy(col("__b"))))
      .where(col("__pmx").isNotNull && col("__mn") > col("__pmx") + 1)
      .select((col("__pmx") + 1).as("gap_start"),
        col("__mn").as("next_present"))
    inner.unionByName(boundary)
      .withColumn("n_missing", col("next_present") - col("gap_start"))
  }
}
