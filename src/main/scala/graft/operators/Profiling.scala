package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType, StringType, TimestampType}

import graft.functions.TopKByScore

/** ANALYZE-style table profiling: per-column row/null counts, min/max,
  * and a KMV distinct estimate, all in ONE aggregation pass over the
  * table — the statistics-collection primitive a catalog or cost-based
  * planner runs before anything else at 100 TB, where "one pass" is
  * the entire point (a per-column `SELECT count(DISTINCT …)` loop
  * re-scans the table once per column and builds each distinct set for
  * real; here every metric including the sketches is a map-side
  * combinable aggregate in the same plan, so the shuffle carries one
  * partial row — plus ≤ k sketch entries per distinct-profiled column
  * — per partition).
  *
  * Output is long-format `(col_name, metric, value: double)`; every
  * value is an exactly-representable integer or an input value (no
  * float arithmetic), so an engine-vs-oracle compare is byte-exact.
  * [[duckDbSql]] generates the DuckDB replay from the same specs.
  */
object Profiling {

  sealed trait Kind
  /** Numeric column: min/max reported as doubles. */
  case object Num extends Kind
  /** String column: min_len/max_len reported. */
  case object Str extends Kind
  /** Timestamp column: min/max reported as epoch MICROS (session tz is
    * UTC everywhere, so naive timestamps convert losslessly). */
  case object Ts extends Kind

  /** One column to profile; `distinct` adds the KMV estimate. */
  case class ColSpec(name: String, kind: Kind, distinct: Boolean = false)

  def profile(df: DataFrame, specs: Seq[ColSpec], k: Int = 512): DataFrame = {
    require(k > 1 && k <= 2048, s"kmv k must be in (1, 2048], got $k")
    // '~' is the reserved (col_name, metric) separator in the internal
    // wide-row encoding — fail loudly rather than mis-split the output.
    require(specs.forall(!_.name.contains("~")),
      "column names must not contain the reserved '~' separator")
    val numerator = (k - 1).toLong << 52
    val aggs = Seq(count(lit(1)).cast(DoubleType).as("_table_~rows")) ++
      specs.flatMap { s =>
        val c = col(s.name)
        val base = Seq(
          count(c).cast(DoubleType).as(s"${s.name}~count"),
          (count(lit(1)) - count(c)).cast(DoubleType).as(s"${s.name}~nulls"))
        val mm = s.kind match {
          case Num => Seq(
            min(c).cast(DoubleType).as(s"${s.name}~min"),
            max(c).cast(DoubleType).as(s"${s.name}~max"))
          case Str => Seq(
            min(length(c)).cast(DoubleType).as(s"${s.name}~min_len"),
            max(length(c)).cast(DoubleType).as(s"${s.name}~max_len"))
          case Ts => Seq(
            min(unix_micros(c.cast(TimestampType))).cast(DoubleType)
              .as(s"${s.name}~min"),
            max(unix_micros(c.cast(TimestampType))).cast(DoubleType)
              .as(s"${s.name}~max"))
        }
        val sketch =
          if (!s.distinct) Nil
          else {
            val h = TextAnalysis.hash52(c)
            Seq(TopKByScore.topK(
              struct((-h).cast(DoubleType).as("score"), h.as("id")), k)
              .as(s"${s.name}~kmv"))
          }
        base ++ mm ++ sketch
      }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val withEst = specs.filter(_.distinct).foldLeft(one) { (acc, s) =>
      val kmv = col(s"${s.name}~kmv")
      acc.withColumn(s"${s.name}~distinct_kmv",
        when(size(kmv) < k, size(kmv).cast(DoubleType))
          .otherwise(expr(
            s"cast(${numerator}L div greatest(get(`${s.name}~kmv`, ${k - 1}).id, 1L) as double)")))
        .drop(s"${s.name}~kmv")
    }
    val entries = withEst.columns.map { m =>
      val Array(cn, metric) = m.split("~", 2)
      struct(lit(cn).as("col_name"), lit(metric).as("metric"),
        col(s"`$m`").as("value"))
    }
    withEst.select(explode(array(entries.toIndexedSeq: _*)).as("e"))
      .select(col("e.col_name").as("col_name"), col("e.metric").as("metric"),
        col("e.value").as("value"))
      .orderBy("col_name", "metric")
  }

  /** Most-common-values catalog stats: the top-`k` (value, frequency)
    * pairs per column, the piece a CBO wants next to [[profile]]'s
    * counts/min-max/distinct.
    *
    * ONE corpus scan: each row explodes to |cols| (col_name, value)
    * pairs, the groupBy reduces them map-side so the shuffle carries
    * only distinct (column, value) partials — for the categorical
    * columns MCV is meant for, that is tiny. The per-column rank
    * window then funnels one COLUMN's distinct values through one
    * task: bounded by that column's cardinality, not the corpus. For
    * id-like high-cardinality columns MCV is the wrong statistic —
    * use [[profile]]'s KMV distinct estimate instead (the window
    * would funnel the whole column; this is a documented contract,
    * not a hidden cliff).
    *
    * Values are cast to string for a uniform output schema; nulls are
    * excluded (null counts are already in [[profile]]). Ties break on
    * the string value, so the result is deterministic and matches the
    * DuckDB replay exactly. */
  def mcv(df: DataFrame, cols: Seq[String], k: Int): DataFrame = {
    require(cols.nonEmpty && k > 0)
    val pairs = df
      .select(explode(array(cols.map(c =>
        struct(lit(c).as("col_name"),
          col(c).cast(StringType).as("value"))): _*)).as("p"))
      .select(col("p.col_name").as("col_name"), col("p.value").as("value"))
      .where(col("value").isNotNull)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("col_name").orderBy(col("cnt").desc, col("value"))
    pairs.groupBy("col_name", "value")
      .agg(count(lit(1)).as("cnt"))
      .withColumn("rank", row_number().over(w).cast(LongType))
      .where(col("rank") <= k)
      .orderBy("col_name", "rank")
  }

  /** [[mcv]] as DuckDB SQL over `table` — the same explode/count/rank
    * shape, with the same (cnt desc, value asc) tie-break. */
  def mcvDuckDbSql(table: String, cols: Seq[String], k: Int): String = {
    val arms = cols.map(c =>
      s"SELECT '$c' AS col_name, CAST($c AS VARCHAR) AS value FROM $table WHERE $c IS NOT NULL")
    s"""WITH pairs AS (
       |${arms.mkString("\nUNION ALL\n")}
       |), counts AS (
       |  SELECT col_name, value, count(*) AS cnt FROM pairs GROUP BY 1, 2
       |), ranked AS (
       |  SELECT col_name, value, cnt,
       |    row_number() OVER (PARTITION BY col_name
       |                       ORDER BY cnt DESC, value) AS rank
       |  FROM counts
       |)
       |SELECT col_name, value, cnt, rank FROM ranked
       |WHERE rank <= $k ORDER BY col_name, rank""".stripMargin
  }

  /** The same profile as DuckDB SQL over `table` — one UNION ALL arm
    * per metric, replaying the identical integer arithmetic. */
  def duckDbSql(table: String, specs: Seq[ColSpec], k: Int = 512): String = {
    require(specs.forall(!_.name.contains("~")),
      "column names must not contain the reserved '~' separator")
    val numerator = (k - 1).toLong << 52
    val arms = Seq(
      s"SELECT '_table_' AS col_name, 'rows' AS metric, CAST(count(*) AS DOUBLE) AS value FROM $table") ++
      specs.flatMap { s =>
        val n = s.name
        val base = Seq(
          s"SELECT '$n', 'count', CAST(count($n) AS DOUBLE) FROM $table",
          s"SELECT '$n', 'nulls', CAST(count(*) - count($n) AS DOUBLE) FROM $table")
        val mm = s.kind match {
          case Num => Seq(
            s"SELECT '$n', 'min', CAST(min($n) AS DOUBLE) FROM $table",
            s"SELECT '$n', 'max', CAST(max($n) AS DOUBLE) FROM $table")
          case Str => Seq(
            s"SELECT '$n', 'min_len', CAST(min(len($n)) AS DOUBLE) FROM $table",
            s"SELECT '$n', 'max_len', CAST(max(len($n)) AS DOUBLE) FROM $table")
          case Ts => Seq(
            s"SELECT '$n', 'min', CAST(epoch_us(min($n)) AS DOUBLE) FROM $table",
            s"SELECT '$n', 'max', CAST(epoch_us(max($n)) AS DOUBLE) FROM $table")
        }
        val sketch =
          if (!s.distinct) Nil
          else Seq(
            s"""SELECT '$n', 'distinct_kmv',
               |  CAST(CASE WHEN max(nd) < $k THEN max(nd)
               |       ELSE $numerator // greatest(max(CASE WHEN rn = $k THEN h END), 1)
               |       END AS DOUBLE)
               |FROM (SELECT h, row_number() OVER (ORDER BY h) AS rn,
               |        count(*) OVER () AS nd
               |      FROM (SELECT DISTINCT
               |              ('0x' || substr(md5(CAST($n AS VARCHAR)), 1, 13))::BIGINT AS h
               |            FROM $table WHERE $n IS NOT NULL))""".stripMargin)
        base ++ mm ++ sketch
      }
    s"""SELECT * FROM (
       |${arms.mkString("\nUNION ALL\n")}
       |) ORDER BY col_name, metric""".stripMargin
  }
}
