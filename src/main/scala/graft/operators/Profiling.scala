package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, TimestampType}

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

  /** The same profile as DuckDB SQL over `table` — one UNION ALL arm
    * per metric, replaying the identical integer arithmetic. */
  def duckDbSql(table: String, specs: Seq[ColSpec], k: Int = 512): String = {
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
