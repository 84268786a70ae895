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

  /** Equi-width histograms per numeric column — the third catalog
    * statistic next to [[profile]] (counts/min-max/distinct) and
    * [[mcv]] (heavy hitters): the value-distribution shape a CBO uses
    * for range-selectivity estimates.
    *
    * Two passes by necessity (bin bounds depend on min/max): pass 1 is
    * one tiny min/max aggregate whose single row reaches the driver —
    * 2·|cols| longs, metadata in Layout.zorderLayout's sense — and
    * pass 2 is ONE scan where every row buckets map-side for all
    * columns at once (explode to (col, bin) pairs, map-side-combined
    * count; the shuffle carries ≤ |cols|·bins partials per partition).
    *
    * INTEGER bin math so both engines agree bit-for-bit: values floor
    * to BIGINT (an explicit floor — a bare double→int cast truncates
    * in Spark but rounds half-even in DuckDB), width is the ceiling
    * division (max−min+bins) div bins ≥ 1, bucket = (v−min) div
    * width ∈ [0, bins). Empty bins are absent from the output (sparse
    * — at 100 TB a dense bins×cols frame is noise rows).
    *
    * Output: (col_name, bin, lo, hi, cnt) — [lo, hi] the CLOSED
    * integer range of the bin — ordered by (col_name, bin). */
  def histogram(df: DataFrame, cols: Seq[String], bins: Int): DataFrame = {
    require(cols.nonEmpty && bins >= 1 && bins <= 10000,
      s"need 1 <= bins <= 10000 and at least one column")
    val statAggs = cols.flatMap { c =>
      Seq(min(floor(col(c))).cast(LongType).as(s"mn_$c"),
        max(floor(col(c))).cast(LongType).as(s"mx_$c"))
    }
    val row = df.agg(statAggs.head, statAggs.tail: _*).collect()(0)
    val live = cols.zipWithIndex.filter { case (_, i) => !row.isNullAt(2 * i) }
    if (live.isEmpty)
      // empty table (or all-null columns): no bins, not an NPE
      return df.select(lit("").as("col_name"), lit(0L).as("bin"),
        lit(0L).as("lo"), lit(0L).as("hi"), lit(0L).as("cnt")).limit(0)
    val width = live.map { case (c, i) =>
      val (mn, mx) = (row.getLong(2 * i), row.getLong(2 * i + 1))
      c -> ((mn, (mx - mn + bins) / bins))
    }.toMap
    val entries = live.map { case (c, _) =>
      val (mn, w) = width(c)
      struct(lit(c).as("col_name"),
        when(col(c).isNotNull,
          expr(s"(cast(floor(`$c`) as bigint) - ${mn}L) div ${w}L"))
          .as("bin"))
    }
    val counted = df
      .select(explode(array(entries: _*)).as("p"))
      .where(col("p.bin").isNotNull)
      .groupBy(col("p.col_name").as("col_name"), col("p.bin").as("bin"))
      .agg(count(lit(1)).as("cnt"))
    val loCol = live.foldLeft(lit(null).cast(LongType)) { case (acc, (c, _)) =>
      val (mn, w) = width(c)
      when(col("col_name") === c, lit(mn) + col("bin") * lit(w)).otherwise(acc)
    }
    val wCol = live.foldLeft(lit(null).cast(LongType)) { case (acc, (c, _)) =>
      when(col("col_name") === c, lit(width(c)._2)).otherwise(acc)
    }
    counted
      .withColumn("lo", loCol)
      .withColumn("hi", col("lo") + wCol - 1L)
      .select(col("col_name"), col("bin"), col("lo"), col("hi"), col("cnt"))
      .orderBy("col_name", "bin")
  }

  /** Equi-DEPTH histogram boundaries — the quantile companion of the
    * equi-width [[histogram]]: k−1 split values putting (as near as
    * the data allows) n/k rows in each bucket, which is what a range
    * partitioner or a CBO's equi-height histogram actually wants
    * (equi-width wastes buckets on empty ranges under skew).
    *
    * The 100 TB shape is q_quantile_sketch's: values floor to an
    * integer grid, ALL columns bucket in ONE map-side-combined scan
    * (explode to (col, v) pairs), and the ordered CDF window runs over
    * the per-column VALUE GRID — bounded by the value range, never the
    * corpus. Boundary b = the smallest grid value whose cumulative
    * count reaches rank ⌈b·n/k⌉ — pure integer arithmetic, engine
    * exact, ties impossible (ranks are fixed integers, cum is
    * monotone).
    *
    * Output: (col_name, b, boundary, n) for b in 1..k−1, ordered. */
  def equiDepthBoundaries(df: DataFrame, cols: Seq[String],
      k: Int): DataFrame = {
    require(cols.nonEmpty && k >= 2 && k <= 10000,
      "need >= 1 column and 2 <= k <= 10000")
    val pairs = df
      .select(explode(array(cols.map(c =>
        struct(lit(c).as("col_name"),
          floor(col(c)).cast(LongType).as("v"))): _*)).as("p"))
      .where(col("p.v").isNotNull)
      .select(col("p.col_name").as("col_name"), col("p.v").as("v"))
    val wcum = org.apache.spark.sql.expressions.Window
      .partitionBy("col_name").orderBy("v")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val wn = org.apache.spark.sql.expressions.Window.partitionBy("col_name")
    pairs.groupBy("col_name", "v").agg(count(lit(1)).as("c"))
      .withColumn("cum", sum(col("c")).over(wcum))
      .withColumn("n", sum(col("c")).over(wn))
      .select(col("col_name"), col("v"), col("cum"), col("n"),
        explode(sequence(lit(1L), lit((k - 1).toLong))).as("b"))
      .where(col("cum") >= expr(s"(b * n + ${k - 1}) div ${k}L"))
      .groupBy("col_name", "b", "n")
      .agg(min(col("v")).as("boundary"))
      .select(col("col_name"), col("b"), col("boundary"), col("n"))
      .orderBy("col_name", "b")
  }

  /** [[equiDepthBoundaries]] as DuckDB SQL — identical grid CDF and
    * integer rank rule, one arm per column. */
  def equiDepthDuckDbSql(table: String, cols: Seq[String], k: Int): String = {
    val arms = cols.map { c =>
      s"""SELECT '$c' AS col_name, b, min(v) AS boundary, n FROM (
         |  SELECT g.v, g.cum, g.n, u.b FROM (
         |    SELECT v, sum(c) OVER (ORDER BY v
         |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
         |      sum(c) OVER () AS n
         |    FROM (SELECT CAST(floor($c) AS BIGINT) AS v, count(*) AS c
         |          FROM $table WHERE $c IS NOT NULL GROUP BY 1)) g,
         |    unnest(range(1, $k)) AS u(b)
         |  WHERE g.cum >= (u.b * g.n + ${k - 1}) // $k)
         |GROUP BY b, n""".stripMargin
    }
    s"""SELECT col_name, CAST(b AS BIGINT) AS b,
       |  CAST(boundary AS BIGINT) AS boundary, CAST(n AS BIGINT) AS n FROM (
       |${arms.mkString("\nUNION ALL\n")}
       |) ORDER BY col_name, b""".stripMargin
  }

  /** Two-sample Kolmogorov–Smirnov distance on an integer grid — the
    * distribution-drift test that closes the profiling family: did
    * THIS week's values come from the same distribution as last
    * week's (or side A's from side B's)? KS needs cumulative
    * distribution functions, and an exact ECDF over raw values is a
    * global sort of the corpus funneled through one ordered window —
    * the single-task cliff. The 100 TB design is q_quantile_sketch's:
    * values bin to integers first (`floor` — engine-portable), the
    * grid aggregates map-side to (bin, count_a, count_b) — bounded by
    * the VALUE RANGE, not the corpus — and the one ordered window runs
    * over that tiny frame. KS on the grid is exact for the binned
    * distributions; binning error is ≤ one bin of CDF shift.
    *
    * INTEGER-EXACT statistic: D = max |cumA·nB − cumB·nA| over bins,
    * reported as (d_num, denom = nA·nB) plus the first bin attaining
    * the max — no float division for engines to disagree on (callers
    * divide for the classical D ∈ [0,1]).
    *
    * Output: one row (d_num, at_bin, n_a, n_b). */
  def ksDistance(df: DataFrame, valueCol: String, sideCol: String,
      sideA: String, sideB: String): DataFrame = {
    val tagged = df
      .where(col(sideCol).isin(sideA, sideB) && col(valueCol).isNotNull)
      .select(floor(col(valueCol)).cast(LongType).as("bin"),
        when(col(sideCol) === sideA, 1L).otherwise(0L).as("ia"))
    val grid = tagged.groupBy("bin")
      .agg(sum(col("ia")).as("a"), sum(lit(1L) - col("ia")).as("b"))
    // ordered window over the GRID (|bins| rows, corpus-independent —
    // the binning above is what makes this single partition safe)
    val w = org.apache.spark.sql.expressions.Window.orderBy("bin")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val tot = grid.agg(sum(col("a")).as("na"), sum(col("b")).as("nb"))
    val cum = grid
      .withColumn("ca", sum(col("a")).over(w))
      .withColumn("cb", sum(col("b")).over(w))
      .crossJoin(broadcast(tot))
      .select(col("bin"),
        abs(col("ca") * col("nb") - col("cb") * col("na")).as("d"),
        col("na"), col("nb"))
    val dmax = cum.agg(max(col("d")).as("d_num"))
    cum.crossJoin(broadcast(dmax))
      .where(col("d") === col("d_num"))
      .groupBy(col("d_num"), col("na"), col("nb"))
      .agg(min(col("bin")).as("at_bin"))
      .select(col("d_num"), col("at_bin"),
        col("na").as("n_a"), col("nb").as("n_b"))
  }

  /** Pearson correlation matrix over numeric columns in ONE
    * aggregation pass — the column-dependence statistic next to
    * [[histogram]] in a catalog (a CBO uses it to de-bias conjunctive
    * selectivity; a feature pipeline uses it to drop redundant
    * columns). A naive `SELECT corr(a, b)` loop is one corpus scan per
    * pair; here every pair's six sufficient statistics (n, Σx, Σy,
    * Σxy, Σx², Σy²) are conditional aggregates in the SAME plan, so
    * the table scans once and the shuffle carries one partial row per
    * partition.
    *
    * ENGINE-EXACT by the repo's standard recipe: inputs cast to
    * DECIMAL(18,2), products/sums accumulate as exact DECIMAL (no
    * float summation order), and only the final r-formula runs in
    * doubles — a fixed scalar expression tree on bit-identical
    * inputs, so both engines produce the same IEEE result, rounded
    * to 6 decimals. Pairwise-complete null handling: each pair's
    * stats count only rows where BOTH columns are non-null.
    *
    * Output: (col_a, col_b, n, corr) for each i<j pair, corr null
    * when either side has zero variance. */
  def corr(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.size >= 2, "corr needs at least two columns")
    val dec = org.apache.spark.sql.types.DecimalType(18, 2)
    val pairs = for {
      i <- cols.indices; j <- (i + 1) until cols.size
    } yield (cols(i), cols(j))
    val aggs = pairs.zipWithIndex.flatMap { case ((a, b), p) =>
      val both = col(a).isNotNull && col(b).isNotNull
      val x = when(both, col(a).cast(dec))
      val y = when(both, col(b).cast(dec))
      Seq(
        count(when(both, lit(1))).as(s"n_$p"),
        sum(x).as(s"sx_$p"), sum(y).as(s"sy_$p"),
        sum(x * y).as(s"sxy_$p"),
        sum(x * x).as(s"sxx_$p"), sum(y * y).as(s"syy_$p"))
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val rows = pairs.zipWithIndex.map { case ((a, b), p) =>
      val nD = col(s"n_$p").cast(DoubleType)
      val (sx, sy) = (col(s"sx_$p").cast(DoubleType), col(s"sy_$p").cast(DoubleType))
      val (sxy, sxx, syy) = (col(s"sxy_$p").cast(DoubleType),
        col(s"sxx_$p").cast(DoubleType), col(s"syy_$p").cast(DoubleType))
      val denx = nD * sxx - sx * sx
      val deny = nD * syy - sy * sy
      struct(lit(a).as("col_a"), lit(b).as("col_b"),
        col(s"n_$p").cast(LongType).as("n"),
        when(denx > 0d && deny > 0d,
          round((nD * sxy - sx * sy) / sqrt(denx * deny), 6)).as("corr"))
    }
    one.select(explode(array(rows: _*)).as("e"))
      .select(col("e.col_a").as("col_a"), col("e.col_b").as("col_b"),
        col("e.n").as("n"), col("e.corr").as("corr"))
      .orderBy("col_a", "col_b")
  }

  /** Join-size estimation from count-min sketches — the AMS/CMS
    * classic a cost-based optimizer runs BEFORE committing to a join
    * order: |A ⋈ B| = Σ_k f_A(k)·f_B(k), estimated as the minimum
    * over depths of the sketch dot product Σ_b cmsA[d][b]·cmsB[d][b]
    * (always ≥ exact — hash collisions only add). Deterministic
    * md5-derived buckets make the estimate (collisions included)
    * exactly reproducible by a SQL oracle — the q_cms_count pattern.
    *
    * Scale shape: per side, one map-side-combined frequency reduce
    * (distinct join keys, not the corpus) feeds a FIXED depth×width
    * sketch aggregate; the dot product joins two sketch tables of
    * ≤ 4·width rows — corpus-independent. The exact answer (reported
    * beside the estimate, the deliberate exact-vs-sketch pair the KMV
    * family established) joins the two REDUCED frequency tables, never
    * executing the data join it predicts.
    *
    * Output: one row (exact_card, cms_estimate). */
  def joinCardinality(a: DataFrame, aKey: String, b: DataFrame,
      bKey: String, width: Int = 1024): DataFrame = {
    def freq(df: DataFrame, k: String) = df
      .where(col(k).isNotNull)
      .groupBy(col(k).cast(StringType).as("key"))
      .agg(count(lit(1)).as("f"))
    def cms(fr: DataFrame) = fr
      .select(explode(sequence(lit(0), lit(3))).as("d"), col("key"), col("f"))
      .select(col("d"),
        TextAnalysis.hashBucket(
          concat(col("d").cast(StringType), lit(":"), col("key")), width)
          .as("bucket"),
        col("f"))
      .groupBy("d", "bucket").agg(sum(col("f")).as("c"))
    val fa = freq(a, aKey)
    val fb = freq(b, bKey)
    val exact = fa.join(fb.select(col("key"), col("f").as("g")), "key")
      .agg(coalesce(sum(col("f") * col("g")), lit(0L)).as("exact_card"))
    val dots = cms(fa)
      .join(cms(fb).select(col("d"), col("bucket"), col("c").as("c2")),
        Seq("d", "bucket"))
      .groupBy("d").agg(sum(col("c") * col("c2")).as("s"))
    // a depth whose sketches share NO occupied bucket has dot product
    // 0 — it must reach the min as 0, not vanish from the groupBy
    // (otherwise two disjoint key sets would "estimate" > 0)
    val est = a.sparkSession.range(4)
      .select(col("id").cast("int").as("d"))
      .join(dots, Seq("d"), "left_outer")
      .agg(min(coalesce(col("s"), lit(0L))).as("cms_estimate"))
    exact.crossJoin(est)
  }

  /** [[corr]] as DuckDB SQL — one arm per pair, replaying the exact
    * DECIMAL sufficient statistics and the identical double-precision
    * r-formula (same parenthesization, same guard, same rounding). */
  def corrDuckDbSql(table: String, cols: Seq[String]): String = {
    val pairs = for {
      i <- cols.indices; j <- (i + 1) until cols.size
    } yield (cols(i), cols(j))
    val arms = pairs.map { case (a, b) =>
      s"""SELECT '$a' AS col_a, '$b' AS col_b, CAST(count(*) AS BIGINT) AS n,
         |  CASE WHEN CAST(count(*) AS DOUBLE) * CAST(sum(x*x) AS DOUBLE)
         |            - CAST(sum(x) AS DOUBLE) * CAST(sum(x) AS DOUBLE) > 0
         |        AND CAST(count(*) AS DOUBLE) * CAST(sum(y*y) AS DOUBLE)
         |            - CAST(sum(y) AS DOUBLE) * CAST(sum(y) AS DOUBLE) > 0
         |  THEN round((CAST(count(*) AS DOUBLE) * CAST(sum(x*y) AS DOUBLE)
         |              - CAST(sum(x) AS DOUBLE) * CAST(sum(y) AS DOUBLE))
         |    / sqrt((CAST(count(*) AS DOUBLE) * CAST(sum(x*x) AS DOUBLE)
         |            - CAST(sum(x) AS DOUBLE) * CAST(sum(x) AS DOUBLE))
         |         * (CAST(count(*) AS DOUBLE) * CAST(sum(y*y) AS DOUBLE)
         |            - CAST(sum(y) AS DOUBLE) * CAST(sum(y) AS DOUBLE))), 6)
         |  END AS corr
         |FROM (SELECT CAST($a AS DECIMAL(18,2)) AS x,
         |             CAST($b AS DECIMAL(18,2)) AS y
         |      FROM $table WHERE $a IS NOT NULL AND $b IS NOT NULL)""".stripMargin
    }
    s"""SELECT * FROM (
       |${arms.mkString("\nUNION ALL\n")}
       |) ORDER BY col_a, col_b""".stripMargin
  }

  /** Mutual information between two categorical columns — the
    * dependence statistic [[corr]] can't see (corr is linear/numeric;
    * MI catches ANY association): the feature-selection and
    * schema-discovery primitive ("does source predict lang?").
    *
    * MI = Σ_ab (c_ab/n)·ln(n·c_ab/(c_a·c_b)) over the joint
    * distribution. ONE corpus pass builds the joint count table
    * (map-side combined, |A|·|B| bounded — the categorical contract,
    * same as [[mcv]]); marginals and the total derive from that tiny
    * frame, never rescanning the corpus. Determinism is lmScore's
    * recipe: each cell's ln rounds to 6 decimals, accumulation is
    * exact DECIMAL weighted by the integer cell count, the final
    * divide is one IEEE op.
    *
    * Output: one row (n, n_cells, mi) — mi in nats, 0 when the
    * columns are independent. Null rows on either side are excluded
    * (null counts are [[profile]]'s job). */
  def mutualInfo(df: DataFrame, colA: String, colB: String): DataFrame = {
    val dec = org.apache.spark.sql.types.DecimalType(30, 6)
    val joint = df
      .where(col(colA).isNotNull && col(colB).isNotNull)
      .groupBy(col(colA).cast(StringType).as("a"),
        col(colB).cast(StringType).as("b"))
      .agg(count(lit(1)).as("c"))
    val wa = org.apache.spark.sql.expressions.Window.partitionBy("a")
    val wb = org.apache.spark.sql.expressions.Window.partitionBy("b")
    val wn = org.apache.spark.sql.expressions.Window.partitionBy()
    joint
      .withColumn("ca", sum(col("c")).over(wa))
      .withColumn("cb", sum(col("c")).over(wb))
      .withColumn("n", sum(col("c")).over(wn))
      .select(col("n"), col("c"),
        round(log((col("n") * col("c")).cast(DoubleType) /
          (col("ca") * col("cb")).cast(DoubleType)), 6).cast(dec).as("l"))
      .groupBy(col("n"))
      .agg(count(lit(1)).as("n_cells"), sum(col("l") * col("c")).as("__s"))
      .select(col("n"), col("n_cells"),
        round(col("__s").cast(DoubleType) / col("n").cast(DoubleType), 6)
          .as("mi"))
  }

  /** [[histogram]] as DuckDB SQL over `table` — the identical floor /
    * ceiling-width / integer-div bin math, one arm per column. */
  def histDuckDbSql(table: String, cols: Seq[String], bins: Int): String = {
    val arms = cols.map { c =>
      s"""SELECT '$c' AS col_name, (v - mn) // w AS bin,
         |  mn + ((v - mn) // w) * w AS lo,
         |  mn + ((v - mn) // w) * w + w - 1 AS hi,
         |  count(*) AS cnt
         |FROM (SELECT CAST(floor($c) AS BIGINT) AS v FROM $table
         |      WHERE $c IS NOT NULL),
         |     (SELECT CAST(floor(min($c)) AS BIGINT) AS mn,
         |        (CAST(floor(max($c)) AS BIGINT)
         |         - CAST(floor(min($c)) AS BIGINT) + $bins) // $bins AS w
         |      FROM $table)
         |GROUP BY 1, 2, 3, 4""".stripMargin
    }
    s"""SELECT col_name, CAST(bin AS BIGINT) AS bin, CAST(lo AS BIGINT) AS lo,
       |  CAST(hi AS BIGINT) AS hi, CAST(cnt AS BIGINT) AS cnt FROM (
       |${arms.mkString("\nUNION ALL\n")}
       |) ORDER BY col_name, bin""".stripMargin
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
