package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Temporal joins Spark lacks as built-ins, expressed shuffle-minimal.
  *
  * The as-of join (point-in-time join: for each left row, the most
  * recent right row with rightTime ≤ leftTime for the same key) is NOT
  * implemented as a join at all: both sides union into one stream
  * tagged by side, one window pass per key carries the latest right
  * payload forward, and left rows filter back out. One shuffle by key
  * + one sort — no O(left × candidate) probe amplification, no
  * inequality-join fallback to broadcast-nested-loop, and skew is
  * bounded by per-key row counts. This is the canonical distributed
  * as-of strategy (what time-series engines do under the name
  * "union-merge").
  */
object Temporal {

  /** As-of join. `left` keeps all its columns; each of `payloadCols`
    * (columns of `right`) is filled with the value from the latest
    * right row at-or-before the left row's `timeCol` for the same
    * `keys` (null if no such row). Right rows must be unique per
    * (keys, timeCol) — pre-aggregate if not. Ties at the exact same
    * timestamp resolve right-before-left (ASOF `>=` semantics).
    *
    * `direction = "forward"` flips the search: the EARLIEST right row
    * at-or-after the left time (ASOF `<=`) — "next quote after the
    * order", "next deploy after the alert". Same union-merge shape
    * with the window frame reversed (first-following instead of
    * last-preceding); at an exact timestamp tie the right row still
    * matches (at-or-after). */
  def asofJoin(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      timeCol: String,
      payloadCols: Seq[String],
      direction: String = "backward"): DataFrame = {
    require(direction == "backward" || direction == "forward",
      s"direction must be backward|forward, got $direction")
    val leftCols = left.columns.toSeq
    // The matched right row travels as ONE struct: a per-payload-column
    // `last(..., ignoreNulls)` would skip a genuinely-NULL payload value
    // (returning an older row's value) and could even mix columns from
    // different right rows. The struct is never null on a right-side
    // row, so `last(ignoreNulls)` carries exactly the latest right ROW,
    // NULLs in its payload included — ASOF semantics.
    val payloadT = StructType(payloadCols.map(c => right.schema(c)))
    val lSide = left
      .withColumn("__payload", lit(null).cast(payloadT))
      .withColumn("__side", lit(1))
    val rKeep = keys :+ timeCol
    val rExtra = leftCols.filterNot(rKeep.contains)
    val rSide = rExtra.foldLeft(
      right.select((rKeep.map(col) :+
        struct(payloadCols.map(col): _*).as("__payload")): _*)
        .withColumn("__side", lit(0))) {
      (df, c) => df.withColumn(c, lit(null).cast(left.schema(c).dataType))
    }
    val allCols = leftCols :+ "__payload" :+ "__side"
    val u = lSide.select(allCols.map(col): _*)
      .unionByName(rSide.select(allCols.map(col): _*))
    val carried = (if (direction == "backward") {
      val w = Window.partitionBy(keys.map(col): _*)
        .orderBy(col(timeCol), col("__side"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      u.withColumn("__c", last(col("__payload"), ignoreNulls = true).over(w))
    } else {
      // forward: at an equal timestamp the left row (side 1) sorts
      // BEFORE the right row (side 0 under desc), so the right row is
      // inside the current-row→following frame — at-or-after matches
      val w = Window.partitionBy(keys.map(col): _*)
        .orderBy(col(timeCol), col("__side").desc)
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
      u.withColumn("__c", first(col("__payload"), ignoreNulls = true).over(w))
    }).where(col("__side") === 1)
    payloadCols.foldLeft(carried) { (df, c) =>
        df.withColumn(c, col("__c").getField(c))
      }
      .select((leftCols ++ payloadCols).map(col): _*)
  }

  /** SCD Type 2 compile: a keyed changelog becomes a VERSIONED
    * dimension — each maximal run of consecutive identical `attrCol`
    * values (in `offsetCol` order per `keyCol`) is one validity
    * interval. `attrCol` may be a STRUCT column: multi-attribute SCD2
    * falls out of struct equality in the run-break compare
    * (Scd2Spec pins it). Emits one row per version: `valid_from` = the offset
    * that opened the run, `valid_to` = the offset of the next change
    * (−1 for the open version), `is_current` = 1 on the open version.
    * This is the history-preserving counterpart of latest-per-key
    * compaction (the reference keeps only current state,
    * topic/KafkaTopic.java:193-205; SCD2 is what a warehouse keeps so
    * point-in-time queries can join "as of" any offset).
    *
    * Shape at scale: ONE shuffle on `keyCol`; the change filter (lag)
    * runs in that partitioning and discards every no-op change row
    * BEFORE the lead pass, so the second window sees only version
    * boundaries — under real CDC traffic (mostly-unchanged upserts)
    * the heavy frame never materializes a second time, and Catalyst
    * plans both windows in the same exchange with no re-sort. */
  def scd2(
      changelog: DataFrame,
      keyCol: String,
      attrCol: String,
      offsetCol: String): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col(offsetCol))
    changelog
      .select(col(keyCol), col(offsetCol), col(attrCol))
      .withColumn("__prev", lag(col(attrCol), 1).over(w))
      .where(col("__prev").isNull || col("__prev") =!= col(attrCol))
      .withColumn("__next", lead(col(offsetCol), 1).over(w))
      .select(col(keyCol), col(attrCol),
        col(offsetCol).cast("long").as("valid_from"),
        coalesce(col("__next"), lit(-1L)).cast("long").as("valid_to"),
        when(col("__next").isNull, 1L).otherwise(0L).as("is_current"))
  }

  /** Time-in-state (dwell) aggregation: the analytic READOUT of the
    * [[scd2]] interval model — how long does each `attrCol` state hold,
    * summed over every validity interval, with the still-open interval
    * closed at `horizon` (the observation end; an open interval has no
    * duration without one). The session-time / state-occupancy metric
    * a warehouse derives from its version table.
    *
    * Same shape and contract as [[scd2]]: ONE shuffle on `keyCol`, the
    * run-break filter (lag) discards no-op rows before the lead pass,
    * both windows plan in the same exchange; `timeCol` must be unique
    * per key (pre-aggregate ties). The final per-state rollup is a
    * map-side-combined aggregate over the already-collapsed interval
    * rows — |states| results, corpus never re-shuffles.
    *
    * Output: (state, total_dwell, n_intervals) — duration in
    * `timeCol`'s own unit. */
  def dwell(
      changelog: DataFrame,
      keyCol: String,
      attrCol: String,
      timeCol: String,
      horizon: Long): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col(timeCol))
    changelog
      .select(col(keyCol), col(timeCol), col(attrCol))
      .withColumn("__prev", lag(col(attrCol), 1).over(w))
      .where(col("__prev").isNull || col("__prev") =!= col(attrCol))
      .withColumn("__next", lead(col(timeCol), 1).over(w))
      .select(col(attrCol).as("state"),
        (coalesce(col("__next"), lit(horizon)).cast("long") -
          col(timeCol).cast("long")).as("__dur"))
      .groupBy(col("state"))
      .agg(sum(col("__dur")).as("total_dwell"),
        count(lit(1)).as("n_intervals"))
  }

  /** Interval union per key ("islands and gaps"): merge overlapping or
    * touching [start, end) intervals and report per-key coverage — the
    * activity-time / uptime / sensor-coverage readout, and the dual of
    * [[dwell]] (dwell sums BETWEEN state changes; this sums the union
    * of explicitly-given intervals, where overlaps must not double
    * count).
    *
    * Classic windowed formulation, one shuffle on `keyCol`: order each
    * key's intervals by (start, end), an island BREAK is a start
    * strictly beyond the running max of all previous ends, the island
    * id is the running sum of breaks, and each (key, island) group
    * reduces to its span. All integer arithmetic on the time values —
    * engine-exact under any partitioning because the two windows read
    * a pinned (start, end) order. Per-key row counts bound the sort;
    * the island rollup is map-side combinable.
    *
    * Output: (key, n_islands, covered) — covered in the time unit of
    * the inputs, end exclusive. */
  def mergeIntervals(
      df: DataFrame,
      keyCol: String,
      startCol: String,
      endCol: String): DataFrame = {
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col("__s"), col("__e"))
    val prevMax = max(col("__e"))
      .over(w.rowsBetween(Window.unboundedPreceding, -1))
    val breaks = df
      .select(col(keyCol), col(startCol).cast("long").as("__s"),
        col(endCol).cast("long").as("__e"))
      .withColumn("__brk",
        when(col("__s") > coalesce(prevMax, lit(Long.MinValue)), 1L)
          .otherwise(0L))
      .withColumn("__isl",
        sum(col("__brk")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
    breaks
      .groupBy(col(keyCol), col("__isl"))
      .agg(min(col("__s")).as("__lo"), max(col("__e")).as("__hi"))
      .groupBy(col(keyCol))
      .agg(count(lit(1)).as("n_islands"),
        sum(col("__hi") - col("__lo")).as("covered"))
  }

  /** First-order Markov transition model over per-key ordered event
    * sequences — the behavioral-analytics complement of the funnel
    * (funnels count a FIXED path; this estimates the full
    * state-transition matrix: where do users actually go next?).
    *
    * ONE shuffle on `keyCol` for the lag pass (per-key sort, order
    * pinned by (`orderCol`, `tiebreakCol`) so equal timestamps can't
    * flip pairs between engines); transition pairs then reduce
    * map-side to the |states|² matrix. The row-normalizing total joins
    * back as a BROADCAST (the matrix is states-bounded, corpus
    * independent). Probability = round(cnt/total, 6) — one IEEE divide
    * on exact integers, both engines agree.
    *
    * Output: (from_state, to_state, cnt, p). */
  def transitions(
      df: DataFrame,
      keyCol: String,
      orderCol: String,
      tiebreakCol: String,
      stateCol: String): DataFrame = {
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(orderCol), col(tiebreakCol))
    val pairs = df
      .select(col(keyCol), col(orderCol), col(tiebreakCol),
        col(stateCol).as("to_state"))
      .withColumn("from_state", lag(col("to_state"), 1).over(w))
      .where(col("from_state").isNotNull)
      .groupBy("from_state", "to_state")
      .agg(count(lit(1)).as("cnt"))
    val totals = pairs.groupBy("from_state")
      .agg(sum(col("cnt")).as("__tot"))
    pairs.join(broadcast(totals), "from_state")
      .select(col("from_state"), col("to_state"), col("cnt"),
        round(col("cnt").cast("double") / col("__tot").cast("double"), 6)
          .as("p"))
  }

  /** Self range-join count: for every row, how many rows with the same
    * `keys` fall in the half-open time window (t, t + window]. A naive
    * formulation is an inequality join, which Spark plans as a
    * broadcast-nested-loop; instead both sides bucket by
    * `timeCol div window` and join as an EQUI-join on (keys, bucket) —
    * any row in (t, t+window] lives in the same or the next bucket, so
    * each left row probes exactly two buckets and the shuffle is keyed,
    * AQE-skew-splittable, and scales with rows-per-bucket density
    * rather than pair count. */
  def rangeCount(
      df: DataFrame,
      keys: Seq[String],
      timeCol: String,
      idCol: String,
      window: Long,
      resultCol: String): DataFrame = {
    val base = df.select((idCol +: timeCol +: keys).distinct.map(col): _*)
    // integer `div`, not double `/`: at nanosecond magnitudes a double
    // quotient can round across a bucket boundary
    val bucket = expr(s"`$timeCol` div ${window}L")
    val probes = base.withColumn("__b",
      explode(array(bucket, bucket + 1)))
    val rights = base.select(
      (keys.map(col) :+ col(timeCol).as("__t2") :+ bucket.as("__b")): _*)
    val counts = probes.join(rights, keys :+ "__b")
      .where(col("__t2") > col(timeCol) &&
        col("__t2") <= col(timeCol) + window)
      .groupBy(idCol).agg(count(lit(1)).as(resultCol))
    base.select(col(idCol))
      .join(counts, Seq(idCol), "left_outer")
      .select(col(idCol), coalesce(col(resultCol), lit(0L)).as(resultCol))
  }

  /** Bounded-lookback temporal PAIR join — [[rangeCount]]'s
    * payload-carrying sibling: every left row pairs with every right
    * row of the same key whose `rightTime` falls in
    * [leftTime − window, leftTime). Where rangeCount only counts,
    * this emits the matched rows themselves (multi-touch attribution,
    * feature lookback, context gathering), so the output is the true
    * pair multiset — proportional to the real match count, which the
    * bounded window keeps finite at any scale.
    *
    * Same no-inequality-join decomposition: time buckets of exactly
    * `window` ns; each right row lands in ONE bucket, each left row
    * probes TWO (its own and the previous), so every qualifying pair
    * meets exactly once in a keyed EQUIJOIN — no
    * broadcast-nested-loop, no duplicate pairs to dedup, and skew is
    * bounded by per-(key, bucket) density.
    *
    * Both time columns are integer (nanosecond) epochs; `leftTime`
    * and `rightTime` must be distinct column names. Output: all left
    * columns + all right payload columns. */
  def windowJoin(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTime: String,
      rightTime: String,
      window: Long): DataFrame = {
    require(leftTime != rightTime,
      s"leftTime and rightTime must differ, both were '$leftTime'")
    require(window > 0, s"window must be positive, got $window")
    val bucketL = expr(s"`$leftTime` div ${window}L")
    val probes = left.withColumn("__b",
      explode(array(bucketL - 1, bucketL)))
    val rights = right.withColumn("__b", expr(s"`$rightTime` div ${window}L"))
    probes.join(rights, keys :+ "__b")
      .where(col(rightTime) < col(leftTime) &&
        col(rightTime) >= col(leftTime) - window)
      .drop("__b")
  }

  /** Per-key OLS trend: slope and intercept of the least-squares line
    * of `valueCol` (milli-quantized) over `timeCol` (caller supplies
    * integer SECONDS — small enough that every moment sum below stays
    * exact; µs would square to 1e24 and demand wider arithmetic).
    *
    * Closed form from five exact sums — n, Σt, Σv, Σtv, Σt² — with
    * time re-based to the key's own min(t) so magnitudes stay small
    * and the intercept means "value at the key's first observation".
    * All sums and cross-products are DECIMAL(38,0) (Spark) / HUGEINT
    * (DuckDB) — exact in both; the two double divisions at the end
    * are shared bit-for-bit. One shuffle total: the re-base min
    * computes inside the same keyed aggregate via min(t), and the
    * moments use the shift identities (Σ(t−m) = Σt − n·m, etc.) so a
    * second pass over the data never happens.
    *
    * @return (key, n, slope, intercept) — slope in milli-value/second
    *         (rounded 9), intercept in milli-value (rounded 6); keys
    *         with a degenerate time spread (all observations in one
    *         second) are dropped
    */
  def trend(
      df: DataFrame,
      keyCol: String,
      timeCol: String,
      valueCol: String): DataFrame = {
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    val agg = df
      .select(col(keyCol), col(timeCol).as("__t"),
        expr(s"CAST(round($valueCol * 1000) AS BIGINT)").as("__vm"))
      .groupBy(col(keyCol))
      .agg(count(lit(1)).cast(dec).as("n"),
        min(col("__t")).cast(dec).as("m"),
        sum(col("__t").cast(dec)).as("st"),
        sum(col("__vm").cast(dec)).as("sv"),
        sum(col("__t").cast(dec) * col("__vm")).as("stv"),
        sum(col("__t").cast(dec) * col("__t")).as("stt"))
      // shift t by the key's min via the moment identities — exact
      .select(col(keyCol), col("n"), col("sv"),
        (col("st") - col("n") * col("m")).as("rt"),
        (col("stv") - col("m") * col("sv")).as("rtv"),
        (col("stt") - lit(2).cast(dec) * col("m") * col("st") +
          col("n") * col("m") * col("m")).as("rtt"))
    val den = col("n") * col("rtt") - col("rt") * col("rt")
    val num = col("n") * col("rtv") - col("rt") * col("sv")
    agg.where(den =!= lit(0).cast(dec))
      .select(col(keyCol), col("n").cast("long").as("n"),
        round(num.cast("double") / den.cast("double"), 9).as("slope"),
        round((col("sv").cast("double") -
          round(num.cast("double") / den.cast("double"), 9) *
            col("rt").cast("double")) / col("n").cast("double"), 6)
          .as("intercept"))
  }

  /** Time-weighted average (TWAP) of `valueCol` per key: each
    * observation holds until the key's NEXT observation, so it weighs
    * by that gap; the final observation has no successor and drops
    * (classic last-interval-open TWAP). One shuffle on the key, one
    * ordered window — tie-broken by `tieCol` so equal timestamps order
    * identically on any engine.
    *
    * Exactness recipe: the value quantizes to integer millis
    * (round(v·1000)), the gap is an integer time delta, and the
    * weighted sum accumulates as DECIMAL — no float summation order
    * anywhere; the single double division happens once per key at the
    * end and both engines share it bit-for-bit.
    *
    * @return (key, twap, total_dur, n_intervals), keys with zero total
    *         duration dropped (no time to weight over)
    */
  def twap(
      df: DataFrame,
      keyCol: String,
      timeCol: String,
      tieCol: String,
      valueCol: String): DataFrame = {
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(timeCol), col(tieCol))
    df.select(col(keyCol), col(timeCol), col(tieCol),
        expr(s"CAST(round($valueCol * 1000) AS BIGINT)").as("__vm"))
      .withColumn("__next", lead(col(timeCol), 1).over(w))
      .where(col("__next").isNotNull)
      .select(col(keyCol),
        (col("__next") - col(timeCol)).as("__dur"), col("__vm"))
      .groupBy(col(keyCol))
      .agg(
        sum(col("__vm").cast(org.apache.spark.sql.types.DecimalType(38, 0)) *
          col("__dur")).as("__num"),
        sum(col("__dur")).as("total_dur"),
        count(lit(1)).as("n_intervals"))
      .where(col("total_dur") > 0)
      .select(col(keyCol),
        round(col("__num").cast("double") / col("total_dur") / 1000.0, 6)
          .as("twap"),
        col("total_dur"), col("n_intervals"))
  }

  /** Per-key autocorrelation function at lags 1..`maxLag` — the
    * time-series profiling companion of [[trend]]: is the per-key
    * signal persistent (r₁ ≈ 1), mean-reverting (r₁ < 0), or white
    * noise?
    *
    * Exactness recipe (same family as trend): values quantize to
    * integer cents, the mean never materializes as a float — every
    * centered product multiplies through by n, i.e. rₖ's numerator is
    * Σₜ (n·cₜ − S)(n·cₜ₊ₖ − S) expanded to pure integer moment sums
    * (n²·Σ cₜcₜ₊ₖ − n·S·(Pₖ + Qₖ) + (n−k)·S², where Pₖ/Qₖ are the
    * all-but-last-k / all-but-first-k partial sums — both fall out of
    * the SAME lead() window as the cross-product, so the sequence
    * shuffles once and aggregates once). All moments are
    * DECIMAL(38,0) (DuckDB: HUGEINT); the one double divide per lag
    * happens at the end, shared bit-for-bit with the oracle.
    *
    * Sequence order is (`timeCol`, `tieCol`) — the tiebreak keeps the
    * lag-k neighbor identical on any engine when timestamps collide.
    *
    * @return (key, n, acf_1 .. acf_maxLag) — keys with n ≤ maxLag or
    *         zero variance are dropped; a lag whose numerator is
    *         empty never survives the n filter.
    */
  def acf(
      df: DataFrame,
      keyCol: String,
      timeCol: String,
      tieCol: String,
      valueCol: String,
      maxLag: Int = 3): DataFrame = {
    require(maxLag >= 1, s"maxLag must be >= 1, got $maxLag")
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(timeCol), col(tieCol))
    val lagged = (1 to maxLag).foldLeft(
      df.select(col(keyCol), col(timeCol), col(tieCol),
        expr(s"CAST(round($valueCol * 100) AS BIGINT)").as("__c"))) {
      (d, k) => d.withColumn(s"__l$k", lead(col("__c"), k).over(w))
    }
    val c = col("__c").cast(dec)
    val moments =
      Seq(count(lit(1)).cast(dec).as("n"), sum(c).as("s"),
        sum(c * c).as("s2")) ++
      (1 to maxLag).flatMap { k =>
        val lk = col(s"__l$k")
        Seq(
          sum(when(lk.isNotNull, c * lk.cast(dec))).as(s"sc$k"),
          // Pₖ = Σ of the first n−k values (rows that HAVE a lag-k
          // successor); Qₖ = Σ of the last n−k values (the successors
          // themselves) — both from the same window pass.
          sum(when(lk.isNotNull, c)).as(s"p$k"),
          sum(lk.cast(dec)).as(s"q$k"))
      }
    val agg = lagged.groupBy(col(keyCol)).agg(moments.head, moments.tail: _*)
    val n = col("n"); val s = col("s")
    val denom = n * n * col("s2") - n * s * s
    val outCols = Seq(col(keyCol), n.cast("long").as("n")) ++
      (1 to maxLag).map { k =>
        val num = n * n * col(s"sc$k") -
          n * s * (col(s"p$k") + col(s"q$k")) +
          (n - lit(k).cast(dec)) * s * s
        round(num.cast("double") / denom.cast("double"), 9).as(s"acf_$k")
      }
    agg.where(n > lit(maxLag).cast(dec) && denom =!= lit(0).cast(dec))
      .select(outCols: _*)
  }

  /** CUSUM changepoint scan per key: the cumulative sum of deviations
    * from the key's own mean, whose peak |CUSUM| marks the most likely
    * single change point (Page 1954 / the standard offline CUSUM
    * statistic). Mean-free integer math: deviations scale through by n
    * (devₜ = n·cₜ − S, an integer), so the running sum, its peak, and
    * the argmax are exact on both engines — no float accumulates
    * anywhere.
    *
    * Two keyed stages that share one hash partitioning: the (n, S)
    * aggregate joins back onto the sequence (co-partitioned — no
    * second shuffle of the big side beyond the window sort), then the
    * running sum + peak-argmax reduce per key. The change point
    * reports as the FIRST `tieCol` achieving the peak.
    *
    * @return (key, n, cp — tieCol at the peak, stat = max |cusum|;
    *          stat/n² is the mean-scaled deviation if callers want to
    *          normalize); single-row keys drop (no interior point to
    *          split at).
    */
  def cusum(
      df: DataFrame,
      keyCol: String,
      timeCol: String,
      tieCol: String,
      valueCol: String): DataFrame = {
    val seq0 = df.select(col(keyCol), col(timeCol), col(tieCol),
      expr(s"CAST(round($valueCol * 100) AS BIGINT)").as("__c"))
    val stats = seq0.groupBy(col(keyCol))
      .agg(count(lit(1)).as("n"), sum(col("__c")).as("s"))
      .where(col("n") > 1)
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(timeCol), col(tieCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    seq0.join(stats, Seq(keyCol))
      .withColumn("__cum", sum(col("n") * col("__c") - col("s")).over(w))
      .groupBy(col(keyCol))
      .agg(max(col("n")).as("n"),
        // argmax with first-tie preference: order by (-|cum|, tie)
        min(struct((-abs(col("__cum"))).as("a"), col(tieCol).as("t")))
          .as("__m"))
      .select(col(keyCol), col("n"),
        col("__m.t").as("cp"), (-col("__m.a")).as("stat"))
  }
}
