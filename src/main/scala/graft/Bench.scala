package graft
import org.apache.spark.sql.SparkSession

object Bench {

  /** Deterministically release everything a finished query pinned:
    * its localCheckpoint blocks (unpersist BLOCKING — the async form
    * lets block removal bleed into the next query's timing, measured
    * as 1.3-3.9× phantom regressions in earlier rounds), any cached
    * plans, any catalog tables a durable-backend query registered,
    * then a GC so the next measurement starts from a clean heap. */
  private def release(spark: SparkSession): Unit = {
    spark.sparkContext.getPersistentRDDs.values
      .foreach(_.unpersist(blocking = true))
    spark.sqlContext.clearCache()
    spark.catalog.listTables().collect()
      .filter(_.name.startsWith("graft_state_"))
      .foreach(t => spark.sql(s"DROP TABLE IF EXISTS ${t.name}"))
    System.gc()
    // HARD comparability guard: with 118+ queries sharing one JVM, a
    // query that leaks pinned blocks or state tables past its own
    // release taxes every successor's timing silently. Fail the bench
    // loudly instead of best-effort-cleaning and moving on.
    val leakedRdds = spark.sparkContext.getPersistentRDDs
    require(leakedRdds.isEmpty,
      s"leaked persistent RDDs after release: ${leakedRdds.keys.mkString(",")}")
    val leakedTables = spark.catalog.listTables().collect()
      .map(_.name).filter(_.startsWith("graft_state_"))
    require(leakedTables.isEmpty,
      s"leaked state tables after release: ${leakedTables.mkString(",")}")
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Session warm-up, excluded from per-query timings: without it the
    // first query absorbs parquet-footer reads, codegen/janino compile,
    // and shuffle-machinery cold-start (measured ~3-5s attributed to
    // whichever query happens to run first).
    graft.core.Tables.tpch.foreach { t =>
      try graft.core.Tables.load(spark, sfDir, t).limit(1).count()
      catch { case _: Throwable => () }
    }
    spark.range(1 << 18).selectExpr("id % 97 as k")
      .groupBy("k").count().count()
    // Optional local-iteration filter: SPARK_GRAFT_ONLY=q_a,q_b runs a
    // subset; unset (the driver's mode) runs everything.
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).toSet)
    // Deterministic order, streaming pipelines LAST: the q_stream_*
    // queries each spin up a checkpointed state-store runtime whose
    // setup/teardown and GC footprint measurably bleeds into whatever
    // runs next in the shared JVM (see BENCH_AB_r10.md) — isolating
    // them at the tail keeps the batch numbers clean, and a sorted
    // name order makes run-to-run comparisons line up.
    val selected = (only match {
      case Some(names) => SparkEntry.queries.filter { case (n, _) => names(n) }
      case None => SparkEntry.queries
    }).toSeq.sortBy { case (n, _) => (n.startsWith("q_stream_"), n) }
    // A failing query must be VISIBLE in the output: it gets a negative
    // duration in `queries` and an entry in `errors` — never a silent
    // fast "win". `total` sums successful queries only.
    var errors = List.empty[(String, String)]
    def timeOnce(name: String, fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      val ok =
        try { fn(spark, sfDir).count(); true }
        catch {
          case e: Throwable =>
            errors ::= name -> e.toString.replaceAll("""["\\\n\r\t]""", " ").take(200)
            false
        }
      val dt = (System.nanoTime() - t0) / 1e9
      release(spark)
      if (ok) dt else -dt
    }
    // Expensive queries get a second, fully-isolated pass and report
    // the min: two rounds of phantom cross-query regressions (r4 ngram,
    // r5 a 14-query tail cluster) showed a single shared-JVM sample of
    // a multi-second query carries seconds of block-manager/GC noise.
    // The min of two cleanly-separated runs is the standard estimator
    // for that; both passes are emitted so nothing is hidden.
    val retimeAbove = 0.5
    val passes = scala.collection.mutable.LinkedHashMap.empty[String, List[Double]]
    val results = selected.map { case (name, fn) =>
      val t1 = timeOnce(name, fn)
      val ts = if (t1 > retimeAbove) List(t1, timeOnce(name, fn)) else List(t1)
      passes(name) = ts
      val best =
        if (ts.exists(_ < 0)) ts.find(_ < 0).get // any failed pass fails the query
        else ts.min
      name -> best
    }
    def jmap(m: Iterable[(String, String)]): String =
      m.map { case (k, v) => s"\"$k\":$v" }.mkString("{", ",", "}")
    val qs = jmap(results.map { case (k, v) => k -> v.toString })
    val passJson = jmap(passes.collect { case (k, ts) if ts.length > 1 =>
      k -> ts.mkString("[", ",", "]")
    })
    val errJson = errors.reverse
      .map { case (k, m) => s"\"$k\":\"$m\"" }.mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    val line = s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"passes":$passJson,"errors":$errJson,"sf":"$sfDir"}"""
    println(line)
    // The driver's BENCH_rN.json retains only an output TAIL — with
    // 119 queries most per-query numbers fall off it. Persist the full
    // table verbatim (overwritten per run) so round-over-round
    // regression tracking always has every entry. Filtered local runs
    // (SPARK_GRAFT_ONLY set) must NOT clobber the full committed
    // table with a subset — they skip the write unless the caller
    // redirects it explicitly via GRAFT_BENCH_OUT.
    val outFile = sys.env.get("GRAFT_BENCH_OUT")
      .orElse(if (only.isEmpty) Some("bench_results.json") else None)
    outFile.foreach { f =>
      try java.nio.file.Files.writeString(java.nio.file.Paths.get(f), line + "\n")
      catch { case e: Throwable =>
        System.err.println(s"[bench] could not write $f: $e") }
    }
    if (errors.nonEmpty) { spark.stop(); sys.exit(1) }
    spark.stop()
  }
}
