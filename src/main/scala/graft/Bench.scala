package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
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
    val selected = only match {
      case Some(names) => SparkEntry.queries.filter { case (n, _) => names(n) }
      case None => SparkEntry.queries
    }
    // A failing query must be VISIBLE in the output: it gets a negative
    // duration in `queries` and an entry in `errors` — never a silent
    // fast "win". `total` sums successful queries only.
    var errors = List.empty[(String, String)]
    val results = selected.map { case (name, fn) =>
      val t0 = System.nanoTime()
      val ok =
        try { fn(spark, sfDir).count(); true }
        catch {
          case e: Throwable =>
            errors ::= name -> e.toString.replaceAll("""["\\\n\r\t]""", " ").take(200)
            false
        }
      val dt = (System.nanoTime() - t0) / 1e9
      // Release checkpointed blocks of the finished query so block-
      // manager pressure doesn't bleed into the next measurement —
      // unpersist the checkpoint RDDs directly (GC + ContextCleaner
      // would reclaim them eventually, but 'eventually' lands inside
      // the NEXT query's timing).
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
      spark.sqlContext.clearCache()
      System.gc()
      name -> (if (ok) dt else -dt)
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val errJson = errors.reverse.map { case (k, m) => s"\"$k\":\"$m\"" }
      .mkString("{", ",", "}")
    val total = results.values.filter(_ >= 0).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$errJson,"sf":"$sfDir"}""")
    if (errors.nonEmpty) { spark.stop(); sys.exit(1) }
    spark.stop()
  }
}
