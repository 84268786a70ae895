package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measurement harness (r17) for the DENSE-BUT-WIDE-universe Jaccard
  * regime — random text over a 9-symbol alphabet with 5-grams
  * (universe ≤ 9⁵ = 59 049 > the 2¹⁵ bitmap cap) and docs long enough
  * that no gram is rare (p10(df) ≫ 8), with planted near-duplicate
  * pairs (shared long prefixes). ScaleGen cannot produce this regime
  * for Jaccard: its rotation corpora cross the bitmap cap only past
  * ~80k docs, already over any blocked tier's nDocs² pair budget.
  *
  * VERDICT (r17, recorded): a sorted-gid-array blocked tier for this
  * regime — the mirror of containment's `containmentDenseBlockedArrays`
  * — was built, measured here, and DELETED: routed 732/746 s vs
  * 22.3/22.1 s forced-prefix at 10 000 docs (33×), 8.9 vs 3.4 s at
  * 1 000. Jaccard's symmetric size + ppjoin count filters keep the
  * prefix path's candidates near the true pair count, while the
  * blocked scan streams both full gid arrays through every joined
  * pair row. With the tier deleted, `auto` and `prefix` take the same
  * plan; the harness stays as the regime's regression probe — if a
  * future tier is re-attempted, these two modes are the A/B.
  *
  * Usage: runMain graft.SweepJaccardWide <nDocs> <auto|prefix> [explainTo]
  * Prints one line: {"n": N, "mode": m, "secs": [pass1, pass2], "pairs": P}
  */
object SweepJaccardWide {
  def main(args: Array[String]): Unit = {
    val nDocs = args(0).toInt
    val mode = args(1)
    val explainTo = args.lift(2)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    import graft.operators.{Dedup, TextAnalysis}

    // Deterministic corpus: 2000-char docs over 'a'..'i'; every 4th
    // doc shares a 1500-char prefix with its predecessor (J ≈ 0.75 of
    // the union at the 5-gram level — comfortably over τ = 3/5).
    val rnd = new scala.util.Random(97)
    val base = IndexedSeq.fill(nDocs)(
      Array.fill(2000)(('a' + rnd.nextInt(9)).toChar).mkString)
    val texts = base.zipWithIndex.map { case (t, i) =>
      if (i % 4 == 1) base(i - 1).substring(0, 1500) + t.substring(1500) else t
    }
    val rows = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text").repartition(cpus.toInt)
      .localCheckpoint(true) // corpus build cost out of the timed region
    val arrs = TextAnalysis.gramArrays(rows, "doc_id", "text", 5)

    def run() = {
      val pairs = mode match {
        case "prefix" => Dedup.ngramJaccardPairs(arrs, "doc_id", 3, 5,
          denseUniverseMax = 0L)
        case _ => Dedup.ngramJaccardPairs(arrs, "doc_id", 3, 5)
      }
      explainTo.foreach { p =>
        val w = new java.io.PrintWriter(p)
        try w.write(pairs.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode))
        finally w.close()
      }
      val t0 = System.nanoTime()
      val n = pairs.count()
      ((System.nanoTime() - t0) / 1e9, n)
    }
    val (s1, p1) = run()
    spark.sqlContext.clearCache()
    val (s2, p2) = run()
    require(p1 == p2, s"pair count drift across passes: $p1 vs $p2")
    println(f"""{"n": $nDocs, "mode": "$mode", "secs": [$s1%.2f, $s2%.2f], "pairs": $p1}""")
    spark.stop()
  }
}
