package graft

import org.apache.spark.sql.SparkSession

/** Plan-quality audit: print formatted physical plans for selected
  * queries so scan pruning (ReadSchema), filter pushdown
  * (PushedFilters), join strategies (Broadcast vs SortMerge) and
  * WholeStageCodegen spans can be inspected.
  *
  * Usage: runMain graft.Explain [sfDir] [query names…]
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val names = if (args.length > 1) args.drop(1).toSeq
      else Seq("q_denorm_flat", "q_denorm_deep", "q_denorm_multi", "q1_agg",
        "q_latest", "q_embed_dup")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      println(s"\n========== $n ==========")
      SparkEntry.registry(n).build(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
