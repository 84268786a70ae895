package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, LongType}

/** Stage-level timing for Dedup.containmentPairs (bench outlier). */
object ProfileContainment {
  private def time(name: String)(f: => Long): Unit = {
    val t0 = System.nanoTime()
    val n = f
    println(f"[cprof] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2fs  rows=$n")
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.operators.TextAnalysis
    val docs = graft.core.Tables.load(spark, sfDir, "documents")
    docs.limit(1).count()
    val tauNum = 4L; val tauDen = 5L
    val idCol = "doc_id"
    val gramArrs0 = TextAnalysis.gramArrays(docs, "doc_id", "text", 5)

    val g = gramArrs0
      .select(col(idCol).as("id"), explode(col("grams")).as("gram"))
      .localCheckpoint(true)
    time("g exploded grams") { g.count() }
    val dfs = g.groupBy(col("gram")).agg(count(lit(1)).as("df"))
    time("dfs gram marginals") { dfs.count() }
    val plen = (n: Column) =>
      (n - floor((n * tauNum + (tauDen - 1)) / tauDen) + 1).cast(IntegerType)
    val docPrefix = g.join(dfs, "gram")
      .groupBy("id")
      .agg(collect_list(struct(col("df"), col("gram"))).as("gs"))
      .select(col("id"), size(col("gs")).cast(LongType).as("n"),
        slice(sort_array(col("gs")), lit(1), plen(size(col("gs")).cast(LongType)))
          .getField("gram").as("pfx"))
      .localCheckpoint(true)
    time("docPrefix") { docPrefix.count() }
    time("prefix grams total") {
      docPrefix.select(explode(col("pfx"))).count()
    }
    val srcPfx = docPrefix
      .select(col("id").as("src"), explode(col("pfx")).as("gram"))
      .select(col("src"), xxhash64(col("gram")).as("gh"))
    val dstAll = g.select(col("id").as("dst"), xxhash64(col("gram")).as("gh"))
    time("cand join raw (pre-distinct)") {
      srcPfx.join(dstAll, "gh").where(col("src") =!= col("dst")).count()
    }
    val cands = srcPfx.join(dstAll, "gh")
      .where(col("src") =!= col("dst"))
      .select("src", "dst").distinct()
      .localCheckpoint(true)
    time("cands distinct") { cands.count() }
    val srcIds = cands.select(col("src").as("id")).distinct()
    val dstIds = cands.select(col("dst").as("id")).distinct()
    time("srcIds") { srcIds.count() }
    time("dstIds") { dstIds.count() }
    val gs = g.join(srcIds, Seq("id"), "left_semi")
      .select(col("id").as("src"), col("gram"))
    val gd = g.join(dstIds, Seq("id"), "left_semi")
      .select(col("id").as("dst"), col("gram"))
    time("verify explode cands x gs") {
      cands.join(gs, "src").count()
    }
    time("verify full inter") {
      cands.join(gs, "src").join(gd, Seq("dst", "gram"))
        .groupBy("src", "dst").agg(count(lit(1)).as("n_shared")).count()
    }
    spark.stop()
  }
}
