package graft

import org.apache.spark.sql.catalyst.plans.logical.ResolvedHint
import org.apache.spark.sql.functions._

import graft.core.Hints

/** Size-gated broadcast hints (`Hints.broadcastIfSmall`): estimated-
  * small frames get the hint, estimated-large (or size-unknown) frames
  * pass through unhinted so AQE decides from runtime statistics —
  * never a forced driver collect of a corpus-derived frame.
  */
class HintsSpec extends SparkSpec {

  import spark.implicits._

  // The optimizer folds ResolvedHint into the Join node's JoinHint, so
  // probe the ANALYZED plan — that is where a forced hint is visible.
  private def hasHint(df: org.apache.spark.sql.DataFrame): Boolean =
    df.queryExecution.analyzed.exists(_.isInstanceOf[ResolvedHint])

  test("estimated-small frame gets the broadcast hint") {
    val dim = Seq((1L, "a"), (2L, "b")).toDF("k", "v")
    val joined = spark.range(100).toDF("k")
      .join(Hints.broadcastIfSmall(dim), Seq("k"))
    assert(hasHint(joined), "small dimension should carry the hint")
  }

  test("estimated-large frame passes through unhinted") {
    // ~128 MB estimate: 2^22 rows x 32-char string — far over the
    // 10 MB default autoBroadcastJoinThreshold.
    val big = spark.range(1L << 22)
      .select(col("id").as("k"),
        lit("x" * 32).as("pad"))
    assert(
      big.queryExecution.optimizedPlan.stats.sizeInBytes >
        spark.sessionState.conf.autoBroadcastJoinThreshold,
      "fixture must actually estimate over the threshold")
    val joined = spark.range(100).toDF("k")
      .join(Hints.broadcastIfSmall(big), Seq("k"))
    assert(!hasHint(joined),
      "corpus-sized frame must not be force-broadcast; AQE decides")
  }

  test("threshold -1 (broadcast disabled) never hints") {
    val prior = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val dim = Seq((1L, "a")).toDF("k", "v")
      val joined = spark.range(10).toDF("k")
        .join(Hints.broadcastIfSmall(dim), Seq("k"))
      assert(!hasHint(joined))
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prior)
  }
}
