package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Corpus-preparation operators a large-scale pretraining pipeline
  * runs after dedup/quality filtering: eval-set decontamination and
  * deterministic sequence packing.
  *
  * Both are pure `functions._` column plans (no UDFs): decontamination
  * is a gram-keyed semi-join whose eval side is tiny relative to the
  * train corpus (broadcastable), packing is a single per-group window
  * scan — the two shapes that stay cheap when the train side is 100 TB.
  */
object TrainingData {

  /** Word n-grams ("w1 w2 … wn") of a token array; empty when the
    * document has fewer than n tokens. (The explicit guard matters:
    * `sequence(1, 0)` in Spark DESCENDS rather than returning empty.) */
  def wordGrams(toks: Column, n: Int): Column =
    when(size(toks) >= n,
      transform(sequence(lit(1), size(toks) - (n - 1)),
        i => array_join(slice(toks, i, lit(n)), " ")))
      .otherwise(array().cast(ArrayType(StringType)))

  /** Contaminated-document report: for every train document sharing at
    * least one word n-gram with the eval corpus, the number of
    * distinct shared grams.
    *
    * Shape for 100 TB: eval grams dedup to a SMALL set (eval corpora
    * are thousands of docs, not billions), so the join is a broadcast
    * hash join against the exploded train grams — the train corpus is
    * never shuffled; per-doc gram dedup happens map-side with
    * `array_distinct` before the explode (same trick as
    * [[TextAnalysis.gramArrays]]).
    *
    * @param train (id, text) training documents
    * @param eval  (text) eval/benchmark documents
    * @return (id, n_hits) — contaminated train docs only
    */
  def contamination(
      train: DataFrame,
      eval: DataFrame,
      idCol: String,
      textCol: String,
      n: Int): DataFrame = {
    val trainGrams = train
      .select(col(idCol),
        explode(array_distinct(
          wordGrams(TextAnalysis.tokens(col(textCol)), n))).as("gram"))
    val evalGrams = eval
      .select(explode(array_distinct(
        wordGrams(TextAnalysis.tokens(col(textCol)), n))).as("gram"))
      .distinct()
    trainGrams.join(broadcast(evalGrams), "gram")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_hits"))
  }

  /** Deterministic sequence packing (concat-and-chunk): documents are
    * laid out in `orderCol` order within each `groupCol` stream and the
    * token stream is chunked into bins of `capacity`; a document's bin
    * is the chunk its FIRST token falls into (documents may straddle a
    * boundary, exactly like pretraining sample packing over a fixed
    * context length).
    *
    * One window scan per group — the only shuffle is the partition by
    * `groupCol`; the running sum is a streaming frame (no buffering),
    * and the per-bin rollup that usually follows is map-side
    * combinable. Deterministic: same inputs → same bins on any engine,
    * any cluster, any partitioning.
    *
    * @return input columns + (n_tokens, bin)
    */
  def packBins(
      docs: DataFrame,
      groupCol: String,
      orderCol: String,
      tokensCol: Column,
      capacity: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(groupCol)).orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs
      .withColumn("n_tokens", tokensCol.cast(LongType))
      .withColumn("bin",
        floor((sum(col("n_tokens")).over(w) - col("n_tokens")) / capacity))
  }
}
