package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-sweep data generator: replicates the driver's sf0.1 testdata
  * k× into a larger scale factor, preserving each table's WORKLOAD
  * SHAPE so time-vs-sf exponents measured on the output are honest.
  *
  * `sbt "runMain graft.ScaleGen <inDir> <outDir> <k>"`
  *
  * Replication is k id-offset copies, NOT naive row duplication — the
  * difference is what keeps the sweep meaningful:
  *
  *  - **Keys**: every copy's ids shift by copy·cap (cap = max id + 1
  *    per key space), and every FOREIGN key shifts by the same cap as
  *    its target, so referential structure, join fan-outs, and
  *    group-by cardinalities all scale linearly — exactly how a real
  *    corpus grows. `region`/`nation` stay fixed (TPC-H dimension
  *    semantics: SF never scales them).
  *  - **Document text**: a verbatim copy would make every document an
  *    exact k-plicate — near-dup pair counts would grow Θ(k²) from the
  *    REPLICATION, not the algorithm, poisoning every dedup exponent.
  *    Instead each copy rewrites text under a copy-specific alphabet
  *    rotation (`translate` over [a-z][A-Z][0-9], copy 0 = identity):
  *    lengths, token boundaries, per-copy duplicate structure, and
  *    shingle statistics are preserved exactly, while cross-copy
  *    shingle overlap drops to ~0 — duplicate clusters scale linearly,
  *    the dedup rate stays constant, which is the null hypothesis a
  *    scale sweep needs.
  *  - **Embeddings**: each copy rotates the vector k positions
  *    (norm- and within-copy-geometry-preserving, cross-copy cosine
  *    pseudo-random), so ANN/semdedup cell structure replicates per
  *    copy instead of collapsing into k-plicate points. CAVEAT: the
  *    rotation wraps at the vector dimension (64 on the driver's
  *    corpus), so for k > dim copies i and i+dim carry IDENTICAL
  *    vectors at different ids — cross-copy exact-duplicate pairs
  *    grow Θ(k²/dim) from the REPLICATION, poisoning any
  *    embedding-dedup exponent measured there. Document/warn rather
  *    than silently generate; embedding sweeps should stay at
  *    k ≤ dim (document sweeps are unaffected — their fresh/rotation
  *    rewrites never wrap).
  *  - **events.ts** stays as-is (copies add volume per time window —
  *    linear density growth, the realistic stream-scale model); ids
  *    offset so per-user/per-event state scales in KEY COUNT, not in
  *    per-key history length.
  *
  * Output goes under the repo (testdata-scale/, git-ignored) — the
  * driver's /root/testdata is read-only by contract.
  */
object ScaleGen {

  /** (key columns to offset) per table, keyed by the cap-space name —
    * every column in one cap space shifts by the same cap so FKs stay
    * aligned. */
  private val offsets: Map[String, Seq[(String, String)]] = Map(
    "customer" -> Seq("c_custkey" -> "cust"),
    "supplier" -> Seq("s_suppkey" -> "supp"),
    "part" -> Seq("p_partkey" -> "part"),
    "orders" -> Seq("o_orderkey" -> "ord", "o_custkey" -> "cust"),
    "lineitem" -> Seq("l_orderkey" -> "ord", "l_partkey" -> "part",
      "l_suppkey" -> "supp"),
    "events" -> Seq("event_id" -> "evt", "user_id" -> "user"),
    "documents" -> Seq("doc_id" -> "doc"),
    "embeddings" -> Seq("vec_id" -> "vec"))

  private val alpha = ('a' to 'z').mkString
  private val upper = ('A' to 'Z').mkString
  private val digit = ('0' to '9').mkString

  private def rot(s: String, i: Int): String = {
    val n = ((i % s.length) + s.length) % s.length
    s.substring(n) + s.substring(0, n)
  }

  def main(args: Array[String]): Unit = {
    val (inDir, outDir, kStr) = (args(0), args(1), args(2))
    val k = kStr.toInt
    // Optional 4th arg `fresh`: GROWING-universe document rewrite.
    // The default alphabet ROTATION keeps the character-5-gram
    // universe bounded (≤ 26× the base — the r14 sf3 corpus measured
    // 52k), which models a bounded-vocabulary corpus: per-gram df
    // grows with k and the corpus gets denser forever. Real text
    // grows its vocabulary WITH the data. `fresh` models that class:
    // copy i maps [a-zA-Z0-9] 1:1 onto 62 copy-private CJK codepoints
    // (BMP, single UTF-16 unit in Spark = single codepoint in DuckDB,
    // so char-level substring/length agree everywhere), so copies are
    // gram-DISJOINT — the universe grows ∝ k while every copy's
    // internal df distribution, doc lengths, token boundaries, and
    // duplicate structure stay EXACTLY the base corpus's. This is the
    // corpus class the containment prefix fallback exists for; the
    // scale sweep measures its Σ-prefix-df ∝ n claim on it.
    val fresh = args.length > 3 && args(3) == "fresh"
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    run(spark, inDir, outDir, k, fresh)
    spark.stop()
  }

  /** Generation body, session supplied by the caller (main or specs —
    * main stops its own session; ScaleGenSpec must not lose the
    * shared test session). */
  def run(spark: SparkSession, inDir: String, outDir: String, k: Int,
      fresh: Boolean): Unit = {
    // fresh mode's copy-private alphabets are 62 consecutive BMP
    // codepoints per copy starting at U+4E00; past U+D800 lies the
    // UTF-16 surrogate range (lone surrogates = corrupt strings that
    // silently break the single-codepoint/length-parity invariant the
    // mode depends on), and Char wraps past 2^16. Fail loudly instead
    // of generating a corrupt corpus.
    if (fresh)
      require(0x4E00L + k.toLong * 62 <= 0xD800L,
        s"ScaleGen fresh mode supports at most ${(0xD800 - 0x4E00) / 62} " +
          s"copies before the copy-private alphabet would enter the UTF-16 " +
          s"surrogate range; got k=$k")
    new java.io.File(outDir).mkdirs()

    def load(t: String): DataFrame = graft.core.Tables.load(spark, inDir, t)

    // One cap per key space: max over every column that draws from it,
    // +1 so copies never collide. Deterministic given the input.
    val capSpaces = offsets.toSeq.flatMap { case (t, cols) =>
      cols.map { case (c, space) => (space, t, c) } }
    val caps: Map[String, Long] = capSpaces.groupBy(_._1).map {
      case (space, uses) =>
        val mx = uses.map { case (_, t, c) =>
          val row = load(t).agg(max(col(c).cast("long"))).head()
          require(!row.isNullAt(0),
            s"ScaleGen: cannot derive a key cap for $t.$c — table is " +
              "empty (max is null); generate the base data first")
          row.getLong(0)
        }.max
        space -> (mx + 1L)
    }

    // region/nation: fixed dimensions, byte-identical copy
    Seq("region", "nation").foreach { t =>
      load(t).write.mode("overwrite").parquet(s"$outDir/$t.parquet")
    }

    offsets.keys.toSeq.sorted.foreach { t =>
      val base = load(t)
      val dim =
        if (t == "embeddings")
          base.select(size(col("embedding"))).head().getInt(0)
        else 0
      if (t == "embeddings" && k > dim)
        System.err.println(
          s"[scalegen] WARNING: k=$k exceeds embedding dim=$dim — the " +
            "rotation wraps, so copies i and i+dim hold identical vectors " +
            "(cross-copy exact-dup pairs ~ k^2/dim from replication alone); " +
            "do not fit embedding-dedup exponents on this output")
      val copies = (0 until k).map { i =>
        var c = base
        offsets(t).foreach { case (colName, space) =>
          c = c.withColumn(colName, col(colName) + lit(i * caps(space)))
        }
        if (t == "documents" && i > 0) {
          val from = alpha + upper + digit
          val to =
            if (fresh)
              (0 until from.length)
                .map(j => (0x4E00 + (i - 1) * from.length + j).toChar)
                .mkString
            else rot(alpha, i) + rot(upper, i) + rot(digit, i)
          c = c.withColumn("text", translate(col("text"), from, to))
        }
        if (t == "embeddings" && i > 0) {
          val r = i % dim
          if (r != 0)
            c = c.withColumn("embedding",
              concat(slice(col("embedding"), r + 1, dim - r),
                slice(col("embedding"), 1, r)))
        }
        c
      }
      val out = copies.reduce(_ unionAll _)
      // one file per ~copy keeps file counts proportionate to volume
      out.repartition(math.max(1, k / 2))
        .write.mode("overwrite").parquet(s"$outDir/$t.parquet")
      println(s"[scalegen] $t x$k -> $outDir/$t.parquet")
    }
  }
}
