package graft

import org.apache.spark.sql.functions._

/** The scale-sweep generator's workload-shape contract — every
  * exponent in BENCH_SCALING.md rests on these properties, so they
  * are pinned here instead of trusted:
  *
  *  - id-offset copies: row counts scale by k, keys never collide;
  *  - documents keep their per-copy text SHAPE exactly (1:1 char
  *    maps preserve lengths and token boundaries);
  *  - `fresh` mode makes copies character-DISJOINT (copy-private
  *    codepoint alphabets), so the char-gram universe grows ∝ k
  *    while each copy's internal df distribution stays the base
  *    corpus's — the growing-universe corpus class;
  *  - rotation mode (default) keeps the universe bounded — the
  *    bounded-vocabulary class.
  */
class ScaleGenSpec extends SparkSpec {

  private val inDir = "/root/testdata/sf0.01"

  private def gen(fresh: Boolean): String = {
    val out = java.nio.file.Files
      .createTempDirectory(s"graft_scalegen_${if (fresh) "fresh" else "rot"}")
      .toString
    ScaleGen.run(spark, inDir, out, k = 2, fresh = fresh)
    out
  }

  test("fresh mode: copies are char-disjoint, shapes preserved, universe doubles") {
    val out = gen(fresh = true)
    val base = graft.core.Tables.load(spark, inDir, "documents")
    val scaled = graft.core.Tables.load(spark, out, "documents")
    val nBase = base.count()
    assert(scaled.count() == 2 * nBase, "doc count must scale by k")

    val cap = base.agg(max(col("doc_id"))).head().getLong(0) + 1
    // copy-1 docs: every [a-zA-Z0-9] translated away, lengths intact
    val copy1 = scaled.where(col("doc_id") >= cap)
    assert(copy1.count() == nBase)
    val leaked = copy1.where(col("text").rlike("[a-zA-Z0-9]")).count()
    assert(leaked == 0, s"$leaked copy-1 docs still carry base alphabet")
    // 1:1 char map ⇒ identical length per base doc (join on offset id)
    val lenDiff = copy1.select((col("doc_id") - cap).as("doc_id"),
        length(col("text")).as("l1"))
      .join(base.select(col("doc_id"), length(col("text")).as("l0")), "doc_id")
      .where(col("l0") =!= col("l1")).count()
    assert(lenDiff == 0, "translate must preserve every doc's length")

    // char-5-gram universes: disjoint between copies ⇒ the union is
    // the sum (up to the handful of alphabet-free grams — spaces and
    // punctuation survive both copies)
    def grams(df: org.apache.spark.sql.DataFrame) =
      graft.operators.TextAnalysis.gramArrays(df, "doc_id", "text", 5)
        .select(explode(col("grams")).as("gram")).distinct()
    val u0 = grams(base).count()
    val u1 = grams(copy1).count()
    val uAll = grams(scaled).count()
    val shared = u0 + u1 - uAll
    assert(u1 == u0, "copy df structure must mirror the base exactly")
    assert(shared.toDouble / u0 < 0.02,
      s"copies must be gram-disjoint (shared $shared of $u0)")
  }

  test("rotation mode: copies stay inside the base charset, structure preserved") {
    // The bounded-universe property is a CYCLE effect (rotations of a
    // 26-letter alphabet repeat, capping the universe at ≤ 26× the
    // base for ANY k) — what a cheap k = 2 run can pin is the
    // mechanism behind it: rotated copies stay INSIDE [a-zA-Z0-9]
    // (unlike fresh mode's copy-private codepoints) with per-copy
    // gram structure preserved exactly.
    val out = gen(fresh = false)
    val base = graft.core.Tables.load(spark, inDir, "documents")
    val scaled = graft.core.Tables.load(spark, out, "documents")
    assert(scaled.count() == 2 * base.count())
    val cap = base.agg(max(col("doc_id"))).head().getLong(0) + 1
    val copy1 = scaled.where(col("doc_id") >= cap)
    val outside = copy1.where(col("text").rlike("[^\\x00-\\x7f]")).count()
    assert(outside == 0, "rotation must never leave the base charset")
    def universe(df: org.apache.spark.sql.DataFrame) =
      graft.operators.TextAnalysis.gramArrays(df, "doc_id", "text", 5)
        .select(explode(col("grams")).as("gram")).distinct().count()
    assert(universe(copy1) == universe(base),
      "a rotated copy must mirror the base gram structure exactly")
  }

  test("fresh mode refuses copy counts that would enter the surrogate range") {
    // 62 codepoints per copy from U+4E00; U+D800 opens the UTF-16
    // surrogate block — k = 569 is the last safe copy count, 570 the
    // first that would emit lone surrogates (corrupt strings, silent
    // length-parity breakage). The bound must fail LOUDLY.
    val e = intercept[IllegalArgumentException] {
      ScaleGen.run(spark, inDir,
        java.nio.file.Files.createTempDirectory("graft_sg_overflow").toString,
        k = 570, fresh = true)
    }
    assert(e.getMessage.contains("surrogate"))
    assert(0x4E00L + 569L * 62 <= 0xD800L) // 569 stays in range
  }
}
