package graft

import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Multimodal, Similarity, Temporal, TextAnalysis}

/** Unit tests for the training-data pipeline operators: dedup finds
  * planted duplicates, LSH similarity search agrees with brute force,
  * language ID recognizes handcrafted multilingual samples, and the
  * multimodal stub decode is deterministic.
  */
class PipelineOpsSpec extends SparkSpec {
  import spark.implicits._

  val planted = Seq(
    (0L, "the quick brown fox jumps over the lazy dog again and again"),
    (1L, "the quick brown fox jumps over the lazy dog again and again"), // exact dup of 0
    (2L, "the quick brown fox leaps over the lazy dog again and again"), // near dup of 0
    (3L, "completely different content about spark query engines entirely"),
    (4L, "entirely unrelated words describing benchmark pipelines tonight"))

  lazy val docs = planted.toDF("doc_id", "text")
  lazy val grams = TextAnalysis.grams(docs, "doc_id", "text", 5)

  test("asof join picks latest at-or-before right row per key") {
    val left = Seq((1L, 10L, 100L), (2L, 10L, 200L), (3L, 20L, 150L), (4L, 30L, 50L))
      .toDF("id", "k", "t")
    val right = Seq((10L, 100L, 1.0), (10L, 150L, 2.0), (20L, 150L, 3.0), (20L, 160L, 4.0))
      .toDF("k", "t", "v")
    val got = Temporal.asofJoin(left, right, Seq("k"), "t", Seq("v"))
      .collect().map(r => r.getAs[Long]("id") -> Option(r.get(r.fieldIndex("v")))).toMap
    assert(got(1L) == Some(1.0)) // tie at t=100 → right visible
    assert(got(2L) == Some(2.0)) // latest of two prior rows
    assert(got(3L) == Some(3.0)) // tie for other key
    assert(got(4L) == None) // no right row for key 30
  }

  test("asof join carries the matched row's NULLs, never mixing right rows") {
    // right rows: t=100 has (v1=1, v2=null); t=150 has (v1=null, v2=2).
    // A per-column last(ignoreNulls) would answer (1, 2) — a row that
    // never existed; ASOF must return the matched row (null, 2) and,
    // for a left row between them, (1, null).
    val left = Seq((1L, 10L, 160L), (2L, 10L, 120L)).toDF("id", "k", "t")
    val right = Seq(
      (10L, 100L, Some(1.0), Option.empty[Double]),
      (10L, 150L, Option.empty[Double], Some(2.0))).toDF("k", "t", "v1", "v2")
    val got = Temporal.asofJoin(left, right, Seq("k"), "t", Seq("v1", "v2"))
      .collect().map { r =>
        r.getAs[Long]("id") ->
          (Option(r.get(r.fieldIndex("v1"))), Option(r.get(r.fieldIndex("v2"))))
      }.toMap
    assert(got(1L) == (None, Some(2.0))) // matched row t=150, its v1 IS null
    assert(got(2L) == (Some(1.0), None)) // matched row t=100, its v2 IS null
  }

  test("session_window merges at exactly the gap (split only when gap > duration)") {
    import org.apache.spark.sql.functions.{session_window, timestamp_micros}
    val gapUs = 30L * 60 * 1000000
    // Boundary semantics pinned empirically: Spark's session_window
    // MERGES an event exactly gapDuration after the previous one (the
    // new window's start equals the session's end, and touching
    // windows coalesce) — a new session starts only when the gap is
    // STRICTLY GREATER than the duration. The q_sessionize DuckDB
    // oracle therefore flags `gap > 30 min`, not `>=`.
    val e = Seq((1L, 0L), (1L, gapUs), (2L, 0L), (2L, gapUs + 1))
      .toDF("user_id", "us")
      .select(col("user_id"), timestamp_micros(col("us")).as("tstamp"))
    val sessions = e.groupBy(col("user_id"), session_window(col("tstamp"), "30 minutes"))
      .count().groupBy("user_id").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sessions(1L) == 1L) // gap == 30min → same session
    assert(sessions(2L) == 2L) // 1µs over → split
  }

  test("range count tallies rows in the following window incl. bucket edges") {
    // window = 10; row at t=19 is within (12, 22] of t=12 but lives in
    // the NEXT bucket — catches the two-probe logic.
    val rows = Seq((1L, 1L, 5L), (2L, 1L, 12L), (3L, 1L, 19L), (4L, 1L, 23L),
      (5L, 2L, 5L)).toDF("id", "k", "t")
    val got = Temporal.rangeCount(rows, Seq("k"), "t", "id", 10L, "n")
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Long]("n")).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 0L, 5L -> 0L))
  }

  test("exact dedup groups identical texts") {
    val groups = Dedup.exactGroups(docs, "doc_id", "text")
      .where(col("n_copies") > 1).collect()
    assert(groups.length == 1)
    assert(groups.head.getAs[Long]("canonical_id") == 0L)
    assert(groups.head.getAs[Long]("n_copies") == 2L)
  }

  test("ngram Jaccard finds planted near-dup pair and nothing else") {
    val pairs = Dedup.ngramJaccardPairs(
      TextAnalysis.gramArrays(docs, "doc_id", "text", 5), "doc_id", 3, 5)
      .collect().map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet
    assert(pairs == Set((0L, 1L), (0L, 2L), (1L, 2L)), s"got $pairs")
  }

  test("minhash+LSH finds the planted near-dup pairs") {
    val pairs = Dedup.minhashPairs(
      TextAnalysis.gramArrays(docs, "doc_id", "text", 5), "doc_id", 3, 5)
      .collect().map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet
    assert(pairs == Set((0L, 1L), (0L, 2L), (1L, 2L)), s"got $pairs")
  }

  test("simhash: identical docs hash equal; unrelated docs differ") {
    val sh = Dedup.simhash(grams, "doc_id").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("simhash")).toMap
    assert(sh(0L) == sh(1L))
    assert(sh(0L) != sh(3L))
    // near-dup has small hamming distance
    assert(java.lang.Long.bitCount(sh(0L) ^ sh(2L)) <= 8)
    assert(java.lang.Long.bitCount(sh(0L) ^ sh(3L)) > 8)
  }

  test("LSH top-k results are a subset of brute-force ranking universe") {
    val e = graft.core.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("vec"))
    val probes = e.where(col("vec_id") < 5).select(col("vec_id").as("qid"), col("vec"))
    val corpus = e.select(col("vec_id").as("nid"), col("vec"))
    val bf = Similarity.bruteForceTopK(probes, corpus, 10).collect()
      .map(r => (r.getAs[Long]("qid"), r.getAs[Long]("nid"), r.getAs[Double]("cos"))).toSet
    val lsh = Similarity.lshTopK(probes, corpus, 64, 10, numPlanes = 3).collect()
    assert(lsh.nonEmpty)
    // every LSH result's cosine must equal the brute-force cosine for
    // that (qid, nid) — the bucket restricts candidates, never alters
    // scores; and per-probe candidates never exceed k.
    val bfMap = Similarity.bruteForceTopK(probes, corpus, 1000).collect()
      .map(r => (r.getAs[Long]("qid"), r.getAs[Long]("nid")) -> r.getAs[Double]("cos")).toMap
    lsh.foreach { r =>
      val key = (r.getAs[Long]("qid"), r.getAs[Long]("nid"))
      assert(bfMap(key) == r.getAs[Double]("cos"), s"score mismatch at $key")
    }
    // multi-probe recall@10 vs brute force
    val lshSet = lsh.map(r => (r.getAs[Long]("qid"), r.getAs[Long]("nid"))).toSet
    val bfSet = bf.map { case (q, n, _) => (q, n) }
    val recall = bfSet.count(lshSet) / bfSet.size.toDouble
    assert(recall >= 0.5, s"multi-probe LSH recall too low: $recall")
  }

  test("IVF top-k scores are exact and recall is reasonable") {
    val e = graft.core.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("vec"))
    val probes = e.where(col("vec_id") < 5).select(col("vec_id").as("qid"), col("vec"))
    val corpus = e.select(col("vec_id").as("nid"), col("vec"))
    val ivf = Similarity.ivfTopK(probes, corpus, 10, nLists = 8, nProbe = 3).collect()
    assert(ivf.nonEmpty)
    val bfMap = Similarity.bruteForceTopK(probes, corpus, 1000).collect()
      .map(r => (r.getAs[Long]("qid"), r.getAs[Long]("nid")) -> r.getAs[Double]("cos")).toMap
    ivf.foreach { r =>
      val key = (r.getAs[Long]("qid"), r.getAs[Long]("nid"))
      assert(bfMap(key) == r.getAs[Double]("cos"), s"score mismatch at $key")
    }
    val bf10 = Similarity.bruteForceTopK(probes, corpus, 10).collect()
      .map(r => (r.getAs[Long]("qid"), r.getAs[Long]("nid"))).toSet
    val ivfSet = ivf.map(r => (r.getAs[Long]("qid"), r.getAs[Long]("nid"))).toSet
    val recall = bf10.count(ivfSet) / bf10.size.toDouble
    assert(recall >= 0.3, s"IVF recall too low: $recall")
  }

  test("language ID recognizes handcrafted samples") {
    val samples = Seq(
      ("en", "the cat and the dog of the house is in it"),
      ("es", "el perro y la casa de que los gatos"),
      ("fr", "le chien et les chats une maison des arbres"),
      ("de", "der hund und die katze das haus ist hier"),
      ("zh", "我在这里的房子是了")).toDF("truth", "text")
    val got = samples.select(col("truth"), TextAnalysis.langId(col("text")).as("pred"))
      .collect()
    got.foreach(r => assert(r.getString(0) == r.getString(1),
      s"langId(${r.getString(0)}) predicted ${r.getString(1)}"))
  }

  test("multimodal stub decode is deterministic and correct") {
    val withPayload = docs.select(col("doc_id"), col("text").cast("binary").as("payload"))
    val feats = Multimodal.decodeFeatures(withPayload, "doc_id").collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    val text0 = planted.head._2
    val f0 = feats(0L)
    assert(f0.getAs[Long]("byte_len") == text0.getBytes("UTF-8").length.toLong)
    val (w, h, n) = Multimodal.decodeStub(text0.getBytes("UTF-8"))
    assert(f0.getAs[Long]("width") == w && f0.getAs[Long]("height") == h &&
      f0.getAs[Long]("n_frames") == n)
    // exact dup payloads share sha
    assert(feats(0L).getAs[String]("sha") == feats(1L).getAs[String]("sha"))
    assert(feats(0L).getAs[String]("sha") != feats(3L).getAs[String]("sha"))
  }

  test("chunkTokens boundary math: counts, starts, truncated tails") {
    // chunk=64, overlap=16 → stride 48; planted token counts straddle
    // every boundary: n = 1, 64 (exactly one chunk), 65 (first n that
    // spills), 112 (second chunk exactly full), 113 (third chunk)
    val mk = (n: Int) => (1 to n).map(i => s"t$i").mkString(" ")
    val df = Seq((1L, mk(1)), (64L, mk(64)), (65L, mk(65)),
        (112L, mk(112)), (113L, mk(113)))
      .toDF("doc_id", "text")
    val got = TextAnalysis.chunkTokens(df, "doc_id", "text", 64, 16)
      .collect()
      .groupBy(_.getLong(0))
      .view.mapValues(_.sortBy(_.getLong(1))
        .map(r => (r.getLong(2), r.getLong(3), r.getString(4))).toSeq).toMap
    assert(got(1L) == Seq((1L, 1L, "t1")))
    assert(got(64L) == Seq((1L, 64L, "t1")))
    assert(got(65L) == Seq((1L, 64L, "t1"), (49L, 17L, "t49")))
    assert(got(112L) == Seq((1L, 64L, "t1"), (49L, 64L, "t49")))
    assert(got(113L) ==
      Seq((1L, 64L, "t1"), (49L, 64L, "t49"), (97L, 17L, "t97")))
  }

  test("int8 quantization: q_max is 127 and checksums bound by 127·dim") {
    val corpus = graft.core.Tables.load(spark, "/root/testdata/sf0.01", "embeddings")
      .select(col("vec_id").as("nid"), col("embedding").cast("array<double>").as("vec"))
    val rows = Similarity.quantizeInt8(corpus).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(4) == 127L, "the max-|v| component quantizes to exactly 127")
      assert(r.getLong(3) >= 127L && r.getLong(3) <= 127L * 64,
        s"L1 out of range: ${r.getLong(3)}")
      assert(math.abs(r.getLong(2)) <= r.getLong(3), "|sum| ≤ L1")
    }
  }

  test("corpus-prep stages compose as one lazy DataFrame chain") {
    import graft.operators.TrainingData
    // the full pretraining-prep shape: scrub PII → quality filter →
    // exact dedup (keep canonical) → train split → sequence packing —
    // every stage a DataFrame => DataFrame transform, one Spark action
    // at the end (SURVEY §7.4: the operator registry must compose
    // without rearchitecting)
    val raw = graft.core.Tables.load(spark, "/root/testdata/sf0.01", "documents")
    val scrubbed = raw
      .withColumn("__s", TextAnalysis.scrubPii(col("text")))
      .select(col("doc_id"), col("source"), col("__s").getField("clean").as("text"))
    val quality = scrubbed
      .where(size(TextAnalysis.tokens(col("text"))) >= 5)
    val canonical = Dedup.exactGroups(quality, "doc_id", "text")
      .select(col("canonical_id").as("doc_id"))
    val deduped = quality.join(canonical, "doc_id")
    val train = deduped.where(TextAnalysis.hashBucket(col("doc_id"), 100) < 80)
    val packed = TrainingData.packBins(train, "source", "doc_id",
      size(TextAnalysis.tokens(col("text"))), 512L)

    val rows = packed.collect() // the single action
    val nRaw = raw.count()
    assert(rows.nonEmpty && rows.length <= nRaw)
    // every doc got a bin, bins start at 0 per source, token counts > 0
    assert(rows.forall(_.getAs[Long]("bin") >= 0L))
    assert(rows.forall(_.getAs[Long]("n_tokens") > 0L))
    val perSource = rows.groupBy(_.getAs[String]("source"))
    assert(perSource.values.forall(_.map(_.getAs[Long]("bin")).min == 0L))
    // the train split kept roughly 80%
    val kept = rows.length.toDouble / nRaw
    assert(kept > 0.6 && kept < 0.95, s"train fraction $kept")
  }

  test("span dedup: content-defined anchors catch repeats at different alignments") {
    // the same 120-char span planted at DIFFERENT offsets in two docs:
    // fixed-stride windows would only line up if the offsets agreed
    // mod stride; content-defined anchors must catch it regardless
    val shared = "this exact shared passage is deliberately long enough to contain " +
      "several content-defined anchor positions within its body"
    assert(shared.length >= 120)
    val tmp = java.nio.file.Files.createTempDirectory("graft-span").toString
    Seq(
      (1L, "short head " + shared + " tail one"),
      (2L, "a much longer and differently sized preamble precedes " + shared + " here"),
      (3L, "entirely unrelated filler content that repeats nothing from the others at all"))
      .toDF("doc_id", "text")
      .write.parquet(s"$tmp/documents.parquet")
    val got = SparkEntry.queries("q_span_dedup")(spark, tmp).collect()
    assert(got.nonEmpty, "planted cross-alignment repeat not detected")
    got.foreach { r =>
      assert(r.getAs[Long]("n_docs") == 2L)
      assert(r.getAs[Long]("min_doc_id") == 1L)
    }
  }

  test("q_frames samples byte-exact frames on non-ASCII payloads (planted)") {
    // multi-byte characters must not skew frame boundaries: n is the
    // UTF-8 BYTE length and frames slice bytes, so char-based length
    // would produce different nf/stride AND different content hashes
    val text = "héllo wörld — ∑∆ bytes ünicode payload"
    val bytes = text.getBytes("UTF-8")
    assert(bytes.length > text.length, "planted text must be non-ASCII")
    val tmp = java.nio.file.Files.createTempDirectory("graft-frames").toString
    Seq((1L, text)).toDF("doc_id", "text").write.parquet(s"$tmp/documents.parquet")
    val got = SparkEntry.queries("q_frames")(spark, tmp).collect()
    val n = bytes.length
    val nf = (n % 7) + 1
    val stride = n / nf
    assert(got.length == nf, s"expected $nf frames, got ${got.length}")
    val md = java.security.MessageDigest.getInstance("MD5")
    got.zipWithIndex.foreach { case (r, i) =>
      assert(r.getAs[Long]("frame_idx") == i.toLong)
      assert(r.getAs[Long]("byte_off") == i.toLong * stride)
      val hexUpper = bytes.slice(i * stride, i * stride + stride)
        .map(b => f"${b & 0xff}%02X").mkString
      val expected = md.digest(hexUpper.getBytes("US-ASCII"))
        .map(b => f"${b & 0xff}%02x").mkString
      assert(r.getAs[String]("frame_md5") == expected, s"frame $i fingerprint diverged")
    }
  }
}
