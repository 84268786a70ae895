package graft

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.exchange.BroadcastExchangeExec
import org.apache.spark.sql.functions._

import graft.functions.TopKByScore
import graft.operators.Similarity
import graft.queries.Registry

/** Scale-shape assertions for the similarity operators: the pair
  * queries must plan as keyed joins (no CartesianProduct, no
  * BroadcastNestedLoopJoin), the ANN reductions must be partial
  * top-k aggregations (no global per-qid window), and the brute-force
  * path must broadcast the PROBE side, never the corpus. Plus
  * value-level checks: blocked == naive exact pairs, banded recall,
  * and the TopKByScore aggregate itself.
  */
class SimilarityPlanSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.01"

  private def corpus = graft.core.Tables.load(spark, dir, "embeddings")
    .select(col("vec_id").as("nid"),
      col("embedding").cast("array<double>").as("vec"))

  /** Concrete physical plan with AQE off (AdaptiveSparkPlanExec hides
    * the tree until execution). */
  private def concretePlan(df: org.apache.spark.sql.DataFrame): SparkPlan =
    df.queryExecution.executedPlan

  private def withoutAqe[A](f: => A): A = {
    val prev = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try f finally spark.conf.set("spark.sql.adaptive.enabled", prev)
  }

  test("TopKByScore keeps the best k by (score desc, id asc) across partitions") {
    val rows = (1L to 1000L).map(i => (1L, (i % 100).toDouble, i))
    val got = rows.toDF("qid", "cos", "nid")
      .repartition(13) // force partial buffers + a real merge
      .groupBy("qid")
      .agg(TopKByScore.topK(struct(col("cos"), col("nid")), 5).as("t"))
      .select(explode(col("t")).as("e"))
      .select(col("e.id"), col("e.score"))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    // best score is 99 (ids 99, 199, …); ties break by LOWER id first
    assert(got == Seq((99L, 99.0), (199L, 99.0), (299L, 99.0), (399L, 99.0), (499L, 99.0)))
  }

  test("TopKByScore collapses exact duplicate (score, id) candidates") {
    val rows = Seq((1L, 5.0, 10L), (1L, 5.0, 10L), (1L, 4.0, 20L), (1L, 4.0, 20L))
    val got = rows.toDF("qid", "cos", "nid")
      .repartition(4)
      .groupBy("qid")
      .agg(TopKByScore.topK(struct(col("cos"), col("nid")), 10).as("t"))
      .select(explode(col("t")).as("e"))
      .select(col("e.id"), col("e.score"))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(got == Seq((10L, 5.0), (20L, 4.0)))
  }

  test("pair queries plan as keyed joins: no cartesian, no nested loop") {
    withoutAqe {
      for (name <- Seq("q_embed_dup", "q_embed_dup_lsh", "q_embed_dup_banded_hi")) {
        val plan = concretePlan(Registry.all(name).build(spark, dir)).toString
        assert(!plan.contains("CartesianProduct"), s"$name plans a CartesianProduct")
        assert(!plan.contains("BroadcastNestedLoopJoin"), s"$name plans a nested loop")
      }
    }
  }

  test("ANN reductions are partial top-k aggregations, not a global window") {
    withoutAqe {
      for (name <- Seq("q_ann_topk", "q_ann_lsh", "q_ann_ivf", "q_embed_dup_lsh")) {
        val plan = concretePlan(Registry.all(name).build(spark, dir)).toString
        assert(!plan.contains("Window"), s"$name still ranks via a window:\n$plan")
      }
      val topk = concretePlan(Registry.all("q_ann_topk").build(spark, dir)).toString
      assert(topk.contains("ObjectHashAggregate"), "top-k must aggregate (partial+final)")
    }
  }

  test("brute-force top-k broadcasts the probe side, never the corpus") {
    withoutAqe {
      val plan = concretePlan(Registry.all("q_ann_topk").build(spark, dir))
      val broadcasts = plan.collect { case b: BroadcastExchangeExec => b }
      assert(broadcasts.nonEmpty, "probe side should broadcast")
      broadcasts.foreach { b =>
        val s = b.toString
        assert(s.contains("vec_id") &&
          (s.contains("LessThan(vec_id,8)") || s.contains("vec_id#") && s.contains("< 8")),
          s"a broadcast subtree is not the probe selection:\n$s")
      }
    }
  }

  test("k-means refinement: one shuffle-free assignment pass, cells cover the corpus") {
    withoutAqe {
      // The final-iteration plan must be scan → codegen argmax project →
      // explode → hash aggregate: no join of any kind (centroids are
      // inlined literals), so the only exchange is the (cid, pos) agg.
      val refined = Similarity.kmeansRefine(corpus, nLists = 16, iters = 2)
      val plan = concretePlan(refined).toString
      assert(!plan.contains("Join"), s"assignment must not join:\n$plan")
      assert(!plan.contains("CartesianProduct"))
      val rows = refined.collect()
      val n = corpus.count()
      val dim = 64
      // every (cid, pos) carries its full cell population; cell
      // populations sum to the corpus size at every dimension
      assert(rows.map(_.getLong(1)).toSet.subsetOf((1L to dim).toSet))
      val perPos = rows.groupBy(_.getLong(1)).view.mapValues(_.map(_.getLong(3)).sum)
      assert(perPos.values.toSet == Set(n), s"cell sizes must sum to $n per dim: $perPos")
      // refinement must actually move the seeds: iteration-2 means
      // differ from a single-iteration run somewhere
      val once = Similarity.kmeansRefine(corpus, nLists = 16, iters = 1)
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
      val twice = rows.map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
      assert(once != twice, "second Lloyd iteration changed nothing — refinement inert")
    }
  }

  test("blocked exact pairs reproduce the naive cross-join exactly") {
    val naive = Similarity.cosinePairs(corpus, 0.45)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val blocked = Similarity.cosinePairsBlocked(corpus, 0.45)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(naive.nonEmpty) // the fixture plants near-dup pairs
    assert(blocked == naive)
  }

  test("semDedup: keyed in-cell join, duplicates are closed under drop-reported") {
    withoutAqe {
      val dupes = Similarity.semDedup(corpus, tau = 0.3, nLists = 16)
      val plan = concretePlan(dupes).toString
      assert(!plan.contains("CartesianProduct") &&
        !plan.contains("BroadcastNestedLoopJoin"),
        s"the in-cell pair search must be a cid-keyed equijoin:\n$plan")
      val rows = dupes.collect()
      assert(rows.nonEmpty)
      // dup_of must always be a lower id, and every dup's canonical
      // representative must itself survive the drop (dup_of is the
      // cell's lowest near-neighbor, which can never be reported with
      // a still-lower neighbor of ITS own via this pair — check the
      // weaker, partitioning-independent invariant: reported ids and
      // their dup_of never coincide)
      val reported = rows.map(_.getLong(0)).toSet
      rows.foreach { r =>
        assert(r.getLong(2) < r.getLong(0), "dup_of must be the lower id")
        assert(r.getDouble(3) >= 0.3, "cos to the representative is ≥ tau")
      }
      assert(reported.intersect(rows.map(_.getLong(2)).toSet).size < reported.size,
        "at least one canonical representative survives")
    }
  }

  test("banded near-dup is a subset of exact with measured recall") {
    val exact = Similarity.cosinePairs(corpus, 0.45)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val banded = Similarity.cosinePairsBanded(corpus, 0.45, dim = 64)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(banded.subsetOf(exact)) // exact verify ⇒ no false positives
    val recall = banded.size.toDouble / exact.size
    // this corpus's near-dups sit barely above the background (cos
    // 0.45-0.51) — the hardest regime for hyperplane LSH; the banding
    // must still find a solid fraction. Real near-dups (cos ≥ 0.8)
    // band-match with probability ~1.
    assert(recall >= 0.4, s"banded recall $recall (${banded.size}/${exact.size})")
  }

  test("hyperplanes are pairwise independent (no GF(2)-linear degeneracy)") {
    // r14 sweep catch: the original xorshift planeSign was linear in
    // (m, d) — consecutive planes agreed on 1-2/64 components (near
    // negations), collapsing every 16-bit band to ~2 effective bits
    // and concentrating 266M sf1 candidate pairs in two buckets. Any
    // future "simplification" of the mixer that reintroduces structure
    // must fail here: consecutive-plane agreement stays in the
    // binomial(64, 1/2) range, and no plane is constant or balanced
    // to an extreme.
    for (p <- 0 until 127) {
      val a = (0 until 64).map(d => Similarity.planeSign(p, d))
      val b = (0 until 64).map(d => Similarity.planeSign(p + 1, d))
      val agree = a.zip(b).count { case (x, y) => x == y }
      assert(agree >= 16 && agree <= 48,
        s"planes $p,${p + 1} agree on $agree/64 — correlated hyperplanes")
      val pos = a.count(_ > 0)
      assert(pos >= 16 && pos <= 48, s"plane $p is unbalanced: $pos/64 positive")
    }
  }

  test("fused LSH band keys reproduce the column-composed form bit-for-bit") {
    for ((b, r) <- Seq((8, 4), (16, 8), (8, 16))) {
      val fused = corpus
        .select(col("nid"), Similarity.lshBandKeys(col("vec"), 64, b, r).as("k"))
        .collect().map(x => x.getLong(0) -> x.getSeq[Long](1)).toMap
      val composed = corpus
        .select(col("nid"),
          Similarity.lshBandKeysColumns(col("vec"), 64, b, r).as("k"))
        .collect().map(x => x.getLong(0) -> x.getSeq[Long](1)).toMap
      assert(fused == composed, s"band-key mismatch at ${b}x$r")
    }
    // the on-a-plane rounding boundary (|dot| <= 1e-6, where the fused
    // expression switches to exact BigDecimal): -5e-7 rounds HALF_UP
    // away from zero to -1e-6 (bit 0), -4e-7 rounds to -0.0 (bit 1,
    // since -0.0 >= 0) — both engines and both forms must agree
    val edge = Seq((1L, Seq(-5e-7)), (2L, Seq(-4e-7)), (3L, Seq(5e-7)))
      .toDF("nid", "vec")
    def keys1(c: org.apache.spark.sql.Column) =
      edge.select(col("nid"), c.as("k"))
        .collect().map(x => x.getLong(0) -> x.getSeq[Long](1).head).toMap
    val f1 = keys1(Similarity.lshBandKeys(col("vec"), 1, 1, 1))
    val c1 = keys1(Similarity.lshBandKeysColumns(col("vec"), 1, 1, 1))
    assert(f1 == c1, s"plane-boundary divergence: $f1 vs $c1")
    // expectation from the DEFINING convention (Spark round =
    // BigDecimal.valueOf(double) — the SHORTEST-DECIMAL form — at
    // scale 6, HALF_UP; the exact-binary `new BigDecimal(double)`
    // differs for 5e-7 and was this test's first real catch):
    val sign0 = Similarity.planeSign(0, 0)
    val expect = Map(1L -> -5e-7, 2L -> -4e-7, 3L -> 5e-7).map {
      case (k, v) =>
        val dot = v * sign0
        val r = java.math.BigDecimal.valueOf(dot)
          .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
        k -> (if (r >= 0) 1L else 0L)
    }
    assert(f1 == expect, s"got $f1, want $expect (plane sign $sign0)")

    // non-finite inputs: NaN fails both sign tests, so the fused form
    // must NOT fall into BigDecimal.valueOf (NumberFormatException) —
    // it mirrors the composed form, where Spark's round() passes NaN
    // through and SQL double ordering puts NaN ABOVE zero (bit set).
    // ±Infinity decides at the sign tests in both forms.
    val nonFinite = Seq(
      (1L, Seq(Double.NaN)),
      (2L, Seq(Double.PositiveInfinity)),
      (3L, Seq(Double.NegativeInfinity))).toDF("nid", "vec")
    def keysNf(c: org.apache.spark.sql.Column) =
      nonFinite.select(col("nid"), c.as("k"))
        .collect().map(x => x.getLong(0) -> x.getSeq[Long](1).head).toMap
    val fNf = keysNf(Similarity.lshBandKeys(col("vec"), 1, 1, 1))
    val cNf = keysNf(Similarity.lshBandKeysColumns(col("vec"), 1, 1, 1))
    assert(fNf == cNf, s"non-finite parity divergence: $fNf vs $cNf")
  }

  test("fused PQ encoding reproduces the composed argmin form bit-for-bit") {
    // pqTopK's corpus encoding runs through PqEncodeExpr (one codegen
    // pass); the composed array_position(darr, array_min(darr)) form
    // it replaced — and which the generated SQL oracle still replays —
    // must agree on every (vector, subspace) code, rounding convention
    // and first-min tie rule included.
    val dim = 64; val m = 8; val nCodes = 16; val sub = dim / m
    val cb: Array[Seq[Double]] = corpus.orderBy(
        pmod(pmod(col("nid").cast("long"), lit(1L << 31)) * 1327217885L,
          lit(1L << 31)), col("nid"))
      .limit(nCodes)
      .select(col("nid").cast("long"), col("vec")).collect()
      .sortBy(_.getLong(0)).map(_.getSeq[Double](1))
    def l2sq(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)),
        lit(0.0), (acc, x) => acc + x)
    def cwLit(s: Int, c: Int) =
      array(cb(c).slice(s * sub, (s + 1) * sub).map(lit): _*)
    def darr(s: Int) = array((0 until nCodes).map(c =>
      round(l2sq(slice(col("vec"), s * sub + 1, sub), cwLit(s, c)), 6)): _*)
    val composed = corpus.select(col("nid") +: (0 until m).map(s =>
        array_position(darr(s), array_min(darr(s))).as(s"c$s")): _*)
      .collect().map(r => r.getLong(0) -> (1 to m).map(r.getLong)).toMap
    val fused = corpus.select(col("nid"),
        graft.functions.PqEncodeExpr.codes(col("vec"), dim, m, cb).as("k"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toIndexedSeq).toMap
    assert(fused == composed, "PQ code divergence between fused and composed")
  }

  test("fused PQ probe distance tables reproduce the composed form bit-for-bit") {
    // pqTopK's probe side runs through PqDistTablesExpr (one codegen
    // pass over a compact codebook reference); the composed per-
    // subspace round(aggregate(zip_with(slice…)…), 6) arrays it
    // replaced — and which the generated SQL oracle still replays —
    // must agree on every (vector, subspace, code) distance, rounding
    // convention included. Probed over the whole corpus (a superset of
    // any probe set).
    val dim = 64; val m = 8; val nCodes = 16; val sub = dim / m
    val cb: Array[Seq[Double]] = corpus.orderBy(
        pmod(pmod(col("nid").cast("long"), lit(1L << 31)) * 1327217885L,
          lit(1L << 31)), col("nid"))
      .limit(nCodes)
      .select(col("nid").cast("long"), col("vec")).collect()
      .sortBy(_.getLong(0)).map(_.getSeq[Double](1))
    def l2sq(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)),
        lit(0.0), (acc, x) => acc + x)
    def cwLit(s: Int, c: Int) =
      array(cb(c).slice(s * sub, (s + 1) * sub).map(lit): _*)
    def darr(s: Int) = array((0 until nCodes).map(c =>
      round(l2sq(slice(col("vec"), s * sub + 1, sub), cwLit(s, c)), 6)): _*)
    val composed = corpus.select(col("nid") +: (0 until m).map(s =>
        darr(s).as(s"d$s")): _*)
      .collect()
      .map(r => r.getLong(0) -> (1 to m).map(r.getSeq[Double]).toIndexedSeq)
      .toMap
    val fused = corpus.select(col("nid"),
        graft.functions.PqDistTablesExpr.tables(col("vec"), dim, m, cb).as("t"))
      .collect()
      .map(r => r.getLong(0) ->
        r.getSeq[scala.collection.Seq[Double]](1)
          .map(_.toIndexedSeq).toIndexedSeq)
      .toMap
    assert(fused.keySet == composed.keySet)
    fused.foreach { case (id, ts) =>
      assert(ts.map(_.map(java.lang.Double.doubleToRawLongBits)) ==
        composed(id).map(_.map(java.lang.Double.doubleToRawLongBits)),
        s"PQ distance-table divergence for nid=$id")
    }
  }

  test("banded verify lookups never sort-merge the wide candidate stream") {
    // The r15 sf3 catch: the post-lookup candidate rows carry a
    // dim-sized vector each — an SMJ sorts that wide stream (~160 GB
    // of sort input at sf3 for the 16×8 tier) and dies by disk. The
    // vector-table lookups must plan as broadcast-hash (small corpus,
    // this test) or shuffled-hash (past the envelope), NEVER
    // sort-merge. AQE off so the static plan is the proof.
    import org.apache.spark.sql.execution.joins.SortMergeJoinExec
    withoutAqe {
      val p = concretePlan(
        Similarity.cosinePairsBanded(corpus, 0.75, 64, 16, 8))
      val smjOnVec = p.collect {
        case j: SortMergeJoinExec
            if j.output.exists(_.name.startsWith("__v")) => j
      }
      assert(smjOnVec.isEmpty,
        s"vector lookup planned as sort-merge:\n$p")
      assert(p.collect { case b: BroadcastExchangeExec => b }.size >= 2,
        "small-corpus verify should broadcast both vector lookups")
    }
  }

  test("nearDupPairs routes by threshold regime and keeps exactness per regime") {
    // low τ → the blocked exact scan, bit-for-bit
    val routedLow = Similarity.nearDupPairs(corpus, 0.45, dim = 64)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val blocked = Similarity.cosinePairsBlocked(corpus, 0.45)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(routedLow == blocked && routedLow.nonEmpty,
      "τ < 0.7 must dispatch to the exact blocked scan")

    // near-exact regime: planted exact duplicates (identical vector →
    // identical band bits) are recalled with probability 1 through the
    // 8×16 selective tier, and the exact verify admits nothing else
    // from this corpus (no true pairs ≥ 0.9 besides the plants)
    val planted = corpus.unionByName(
      corpus.where(col("nid") % 2 === 0)
        .select((col("nid") + 10000000L).as("nid"), col("vec")))
    val hi = Similarity.nearDupPairs(planted, 0.9, dim = 64)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val expected = corpus.where(col("nid") % 2 === 0)
      .select(col("nid")).as[Long].collect()
      .map(i => (i, i + 10000000L, 1.0)).toSet
    assert(hi.toSet == expected && expected.nonEmpty,
      s"high-τ routing must recall every planted duplicate: got ${hi.length}, " +
        s"want ${expected.size}")

    // the mid tier (0.7 ≤ τ < 0.9) uses recall-derived OR-amplified
    // 16-row tables (τ = 0.7 → 245 of them) and also has recall 1 on
    // exact duplicates (identical vectors collide in EVERY table)
    val mid = Similarity.nearDupPairs(planted, 0.7, dim = 64)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(expected.map(p => (p._1, p._2)).subsetOf(mid),
      "mid-τ routing must keep the planted duplicates")
  }

  test("mid-tier recall contract: closed form pins the derived table count") {
    // The r15 verdict's lead task: the 16×8 mid tier's candidate mass
    // was 16·n²/2⁹ BY CONTRACT (wave-4 top-decade α 1.72 at sf3).
    // The r16 rework derives L OR-amplified 16-row tables from the
    // closed-form recall recall(τ,r,L) = 1−(1−p(τ)^r)^L, p = 1−θ/π —
    // this test IS that contract, pinned like the planeSign
    // independence pin: the exact derived values, the ≥-target bound,
    // the minimality of L, and the strict recall improvement over the
    // retired fixed 16×8 config.
    assert(Similarity.MidTierRowsPerBand == 16)
    assert(Similarity.MidTierTargetRecall == 0.9)
    assert(Similarity.midTierTables(0.7) == 245)
    assert(Similarity.midTierTables(0.75) == 150)
    assert(Similarity.midTierTables(0.8) == 89)
    assert(Similarity.midTierTables(0.89) == 31)
    var t = 0.70
    while (t < 0.9) {
      val l = Similarity.midTierTables(t)
      val rec = Similarity.bandedRecall(t, 16, l)
      assert(rec >= Similarity.MidTierTargetRecall,
        f"recall(τ=$t%.2f, 16, L=$l) = $rec%.4f below target")
      assert(l == 1 || Similarity.bandedRecall(t, 16, l - 1) <
        Similarity.MidTierTargetRecall,
        f"L=$l not minimal at τ=$t%.2f")
      t += 0.01
    }
    // the derived tier raises the regime's recall FLOOR: the retired
    // fixed 16×8 config dipped to 0.80 at the τ = 0.7 boundary (above
    // τ ≈ 0.77 it over-delivered recall at 2⁷× the candidate cost —
    // that surplus is what the rework trades for selectivity)
    assert(Similarity.bandedRecall(0.7, 8, 16) < 0.81)
    assert(Similarity.bandedRecall(0.7, 16, Similarity.midTierTables(0.7)) >= 0.9)
    // outside the regime the derivation must refuse loudly
    intercept[IllegalArgumentException](Similarity.midTierTables(0.5))
    intercept[IllegalArgumentException](Similarity.midTierTables(0.95))
    // random-pair candidate mass: the derived tier keeps ≥ 25× fewer
    // candidates than the retired 16×8 at the registry's τ = 0.75
    // (L·2⁻¹⁶ vs 16·2⁻⁸) — the scale-safety the rework buys
    assert(Similarity.midTierTables(0.75) * math.pow(2, -16) * 25 <=
      16 * math.pow(2, -8))
  }

  test("mid-tier routed query recalls planted sign-vector near-dups at the contract rate") {
    // Empirical recall of the DERIVED tier on the q_embed_dup_banded
    // _mid fixture (sign-vector plants, cos 0.704–0.874): banding is
    // deterministic, so the recall on this corpus is a fixed number —
    // pinned ≥ the closed-form floor at the threshold (0.9), minus
    // nothing: every planted pair at cos c ≥ 0.75 has closed-form
    // recall ≥ recall(0.75) since recall is increasing in c.
    // The EXACT pair set comes from the blocked exact scan at the same
    // τ (verified bit-exact against the naive cross join elsewhere).
    val planted = corpus.unionByName(
      corpus.where(col("nid") % 2 === 0)
        .select((col("nid") + 10000000L).as("nid"),
          transform(col("vec"),
            x => when(x >= 0, lit(1.0)).otherwise(lit(-1.0))).as("vec")))
    val exact = Similarity.cosinePairsBlocked(planted, 0.75)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val banded = Similarity.nearDupPairs(planted, 0.75, dim = 64)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(banded.subsetOf(exact), "exact verify ⇒ no false positives")
    assert(exact.size >= 50, s"fixture should plant ≥ 50 pairs ≥ τ, got ${exact.size}")
    val recall = banded.size.toDouble / exact.size
    assert(recall >= 0.85,
      s"mid-tier recall $recall (${banded.size}/${exact.size}) below the " +
        "closed-form floor minus sampling slack")
  }

  test("PQ: codebook vectors self-encode at distance 0; corpus never broadcasts") {
    val probes = corpus.where(col("nid") < 8)
      .select(col("nid").as("qid"), col("vec"))
    val pq = Similarity.pqTopK(probes, corpus, dim = 64, m = 8,
      nCodes = 16, k = 10)
    val rows = pq.collect()
    // every probe reports exactly k ranked rows, ranks contiguous
    assert(rows.groupBy(_.getLong(0)).forall { case (_, rs) =>
      rs.map(_.getLong(1)).sorted.toSeq == (1L to 10L)
    })
    // a probe with id < 16 IS a codebook vector: every subspace
    // quantizes its own sub-vector at L2² = 0, so its own codes give
    // adist 0 — and any corpus vector sharing those codes (at least
    // the probe's own row is excluded, but distance-0 rows rank first)
    // must head the list with adist ≥ 0 ascending
    rows.groupBy(_.getLong(0)).foreach { case (_, rs) =>
      val byRank = rs.sortBy(_.getLong(1)).map(_.getDouble(3))
      assert(byRank.sameElements(byRank.sorted), "adist ascending by rank")
      assert(byRank.head >= 0.0)
    }
    // scale shape: exactly one broadcast, and it is the probe side
    // (its projection carries the __dt distance tables, which exist
    // only on probes) — the raw corpus never broadcasts
    withoutAqe {
      val plan = concretePlan(Similarity.pqTopK(probes, corpus,
        dim = 64, m = 8, nCodes = 16, k = 10))
      val bcasts = plan.collect { case b: BroadcastExchangeExec => b }
      assert(bcasts.size == 1)
      assert(bcasts.head.child.toString.contains("pqdisttablesexpr"),
        "the broadcast side must be the probe distance tables")
    }
  }
}
