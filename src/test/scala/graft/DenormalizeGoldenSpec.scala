package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.core.Relation
import graft.operators.{Compaction, Denormalize}
import ReferenceFixtures._

/** Golden end-to-end parity against the reference's own fixtures:
  * replay all 8 topic fixtures through filter-aware compaction, build
  * denormalized documents for the 3 relation trees, and compare each
  * doc to the reference's golden output (parsed-JSON equality,
  * field-order-insensitive), including null docs for tombstoned roots.
  * Mirrors the reference's SouthpawEndToEndTest.java:133-165.
  */
class DenormalizeGoldenSpec extends SparkSpec {

  lazy val snapshots: Map[String, DataFrame] = valueSchemas.keys.map { e =>
    e -> Compaction.snapshot(
      Compaction.compact(changelog(spark, e), e, keyFields(e), testFilter)).cache()
  }.toMap

  /** Root keys whose final state is deleted (emit null doc). */
  def deletedRoots(entity: String): Set[Long] = {
    val compacted = Compaction.compact(
      changelog(spark, entity), entity, keyFields(entity), testFilter)
    compacted.where(col("__deleted")).collect()
      .map(r => BigInt(1, r.getAs[Array[Byte]]("__pk")).toLong).toSet
  }

  def check(relationsFile: String, goldenName: String, rootEntity: String): Unit = {
    val trees = Relation.parseFile(s"$root/$relationsFile")
    val tree = trees.find(_.denormalizedName.contains(goldenName)).get
    val docs = Denormalize.documents(tree, snapshots, keyFields)
      .select(col("__pk"), col("doc_json")).collect()
      .map(r => BigInt(1, r.getAs[Array[Byte]]("__pk")).toLong ->
        r.getAs[String]("doc_json")).toMap
    val golden = goldenDocs(goldenName)
    val deleted = deletedRoots(rootEntity)

    golden.foreach { case (key, expected) =>
      expected match {
        case None =>
          assert(!docs.contains(key) && deleted.contains(key),
            s"$goldenName/$key: expected tombstone, got ${docs.get(key)}")
        case Some(doc) =>
          assert(docs.contains(key), s"$goldenName/$key: missing document")
          assert(normalizeJson(docs(key)) == normalize(doc),
            s"$goldenName/$key mismatch:\n got: ${docs(key)}\n exp: $doc")
      }
    }
    // No extra roots beyond the golden set.
    assert(docs.keySet.subsetOf(golden.keySet),
      s"$goldenName: unexpected roots ${docs.keySet.diff(golden.keySet)}")
  }

  test("DenormalizedPlayer golden parity (2-level tree)") {
    check("relations2.sample.json", "DenormalizedPlayer", "player")
  }

  // NOTE: the DenormalizedPlaylist golden is NOT the converged state —
  // the reference's end-to-end run sheds user_tag-triggered rebuilds
  // (TestQueueingStrategy priority NONE), leaving user_tag fields
  // intentionally stale. Batch mode computes the converged state, so
  // playlist golden parity lives in IncrementalGoldenSpec, which
  // replays the reference's schedule through the IVM engine.

  test("DenormalizedMedia golden parity (diamond reuse)") {
    check("relations3.sample.json", "DenormalizedMedia", "media")
  }
}
