package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench's session-position pinning contract: names present in the
  * frozen manifest (`bench_order.txt`, the r13 registry order) keep
  * exactly their manifest-relative order, anything newer appends after
  * them, and the streaming family always runs last — so adding a query
  * can never shift an existing query's shard position.
  */
class BenchOrderSpec extends AnyFunSuite {

  test("manifest names keep their frozen order; new names append; streams last") {
    val ordered = BenchCore.orderedNames(None)
    val manifest = java.nio.file.Files.readAllLines(
      java.nio.file.Paths.get("bench_order.txt"))
      .toArray(Array.empty[String]).toSeq.map(_.trim).filter(_.nonEmpty)
    val registry = SparkEntry.queries.keySet

    // every registry query is benched exactly once
    assert(ordered.sorted == registry.toSeq.sorted)

    // batch section strictly precedes the streaming section
    val firstStream = ordered.indexWhere(_.startsWith("q_stream_"))
    assert(firstStream >= 0 &&
      ordered.drop(firstStream).forall(_.startsWith("q_stream_")))

    // within each family: the manifest subsequence appears in manifest
    // order, and all post-manifest names come after it
    for (stream <- Seq(false, true)) {
      val fam = ordered.filter(_.startsWith("q_stream_") == stream)
      val inManifest = fam.filter(manifest.contains)
      assert(inManifest ==
        manifest.filter(n => n.startsWith("q_stream_") == stream &&
          registry.contains(n)),
        s"manifest order not preserved for stream=$stream")
      val firstNew = fam.indexWhere(!manifest.contains(_))
      if (firstNew >= 0)
        assert(fam.drop(firstNew).forall(!manifest.contains(_)),
          s"a new name was interleaved into the frozen order (stream=$stream)")
    }
  }
}
