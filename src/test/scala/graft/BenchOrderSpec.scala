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

  test("drift canary triples render in the bench JSON line with ratios") {
    val r = BenchCore.SessionResult(
      Seq("q_a" -> 1.0), Seq("q_a" -> List(1.0)), Nil)
    val start = Seq("__canary_cpu" -> 0.8, "__canary_shuffle" -> 3.0,
      "__canary_stream" -> 2.5)
    val end = Seq("__canary_cpu" -> 1.0, "__canary_shuffle" -> 3.0,
      "__canary_stream" -> 2.5)
    val line = BenchCore.jsonLine(r, "/x", 1, Some((start, end)))
    assert(line.contains("\"canary\":{\"start\":{"))
    assert(line.contains("\"__canary_cpu\":0.8"))
    assert(line.contains("\"ratio\":{\"__canary_cpu\":1.250"))
    // no canary → no key, and the line stays the driver-contract shape
    val bare = BenchCore.jsonLine(r, "/x", 1, None)
    assert(!bare.contains("canary") && bare.contains("\"metric\":\"total\""))
    // canary names never collide with the registry
    assert(BenchCore.canaryNames.forall(n => !SparkEntry.queries.contains(n)))
  }

  test("per-shard host probes render as shard_host entries; TSV round-trips H rows") {
    val r = BenchCore.SessionResult(
      Seq("q_a" -> 1.0, "q_b" -> 2.0), Seq("q_a" -> List(1.0)), Nil)
    val sh = Seq((0, "q_a", "q_b", Map("start" -> 0.5, "end" -> 0.6)))
    val line = BenchCore.jsonLine(r, "/x", 1, None, sh)
    assert(line.contains("\"shard_host\":[{\"shard\":0,\"first\":\"q_a\"," +
      "\"last\":\"q_b\",\"end\":0.6,\"start\":0.5}]"))
    // absent → key absent (old consumers see the identical line)
    assert(!BenchCore.jsonLine(r, "/x", 1, None).contains("shard_host"))

    // readTsv picks up the H bracket rows a shard child writes
    val p = java.nio.file.Files.createTempFile("graft_bench_h", ".tsv")
    java.nio.file.Files.writeString(p,
      "H\tstart\t0.51\nQ\tq_a\t1.25\nH\tend\t0.49\n")
    val parsed = BenchCore.readTsv(p.toString)
    assert(parsed.results == Seq("q_a" -> 1.25))
    assert(parsed.host == List("start" -> 0.51, "end" -> 0.49))
    // the probe itself runs and returns a positive wall time
    assert(BenchCore.hostProbe() > 0.0)
  }
}
