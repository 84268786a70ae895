package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.CanonicalKey._

/** Encoding parity with the reference's key canonicalization
  * (util/ByteArray.java:65-84,159-229; record/BaseRecord.java:59-75).
  */
class CanonicalKeySpec extends AnyFunSuite {

  private def bytes(xs: Int*): Array[Byte] = xs.map(_.toByte).toArray

  test("int and long with equal value encode identically (key widening)") {
    val rnd = new java.util.Random(42)
    (0 until 1000).foreach { _ =>
      val v = rnd.nextInt(Int.MaxValue)
      assert(encodeValue(v).sameElements(encodeValue(v.toLong)), s"widening failed for $v")
    }
  }

  test("leading zero bytes stripped; zero encodes as single 0x00") {
    assert(encodeValue(0).sameElements(bytes(0)))
    assert(encodeValue(0L).sameElements(bytes(0)))
    assert(encodeValue(5).sameElements(bytes(5)))
    assert(encodeValue(256).sameElements(bytes(1, 0)))
    assert(encodeValue(0x01020304).sameElements(bytes(1, 2, 3, 4)))
  }

  test("negative int keeps sign bytes (4 vs 8 for long — reference parity)") {
    assert(encodeValue(-1).sameElements(bytes(0xFF, 0xFF, 0xFF, 0xFF)))
    assert(encodeValue(-1L).length == 8)
  }

  test("string utf-8, boolean single byte") {
    assert(encodeValue("ab").sameElements("ab".getBytes("UTF-8")))
    assert(encodeValue(true).sameElements(bytes(1)))
    assert(encodeValue(false).sameElements(bytes(0)))
  }

  test("composite: single length byte + payload per element, in order") {
    // {playlist_id: 4235, user_tag_id: 7234} name-sorted
    val enc = encodeComposite(Seq(4235L, 7234L))
    assert(enc.sameElements(bytes(2, 0x10, 0x8B, 2, 0x1C, 0x42)))
  }

  test("unsigned lexicographic comparator parity on random pairs") {
    // Reference sorts by Bytes.BYTES_LEXICO_COMPARATOR (unsigned byte,
    // then length); verify our chosen ordering model agrees with a
    // direct reimplementation used by Spark's BinaryType ordering.
    def cmp(a: Array[Byte], b: Array[Byte]): Int = {
      val n = math.min(a.length, b.length)
      var i = 0
      while (i < n) {
        val d = (a(i) & 0xFF) - (b(i) & 0xFF)
        if (d != 0) return d
        i += 1
      }
      a.length - b.length
    }
    // e.g. 255 (0xFF) sorts AFTER 256 (0x01 0x00) in canonical order —
    // byte order, not numeric order, matching the reference TreeMap.
    assert(cmp(encodeValue(255), encodeValue(256)) > 0)
    assert(cmp(encodeValue(1), encodeValue(2)) < 0)
    // positive values below 128 keep numeric order within equal length
    val rnd = new java.util.Random(7)
    (0 until 1000).foreach { _ =>
      val a = rnd.nextInt(127) + 1; val b = rnd.nextInt(127) + 1
      assert(Integer.signum(cmp(encodeValue(a), encodeValue(b))) ==
        Integer.signum(Integer.compare(a, b)))
    }
  }
}
