package graft

import graft.operators.MediaHeaders
import graft.operators.MediaHeaders.MediaHeader
import org.scalatest.funsuite.AnyFunSuite

/** Byte-level checks on the real container-header builders/parsers —
  * the query-level round trip is oracle-gated by `media_header_meta`;
  * here we cover the adversarial shapes the fixtures never produce.
  */
class MediaHeaderSpec extends AnyFunSuite {

  test("fixture round trip: parse returns exactly what the builder encoded") {
    for (id <- 0L to 64L) {
      val parsed = MediaHeaders.sniff(MediaHeaders.fixture(id))
      assert(parsed.contains(MediaHeaders.expected(id)), s"doc_id=$id")
    }
  }

  test("non-media payloads (text bytes) sniff to None") {
    assert(MediaHeaders.sniff("hello world, plain text".getBytes("UTF-8")).isEmpty)
    assert(MediaHeaders.sniff(Array.emptyByteArray).isEmpty)
  }

  test("every truncated prefix parses to None, never garbage") {
    for (full <- Seq(MediaHeaders.pngBytes(640, 480),
                     MediaHeaders.jpegBytes(640, 480),
                     MediaHeaders.wavBytes(44100, 2))) {
      // stop before the minimal parseable length of each format
      val minLen = MediaHeaders.sniff(full).map(_ => full.length).getOrElse(0)
      assert(minLen > 0)
      for (cut <- 0 until math.min(full.length, 24))
        assert(MediaHeaders.sniff(full.take(cut)).isEmpty, s"cut=$cut")
    }
  }

  test("jpeg marker walk skips extra APPn/COM segments before SOF") {
    val base = MediaHeaders.jpegBytes(321, 123)
    // splice a COM segment (FFFE, len 10) right after SOI
    val com = Array(0xff, 0xfe, 0x00, 0x0a).map(_.toByte) ++
      "comment!".getBytes("US-ASCII")
    val spliced = base.take(2) ++ com ++ base.drop(2)
    assert(MediaHeaders.sniff(spliced)
      .contains(MediaHeader("jpeg", 321, 123, 0, 0)))
  }

  test("wav chunk walk skips a preceding odd-sized chunk with pad byte") {
    val base = MediaHeaders.wavBytes(22050, 1)
    // insert a 3-byte LIST-style chunk (odd size → 1 pad byte) at offset 12
    val extra = "junk".getBytes("US-ASCII") ++
      Array(0x03, 0x00, 0x00, 0x00).map(_.toByte) ++
      Array(0x01, 0x02, 0x03, 0x00).map(_.toByte) // 3 data + pad
    val spliced = base.take(12) ++ extra ++ base.drop(12)
    assert(MediaHeaders.sniff(spliced)
      .contains(MediaHeader("wav", 0, 0, 22050, 1)))
  }

  test("png with wrong IHDR tag or bad signature is rejected") {
    val good = MediaHeaders.pngBytes(10, 20)
    val badSig = good.clone(); badSig(0) = 0x00
    assert(MediaHeaders.sniff(badSig).isEmpty)
    val badTag = good.clone(); badTag(12) = 'X'.toByte
    // falls through png; not jpeg/wav either
    assert(MediaHeaders.sniff(badTag).isEmpty)
  }
}
