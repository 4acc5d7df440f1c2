package graft.operators

import java.io.ByteArrayOutputStream
import java.util.zip.CRC32

/** Genuine media container headers — built and parsed from the public
  * format specs (PNG: RFC 2083 / ISO 15948 §5.3; JPEG: ITU-T T.81 §B.2;
  * WAV: RIFF/WAVE as in the Microsoft multimedia file format spec), in
  * pure JVM code with no codec dependency.
  *
  * Two halves:
  *   - builders emit minimal valid headers (PNG signature + IHDR + IEND
  *     with real CRC32s; JPEG SOI + APP0/JFIF + SOF0 + EOI; RIFF/WAVE
  *     with a 16-byte PCM `fmt ` chunk), deterministically parameterized
  *     by doc_id — the fixture side;
  *   - [[sniff]] parses width/height/sample-rate/channels back out of
  *     the actual header BYTES (magic sniffing, big-endian IHDR/SOF
  *     fields, little-endian fmt fields, marker/chunk walking) — the
  *     decode path a real codec slots into, replacing only the
  *     pixel/sample decoding that no library in this environment can do.
  *
  * The `media_header_meta` query self-gates the round trip: the Spark
  * side emits what the PARSER read, the DuckDB oracle recomputes what
  * the BUILDER encoded from the same doc_id formulas — any parsing bug
  * hash-mismatches.
  */
object MediaHeaders {

  /** Parsed header facts. Image formats carry width/height (audio
    * fields 0); WAV carries sampleRate/channels (image fields 0).
    */
  case class MediaHeader(format: String, width: Int, height: Int,
                         sampleRate: Int, channels: Int)

  // ------------------------------------------------------------------
  // builders
  // ------------------------------------------------------------------

  private def be32(v: Int): Array[Byte] =
    Array(((v >>> 24) & 0xff).toByte, ((v >>> 16) & 0xff).toByte,
          ((v >>> 8) & 0xff).toByte, (v & 0xff).toByte)
  private def be16(v: Int): Array[Byte] =
    Array(((v >>> 8) & 0xff).toByte, (v & 0xff).toByte)
  private def le32(v: Int): Array[Byte] =
    Array((v & 0xff).toByte, ((v >>> 8) & 0xff).toByte,
          ((v >>> 16) & 0xff).toByte, ((v >>> 24) & 0xff).toByte)
  private def le16(v: Int): Array[Byte] =
    Array((v & 0xff).toByte, ((v >>> 8) & 0xff).toByte)

  private val PngSignature =
    Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

  private def pngChunk(chunkType: String, data: Array[Byte]): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    out.write(be32(data.length))
    val typeBytes = chunkType.getBytes("US-ASCII")
    out.write(typeBytes)
    out.write(data)
    val crc = new CRC32()
    crc.update(typeBytes)
    crc.update(data)
    out.write(be32(crc.getValue.toInt))
    out.toByteArray
  }

  /** Minimal valid PNG: signature, IHDR (8-bit truecolor), IEND. */
  def pngBytes(width: Int, height: Int): Array[Byte] = {
    val ihdr = new ByteArrayOutputStream()
    ihdr.write(be32(width))
    ihdr.write(be32(height))
    ihdr.write(8) // bit depth
    ihdr.write(2) // color type: truecolor
    ihdr.write(0) // compression
    ihdr.write(0) // filter
    ihdr.write(0) // interlace
    val out = new ByteArrayOutputStream()
    out.write(PngSignature)
    out.write(pngChunk("IHDR", ihdr.toByteArray))
    out.write(pngChunk("IEND", Array.emptyByteArray))
    out.toByteArray
  }

  /** Minimal JPEG: SOI, APP0/JFIF, SOF0 (baseline, 3 components), EOI.
    * No scan data — dimension parsing needs only the SOF frame header.
    */
  def jpegBytes(width: Int, height: Int): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    out.write(0xff); out.write(0xd8) // SOI
    out.write(0xff); out.write(0xe0) // APP0
    out.write(be16(16))              // segment length (incl. itself)
    out.write("JFIF".getBytes("US-ASCII")); out.write(0)
    out.write(1); out.write(1)       // version 1.1
    out.write(0)                     // density units
    out.write(be16(1)); out.write(be16(1)) // x/y density
    out.write(0); out.write(0)       // no thumbnail
    out.write(0xff); out.write(0xc0) // SOF0
    out.write(be16(8 + 3 * 3))       // length: 8 + 3 per component
    out.write(8)                     // precision
    out.write(be16(height))
    out.write(be16(width))
    out.write(3)                     // components: YCbCr
    for (c <- 1 to 3) { out.write(c); out.write(0x11); out.write(0) }
    out.write(0xff); out.write(0xd9) // EOI
    out.toByteArray
  }

  /** Minimal RIFF/WAVE: 16-byte PCM `fmt ` chunk + empty `data` chunk. */
  def wavBytes(sampleRate: Int, channels: Int): Array[Byte] = {
    val bitsPerSample = 16
    val blockAlign = channels * bitsPerSample / 8
    val out = new ByteArrayOutputStream()
    out.write("RIFF".getBytes("US-ASCII"))
    out.write(le32(36)) // 4 ("WAVE") + (8+16) fmt + 8 data header, 0 data
    out.write("WAVE".getBytes("US-ASCII"))
    out.write("fmt ".getBytes("US-ASCII"))
    out.write(le32(16))
    out.write(le16(1)) // PCM
    out.write(le16(channels))
    out.write(le32(sampleRate))
    out.write(le32(sampleRate * blockAlign)) // byte rate
    out.write(le16(blockAlign))
    out.write(le16(bitsPerSample))
    out.write("data".getBytes("US-ASCII"))
    out.write(le32(0))
    out.toByteArray
  }

  // ------------------------------------------------------------------
  // deterministic fixture formulas (mirrored verbatim in the oracle SQL)
  // ------------------------------------------------------------------

  private val WavRates = Array(8000, 16000, 22050, 32000, 44100)

  /** What doc_id's fixture encodes — the oracle recomputes exactly this. */
  def expected(docId: Long): MediaHeader = (docId % 3) match {
    case 0 => MediaHeader("png", (docId % 1920 + 1).toInt,
                          (docId % 1080 + 1).toInt, 0, 0)
    case 1 => MediaHeader("jpeg", (docId % 1920 + 1).toInt,
                          (docId % 1080 + 1).toInt, 0, 0)
    case _ => MediaHeader("wav", 0, 0, WavRates((docId % 5).toInt),
                          (docId % 2 + 1).toInt)
  }

  /** doc_id's fixture payload: real header bytes for [[expected]]. */
  def fixture(docId: Long): Array[Byte] = {
    val e = expected(docId)
    e.format match {
      case "png"  => pngBytes(e.width, e.height)
      case "jpeg" => jpegBytes(e.width, e.height)
      case _      => wavBytes(e.sampleRate, e.channels)
    }
  }

  // ------------------------------------------------------------------
  // parsers
  // ------------------------------------------------------------------

  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xff
  private def readBe32(b: Array[Byte], i: Int): Int =
    (u8(b, i) << 24) | (u8(b, i + 1) << 16) | (u8(b, i + 2) << 8) | u8(b, i + 3)
  private def readBe16(b: Array[Byte], i: Int): Int =
    (u8(b, i) << 8) | u8(b, i + 1)
  private def readLe32(b: Array[Byte], i: Int): Int =
    u8(b, i) | (u8(b, i + 1) << 8) | (u8(b, i + 2) << 16) | (u8(b, i + 3) << 24)
  private def readLe16(b: Array[Byte], i: Int): Int =
    u8(b, i) | (u8(b, i + 1) << 8)

  private def pngHeader(b: Array[Byte]): Option[MediaHeader] =
    if (b.length >= 24 &&
        b.take(8).sameElements(PngSignature) &&
        new String(b, 12, 4, "US-ASCII") == "IHDR")
      Some(MediaHeader("png", readBe32(b, 16), readBe32(b, 20), 0, 0))
    else None

  /** Walk JPEG marker segments from SOI to the first frame header
    * (SOF0–SOF15, excluding the non-frame C4/C8/CC markers) and read
    * height/width from it — the same walk any JPEG dimension probe
    * does, robust to any number of APPn/COM segments in between.
    */
  private def jpegHeader(b: Array[Byte]): Option[MediaHeader] = {
    if (b.length < 4 || u8(b, 0) != 0xff || u8(b, 1) != 0xd8) return None
    var i = 2
    while (i + 3 < b.length && u8(b, i) == 0xff) {
      val marker = u8(b, i + 1)
      if (marker == 0xd9 || marker == 0xda) return None // EOI / SOS first
      val len = readBe16(b, i + 2)
      if (len < 2 || i + 2 + len > b.length) return None
      val isSof = marker >= 0xc0 && marker <= 0xcf &&
        marker != 0xc4 && marker != 0xc8 && marker != 0xcc
      if (isSof) {
        if (len < 7) return None
        return Some(MediaHeader("jpeg", readBe16(b, i + 7), readBe16(b, i + 5),
                                0, 0))
      }
      i += 2 + len
    }
    None
  }

  /** Walk RIFF chunks to `fmt ` and read channels/sample-rate. */
  private def wavHeader(b: Array[Byte]): Option[MediaHeader] = {
    if (b.length < 12 ||
        new String(b, 0, 4, "US-ASCII") != "RIFF" ||
        new String(b, 8, 4, "US-ASCII") != "WAVE") return None
    var i = 12
    while (i + 8 <= b.length) {
      val id = new String(b, i, 4, "US-ASCII")
      val size = readLe32(b, i + 4)
      if (size < 0 || i + 8 + size > b.length) return None
      if (id == "fmt ") {
        if (size < 8) return None
        return Some(MediaHeader("wav", 0, 0, readLe32(b, i + 12),
                                readLe16(b, i + 10)))
      }
      i += 8 + size + (size & 1) // RIFF chunks are word-aligned
    }
    None
  }

  /** Magic-sniff and parse a payload's container header; None for
    * anything that is not a recognized media container (e.g. the text
    * payloads [[MultimodalOps.payloads]] stages), which callers route
    * to their non-media fallback.
    */
  def sniff(b: Array[Byte]): Option[MediaHeader] =
    pngHeader(b).orElse(jpegHeader(b)).orElse(wavHeader(b))
}
