package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: opaque `binary` payloads with typed
  * metadata, processed per-partition in batch — the schema/partitioning
  * pattern a 100 TB image/audio pipeline uses.
  *
  * The decode itself is a STUB (no image/audio codecs in this
  * environment): [[StubDecoders.decodeImageMeta]] derives deterministic
  * fake dimensions from payload bytes. Everything around it — binary
  * column handling, case-class Encoders, `mapPartitions` batching,
  * partition-parallel execution — is real and tested. Swap the stub for a
  * JNI/codec call and the plan is unchanged.
  */
object MultimodalOps {

  case class PayloadRow(doc_id: Long, payload: Array[Byte])
  case class MediaMeta(doc_id: Long, n_bytes: Long, width: Int, height: Int,
                       n_frames: Int, checksum_first: Int)

  object StubDecoders {
    /** Decode: sniff a REAL container header first ([[MediaHeaders]] —
      * PNG IHDR / JPEG SOF / WAV fmt parsed from actual header bytes;
      * exercised under the oracle gate by `media_header_meta`); payloads
      * that are not a media container (the staged text bytes) fall back
      * to deterministic STUB metadata derived from payload shape. A real
      * deployment replaces only the fallback/pixel step with a codec
      * call; the signature (bytes in, typed meta out) and the
      * surrounding Spark plumbing stay.
      */
    def decodeImageMeta(doc_id: Long, payload: Array[Byte]): MediaMeta = {
      val n = payload.length.toLong
      MediaHeaders.sniff(payload) match {
        case Some(h) =>
          MediaMeta(
            doc_id = doc_id,
            n_bytes = n,
            width = h.width,
            height = h.height,
            n_frames = 1,
            checksum_first = if (payload.nonEmpty) payload(0) & 0xff else 0)
        case None =>
          MediaMeta(
            doc_id = doc_id,
            n_bytes = n,
            width = ((n * 7) % 640 + 16).toInt,
            height = ((n * 13) % 480 + 16).toInt,
            n_frames = (n % 24 + 1).toInt,
            checksum_first = if (payload.nonEmpty) payload(0) & 0xff else 0)
      }
    }
  }

  /** Binary payload table: text re-encoded as UTF-8 bytes stands in for
    * image/audio blobs. In production this column comes straight from the
    * source parquet.
    */
  def payloads(spark: SparkSession, dir: String): DataFrame =
    Tables
      .documents(spark, dir)
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))

  /** Partition-parallel decode → typed metadata. `mapPartitions` (not
    * per-row map) so a real codec can amortize init cost per partition —
    * the Scala analog of `mapInPandas` batch shape.
    */
  def mediaMeta(spark: SparkSession, dir: String): DataFrame = {
    val session = spark
    import session.implicits._
    payloads(spark, dir)
      .as[PayloadRow]
      .mapPartitions { rows =>
        // per-partition init would happen here (codec handles, buffers)
        rows.map(r => StubDecoders.decodeImageMeta(r.doc_id, r.payload))
      }
      .toDF()
      .orderBy(col("doc_id"))
  }

  case class HeaderMeta(doc_id: Long, format: String, width: Int, height: Int,
                        sample_rate: Int, channels: Int, parse_ok: Boolean)

  /** Self-gated round trip through REAL container headers: each doc_id
    * builds a genuine minimal PNG/JPEG/WAV header
    * ([[MediaHeaders.fixture]] — valid signatures, chunk CRCs, marker
    * segments), the decode parses width/height/sample-rate/channels back
    * out of the actual BYTES ([[MediaHeaders.sniff]]), and the output
    * carries what the PARSER read plus a `parse_ok` verdict against the
    * encoded values. The DuckDB oracle recomputes the builder's
    * deterministic formulas from doc_id with `parse_ok = TRUE`, so any
    * byte-level parsing bug (endianness, offsets, marker walking)
    * hash-mismatches. Same `mapPartitions` batch shape as [[mediaMeta]];
    * at 100 TB the fixture construction is replaced by the real binary
    * column and the parse stays as-is.
    */
  def mediaHeaderMeta(spark: SparkSession, dir: String): DataFrame = {
    val session = spark
    import session.implicits._
    Tables
      .documents(spark, dir)
      .select(col("doc_id"))
      .as[Long]
      .mapPartitions { ids =>
        ids.map { id =>
          val payload = MediaHeaders.fixture(id)
          val exp = MediaHeaders.expected(id)
          val parsed = MediaHeaders.sniff(payload)
          val h = parsed.getOrElse(
            MediaHeaders.MediaHeader("unparsed", -1, -1, -1, -1))
          HeaderMeta(id, h.format, h.width, h.height, h.sampleRate,
                     h.channels, parsed.contains(exp))
        }
      }
      .toDF()
      .orderBy(col("doc_id"))
  }

  /** Frame-sampling plan stub: expand each "video" into its sampled frame
    * index rows (every 8th frame) — the explode-side of a frame-extract
    * pipeline, with deterministic fan-out bounded by metadata.
    */
  def frameSample(spark: SparkSession, dir: String): DataFrame =
    mediaMeta(spark, dir)
      .withColumn("frame_idx",
                  explode(sequence(lit(0), col("n_frames") - 1, lit(8))))
      .select(col("doc_id"), col("frame_idx").cast("long").as("frame_idx"),
              col("width"), col("height"))
      .orderBy(col("doc_id"), col("frame_idx"))

  /** Resize/letterbox planning (the stage between decode and tensor
    * batch): fit each image into a 224x224 box preserving aspect ratio —
    * integer-exact scaled dims (floor, min 1px) and centered padding.
    * Pure column arithmetic over the typed metadata: the planning stage
    * itself adds no payload access on top of the decode that produced the
    * metadata, so against a pre-decoded meta table at 100 TB it is a
    * narrow column scan.
    */
  def imageResize(spark: SparkSession, dir: String): DataFrame = {
    // floor() on both engines (a bare cast would truncate in Spark but
    // ROUND in DuckDB); 224.0*w/h is the same two IEEE ops on each side.
    val box = 224.0
    val fitW = floor(least(lit(box), lit(box) * col("width") / col("height")))
    val fitH = floor(least(lit(box), lit(box) * col("height") / col("width")))
    mediaMeta(spark, dir)
      .select(
        col("doc_id"), col("width"), col("height"),
        greatest(fitW, lit(1L)).as("out_width"),
        greatest(fitH, lit(1L)).as("out_height"))
      .withColumn("pad_left", floor((lit(box) - col("out_width")) / 2.0))
      .withColumn("pad_top", floor((lit(box) - col("out_height")) / 2.0))
      .orderBy(col("doc_id"))
  }

  case class AudioWindow(doc_id: Long, window_idx: Long, n_samples: Long,
                         energy: Long, peak: Int)

  /** Windowed "audio" feature extraction over the raw payload bytes:
    * per 256-byte window, sample count, energy (byte-value sum) and peak.
    * Same `mapPartitions` batch shape as [[mediaMeta]] — a real DSP
    * feature (RMS/MFCC) replaces the loop body; the fan-out
    * (one row per window, bounded by payload size) and the per-partition
    * codec-init point are what the plan contributes.
    */
  def audioFeatures(spark: SparkSession, dir: String): DataFrame = {
    val session = spark
    import session.implicits._
    payloads(spark, dir)
      .as[PayloadRow]
      .mapPartitions { rows =>
        rows.flatMap { r =>
          r.payload.grouped(256).zipWithIndex.map { case (chunk, i) =>
            AudioWindow(
              doc_id = r.doc_id,
              window_idx = i.toLong,
              n_samples = chunk.length.toLong,
              energy = chunk.foldLeft(0L)((a, b) => a + (b & 0xff)),
              peak = chunk.foldLeft(0)((a, b) => math.max(a, b & 0xff)))
          }
        }
      }
      .toDF()
      .orderBy(col("doc_id"), col("window_idx"))
  }

  case class FrameSig(doc_id: Long, frame_idx: Long, sig: Long)

  /** Scene segmentation over per-frame signatures — the shot-boundary
    * pass of a video curation pipeline: each "video" (payload) splits
    * into its [[StubDecoders]] frame count's equal byte slices, every
    * frame gets an integer signature (slice byte sum — the stub's
    * stand-in for a perceptual frame hash), and a CUT fires where the
    * relative signature change clears 20% — decided by the
    * cross-multiplied integers `5·|Δ| > sig_f + sig_{f−1}`, never a
    * float ratio. Cut flags fold into scenes by the islands trick and
    * each scene emits its frame span + energy.
    *
    * Scale shape: signatures compute in `mapPartitions` next to the
    * decode (a real deployment reads frames once for both); the
    * lag/cumsum windows partition per VIDEO with fan-out bounded by
    * the frame count from metadata (≤ 24 here) — bounded-partition
    * windows, not corpus-wide ones.
    */
  def sceneCuts(spark: SparkSession, dir: String): DataFrame = {
    val session = spark
    import session.implicits._
    val sigs = payloads(spark, dir)
      .as[PayloadRow]
      .mapPartitions { rows =>
        rows.flatMap { r =>
          val n = r.payload.length
          if (n == 0) Iterator.empty
          else {
            val k = n % 24 + 1 // = StubDecoders n_frames
            val sums = new Array[Long](k)
            val hit = new Array[Boolean](k)
            var b = 0
            while (b < n) {
              val f = (b.toLong * k / n).toInt
              sums(f) += (r.payload(b) & 0xff)
              hit(f) = true
              b += 1
            }
            // emit only frames that received bytes: for n < k (payloads
            // under 24 bytes) the byte→frame map leaves the LAST frame
            // empty, and the oracle — which derives frames from bytes —
            // never sees it; a phantom zero-sig frame would fire a
            // spurious cut and desynchronize the engines
            Iterator.tabulate(k)(f => f)
              .filter(hit(_))
              .map(f => FrameSig(r.doc_id, f.toLong, sums(f)))
          }
        }
      }
      .toDF()
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("frame_idx"))
    sigs
      .withColumn("prev", lag(col("sig"), 1).over(w))
      .withColumn("is_cut",
                  col("prev").isNotNull &&
                    lit(5L) * abs(col("sig") - col("prev")) >
                      col("sig") + col("prev"))
      .withColumn("scene_idx",
                  sum(when(col("is_cut"), 1L).otherwise(0L))
                    .over(w.rowsBetween(
                      org.apache.spark.sql.expressions.Window.unboundedPreceding,
                      org.apache.spark.sql.expressions.Window.currentRow)))
      .groupBy(col("doc_id"), col("scene_idx"))
      .agg(min(col("frame_idx")).as("start_frame"),
           max(col("frame_idx")).as("end_frame"),
           count(lit(1)).as("n_frames"),
           sum(col("sig")).as("scene_energy"))
      .orderBy(col("doc_id"), col("scene_idx"))
  }

  case class AHashRow(doc_id: Long, ahash: String)

  /** Perceptual average-hash (aHash) per "image": the payload splits
    * into 64 equal byte cells (the stub's stand-in for an 8×8 luminance
    * downsample — a real decoder feeds pixel blocks into the SAME
    * cell-mean → bit pipeline), bit c fires iff cell c's mean exceeds
    * the global mean, decided by the cross-multiplied integers
    * `s_c·n > t·len_c` (never a float ratio), emitted as 16 hex chars
    * MSB-first. Pure per-row `mapPartitions` arithmetic next to the
    * decode — no shuffle.
    */
  def imageAhash(spark: SparkSession, dir: String): DataFrame =
    ahashFrame(spark, dir).orderBy(col("doc_id"))

  private def ahashFrame(spark: SparkSession, dir: String): DataFrame =
    ahashFrameOf(spark, payloads(spark, dir))

  private def ahashFrameOf(spark: SparkSession, pay: DataFrame): DataFrame = {
    val session = spark
    import session.implicits._
    pay
      .as[PayloadRow]
      .mapPartitions { rows =>
        rows.filter(_.payload.nonEmpty).map { r =>
          val n = r.payload.length
          val s = new Array[Long](64)
          val l = new Array[Long](64)
          var t = 0L
          var i = 0
          while (i < n) {
            val c = (i.toLong * 64 / n).toInt
            val v = (r.payload(i) & 0xff).toLong
            s(c) += v; l(c) += 1; t += v
            i += 1
          }
          val sb = new java.lang.StringBuilder(16)
          var q = 0
          while (q < 16) {
            var nv = 0
            var k = 0
            while (k < 4) {
              val c = q * 4 + k
              if (s(c) * n > t * l(c)) nv |= (8 >> k)
              k += 1
            }
            sb.append("0123456789abcdef".charAt(nv))
            q += 1
          }
          AHashRow(r.doc_id, sb.toString)
        }
      }
      .toDF()
  }

  /** Near-duplicate "images" via banded Hamming search over the aHash —
    * the image-side twin of `simhash_pairs`: 4×16-bit bands, pigeonhole-
    * complete for distance ≤ 3, in-bucket expansion with the shared
    * [[DedupOps.MaxBucket]] skew cap, exact Hamming recheck. The oracle
    * is the FULL all-pairs truth, so a hash match proves the banding
    * lost nothing. Scale: one signature pass, one bucket shuffle —
    * never an image-pair cross join.
    */
  def imageDupPairs(spark: SparkSession, dir: String): DataFrame =
    dupPairsOf(ahashFrame(spark, dir))

  /** Offset for planted duplicate doc ids — far above any real doc_id
    * at every test SF, so planted pairs are (original, original+offset)
    * with original < clone.
    */
  private[operators] val CloneOffset = 10000000L

  /** [[imageDupPairs]] over the corpus ∪ PLANTED exact duplicates (every
    * 50th document cloned byte-for-byte under [[CloneOffset]]): the base
    * corpus has no Hamming≤3 pair at test SFs, so the base query gates
    * 0-rows-vs-0-rows — this variant guarantees positive rows through
    * the SAME banded search (a clone shares all four band prefixes with
    * its source, so the pigeonhole route must surface it with
    * hamming = 0). The oracle is the all-pairs truth over the identical
    * augmented corpus; near-dup (1 ≤ d ≤ 3) positives stay covered by
    * the fixture spec (OperatorSpec).
    */
  def imageDupPairsPlanted(spark: SparkSession, dir: String): DataFrame = {
    val base = payloads(spark, dir)
    val clones = base
      .filter(col("doc_id") % 50 === 0)
      .select((col("doc_id") + lit(CloneOffset)).as("doc_id"), col("payload"))
    dupPairsOf(ahashFrameOf(spark, base.union(clones)))
  }

  private def dupPairsOf(hx: DataFrame): DataFrame = {
    val bands = hx
      .select(col("doc_id"),
              explode(sequence(lit(0), lit(3))).as("band"),
              col("ahash"))
      .withColumn("prefix", substr(col("ahash"), col("band") * 4 + 1, lit(4)))
    bands
      .groupBy(col("band"), col("prefix"))
      .agg(array_sort(collect_list(struct(col("doc_id"), col("ahash"))))
        .as("ds"))
      .filter(size(col("ds")) > 1 && size(col("ds")) <= DedupOps.MaxBucket)
      .select(DedupOps.inBucketPairs(col("ds"))((a, b) =>
        struct(a.getField("doc_id").as("doc1"),
               b.getField("doc_id").as("doc2"),
               a.getField("ahash").as("h1"),
               b.getField("ahash").as("h2"))).as("p"))
      .select(col("p.doc1").as("doc1"), col("p.doc2").as("doc2"),
              graft.functions.TextExprs.hammingHex(col("p.h1"), col("p.h2"))
                .as("hamming"))
      .distinct()
      .filter(col("hamming") <= 3)
      .orderBy(col("doc1"), col("doc2"))
  }

  // ---- DuckDB oracles ----------------------------------------------------
  // The stub decode is pure arithmetic on byte length, so the oracle can
  // reproduce it exactly in SQL.

  /** Shared oracle CTE: aHash hex per document (all-ASCII texts, see the
    * media_meta note — ascii(char) is the payload byte). The 64-cell
    * grid is generated explicitly so short documents (< 64 bytes) get
    * their empty cells as bit 0 exactly like the Scala arrays do.
    */
  private def ahashSqlFrom(src: String): String =
    s"""WITH srcdocs AS ($src),
      |p AS (SELECT doc_id, text, octet_length(encode(text)) AS n
      |           FROM srcdocs WHERE octet_length(encode(text)) > 0),
      |cg AS (SELECT doc_id, n, r.c AS cell FROM p, UNNEST(range(0, 64)) r(c)),
      |b AS (SELECT doc_id, n, CAST(((p2.i - 1) * 64) // n AS BIGINT) AS cell,
      |             ascii(substr(text, CAST(p2.i AS INT), 1)) AS v
      |      FROM p, UNNEST(range(1, n + 1)) p2(i)),
      |cs AS (SELECT doc_id, cell, CAST(sum(v) AS BIGINT) AS s,
      |              CAST(count(*) AS BIGINT) AS l
      |       FROM b GROUP BY 1, 2),
      |tot AS (SELECT doc_id, CAST(sum(s) AS BIGINT) AS t FROM cs GROUP BY 1),
      |fc AS (SELECT cg.doc_id, cg.n, cg.cell, coalesce(cs.s, 0) AS s,
      |              coalesce(cs.l, 0) AS l, tot.t
      |       FROM cg LEFT JOIN cs ON cg.doc_id = cs.doc_id AND cg.cell = cs.cell
      |       JOIN tot ON cg.doc_id = tot.doc_id),
      |bits AS (SELECT doc_id, cell,
      |                CASE WHEN s * n > t * l THEN 1 ELSE 0 END AS bit
      |         FROM fc),
      |nib AS (SELECT doc_id, cell // 4 AS q,
      |               CAST(sum(bit * (CASE cell % 4 WHEN 0 THEN 8 WHEN 1 THEN 4
      |                               WHEN 2 THEN 2 ELSE 1 END)) AS INT) AS nv
      |        FROM bits GROUP BY 1, 2),
      |hx AS (SELECT doc_id,
      |              string_agg(substr('0123456789abcdef', nv + 1, 1), ''
      |                         ORDER BY q) AS ahash
      |       FROM nib GROUP BY 1)""".stripMargin

  private val ahashSql: String =
    ahashSqlFrom("SELECT doc_id, text FROM documents")

  /** The augmented corpus [[imageDupPairsPlanted]] hashes: documents ∪
    * byte-identical clones of every 50th doc under [[CloneOffset]].
    */
  private val ahashPlantedSql: String =
    ahashSqlFrom(
      s"""SELECT doc_id, text FROM documents
         |  UNION ALL
         |  SELECT doc_id + $CloneOffset AS doc_id, text FROM documents
         |  WHERE doc_id % 50 = 0""".stripMargin)

  private val hammingPairsSql: String =
    """ham AS (
      |  SELECT a.doc_id AS doc1, b.doc_id AS doc2,
      |         CAST(list_sum(list_transform(range(1, 17), i ->
      |           bit_count(xor(
      |             CAST(strpos('0123456789abcdef',
      |                         substr(a.ahash, CAST(i AS INT), 1)) - 1
      |                  AS BIGINT),
      |             CAST(strpos('0123456789abcdef',
      |                         substr(b.ahash, CAST(i AS INT), 1)) - 1
      |                  AS BIGINT))))) AS BIGINT) AS hamming
      |  FROM hx a JOIN hx b ON a.doc_id < b.doc_id
      |)
      |SELECT doc1, doc2, hamming FROM ham
      |WHERE hamming <= 3 ORDER BY doc1, doc2""".stripMargin

  val oracles: Map[String, String] = Map(
    "image_ahash" ->
      s"""$ahashSql
         |SELECT doc_id, ahash FROM hx ORDER BY doc_id""".stripMargin,
    // full all-pairs truth — a hash match proves the 4x16-bit banding
    // (pigeonhole-complete for d <= 3) lost no pair
    "image_dup_pairs" ->
      s"""$ahashSql,
         |$hammingPairsSql""".stripMargin,
    // planted-positive twin: all-pairs truth over the augmented corpus;
    // each clone must surface through the banded search with hamming 0
    "image_dup_pairs_planted" ->
      s"""$ahashPlantedSql,
         |$hammingPairsSql""".stripMargin,
    "media_meta" ->
      // texts are all-ASCII (verified), so the first UTF-8 byte equals the
      // first codepoint: ascii() is a safe byte accessor here.
      """WITH p AS (SELECT doc_id, text, octet_length(encode(text)) AS n FROM documents),
        |m AS (
        |  SELECT doc_id, CAST(n AS BIGINT) AS n_bytes,
        |         CAST((n * 7) % 640 + 16 AS INT) AS width,
        |         CAST((n * 13) % 480 + 16 AS INT) AS height,
        |         CAST(n % 24 + 1 AS INT) AS n_frames,
        |         CAST(CASE WHEN n > 0 THEN ascii(substr(text, 1, 1)) ELSE 0 END AS INT) AS checksum_first
        |  FROM p
        |)
        |SELECT * FROM m ORDER BY doc_id""".stripMargin,
    // the fixture-builder formulas from MediaHeaders.expected, verbatim;
    // the Spark side reaches these values only by PARSING the real
    // header bytes it built, so the hash gate checks the byte round trip
    "media_header_meta" ->
      """SELECT doc_id,
        |       CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'png'
        |            WHEN 1 THEN 'jpeg' ELSE 'wav' END AS format,
        |       CAST(CASE WHEN doc_id % 3 IN (0, 1)
        |                 THEN doc_id % 1920 + 1 ELSE 0 END AS INT) AS width,
        |       CAST(CASE WHEN doc_id % 3 IN (0, 1)
        |                 THEN doc_id % 1080 + 1 ELSE 0 END AS INT) AS height,
        |       CAST(CASE WHEN doc_id % 3 = 2 THEN
        |              CASE CAST(doc_id % 5 AS INT)
        |                   WHEN 0 THEN 8000 WHEN 1 THEN 16000
        |                   WHEN 2 THEN 22050 WHEN 3 THEN 32000
        |                   ELSE 44100 END
        |            ELSE 0 END AS INT) AS sample_rate,
        |       CAST(CASE WHEN doc_id % 3 = 2
        |                 THEN doc_id % 2 + 1 ELSE 0 END AS INT) AS channels,
        |       TRUE AS parse_ok
        |FROM documents ORDER BY doc_id""".stripMargin,
    "frame_sample" ->
      """WITH p AS (SELECT doc_id, octet_length(encode(text)) AS n FROM documents),
        |m AS (SELECT doc_id, CAST(n % 24 + 1 AS INT) AS n_frames,
        |             CAST((n * 7) % 640 + 16 AS INT) AS width,
        |             CAST((n * 13) % 480 + 16 AS INT) AS height FROM p)
        |SELECT doc_id, CAST(f.frame_idx AS BIGINT) AS frame_idx, width, height
        |FROM m, UNNEST(range(0, n_frames, 8)) f(frame_idx)
        |ORDER BY doc_id, frame_idx""".stripMargin,
    "image_resize" ->
      """WITH p AS (SELECT doc_id, octet_length(encode(text)) AS n FROM documents),
        |m AS (SELECT doc_id, CAST((n * 7) % 640 + 16 AS INT) AS width,
        |             CAST((n * 13) % 480 + 16 AS INT) AS height FROM p),
        |r AS (
        |  SELECT doc_id, width, height,
        |         greatest(CAST(floor(least(224.0, 224.0 * width / height)) AS BIGINT), 1) AS out_width,
        |         greatest(CAST(floor(least(224.0, 224.0 * height / width)) AS BIGINT), 1) AS out_height
        |  FROM m)
        |SELECT doc_id, width, height, out_width, out_height,
        |       CAST(floor((224.0 - out_width) / 2.0) AS BIGINT) AS pad_left,
        |       CAST(floor((224.0 - out_height) / 2.0) AS BIGINT) AS pad_top
        |FROM r ORDER BY doc_id""".stripMargin,
    "scene_cuts" ->
      // all-ASCII texts (see media_meta note): char position = byte
      // position; frame of byte i is ((i-1)·k) // n, k = n % 24 + 1
      """WITH p AS (SELECT doc_id, text, octet_length(encode(text)) AS n FROM documents),
        |b AS (
        |  SELECT doc_id,
        |         CAST(((p2.i - 1) * (n % 24 + 1)) // n AS BIGINT) AS frame_idx,
        |         ascii(substr(text, CAST(p2.i AS INT), 1)) AS v
        |  FROM p, UNNEST(range(1, n + 1)) p2(i)
        |  WHERE n > 0
        |),
        |fs AS (SELECT doc_id, frame_idx, CAST(sum(v) AS BIGINT) AS sig
        |       FROM b GROUP BY 1, 2),
        |fl AS (
        |  SELECT *, CASE WHEN lag(sig) OVER w IS NOT NULL
        |                  AND 5 * abs(sig - lag(sig) OVER w)
        |                      > sig + lag(sig) OVER w
        |            THEN 1 ELSE 0 END AS cut
        |  FROM fs WINDOW w AS (PARTITION BY doc_id ORDER BY frame_idx)
        |),
        |sc AS (
        |  SELECT *, CAST(sum(cut) OVER (PARTITION BY doc_id ORDER BY frame_idx
        |              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |            AS BIGINT) AS scene_idx
        |  FROM fl
        |)
        |SELECT doc_id, scene_idx, min(frame_idx) AS start_frame,
        |       max(frame_idx) AS end_frame, count(*) AS n_frames,
        |       CAST(sum(sig) AS BIGINT) AS scene_energy
        |FROM sc GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "audio_features" ->
      // all-ASCII texts (see media_meta note): ascii(char) == payload byte
      """WITH b AS (
        |  SELECT doc_id, CAST((p.i - 1) // 256 AS BIGINT) AS window_idx,
        |         ascii(substr(text, CAST(p.i AS INT), 1)) AS v
        |  FROM documents, UNNEST(range(1, length(text) + 1)) p(i)
        |)
        |SELECT doc_id, window_idx, CAST(count(*) AS BIGINT) AS n_samples,
        |       CAST(sum(v) AS BIGINT) AS energy, CAST(max(v) AS INT) AS peak
        |FROM b GROUP BY doc_id, window_idx ORDER BY doc_id, window_idx""".stripMargin
  )
}
