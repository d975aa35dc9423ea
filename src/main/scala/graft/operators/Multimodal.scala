package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import Tables._

/**
 * Multimodal-column plumbing [EXT]: image/audio/video payloads modeled as
 * opaque `binary` columns with typed metadata, and decode / feature-extract
 * / frame-sample implemented as typed `mapPartitions`/`flatMap` stages over
 * `Dataset[MediaRecord]`.
 *
 * The actual codec is a STUB (this container has no image/audio libraries):
 * [[decodeFrames]] deterministically "decodes" the payload into fixed-size
 * frames, standing in for e.g. a JPEG decoder or audio resampler. Everything
 * around the stub is real and load-bearing at scale:
 *  - the media table schema (binary payload + typed metadata columns);
 *  - the Tungsten-encoded Dataset boundary (`as[MediaRecord]`) into
 *    imperative per-partition code — the same shape a JNI/FFI codec needs;
 *  - batched iteration inside each partition ([[DecodeBatch]] records per
 *    in-flight batch, mirroring a vectorized `mapInPandas`-style decoder
 *    that amortizes codec setup without materializing the partition);
 *  - features are exact integers (plus one integer-ratio double), so the
 *    whole pipeline — including the binary payload bytes — is verified
 *    against the DuckDB oracle.
 *
 * The payload is the document's UTF-8 bytes (testdata is pure ASCII, so the
 * oracle can address the same bytes with `ord(text[i])`).
 */
object Multimodal {

  /** One media object: opaque payload + typed metadata. */
  case class MediaRecord(doc_id: Long, format: String, width: Int,
                         payload: Array[Byte])

  /** Decoded per-object features (integer-exact for oracle parity). */
  case class MediaFeatures(doc_id: Long, format: String, width: Int,
                           n_bytes: Int, content_hash: Long, n_frames: Int,
                           n_sampled: Int, sampled_byte_sum: Long,
                           frame_mean: Double)

  /** One sampled frame (flatMap output — the UDTF shape). */
  case class MediaFrame(doc_id: Long, frame_idx: Int, frame_len: Int,
                        frame_sum: Long)

  /** Frame geometry of the fake codec. aHash packs one bit per frame
    * byte into a 64-bit long (`1L << i`): Java's shift wraps modulo 64,
    * so enlarging the frame past 64 bytes would silently alias bits here
    * while the DuckDB twin errors past 63 — guard the hash width. */
  private val FrameBytes = 32
  require(FrameBytes <= 64, s"aHash packs one bit per frame byte into a 64-bit long; FrameBytes=$FrameBytes would alias under Java's mod-64 shift")
  /** Keep every 4th frame (frame sampling, as a video pipeline would). */
  private val FrameStride = 4
  /** Records decoded per batch inside a partition. */
  private val BatchSize = 64

  /** The media table: documents re-typed as binary media objects with
    * deterministic metadata (format from doc_id, width from doc_id — fake
    * but typed and oracle-reproducible). Column pruning still works: the
    * payload column only reaches stages that consume it. */
  def mediaTable(spark: SparkSession, dir: String): Dataset[MediaRecord] = {
    import spark.implicits._
    t(spark, dir, "documents")
      .select(col("doc_id"),
              element_at(array(lit("image"), lit("audio"), lit("video")),
                         (col("doc_id") % 3).cast("int") + 1).as("format"),
              (lit(16) + (col("doc_id") % 16) * 8).cast("int").as("width"),
              encode(col("text"), "UTF-8").as("payload"))
      .as[MediaRecord]
  }

  /** SQL twin of [[mediaTable]]'s metadata + payload-as-text view. */
  private val mediaSql: String =
    """media AS (
      |  SELECT doc_id,
      |         CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image'
      |              WHEN 1 THEN 'audio' ELSE 'video' END AS format,
      |         CAST(16 + (doc_id % 16) * 8 AS INT) AS width,
      |         text, length(text) AS n_bytes
      |  FROM documents)""".stripMargin

  /** STUB codec: "decode" the payload into its sampled frames. A real
    * implementation would hand `payload` to an image/audio library here;
    * the deterministic stand-in slices fixed-size frames and keeps every
    * [[FrameStride]]-th, preserving the exact dataflow shape. */
  private def decodeFrames(payload: Array[Byte]): Iterator[(Int, Array[Byte])] =
    payload.grouped(FrameBytes).zipWithIndex.collect {
      case (frame, idx) if idx % FrameStride == 0 => (idx, frame)
    }

  /** Feature extraction: batched per-partition decode. The `grouped`
    * iterator keeps at most [[BatchSize]] decoded records in flight —
    * the partition itself is never materialized. */
  def mediaFeatures(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    mediaTable(spark, dir).mapPartitions { it =>
      it.grouped(BatchSize).flatMap { batch =>
        // one DecodeBatch ≙ one vectorized codec call
        batch.iterator.map { r =>
          val frames = decodeFrames(r.payload).toSeq
          val sampledBytes = frames.iterator.flatMap(_._2).map(_ & 0xff)
          var n = 0; var s = 0L
          sampledBytes.foreach { b => n += 1; s += b }
          MediaFeatures(
            doc_id = r.doc_id, format = r.format, width = r.width,
            n_bytes = r.payload.length,
            content_hash = md5LongOf(r.payload),
            n_frames = (r.payload.length + FrameBytes - 1) / FrameBytes,
            n_sampled = n, sampled_byte_sum = s,
            // guard the empty payload: 0/0 would be NaN here but NULL in
            // the oracle's list_sum path — pin both to 0.0
            frame_mean = if (n == 0) 0.0 else s.toDouble / n)
        }
      }
    }.toDF()
  }

  val mediaFeaturesSql: String =
    s"""WITH $mediaSql,
       |f AS (
       |  SELECT doc_id, format, width, n_bytes,
       |    CAST(('0x' || substring(md5(text), 1, 15)) AS BIGINT) AS content_hash,
       |    (n_bytes + ${FrameBytes - 1}) // $FrameBytes AS n_frames,
       |    list_transform(
       |      list_filter(generate_series(1, n_bytes),
       |                  i -> ((i - 1) // $FrameBytes) % $FrameStride = 0),
       |      i -> ord(text[i])) AS sampled
       |  FROM media)
       |SELECT doc_id, format, width, CAST(n_bytes AS INT) AS n_bytes,
       |  content_hash, CAST(n_frames AS INT) AS n_frames,
       |  CAST(len(sampled) AS INT) AS n_sampled,
       |  CAST(COALESCE(list_sum(sampled), 0) AS BIGINT) AS sampled_byte_sum,
       |  CASE WHEN len(sampled) = 0 THEN 0.0
       |       ELSE CAST(list_sum(sampled) AS DOUBLE) / len(sampled)
       |  END AS frame_mean
       |FROM f""".stripMargin

  /** Resized media object (stub resize: byte-stride subsampling). */
  case class MediaResized(doc_id: Long, format: String, width: Int,
                          target_width: Int, n_bytes: Int, out_bytes: Int,
                          out_hash: Long, out_byte_sum: Long)

  /** Resize target (the stub's "output width"). */
  private val TargetWidth = 16

  /** STUB resize: keep every (width/TargetWidth)-th payload byte — the
    * stand-in for an image downscale / audio resample kernel. Like
    * [[decodeFrames]], the codec body is fake but deterministic; the
    * Spark-side shape (typed Dataset in, per-partition batched imperative
    * kernel, metadata recomputed alongside the payload) is the real
    * contract a JNI/FFI resizer plugs into. */
  private def resizeBytes(payload: Array[Byte], width: Int): Array[Byte] = {
    val stride = math.max(1, width / TargetWidth)
    val out = new Array[Byte]((payload.length + stride - 1) / stride)
    var i = 0
    while (i < out.length) { out(i) = payload(i * stride); i += 1 }
    out
  }

  /** Resize stage: one typed map over the media table, no shuffle; emits
    * the resized object's metadata + exact content checksums so the
    * oracle verifies every output byte. */
  def mediaResize(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    mediaTable(spark, dir).mapPartitions { it =>
      it.map { r =>
        val out = resizeBytes(r.payload, r.width)
        MediaResized(r.doc_id, r.format, r.width, TargetWidth,
          n_bytes = r.payload.length, out_bytes = out.length,
          out_hash = md5LongOf(out),
          out_byte_sum = out.iterator.map(_ & 0xffL).sum)
      }
    }.toDF()
  }

  val mediaResizeSql: String =
    s"""WITH $mediaSql,
       |o AS (
       |  SELECT doc_id, format, width, n_bytes,
       |         list_transform(
       |           list_filter(generate_series(1, n_bytes),
       |                       i -> (i - 1) % greatest(1, width // $TargetWidth) = 0),
       |           i -> text[i]) AS kept
       |  FROM media)
       |SELECT doc_id, format, width,
       |  CAST($TargetWidth AS INT) AS target_width,
       |  CAST(n_bytes AS INT) AS n_bytes,
       |  CAST(len(kept) AS INT) AS out_bytes,
       |  CAST(('0x' || substring(md5(COALESCE(list_aggregate(kept, 'string_agg', ''), '')), 1, 15)) AS BIGINT) AS out_hash,
       |  CAST(COALESCE(list_sum(list_transform(kept, c -> ord(c))), 0) AS BIGINT) AS out_byte_sum
       |FROM o""".stripMargin

  /** Frame sampling as a UDTF-shaped flatMap: one output row per sampled
    * frame. This is the explode side of the decode — at 100 TB it fans out
    * inside the scan stage with no shuffle. */
  def mediaFrames(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    mediaTable(spark, dir).flatMap { r =>
      decodeFrames(r.payload).map { case (idx, frame) =>
        MediaFrame(r.doc_id, idx, frame.length,
                   frame.iterator.map(_ & 0xff).map(_.toLong).sum)
      }
    }.toDF()
  }

  val mediaFramesSql: String =
    s"""WITH $mediaSql,
       |fr AS (
       |  SELECT doc_id, n_bytes, text,
       |    unnest(list_filter(
       |      generate_series(0, (n_bytes + ${FrameBytes - 1}) // $FrameBytes - 1),
       |      f -> f % $FrameStride = 0)) AS frame_idx
       |  FROM media)
       |SELECT doc_id, CAST(frame_idx AS INT) AS frame_idx,
       |  CAST(least($FrameBytes, n_bytes - frame_idx * $FrameBytes) AS INT) AS frame_len,
       |  CAST(list_sum(list_transform(
       |    generate_series(frame_idx * $FrameBytes + 1,
       |                    least(frame_idx * $FrameBytes + $FrameBytes, n_bytes)),
       |    i -> ord(text[i]))) AS BIGINT) AS frame_sum
       |FROM fr""".stripMargin

  /**
   * Content-addressed media dedup [EXT]: group identical payloads by
   * their md5-derived content hash, blocked by format (an image and an
   * audio clip with equal bytes are still different assets). This is the
   * storage-dedup pass every multimodal corpus runs before any decode:
   * at 100 TB the shuffle carries (hash, format, doc_id) — never the
   * payload bytes — and the groups drive both dedup and CAS layout.
   * The payload here is the document's UTF-8 bytes (see [[mediaTable]]),
   * so the oracle reproduces the hash from `text` exactly.
   */
  def mediaDedup(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    mediaTable(spark, dir).toDF()
      .select(col("doc_id"), col("format"),
              Tables.md5Long(col("payload")).as("content_hash"))
      .groupBy(col("format"), col("content_hash"))
      .agg(min(col("doc_id")).as("rep_doc_id"),
           count(lit(1)).as("n_copies"))
  }

  val mediaDedupSql: String =
    s"""WITH $mediaSql
       |SELECT format,
       |  CAST(('0x' || substring(md5(text), 1, 15)) AS BIGINT) AS content_hash,
       |  MIN(doc_id) AS rep_doc_id, COUNT(*) AS n_copies
       |FROM media GROUP BY 1, 2""".stripMargin

  /**
   * Frame-level dedup [EXT]: duplicated frames ACROSS assets — the
   * finer-grained sibling of [[mediaDedup]] (whole-payload dedup misses
   * a shared intro/outro segment inside otherwise-distinct videos).
   * Every sampled frame hashes to a 60-bit content id; hashes with more
   * than one occurrence come back with their occurrence/asset counts
   * and a representative (the CAS dedup decision per frame). At 100 TB
   * the shuffle carries (hash, doc_id) — 16 bytes per sampled frame,
   * never frame bytes — and the aggregate output is only the
   * duplicated tail. The codec is the same documented stub; the
   * dataflow (decode → per-frame hash → hash-group) is the real one.
   */
  def mediaFrameDedup(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    mediaTable(spark, dir).flatMap { r =>
      decodeFrames(r.payload).map { case (idx, frame) =>
        (r.doc_id, idx, md5LongOf(frame))
      }
    }.toDF("doc_id", "frame_idx", "frame_hash")
      .groupBy(col("frame_hash"))
      .agg(count(lit(1)).as("n_frames"),
           countDistinct(col("doc_id")).as("n_docs"),
           min(col("doc_id")).as("rep_doc_id"))
      .filter(col("n_frames") > 1)
  }

  val mediaFrameDedupSql: String =
    s"""WITH $mediaSql,
       |fr AS (
       |  SELECT doc_id, n_bytes, text,
       |    unnest(list_filter(
       |      generate_series(0, (n_bytes + ${FrameBytes - 1}) // $FrameBytes - 1),
       |      f -> f % $FrameStride = 0)) AS frame_idx
       |  FROM media),
       |h AS (
       |  SELECT doc_id, frame_idx,
       |    CAST(('0x' || substring(md5(
       |      text[frame_idx * $FrameBytes + 1 :
       |           least(frame_idx * $FrameBytes + $FrameBytes, n_bytes)]), 1, 15)) AS BIGINT)
       |      AS frame_hash
       |  FROM fr)
       |SELECT frame_hash, COUNT(*) AS n_frames,
       |       COUNT(DISTINCT doc_id) AS n_docs, MIN(doc_id) AS rep_doc_id
       |FROM h GROUP BY 1 HAVING COUNT(*) > 1""".stripMargin

  // ------------------------------------------------- perceptual hashing

  /** Hamming radius for perceptual near-duplicate frames, and the bucket
    * occupancy cap guarding the band self-join. */
  private val PhashHamMax = 1
  private val PhashMaxBucket = 256L

  /** Average hash (aHash) of one decoded frame: bit i set iff byte i is
    * above the frame mean — the integer compare byte·n > sum avoids any
    * division. A real pipeline computes this on decoded pixels; the stub
    * codec's bytes stand in with the identical dataflow. */
  private def aHash(frame: Array[Byte]): Long = {
    val n = frame.length.toLong
    var sum = 0L
    var i = 0
    while (i < frame.length) { sum += (frame(i) & 0xff); i += 1 }
    var h = 0L
    i = 0
    while (i < frame.length) {
      if ((frame(i) & 0xff).toLong * n > sum) h |= 1L << i
      i += 1
    }
    h
  }

  /**
   * Perceptual near-duplicate frames ACROSS assets [EXT]: aHash each
   * sampled frame (bit per byte vs the frame mean — the lossy
   * perceptual fingerprint; [[mediaFrameDedup]]'s md5 only catches
   * byte-exact copies), then find cross-document frame pairs within
   * Hamming ≤ [[PhashHamMax]] and roll them up per document pair —
   * re-encoded/slightly-corrupted shared media that exact hashing
   * structurally misses.
   *
   * Completeness by pigeonhole: candidates block on the hash's two
   * 16-bit halves; a pair differing in ≤ 1 bit is identical in at least
   * one half, so NO qualifying pair escapes the blocking — the same
   * band argument as [[Dedup]]'s SimHash stage, with the same
   * [[PhashMaxBucket]] occupancy cap closing the degenerate-bucket
   * quadratic edge (inert here). Only (hash, ids) cross the shuffle —
   * payload bytes never leave the decode stage.
   */
  def mediaPhash(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val ph = mediaTable(spark, dir).flatMap { r =>
      decodeFrames(r.payload).map { case (idx, frame) => (r.doc_id, idx, aHash(frame)) }
    }.toDF("doc_id", "frame_idx", "phash")
    val banded = ph.select(col("doc_id"), col("frame_idx"), col("phash"),
        explode(array(
          struct(lit(0).as("band"), expr("phash div 65536").as("bv")),
          struct(lit(1).as("band"), (col("phash") % 65536L).as("bv")))).as("bk"))
      .select(col("doc_id"), col("frame_idx"), col("phash"),
              col("bk.band").as("band"), col("bk.bv").as("bv"))
    val capped = banded.join(
      banded.groupBy(col("band"), col("bv")).agg(count(lit(1)).as("bn")),
      Seq("band", "bv")).filter(col("bn") <= PhashMaxBucket)
    val a = capped.select(col("band"), col("bv"), col("doc_id").as("doc_a"),
                          col("frame_idx").as("fi_a"), col("phash").as("ph_a"))
    val b = capped.select(col("band"), col("bv"), col("doc_id").as("doc_b"),
                          col("frame_idx").as("fi_b"), col("phash").as("ph_b"))
    val pairs = a.join(b, Seq("band", "bv"))
      .filter(col("doc_a") < col("doc_b"))
      .withColumn("ham", expr("bit_count(ph_a ^ ph_b)"))
      .filter(col("ham") <= PhashHamMax)
      .select(col("doc_a"), col("doc_b"), col("fi_a"), col("fi_b"), col("ham"))
      .distinct() // both halves may emit the same pair
    pairs.groupBy(col("doc_a"), col("doc_b"))
      .agg(count(lit(1)).as("n_near_frames"),
           sum(when(col("ham") === 0, 1L).otherwise(0L)).as("n_exact"),
           min(col("ham")).as("min_hamming"))
  }

  val mediaPhashSql: String =
    s"""WITH $mediaSql,
       |fr AS (
       |  SELECT doc_id, n_bytes, text,
       |    unnest(list_filter(
       |      generate_series(0, (n_bytes + ${FrameBytes - 1}) // $FrameBytes - 1),
       |      f -> f % $FrameStride = 0)) AS frame_idx
       |  FROM media),
       |fs AS (
       |  SELECT doc_id, frame_idx,
       |    text[frame_idx * $FrameBytes + 1 :
       |         least(frame_idx * $FrameBytes + $FrameBytes, n_bytes)] AS frame
       |  FROM fr),
       |fm AS (
       |  SELECT doc_id, frame_idx, frame, CAST(length(frame) AS BIGINT) AS flen,
       |    CAST(list_sum(list_transform(range(1, length(frame) + 1),
       |      i -> CAST(ord(frame[i:i]) AS BIGINT))) AS BIGINT) AS fsum
       |  FROM fs),
       |h AS (
       |  SELECT doc_id, frame_idx,
       |    CAST(coalesce(list_sum(list_transform(range(1, CAST(flen AS INT) + 1),
       |      i -> CASE WHEN CAST(ord(frame[i:i]) AS BIGINT) * flen > fsum
       |                THEN (1::BIGINT << (i - 1)) ELSE 0::BIGINT END)), 0) AS BIGINT) AS phash
       |  FROM fm),
       |banded AS (
       |  SELECT doc_id, frame_idx, phash, 0 AS band, phash // 65536 AS bv FROM h
       |  UNION ALL
       |  SELECT doc_id, frame_idx, phash, 1 AS band, phash % 65536 AS bv FROM h),
       |capped AS (
       |  SELECT banded.* FROM banded
       |  JOIN (SELECT band, bv, COUNT(*) AS bn FROM banded GROUP BY 1, 2) s
       |    USING (band, bv)
       |  WHERE s.bn <= $PhashMaxBucket),
       |pairs AS (
       |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
       |         a.frame_idx AS fi_a, b.frame_idx AS fi_b,
       |         bit_count(xor(a.phash, b.phash)) AS ham
       |  FROM capped a JOIN capped b
       |    ON a.band = b.band AND a.bv = b.bv AND a.doc_id < b.doc_id
       |  WHERE bit_count(xor(a.phash, b.phash)) <= $PhashHamMax)
       |SELECT doc_a, doc_b,
       |  CAST(COUNT(*) AS BIGINT) AS n_near_frames,
       |  CAST(SUM(CASE WHEN ham = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_exact,
       |  CAST(MIN(ham) AS INT) AS min_hamming
       |FROM pairs GROUP BY 1, 2""".stripMargin
}
