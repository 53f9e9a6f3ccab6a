package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing for the training-data pipeline: media
  * payloads ride as opaque `binary` columns with typed metadata;
  * decode / feature-extraction runs per-partition over iterator
  * batches (the JVM analog of `mapInPandas`), so one decoder init —
  * codec tables, model weights — is amortized across a whole
  * partition, and partitioning controls batch shape.
  *
  * The actual media decode is a STUB (no image/audio codecs in this
  * environment): [[MediaDecoder.decodeStub]] derives deterministic
  * pseudo-features (checksum, fake dimensions) from the bytes alone.
  * Swapping in a real codec changes only that function — schema,
  * partitioning, and batch plumbing stay as tested here.
  */
object MultiModal {
  type Q = (SparkSession, String) => DataFrame

  /** A media row as it would land from ingestion: payload + metadata. */
  final case class MediaRow(doc_id: Long, payload: Array[Byte],
                            media_type: String, declared_len: Long)

  /** Extracted features (one row per media item). */
  final case class MediaFeatures(doc_id: Long, byte_len: Long,
                                 checksum: String, fake_width: Long,
                                 fake_height: Long)

  object MediaDecoder {
    /** STUB decoder — stands in for image/audio decode. Deterministic
      * features from the raw bytes; a real implementation would parse
      * the codec here. One MessageDigest per partition, reused. */
    def decodeStub(rows: Iterator[MediaRow]): Iterator[MediaFeatures] = {
      val md = java.security.MessageDigest.getInstance("MD5")
      rows.map { r =>
        md.reset()
        val hex = md.digest(r.payload).map("%02x".format(_)).mkString
        MediaFeatures(r.doc_id, r.payload.length.toLong, hex,
          r.payload.length.toLong % 640L,
          (r.payload.length.toLong * 7L) % 480L)
      }
    }
  }

  /** Binary payload pipeline: text bytes stand in for media bytes.
    * encode → typed Dataset → per-partition decode → DataFrame.
    * Oracle recomputes the same features from the text in SQL. */
  val q75MediaFeatures: Q = (s, d) => {
    import s.implicits._
    val media = Tables.documents(s, d)
      .select($"doc_id",
        encode($"text", "UTF-8").as("payload"),
        lit("text/plain").as("media_type"),
        length($"text").cast("long").as("declared_len"))
      .as[MediaRow]
    media
      .mapPartitions(MediaDecoder.decodeStub)
      .toDF()
  }
  val o75 = """
    SELECT doc_id, CAST(octet_length(encode(text)) AS BIGINT) AS byte_len,
      md5(text) AS checksum,
      octet_length(encode(text)) % 640 AS fake_width,
      (octet_length(encode(text)) * 7) % 480 AS fake_height
    FROM documents"""

  /** Media batch profile: partition-level batch shape audit — rows and
    * bytes per batch the decoder would see (the knob that sizes GPU /
    * codec batches at 100 TB). */
  val q76MediaBatchStats: Q = (s, d) => {
    import s.implicits._
    Tables.documents(s, d)
      .select($"doc_id", encode($"text", "UTF-8").as("payload"),
        $"source")
      .groupBy($"source")
      .agg(count(lit(1)).as("n_items"),
        sum(length($"payload")).cast("long").as("total_bytes"),
        max(length($"payload")).cast("long").as("max_bytes"))
  }
  val o76 = """
    SELECT source, COUNT(*) AS n_items,
      CAST(SUM(octet_length(encode(text))) AS BIGINT) AS total_bytes,
      CAST(MAX(octet_length(encode(text))) AS BIGINT) AS max_bytes
    FROM documents GROUP BY source"""

  // ------------------------------------------------- frame sampling
  /** One sampled frame of a "video" payload. */
  final case class VideoFrame(doc_id: Long, frame_idx: Long,
                              frame_off: Long, frame_len: Long,
                              frame_md5: String, lead_byte: Long)

  private val FrameStride = 32
  private val FrameLen = 16
  private val MaxFrames = 4

  object FrameSampler {
    /** STUB frame extractor — stands in for video decode + frame
      * sampling: up to `MaxFrames` fixed-stride byte windows per
      * payload, each with deterministic pseudo-features (digest, lead
      * byte). A real implementation seeks keyframes here; the row
      * EXPLOSION SHAPE (1 payload → k frame rows), per-partition
      * digest reuse, and bounded per-frame output are the real
      * contract. */
    def sampleStub(rows: Iterator[MediaRow]): Iterator[VideoFrame] = {
      val md = java.security.MessageDigest.getInstance("MD5")
      rows.flatMap { r =>
        (0 until MaxFrames).iterator
          .map(i => (i.toLong, i * FrameStride))
          .takeWhile(_._2 < r.payload.length)
          .map { case (i, off) =>
            val len = math.min(FrameLen, r.payload.length - off)
            val slice =
              java.util.Arrays.copyOfRange(r.payload, off, off + len)
            md.reset()
            VideoFrame(r.doc_id, i, off.toLong, len.toLong,
              md.digest(slice).map("%02x".format(_)).mkString,
              (r.payload(off) & 0xff).toLong)
          }
      }
    }
  }

  /** Frame-sampling pipeline: payload → per-partition frame extraction
    * → one row per sampled frame. The oracle recomputes the same
    * frames from the text (the corpus is ASCII, so byte offsets equal
    * character offsets — a real video oracle would compare against a
    * reference decoder instead).
    *
    * 100 TB design: frames explode at most `MaxFrames`× and carry
    * `FrameLen`-byte digests, never payload bytes — the downstream
    * (dedup on frame_md5, per-frame embedding) shuffles small rows
    * while payloads stay columnar in the scan. */
  val q111FrameSample: Q = (s, d) => {
    import s.implicits._
    Tables.documents(s, d)
      .select($"doc_id",
        encode($"text", "UTF-8").as("payload"),
        lit("video/fake").as("media_type"),
        length($"text").cast("long").as("declared_len"))
      .as[MediaRow]
      .mapPartitions(FrameSampler.sampleStub)
      .toDF()
  }
  val o111: String = s"""
    SELECT doc_id, CAST(frame_idx AS BIGINT) AS frame_idx,
      CAST(frame_idx * $FrameStride AS BIGINT) AS frame_off,
      CAST(least($FrameLen, length(text) - frame_idx * $FrameStride)
        AS BIGINT) AS frame_len,
      md5(substring(text, frame_idx * $FrameStride + 1, $FrameLen))
        AS frame_md5,
      CAST(unicode(substring(text, frame_idx * $FrameStride + 1, 1))
        AS BIGINT) AS lead_byte
    FROM (SELECT doc_id, text,
            unnest([${(0 until MaxFrames).mkString(", ")}]) AS frame_idx
          FROM documents)
    WHERE frame_idx * $FrameStride < length(text)"""

  val queries: Map[String, Q] = Map(
    "q75_media_features" -> q75MediaFeatures,
    "q76_media_batch_stats" -> q76MediaBatchStats,
    "q111_frame_sample" -> q111FrameSample)

  val oracles: Map[String, String] = Map(
    "q75_media_features" -> o75,
    "q76_media_batch_stats" -> o76,
    "q111_frame_sample" -> o111)
}
