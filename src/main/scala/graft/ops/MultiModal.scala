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

  // --------------------------------------- perceptual-hash dedup
  /** Bucket cap for the pHash band index — same rationale as
    * `DedupOps.MaxBandBucket`: a degenerate band value shared by k
    * payloads would emit C(k,2) in-row pairs; capping the posting
    * list bounds the blow-up and is mirrored in the oracle. */
  private val MaxPhashBucket = 100

  /** Hamming radius (of 64 bits) under which two payloads count as
    * perceptual near-duplicates. */
  private val PhashMaxHamming = 6

  /** 16-bit lane `b` (0–3) of the 64-bit difference-hash over the
    * payload byte stream, Spark dialect: 65 evenly-spaced sample
    * bytes s₀…s₆₄ (position 1 + (k·(L−1)) div 64 — the 1-D resample
    * every dHash starts with), bit j of lane b = [s₍₁₆b₊ⱼ₎ > s₍₁₆b₊ⱼ₊₁₎].
    * Gradient bits survive global brightness/offset changes in real
    * images; on the byte-proxy corpus they survive local edits, which
    * is what the planted perturbation exercises. Expects columns
    * `text` (payload byte proxy, ASCII) and `L` (its length, ≥ 2). */
  private[graft] def phashLaneExpr(b: Int): String =
    s"""aggregate(sequence(0, 15), CAST(0 AS BIGINT), (a, j) ->
          a + IF(ascii(substring(text,
                   CAST(1 + ((${16 * b} + j) * (L - 1)) div 64 AS INT), 1))
                 > ascii(substring(text,
                   CAST(1 + ((${16 * b} + j + 1) * (L - 1)) div 64 AS INT), 1)),
               shiftleft(CAST(1 AS BIGINT), j), CAST(0 AS BIGINT)))"""

  /** DuckDB twin of [[phashLaneExpr]]. */
  private def phashLaneDuck(b: Int): String =
    s"""list_reduce(list_prepend(CAST(0 AS BIGINT),
          list_transform(generate_series(0, 15), j ->
            CASE WHEN unicode(text[1 + ((${16 * b} + j) * (L - 1)) // 64])
                    > unicode(text[1 + ((${16 * b} + j + 1) * (L - 1)) // 64])
                 THEN (CAST(1 AS BIGINT) << j)
                 ELSE CAST(0 AS BIGINT) END)),
          (a, x) -> a + x)"""

  /** Perceptual-hash near-duplicate pairs over the media payload lane:
    * each payload gets a 64-bit 1-D difference hash (dHash — the
    * cheap, codec-agnostic perceptual fingerprint image pipelines
    * dedup on), candidates come from 4×16-bit Hamming banding (hashes
    * within Hamming distance 3 agree exactly on ≥1 of 4 lanes by
    * pigeonhole; distances 4–6 are caught with the usual LSH
    * probability — the q59/q60 SimHash machinery applied to the media
    * lane), and candidates verify by exact bit_count XOR
    * Hamming ≤ [[PhashMaxHamming]]. Text bytes stand in for media
    * bytes per this module's stub convention; a real image pipeline
    * swaps the resample source (decoded luma rows instead of payload
    * bytes) and keeps every stage after the hash. The byte proxy is
    * ASCII-projected (q157's regexp_replace convention) before
    * sampling: Spark's `ascii` reads UTF-16 units where DuckDB's
    * `unicode` reads codepoints, so a non-BMP character at a sample
    * position would otherwise diverge between the engines — the
    * projection makes the contract [[phashLaneExpr]] documents hold
    * by construction rather than by corpus luck.
    *
    * Non-vacuous by construction (verified at all three SFs):
    * doc_id ≡ 0 (mod 9) plants a first-byte-perturbed replay at
    * +10·2⁴⁰. The edit rewrites the prefix of samples that resample
    * byte 1 (just s₀ when L ≥ 66; a run of equal samples when
    * shorter) — gradient bits inside an equal-valued prefix cannot
    * flip, so exactly ≤ 1 bit (the prefix-boundary bit, lane
    * ⌊bit/16⌋ — lane 0 for L ≥ 66) differs and the other three lanes
    * collide exactly. The guarantee holds while those shared lanes'
    * buckets stay under [[MaxPhashBucket]] — true at the tested SFs;
    * at corpus scale an over-cap lane drops its pairs (the standard
    * LSH recall trade, mirrored in the oracle and surfaced online by
    * the streaming twin's saturation markers).
    *
    * 100 TB design: payload bytes never shuffle — the hash collapses
    * each payload to four 16-bit lanes in-row at the scan; the band
    * index shuffles (band, key, doc_id) rows only, posting lists are
    * capped at [[MaxPhashBucket]] (mirrored in the oracle), pairs
    * generate in-row from sorted lists, and verification joins the
    * 4-lane hash table (5 longs/row) by id — never the payloads. */
  val q254PhashDedup: Q = (s, d) => {
    import s.implicits._
    val base = Tables.documents(s, d).select($"doc_id", $"text")
    val replay = base.filter($"doc_id" % 9 === 0)
      .select(($"doc_id" + lit(10L << 40)).as("doc_id"),
        concat(lit("Q"), expr("substring(text, 2)")).as("text"))
    val hashes = base.unionByName(replay)
      .withColumn("text", regexp_replace($"text", "[^\\x00-\\x7F]", ""))
      .filter(length($"text") >= 2)
      .withColumn("L", length($"text").cast("long"))
      .withColumn("b0", expr(phashLaneExpr(0)))
      .withColumn("b1", expr(phashLaneExpr(1)))
      .withColumn("b2", expr(phashLaneExpr(2)))
      .withColumn("b3", expr(phashLaneExpr(3)))
      .select($"doc_id", $"b0", $"b1", $"b2", $"b3")
      .localCheckpoint(eager = false) // feeds the band index AND both verify joins
    val cand = hashes
      .select($"doc_id",
        posexplode(array($"b0", $"b1", $"b2", $"b3"))
          .as(Seq("band", "key")))
      .groupBy($"band", $"key")
      .agg(sort_array(collect_list($"doc_id")).as("ds"))
      .filter(size($"ds") >= 2 && size($"ds") <= MaxPhashBucket)
      .transform(DedupOps.pairExplode(_, "ds"))
      .select($"__pa".as("doc_a"), $"__pb".as("doc_b"))
      .distinct() // a pair may collide on several bands
    cand
      .join(hashes.select($"doc_id".as("doc_a"), $"b0".as("a0"),
        $"b1".as("a1"), $"b2".as("a2"), $"b3".as("a3")), Seq("doc_a"))
      .join(hashes.select($"doc_id".as("doc_b"), $"b0".as("c0"),
        $"b1".as("c1"), $"b2".as("c2"), $"b3".as("c3")), Seq("doc_b"))
      .withColumn("hamming", expr(
        """bit_count(a0 ^ c0) + bit_count(a1 ^ c1)
           + bit_count(a2 ^ c2) + bit_count(a3 ^ c3)""").cast("long"))
      .filter($"hamming" <= PhashMaxHamming)
      .select($"doc_a", $"doc_b", $"hamming")
  }
  val o254: String = s"""
    WITH payloads AS (
      SELECT doc_id, text FROM documents
      UNION ALL
      SELECT doc_id + ${10L << 40} AS doc_id,
        'Q' || substring(text, 2) AS text
      FROM documents WHERE doc_id % 9 = 0),
    hx AS (
      SELECT doc_id,
        ${phashLaneDuck(0)} AS b0, ${phashLaneDuck(1)} AS b1,
        ${phashLaneDuck(2)} AS b2, ${phashLaneDuck(3)} AS b3
      FROM (SELECT doc_id, text, CAST(length(text) AS BIGINT) AS L
            FROM (SELECT doc_id,
                    regexp_replace(text, '[^\\x00-\\x7F]', '', 'g') AS text
                  FROM payloads)
            WHERE length(text) >= 2)),
    lanes AS (
      SELECT doc_id, 0 AS band, b0 AS key FROM hx
      UNION ALL SELECT doc_id, 1, b1 FROM hx
      UNION ALL SELECT doc_id, 2, b2 FROM hx
      UNION ALL SELECT doc_id, 3, b3 FROM hx),
    grp AS (
      SELECT band, key FROM lanes GROUP BY band, key
      HAVING COUNT(*) BETWEEN 2 AND $MaxPhashBucket),
    cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM lanes a
      JOIN lanes b ON a.band = b.band AND a.key = b.key
                  AND a.doc_id < b.doc_id
      JOIN grp g ON g.band = a.band AND g.key = a.key)
    SELECT c.doc_a, c.doc_b,
      CAST(bit_count(xor(ha.b0, hb.b0)) + bit_count(xor(ha.b1, hb.b1))
         + bit_count(xor(ha.b2, hb.b2)) + bit_count(xor(ha.b3, hb.b3))
        AS BIGINT) AS hamming
    FROM cand c
    JOIN hx ha ON ha.doc_id = c.doc_a
    JOIN hx hb ON hb.doc_id = c.doc_b
    WHERE bit_count(xor(ha.b0, hb.b0)) + bit_count(xor(ha.b1, hb.b1))
        + bit_count(xor(ha.b2, hb.b2)) + bit_count(xor(ha.b3, hb.b3))
        <= $PhashMaxHamming"""

  val queries: Map[String, Q] = Map(
    "q75_media_features" -> q75MediaFeatures,
    "q76_media_batch_stats" -> q76MediaBatchStats,
    "q111_frame_sample" -> q111FrameSample,
    "q254_phash_dedup" -> q254PhashDedup)

  val oracles: Map[String, String] = Map(
    "q75_media_features" -> o75,
    "q76_media_batch_stats" -> o76,
    "q111_frame_sample" -> o111,
    "q254_phash_dedup" -> o254)
}
