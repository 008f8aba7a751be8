package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Multimodal-column plumbing: image/audio/video payloads are opaque
  * `binary` columns with typed metadata alongside. The harness tables
  * carry no real media, so the payload is the UTF-8 byte stream of
  * `text`, decoded as the same fixed-width frame format
  * [[Multimodal.qBlobFrameSample]] subsamples — the full path (binary
  * schema, metadata extraction, batched per-partition decode) is real,
  * deterministic, and oracle-checked byte-for-byte. A deployment with
  * actual media swaps [[Multimodal.decodeFrames]] for its codec; every
  * surrounding shape (partition-batched iteration, typed feature
  * record, one decoder instance per partition) is what it would use.
  */
object Multimodal {

  /** documents with a synthesized binary payload column. */
  private def blobs(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, dir)
      .select($"doc_id", $"source", encode($"text", "UTF-8").as("blob"))
  }

  // ---------------------------------------------------------------
  /** Typed metadata over a binary column: byte length, sha256 digest,
    * leading-bytes signature ("magic number" slot) — one scan, no
    * shuffle, all deterministic. */
  def qBlobMeta(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    blobs(s, dir)
      .select($"doc_id", $"source",
        length($"blob").as("blob_len"),
        sha2($"blob", 256).as("sha256"),
        lower(hex(substring($"blob", 1, 4))).as("head_hex"))
      .orderBy($"doc_id")
  }

  // head_hex: Spark slices the first 4 BYTES of the blob; DuckDB has no
  // blob substring, so slice the hex string instead (2 hex chars ≡ 1
  // byte) — byte-level parity even for multibyte text.
  val qBlobMetaSql: String =
    """SELECT doc_id, source,
      |  CAST(OCTET_LENGTH(ENCODE(text)) AS INT) AS blob_len,
      |  SHA256(text) AS sha256,
      |  LOWER(SUBSTRING(HEX(ENCODE(text)), 1, 8)) AS head_hex
      |FROM documents ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------
  /** Fixed frame geometry of the fake-video payload (shared by the
    * decoder, the frame sampler, and both oracles). Declared BEFORE
    * the oracle-SQL vals that interpolate them — object vals
    * initialize in declaration order. */
  val FrameBytes = 64
  val FrameStride = 8

  /** Per-blob feature record produced by the frame decoder. */
  case class BlobFeatures(doc_id: Long, n_bytes: Int, n_frames: Int,
    byte_sum: Long, byte_min: Int, byte_max: Int, head_byte: Int)

  /** Deterministic fixed-format decode: the blob is a stream of
    * [[FrameBytes]]-byte frames (the same fake-video layout
    * [[qBlobFrameSample]] subsamples; the tail frame may be short),
    * reduced to exact byte-level sample statistics — the 8-bit
    * "pixel" reduction of a grayscale decode, computed in one pass.
    * Fully oracle-checked: DuckDB re-derives every field from the
    * payload's hex image. A real media deployment swaps this function
    * for its codec (JPEG decode + resize + embedding, PCM unpack, …)
    * without touching the surrounding partition-batched plumbing. */
  def decodeFrames(docId: Long, bytes: Array[Byte]): BlobFeatures = {
    var sum = 0L
    var mn = 256
    var mx = -1
    var i = 0
    while (i < bytes.length) {
      val b = bytes(i) & 0xff
      sum += b
      if (b < mn) mn = b
      if (b > mx) mx = b
      i += 1
    }
    BlobFeatures(docId, bytes.length,
      (bytes.length + FrameBytes - 1) / FrameBytes, sum,
      if (bytes.isEmpty) 0 else mn, if (bytes.isEmpty) 0 else mx,
      if (bytes.isEmpty) 0 else bytes(0) & 0xff)
  }

  /** Batched feature extraction over binary payloads: mapPartitions
    * over (id, blob) batches — the genuine per-partition imperative
    * hot loop a media pipeline needs (one decoder instance per
    * partition, streaming through its batch). */
  def qBlobFeatures(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    blobs(s, dir)
      .select($"doc_id", $"blob").as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // a real pipeline initializes the decoder once per partition here
        it.map { case (id, bytes) => decodeFrames(id, bytes) }
      }
      .toDF()
      .orderBy($"doc_id")
  }

  /** Oracle twin of [[qBlobFeatures]]: bytes are re-derived from the
    * payload's hex image with nibble arithmetic (DuckDB has no blob
    * indexing), then reduced with the same statistics. Empty payloads
    * keep their zero-feature row via the LEFT JOIN. */
  val qBlobFeaturesSql: String =
    s"""WITH b AS (SELECT doc_id, LOWER(HEX(ENCODE(text))) AS h,
      |    OCTET_LENGTH(ENCODE(text)) AS n FROM documents),
      |by AS (SELECT doc_id,
      |    (STRPOS('0123456789abcdef', SUBSTRING(h, 2*i+1, 1)) - 1) * 16 +
      |    (STRPOS('0123456789abcdef', SUBSTRING(h, 2*i+2, 1)) - 1) AS v, i
      |  FROM (SELECT doc_id, h, UNNEST(range(0, n)) AS i FROM b)),
      |agg AS (SELECT doc_id, CAST(SUM(v) AS BIGINT) AS byte_sum,
      |    CAST(MIN(v) AS INT) AS byte_min, CAST(MAX(v) AS INT) AS byte_max,
      |    CAST(MAX(CASE WHEN i = 0 THEN v END) AS INT) AS head_byte
      |  FROM by GROUP BY doc_id)
      |SELECT b.doc_id, CAST(b.n AS INT) AS n_bytes,
      |  CAST((b.n + ${FrameBytes - 1}) // $FrameBytes AS INT) AS n_frames,
      |  COALESCE(agg.byte_sum, 0) AS byte_sum,
      |  COALESCE(agg.byte_min, 0) AS byte_min,
      |  COALESCE(agg.byte_max, 0) AS byte_max,
      |  COALESCE(agg.head_byte, 0) AS head_byte
      |FROM b LEFT JOIN agg ON agg.doc_id = b.doc_id
      |ORDER BY b.doc_id""".stripMargin

  // ---------------------------------------------------------------
  /** Frame sampling over a binary payload: the blob is a stream of
    * fixed [[FrameBytes]]-byte frames (a fake video); every
    * [[FrameStride]]-th frame is sliced out with typed per-frame
    * metadata — the decode-free subsampling step a video pipeline
    * runs BEFORE the expensive codec, expressed declaratively
    * (sequence + explode + byte slicing, all codegen; no UDF). Frame
    * digests are over the frame's hex image so the oracle (DuckDB has
    * no BLOB substring) can hash the identical value. */
  def qBlobFrameSample(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    blobs(s, dir)
      .filter(length($"blob") > 0)
      .withColumn("n_frames",
        expr(s"CAST((length(blob) + ${FrameBytes - 1}) DIV $FrameBytes AS INT)"))
      .withColumn("fi", explode(expr(
        s"sequence(0, n_frames - 1, $FrameStride)")))
      .withColumn("fhex",
        lower(hex(expr(s"substring(blob, fi * $FrameBytes + 1, $FrameBytes)"))))
      .select($"doc_id", $"n_frames", $"fi",
        (length($"fhex") / 2).cast("int").as("frame_len"),
        sha2($"fhex", 256).as("frame_sha"))
      .orderBy($"doc_id", $"fi")
  }

  val qBlobFrameSampleSql: String =
    s"""WITH b AS (SELECT doc_id, LOWER(HEX(ENCODE(text))) AS h,
       |    CAST((OCTET_LENGTH(ENCODE(text)) + ${FrameBytes - 1}) // $FrameBytes AS INT) AS n_frames
       |  FROM documents WHERE OCTET_LENGTH(ENCODE(text)) > 0)
       |SELECT doc_id, n_frames, CAST(fi AS INT) AS fi,
       |  CAST(LENGTH(SUBSTRING(h, fi * ${2 * FrameBytes} + 1, ${2 * FrameBytes})) // 2 AS INT) AS frame_len,
       |  SHA256(SUBSTRING(h, fi * ${2 * FrameBytes} + 1, ${2 * FrameBytes})) AS frame_sha
       |FROM (SELECT doc_id, h, n_frames,
       |        UNNEST(generate_series(0, n_frames - 1, $FrameStride)) AS fi
       |      FROM b)
       |ORDER BY doc_id, fi""".stripMargin

  // ---------------------------------------------------------------
  /** Exact binary-content dedup — the hash step every multimodal
    * pipeline runs before any perceptual matching (identical bytes
    * re-crawled under different ids are the bulk of image dup mass):
    * blobs grouped by sha256, canonical copy = smallest doc_id, each
    * blob annotated with its canonical and the content's copy count.
    *
    * Scale shape: ONE shuffle on the digest (high-cardinality,
    * skew-free by construction — a hash key's population is the
    * content's true copy count); the canonical/count side aggregates
    * to 1 row per digest before the join back, so a viral blob fans
    * out 1:1 (the q_line_dedup join-back discipline). The blob bytes
    * themselves never shuffle — only (doc_id, digest) pairs move. */
  def qBlobDedup(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val hashed = blobs(s, dir)
      .select($"doc_id", sha2($"blob", 256).as("sha256"))
    val canon = hashed.groupBy($"sha256")
      .agg(min($"doc_id").as("canonical_id"), count(lit(1)).as("n_copies"))
    hashed.join(canon, "sha256")
      .select($"doc_id", $"sha256", $"canonical_id", $"n_copies",
        ($"doc_id" =!= $"canonical_id").cast("int").as("is_dup"))
      .orderBy($"doc_id")
  }

  val qBlobDedupSql: String =
    """WITH h AS (SELECT doc_id, SHA256(text) AS sha256 FROM documents),
      |c AS (SELECT sha256, MIN(doc_id) AS canonical_id,
      |    COUNT(*) AS n_copies
      |  FROM h GROUP BY 1)
      |SELECT doc_id, sha256, canonical_id, n_copies,
      |  CAST(doc_id != canonical_id AS INT) AS is_dup
      |FROM h JOIN c USING (sha256) ORDER BY doc_id""".stripMargin

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_blob_meta" -> (qBlobMeta _),
    "q_blob_features" -> (qBlobFeatures _),
    "q_blob_framesample" -> (qBlobFrameSample _),
    "q_blob_dedup" -> (qBlobDedup _))

  val oracles: Map[String, String] = Map(
    "q_blob_meta" -> qBlobMetaSql,
    "q_blob_features" -> qBlobFeaturesSql,
    "q_blob_framesample" -> qBlobFrameSampleSql,
    "q_blob_dedup" -> qBlobDedupSql)
}
