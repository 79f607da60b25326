package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** A raw media payload: opaque bytes + typed metadata (SURVEY §2.K
  * `multimodal_cols`). In a real pipeline `data` is an image/audio/video
  * blob column read from parquet. */
case class MediaBlob(doc_id: Long, data: Array[Byte])

/** Decoded media features (schema of the decode stage's output batches). */
case class MediaMeta(doc_id: Long, n_bytes: Int, width: Int, height: Int,
                     channels: Int, checksum: Long)

/** SURVEY.md §2.K — multimodal columns: opaque binary payloads with typed
  * metadata carried through relational ops, plus a decode/feature-extract
  * stage as a partition-wise typed transform.
  *
  * The decode itself is a STUB (media codecs are not in this container):
  * [[Multimodal.decodeStub]] is a deterministic fake with the real
  * Spark-side plumbing — typed Dataset, mapPartitions batch iteration,
  * schema, partitioning — all genuine and tested.
  */
object Multimodal extends graft.QueryModule {

  private val labelDim = Seq(
    (0, "photo"), (1, "chart"), (2, "scan"), (3, "render"), (4, "frame"),
    (5, "crop"), (6, "thumb"), (7, "tile"), (8, "mask"), (9, "page"))

  /** Arrays (list<float>) surviving filter → broadcast join → projection —
    * the multimodal-metadata path (oracle via DuckDB list functions). */
  private def mmMeta(s: SparkSession, d: String): DataFrame = {
    graft.functions.VectorFunctions.register(s)
    import s.implicits._
    val labels = broadcast(labelDim.toDF("label_id", "label_name"))
    Tables.embeddings(s, d)
      .filter(col("label").isin(1, 2, 3))
      .join(labels, col("label") === col("label_id"))
      .select(col("vec_id"), col("label_name"),
        size(col("embedding")).as("n_dims"),
        array_join(
          transform(slice(col("embedding"), 1, 4),
            x => floor(x.cast("double") * 1e6).cast("long").cast("string")),
          ",").as("head"),
        sqrt(SimSearch.dot(col("embedding"), col("embedding"))).as("l2_norm"))
      .orderBy("vec_id")
  }

  /** Opaque binary column ops: byte length, content hash, base64 framing
    * (`BinaryType` end-to-end; text bytes stand in for media bytes). */
  private def mmBinary(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d).select(
      col("doc_id"),
      octet_length(col("text").cast("binary")).as("n_bytes"),
      sha2(col("text").cast("binary"), 256).as("sha"),
      base64(substring(col("text"), 1, 12).cast("binary")).as("head_b64"))
      .orderBy("doc_id")

  /** STUB media decoder — deterministic fake standing in for an image/
    * audio codec (not available in this container). The per-partition
    * batch shape is what a Pandas-UDF / JNI decoder would use. */
  def decodeStub(blobs: Iterator[MediaBlob]): Iterator[MediaMeta] =
    blobs.map { b =>
      val n = b.data.length
      // ??? real codec goes here; fake dims/checksum are deterministic
      MediaMeta(b.doc_id, n, n % 640 + 1, n % 480 + 1, 3,
        b.data.foldLeft(0L)((acc, byte) => acc + (byte & 0xff)))
    }

  /** Decode/feature-extract as a partition-wise typed transform over a
    * binary column (rows-only check: stub output, no SQL mirror). */
  private def mmDecode(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, d)
      .select(col("doc_id"), col("text").cast("binary").as("data"))
      .as[MediaBlob]
      .mapPartitions(decodeStub)
      .toDF()
      .orderBy("doc_id")
  }

  /** STUB frame sampler — stands in for a video frame extractor: slices
    * the payload into fixed 64-byte "frames", keeps every 4th, emits one
    * row per sampled frame with a per-frame checksum. The explode
    * (one-to-many generator) and per-frame schema are the real plumbing. */
  def frameSampleStub(blobs: Iterator[MediaBlob]): Iterator[(Long, Int, Int, Long)] =
    blobs.flatMap { b =>
      // ??? real demuxer goes here; fixed-size slicing is the fake
      b.data.grouped(64).zipWithIndex.collect {
        case (frame, idx) if idx % 4 == 0 =>
          (b.doc_id, idx, frame.length,
            frame.foldLeft(0L)((acc, byte) => acc + (byte & 0xff)))
      }
    }

  /** Frame sampling over binary payloads (rows-only: stub-defined). */
  private def mmFrames(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, d)
      .select(col("doc_id"), col("text").cast("binary").as("data"))
      .as[MediaBlob]
      .mapPartitions(frameSampleStub)
      .toDF("doc_id", "frame_idx", "n_bytes", "checksum")
      .orderBy("doc_id", "frame_idx")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "multimodal_cols" -> mmMeta,
    "mm_binary" -> mmBinary,
    "mm_decode" -> mmDecode,
    "mm_frames" -> mmFrames)

  val oracles: Map[String, String] = Map(
    "multimodal_cols" ->
      """WITH labels(label_id, label_name) AS (
        |  VALUES (1, 'chart'), (2, 'scan'), (3, 'render'))
        |SELECT vec_id, label_name,
        |       CAST(len(embedding) AS INTEGER) AS n_dims,
        |       array_to_string(list_transform(embedding[1:4],
        |         x -> CAST(CAST(floor(CAST(x AS DOUBLE) * 1000000) AS BIGINT) AS VARCHAR)), ',') AS head,
        |       sqrt((SELECT sum(CAST(u.x AS DOUBLE) * CAST(u.y AS DOUBLE))
        |             FROM (SELECT unnest(embedding) AS x, unnest(embedding) AS y) u)) AS l2_norm
        |FROM embeddings JOIN labels ON label = label_id
        |ORDER BY vec_id""".stripMargin,
    "mm_binary" ->
      """SELECT doc_id,
        |       CAST(octet_length(CAST(text AS BLOB)) AS INTEGER) AS n_bytes,
        |       sha256(text) AS sha,
        |       to_base64(CAST(substring(text, 1, 12) AS BLOB)) AS head_b64
        |FROM documents ORDER BY doc_id""".stripMargin,
    // The decode/frame stubs are deterministic byte arithmetic, and the
    // stand-in payloads are pure-ASCII text bytes — so ord(char) == byte
    // and DuckDB can mirror the "codec" exactly. PRECONDITION (holds for
    // the driver's documents generator; re-verify if it changes): no
    // non-ASCII chars (ord==byte breaks on multibyte) — empty payloads
    // are handled below via coalesce (DuckDB list_sum([]) is NULL, the
    // stub's fold is 0).
    "mm_decode" ->
      """SELECT doc_id,
        |       CAST(length(text) AS INTEGER) AS n_bytes,
        |       CAST(length(text) % 640 + 1 AS INTEGER) AS width,
        |       CAST(length(text) % 480 + 1 AS INTEGER) AS height,
        |       3 AS channels,
        |       CAST(coalesce(list_sum(list_transform(range(1, length(text) + 1),
        |            i -> ord(substr(text, i, 1)))), 0) AS BIGINT) AS checksum
        |FROM documents ORDER BY doc_id""".stripMargin,
    "mm_frames" ->
      """SELECT doc_id,
        |       CAST(f AS INTEGER) AS frame_idx,
        |       CAST(least(64, length(text) - f * 64) AS INTEGER) AS n_bytes,
        |       CAST(coalesce(list_sum(list_transform(
        |              range(f * 64 + 1, f * 64 + least(64, length(text) - f * 64) + 1),
        |              p -> ord(substr(text, p, 1)))), 0) AS BIGINT) AS checksum
        |FROM documents,
        |     unnest(range(0, CAST(ceil(length(text) / 64.0) AS BIGINT), 4)) t(f)
        |ORDER BY doc_id, frame_idx""".stripMargin)
}
