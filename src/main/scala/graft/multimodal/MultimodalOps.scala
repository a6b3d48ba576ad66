package graft.multimodal

import graft.Tables
import graft.operators.LlmQueries.{h60Duck, h60Spark}
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column pipeline (north-star extension): image/audio/video as
  * opaque `binary` payloads with typed metadata, plus decode /
  * feature-extract / resize / frame-sample operators.
  *
  * Two execution paths, by design:
  *
  *  1. '''Batched kernel path''' ([[decodeFeatures]]): real media codecs
  *     (JPEG, PCM, H.264) and feature models consume BATCHES of byte
  *     buffers, often on accelerators — the Scala analog of PySpark's
  *     `mapInPandas`. Rows stream through `mapPartitions` in fixed
  *     [[BatchSize]] groups, one kernel call per group. The kernel body is
  *     a clearly-marked STUB ([[decodeKernelStub]]) because this
  *     environment ships no media libraries; its SIGNATURE (batch in, one
  *     feature vector per payload out) and the surrounding plumbing —
  *     schema, null/empty handling, batch shape, partition parallelism —
  *     are the real, tested contract.
  *
  *  2. '''Expression path''' ([[queries]]): the same deterministic fake
  *     features as codegen'd SQL expressions, giving the driver's DuckDB
  *     oracle a bit-exact twin. The ScalaTest spec asserts path parity, so
  *     the oracle transitively checks the batched plumbing too.
  *
  * Scale: payload bytes never shuffle — both paths are map-only over the
  * scan (plus [[Tables.spread]] for the single-row-group test files);
  * features (8 doubles) are ~10⁵× smaller than real payloads, so the
  * derived table is the thing downstream ops (ANN, dedup) shuffle.
  */
object MultimodalOps {

  /** Kernel batch shape — one accelerator call per this many payloads. */
  val BatchSize = 64
  val FeatureDim = 8

  final case class MediaRow(doc_id: Long, payload: Array[Byte], kind: String)
  final case class MediaFeatures(doc_id: Long, kind: String, n_bytes: Long,
                                 features: Array[Double])

  /** STUB — deterministic fake decode kernel (no media libs in this
    * container). A production deployment replaces ONLY this body with the
    * real library call (e.g. decode + model forward pass on the batch);
    * everything around it stays. Fake feature j of a payload =
    * `(h60(payload ⧺ "#j") mod 1000) / 1000` — reproducible in SQL, which
    * is what lets the oracle check the plumbing end-to-end. */
  def decodeKernelStub(batch: Seq[Array[Byte]]): Seq[Array[Double]] =
    batch.map { payload =>
      Array.tabulate(FeatureDim) { j =>
        (h60(payload ++ s"#$j".getBytes("UTF-8")) % 1000L) / 1000.0
      }
    }

  /** First 15 hex chars of md5 as a long — the Scala twin of
    * [[graft.operators.LlmQueries.h60Spark]]. */
  private def h60(bytes: Array[Byte]): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(bytes).take(8).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.substring(0, 15), 16)
  }

  /** The media table: documents as opaque binary payloads + typed metadata
    * (`kind` from the source column; real ingests carry codec/dims/rate). */
  def mediaTable(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d).select(
      col("doc_id"),
      col("text").cast("binary").as("payload"),
      col("source").as("kind"))

  /** One partition's worth of batched decoding: rows stream through the
    * kernel in [[BatchSize]] groups; null/empty payloads short-circuit to
    * zero vectors without reaching the kernel. Factored out of
    * [[decodeFeatures]] so the plumbing is unit-testable off-cluster. */
  def decodeBatches(it: Iterator[MediaRow]): Iterator[MediaFeatures] =
    it.grouped(BatchSize).flatMap { group =>
      val (empty, nonEmpty) = group.partition(r => r.payload == null || r.payload.isEmpty)
      val feats = decodeKernelStub(nonEmpty.map(_.payload))
      nonEmpty.zip(feats).map { case (r, f) =>
        MediaFeatures(r.doc_id, r.kind, r.payload.length.toLong, f)
      } ++ empty.map(r => MediaFeatures(r.doc_id, r.kind, 0L,
        Array.fill(FeatureDim)(0.0)))
    }

  /** Batched decode (kernel path): partition-parallel `mapPartitions`
    * over [[decodeBatches]]. */
  def decodeFeatures(s: SparkSession, d: String): Dataset[MediaFeatures] = {
    import s.implicits._
    Tables.spread(s, mediaTable(s, d)).as[MediaRow].mapPartitions(decodeBatches _)
  }

  // ------------------------------------------------------- expression path

  private def fakeFeatureSpark(j: Int): String =
    s"cast(${h60Spark(s"concat(text, '#$j')")} % 1000 / 1000.0 AS double)"
  private def fakeFeatureDuck(j: Int): String =
    s"${h60Duck(s"(text || '#$j')")} % 1000 / 1000.0"

  /** Feature extraction, expression path: one scalar column per feature
    * dimension (scalars, not arrays, for hash-compare stability). */
  private def qMediaFeatures(s: SparkSession, d: String): DataFrame = {
    val feats = (0 until FeatureDim).map(j => s"${fakeFeatureSpark(j)} AS f$j")
    Tables.spread(s, Tables.documents(s, d))
      .selectExpr(Seq("doc_id", "source AS kind",
        "cast(octet_length(cast(text AS binary)) AS bigint) AS n_bytes") ++ feats: _*)
      .orderBy(col("doc_id"))
  }

  /** Frame sampling + resize over a "video" payload: frames are 64-byte
    * payload blocks; sample every 4th frame, fingerprint each sampled
    * frame, and "resize" = truncate each frame to its first 16 bytes
    * before hashing (byte-slicing is exactly what a stride/crop does to a
    * raw buffer — the real kernel swaps in pixel-aware math). */
  private def qMediaFrames(s: SparkSession, d: String): DataFrame =
    Tables.spread(s, Tables.documents(s, d))
      .selectExpr("doc_id", "text",
        "cast(ceil(octet_length(cast(text AS binary)) / 64.0) AS int) AS n_frames")
      .selectExpr("doc_id", "n_frames",
        "cast(size(sequence(1, n_frames, 4)) AS int) AS n_sampled",
        s"${h60Spark("substring(text, 1, 16)")} AS first_frame_fp",
        s"${h60Spark("substring(text, 1 + 64 * ((n_frames - 1) div 2), 16)")} AS mid_frame_fp")
      .orderBy(col("doc_id"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_media_features" -> qMediaFeatures _,
    "q_media_frames" -> qMediaFrames _
  )

  val oracle: Map[String, String] = Map(
    "q_media_features" -> {
      val feats = (0 until FeatureDim).map(j => s"${fakeFeatureDuck(j)} AS f$j")
      s"""SELECT doc_id, source AS kind,
         |       cast(octet_length(text::BLOB) AS bigint) AS n_bytes,
         |       ${feats.mkString(",\n       ")}
         |FROM documents ORDER BY doc_id""".stripMargin
    },
    "q_media_frames" ->
      s"""WITH t AS (
         |  SELECT doc_id, text,
         |         cast(ceil(octet_length(text::BLOB) / 64.0) AS int) AS n_frames
         |  FROM documents)
         |SELECT doc_id, n_frames,
         |       cast(len(range(1, n_frames + 1, 4)) AS int) AS n_sampled,
         |       ${h60Duck("substring(text, 1, 16)")} AS first_frame_fp,
         |       ${h60Duck("substring(text, 1 + 64 * ((n_frames - 1) // 2), 16)")} AS mid_frame_fp
         |FROM t ORDER BY doc_id""".stripMargin
  )
}
