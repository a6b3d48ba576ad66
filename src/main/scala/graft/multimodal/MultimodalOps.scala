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
  *     [[BatchSize]] groups, one kernel call per group. The kernel
  *     ([[decodeKernel]]) is a codec dispatch: PPM (P6) payloads are
  *     really decoded (header + pixel statistics, [[decodePpm]] — no
  *     external library needed); unrecognized codecs fall back to the
  *     deterministic byte-hash features the oracle replicates. Adding a
  *     production codec (JPEG, PCM) extends the dispatch; the batch
  *     seam, schema, null/empty handling, and partition parallelism are
  *     unchanged, tested contract.
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

  /** The decode kernel: a codec DISPATCH over the payload bytes. Binary
    * PPM (P6) payloads are REALLY decoded — header parse + per-pixel
    * channel/luminance statistics ([[decodePpm]]); any other codec falls
    * through to [[fallbackFeatures]], the deterministic byte-hash twin
    * the DuckDB oracle replicates (the test corpus is text payloads, so
    * the oracle checks the fallback path end-to-end while the PPM path
    * is pinned by exact-arithmetic unit tests). A production deployment
    * extends the dispatch with more codecs (JPEG, PCM, …) — the batch
    * seam, schema, and null handling around it stay. */
  def decodeKernel(batch: Seq[Array[Byte]]): Seq[Array[Double]] =
    batch.map(p => decodePpm(p).getOrElse(fallbackFeatures(p)))

  /** Deterministic fallback features for payloads with no recognized
    * codec: feature j = `(h60(payload ⧺ "#j") mod 1000) / 1000` —
    * reproducible in SQL, which is what lets the oracle check the
    * batched plumbing end-to-end on the text-payload test corpus. */
  def fallbackFeatures(payload: Array[Byte]): Array[Double] =
    Array.tabulate(FeatureDim) { j =>
      (h60(payload ++ s"#$j".getBytes("UTF-8")) % 1000L) / 1000.0
    }

  /** Decode a binary PPM (P6) image: `P6 <w> <h> <maxval>` header
    * (with `#` comments, per the netpbm spec), one whitespace byte, then
    * exactly w·h·3 single-byte RGB samples (maxval ≤ 255). Returns None
    * unless the payload is STRUCTURALLY valid — magic, three bounded
    * positive ints, and an exact pixel-buffer length — so a text payload
    * can never false-positive into the image path (it would need the P6
    * magic AND a byte length matching its own declared dimensions).
    *
    * Features (real pixel statistics, [[FeatureDim]] = 8):
    * `[width, height, meanR, meanG, meanB, meanLuma, rmsContrast,
    * fracBright]` — channel means normalized by maxval, luminance by
    * Rec. 709 weights, fracBright = fraction of pixels with luma > 0.5. */
  private[multimodal] def decodePpm(p: Array[Byte]): Option[Array[Double]] = {
    if (p.length < 3 || p(0) != 'P' || p(1) != '6') return None
    var i = 2
    def isWs(c: Byte) = c == ' ' || c == '\n' || c == '\r' || c == '\t'
    // the netpbm spec requires whitespace (or a comment) after the magic
    if (!isWs(p(2)) && p(2) != '#') return None
    def skipWs(): Unit = {
      var go = true
      while (go && i < p.length) {
        if (p(i) == '#') { while (i < p.length && p(i) != '\n') i += 1 }
        else if (isWs(p(i))) i += 1
        else go = false
      }
    }
    def readInt(): Long = { // -1 = absent or absurd (>9 digits)
      skipWs()
      val start = i
      var v = 0L
      while (i < p.length && p(i) >= '0' && p(i) <= '9' && i - start < 10) {
        v = v * 10 + (p(i) - '0'); i += 1
      }
      if (i == start || i - start >= 10) -1 else v
    }
    val w = readInt(); val h = readInt(); val maxv = readInt()
    if (w <= 0 || h <= 0 || maxv <= 0 || maxv > 255) return None
    if (i >= p.length || !isWs(p(i))) return None // ONE separator byte
    i += 1
    if (p.length.toLong - i != w * h * 3) return None
    var sr = 0L; var sg = 0L; var sb = 0L
    var sumLuma = 0.0; var sumLuma2 = 0.0; var bright = 0L
    var k = i
    while (k < p.length) {
      val r = p(k) & 0xff; val g = p(k + 1) & 0xff; val b = p(k + 2) & 0xff
      sr += r; sg += g; sb += b
      val luma = (0.2126 * r + 0.7152 * g + 0.0722 * b) / maxv
      sumLuma += luma; sumLuma2 += luma * luma
      if (luma > 0.5) bright += 1
      k += 3
    }
    val np = (w * h).toDouble
    val mv = maxv.toDouble
    val meanLuma = sumLuma / np
    Some(Array(w.toDouble, h.toDouble,
      sr / np / mv, sg / np / mv, sb / np / mv, meanLuma,
      math.sqrt(math.max(sumLuma2 / np - meanLuma * meanLuma, 0.0)),
      bright / np))
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
      val feats = decodeKernel(nonEmpty.map(_.payload))
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
