package graft.multimodal

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Multimodal plumbing tests: the batched kernel path must agree with the
  * oracle-checked expression path, batches must have the declared shape,
  * and empty payloads must short-circuit. */
class MultimodalSuite extends AnyFunSuite {
  private val sf = "/root/testdata/sf0.001"

  test("batched kernel path equals the expression path (feature parity)") {
    val s = TestSpark.spark
    val kernel = MultimodalOps.decodeFeatures(s, sf)
      .collect().map(m => m.doc_id -> (m.kind, m.n_bytes, m.features.toSeq)).toMap
    val expr = MultimodalOps.queries("q_media_features")(s, sf).collect()
    assert(expr.nonEmpty && expr.length == kernel.size)
    expr.foreach { row =>
      val (kind, nBytes, feats) = kernel(row.getLong(0))
      assert(row.getString(1) == kind)
      assert(row.getLong(2) == nBytes)
      (0 until MultimodalOps.FeatureDim).foreach { j =>
        assert(math.abs(row.getDouble(3 + j) - feats(j)) < 1e-12,
          s"doc ${row.getLong(0)} feature $j")
      }
    }
  }

  test("kernel receives batches of the declared shape") {
    val sizes = scala.collection.mutable.ArrayBuffer.empty[Int]
    val payloads = (0 until 150).map(i => s"payload-$i".getBytes("UTF-8"))
    payloads.grouped(MultimodalOps.BatchSize).foreach { g =>
      sizes += g.length
      val out = MultimodalOps.decodeKernel(g)
      assert(out.length == g.length)
      assert(out.forall(_.length == MultimodalOps.FeatureDim))
    }
    assert(sizes.toSeq == Seq(64, 64, 22))
  }

  test("PPM (P6) payloads decode to real pixel statistics") {
    // 2x2 image — red, green, blue, white — with a header comment
    val header = "P6\n# test image\n2 2\n255\n".getBytes("UTF-8")
    val pix = Array(255, 0, 0, 0, 255, 0, 0, 0, 255, 255, 255, 255).map(_.toByte)
    val ppm = header ++ pix
    val f = MultimodalOps.decodePpm(ppm).get
    assert(f(0) == 2.0 && f(1) == 2.0) // width, height
    // each channel is full in exactly 2 of 4 pixels → mean 0.5
    assert(math.abs(f(2) - 0.5) < 1e-9)
    assert(math.abs(f(3) - 0.5) < 1e-9)
    assert(math.abs(f(4) - 0.5) < 1e-9)
    // Rec.709 lumas: .2126, .7152, .0722, 1.0 → mean 0.5; bright = 2/4
    assert(math.abs(f(5) - 0.5) < 1e-9)
    assert(f(6) > 0.3) // contrast of a max-spread image
    assert(math.abs(f(7) - 0.5) < 1e-9)
    // dispatch routes P6 through the real decoder, text through fallback
    val viaKernel = MultimodalOps.decodeKernel(Seq(ppm, "not an image".getBytes))
    assert(viaKernel(0).toSeq == f.toSeq)
    assert(viaKernel(1).toSeq == MultimodalOps.fallbackFeatures("not an image".getBytes).toSeq)
    // malformed P6 variants fall back instead of crashing or mis-parsing
    assert(MultimodalOps.decodePpm(ppm.dropRight(1)).isEmpty)  // short buffer
    assert(MultimodalOps.decodePpm(ppm ++ Array(0.toByte)).isEmpty) // long
    assert(MultimodalOps.decodePpm("P6 garbage".getBytes).isEmpty)
    assert(MultimodalOps.decodePpm("P6\n2 2\n70000\n".getBytes ++ pix).isEmpty)
    // no whitespace after the magic is invalid per the netpbm spec
    assert(MultimodalOps.decodePpm("P62 2\n255\n".getBytes ++ pix).isEmpty)
  }

  test("PGM (P5) payloads decode to real grayscale statistics") {
    // 4x1 image: black, mid, bright, white
    val pgm = "P5\n# gray\n4 1\n255\n".getBytes("UTF-8") ++
      Array(0, 128, 192, 255).map(_.toByte)
    val f = MultimodalOps.decodePgm(pgm).get
    assert(f(0) == 4.0 && f(1) == 1.0)
    val mean = (0 + 128 + 192 + 255) / 4.0 / 255.0
    assert(math.abs(f(2) - mean) < 1e-12 && f(2) == f(3) && f(3) == f(4)
      && f(4) == f(5))
    assert(f(6) > 0.3) // spread image → high contrast
    assert(f(7) == 0.75) // 3 of 4 pixels with 2g > 255 (128, 192, 255)
    // dispatch: P5 → real decoder; malformed P5 falls back, P6 unaffected
    val viaKernel = MultimodalOps.decodeKernel(Seq(pgm))
    assert(viaKernel(0).toSeq == f.toSeq)
    assert(MultimodalOps.decodePgm(pgm.dropRight(1)).isEmpty)
    assert(MultimodalOps.decodePgm(pgm ++ Array(0.toByte)).isEmpty)
    assert(MultimodalOps.decodePgm("P5 garbage".getBytes).isEmpty)
    assert(MultimodalOps.decodePpm(pgm).isEmpty) // P5 is not P6
  }

  test("WAV (PCM16) payloads decode to real sample statistics") {
    val wav = MultimodalOps.syntheticWav(1L)
    val f = MultimodalOps.decodeWav(wav).get
    assert(f(0) == 1.0 && f(1) == 8000.0 && f(2) == 24.0)
    assert(math.abs(f(3) - 24.0 / 8000.0) < 1e-15) // duration
    // recompute the stats from the generator formula
    val samples = (0 until 24).map(k => ((1L * 31 + k * 17) % 65536 - 32768).toInt)
    val sa = samples.map(s => math.abs(s.toLong)).sum
    val ss = samples.map(s => s.toLong * s).sum
    val zc = samples.sliding(2).count(p => (p(0) < 0) != (p(1) < 0))
    assert(f(4) == sa.toDouble / 24.0 / 32768.0)
    assert(f(5) == math.sqrt(ss.toDouble / 24.0 / (32768.0 * 32768.0)))
    assert(f(6) == zc.toDouble / 23.0)
    assert(f(7) == samples.map(s => math.abs(s.toLong)).max / 32768.0)
    // dispatch + malformed variants fall back instead of mis-parsing
    assert(MultimodalOps.decodeKernel(Seq(wav))(0).toSeq == f.toSeq)
    assert(MultimodalOps.decodeWav(wav.dropRight(1)).isEmpty) // truncated data
    assert(MultimodalOps.decodeWav("RIFFxxxxWAVE".getBytes).isEmpty)
    val nonPcm = wav.clone(); nonPcm(20) = 3 // float format tag
    assert(MultimodalOps.decodeWav(nonPcm).isEmpty)
    val eightBit = wav.clone(); eightBit(34) = 8
    assert(MultimodalOps.decodeWav(eightBit).isEmpty)
  }

  test("resizePgm samples nearest-neighbor pixels and re-emits valid P5") {
    // 4x2 image with distinct pixels; resize to 2x1 keeps (0,0) and (2,0)
    val pgm = "P5\n4 2\n255\n".getBytes("UTF-8") ++
      Array(10, 20, 30, 40, 50, 60, 70, 80).map(_.toByte)
    val resized = MultimodalOps.resizePgm(pgm, 2, 1).get
    val f = MultimodalOps.decodePgm(resized).get
    assert(f(0) == 2.0 && f(1) == 1.0)
    assert(f(2) == (10 + 30) / 2.0 / 255.0) // exactly pixels 0 and 2
    // identity resize preserves every pixel stat
    val same = MultimodalOps.resizePgm(pgm, 4, 2).get
    assert(MultimodalOps.decodePgm(same).get.toSeq ==
      MultimodalOps.decodePgm(pgm).get.toSeq)
    assert(MultimodalOps.resizePgm("not an image".getBytes, 2, 1).isEmpty)
  }

  test("dHashPgm: row-major difference bits, brightness-shift invariant, " +
      "single-pixel edit moves at most 2 bits") {
    // 3x2: rows [10,30,20], [5,5,200] -> bits: (30>10)=1, (20>30)=0,
    // (5>5)=0, (200>5)=1 -> 0b1001
    val pgm = "P5\n3 2\n255\n".getBytes("UTF-8") ++
      Array(10, 30, 20, 5, 5, 200).map(_.toByte)
    assert(MultimodalOps.dHashPgm(pgm).get == 0x9L)
    // +50 brightness on every pixel: comparisons unchanged
    val brighter = "P5\n3 2\n255\n".getBytes("UTF-8") ++
      Array(60, 80, 70, 55, 55, 250).map(_.toByte)
    assert(MultimodalOps.dHashPgm(brighter).get == 0x9L)
    assert(MultimodalOps.dHashPgm("nope".getBytes).isEmpty)
    // fixture family: a variant differs from its base by <= 2 bits and
    // different bases are far apart
    val h0 = MultimodalOps.dHashPgm(MultimodalOps.syntheticNoisePgm(40L)).get
    val h3 = MultimodalOps.dHashPgm(MultimodalOps.syntheticNoisePgm(43L)).get
    val other = MultimodalOps.dHashPgm(MultimodalOps.syntheticNoisePgm(50L)).get
    assert(java.lang.Long.bitCount(h0 ^ h3) <= 2)
    assert(java.lang.Long.bitCount(h0 ^ other) > 2)
  }

  test("audioFingerprint: frame-energy-delta bits, gain invariant, " +
      "single-sample edit moves at most 2 bits") {
    val fp0 = MultimodalOps.audioFingerprint(
      MultimodalOps.syntheticNoiseWav(70L)).get
    // a uniform gain change preserves every energy comparison: halve all
    // samples of the base clip and the fingerprint must not move
    val half = {
      val p = MultimodalOps.syntheticNoiseWav(70L)
      val q = p.clone()
      var i = 44
      while (i < q.length) {
        val s = (((q(i) & 0xff) | (q(i + 1) << 8)).toShort / 2).toShort
        q(i) = (s & 0xff).toByte; q(i + 1) = ((s >> 8) & 0xff).toByte
        i += 2
      }
      q
    }
    assert(MultimodalOps.audioFingerprint(half).get == fp0)
    // a variant (one perturbed sample) sits within 2 bits of its base;
    // a different base is far away
    val fp3 = MultimodalOps.audioFingerprint(
      MultimodalOps.syntheticNoiseWav(73L)).get
    val other = MultimodalOps.audioFingerprint(
      MultimodalOps.syntheticNoiseWav(90L)).get
    assert(java.lang.Long.bitCount(fp0 ^ fp3) <= 2)
    assert(java.lang.Long.bitCount(fp0 ^ other) > 2)
    // too-short and non-WAV payloads have no fingerprint
    assert(MultimodalOps.audioFingerprint(
      MultimodalOps.syntheticWav(1L)).isEmpty) // 24 samples < 130
    assert(MultimodalOps.audioFingerprint("nope".getBytes).isEmpty)
  }

  test("resampleWav decimates samples, halves the rate, preserves duration") {
    val wav = MultimodalOps.syntheticWav(7L)
    val res = MultimodalOps.resampleWav(wav, 2).get
    val f0 = MultimodalOps.decodeWav(wav).get
    val f = MultimodalOps.decodeWav(res).get
    assert(f(1) == 4000.0 && f(2) == 12.0) // rate halved, half the samples
    assert(f(3) == f0(3)) // duration preserved exactly
    // kept samples are exactly the even-index originals
    val kept = (0 until 24 by 2).map(k => ((7L * 31 + k * 17) % 65536 - 32768).toInt)
    assert(f(7) == kept.map(s => math.abs(s.toLong)).max / 32768.0)
    assert(MultimodalOps.resampleWav(wav, 7).isEmpty) // 8000 % 7 != 0
    assert(MultimodalOps.resampleWav("RIFF".getBytes, 2).isEmpty)
  }

  test("q_media_decode runs both real codecs — no row takes the fallback") {
    val s = TestSpark.spark
    val rows = MultimodalOps.queries("q_media_decode")(s, sf).collect()
    assert(rows.nonEmpty)
    val byKind = rows.groupBy(_.getString(1))
    // every even id decoded as an image (f0 = width 8), every odd id as
    // audio (f1 = sample rate 8000) — values unreachable via fallback,
    // whose features all land in [0, 1)
    assert(byKind("image/pgm").forall(r =>
      r.getLong(0) % 2 == 0 && r.getDouble(3) == 8.0 && r.getLong(2) == 27L))
    assert(byKind("audio/wav").forall(r =>
      r.getLong(0) % 2 == 1 && r.getDouble(4) == 8000.0 && r.getLong(2) == 92L))
  }

  test("kernel is deterministic and features are in [0, 1)") {
    val batch = Seq("a".getBytes, "b".getBytes, "a".getBytes)
    val out1 = MultimodalOps.decodeKernel(batch)
    val out2 = MultimodalOps.decodeKernel(batch)
    assert(out1.map(_.toSeq) == out2.map(_.toSeq))
    assert(out1(0).toSeq == out1(2).toSeq) // same payload → same features
    assert(out1(0).toSeq != out1(1).toSeq)
    assert(out1.flatten.forall(f => f >= 0.0 && f < 1.0))
  }

  test("empty payloads short-circuit to zero vectors without hitting the kernel") {
    val rows = Iterator(
      MultimodalOps.MediaRow(1L, "hello".getBytes, "img"),
      MultimodalOps.MediaRow(2L, Array.emptyByteArray, "img"),
      MultimodalOps.MediaRow(3L, null, "aud"))
    val got = MultimodalOps.decodeBatches(rows).map(m => m.doc_id -> m).toMap
    assert(got(2L).n_bytes == 0L && got(2L).features.forall(_ == 0.0))
    assert(got(3L).n_bytes == 0L && got(3L).features.forall(_ == 0.0))
    assert(got(1L).features.exists(_ != 0.0))
  }

  test("quarantine classifiers: every corrupt-payload class gets its own " +
      "reason, valid payloads fingerprint identically to the Option path") {
    // image classes
    val img = MultimodalOps.syntheticNoisePgm(40L)
    assert(MultimodalOps.dHashPgmE(img) ==
      Right(MultimodalOps.dHashPgm(img).get))
    assert(MultimodalOps.dHashPgmE(Array.emptyByteArray) == Left("empty"))
    assert(MultimodalOps.dHashPgmE(null) == Left("empty"))
    val badMagic = img.clone(); badMagic(0) = 'X'.toByte
    assert(MultimodalOps.dHashPgmE(badMagic) == Left("bad_header"))
    assert(MultimodalOps.dHashPgmE(img.dropRight(1)) ==
      Left("bad_pixel_buffer"))
    // a structurally valid image too large for the 64-bit hash budget
    val big = s"P5\n12 8\n255\n".getBytes("US-ASCII") ++
      Array.fill(96)(7.toByte)
    assert(MultimodalOps.dHashPgmE(big) == Left("oversize_dims"))
    // audio classes
    val wav = MultimodalOps.syntheticNoiseWav(71L)
    assert(MultimodalOps.audioFingerprintE(wav) ==
      Right(MultimodalOps.audioFingerprint(wav).get))
    assert(MultimodalOps.audioFingerprintE(Array.emptyByteArray) ==
      Left("empty"))
    val badRiff = wav.clone(); badRiff(0) = 'X'.toByte
    assert(MultimodalOps.audioFingerprintE(badRiff) == Left("bad_container"))
    assert(MultimodalOps.audioFingerprintE(wav.dropRight(1)) ==
      Left("bad_container"))
    assert(MultimodalOps.audioFingerprintE(MultimodalOps.syntheticWav(1L)) ==
      Left("too_short")) // 24-sample decode fixture < AudioFpSamples
  }

  test("near-dup pairs over a corpus WITH corrupt payloads equal the " +
      "pairs over its valid subset; the quarantine partitions the input") {
    val s = TestSpark.spark
    import s.implicits._
    val ids = (40L to 59L)
    val media = ids.map(id => (id, MultimodalOps.corruptPayload(id)))
      .toDF("doc_id", "payload")
    val fp = graft.api.Graft.mediaFingerprints(
      media.filter(col("doc_id") % 2 === 0), "doc_id", "payload")
    // exactly one stream per row: hash xor reason
    assert(fp.filter(col("dhash").isNotNull === col("reason").isNotNull)
      .count() == 0)
    assert(fp.count() == ids.count(_ % 2 == 0))
    val quarantined = fp.filter(col("reason").isNotNull)
      .select("doc_id", "reason").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(quarantined == Set((42L, "empty"), (46L, "bad_header"),
      (48L, "bad_pixel_buffer"), (52L, "empty"), (56L, "bad_header"),
      (58L, "bad_pixel_buffer")))
    // the funnel's pairs are exactly the valid-subset pairs
    def pairSet(df: org.apache.spark.sql.DataFrame) =
      df.select("doc_a", "doc_b").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val withCorrupt = pairSet(graft.api.Graft.mediaNearDupPairs(
      media.filter(col("doc_id") % 2 === 0), "doc_id", "payload"))
    val validOnly = pairSet(graft.api.Graft.mediaNearDupPairs(
      media.filter(col("doc_id") % 2 === 0)
        .filter(!(col("doc_id") % 10).isin(2, 6, 8)), "doc_id", "payload"))
    assert(withCorrupt == validOnly)
    assert(withCorrupt.contains((40L, 44L)), withCorrupt) // same-base survivors pair
  }

  test("media table schema: opaque binary payload + typed metadata") {
    val s = TestSpark.spark
    val sch = MultimodalOps.mediaTable(s, sf).schema
    assert(sch("payload").dataType == org.apache.spark.sql.types.BinaryType)
    assert(sch("kind").dataType == org.apache.spark.sql.types.StringType)
    assert(MultimodalOps.mediaTable(s, sf).filter(col("payload").isNull).count() == 0)
  }
}
