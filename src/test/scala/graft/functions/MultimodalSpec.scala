package graft.functions

import java.io.ByteArrayInputStream

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark
import graft.sources.Tables

/** The decode is real: generated BMP/WAV payloads round-trip through the
  * JDK's own codecs (ImageIO / AudioSystem), so these tests fail if the
  * encoders emit malformed containers OR if extractFeatures stops calling
  * the decoders.
  */
class MultimodalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("BmpCodec bytes decode through ImageIO with the encoded dims") {
    for ((w, h) <- Seq((1, 1), (3, 2), (8, 5), (640, 2))) {
      val bytes = Multimodal.BmpCodec.encode(w, h, seed = w * 31L + h)
      assert(bytes.length == 54 + ((3 * w + 3) / 4) * 4 * h)
      val img = javax.imageio.ImageIO.read(new ByteArrayInputStream(bytes))
      assert(img != null, s"ImageIO failed to decode ${w}x$h BMP")
      assert(img.getWidth == w && img.getHeight == h)
    }
  }

  test("BMP pixel content survives the decode round-trip") {
    // bottom-up row order, BGR channels: pixel (x=0, y=h-1) is the first
    // 3 bytes of the pixel data — a concrete check that the payload is a
    // real raster, not just a parseable header
    val bytes = Multimodal.BmpCodec.encode(2, 2, seed = 7)
    val img = javax.imageio.ImageIO.read(new ByteArrayInputStream(bytes))
    val blue0 = ((7 + 0) * 31) & 0xff
    val green0 = ((7 + 1) * 31) & 0xff
    val red0 = ((7 + 2) * 31) & 0xff
    val rgb = img.getRGB(0, 1) // bottom-left = first encoded pixel
    assert((rgb & 0xff) == blue0)
    assert(((rgb >> 8) & 0xff) == green0)
    assert(((rgb >> 16) & 0xff) == red0)
  }

  test("WavCodec bytes decode through AudioSystem with the encoded frames") {
    for (frames <- Seq(1, 16, 255, 4096)) {
      val bytes = Multimodal.WavCodec.encode(frames, seed = frames)
      assert(bytes.length == 44 + 2 * frames)
      val in = javax.sound.sampled.AudioSystem
        .getAudioInputStream(new ByteArrayInputStream(bytes))
      try {
        assert(in.getFrameLength == frames)
        val fmt = in.getFormat
        assert(fmt.getSampleRate == Multimodal.WavCodec.SampleRate.toFloat)
        assert(fmt.getChannels == 1 && fmt.getSampleSizeInBits == 16)
      } finally in.close()
    }
  }

  test("GifCodec bytes decode through the JDK GIF reader: dims, frames, pixels") {
    for ((w, h, f) <- Seq((1, 1, 1), (3, 2, 4), (8, 5, 3), (200, 2, 2))) {
      val seed = w * 31L + h * 7L + f
      val bytes = Multimodal.GifCodec.encode(w, h, f, seed)
      val dl = 2 * w * h + 1
      assert(bytes.length == 398 + f * (12 + dl + (dl + 254) / 255),
        s"container size formula broke for ${w}x${h}x$f")
      val in = javax.imageio.ImageIO.createImageInputStream(
        new ByteArrayInputStream(bytes))
      val readers = javax.imageio.ImageIO.getImageReaders(in)
      assert(readers.hasNext, "JDK found no reader for the GIF payload")
      val r = readers.next()
      try {
        r.setInput(in)
        assert(r.getNumImages(true) == f)
        assert(r.getWidth(0) == w && r.getHeight(0) == h)
        // pixel content survives: frame 0, pixel (0,0) is palette entry
        // (seed*31) % 128, a grayscale value of twice the index
        val img = r.read(0)
        val expected = (((seed * 31) % 128) * 2).toInt
        assert((img.getRGB(0, 0) & 0xff) == expected,
          "decoded raster does not match the encoded pixel stream")
      } finally { r.dispose(); in.close() }
    }
  }

  test("extractFeatures runs the real decoders per kind over testdata") {
    val feats = Multimodal.extractFeatures(
      Multimodal.assets(Tables.documents(spark, TestSpark.sf)))
      .collect()
    assert(feats.nonEmpty)
    feats.foreach { f =>
      f.kind match {
        case "image" =>
          // decoded (not arithmetic-on-bytes) dims match the fixture pins
          assert(f.width == Multimodal.imageWidth(f.asset_id))
          assert(f.height == Multimodal.imageHeight(f.asset_id))
          assert(f.n_frames == 1)
          assert(f.n_bytes == 54 + ((3 * f.width + 3) / 4) * 4 * f.height)
        case "audio" =>
          assert(f.n_frames == Multimodal.audioFrames(f.asset_id))
          assert(f.n_bytes == 44 + 2 * f.n_frames)
          assert(f.width == 0 && f.height == 0)
        case "video" =>
          assert(f.width == Multimodal.videoWidth(f.asset_id))
          assert(f.height == Multimodal.videoHeight(f.asset_id))
          assert(f.n_frames == Multimodal.videoFrames(f.asset_id))
          val dl = 2 * f.width * f.height + 1
          assert(f.n_bytes == 398 + f.n_frames * (12 + dl + (dl + 254) / 255))
        case other => fail(s"unexpected kind $other")
      }
    }
    assert(feats.map(_.kind).distinct.sorted.toSeq == Seq("audio", "image", "video"))
  }

  test("a corrupted image payload fails loudly, not silently") {
    import spark.implicits._
    val bad = Seq(Multimodal.Asset(1L, "image",
      Array[Byte](66, 77, 1, 2, 3), "x")).toDS()
    val e = intercept[org.apache.spark.SparkException] {
      Multimodal.extractFeatures(bad).collect()
    }
    assert(e.getMessage != null)
  }

  test("imagePHash: identical payloads hash equal, different seeds differ") {
    import spark.implicits._
    val assets = Seq(
      Multimodal.Asset(1L, "image", Multimodal.BmpCodec.encode(8, 5, 42L), "a"),
      Multimodal.Asset(2L, "image", Multimodal.BmpCodec.encode(8, 5, 42L), "b"),
      Multimodal.Asset(3L, "image", Multimodal.BmpCodec.encode(8, 5, 43L), "c"),
      Multimodal.Asset(4L, "audio", Multimodal.WavCodec.encode(16, 1L), "d"))
      .toDS()
    val out = Multimodal.imagePHash(assets).collect()
      .map(h => h.asset_id -> ((h.width, h.height, h.hash_hi, h.hash_lo)))
      .toMap
    assert(out.keySet == Set(1L, 2L, 3L), "audio assets are not hashed")
    assert(out(1L) == out(2L), "same payload, same fingerprint")
    assert(out(1L) != out(3L), "different pixels, different fingerprint")
    assert(out(1L)._1 == 8 && out(1L)._2 == 5, "decoded dims carried")
  }

  test("phashPairs: banded join equals brute-force hamming, exactly") {
    import spark.implicits._
    // 40 tiny images over varied dims/seeds — enough natural near-
    // collisions to make the equivalence non-vacuous
    val assets = (0 until 40).map(i => Multimodal.Asset(i.toLong, "image",
      Multimodal.BmpCodec.encode(1 + i % 8, 1 + i % 5, i.toLong), "s")).toDS()
    val hashes = Multimodal.imagePHash(assets).toDF()
      .select("asset_id", "hash_hi", "hash_lo")
    val banded = Multimodal.phashPairs(hashes).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val hs = hashes.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val brute = (for {
      (ia, hia, loa) <- hs; (ib, hib, lob) <- hs if ia < ib
      d = java.lang.Long.bitCount(hia ^ hib) +
        java.lang.Long.bitCount(loa ^ lob) if d <= 3
    } yield (ia, ib, d)).toSet
    assert(brute.nonEmpty, "fixture must exercise real pairs")
    assert(banded == brute, s"banded ${banded.size} vs brute ${brute.size}")
  }

  test("phashStarPairs: join closure equals the all-pairs form") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // same fixture shape as the banded-vs-brute test: deep exact-hash
    // groups (repeated (dims, seed)) plus natural near-collisions
    val assets = (0 until 60).map(i => Multimodal.Asset(i.toLong, "image",
      Multimodal.BmpCodec.encode(1 + i % 4, 1 + i % 3, (i % 10).toLong),
      "s")).toDS()
    val hashes = Multimodal.imagePHash(assets).toDF()
      .select("asset_id", "hash_hi", "hash_lo")
    val full = Multimodal.phashPairs(hashes).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val star = Multimodal.phashStarPairs(hashes).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(star.subsetOf(full),
      "every star row IS a true pair (membership at 0, bridges at d>=1)")
    assert(star.size < full.size, "fixture must exercise group depth")
    // closure equivalence: connected components over the stars equal
    // components over all pairs — the star form carries the same
    // duplicate structure
    def labels(pairs: Set[(Long, Long, Int)]) = {
      val edges = pairs.toSeq.map { case (a, b, _) => (a, b) }
        .toDF("src", "dst")
      Dedup.connectedComponents(
        edges.select(col("src").as("doc_a"), col("dst").as("doc_b")))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    }
    assert(labels(star) == labels(full),
      "star closure must reproduce the all-pairs components")
    // hamming values on bridges are true distances (spot re-check)
    val hs = hashes.collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    star.foreach { case (a, b, d) =>
      val da = java.lang.Long.bitCount(hs(a)._1 ^ hs(b)._1) +
        java.lang.Long.bitCount(hs(a)._2 ^ hs(b)._2)
      assert(da == d, s"star pair ($a,$b) carries hamming $d, true $da")
    }
  }

  test("audioFingerprint: identical payloads equal, seeds differ, audio only") {
    import spark.implicits._
    val assets = Seq(
      Multimodal.Asset(1L, "audio", Multimodal.WavCodec.encode(64, 42L), "a"),
      Multimodal.Asset(2L, "audio", Multimodal.WavCodec.encode(64, 42L), "b"),
      Multimodal.Asset(3L, "audio", Multimodal.WavCodec.encode(64, 43L), "c"),
      Multimodal.Asset(4L, "image", Multimodal.BmpCodec.encode(2, 2, 1L), "d"))
      .toDS()
    val out = Multimodal.audioFingerprint(assets).collect()
      .map(p => p.asset_id ->
        ((p.n_frames, p.n_windows, p.mean_energy, p.fingerprint)))
      .toMap
    assert(out.keySet == Set(1L, 2L, 3L), "image assets are not fingerprinted")
    assert(out(1L) == out(2L), "same payload, same fingerprint")
    assert(out(1L) != out(3L), "different samples, different fingerprint")
    assert(out(1L)._1 == 64 && out(1L)._2 == 4, "64 frames = 4 windows")
  }

  test("audioSegments: runs partition the windows at the fingerprint flips") {
    import spark.implicits._
    val assets = Seq(
      Multimodal.Asset(1L, "audio", Multimodal.WavCodec.encode(160, 1L), "a"),
      Multimodal.Asset(2L, "audio", Multimodal.WavCodec.encode(64, 7L), "b"))
      .toDS()
    val prints = Multimodal.audioFingerprint(assets).collect()
      .map(p => p.asset_id -> p).toMap
    val segs = Multimodal.audioSegments(assets).collect()
      .groupBy(_.asset_id).view.mapValues(_.sortBy(_.seg_idx)).toMap
    segs.foreach { case (id, ss) =>
      val p = prints(id)
      // segments tile [0, n_windows) contiguously, no gaps or overlaps
      assert(ss.head.start_window == 0)
      assert(ss.map(_.n_windows).sum == p.n_windows)
      ss.sliding(2).foreach {
        case Array(a, b) =>
          assert(b.start_window == a.start_window + a.n_windows, "contiguous")
          assert(a.is_voiced != b.is_voiced, "adjacent runs alternate")
        case _ =>
      }
      // each segment's voiced flag equals its windows' fingerprint bits
      ss.foreach { s =>
        (s.start_window until s.start_window + s.n_windows).foreach { w =>
          assert(((p.fingerprint >> w) & 1L) == (if (s.is_voiced) 1L else 0L),
            s"asset $id window $w disagrees with the fingerprint bit")
        }
      }
    }
    assert(segs(1L).length > 1, "fixture must produce a real split")
  }

  test("videoFrameEnergies: per-frame sums through the real GIF decode") {
    import spark.implicits._
    // 2x2, 3 frames, seed 10: frame f pixel i gray = 2*((10*31+f*7+i)%128)
    val assets = Seq(Multimodal.Asset(1L, "video",
      Multimodal.GifCodec.encode(2, 2, 3, 10L), "a")).toDS()
    val out = Multimodal.videoFrameEnergies(assets).collect()
      .map(v => v.frame_idx -> ((v.n_frames, v.frame_energy, v.above_mean)))
      .toMap
    def fe(f: Int): Long =
      (0 until 4).map(i => 2L * ((10L * 31 + f * 7 + i) % 128)).sum
    val mean = (0 until 3).map(fe).sum / 3
    assert(out.keySet == Set(0, 1, 2))
    (0 until 3).foreach { f =>
      assert(out(f) == ((3, fe(f), fe(f) > mean)), s"frame $f: ${out(f)}")
    }
  }

  test("imagePHash rejects grids that overflow the 64-bit fingerprint") {
    import spark.implicits._
    val assets = Seq(Multimodal.Asset(1L, "image",
      Multimodal.BmpCodec.encode(2, 2, 1L), "a")).toDS()
    val ex = intercept[IllegalArgumentException](
      Multimodal.imagePHash(assets, grid = 9))
    assert(ex.getMessage.contains("grid"))
  }
}
