package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Multimodal

class MultimodalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  val dir = "/root/testdata/sf0.001"

  test("synthetic media: binary payload + typed metadata, 3 kinds") {
    val media = Multimodal.syntheticMedia(spark, dir)
    val kinds = media.toDF().groupBy("kind").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(kinds.keySet == Set("image", "audio", "video"))
    assert(kinds.values.sum == 500)
    val m = media.head()
    assert(m.bytes.nonEmpty && m.meta.durationMs > 0)
  }

  test("decodeFeatures: deterministic, fixed-dim, partition-batched") {
    val media = Multimodal.syntheticMedia(spark, dir)
    val f1 = Multimodal.decodeFeatures(media, featureDim = 16).collect()
      .map(f => f.media_id -> f).toMap
    val f2 = Multimodal.decodeFeatures(media.repartition(7), 16).collect()
      .map(f => f.media_id -> f).toMap
    assert(f1.size == 500)
    assert(f1.values.forall(_.feature.length == 16))
    // partitioning must not change per-row results
    assert(f1(0L).feature.toSeq == f2(0L).feature.toSeq)
    assert(f1(0L).mean_intensity == f2(0L).mean_intensity)
    assert(f1.values.forall(f => f.mean_intensity > 0 && f.n_bytes > 0))
  }

  test("resize rewrites payload + metadata to target resolution") {
    val media = Multimodal.syntheticMedia(spark, dir)
    val out = Multimodal.resize(media, 64, 64).head()
    assert(out.meta.width == 64 && out.meta.height == 64)
    assert(out.bytes.length == 64 * 64 / 64)
  }

  test("sampleFrames emits frames only for video, spaced by everyMs") {
    val media = Multimodal.syntheticMedia(spark, dir)
    val frames = Multimodal.sampleFrames(media, everyMs = 1000).collect()
    assert(frames.nonEmpty)
    assert(frames.forall(_.offset_ms % 1000 == 0))
    val videoIds = media.filter(_.kind == "video").collect().map(_.media_id).toSet
    assert(frames.map(_.media_id).toSet.subsetOf(videoIds))
  }

  test("real PNG codec: a gradient image survives the encode→decode round " +
    "trip bit-for-bit (PNG is lossless), not just in solid-color stats") {
    import spark.implicits._
    // gradient raster: every pixel distinct-ish, exercises the full
    // scanline path of the codec
    val w = 37; val h = 23
    val src = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w)
      src.setRGB(x, y, ((x * 7) % 256 << 16) | ((y * 11) % 256 << 8) |
        ((x + y) % 256))
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(src, "png", bos)
    val decoded = Seq(Multimodal.ImageRow(1L, bos.toByteArray)).toDS()
      .mapPartitions { it =>
        it.map { r =>
          val img = javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(r.png))
          val pix = for (y <- 0 until img.getHeight; x <- 0 until img.getWidth)
            yield img.getRGB(x, y) & 0xffffff
          (img.getWidth, img.getHeight, pix.toArray)
        }
      }.head()
    val expected =
      (for (y <- 0 until h; x <- 0 until w) yield src.getRGB(x, y) & 0xffffff)
        .toArray
    assert(decoded._1 == w && decoded._2 == h)
    assert(decoded._3.toSeq == expected.toSeq)
  }

  test("real WAV codec: an arbitrary PCM signal survives the " +
    "encode→parse round trip sample-for-sample (PCM WAV is lossless)") {
    import spark.implicits._
    val samples = Array.tabulate(977)(i =>
      (((i * 2654435761L) >> 7) % 32768).toShort)
    val pcm = new Array[Byte](samples.length * 2)
    samples.zipWithIndex.foreach { case (s, i) =>
      pcm(2 * i) = (s & 0xff).toByte
      pcm(2 * i + 1) = ((s >> 8) & 0xff).toByte
    }
    val fmt = new javax.sound.sampled.AudioFormat(16000f, 16, 1, true, false)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(pcm), fmt, samples.length.toLong),
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    val decoded = Seq(Multimodal.AudioRow(1L, bos.toByteArray)).toDS()
      .mapPartitions { it =>
        it.map { r =>
          val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
            new java.io.ByteArrayInputStream(r.wav))
          val b = ais.readAllBytes()
          (ais.getFormat.getSampleRate.toInt,
            Array.tabulate(b.length / 2)(i =>
              ((b(2 * i) & 0xff) | (b(2 * i + 1) << 8)).toShort))
        }
      }.head()
    assert(decoded._1 == 16000)
    assert(decoded._2.toSeq == samples.toSeq)
  }

  test("decodeWavs extracts exact frame counts and amplitudes for the " +
    "synthetic corpus (the q70 oracle contract)") {
    val feats = Multimodal.decodeWavs(
      Multimodal.syntheticWavs(spark, dir)).collect()
    assert(feats.length == 500)
    assert(feats.forall { f =>
      val amp = (f.media_id * 97 % 8192 + 1).toInt
      f.sample_rate == 16000 && f.mean_abs == amp.toDouble && f.peak == amp
    })
  }

  test("GVID frame sampling seeks via the index: variable-size frames " +
    "decode with their own dims/colors, and every=2 is exactly the " +
    "even-index subset of every=1") {
    import spark.implicits._
    // three frames with DIFFERENT dimensions (different PNG byte sizes)
    // so any index/seek arithmetic error lands in the wrong frame
    val dims = Seq((9, 5, 0xff0000), (31, 17, 0x00ff00), (3, 21, 0x0000ff))
    val frames = dims.map { case (w, h, rgb) =>
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      val g = img.createGraphics()
      g.setColor(new java.awt.Color(rgb)); g.fillRect(0, 0, w, h); g.dispose()
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos); bos.toByteArray
    }
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeInt(0x47564944); out.writeInt(frames.length)
    frames.foreach(f => out.writeInt(f.length))
    frames.foreach(out.write); out.flush()
    val vids = Seq(Multimodal.VideoRow(7L, bos.toByteArray)).toDS()
    val all = Multimodal.sampleGvidFrames(vids, every = 1).collect()
      .sortBy(_.frame_idx)
    assert(all.length == 3)
    assert(all.map(f => (f.width, f.height)).toSeq ==
      dims.map(d => (d._1, d._2)))
    assert(all(0).mean_r == 255.0 && all(0).mean_g == 0.0)
    assert(all(1).mean_g == 255.0 && all(1).mean_b == 0.0)
    assert(all(2).mean_b == 255.0 && all(2).mean_r == 0.0)
    val sampled = Multimodal.sampleGvidFrames(vids, every = 2).collect()
      .sortBy(_.frame_idx)
    assert(sampled.map(_.frame_idx).toSeq == Seq(0, 2))
    assert(sampled.map(f => (f.width, f.height, f.mean_r, f.mean_b)).toSeq ==
      all.filter(_.frame_idx % 2 == 0)
        .map(f => (f.width, f.height, f.mean_r, f.mean_b)).toSeq)
  }

  test("MJPEG-AVI: a real RIFF container round-trips through the real " +
    "JDK JPEG codec — exact dims per frame, lossy-but-close colors, and " +
    "every=2 seeks to exactly the even-index frames") {
    val avis = Multimodal.syntheticMjpegAvis(spark, dir)
    val one = avis.filter(_.media_id == 3L).collect().head
    // genuine RIFF/AVI structure, hand-checkable at the byte level
    assert(new String(one.avi, 0, 4, "US-ASCII") == "RIFF")
    assert(new String(one.avi, 8, 4, "US-ASCII") == "AVI ")
    val all = Multimodal.sampleAviFrames(avis, every = 1).collect()
    val byId = all.groupBy(_.media_id)
    val nchars = graft.sources.Tables.load(spark, dir, "documents")
      .select("doc_id", "n_chars").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(byId.keySet == nchars.keySet)
    byId.foreach { case (id, fs) =>
      val n = nchars(id)
      assert(fs.length == (n % 5).toInt + 2, s"media $id frame count")
      fs.foreach { f =>
        // dimensions survive the lossy codec exactly — and drift per
        // frame, so a wrong seek cannot produce these
        assert(f.width == (n % 32) + 8 + f.frame_idx, s"$id/${f.frame_idx}")
        assert(f.height == (n % 24) + 8 + f.frame_idx % 3)
        // solid-color frames are DC-only: JPEG quantization may shift
        // the decoded level a few counts, never more
        val (er, eg, eb) = ((id * 37 + f.frame_idx * 11) % 256,
          (id * 53 + f.frame_idx * 13) % 256,
          (id * 71 + f.frame_idx * 17) % 256)
        assert(math.abs(f.mean_r - er) <= 6.0, s"$id r ${f.mean_r} vs $er")
        assert(math.abs(f.mean_g - eg) <= 6.0, s"$id g ${f.mean_g} vs $eg")
        assert(math.abs(f.mean_b - eb) <= 6.0, s"$id b ${f.mean_b} vs $eb")
      }
    }
    val sampled = Multimodal.sampleAviFrames(avis, every = 2).collect()
      .groupBy(_.media_id)
    sampled.foreach { case (id, fs) =>
      val full = byId(id).filter(_.frame_idx % 2 == 0)
        .map(f => (f.frame_idx, f.width, f.height, f.mean_r)).sorted
      assert(fs.map(f => (f.frame_idx, f.width, f.height, f.mean_r))
        .sorted.toSeq == full.toSeq, s"media $id sampled mismatch")
    }
  }

  test("decodeMedia dispatches each kind through its real codec: exact " +
    "integer stats for PNG pixels, WAV samples, and sampled GVID frames") {
    val rows = Multimodal.decodeMedia(
      Multimodal.syntheticMediaReal(spark, dir)).collect()
    assert(rows.length == 500)
    assert(rows.map(_.kind).toSet == Set("image", "audio", "video"))
    val nchars = graft.sources.Tables.load(spark, dir, "documents")
      .select("doc_id", "n_chars").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    rows.foreach { m =>
      val id = m.media_id
      val n = nchars(id)
      id % 3 match {
        case 0 =>
          val (w, h) = ((n % 64 + 8).toInt, (n % 48 + 8).toInt)
          assert(m.width.contains(w) && m.height.contains(h))
          assert(m.n_units == w.toLong * h)
          assert(m.stat_sum ==
            (id * 37 % 256 + id * 53 % 256 + id * 71 % 256) * w * h)
        case 1 =>
          assert(m.width.isEmpty && m.height.isEmpty)
          assert(m.n_units == n + 64)
          assert(m.stat_sum == (id * 97 % 8192 + 1) * (n + 64))
        case _ =>
          val (w, h) = ((n % 32 + 8).toInt, (n % 24 + 8).toInt)
          val nf = (n % 5 + 2).toInt
          assert(m.width.contains(w) && m.height.contains(h))
          assert(m.n_units == (nf + 1) / 2)
          val expected = (0 until nf).filter(_ % 2 == 0).map { f =>
            ((id * 37 + f * 11) % 256 + (id * 53 + f * 13) % 256 +
              (id * 71 + f * 17) % 256) * w.toLong * h
          }.sum
          assert(m.stat_sum == expected, s"video $id")
      }
    }
  }

  test("decodePngs extracts exact channel means and thumbnail mean for " +
    "the synthetic corpus (the q69 oracle contract)") {
    val feats = Multimodal.decodePngs(
      Multimodal.syntheticPngs(spark, dir)).collect()
    assert(feats.length == 500)
    assert(feats.forall { f =>
      f.mean_r == (f.media_id * 37 % 256).toDouble &&
        f.mean_g == (f.media_id * 53 % 256).toDouble &&
        f.mean_b == (f.media_id * 71 % 256).toDouble
    })
    assert(feats.forall(f =>
      f.thumb_mean == (f.media_id * 37 % 256 + f.media_id * 53 % 256 +
        f.media_id * 71 % 256) / 3.0))
  }

  test("imageAHash: the real PNG round-trip reproduces the formula " +
    "hash; banded near-dup pairs equal brute force") {
    import graft.functions.Multimodal
    val hashes = Multimodal.imageAHash(
      Multimodal.syntheticGradientPngs(spark, dir))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(hashes.length > 0)
    // independent replay of the pixel formula for every doc
    def dupSeedI(id: Long, mod: Long): Long =
      id % 2147483648L * 2654435761L % 2147483648L % mod
    def formulaHash(id: Long): (Long, Long) = {
      val seed = dupSeedI(id, 221)
      val gx = (seed * 7 % 13 + 1).toInt
      def v(x: Int, y: Int) = {
        val x1 = seed * 32 + y + 1
        (((x1 * 2654435761L % 2147483648L / 65536L) *
          (x1 * 1779033703L % 2147483648L / 65536L) % 256L).toInt
          + x * gx) % 256
      }
      val bm = Array.tabulate(64) { k =>
        val bx = k % 8; val by = k / 8
        (for (y <- by * 4 until by * 4 + 4; x <- bx * 4 until bx * 4 + 4)
          yield v(x, y).toLong).sum / 16
      }
      val gm = bm.sum / 64
      var hi = 0L; var lo = 0L
      for (k <- 0 until 64 if bm(k) > gm)
        if (k < 32) hi |= 1L << (31 - k) else lo |= 1L << (63 - k)
      (hi, lo)
    }
    hashes.foreach { case (id, hi, lo) =>
      assert((hi, lo) == formulaHash(id), s"doc $id")
    }
    // hashes vary across gradient classes (non-degenerate fixture)
    assert(hashes.map(h => (h._2, h._3)).distinct.length > 10)
    // banding completeness: banded pairs == brute-force Hamming <= 3
    val got = Multimodal.imageNearDupPairs(
        Multimodal.imageAHash(Multimodal.syntheticGradientPngs(spark, dir)))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSet
    val brute = (for {
      (ia, hia, loa) <- hashes; (ib, hib, lob) <- hashes if ia < ib
      d = java.lang.Long.bitCount(hia ^ hib) +
        java.lang.Long.bitCount(loa ^ lob) if d <= 3
    } yield (ia, ib, d.toLong)).toSet
    assert(brute.nonEmpty, "fixture produced no near-dup pairs — weak")
    assert(got == brute)
    // ids in the same hashed class share every pixel → distance 0
    val zeroPairs = got.filter(_._3 == 0L)
    assert(zeroPairs.exists { case (a, b, _) =>
      dupSeedI(a, 221) == dupSeedI(b, 221) })
  }

  test("audioFingerprint: real WAV round-trip reproduces the envelope " +
    "formula; re-uploaded clips land at distance 0") {
    import graft.functions.Multimodal
    val hashes = Multimodal.audioFingerprint(
      Multimodal.syntheticSteppedWavs(spark, dir))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    def dupSeed(id: Long, mod: Long): Long =
      id % 2147483648L * 2654435761L % 2147483648L % mod
    def formulaHash(id: Long): (Long, Long) = {
      val seed = dupSeed(id, 200)
      val e = Array.tabulate(64) { w =>
        val x = seed * 64 + w + 1
        (x * 2654435761L % 2147483648L / 65536L) *
          (x * 1779033703L % 2147483648L / 65536L) % 8192L + 1
      }
      val gm = e.sum / 64
      var hi = 0L; var lo = 0L
      for (k <- 0 until 64 if e(k) > gm)
        if (k < 32) hi |= 1L << (31 - k) else lo |= 1L << (63 - k)
      (hi, lo)
    }
    hashes.foreach { case (id, hi, lo) =>
      assert((hi, lo) == formulaHash(id), s"doc $id")
    }
    val byId = hashes.map(h => h._1 -> ((h._2, h._3))).toMap
    // re-uploads: ids in the same HASHED dup class carry identical
    // fingerprints (class = dupSeed(id, 200), not raw id % 200 — the
    // hash makes classes id-layout-independent)
    val byClass = byId.keys.groupBy(dupSeed(_, 200))
      .filter(_._2.size > 1)
    assert(byClass.nonEmpty, "fixture produced no re-upload classes")
    byClass.foreach { case (cls, members) =>
      assert(members.map(byId).toSet.size == 1, s"class $cls")
    }
    // band join == brute force at <= 3 (pigeonhole completeness)
    val got = Multimodal.imageNearDupPairs(
        Multimodal.audioFingerprint(
          Multimodal.syntheticSteppedWavs(spark, dir)))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSet
    val brute = (for {
      (ia, hia, loa) <- hashes; (ib, hib, lob) <- hashes if ia < ib
      d = java.lang.Long.bitCount(hia ^ hib) +
        java.lang.Long.bitCount(loa ^ lob) if d <= 3
    } yield (ia, ib, d.toLong)).toSet
    assert(got == brute && brute.nonEmpty)
  }

  test("videoNearDupPairs: re-uploaded videos (same hashed dup class) " +
    "surface at full overlap; matching is frame-hash-join-driven") {
    import graft.functions.Multimodal
    def dupSeed(id: Long, mod: Long): Long =
      id % 2147483648L * 2654435761L % 2147483648L % mod
    val fh = Multimodal.videoFrameHashes(
      Multimodal.syntheticGradientGvids(spark, dir))
    val pairs = Multimodal.videoNearDupPairs(fh)
      .collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getLong(3))).toMap
    // every re-upload pair present at exactly 10000 bp
    val ids = fh.select("doc_id").distinct()
      .collect().map(_.getLong(0)).toSet
    val reuploads = for {
      a <- ids; b <- ids
      if a < b && dupSeed(a, 150) == dupSeed(b, 150)
    } yield (a, b)
    assert(reuploads.nonEmpty)
    reuploads.foreach { p =>
      assert(pairs.get(p).contains(10000L), s"pair $p: ${pairs.get(p)}")
    }
    // frame counts vary 4-6 per the seed formula
    val nf = fh.groupBy("doc_id").count()
      .collect().map(_.getLong(1)).toSet
    assert(nf == Set(4L, 5L, 6L))
  }
}
