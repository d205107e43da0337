package graft.functions

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal columns for training-data pipelines: image/audio/video
  * payloads ride as opaque `binary` columns beside a typed metadata struct;
  * decode / feature-extract / resize / frame-sample are per-partition batch
  * transforms.
  *
  * Codec status: image (PNG, via JDK javax.imageio), audio (16-bit PCM
  * WAV, via JDK javax.sound.sampled), indexed-container frame sampling
  * (GVID: seek + decode only sampled frames) and compressed video
  * (MJPEG in RIFF/AVI — real JDK JPEG codec, idx1 index seek) are REAL
  * encode/decode paths, each oracle-hash-checked end-to-end
  * (q69/q70/q71/q75) — and the GENERIC mixed-kind path
  * (syntheticMediaReal/decodeMedia, q32) dispatches through those real
  * codecs per row. `decodeStub` remains only as the documented
  * pluggable pattern for codecs the JDK lacks (H.264/VP9): same schema
  * contract, partition-batch `mapPartitions` execution — the Scala
  * analogue of arrow-batched pandas UDFs — partitioning, typed schemas.
  *
  * Scale posture: payloads never pass through a shuffle — decode/extract
  * are map-side; only small derived features (embeddings, stats) flow into
  * joins/aggregations downstream.
  */
object Multimodal {

  /** Typed metadata carried beside the payload. */
  case class MediaMeta(kind: String, width: Int, height: Int,
                       sampleRate: Int, durationMs: Long, codec: String)

  case class MediaRow(media_id: Long, kind: String, bytes: Array[Byte],
                      meta: MediaMeta)

  case class DecodedFeatures(media_id: Long, kind: String, n_bytes: Int,
                             mean_intensity: Double, feature: Array[Float])

  case class Frame(media_id: Long, frame_idx: Int, offset_ms: Long,
                   frame_bytes: Array[Byte])

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false),
    StructField("bytes", BinaryType, nullable = false),
    StructField("meta", StructType(Seq(
      StructField("kind", StringType), StructField("width", IntegerType),
      StructField("height", IntegerType), StructField("sampleRate", IntegerType),
      StructField("durationMs", LongType), StructField("codec", StringType))))))

  /** Deterministic fake media table derived from the documents fixture:
    * payload = utf-8 text bytes, metadata derived from doc stats. Lets the
    * full multimodal plumbing run on driver testdata. */
  def syntheticMedia(spark: SparkSession, dir: String): Dataset[MediaRow] = {
    import spark.implicits._
    graft.sources.Tables.fanOut(
        graft.sources.Tables.load(spark, dir, "documents")
          .select(col("doc_id"), col("text"), col("n_chars")),
        col("doc_id"))
      .as[(Long, String, Long)]
      .map { case (id, text, n) =>
        val kind = (id % 3) match {
          case 0 => "image"; case 1 => "audio"; case _ => "video"
        }
        MediaRow(id, kind, text.getBytes("UTF-8"),
          MediaMeta(kind, width = (n % 640).toInt + 1,
            height = (n % 480).toInt + 1, sampleRate = 16000,
            durationMs = n * 10, codec = "stub"))
      }
  }

  /** STUB decode: where a real pipeline would call an image/audio codec on
    * each payload (batched per partition), this derives deterministic
    * "pixel" statistics and a fixed-dim feature vector from the raw bytes.
    * Swap the body for e.g. javax.imageio / ffmpeg bindings in production —
    * the signature, batching shape and output schema stay the same. */
  def decodeStub(bytes: Array[Byte], featureDim: Int): (Double, Array[Float]) = {
    var sum = 0L
    var i = 0
    while (i < bytes.length) { sum += (bytes(i) & 0xff); i += 1 }
    val mean = if (bytes.length == 0) 0.0 else sum.toDouble / bytes.length
    val feat = new Array[Float](featureDim)
    var h = 0x9e3779b9 ^ bytes.length
    i = 0
    while (i < featureDim) {
      h = h * 31 + (if (bytes.length > 0) bytes(i % bytes.length) else 0)
      h ^= h >>> 15
      feat(i) = ((h & 0xffff).toFloat / 65536.0f) - 0.5f
      i += 1
    }
    (mean, feat)
  }

  /** Decode + feature-extract, batched per partition (no shuffle). */
  def decodeFeatures(media: Dataset[MediaRow],
                     featureDim: Int = 16): Dataset[DecodedFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.map { m =>
        val (mean, feat) = decodeStub(m.bytes, featureDim)
        DecodedFeatures(m.media_id, m.kind, m.bytes.length, mean, feat)
      }
    }
  }

  /** STUB resize: a real impl rescales pixels; the stub truncates/pads the
    * payload to the target "resolution" deterministically. */
  def resize(media: Dataset[MediaRow], targetW: Int,
             targetH: Int): Dataset[MediaRow] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.map { m =>
        val target = math.max(1, targetW * targetH / 64)
        val out = java.util.Arrays.copyOf(m.bytes, target)
        m.copy(bytes = out,
          meta = m.meta.copy(width = targetW, height = targetH))
      }
    }
  }

  /** STUB frame-sample: emits one Frame per `everyMs` of duration; a real
    * impl would seek/decode video frames. Flat-maps partition-local — the
    * fan-out never shuffles payload bytes. */
  def sampleFrames(media: Dataset[MediaRow],
                   everyMs: Long): Dataset[Frame] = {
    import media.sparkSession.implicits._
    media.filter(_.kind == "video").mapPartitions { it =>
      it.flatMap { m =>
        val n = math.max(1, (m.meta.durationMs / everyMs).toInt)
        (0 until n).iterator.map { i =>
          val off = i * everyMs
          val start = ((off.toDouble / math.max(1, m.meta.durationMs))
            * m.bytes.length).toInt.min(math.max(0, m.bytes.length - 8))
          Frame(m.media_id, i, off,
            java.util.Arrays.copyOfRange(m.bytes, start,
              math.min(m.bytes.length, start + 8)))
        }
      }
    }
  }

  /** Media stats as a DataFrame query (oracle-checkable: byte length is
    * portable arithmetic). */
  def mediaStats(media: Dataset[MediaRow]): DataFrame =
    media.toDF()
      .groupBy("kind")
      .agg(count(lit(1)).as("n_media"),
        sum(length(col("bytes"))).as("total_bytes"),
        max(col("meta.durationMs")).as("max_duration_ms"))

  // ---------------------------------------------------------------------
  // REAL image codec path (JDK-only javax.imageio — no external libs):
  // the payloads below are genuine PNG bytes and the decode genuinely
  // parses them. The synthetic generator constructs images whose channel
  // statistics are computable in plain SQL (solid RGB derived from the
  // doc row), so the encode→decode→extract ROUND TRIP is oracle-checkable
  // end-to-end: if the codec, the raster walk, or the resize were wrong,
  // the hashes would not match.
  // ---------------------------------------------------------------------

  case class ImageRow(media_id: Long, png: Array[Byte])

  /** Per-partition PNG codec instances: the static `ImageIO.write/read`
    * entry points scan the plugin registry and allocate a fresh
    * writer/reader per image; reusing one instance per task (they are
    * single-threaded by contract, which matches one-instance-per-
    * partition-iterator) removes that per-image overhead. */
  private def newPngWriter(): javax.imageio.ImageWriter =
    javax.imageio.ImageIO.getImageWritersByFormatName("png").next()

  private def newPngReader(): javax.imageio.ImageReader =
    javax.imageio.ImageIO.getImageReadersByFormatName("png").next()

  private def encodePng(writer: javax.imageio.ImageWriter,
                        img: java.awt.image.BufferedImage): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val ios = new javax.imageio.stream.MemoryCacheImageOutputStream(bos)
    writer.setOutput(ios)
    writer.write(img)
    ios.flush()
    bos.toByteArray
  }

  private def decodePng(reader: javax.imageio.ImageReader,
                        bytes: Array[Byte], off: Int,
                        len: Int): java.awt.image.BufferedImage = {
    val iis = new javax.imageio.stream.MemoryCacheImageInputStream(
      new java.io.ByteArrayInputStream(bytes, off, len))
    reader.setInput(iis)
    val img = reader.read(0)
    iis.close()
    img
  }

  case class ImageFeatures(media_id: Long, width: Int, height: Int,
                           mean_r: Double, mean_g: Double, mean_b: Double,
                           thumb_mean: Double)

  // -- perceptual hashing (image dedup) ------------------------------

  /** Deterministic 32×32 grayscale image for doc `id`: per-row hashed
    * base + x-gradient — g(x,y) = (rowHash(seed, y) + x·(seed·7 mod 13
    * + 1)) mod 256 on all three channels, seed = [[dupSeed]](id, m)
    * with m corpus-scaled ([[dupSeedModulus]], base 221; collapses to
    * the historical 221 at small sfs). Docs in the same hashed class
    * share every pixel — the exact/near-duplicate traffic the dedup
    * family exists to catch. The 32 per-row hashed bases give the
    * aHash bit pattern ~2⁵⁶ effective diversity, so cross-class
    * dist≤3 matches are chance-level at any corpus size — the previous
    * pure-gradient formula's hash space was structurally capped at
    * ~221 patterns (gradient directions; the global-mean threshold
    * cancels the id·37 offset), which made the q161 pair output fully
    * QUADRATIC (measured 100.7× pairs for 10× data at the sf10 probe).
    * Each row is still an arithmetic sequence in x, so PNG row filters
    * keep the payload as compressible as the old gradient. The formula
    * is replayed verbatim by the DuckDB oracle, so the REAL PNG
    * encode→decode round-trip sits inside an exactly hash-checked
    * pipeline (the q32 discipline). */
  private def makeGradientPng(writer: javax.imageio.ImageWriter,
                              id: Long, mod: Long): Array[Byte] = {
    val w = 32; val h = 32
    val seed = dupSeed(id, mod)
    val gx = (seed * 7 % 13 + 1).toInt
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val px = new Array[Int](w * h)
    var y = 0
    while (y < h) {
      val x1 = seed * 32 + y + 1
      val base = ((x1 * 2654435761L % 2147483648L / 65536L) *
        (x1 * 1779033703L % 2147483648L / 65536L) % 256L).toInt
      var x = 0
      while (x < w) {
        val v = (base + x * gx) % 256
        px(y * w + x) = (v << 16) | (v << 8) | v
        x += 1
      }
      y += 1
    }
    img.setRGB(0, 0, w, h, px, 0, w)
    encodePng(writer, img)
  }

  /** One gradient PNG per document. Partition-local encode; payload
    * bytes never shuffle. */
  def syntheticGradientPngs(spark: SparkSession,
                            dir: String): Dataset[ImageRow] =
    gradientPngsForIds(
      graft.sources.Tables.fanOut(
          graft.sources.Tables.load(spark, dir, "documents")
            .select(col("doc_id")), col("doc_id"))
        .as[Long](org.apache.spark.sql.Encoders.scalaLong),
      dupSeedModulus(spark, dir, 221L))

  /** Id-parameterized face of the gradient-PNG fixture (the dup-class
    * modulus is explicit): the saturation pins feed synthetic strided
    * id layouts at two sizes and assert the distinct-fingerprint count
    * scales with the class modulus — the invariant whose silent loss
    * made the r13–r15 media pair outputs quadratic. */
  private[graft] def gradientPngsForIds(ids: Dataset[Long],
                                        mod: Long): Dataset[ImageRow] =
    ids.mapPartitions { it =>
      val writer = newPngWriter()
      it.map(id => ImageRow(id, makeGradientPng(writer, id, mod)))
    }(org.apache.spark.sql.Encoders.product[ImageRow])

  /** Average-hash (aHash) of each image via a REAL PNG decode: 8×8
    * block means (integer floor over the 4×4 pixel blocks of the
    * 32×32 frame), global mean of the 64 block means, bit k (row-major
    * MSB-first) = block-mean > global-mean. Packed as two unsigned
    * 32-bit halves in longs so Hamming distance downstream is portable
    * `bit_count(xor)` integer arithmetic on any engine. Pure
    * partition-local codec work. */
  def imageAHash(imgs: Dataset[ImageRow]): org.apache.spark.sql.DataFrame = {
    import imgs.sparkSession.implicits._
    imgs.mapPartitions { it =>
      val reader = newPngReader()
      it.map { row =>
        val img = decodePng(reader, row.png, 0, row.png.length)
        val (hi, lo) = aHashOfGray(img)
        (row.media_id, hi, lo)
      }
    }.toDF("doc_id", "h_hi", "h_lo")
  }

  /** The aHash core over a decoded frame (gray: channels equal — the
    * blue channel reads the value): 8×8 block means, global mean,
    * MSB-first two-halves packing. Shared by the image hash above and
    * the per-frame video hashes below. */
  private def aHashOfGray(img: java.awt.image.BufferedImage): (Long, Long) = {
    val w = img.getWidth; val h = img.getHeight
    val px = img.getRGB(0, 0, w, h, null, 0, w)
    val bw = w / 8; val bh = h / 8
    val bm = new Array[Long](64)
    var k = 0
    while (k < 64) {
      val bx = k % 8; val by = k / 8
      var s = 0L
      var y = by * bh
      while (y < (by + 1) * bh) {
        var x = bx * bw
        while (x < (bx + 1) * bw) {
          s += px(y * w + x) & 0xff
          x += 1
        }
        y += 1
      }
      bm(k) = s / (bw * bh)
      k += 1
    }
    val gm = bm.sum / 64
    var hi = 0L; var lo = 0L
    k = 0
    while (k < 64) {
      if (bm(k) > gm) {
        if (k < 32) hi |= 1L << (31 - k)
        else lo |= 1L << (63 - k)
      }
      k += 1
    }
    (hi, lo)
  }

  /** Gradient-frame GVID container for doc `id`: seed = dupSeed(id, 150·scale)
    * (re-uploaded videos — same hashed dup class — share every frame), frame count seed%3+4,
    * frame f a 32×32 gradient keyed by k = seed·31 + f (the PNG
    * gradient formula). Same container layout as the solid GVID. */
  private def makeGradientGvid(writer: javax.imageio.ImageWriter,
                               id: Long, mod: Long): Array[Byte] = {
    val seed = dupSeed(id, mod)
    val nf = (seed % 3).toInt + 4
    val frames = (0 until nf).map { f =>
      val k = seed * 31 + f
      val gx = (k * 7 % 13 + 1).toInt
      val gy = (k * 11 % 17 + 1).toInt
      val img = new java.awt.image.BufferedImage(32, 32,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      val px = new Array[Int](32 * 32)
      var y = 0
      while (y < 32) {
        var x = 0
        while (x < 32) {
          // the x·y·(k%29) term keeps the aHash space growing with the
          // frame-key range: the pure planar gradient's hash space is
          // structurally bounded (~(13 gx)·(17 gy)·wraps ≈ 18k distinct
          // over 75k keys, measured), which made frame-hash buckets —
          // and the near-dup pair join — quadratic at 100× corpus no
          // matter how dupSeedModulus scaled the classes
          val v = ((x.toLong * gx + y.toLong * gy + k * 37 +
            x.toLong * y * (k % 29)) % 256).toInt
          px(y * 32 + x) = (v << 16) | (v << 8) | v
          x += 1
        }
        y += 1
      }
      img.setRGB(0, 0, 32, 32, px, 0, 32)
      encodePng(writer, img)
    }
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeInt(GvidMagic)
    out.writeInt(nf)
    frames.foreach(fb => out.writeInt(fb.length))
    frames.foreach(out.write)
    out.flush()
    bos.toByteArray
  }

  /** Corpus-scaled duplicate-class modulus for the synthetic media
    * fixtures: `base × max(1, ⌊n_docs/5000⌋)`, so a re-upload CLASS
    * stays ~(5000/base) members at ANY corpus size — the realistic
    * shape (the dup RATE of real traffic is constant; class size does
    * not grow with corpus). A fixed modulus made class membership —
    * and therefore the near-dup PAIR OUTPUT, which is Σ C(|class|,2) —
    * quadratic in corpus size (the r13 sf1 run measured q165 at 14.6×
    * for 10× data on pair volume alone). Collapses to `base` at every
    * oracle-checked sf (≤ 5000 docs); the IDENTICAL rule is inlined in
    * audioPackCtes/videoPackCtes (the scaledSeedCutoff discipline). */
  def dupSeedModulus(spark: SparkSession, dir: String, base: Long): Long =
    base * math.max(1L,
      graft.sources.Tables.load(spark, dir, "documents").count() / 5000L)

  /** Dup-class seed of a doc id: HASH the id before the class modulus.
    * A raw `id % m` assumes ids are dense over a range ≫ m — on a
    * replica-strided tree (blocks of ~5k ids spaced 10⁸ apart) the
    * stride is a multiple of every corpus-scaled m past the block
    * size, so all replicas collapse onto the block's residues: class
    * size grows WITH the corpus and the near-dup pair output
    * (Σ C(|class|,2)) turns quadratic however m scales — the r15 sf10
    * probe measured q163 at 4× its intended pair volume from exactly
    * this. `x·c mod 2³¹` is a BIJECTION on [0, 2³¹) for odd c, so the
    * hashed ids spread uniformly over the classes no matter how the
    * raw ids cluster. The `id % 2³¹` pre-fold keeps the product inside
    * Long/BIGINT (strided ids reach ~10¹⁰) and is collision-free for
    * any realistic stride (collisions need ids 2³¹ apart). Replayed
    * verbatim in audioPackCtes/videoPackCtes. */
  private def dupSeed(id: Long, mod: Long): Long =
    id % 2147483648L * 2654435761L % 2147483648L % mod

  /** SQL replay of [[dupSeed]] for the pack CTEs. */
  private[graft] def dupSeedSql(modSql: String): String =
    s"doc_id % 2147483648 * 2654435761 % 2147483648 % ($modSql)"

  /** One gradient GVID per document. Partition-local encode. */
  def syntheticGradientGvids(spark: SparkSession,
                             dir: String): Dataset[VideoRow] =
    gradientGvidsForIds(
      graft.sources.Tables.fanOut(
          graft.sources.Tables.load(spark, dir, "documents")
            .select(col("doc_id")), col("doc_id"))
        .as[Long](org.apache.spark.sql.Encoders.scalaLong),
      dupSeedModulus(spark, dir, 150L))

  /** Id-parameterized face of the gradient-GVID fixture — see
    * [[gradientPngsForIds]] for why the saturation pins need it. */
  private[graft] def gradientGvidsForIds(ids: Dataset[Long],
                                         mod: Long): Dataset[VideoRow] =
    ids.mapPartitions { it =>
      val writer = newPngWriter()
      it.map(id => VideoRow(id, makeGradientGvid(writer, id, mod)))
    }(org.apache.spark.sql.Encoders.product[VideoRow])

  /** Per-frame aHash of every frame in each container (REAL parse +
    * PNG decode): (doc_id, frame_idx, h_hi, h_lo). The frame-hash
    * table is the video DEDUP index — near-dup matching joins on the
    * hash value (inverted-index style), never on video pairs. */
  def videoFrameHashes(vids: Dataset[VideoRow]): org.apache.spark.sql.DataFrame = {
    import vids.sparkSession.implicits._
    vids.mapPartitions { it =>
      val reader = newPngReader()
      it.flatMap { row =>
        val in = new java.io.DataInputStream(
          new java.io.ByteArrayInputStream(row.gvid))
        require(in.readInt() == GvidMagic, "not a GVID container")
        val nf = in.readInt()
        val lens = Array.fill(nf)(in.readInt())
        var off = 8 + 4 * nf
        (0 until nf).map { f =>
          val img = decodePng(reader, row.gvid, off, lens(f))
          off += lens(f)
          val (hi, lo) = aHashOfGray(img)
          (row.media_id, f.toLong, hi, lo)
        }
      }
    }.toDF("doc_id", "frame_idx", "h_hi", "h_lo")
  }

  /** Video near-duplicate pairs from the frame-hash table: videos
    * sharing at least `minOverlapBp` of the smaller side's DISTINCT
    * frame hashes. One equi-join on the hash value generates
    * candidates (only videos sharing an actual frame ever meet — the
    * inverted-index discipline), then exact distinct-overlap counting
    * and the containment-style ratio. */
  def videoNearDupPairs(frameHashes: org.apache.spark.sql.DataFrame,
                        minOverlapBp: Int = 5000): org.apache.spark.sql.DataFrame = {
    val fh = frameHashes.select(col("doc_id"),
      concat_ws(":", col("h_hi"), col("h_lo")).as("hk")).distinct()
    val counts = fh.groupBy("doc_id").agg(count(lit(1)).as("nf"))
    val a = fh.select(col("doc_id").as("id_a"), col("hk"))
    val b = fh.select(col("doc_id").as("id_b"), col("hk"))
    a.join(b, Seq("hk")).filter(col("id_a") < col("id_b"))
      .groupBy("id_a", "id_b").agg(count(lit(1)).as("n_shared"))
      .join(counts.select(col("doc_id").as("id_a"), col("nf").as("nfa")),
        Seq("id_a"))
      .join(counts.select(col("doc_id").as("id_b"), col("nf").as("nfb")),
        Seq("id_b"))
      .withColumn("overlap_bp",
        floor(col("n_shared") * lit(10000.0) /
          least(col("nfa"), col("nfb"))).cast("long"))
      .filter(col("overlap_bp") >= minOverlapBp)
      .select("id_a", "id_b", "n_shared", "overlap_bp")
  }

  /** Deterministic amplitude-stepped PCM clip for doc `id`: 4096
    * frames of a square carrier whose magnitude changes per 64-sample
    * window — a(w) = Knuth-hash(seed·64 + w) folded to (0, 8192], with
    * seed = [[dupSeed]](id, m) (m corpus-scaled, see [[dupSeedModulus]]; 200 at
    * oracle-checked sfs). The seed fold models RE-UPLOADED clips (ids
    * congruent mod m carry identical audio — the duplicate traffic the
    * fingerprint family exists to catch).
    *
    * The per-window energy is a MULTIPLICATIVE HASH of (seed, w), not
    * a polynomial envelope: every polynomial-in-seed envelope the
    * family tried (arithmetic step r13, quadratic curvature r14,
    * corpus-scaled curvature r15) re-saturated at the next scale tier,
    * because its w-coefficients live mod 8192 and the mean threshold
    * cancels the seed offset — seeds collide (or land hamming-≤3
    * close) once they pack the coefficient space, making cross-class
    * pair output quadratic again (the sf10 probe measured 41× pairs
    * for 10× data even with corpus-scaled curvature). Hashed energies
    * behave like random 64-bit fingerprints: P(dist ≤ 3) between
    * distinct seeds ≈ 4·10⁻¹⁵, so the near-dup output is the exact
    * dup-class pair count — linear at every scale. Same oracle
    * discipline as the gradient PNGs: the formula is replayed in SQL,
    * the REAL WAV encode→decode round-trip sits inside the hash
    * check. */
  private def makeSteppedWav(id: Long, mod: Long): Array[Byte] = {
    val seed = dupSeed(id, mod)
    val frames = 4096
    val pcm = new Array[Byte](frames * 2)
    var i = 0
    while (i < frames) {
      val w = i / 64
      // Product of two independent Knuth extractions — the mix must be
      // NONLINEAR in (seed, w): a single multiply-fold is affine, so
      // the mean threshold cancels the per-seed base and every seed
      // lands in one wrap-phase family (measured 64 distinct patterns
      // for 200 seeds). Multiplying the two 15-bit high-bit
      // extractions breaks the linearity; measured 20 000/20 000
      // distinct fingerprints and 0 dist≤3 hits in 2M sampled cross-
      // seed pairs. x ≤ ~1.3e8 at the 100× tier, x·c ≈ 3.4e17 and
      // m1·m2 < 2³⁰ — every intermediate fits Long/BIGINT exactly.
      val x = seed * 64 + w + 1
      val m1 = x * 2654435761L % 2147483648L / 65536L
      val m2 = x * 1779033703L % 2147483648L / 65536L
      val a = (m1 * m2 % 8192L).toInt + 1
      val s = if (i % 2 == 0) a else -a
      pcm(2 * i) = (s & 0xff).toByte
      pcm(2 * i + 1) = ((s >> 8) & 0xff).toByte
      i += 1
    }
    val fmt = new javax.sound.sampled.AudioFormat(16000f, 16, 1,
      true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, frames.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  /** One stepped-envelope WAV per document. Partition-local encode. */
  def syntheticSteppedWavs(spark: SparkSession,
                           dir: String): Dataset[AudioRow] =
    steppedWavsForIds(
      graft.sources.Tables.fanOut(
          graft.sources.Tables.load(spark, dir, "documents")
            .select(col("doc_id")), col("doc_id"))
        .as[Long](org.apache.spark.sql.Encoders.scalaLong),
      dupSeedModulus(spark, dir, 200L))

  /** Id-parameterized face of the stepped-WAV fixture — see
    * [[gradientPngsForIds]] for why the saturation pins need it. */
  private[graft] def steppedWavsForIds(ids: Dataset[Long],
                                       mod: Long): Dataset[AudioRow] =
    ids.mapPartitions(_.map(id => AudioRow(id, makeSteppedWav(id, mod))))(
      org.apache.spark.sql.Encoders.product[AudioRow])

  /** Energy fingerprint of each clip via a REAL WAV decode: mean
    * absolute amplitude per 64-sample window (integer floor), 64
    * windows, bit w = window energy > global mean — the audio face of
    * [[imageAHash]], packed identically as two unsigned 32-bit halves
    * so [[imageNearDupPairs]]' band join matches clips unchanged. */
  def audioFingerprint(clips: Dataset[AudioRow]): org.apache.spark.sql.DataFrame = {
    import clips.sparkSession.implicits._
    clips.mapPartitions { it =>
      it.map { row =>
        val ais = openWav(row.wav)
        val frames = ais.getFrameLength.toInt
        val bytes = ais.readAllBytes()
        ais.close()
        val nWin = 64
        val perWin = frames / nWin
        val e = new Array[Long](nWin)
        var w = 0
        while (w < nWin) {
          var s = 0L
          var i = w * perWin
          while (i < (w + 1) * perWin) {
            val lo = bytes(2 * i) & 0xff
            val hi = bytes(2 * i + 1).toInt
            s += math.abs((hi << 8) | lo)
            i += 1
          }
          e(w) = s / perWin
          w += 1
        }
        val gm = e.sum / nWin
        var hi0 = 0L; var lo0 = 0L
        w = 0
        while (w < nWin) {
          if (e(w) > gm) {
            if (w < 32) hi0 |= 1L << (31 - w)
            else lo0 |= 1L << (63 - w)
          }
          w += 1
        }
        (row.media_id, hi0, lo0)
      }
    }.toDF("doc_id", "h_hi", "h_lo")
  }

  /** Banded near-duplicate image pairs over the aHash: the 64-bit hash
    * splits into four 16-bit bands; candidate pairs share at least one
    * band, then verify exact Hamming distance ≤ `maxDist`. For
    * maxDist ≤ 3 the banding is COMPLETE by pigeonhole (≤3 differing
    * bits across 4 bands leave at least one band identical), so the
    * blocking-free oracle certifies zero missed pairs — the LSH-band
    * discipline of the text near-dup family applied to images. */
  def imageNearDupPairs(hashes: org.apache.spark.sql.DataFrame,
                        maxDist: Int = 3): org.apache.spark.sql.DataFrame = {
    require(maxDist >= 0 && maxDist <= 3,
      s"banding is only provably complete for maxDist <= 3, got $maxDist")
    val banded = hashes.select(col("doc_id"), col("h_hi"), col("h_lo"),
      explode(array(
        struct(lit(0).as("b"), shiftrightunsigned(col("h_hi"), 16).as("v")),
        struct(lit(1).as("b"), (col("h_hi").bitwiseAND(0xffffL)).as("v")),
        struct(lit(2).as("b"), shiftrightunsigned(col("h_lo"), 16).as("v")),
        struct(lit(3).as("b"), (col("h_lo").bitwiseAND(0xffffL)).as("v"))))
        .as("band"))
    val a = banded.select(col("doc_id").as("id_a"),
      col("h_hi").as("hi_a"), col("h_lo").as("lo_a"),
      col("band.b").as("b"), col("band.v").as("v"))
    val b = banded.select(col("doc_id").as("id_b"),
      col("h_hi").as("hi_b"), col("h_lo").as("lo_b"),
      col("band.b").as("b"), col("band.v").as("v"))
    a.join(b, Seq("b", "v"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b", "hi_a", "lo_a", "hi_b", "lo_b").distinct()
      .withColumn("dist",
        bit_count(col("hi_a").bitwiseXOR(col("hi_b"))) +
          bit_count(col("lo_a").bitwiseXOR(col("lo_b"))))
      .filter(col("dist") <= maxDist)
      .select(col("id_a"), col("id_b"), col("dist").cast("long").as("dist"))
  }

  /** Solid-RGB frame for (id, n) — the shared payload builder: bulk fill
    * (per-pixel setRGB costs a colormodel conversion per call and
    * dominated the encode at bench scale). */
  private def makePngPayload(writer: javax.imageio.ImageWriter,
                             id: Long, n: Long): Array[Byte] = {
    val w = (n % 64).toInt + 8
    val h = (n % 48).toInt + 8
    val rgb = (((id * 37) % 256).toInt << 16) |
      (((id * 53) % 256).toInt << 8) | ((id * 71) % 256).toInt
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val g = img.createGraphics()
    g.setColor(new java.awt.Color(rgb))
    g.fillRect(0, 0, w, h)
    g.dispose()
    encodePng(writer, img)
  }

  /** Real PNG payloads: one solid-RGB image per document, dimensions and
    * color derived from the row (width = n_chars%64+8, height =
    * n_chars%48+8, channel c = (doc_id·k_c) mod 256). Encoding runs
    * partition-local; payload bytes never shuffle. */
  def syntheticPngs(spark: SparkSession, dir: String): Dataset[ImageRow] = {
    import spark.implicits._
    graft.sources.Tables.fanOut(
        graft.sources.Tables.load(spark, dir, "documents")
          .select(col("doc_id"), col("n_chars")), col("doc_id"))
      .as[(Long, Long)]
      .mapPartitions { it =>
        val writer = newPngWriter()
        it.map { case (id, n) => ImageRow(id, makePngPayload(writer, id, n)) }
      }
  }

  /** Real decode + feature-extract: parse the PNG, walk the raster for
    * per-channel means, and resize to a thumbSize² thumbnail (area-style
    * smooth scaling) whose grey mean is the resize check. Partition-local
    * mapPartitions — the scale shape for codec work: payloads decode where
    * they are scanned, only small features flow on. */
  def decodePngs(imgs: Dataset[ImageRow],
                 thumbSize: Int = 4): Dataset[ImageFeatures] = {
    import imgs.sparkSession.implicits._
    imgs.mapPartitions { it =>
      val reader = newPngReader()
      it.map { row =>
        val img = decodePng(reader, row.png, 0, row.png.length)
        val (w, h) = (img.getWidth, img.getHeight)
        // bulk raster fetch (one array copy) instead of per-pixel getRGB
        val pixels = img.getRGB(0, 0, w, h, null, 0, w)
        var (sr, sg, sb) = (0L, 0L, 0L)
        var i = 0
        while (i < pixels.length) {
          val p = pixels(i)
          sr += (p >> 16) & 0xff; sg += (p >> 8) & 0xff; sb += p & 0xff
          i += 1
        }
        val n = w.toLong * h
        val thumb = new java.awt.image.BufferedImage(thumbSize, thumbSize,
          java.awt.image.BufferedImage.TYPE_INT_RGB)
        val g = thumb.createGraphics()
        g.setRenderingHint(
          java.awt.RenderingHints.KEY_INTERPOLATION,
          java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
        g.drawImage(img, 0, 0, thumbSize, thumbSize, null)
        g.dispose()
        var ts = 0L
        var ty = 0
        while (ty < thumbSize) {
          var tx = 0
          while (tx < thumbSize) {
            val p = thumb.getRGB(tx, ty)
            ts += ((p >> 16) & 0xff) + ((p >> 8) & 0xff) + (p & 0xff)
            tx += 1
          }
          ty += 1
        }
        ImageFeatures(row.media_id, w, h,
          sr.toDouble / n, sg.toDouble / n, sb.toDouble / n,
          ts.toDouble / (3L * thumbSize * thumbSize))
      }
    }
  }

  // REAL audio codec path (JDK-only javax.sound.sampled): genuine 16-bit
  // PCM WAV payloads, genuinely parsed back through AudioSystem. Like the
  // PNG path, the generator makes waveforms whose decoded statistics are
  // computable in plain SQL (a constant-amplitude square wave), so the
  // encode→parse→sample-walk round trip is oracle-checkable. Video remains
  // the one stubbed kind — the JDK ships no video codec.

  case class AudioRow(media_id: Long, wav: Array[Byte])

  case class AudioFeatures(media_id: Long, sample_rate: Int, n_frames: Long,
                           mean_abs: Double, peak: Int)

  /** Real WAV payloads: one mono 16-bit PCM clip per document at 16 kHz;
    * n_frames = n_chars + 64, alternating ±amplitude square wave with
    * amplitude = (doc_id·97) mod 8192 + 1. Encoding is partition-local. */
  def syntheticWavs(spark: SparkSession, dir: String): Dataset[AudioRow] = {
    import spark.implicits._
    graft.sources.Tables.fanOut(
        graft.sources.Tables.load(spark, dir, "documents")
          .select(col("doc_id"), col("n_chars")), col("doc_id"))
      .as[(Long, Long)]
      .mapPartitions { it =>
        it.map { case (id, n) => AudioRow(id, makeWavPayload(id, n)) }
      }
  }

  /** Square-wave 16-bit PCM WAV for (id, n) — the shared payload builder. */
  private def makeWavPayload(id: Long, n: Long): Array[Byte] = {
    val frames = (n + 64).toInt
    val amp = ((id * 97) % 8192).toInt + 1
    val pcm = new Array[Byte](frames * 2)
    var i = 0
    while (i < frames) {
      val s = if (i % 2 == 0) amp else -amp
      pcm(2 * i) = (s & 0xff).toByte          // little-endian
      pcm(2 * i + 1) = ((s >> 8) & 0xff).toByte
      i += 1
    }
    val fmt = new javax.sound.sampled.AudioFormat(16000f, 16, 1,
      true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, frames.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  /** The WAV AudioFileReader SPI provider, resolved ONCE per JVM — the
    * same genuine JDK codec AudioSystem.getAudioInputStream returns,
    * minus that entry point's per-CALL synchronized provider-registry
    * scan, which serializes a 32-thread decode stage (the r13 sf1 run
    * measured q70 at ~28× for 10× data; the decode loop itself is
    * linear). Probed against a real 1-frame WAV so provider ORDER never
    * matters; readers are stateless, so one instance is thread-safe to
    * share across partitions. Falls back to the AudioSystem path if the
    * SPI enumeration ever comes up empty (exotic JVM). */
  private lazy val wavReader: Option[javax.sound.sampled.spi.AudioFileReader] = {
    val probe = makeWavPayload(0L, -63L) // 1 frame, smallest real clip
    val it = java.util.ServiceLoader
      .load(classOf[javax.sound.sampled.spi.AudioFileReader]).iterator()
    var found: Option[javax.sound.sampled.spi.AudioFileReader] = None
    while (found.isEmpty && it.hasNext) {
      val r = it.next()
      try {
        r.getAudioInputStream(new java.io.ByteArrayInputStream(probe))
          .close()
        found = Some(r)
      } catch { case scala.util.control.NonFatal(_) => () }
    }
    found
  }

  /** Open a WAV payload through the once-resolved reader (the hot-path
    * entry every per-row decode must use instead of
    * AudioSystem.getAudioInputStream). */
  private def openWav(bytes: Array[Byte])
      : javax.sound.sampled.AudioInputStream = {
    val in = new java.io.ByteArrayInputStream(bytes)
    wavReader match {
      case Some(r) => r.getAudioInputStream(in)
      case None => javax.sound.sampled.AudioSystem.getAudioInputStream(in)
    }
  }

  /** Real WAV parse + sample statistics: AudioSystem reads the header
    * (format, frame count) and streams the PCM frames; we fold mean
    * absolute amplitude and peak over the samples. Partition-local like
    * every codec stage — only the small feature row flows on. */
  def decodeWavs(clips: Dataset[AudioRow]): Dataset[AudioFeatures] = {
    import clips.sparkSession.implicits._
    clips.mapPartitions { it =>
      it.map { row =>
        val ais = openWav(row.wav)
        val fmt = ais.getFormat
        val frames = ais.getFrameLength
        val bytes = ais.readAllBytes()
        var (sumAbs, peak) = (0L, 0)
        var i = 0
        while (i + 1 < bytes.length) {
          val s = ((bytes(i) & 0xff) | (bytes(i + 1) << 8)).toShort.toInt
          val a = math.abs(s)
          sumAbs += a
          if (a > peak) peak = a
          i += 2
        }
        AudioFeatures(row.media_id, fmt.getSampleRate.toInt, frames,
          sumAbs.toDouble / frames, peak)
      }
    }
  }

  // REAL frame sampling over an indexed video container. The JDK ships no
  // H.264/VP9 codec, so the container is a deliberately simple one of our
  // own ("GVID": magic, frame count, per-frame byte lengths, then PNG
  // frames back-to-back — a real deployment swaps in ffmpeg bindings
  // behind the same signatures). The OPERATION is the real thing though:
  // parse the header index, SEEK to just the sampled frames, and decode
  // only those through the genuine PNG codec — non-sampled frames are
  // never decompressed, which is the property that makes frame sampling
  // affordable over petabytes of video.

  case class VideoRow(media_id: Long, gvid: Array[Byte])

  case class VideoFrame(media_id: Long, frame_idx: Int, width: Int,
                        height: Int, mean_r: Double, mean_g: Double,
                        mean_b: Double)

  private val GvidMagic = 0x47564944 // "GVID"

  /** Real GVID payloads: n_chars%5+2 solid-RGB PNG frames per document,
    * per-frame color drifting with the frame index (so a wrong seek or a
    * misread index produces wrong, hash-detectable colors). */
  def syntheticGvids(spark: SparkSession, dir: String): Dataset[VideoRow] = {
    import spark.implicits._
    graft.sources.Tables.fanOut(
        graft.sources.Tables.load(spark, dir, "documents")
          .select(col("doc_id"), col("n_chars")), col("doc_id"))
      .as[(Long, Long)]
      .mapPartitions { it =>
        val writer = newPngWriter()
        it.map { case (id, n) => VideoRow(id, makeGvidPayload(writer, id, n)) }
      }
  }

  /** GVID container for (id, n) — the shared payload builder. */
  private def makeGvidPayload(writer: javax.imageio.ImageWriter,
                              id: Long, n: Long): Array[Byte] = {
    val w = (n % 32).toInt + 8
    val h = (n % 24).toInt + 8
    val nf = (n % 5).toInt + 2
    val frames = (0 until nf).map { f =>
      val rgb = (((id * 37 + f * 11) % 256).toInt << 16) |
        (((id * 53 + f * 13) % 256).toInt << 8) |
        ((id * 71 + f * 17) % 256).toInt
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      val g = img.createGraphics()
      g.setColor(new java.awt.Color(rgb))
      g.fillRect(0, 0, w, h)
      g.dispose()
      encodePng(writer, img)
    }
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeInt(GvidMagic)
    out.writeInt(nf)
    frames.foreach(fb => out.writeInt(fb.length))
    frames.foreach(out.write)
    out.flush()
    bos.toByteArray
  }

  /** Real frame sampling: parse the container index, seek to every
    * `every`-th frame, decode ONLY those frames (PNG), emit per-frame
    * channel means. Partition-local flatMap; payload bytes never
    * shuffle and skipped frames are never decompressed. */
  def sampleGvidFrames(vids: Dataset[VideoRow],
                       every: Int): Dataset[VideoFrame] = {
    require(every > 0, s"every must be positive, got $every")
    import vids.sparkSession.implicits._
    vids.mapPartitions { it =>
      val reader = newPngReader()
      it.flatMap { v =>
        val in = new java.io.DataInputStream(
          new java.io.ByteArrayInputStream(v.gvid))
        require(in.readInt() == GvidMagic, "not a GVID container")
        val nf = in.readInt()
        val lens = Array.fill(nf)(in.readInt())
        val offsets = lens.scanLeft(8 + 4 * nf)(_ + _)
        (0 until nf).iterator.filter(_ % every == 0).map { f =>
          val img = decodePng(reader, v.gvid, offsets(f), lens(f))
          val (w, h) = (img.getWidth, img.getHeight)
          val pixels = img.getRGB(0, 0, w, h, null, 0, w)
          var (sr, sg, sb) = (0L, 0L, 0L)
          var i = 0
          while (i < pixels.length) {
            val p = pixels(i)
            sr += (p >> 16) & 0xff; sg += (p >> 8) & 0xff; sb += p & 0xff
            i += 1
          }
          val n = w.toLong * h
          VideoFrame(v.media_id, f, w, h,
            sr.toDouble / n, sg.toDouble / n, sb.toDouble / n)
        }
      }
    }
  }

  // ---------------------------------------------------------------------
  // REAL compressed video: MJPEG in a REAL AVI container (RIFF), pure
  // JDK. MJPEG-AVI is an actual production format (many cameras and
  // capture pipelines emit it) and the JDK ships a genuine JPEG codec —
  // so unlike GVID this is an industry container AND a lossy DCT codec,
  // end to end, with zero external libraries. The muxer writes standard
  // RIFF 'AVI ' structure (hdrl with avih/strh/strf, movi with 00dc
  // chunks, idx1 index); the demuxer walks TOP-LEVEL chunks only, finds
  // the idx1 index without touching movi data, and seeks straight to the
  // sampled frames — skipped frames are never Huffman-decoded. H.264/VP9
  // would need an external decoder (no JDK codec exists); it would slot
  // behind these exact signatures.
  //
  // Oracle-gating split: frame DIMENSIONS survive JPEG exactly (they
  // come out of the real SOF parse), and they drift per frame index —
  // so (media_id, frame_idx, width, height) is hash-checkable in SQL
  // and a wrong seek produces wrong dims. Channel means are DCT-lossy
  // (deterministic, but not SQL-derivable), so they are pinned by a
  // tolerance spec instead (MultimodalSpec).
  // ---------------------------------------------------------------------

  case class AviRow(media_id: Long, avi: Array[Byte])

  case class AviFrame(media_id: Long, frame_idx: Int, width: Int,
                      height: Int, mean_r: Double, mean_g: Double,
                      mean_b: Double)

  private def newJpegWriter(): javax.imageio.ImageWriter =
    javax.imageio.ImageIO.getImageWritersByFormatName("jpeg").next()

  private def newJpegReader(): javax.imageio.ImageReader =
    javax.imageio.ImageIO.getImageReadersByFormatName("jpeg").next()

  /** Per-frame geometry: drifts with the frame index so a wrong seek or
    * a misread index yields hash-detectably wrong dimensions. */
  private def aviFrameDims(nChars: Long, f: Int): (Int, Int) =
    (((nChars % 32) + 8).toInt + f, ((nChars % 24) + 8).toInt + f % 3)

  private def wle32(bos: java.io.ByteArrayOutputStream, v: Int): Unit = {
    bos.write(v & 0xff); bos.write((v >> 8) & 0xff)
    bos.write((v >> 16) & 0xff); bos.write((v >> 24) & 0xff)
  }
  private def wtag(bos: java.io.ByteArrayOutputStream, s: String): Unit =
    s.foreach(c => bos.write(c.toInt))

  /** Minimal standard-conformant MJPEG-AVI muxer: RIFF('AVI ') →
    * LIST hdrl (avih + LIST strl(strh 'vids'/'MJPG' + strf BITMAPINFO)) →
    * LIST movi ('00dc' chunks, even-padded) → idx1 (keyframe entries,
    * offsets relative to the 'movi' fourcc — the classic convention). */
  private def muxAvi(frames: Seq[Array[Byte]], w0: Int, h0: Int,
                     fps: Int): Array[Byte] = {
    val nf = frames.size
    def chunk(tag: String, payload: Array[Byte]): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      wtag(bos, tag); wle32(bos, payload.length); bos.write(payload)
      if (payload.length % 2 == 1) bos.write(0)
      bos.toByteArray
    }
    def list(ltype: String, payload: Array[Byte]): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      wtag(bos, "LIST"); wle32(bos, payload.length + 4); wtag(bos, ltype)
      bos.write(payload)
      bos.toByteArray
    }
    val maxLen = frames.map(_.length).max
    val avih = { // MainAVIHeader, 56 bytes
      val b = new java.io.ByteArrayOutputStream()
      wle32(b, 1000000 / fps)   // dwMicroSecPerFrame
      wle32(b, maxLen * fps)    // dwMaxBytesPerSec
      wle32(b, 0)               // dwPaddingGranularity
      wle32(b, 0x10)            // dwFlags: AVIF_HASINDEX
      wle32(b, nf); wle32(b, 0) // totalFrames, initialFrames
      wle32(b, 1)               // streams
      wle32(b, maxLen)          // suggestedBufferSize
      wle32(b, w0); wle32(b, h0)
      (0 until 4).foreach(_ => wle32(b, 0)) // reserved
      b.toByteArray
    }
    val strh = { // AVIStreamHeader, 56 bytes
      val b = new java.io.ByteArrayOutputStream()
      wtag(b, "vids"); wtag(b, "MJPG")
      wle32(b, 0); wle32(b, 0)  // flags, prio+language
      wle32(b, 0)               // initialFrames
      wle32(b, 1); wle32(b, fps)// scale, rate → fps
      wle32(b, 0); wle32(b, nf) // start, length (frames)
      wle32(b, maxLen)          // suggestedBufferSize
      wle32(b, -1)              // quality (default)
      wle32(b, 0)               // sampleSize (0 = varies)
      wle32(b, (h0 << 16) | w0) // rcFrame right/bottom packed
      wle32(b, 0)
      b.toByteArray
    }
    val strf = { // BITMAPINFOHEADER, 40 bytes
      val b = new java.io.ByteArrayOutputStream()
      wle32(b, 40); wle32(b, w0); wle32(b, h0)
      wle32(b, (24 << 16) | 1)  // planes=1, bitCount=24
      wtag(b, "MJPG")           // biCompression
      wle32(b, w0 * h0 * 3)     // biSizeImage (nominal)
      wle32(b, 0); wle32(b, 0); wle32(b, 0); wle32(b, 0)
      b.toByteArray
    }
    val hdrl = list("hdrl", chunk("avih", avih) ++
      list("strl", chunk("strh", strh) ++ chunk("strf", strf)))
    // movi chunks + idx1 entries (offset → position of the chunk's ckid
    // measured from the 'movi' fourcc itself)
    val moviBody = new java.io.ByteArrayOutputStream()
    val idx = new java.io.ByteArrayOutputStream()
    var off = 4 // first ckid sits right after the 'movi' fourcc
    frames.foreach { fb =>
      wtag(idx, "00dc"); wle32(idx, 0x10) // AVIIF_KEYFRAME
      wle32(idx, off); wle32(idx, fb.length)
      val ck = chunk("00dc", fb)
      moviBody.write(ck)
      off += ck.length
    }
    val movi = list("movi", moviBody.toByteArray)
    val body = hdrl ++ movi ++ chunk("idx1", idx.toByteArray)
    val out = new java.io.ByteArrayOutputStream()
    wtag(out, "RIFF"); wle32(out, body.length + 4); wtag(out, "AVI ")
    out.write(body)
    out.toByteArray
  }

  /** Real MJPEG-AVI payloads: n_chars%5+2 solid-RGB JPEG frames per
    * document, per-frame DIMENSIONS and color drifting with the frame
    * index. Encoding (DCT + Huffman, the real JDK JPEG writer) and
    * muxing are partition-local. */
  def syntheticMjpegAvis(spark: SparkSession, dir: String): Dataset[AviRow] = {
    import spark.implicits._
    graft.sources.Tables.fanOut(
        graft.sources.Tables.load(spark, dir, "documents")
          .select(col("doc_id"), col("n_chars")), col("doc_id"))
      .as[(Long, Long)]
      .mapPartitions { it =>
        val writer = newJpegWriter()
        it.map { case (id, n) =>
          val nf = (n % 5).toInt + 2
          val frames = (0 until nf).map { f =>
            val (w, h) = aviFrameDims(n, f)
            val rgb = (((id * 37 + f * 11) % 256).toInt << 16) |
              (((id * 53 + f * 13) % 256).toInt << 8) |
              ((id * 71 + f * 17) % 256).toInt
            val img = new java.awt.image.BufferedImage(w, h,
              java.awt.image.BufferedImage.TYPE_INT_RGB)
            val g = img.createGraphics()
            g.setColor(new java.awt.Color(rgb))
            g.fillRect(0, 0, w, h)
            g.dispose()
            encodePng(writer, img) // generic ImageWriter encode — JPEG here
          }
          val (w0, h0) = aviFrameDims(n, 0)
          AviRow(id, muxAvi(frames, w0, h0, fps = 25))
        }
      }
  }

  /** Real AVI frame sampling: walk TOP-LEVEL RIFF chunks to find movi +
    * idx1 (movi data is never scanned), then for every `every`-th index
    * entry seek directly to its 00dc chunk and decode just that JPEG.
    * Partition-local flatMap; payload bytes never shuffle; skipped
    * frames are never entropy-decoded. */
  def sampleAviFrames(avis: Dataset[AviRow], every: Int): Dataset[AviFrame] = {
    require(every > 0, s"every must be positive, got $every")
    import avis.sparkSession.implicits._
    avis.mapPartitions { it =>
      val reader = newJpegReader()
      it.flatMap { v =>
        val b = v.avi
        def le32(o: Int): Int = (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8) |
          ((b(o + 2) & 0xff) << 16) | ((b(o + 3) & 0xff) << 24)
        def tag(o: Int): String =
          new String(b, o, 4, java.nio.charset.StandardCharsets.US_ASCII)
        require(tag(0) == "RIFF" && tag(8) == "AVI ", "not an AVI file")
        var pos = 12
        var moviPos = -1
        var idxPos = -1
        var idxLen = 0
        while (pos + 8 <= b.length) {
          val t = tag(pos)
          val size = le32(pos + 4)
          if (t == "LIST" && tag(pos + 8) == "movi") moviPos = pos + 8
          else if (t == "idx1") { idxPos = pos + 8; idxLen = size }
          pos += 8 + size + (size & 1)
        }
        require(moviPos >= 0 && idxPos >= 0, "AVI lacks movi or idx1")
        val nf = idxLen / 16
        (0 until nf).iterator.filter(_ % every == 0).map { f =>
          val e = idxPos + 16 * f
          require(tag(e) == "00dc", s"unexpected index ckid ${tag(e)}")
          val ckPos = moviPos + le32(e + 8)
          require(tag(ckPos) == "00dc", "index offset does not hit a chunk")
          val len = le32(ckPos + 4)
          val img = decodePng(reader, b, ckPos + 8, len) // JPEG reader
          val (w, h) = (img.getWidth, img.getHeight)
          val pixels = img.getRGB(0, 0, w, h, null, 0, w)
          var (sr, sg, sb) = (0L, 0L, 0L)
          var i = 0
          while (i < pixels.length) {
            val p = pixels(i)
            sr += (p >> 16) & 0xff; sg += (p >> 8) & 0xff; sb += p & 0xff
            i += 1
          }
          val n = w.toLong * h
          AviFrame(v.media_id, f, w, h,
            sr.toDouble / n, sg.toDouble / n, sb.toDouble / n)
        }
      }
    }
  }

  // ---------------------------------------------------------------------
  // The GENERIC multimodal path on real codecs: a mixed-kind media table
  // whose image rows are genuine PNG, audio rows genuine WAV, video rows
  // genuine GVID containers — and one dispatching decoder that routes
  // each row through the real codec for its kind. This is the production
  // shape of a multimodal training table (one binary column, one kind
  // discriminator, typed metadata) with nothing stubbed: every output
  // value comes out of an actual parse.
  // ---------------------------------------------------------------------

  /** Unified decoded-features row. The stats are exact integers so the
    * whole mixed-kind decode is oracle-checkable: `n_units` counts the
    * decoded atoms (pixels / samples / sampled frames) and `stat_sum`
    * sums their integer values (pixel r+g+b / |sample| / frame pixel
    * sums). `width`/`height` are NULL for audio. */
  case class DecodedMedia(media_id: Long, kind: String,
                          width: Option[Int], height: Option[Int],
                          n_units: Long, stat_sum: Long)

  /** Mixed-kind media table with REAL payloads (kind = media_id mod 3:
    * image→PNG, audio→WAV, video→GVID), honest metadata per kind. */
  def syntheticMediaReal(spark: SparkSession,
                         dir: String): Dataset[MediaRow] = {
    import spark.implicits._
    graft.sources.Tables.fanOut(
        graft.sources.Tables.load(spark, dir, "documents")
          .select(col("doc_id"), col("n_chars")), col("doc_id"))
      .as[(Long, Long)]
      .mapPartitions { it =>
        val writer = newPngWriter()
        it.map { case (id, n) =>
          (id % 3) match {
            case 0 =>
              MediaRow(id, "image", makePngPayload(writer, id, n),
                MediaMeta("image", (n % 64).toInt + 8, (n % 48).toInt + 8,
                  0, 0L, "png"))
            case 1 =>
              MediaRow(id, "audio", makeWavPayload(id, n),
                MediaMeta("audio", 0, 0, 16000,
                  (n + 64) * 1000 / 16000, "pcm_s16le"))
            case _ =>
              MediaRow(id, "video", makeGvidPayload(writer, id, n),
                MediaMeta("video", (n % 32).toInt + 8, (n % 24).toInt + 8,
                  0, ((n % 5) + 2) * 40, "gvid"))
          }
        }
      }
  }

  /** REAL dispatching decode over the mixed-kind table: PNG raster walk
    * for images, WAV header+frame parse for audio, GVID index-seek frame
    * sampling (every 2nd frame) for video. Partition-local with one
    * reader instance per codec per partition; payloads never shuffle. */
  def decodeMedia(media: Dataset[MediaRow]): Dataset[DecodedMedia] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      val pngReader = newPngReader()
      it.map { m =>
        m.kind match {
          case "image" =>
            val img = decodePng(pngReader, m.bytes, 0, m.bytes.length)
            val (w, h) = (img.getWidth, img.getHeight)
            val pixels = img.getRGB(0, 0, w, h, null, 0, w)
            var s = 0L
            var i = 0
            while (i < pixels.length) {
              val p = pixels(i)
              s += ((p >> 16) & 0xff) + ((p >> 8) & 0xff) + (p & 0xff)
              i += 1
            }
            DecodedMedia(m.media_id, m.kind, Some(w), Some(h),
              w.toLong * h, s)
          case "audio" =>
            val ais = openWav(m.bytes)
            val frames = ais.getFrameLength
            val bytes = ais.readAllBytes()
            var s = 0L
            var i = 0
            while (i + 1 < bytes.length) {
              s += math.abs(
                ((bytes(i) & 0xff) | (bytes(i + 1) << 8)).toShort.toInt)
              i += 2
            }
            DecodedMedia(m.media_id, m.kind, None, None, frames, s)
          case "video" =>
            val in = new java.io.DataInputStream(
              new java.io.ByteArrayInputStream(m.bytes))
            require(in.readInt() == GvidMagic, "not a GVID container")
            val nf = in.readInt()
            val lens = Array.fill(nf)(in.readInt())
            val offsets = lens.scanLeft(8 + 4 * nf)(_ + _)
            var (w0, h0) = (0, 0)
            var s = 0L
            var sampled = 0L
            (0 until nf).filter(_ % 2 == 0).foreach { f =>
              val img = decodePng(pngReader, m.bytes, offsets(f), lens(f))
              val (w, h) = (img.getWidth, img.getHeight)
              if (sampled == 0) { w0 = w; h0 = h }
              val pixels = img.getRGB(0, 0, w, h, null, 0, w)
              var i = 0
              while (i < pixels.length) {
                val p = pixels(i)
                s += ((p >> 16) & 0xff) + ((p >> 8) & 0xff) + (p & 0xff)
                i += 1
              }
              sampled += 1
            }
            DecodedMedia(m.media_id, m.kind, Some(w0), Some(h0), sampled, s)
          case other =>
            throw new IllegalArgumentException(s"unknown media kind $other")
        }
      }
    }
  }
}
