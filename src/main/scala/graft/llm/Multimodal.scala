package graft.llm

import java.security.MessageDigest

import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal (image/audio/video) columns as opaque binary + typed metadata.
  *
  * The Spark-side plumbing is real and tested — schema, partition-local
  * batch iteration, deterministic output — and so is decoding for every
  * format the JDK itself ships a codec for: PNG/JPEG/GIF/BMP via
  * `javax.imageio` and PCM WAV via `javax.sound.sampled`
  * ([[decodeImage]]/[[decodeWav]]; no external library, headless-safe).
  * Payloads outside that set (mp3/mp4/webp — codecs the JDK lacks) fall
  * back to the deterministic [[decodeStub]], the one seam a production
  * deployment backs with ffmpeg/JNI (or an Arrow-batched `mapInPandas`
  * worker in PySpark).
  *
  * Scale notes: feature extraction is `mapPartitions` over the asset table —
  * embarrassingly parallel, no shuffle; assets should be stored in their own
  * parquet files (binary column dominates size) with metadata columns first
  * so metadata-only queries never deserialize payload pages (columnar
  * projection does this for free).
  */
object Multimodal {

  // keep ImageIO's stream cache in memory: the default disk-backed cache
  // writes a temp file per read/write call — per-ROW file I/O inside an
  // executor task (object init runs once per JVM, driver and executors)
  javax.imageio.ImageIO.setUseCache(false)

  /** An ingested asset: payload plus the typed metadata a catalog query
    * needs without touching bytes. */
  final case class MediaAsset(
      asset_id: Long,
      modality: String, // image | audio | video
      media_bytes: Array[Byte],
      declared_width: Int,
      declared_height: Int)

  /** Extraction result: per-asset metadata + fixed-dim feature vector. */
  final case class MediaFeatures(
      asset_id: Long,
      modality: String,
      n_bytes: Int,
      content_sha: String,
      feature: Array[Float])

  val FeatureDim = 16

  /** Fallback for formats the JDK has no codec for (and for non-media
    * payloads such as the synthetic testdata). Deterministic: derives a
    * feature vector from the SHA-256 of the payload, so tests can assert
    * exact values and reruns are reproducible. A production deployment
    * backs this seam with ffmpeg/JNI for the exotic formats; JDK-native
    * formats never reach it (see [[decodeImage]]/[[decodeWav]]). */
  def decodeStub(bytes: Array[Byte], dim: Int = FeatureDim): Array[Float] = {
    val sha = MessageDigest.getInstance("SHA-256").digest(bytes)
    Array.tabulate(dim)(i => ((sha(i % sha.length) & 0xFF) - 128) / 128.0f)
  }

  /** REAL image decode via the JDK's own codecs (`javax.imageio`:
    * PNG/JPEG/GIF/BMP — no external library, works headless). Feature =
    * the [[FeatureDim]]-cell (4×4) grid of mean luminance values mapped
    * to [-1, 1) — the classic thumbnail-signature baseline. Pixels are
    * sampled on a bounded stride (≤ 64 per axis), so a 100-megapixel
    * scan costs the same as a thumbnail. Returns None when no JDK reader
    * claims the bytes (truncated/garbage/exotic format) — the caller
    * falls back, never throws (a 100 TB crawl always contains garbage). */
  def decodeImage(bytes: Array[Byte], dim: Int = FeatureDim): Option[Array[Float]] =
    try {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      if (img == null || img.getWidth <= 0 || img.getHeight <= 0) None
      else {
        val (w, h) = (img.getWidth, img.getHeight)
        val grid = math.max(1, math.sqrt(dim.toDouble).toInt) // 4 for dim 16
        val (sx, sy) = (math.max(1, w / 64), math.max(1, h / 64))
        val sum = new Array[Double](grid * grid)
        val cnt = new Array[Long](grid * grid)
        var y = 0
        while (y < h) {
          var x = 0
          val gy = math.min(grid - 1, y * grid / h)
          while (x < w) {
            val rgb = img.getRGB(x, y)
            val lum = 0.299 * ((rgb >> 16) & 0xFF) +
              0.587 * ((rgb >> 8) & 0xFF) + 0.114 * (rgb & 0xFF)
            val c = gy * grid + math.min(grid - 1, x * grid / w)
            sum(c) += lum; cnt(c) += 1
            x += sx
          }
          y += sy
        }
        Some(Array.tabulate(dim) { i =>
          val c = i % (grid * grid)
          if (cnt(c) == 0) 0f
          else ((sum(c) / cnt(c)) / 255.0 * 2.0 - 1.0).toFloat
        })
      }
    } catch { case scala.util.control.NonFatal(_) => None }

  /** REAL audio decode via the JDK's `javax.sound.sampled` (PCM WAV).
    * Feature = mean |amplitude| of [[FeatureDim]] equal time bins,
    * normalized to [0, 1] — the standard coarse envelope signature.
    * Returns None for anything the JDK can't parse as PCM. */
  def decodeWav(bytes: Array[Byte], dim: Int = FeatureDim): Option[Array[Float]] =
    try {
      val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(bytes))
      try {
        val fmt = in.getFormat
        val enc = fmt.getEncoding
        val bits = fmt.getSampleSizeInBits
        if ((enc != javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED &&
             enc != javax.sound.sampled.AudioFormat.Encoding.PCM_UNSIGNED) ||
            (bits != 8 && bits != 16)) None
        else pcmEnvelope(
          in.readAllBytes(), bits,
          unsigned = enc == javax.sound.sampled.AudioFormat.Encoding.PCM_UNSIGNED,
          bigEndian = fmt.isBigEndian, dim = dim)
      } finally in.close()
    } catch { case scala.util.control.NonFatal(_) => None }

  /** The envelope fold over raw PCM frames, factored out of [[decodeWav]]
    * so every (bits, signedness, endianness) branch is unit-testable —
    * the JDK's WAV reader only ever reports 16-bit PCM as signed, so the
    * unsigned-16 branch can't be reached through real WAV bytes. */
  private[graft] def pcmEnvelope(data: Array[Byte], bits: Int,
      unsigned: Boolean, bigEndian: Boolean, dim: Int): Option[Array[Float]] = {
    val bytesPerSample = bits / 8
    val nSamples = data.length / bytesPerSample
    if (nSamples == 0) None
    else {
      val sum = new Array[Double](dim)
      val cnt = new Array[Long](dim)
      var i = 0
      while (i < nSamples) {
        val amp =
          if (bits == 16) {
            if (unsigned) {
              // unsigned: both bytes raw, midpoint 0x8000 = silence
              val u = if (bigEndian)
                ((data(i * 2) & 0xFF) << 8) | (data(i * 2 + 1) & 0xFF)
              else ((data(i * 2 + 1) & 0xFF) << 8) | (data(i * 2) & 0xFF)
              math.abs((u - 32768) / 32768.0)
            } else {
              val v = if (bigEndian) (data(i * 2).toInt << 8) | (data(i * 2 + 1) & 0xFF)
                      else (data(i * 2 + 1).toInt << 8) | (data(i * 2) & 0xFF)
              math.abs(v / 32768.0)
            }
          } else if (unsigned) math.abs(((data(i) & 0xFF) - 128) / 128.0)
          else math.abs(data(i) / 128.0)
        val b = math.min(dim - 1, (i.toLong * dim / nSamples).toInt)
        sum(b) += amp; cnt(b) += 1
        i += 1
      }
      Some(Array.tabulate(dim)(b =>
        if (cnt(b) == 0) 0f else (sum(b) / cnt(b)).toFloat))
    }
  }

  /** The decode chain [[extractFeatures]] uses: the header [[probe]]
    * routes each payload to the matching JDK codec, everything else to
    * the deterministic fallback. Probing first is a scale requirement,
    * not a nicety: `ImageIO.read` on a non-image does a full reader
    * lookup through a disk-backed cache stream (a temp file per call —
    * measured 60 s for 50 k text payloads vs <1 s probed), and a 100 TB
    * crawl is mostly not JDK-decodable. The probe is a few header byte
    * compares; only matching payloads pay codec cost. */
  def decode(bytes: Array[Byte], dim: Int = FeatureDim): Array[Float] =
    (probe(bytes).format match {
      case "png" | "jpeg" | "gif" | "bmp" => decodeImage(bytes, dim)
      case "wav" => decodeWav(bytes, dim)
      case _ => None
    }).getOrElse(decodeStub(bytes, dim))

  private def hex(bytes: Array[Byte]): String =
    bytes.map(b => f"$b%02x").mkString

  /** Partition-local feature extraction: the decoder runs once per asset on
    * the executor holding the bytes; output is a typed Dataset. */
  def extractFeatures(assets: Dataset[MediaAsset]): Dataset[MediaFeatures] = {
    implicit val enc = Encoders.product[MediaFeatures]
    assets.mapPartitions { it =>
      // one digest instance per partition, not per row
      val digest = MessageDigest.getInstance("SHA-256")
      it.map { a =>
        digest.reset()
        MediaFeatures(
          asset_id = a.asset_id,
          modality = a.modality,
          n_bytes = a.media_bytes.length,
          content_sha = hex(digest.digest(a.media_bytes)),
          feature = decode(a.media_bytes))
      }
    }
  }

  /** Deterministic frame sampling for video-like assets: pick `n` evenly
    * spaced byte windows (stand-in for frame decode) — pure slicing, keeps
    * the batch shape a real frame sampler would have. */
  def frameSample(assets: Dataset[MediaAsset], n: Int, window: Int = 16): DataFrame = {
    val spark = assets.sparkSession
    import spark.implicits._
    assets.flatMap { a =>
      val len = a.media_bytes.length
      (0 until n).iterator.map { i =>
        val off = if (n == 1) 0 else math.min((len.toLong * i / n).toInt, math.max(len - window, 0))
        val slice = a.media_bytes.slice(off, math.min(off + window, len))
        (a.asset_id, i, off, slice)
      }
    }.toDF("asset_id", "frame_idx", "byte_offset", "frame_bytes")
  }

  /** Resize to a target box: the Spark shape of a media resize — per-asset
    * kernel on the executor holding the bytes (mapPartitions, no shuffle),
    * output carries the new declared dimensions plus the transformed
    * payload. JDK-decodable images are REALLY resized ([[resizeImage]]:
    * decode → bilinear scale → PNG re-encode, all `java.awt` headless);
    * other payloads go through [[resizeStub]] (the ffmpeg seam), keyed by
    * their declared dimensions. */
  def resize(assets: Dataset[MediaAsset], maxW: Int, maxH: Int): Dataset[MediaAsset] = {
    implicit val enc = Encoders.product[MediaAsset]
    assets.mapPartitions { it =>
      it.map { a =>
        // probe-gated for the same reason as decode(): non-images must
        // never pay an ImageIO reader lookup
        val isImage = probe(a.media_bytes).format match {
          case "png" | "jpeg" | "gif" | "bmp" => true
          case _ => false
        }
        (if (isImage) resizeImage(a.media_bytes, maxW, maxH) else None) match {
          case Some((out, w, h)) =>
            a.copy(media_bytes = out, declared_width = w, declared_height = h)
          case None =>
            val (w, h) = fitBox(a.declared_width, a.declared_height, maxW, maxH)
            a.copy(
              media_bytes = resizeStub(a.media_bytes, a.declared_width, a.declared_height, w, h),
              declared_width = w,
              declared_height = h)
        }
      }
    }
  }

  /** REAL image resize via the JDK: decode with `javax.imageio`, fit the
    * actual pixel dimensions into (maxW, maxH) aspect-preserving, scale
    * through a bilinear `Graphics2D` draw, re-encode as PNG. Returns the
    * new bytes + dimensions, or None when the payload isn't a JDK-
    * decodable image (caller falls back to the stub seam). */
  def resizeImage(bytes: Array[Byte], maxW: Int, maxH: Int): Option[(Array[Byte], Int, Int)] =
    try {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      if (img == null || img.getWidth <= 0 || img.getHeight <= 0) None
      else {
        val (w, h) = fitBox(img.getWidth, img.getHeight, maxW, maxH)
        val out = new java.awt.image.BufferedImage(
          w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
        val g = out.createGraphics()
        try {
          g.setRenderingHint(
            java.awt.RenderingHints.KEY_INTERPOLATION,
            java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
          g.drawImage(img, 0, 0, w, h, null)
        } finally g.dispose()
        val buf = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(out, "png", buf)
        Some((buf.toByteArray, w, h))
      }
    } catch { case scala.util.control.NonFatal(_) => None }

  /** Aspect-preserving fit of (w, h) into (maxW, maxH), never upscaling;
    * degenerate declared dims pass through clamped. */
  private[llm] def fitBox(w: Int, h: Int, maxW: Int, maxH: Int): (Int, Int) = {
    if (w <= 0 || h <= 0) return (math.max(w, 0) min maxW, math.max(h, 0) min maxH)
    val scale = math.min(1.0, math.min(maxW.toDouble / w, maxH.toDouble / h))
    (math.max(1, math.round(w * scale).toInt), math.max(1, math.round(h * scale).toInt))
  }

  /** STUB — stands in for the real pixel resampler. Deterministic fake:
    * proportional byte decimation to the area ratio, so output size tracks
    * the real memory effect of a resize and reruns are exact. */
  def resizeStub(bytes: Array[Byte], w0: Int, h0: Int, w1: Int, h1: Int): Array[Byte] = {
    val a0 = math.max(1L, w0.toLong * h0)
    val a1 = math.max(1L, w1.toLong * h1)
    if (a1 >= a0 || bytes.isEmpty) return bytes
    val keep = math.max(1, (bytes.length * a1 / a0).toInt)
    Array.tabulate(keep)(i => bytes((i.toLong * bytes.length / keep).toInt))
  }

  /** Container-header probe result — [[probe]]. */
  final case class MediaProbe(
      format: String, // png | jpeg | gif | bmp | wav | unknown
      width: Option[Int],
      height: Option[Int],
      channels: Option[Int],
      sample_rate: Option[Int])

  /** REAL (not stubbed) media metadata extraction: container headers are
    * plain bytes — PNG IHDR, JPEG SOF markers, GIF/BMP dimension fields,
    * WAV fmt chunk — so dimensions / channels / sample-rate need no codec
    * library at all. This is the part of the decode seam a data pipeline
    * uses most (resolution/duration filtering, corrupt-file triage), and
    * it runs here for real; only pixel/sample DECODING remains behind
    * [[decodeStub]]. Unknown or truncated payloads probe as `unknown`
    * with no fields — never an exception (a 100 TB crawl always contains
    * garbage). */
  def probe(bytes: Array[Byte]): MediaProbe = {
    val n = bytes.length
    def u8(i: Int) = bytes(i) & 0xFF
    def be16(i: Int) = (u8(i) << 8) | u8(i + 1)
    def be32(i: Int) = (u8(i) << 24) | (u8(i + 1) << 16) | (u8(i + 2) << 8) | u8(i + 3)
    def le16(i: Int) = (u8(i + 1) << 8) | u8(i)
    def le32(i: Int) = (u8(i + 3) << 24) | (u8(i + 2) << 16) | (u8(i + 1) << 8) | u8(i)
    def ascii(i: Int, len: Int) = new String(bytes, i, len, "US-ASCII")
    val unknown = MediaProbe("unknown", None, None, None, None)
    if (n >= 24 && u8(0) == 0x89 && ascii(1, 3) == "PNG" && ascii(12, 4) == "IHDR")
      MediaProbe("png", Some(be32(16)), Some(be32(20)), None, None)
    else if (n >= 4 && u8(0) == 0xFF && u8(1) == 0xD8) {
      // JPEG: walk the marker chain to the first start-of-frame
      var i = 2
      var out = MediaProbe("jpeg", None, None, None, None)
      var done = false
      while (!done && i + 9 < n) {
        if (u8(i) != 0xFF) done = true
        else {
          val m = u8(i + 1)
          if (m == 0xFF) i += 1 // fill byte
          else if (m >= 0xD0 && m <= 0xD9) i += 2 // standalone marker
          else {
            val len = be16(i + 2)
            val isSof = (m >= 0xC0 && m <= 0xCF) &&
              m != 0xC4 && m != 0xC8 && m != 0xCC // not DHT/JPG/DAC
            if (isSof && i + 9 < n) {
              out = MediaProbe("jpeg", Some(be16(i + 7)), Some(be16(i + 5)), None, None)
              done = true
            } else if (len < 2) done = true
            else i += 2 + len
          }
        }
      }
      out
    }
    else if (n >= 10 && ascii(0, 4) == "GIF8")
      MediaProbe("gif", Some(le16(6)), Some(le16(8)), None, None)
    else if (n >= 26 && ascii(0, 2) == "BM")
      // biHeight is SIGNED: top-down DIBs store it negative — report the
      // row count, not the sign convention
      MediaProbe("bmp", Some(le32(18)), Some(math.abs(le32(22))), None, None)
    else if (n >= 12 && ascii(0, 4) == "RIFF" && ascii(8, 4) == "WAVE") {
      // walk the RIFF chunk chain for "fmt " — it is NOT always the first
      // chunk (broadcast-WAV/DAW exports lead with JUNK/LIST padding);
      // assuming fixed offsets 22/24 would read garbage from those
      var i = 12
      var out = MediaProbe("wav", None, None, None, None)
      var done = false
      while (!done && i + 8 <= n) {
        val id = ascii(i, 4)
        val size = le32(i + 4)
        if (id == "fmt " && i + 16 <= n && size >= 16) {
          out = MediaProbe("wav", None, None, Some(le16(i + 10)), Some(le32(i + 12)))
          done = true
        } else if (size < 0) done = true
        else i += 8 + size + (size & 1) // chunks are word-aligned
      }
      out
    }
    else unknown
  }

  /** Probe a whole asset table: per-asset header parse on the executor
    * holding the bytes (no shuffle, metadata-width output). */
  def probeAssets(assets: Dataset[MediaAsset]): DataFrame = {
    val spark = assets.sparkSession
    import spark.implicits._
    assets.map { a =>
      val p = probe(a.media_bytes)
      (a.asset_id, a.modality, p.format, p.width, p.height, p.channels, p.sample_rate)
    }.toDF("asset_id", "modality", "format", "width", "height",
      "channels", "sample_rate")
  }

  /** Synthesize assets from the documents table (utf-8 payload bytes) — the
    * testdata has no real media, but the plumbing is payload-agnostic. */
  def assetsFromDocuments(spark: SparkSession, docs: DataFrame): Dataset[MediaAsset] = {
    implicit val enc = Encoders.product[MediaAsset]
    docs.select(
      col("doc_id").as("asset_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (col("doc_id") % 3 + 1).cast("int")).as("modality"),
      encode(col("text"), "UTF-8").as("media_bytes"),
      (col("n_chars") % 640).cast("int").as("declared_width"),
      (col("n_chars") % 480).cast("int").as("declared_height"))
      .as[MediaAsset]
  }

  /** 60-bit payload fingerprint (first 15 hex chars of sha256). The
    * banding/verify machinery below only needs "a 64-or-fewer-bit
    * fingerprint whose bit distance means similarity"; a production
    * deployment derives it perceptually (pHash of [[decodeImage]]'s
    * luminance grid, chromaprint for audio) behind the same column,
    * while the byte-hash form makes the pipeline engine-reproducible
    * here (near = exact for it, by construction). */
  def mediaFingerprint(bytes: Column): Column =
    conv(substring(sha2(bytes, 256), 1, MediaFpHex), 16, 10).cast("long")

  val MediaFpHex = 15      // 15 hex chars = 60 fingerprint bits
  val MediaBands = 4       // 4 × 15-bit bands
  val MediaMaxHamming = 3  // pigeonhole: ≤3 differing bits ⇒ one band equal

  /** Hamming-banded near-duplicate pairs over media fingerprints — the
    * multimodal face of simhash dedup (the l7 idiom applied to the
    * asset table): exact-fingerprint duplicates collapse to one
    * representative BEFORE banding (d copies cost d, not d²), the 4
    * pigeonhole bands turn candidate generation into an equi-join, and
    * verified pairs expand back across the collapsed groups. Output:
    * every asset pair (asset_a < asset_b) within Hamming ≤
    * [[MediaMaxHamming]], with the distance. */
  def mediaNearDup(assets: Dataset[MediaAsset]): DataFrame =
    fingerprintNearDup(assets.toDF()
      .select(col("asset_id"), mediaFingerprint(col("media_bytes")).as("fp")))

  /** The banding/verify core over any (asset_id, fp) frame — fp from
    * [[mediaFingerprint]], a perceptual hasher, or an upstream catalog. */
  def fingerprintNearDup(fps: DataFrame): DataFrame = {
    val wg = org.apache.spark.sql.expressions.Window.partitionBy("fp")
    val withRep = fps
      .withColumn("rep", min("asset_id").over(wg))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val uniq = withRep.filter(col("asset_id") === col("rep"))
      .select("asset_id", "fp")
    val bands = uniq.select(col("asset_id"), col("fp"),
      explode(expr(s"""transform(sequence(0, ${MediaBands - 1}),
        | j -> struct(j AS idx, shiftright(fp, j * 15) & 32767 AS v))""".stripMargin))
        .as("band"))
      .select(col("asset_id"), col("fp"),
        col("band.idx").as("band_idx"), col("band.v").as("band_val"))

    // aliased self-join → one band shuffle + ReusedExchange (l7 idiom)
    val vpairs = bands.as("x")
      .join(bands.as("y"),
        col("x.band_idx") === col("y.band_idx") &&
        col("x.band_val") === col("y.band_val") &&
        col("x.asset_id") < col("y.asset_id"))
      .select(col("x.asset_id").as("a"), col("y.asset_id").as("b"),
        bit_count(col("x.fp").bitwiseXOR(col("y.fp"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= MediaMaxHamming)

    val ma = withRep.select(col("rep").as("a"), col("asset_id").as("m_a"))
    val mb = withRep.select(col("rep").as("b"), col("asset_id").as("m_b"))
    val cross = vpairs
      .join(ma, "a").join(mb, "b")
      .select(least(col("m_a"), col("m_b")).as("asset_a"),
        greatest(col("m_a"), col("m_b")).as("asset_b"), col("hamming"))
    val im = withRep.select(col("rep"), col("asset_id"))
    val intra = im.as("x")
      .join(im.as("y"),
        col("x.rep") === col("y.rep") && col("x.asset_id") < col("y.asset_id"))
      .select(col("x.asset_id").as("asset_a"), col("y.asset_id").as("asset_b"),
        lit(0).cast("int").as("hamming"))

    cross.unionByName(intra).orderBy("asset_a", "asset_b")
  }
}
