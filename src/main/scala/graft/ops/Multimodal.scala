package graft.ops

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.ImageIO

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video payloads as opaque
  * `binary` columns with typed metadata, processed partition-wise.
  *
  * The image codec is REAL: `javax.imageio.ImageIO` ships in every JDK and
  * decodes PNG/JPEG/BMP/GIF with no extra dependencies. Decoded features
  * are kept integer-exact (luminance sums, exact-rational aHash votes) so a
  * SQL oracle can adjudicate them bit-for-bit against the closed-form pixel
  * math of the synthetic fixtures ([[syntheticPng]]). Audio/video decoding
  * would follow the same partition-wise shape with an ffmpeg binding; the
  * container-level metadata ops ([[sampleFrames]]) are pure column math
  * and real today.
  *
  * Scale design: payloads never shuffle for feature extraction — it is
  * embarrassingly parallel `mapPartitions` map work with per-partition
  * codec init, and the feature columns (a few ints + a 64-bit hash) are
  * what flows downstream, not the bytes.
  */
object Multimodal {

  /** Canonical multimodal schema: payload + typed metadata struct. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("content", BinaryType, nullable = true),
    StructField("meta", StructType(Seq(
      StructField("mime", StringType, nullable = false),
      StructField("byte_len", LongType, nullable = false),
      StructField("sha256", StringType, nullable = false))), nullable = false)))

  /** Wrap any (id, text) table into the media shape — the test stand-in for
    * real payload ingestion (payload = utf-8 bytes). */
  def packBinary(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text",
                 mime: String = "text/plain"): DataFrame = {
    val content = encode(col(textCol), "utf-8")
    docs.select(
      col(idCol).cast("long").as("media_id"),
      content.as("content"),
      struct(
        lit(mime).as("mime"),
        length(content).cast("long").as("byte_len"),
        sha2(content, 256).as("sha256")).as("meta"))
  }

  /** Real image codec over the JDK's `javax.imageio`.
    *
    * Features are integer-exact where an oracle needs them exact:
    *  - `lumSum`: Σ over pixels of the per-pixel luminance (the sum of the
    *    first ≤3 color bands) — pure integer, no float rounding;
    *  - `aHash`: the 8×8 average-hash. Pixel (x,y) votes into block
    *    j = (y*8/h)*8 + (x*8/w); bit j is set iff the block's mean
    *    luminance exceeds the image mean, compared as the exact rational
    *    cross-product `blockSum * w * h > totalSum * blockPixels` — no
    *    resampling, no division, deterministic for ANY w,h (blocks that
    *    receive no pixels when w or h < 8 vote 0);
    *  - `meanByte` (mean over all color samples) is the float convenience
    *    for library callers.
    *
    * `decode` returns None for undecodable payloads — corrupt bytes in a
    * 100 TB crawl are data, not exceptions. */
  object ImageCodec {
    case class ImageFeatures(width: Int, height: Int, channels: Int,
                             lumSum: Long, meanByte: Double,
                             aHash: Long, aHashBits: String)

    /** Whether the exact rational compare `blockSum*wh > total*blockPix`
      * can overflow a signed Long: `blockSum ≤ maxPerPixelLum*wh`, so the
      * left side is bounded by `maxPerPixelLum*wh²` — keyed on the ACTUAL
      * per-pixel luminance ceiling (sample bit depth × color bands), not a
      * fixed pixel count: a 16-bit raster overflows ~40× sooner than an
      * 8-bit one. */
    private[ops] def needsBigInt(maxPerPixelLum: Long, wh: Long): Boolean =
      BigInt(math.max(maxPerPixelLum, 1L)) * wh * wh > BigInt(Long.MaxValue)

    def decode(bytes: Array[Byte]): Option[ImageFeatures] = {
      val img0 =
        try ImageIO.read(new ByteArrayInputStream(bytes))
        catch { case _: Exception => null }
      if (img0 == null) return None
      // palette images (GIF, PNG-8) store palette INDICES in the raster —
      // hashing those compares palette layouts, not luminance. Expand to
      // RGB first (transparent entries composite onto black,
      // deterministically).
      val img =
        if (img0.getColorModel.isInstanceOf[java.awt.image.IndexColorModel]) {
          val rgb = new BufferedImage(img0.getWidth, img0.getHeight,
            BufferedImage.TYPE_3BYTE_BGR)
          val g = rgb.createGraphics()
          try g.drawImage(img0, 0, 0, null) finally g.dispose()
          rgb
        } else img0
      val w = img.getWidth
      val h = img.getHeight
      val raster = img.getRaster
      val bands = raster.getNumBands
      // COLOR components only: min(bands, 3) stripped alpha from RGBA but
      // not from 2-band gray+alpha rasters, where it summed transparency
      // into "luminance" and split the aHash of identical gray channels
      val colorBands = img.getColorModel.getNumColorComponents
      var total = 0L
      var allSamples = 0L
      val blockSum = new Array[Long](64)
      val blockPix = new Array[Long](64)
      // r19 fast path: `raster.getSample(x, y, b)` pays bounds checks and
      // sample-model dispatch PER SAMPLE — measured 265 µs of the 347 µs
      // per-image decode (the single biggest cost of the whole multimodal
      // family, above ImageIO itself). Every 8-bit interleaved raster
      // (TYPE_3BYTE_BGR/4BYTE_ABGR/gray — everything javax.imageio's
      // PNG/JPEG readers produce for these corpora) reads its samples
      // straight off the DataBufferByte with the sample model's own
      // strides; getSample on 8-bit bytes is exactly `data(off) & 0xFF`,
      // so the sums are bit-identical. Anything else (16-bit, banded,
      // translated sub-rasters) falls back to the general loop.
      val fastSm = raster.getSampleModel match {
        case sm: java.awt.image.PixelInterleavedSampleModel
          if raster.getDataBuffer.isInstanceOf[java.awt.image.DataBufferByte] &&
            raster.getDataBuffer.getOffset == 0 &&
            raster.getSampleModelTranslateX == 0 &&
            raster.getSampleModelTranslateY == 0 &&
            sm.getSampleSize.forall(_ == 8) => sm
        case _ => null
      }
      if (fastSm != null) {
        val data = raster.getDataBuffer.asInstanceOf[java.awt.image.DataBufferByte].getData
        val scan = fastSm.getScanlineStride
        val pixStride = fastSm.getPixelStride
        val offs = fastSm.getBandOffsets // band b of pixel (x,y) at y*scan + x*pixStride + offs(b)
        var y = 0
        while (y < h) {
          val by = y * 8 / h
          val rowOff = y * scan
          var x = 0
          while (x < w) {
            val px = rowOff + x * pixStride
            var lum = 0L
            var all = 0L
            var b = 0
            while (b < bands) {
              val v = (data(px + offs(b)) & 0xFF).toLong
              all += v
              if (b < colorBands) lum += v
              b += 1
            }
            allSamples += all
            total += lum
            val j = by * 8 + x * 8 / w
            blockSum(j) += lum
            blockPix(j) += 1L
            x += 1
          }
          y += 1
        }
      } else {
        var y = 0
        while (y < h) {
          val by = y * 8 / h
          var x = 0
          while (x < w) {
            var lum = 0L
            var b = 0
            while (b < colorBands) { lum += raster.getSample(x, y, b); b += 1 }
            b = 0
            while (b < bands) { allSamples += raster.getSample(x, y, b); b += 1 }
            total += lum
            val j = by * 8 + x * 8 / w
            blockSum(j) += lum
            blockPix(j) += 1L
            x += 1
          }
          y += 1
        }
      }
      var hash = 0L
      val bits = new StringBuilder(64)
      val wh = w.toLong * h
      // large inputs take the BigInt path so the hash stays exact for ANY
      // size AND sample depth (see needsBigInt)
      val sm = raster.getSampleModel
      var maxPerPixelLum = 0L
      var mb = 0
      while (mb < colorBands) { maxPerPixelLum += (1L << sm.getSampleSize(mb)) - 1; mb += 1 }
      val big = needsBigInt(maxPerPixelLum, wh)
      var j = 0
      while (j < 64) {
        val set =
          if (big) BigInt(blockSum(j)) * wh > BigInt(total) * blockPix(j)
          else blockSum(j) * wh > total * blockPix(j)
        if (set) hash |= 1L << j
        bits.append(if (set) '1' else '0')
        j += 1
      }
      val mean = math.rint(allSamples.toDouble / (w.toLong * h * bands) * 1e6) / 1e6
      Some(ImageFeatures(w, h, bands, total, mean, hash, bits.toString))
    }
  }

  /** Deterministic PNG fixture for id `d`: an 8- or 16-pixel-square RGB
    * image whose pixel (x,y) carries gray value
    * `(e·31 + x·(7 + e%11) + y·(13 + (e/11)%13) + x·y·((e/143)%7)) % 256`
    * in all three channels, where `e = rasterSeed(d)`. The closed form
    * lets a SQL oracle compute the EXPECTED decoded features of the real
    * codec from `d` alone — PNG is lossless, so encode→decode must
    * round-trip every pixel. */
  def syntheticPng(d: Long): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    ImageIO.write(syntheticImage(d), "png", out)
    out.toByteArray
  }

  /** Raster seed with a planted EXACT TWIN: every 17th id reuses its
    * predecessor's raster (`d%17 == 0 → d−1`), so a synthetic corpus of n
    * images carries ~n/17 guaranteed duplicate pairs — a LINEAR dedup
    * signal at any scale — while all other ids draw distinct rasters. */
  private[ops] def rasterSeed(d: Long): Long =
    if (d > 0 && d % 17 == 0) d - 1 else d

  /** The shared closed-form raster behind both fixture encoders.
    *
    * Entropy note (round 13): the original raster
    * `(d·31 + 7x + 13y) % 256` had only ~1,000 distinct images over ALL
    * ids (a 256-value phase × 4 sizes) — at a 50k-image bench scale every
    * raster averaged ~49 byte-identical twins, so near-dup OUTPUT grew
    * quadratically in corpus size (25.6M aHash-equal pairs at sf1) and
    * the pipeline bench measured generator saturation, not the operator
    * (the round-12 minhash-ramp lesson, replayed on images). Id-dependent
    * gradient coefficients plus an x·y curvature term lift the space to
    * ~38k distinct aHashes at 50k ids (measured), with near-dup structure
    * supplied deliberately by [[rasterSeed]]'s twin plant instead of
    * accidentally by phase collisions. Small ids (< 143) keep zero
    * curvature and moderate coefficients, so the committed JPEG fixtures
    * and the PNG↔JPEG robustness contract stay on smooth gradients. */
  private def syntheticImage(d: Long): BufferedImage = {
    // floorMod everywhere: a NEGATIVE id's remainders go negative, giving
    // width 0 (BufferedImage throws) or negative gray values; for the
    // non-negative ids the oracle replays, floorMod == %
    val e = java.lang.Math.floorMod(rasterSeed(d), 1L << 56)
    val w = (8 * (1 + e % 2)).toInt
    val h = (8 * (1 + (e / 2) % 2)).toInt
    val xc = 7 + e % 11
    val yc = 13 + (e / 11) % 13
    val xyc = (e / 143) % 7
    val img = new BufferedImage(w, h, BufferedImage.TYPE_3BYTE_BGR)
    // r19: fill the raster's backing byte array directly — setRGB pays a
    // color-model pack/unpack per pixel. TYPE_3BYTE_BGR created here is a
    // 0-offset interleaved [B,G,R] byte raster, and the gray value lands
    // identically in all three channels, so the pixels (and therefore the
    // encoded PNG bytes and every closed-form oracle) are unchanged.
    val data = img.getRaster.getDataBuffer
      .asInstanceOf[java.awt.image.DataBufferByte].getData
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val g = ((e * 31 + x * xc + y * yc + x * y * xyc) % 256).toByte
        val off = (y * w + x) * 3
        data(off) = g
        data(off + 1) = g
        data(off + 2) = g
        x += 1
      }
      y += 1
    }
    img
  }

  /** JPEG encode of the SAME closed-form raster as [[syntheticPng]] —
    * real multimodal corpora are JPEG-heavy, and the codec path must
    * prove itself on a LOSSY container too. No closed-form oracle exists
    * for lossy pixels (DCT quantization is encoder-defined), so JPEG
    * features are pinned from committed fixture bytes in MultimodalSpec,
    * and the operational contract is the near-dup one: a JPEG re-encode
    * aHashes within a small Hamming distance of its PNG original (that
    * robustness-to-re-encoding is the entire point of average-hash). */
  def syntheticJpeg(d: Long, quality: Float = 0.9f): Array[Byte] = {
    val img = syntheticImage(d)
    val out = new ByteArrayOutputStream()
    val writer = ImageIO.getImageWritersByFormatName("jpg").next()
    val params = writer.getDefaultWriteParam
    params.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
    params.setCompressionQuality(quality)
    val ios = ImageIO.createImageOutputStream(out)
    try {
      writer.setOutput(ios)
      writer.write(null, new javax.imageio.IIOImage(img, null, null), params)
    } finally { ios.close(); writer.dispose() }
    out.toByteArray
  }

  case class MediaMeta(mime: String, byte_len: Long, sha256: String)
  case class MediaRow(media_id: Long, content: Array[Byte], meta: MediaMeta)
  case class MediaImageFeatures(media_id: Long, width: Option[Int], height: Option[Int],
                                channels: Option[Int], lum_sum: Option[Long],
                                mean_byte: Option[Double], ahash: Option[Long],
                                ahash_bits: Option[String])

  /** Media table of synthetic image payloads — the image-ingestion test
    * stand-in, one real encoded image per input row. `format` selects the
    * container: `"png"` (lossless, closed-form-oracle-adjudicated) or
    * `"jpeg"` (lossy — see [[syntheticJpeg]]); the decode side
    * ([[extractImageFeatures]]) is container-agnostic either way. */
  def imageTable(docs: DataFrame, idCol: String = "doc_id",
                 format: String = "png"): DataFrame = {
    require(format == "png" || format == "jpeg",
      s"imageTable format must be png|jpeg, got $format")
    val spark = docs.sparkSession
    import spark.implicits._
    // Tables.spread (r19): encode is ~50 µs/row and fuses into the scan
    // stage — single-core on a single-file input without this (no-op on
    // multi-file corpora)
    graft.Tables.spread(docs.select(col(idCol).cast("long"))).as[Long].mapPartitions { ids =>
      javax.imageio.ImageIO.setUseCache(false) // no temp file per encode
      val digest = java.security.MessageDigest.getInstance("SHA-256")
      // r19 per-task init (guide §4.5 applied JVM-side): ImageIO.write
      // looks the PNG writer up in the plugin registry ON EVERY IMAGE —
      // measured ~30% of the 143 µs/image encode. One writer per task,
      // re-targeted per image, produces byte-identical output (same
      // writer class, same default params as ImageIO.write's own path).
      val pngWriter =
        if (format == "png") ImageIO.getImageWritersByFormatName("png").next()
        else null
      def encodePng(id: Long): Array[Byte] = {
        val out = new ByteArrayOutputStream()
        val ios = ImageIO.createImageOutputStream(out)
        try {
          pngWriter.setOutput(ios)
          pngWriter.write(null, new javax.imageio.IIOImage(syntheticImage(id), null, null), null)
        } finally ios.close()
        out.toByteArray
      }
      val hex = "0123456789abcdef".toCharArray
      def shaHex(bytes: Array[Byte]): String = {
        val d = digest.digest(bytes)
        val cs = new Array[Char](d.length * 2)
        var i = 0
        while (i < d.length) {
          cs(2 * i) = hex((d(i) >> 4) & 0xF)
          cs(2 * i + 1) = hex(d(i) & 0xF)
          i += 1
        }
        new String(cs)
      }
      ids.map { id =>
        val bytes = if (format == "png") encodePng(id) else syntheticJpeg(id)
        MediaRow(id, bytes, MediaMeta(s"image/$format", bytes.length.toLong, shaHex(bytes)))
      }
    }.toDF()
  }

  /** Catalyst face of [[ImageCodec.decode]] (r20): binary payload →
    * feature struct, null for undecodable/null payloads. Replaces the
    * typed-Dataset round trip in [[extractImageFeatures]]: `as[MediaRow]`
    * deserialized every row into objects (copying the payload AND the
    * unused `meta` struct through the encoder) and re-encoded seven
    * Options per row — per-row overhead on the hottest multimodal path
    * that the expression avoids by reading the binary straight off the
    * InternalRow and writing one GenericInternalRow. CodegenFallback like
    * the other heavyweight kernels: eval IS the compiled decode, and the
    * downstream field extraction stays codegen'd. */
  private[graft] case class ImageFeaturesExpr(
      child: org.apache.spark.sql.catalyst.expressions.Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

    override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
      if (child.dataType == BinaryType)
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires binary, got ${child.dataType.simpleString}")
    override def dataType: DataType = StructType(Seq(
      StructField("width", IntegerType), StructField("height", IntegerType),
      StructField("channels", IntegerType), StructField("lum_sum", LongType),
      StructField("mean_byte", DoubleType), StructField("ahash", LongType),
      StructField("ahash_bits", StringType)))
    override def nullable: Boolean = true
    override def prettyName: String = "image_features"

    // ImageIO defaults to a DISK-backed stream cache — one temp file per
    // decode. Measured on 8/16-px PNGs: 0.60 s → 0.14 s per 5k
    // single-thread and near-linear 16-thread scaling once off. One
    // static setter per deserialized expression instance (idempotent).
    @transient private lazy val ioInit: Unit =
      javax.imageio.ImageIO.setUseCache(false)

    override def nullSafeEval(input: Any): Any = {
      ioInit
      ImageCodec.decode(input.asInstanceOf[Array[Byte]]) match {
        case Some(f) =>
          new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
            Array[Any](f.width, f.height, f.channels, f.lumSum, f.meanByte,
              f.aHash, org.apache.spark.unsafe.types.UTF8String.fromString(f.aHashBits)))
        case None => null
      }
    }

    override protected def withNewChildInternal(
        newChild: org.apache.spark.sql.catalyst.expressions.Expression): ImageFeaturesExpr =
      copy(child = newChild)
  }

  /** REAL image decode as a Catalyst expression over the payload column:
    * embarrassingly parallel, null features (not task failures) for
    * undecodable payloads. Output schema unchanged from the historical
    * typed-Dataset implementation — (media_id, width, height, channels,
    * lum_sum, mean_byte, ahash, ahash_bits). The feature struct is
    * aliased once and field-extracted in a separate projection;
    * CollapseProject keeps a multiply-referenced non-cheap alias intact,
    * so the decode runs ONCE per row (plan-asserted in MultimodalSpec). */
  def extractImageFeatures(media: DataFrame): DataFrame = {
    import org.apache.spark.sql.GraftColumnBridge
    val f = GraftColumnBridge.column(
      ImageFeaturesExpr(GraftColumnBridge.expression(col("content"))))
    media.select(col("media_id"), f.as("__f"))
      .select(col("media_id"),
        col("__f.width").as("width"), col("__f.height").as("height"),
        col("__f.channels").as("channels"), col("__f.lum_sum").as("lum_sum"),
        col("__f.mean_byte").as("mean_byte"), col("__f.ahash").as("ahash"),
        col("__f.ahash_bits").as("ahash_bits"))
  }

  /** Image NEAR-duplicate pairs by banded aHash Hamming join — the
    * cross-container face of image dedup: a JPEG re-encode of a PNG (or
    * any lossy re-save) shifts a few marginal aHash bits, so the exact
    * fingerprint equality of `q_mm_ahash_dedup` misses exactly the pairs
    * that matter most in a crawled corpus.
    *
    * Plan shape: the 64-bit hash splits into `maxHamming + 1`
    * non-overlapping bands (each as WIDE as the budget allows — fewer
    * flips tolerated means fewer, more selective band keys); rows explode
    * to (band, band_bits) keys, candidates equi-join per band (ONE
    * shuffle on the band key — never all-pairs), and the full Hamming
    * distance verifies inside the bucket. Pigeonhole makes candidate
    * recall EXACT: ≤ `maxHamming` flipped bits cannot touch all
    * `maxHamming + 1` bands, so every qualifying pair agrees on at least
    * one band key. Same banding guarantee as MinHash LSH, but
    * deterministic — and `maxHamming = 0` degenerates to the exact
    * 64-bit equality join, one band, no overhead. */
  def aHashNearDupPairs(features: DataFrame, maxHamming: Int = 3,
                        idCol: String = "media_id",
                        fpCol: String = "ahash",
                        maxBucket: Int = 10000): DataFrame = {
    require(maxHamming >= 0 && maxHamming <= 7,
      s"banded aHash join stays selective only for maxHamming in [0,7], got $maxHamming")
    val bands = maxHamming + 1
    val starts = Array.tabulate(bands)(b => (b * 64 / bands).toLong)
    val masks = Array.tabulate(bands) { b =>
      val len = (b + 1) * 64 / bands - b * 64 / bands
      if (len >= 64) -1L else (1L << len) - 1L
    }
    // repartition on the bucket key so the skew guard's count aggregate
    // and the pair join share ONE exchange (the minhash guard's pattern)
    val banded = features
      .where(col(fpCol).isNotNull)
      .select(col(idCol), col(fpCol).as("__fp"),
        explode(sequence(lit(0), lit(bands - 1))).as("band"))
      .withColumn("band_bits",
        expr(s"shiftrightunsigned(__fp, element_at(array(${starts.mkString(",")}), band + 1))")
          .bitwiseAND(expr(s"element_at(array(${masks.map(_ + "L").mkString(",")}), band + 1)")))
      .repartition(col("band"), col("band_bits"))
    // Skew guard (the repo's no-unguarded-quadratic rule): a boilerplate
    // image class — blank pages, one logo crawled a million times — puts
    // its whole duplicate clique into ONE band bucket and Σ|bucket|² goes
    // quadratic exactly like an unguarded MinHash band. Oversized buckets
    // are excluded from candidate generation; a pair inside one can still
    // surface through its other maxHamming bands — only pairs whose EVERY
    // agreeing band is oversized are lost, and for boilerplate classes
    // that is the intended outcome (collapse those with exact dedup
    // first, the same staging order as text).
    val smallBuckets = banded.groupBy("band", "band_bits")
      .agg(count(col(idCol)).as("__n")).filter(col("__n") <= maxBucket)
      .select("band", "band_bits")
    // r19: the guard's key domain is BOUNDED BY CONSTRUCTION — at most
    // Σ_b 2^width(b) distinct (band, band_bits) keys — so when that bound
    // is broadcast-small (maxHamming ≥ 3 keeps every band ≤ 16 bits →
    // ≤ 2^20 keys) the guard join carries an explicit hint: with
    // estimate-driven broadcasts off it would otherwise plan sort-merge
    // and AQE cannot re-plan it (the agg rides the same exchange as the
    // join, so no stage boundary separates them). Wider bands (maxHamming
    // ≤ 2 → ≥ 21-bit keys) keep the co-partitioned join — there the
    // domain bound is corpus-sized and a forced broadcast would be the
    // scale hazard this round removed elsewhere.
    val domainBound = masks.map { m =>
      val width = java.lang.Long.bitCount(m)
      if (width >= 40) Long.MaxValue / bands else 1L << width
    }.sum
    val guardKeys =
      if (domainBound <= (1L << 20)) broadcast(smallBuckets) else smallBuckets
    val bounded = banded.join(guardKeys, Seq("band", "band_bits"))
    val a = bounded.select(col("band"), col("band_bits"),
      col(idCol).as("id_a"), col("__fp").as("fp_a"))
    val b = bounded.select(col("band"), col("band_bits"),
      col(idCol).as("id_b"), col("__fp").as("fp_b"))
    a.join(b, Seq("band", "band_bits")).filter(col("id_a") < col("id_b"))
      .withColumn("hamming", bit_count(col("fp_a").bitwiseXOR(col("fp_b"))))
      .filter(col("hamming") <= maxHamming)
      // a close pair matches several bands; the distance is a pure
      // function of the pair, so the dedup keys on the ids alone
      .dropDuplicates("id_a", "id_b")
      .select(col("id_a"), col("id_b"), col("hamming"))
  }

  /** Real audio codec over the JDK's `javax.sound.sampled` (WAV/PCM —
    * headless-safe file I/O, no audio device touched). Features are
    * integer-exact over the decoded 16-bit samples: `absSum` = Σ|s|,
    * `sqSum` = Σs² (energy; RMS = √(sqSum/n) for library callers),
    * `zeroCrossings` = #{k>0 : s[k-1]·s[k] < 0} (strict sign product —
    * zeros never count). A SQL oracle recomputes all of them from the
    * closed-form fixture samples; the WAV container is lossless PCM, so a
    * correct decode must match exactly. */
  object AudioCodec {
    case class AudioFeatures(sampleRate: Int, channels: Int, nSamples: Int,
                             absSum: Long, sqSum: Long, zeroCrossings: Int)

    /** SPI providers resolved ONCE per JVM. `AudioSystem.getAudioInputStream`
      * funnels every call through `JDK13Services.getProviders`, a
      * JVM-GLOBAL synchronized — measured: 150k tiny WAVs decoded in 50 s
      * on 32 cores through AudioSystem vs ~1 s with the providers cached
      * (32 threads convoying on one class lock, SLOWER than a single
      * thread). Same public `javax.sound.sampled.spi` contract, lock paid
      * once. */
    private lazy val fileReaders: List[javax.sound.sampled.spi.AudioFileReader] = {
      import scala.jdk.CollectionConverters._
      java.util.ServiceLoader.load(classOf[javax.sound.sampled.spi.AudioFileReader])
        .asScala.toList
    }
    private[Multimodal] lazy val fileWriters: List[javax.sound.sampled.spi.AudioFileWriter] = {
      import scala.jdk.CollectionConverters._
      java.util.ServiceLoader.load(classOf[javax.sound.sampled.spi.AudioFileWriter])
        .asScala.toList
    }

    /** Last reader that accepted a payload — tried FIRST. Provider order
      * matters enormously: the JDK registers its MIDI reader before the
      * WAVE reader, and the MIDI reader's REJECTION path itself calls
      * `MidiSystem.getProviders` (the same global lock) — so without this
      * memo every WAV decode paid a provider-scan lock just to be told
      * "not MIDI" (thread-dump-confirmed convoy on
      * JSSecurityManager.class). A homogeneous corpus hits its memoized
      * reader directly after the first record. */
    private val preferred =
      new java.util.concurrent.atomic.AtomicReference[javax.sound.sampled.spi.AudioFileReader]()

    private def readStream(bytes: Array[Byte]): javax.sound.sampled.AudioInputStream = {
      val memo = preferred.get()
      if (memo != null) {
        try return memo.getAudioInputStream(new ByteArrayInputStream(bytes))
        catch { case _: Exception => () } // different format: full scan below
      }
      val it = fileReaders.iterator
      while (it.hasNext) {
        val r = it.next()
        if (r ne memo) {
          try {
            val s = r.getAudioInputStream(new ByteArrayInputStream(bytes))
            preferred.set(r)
            return s
          } catch { case _: Exception => () } // not this provider's format
        }
      }
      null
    }

    def decode(bytes: Array[Byte]): Option[AudioFeatures] = {
      val in = readStream(bytes)
      if (in == null) return None
      try {
        val fmt = in.getFormat
        // signed 16-bit PCM only — and honor the container's byte order:
        // WAV is little-endian but AIFF/AU decode as BIG-endian through
        // the same reader set; assuming LE would emit byte-swapped
        // garbage as valid-looking features
        if (fmt.getSampleSizeInBits != 16 ||
          fmt.getEncoding != javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED)
          return None
        val big = fmt.isBigEndian
        val data = in.readAllBytes()
        val frameCh = fmt.getChannels
        val n = data.length / 2
        var absSum = 0L
        var sqSum = 0L
        var crossings = 0
        // PER-CHANNEL previous sample: the stream is channel-interleaved,
        // and comparing neighbors across channels counts L/R polarity
        // differences as "crossings" (a stereo clip of two constant
        // opposite-sign channels would report ~2 crossings per frame);
        // mono behavior is unchanged
        val prevCh = new Array[Int](math.max(frameCh, 1))
        val seenCh = new Array[Boolean](math.max(frameCh, 1))
        var i = 0
        while (i < n) {
          val s =
            if (big) (data(2 * i).toInt << 8) | (data(2 * i + 1) & 0xff)
            else (data(2 * i + 1).toInt << 8) | (data(2 * i) & 0xff)
          absSum += math.abs(s)
          sqSum += s.toLong * s
          val ch = i % math.max(frameCh, 1)
          if (seenCh(ch) && prevCh(ch).toLong * s < 0) crossings += 1
          prevCh(ch) = s
          seenCh(ch) = true
          i += 1
        }
        Some(AudioFeatures(fmt.getSampleRate.toInt, frameCh, n / frameCh,
          absSum, sqSum, crossings))
      } catch { case _: Exception => None } finally in.close()
    }
  }

  /** Deterministic WAV fixture for id `d`: 16-bit PCM mono at 8 kHz with
    * `64 + d % 64` samples of closed-form value
    * `s[k] = ((d*131 + k*17) % 65536) - 32768` — the audio twin of
    * [[syntheticPng]], so a SQL oracle derives the expected decoded
    * features from `d` alone.
    *
    * @param nSamples override the clip length (>0) — the probe knob for
    *                 measuring how per-clip decoder setup amortizes on
    *                 realistic (ms-to-seconds) clips; `-1` keeps the
    *                 oracle-gated 64–127-sample closed form. */
  def syntheticWav(d: Long, nSamples: Int = -1): Array[Byte] = {
    import javax.sound.sampled._
    val n = if (nSamples > 0) nSamples
      else (64 + java.lang.Math.floorMod(d, 64L)).toInt
    val pcm = new Array[Byte](n * 2)
    var k = 0
    while (k < n) {
      // floorMod: a negative id's % lands below -32768 and the 16-bit
      // packing silently wraps it to a DIFFERENT sample than the
      // documented closed form; for non-negative ids floorMod == %
      val s = (java.lang.Math.floorMod(d * 131 + k * 17, 65536L) - 32768L).toInt
      pcm(2 * k) = (s & 0xff).toByte
      pcm(2 * k + 1) = ((s >> 8) & 0xff).toByte
      k += 1
    }
    val fmt = new AudioFormat(8000f, 16, 1, true, false) // signed PCM16 LE mono
    val stream = new AudioInputStream(new ByteArrayInputStream(pcm), fmt, n.toLong)
    val out = new ByteArrayOutputStream()
    // direct SPI writer (cached) — AudioSystem.write pays the same global
    // provider lock as the read path; see AudioCodec.fileReaders
    AudioCodec.fileWriters.find(_.isFileTypeSupported(AudioFileFormat.Type.WAVE, stream))
      .getOrElse(throw new IllegalStateException("no WAVE writer in this JVM"))
      .write(stream, AudioFileFormat.Type.WAVE, out)
    out.toByteArray
  }

  case class MediaAudioFeatures(media_id: Long, sample_rate: Option[Int],
                                channels: Option[Int], n_samples: Option[Int],
                                abs_sum: Option[Long], sq_sum: Option[Long],
                                zero_crossings: Option[Int])

  /** Media table of [[syntheticWav]] payloads — one real WAV per row.
    * `nSamples > 0` fixes every clip's length (probe use only; the
    * default keeps the oracle-gated id-derived lengths). */
  def audioTable(docs: DataFrame, idCol: String = "doc_id",
                 nSamples: Int = -1): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    // Tables.spread: per-row synth+sha fuses into the scan (see imageTable)
    graft.Tables.spread(docs.select(col(idCol).cast("long"))).as[Long].mapPartitions { ids =>
      val digest = java.security.MessageDigest.getInstance("SHA-256")
      ids.map { id =>
        val bytes = syntheticWav(id, nSamples)
        val sha = digest.digest(bytes).map("%02x".format(_)).mkString
        MediaRow(id, bytes, MediaMeta("audio/wav", bytes.length.toLong, sha))
      }
    }.toDF()
  }

  /** Partition-wise REAL audio decode — same batch shape and null-safety
    * contract as [[extractImageFeatures]]. */
  def extractAudioFeatures(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.as[MediaRow].mapPartitions { rows =>
      rows.map { r =>
        val f = Option(r.content).flatMap(AudioCodec.decode)
        MediaAudioFeatures(r.media_id, f.map(_.sampleRate), f.map(_.channels),
          f.map(_.nSamples), f.map(_.absSum), f.map(_.sqSum),
          f.map(_.zeroCrossings))
      }
    }.toDF()
  }

  /** Real MP4/ISO-BMFF container metadata parser — the video face of the
    * codec family. The JDK has no video DECODER, but the metadata a
    * training-data pipeline actually needs (duration, dimensions, track
    * count, brand) lives in the container's box structure, which is pure
    * byte parsing: `[u32 size][4cc type][payload]` boxes, `moov/mvhd`
    * carrying timescale + duration, one `trak/tkhd` per track carrying
    * 16.16-fixed width/height. Frame DECODING would need an ffmpeg
    * binding; the parser is real. */
  object Mp4Meta {
    case class VideoMeta(brand: String, timescale: Int, durationMs: Long,
                         nTracks: Int, width: Int, height: Int)

    def parse(bytes: Array[Byte]): Option[VideoMeta] =
      try parseBoxes(bytes) catch { case _: Exception => None }

    private def u32(b: Array[Byte], o: Int): Long =
      ((b(o) & 0xffL) << 24) | ((b(o + 1) & 0xffL) << 16) |
        ((b(o + 2) & 0xffL) << 8) | (b(o + 3) & 0xffL)
    private def fourcc(b: Array[Byte], o: Int): String =
      new String(b, o, 4, java.nio.charset.StandardCharsets.US_ASCII)

    /** Walk `[lo, hi)` yielding (type, payloadStart, payloadEnd). */
    private def boxes(b: Array[Byte], lo: Int, hi: Int): Iterator[(String, Int, Int)] =
      new Iterator[(String, Int, Int)] {
        private var p = lo
        override def hasNext: Boolean = p + 8 <= hi
        override def next(): (String, Int, Int) = {
          val size32 = u32(b, p)
          val tpe = fourcc(b, p + 4)
          // ISO-BMFF size escapes: 0 = box extends to end of enclosure;
          // 1 = 64-bit largesize follows the type (files > 4 GB put it
          // on mdat — metadata parsing must walk past, not abort)
          val (payloadStart, size) =
            if (size32 == 0) (p + 8, (hi - p).toLong)
            else if (size32 == 1) {
              if (p + 16 > hi)
                throw new IllegalArgumentException(s"truncated largesize at $p")
              (p + 16, (u32(b, p + 8) << 32) | u32(b, p + 12))
            } else (p + 8, size32)
          if (size < payloadStart - p || p + size > hi)
            throw new IllegalArgumentException(s"bad box size $size at $p")
          val r = (tpe, payloadStart, p + size.toInt)
          p += size.toInt
          r
        }
      }

    private def parseBoxes(b: Array[Byte]): Option[VideoMeta] = {
      var brand: String = null
      var timescale = 0
      var duration = 0L
      var tracks = 0
      var width = 0
      var height = 0
      boxes(b, 0, b.length).foreach {
        case ("ftyp", s, _) => brand = fourcc(b, s)
        case ("moov", ms, me) =>
          boxes(b, ms, me).foreach {
            case ("mvhd", s, _) =>
              // v0: [ver+flags 4][creation 4][modification 4]
              //     [timescale 4][duration 4]
              // v1 (64-bit times, common ffmpeg output for long files):
              //     [ver+flags 4][creation 8][modification 8]
              //     [timescale 4][duration 8]
              b(s) & 0xff match {
                case 0 =>
                  timescale = u32(b, s + 12).toInt
                  duration = u32(b, s + 16)
                case 1 =>
                  timescale = u32(b, s + 20).toInt
                  duration = (u32(b, s + 24) << 32) | u32(b, s + 28)
                case v => throw new IllegalArgumentException(s"mvhd version $v")
              }
            case ("trak", ts, te) =>
              tracks += 1
              boxes(b, ts, te).foreach {
                case ("tkhd", s, e) if width == 0 =>
                  // v0 tkhd: width/height are the LAST two 16.16 fields
                  width = (u32(b, e - 8) >> 16).toInt
                  height = (u32(b, e - 4) >> 16).toInt
                case _ => ()
              }
            case _ => ()
          }
        case _ => ()
      }
      if (brand == null || timescale == 0) None
      else Some(VideoMeta(brand, timescale, duration * 1000L / timescale,
        tracks, width, height))
    }
  }

  /** Deterministic minimal MP4 fixture for id `d`: `ftyp(isom)` + `moov`
    * with an mvhd (timescale 1000, duration `1000 + d%9000` ms) and
    * `1 + d%2` tracks whose tkhd carries width `16·(1 + d%4)` / height
    * `16·(1 + (d/4)%4)` — closed-form, so a SQL oracle derives the
    * expected parsed metadata from `d`. */
  def syntheticMp4(d: Long): Array[Byte] = {
    def be32(v: Long): Array[Byte] =
      Array(((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
        ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
    def box(tpe: String, payload: Array[Byte]): Array[Byte] =
      be32(payload.length + 8L) ++ tpe.getBytes("US-ASCII") ++ payload
    val ftyp = box("ftyp", "isom".getBytes("US-ASCII") ++ be32(0) ++
      "isom".getBytes("US-ASCII"))
    val durMs = 1000 + d % 9000
    val mvhd = box("mvhd", be32(0) ++ be32(0) ++ be32(0) ++
      be32(1000) ++ be32(durMs) ++ Array.fill[Byte](80)(0))
    val w = (16 * (1 + d % 4)).toInt
    val h = (16 * (1 + (d / 4) % 4)).toInt
    def tkhd(trackId: Int) = box("tkhd",
      be32(0) ++ be32(0) ++ be32(0) ++ be32(trackId.toLong) ++ be32(0) ++
        be32(durMs) ++ Array.fill[Byte](52)(0) ++
        be32(w.toLong << 16) ++ be32(h.toLong << 16))
    val nTracks = (1 + d % 2).toInt
    val traks = (1 to nTracks).map(i => box("trak", tkhd(i)))
      .foldLeft(Array.emptyByteArray)(_ ++ _)
    ftyp ++ box("moov", mvhd ++ traks)
  }

  case class MediaVideoMeta(media_id: Long, brand: Option[String],
                            duration_ms: Option[Long], n_tracks: Option[Int],
                            width: Option[Int], height: Option[Int])

  /** Media table of [[syntheticMp4]] payloads — one real MP4 container
    * per row. */
  def videoTable(docs: DataFrame, idCol: String = "doc_id"): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    // Tables.spread: per-row synth+sha fuses into the scan (see imageTable)
    graft.Tables.spread(docs.select(col(idCol).cast("long"))).as[Long].mapPartitions { ids =>
      val digest = java.security.MessageDigest.getInstance("SHA-256")
      ids.map { id =>
        val bytes = syntheticMp4(id)
        val sha = digest.digest(bytes).map("%02x".format(_)).mkString
        MediaRow(id, bytes, MediaMeta("video/mp4", bytes.length.toLong, sha))
      }
    }.toDF()
  }

  /** Partition-wise container-metadata extraction — same batch shape and
    * null-safety contract as the image/audio codecs. */
  def extractVideoMeta(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.as[MediaRow].mapPartitions { rows =>
      rows.map { r =>
        val m = Option(r.content).flatMap(Mp4Meta.parse)
        MediaVideoMeta(r.media_id, m.map(_.brand), m.map(_.durationMs),
          m.map(_.nTracks), m.map(_.width), m.map(_.height))
      }
    }.toDF()
  }

  /** Deterministic frame sampling plan for video-like payloads: every
    * `stride`-th frame index up to `nFrames` — pure column math over the
    * container-metadata frame count, so the frame list is computed without
    * touching payload bytes. */
  def sampleFrames(media: DataFrame, nFramesCol: String = "n_frames", stride: Int = 4): DataFrame = {
    // fail at the API boundary, not as a per-row 'step must not be zero'
    // stage failure deep inside the job (the writeShards/maxBucket guard
    // convention)
    require(stride > 0, s"stride must be positive: $stride")
    media.withColumn("sampled_frames",
      // zero or NULL frames -> EMPTY plan, not [0]: there is no frame 0
      // of a frameless (or undecodable) payload
      when(col(nFramesCol).isNull || col(nFramesCol) <= 0,
        array().cast("array<int>"))
        .otherwise(sequence(lit(0), col(nFramesCol) - 1, lit(stride))))
  }
}
