package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq((1L, "hello world"), (2L, ""), (3L, "spark multimodal plumbing"))
    .toDF("doc_id", "text")

  test("packBinary produces binary payload + typed metadata") {
    val media = Multimodal.packBinary(docs)
    val r = media.filter(col("media_id") === 1).head()
    assert(new String(r.getAs[Array[Byte]]("content"), "UTF-8") == "hello world")
    val meta = r.getStruct(2)
    assert(meta.getAs[String]("mime") == "text/plain")
    assert(meta.getAs[Long]("byte_len") == 11L)
    assert(meta.getAs[String]("sha256").length == 64)
  }

  // the generator's closed form (id coefficients + x*y curvature + the
  // %17 twin plant) — specs recompute expectations from it directly
  private def gpix(d: Long, x: Int, y: Int): Long = {
    val e = Multimodal.rasterSeed(d)
    (e * 31 + x * (7 + e % 11) + y * (13 + (e / 11) % 13) + x * y * ((e / 143) % 7)) % 256
  }

  test("ImageCodec decodes a real PNG to the closed-form pixel features") {
    // id=0: 8x8, e=0 -> g(x,y) = (7x + 13y) % 256 — expectations direct
    val d = 0L
    val f = Multimodal.ImageCodec.decode(Multimodal.syntheticPng(d)).get
    assert(f.width == 8 && f.height == 8 && f.channels == 3)
    val g = for (y <- 0 until 8; x <- 0 until 8) yield gpix(d, x, y)
    assert(f.lumSum == 3 * g.sum, s"lumSum=${f.lumSum} expected=${3 * g.sum}")
    // aHash: block (bx,by) is the single pixel (bx,by) at 8x8
    val total = g.sum
    val expectedBits = (0 until 64).map { j =>
      val (bx, by) = (j % 8, j / 8)
      if (g(by * 8 + bx) * 64 > total) '1' else '0'
    }.mkString
    assert(f.aHashBits == expectedBits, s"${f.aHashBits} vs $expectedBits")
    // numeric hash agrees with the bit string (bit j = char j)
    (0 until 64).foreach { j =>
      assert(((f.aHash >>> j) & 1L) == (if (expectedBits(j) == '1') 1L else 0L))
    }
  }

  test("16x16 fixture: varying block sizes, channels and size decode correctly") {
    // id=3: w = 8*(1+3%2) = 16, h = 8*(1+(3/2)%2) = 16, xc = 7+3 = 10
    val f = Multimodal.ImageCodec.decode(Multimodal.syntheticPng(3L)).get
    assert(f.width == 16 && f.height == 16 && f.channels == 3)
    val g = for (y <- 0 until 16; x <- 0 until 16) yield gpix(3L, x, y)
    assert(f.lumSum == 3 * g.sum)
  }

  test("rasterSeed plants byte-identical twins every 17th id, distinct rasters elsewhere") {
    // d % 17 == 0 reuses d-1's raster: PNG bytes (and so aHash) identical
    assert(Multimodal.syntheticPng(17L).sameElements(Multimodal.syntheticPng(16L)))
    assert(Multimodal.syntheticPng(34L).sameElements(Multimodal.syntheticPng(33L)))
    assert(Multimodal.rasterSeed(0L) == 0L) // id 0 has no predecessor
    // neighbors that are NOT twin-planted draw distinct rasters (the
    // entropy fix: the old 256-phase raster saturated at ~1k distinct
    // images and made near-dup output quadratic in corpus size)
    assert(!Multimodal.syntheticPng(18L).sameElements(Multimodal.syntheticPng(17L)))
    val hashes = (0L until 400L)
      .map(d => Multimodal.ImageCodec.decode(Multimodal.syntheticPng(d)).get.aHash)
    // 400 ids: 23 planted twins collapse, the rest stay nearly all distinct
    assert(hashes.distinct.size > 300, s"raster space saturated: ${hashes.distinct.size}")
  }

  test("palette GIF hashes expanded luminance, not palette indices") {
    // adversarial palette: index 0 = WHITE, index 1 = BLACK — hashing raw
    // raster indices would set the bits of exactly the WRONG half
    import java.awt.image.{BufferedImage, IndexColorModel}
    val cmap = new IndexColorModel(8, 2,
      Array(255.toByte, 0.toByte), Array(255.toByte, 0.toByte),
      Array(255.toByte, 0.toByte))
    val img = new BufferedImage(16, 16, BufferedImage.TYPE_BYTE_INDEXED, cmap)
    val raster = img.getRaster
    for (y <- 0 until 16; x <- 0 until 16)
      raster.setSample(x, y, 0, if (x < 8) 0 else 1) // left WHITE, right BLACK
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "gif", out)
    val f = Multimodal.ImageCodec.decode(out.toByteArray).get
    // luminance: left half 3*255=765 per pixel, right half 0; mean 382.5 —
    // the LEFT half's blocks (hash bit columns 0-3 of every row) are set
    val expected = (0 until 8).map(r => "1111" + "0000").mkString
    assert(f.aHashBits == expected, f.aHashBits)
    assert(f.lumSum == 128L * 765, f.lumSum.toString)
  }

  test("16-bit raster: full sample depth honored; BigInt guard keys on depth") {
    import java.awt.image.BufferedImage
    // 8x8 16-bit gray: pixel (x,y) = 257*(8x+y) — distinct 16-bit values
    val img = new BufferedImage(8, 8, BufferedImage.TYPE_USHORT_GRAY)
    for (y <- 0 until 8; x <- 0 until 8)
      img.getRaster.setSample(x, y, 0, 257 * (8 * x + y))
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    val f = Multimodal.ImageCodec.decode(out.toByteArray).get
    val vals = for (y <- 0 until 8; x <- 0 until 8) yield 257L * (8 * x + y)
    assert(f.lumSum == vals.sum, s"${f.lumSum} vs ${vals.sum}") // 16-bit, not truncated
    // 8x8 image: each hash block is one pixel; bit j=(y*8+x) set iff
    // pixel*64 > total (mean = total/64)
    val total = vals.sum
    val expected = (for (y <- 0 until 8; x <- 0 until 8)
      yield if (257L * (8 * x + y) * 64 > total) '1' else '0').mkString
    assert(f.aHashBits == expected, f.aHashBits)
    // the overflow guard triggers ~40x sooner for 16-bit than 8-bit rasters
    import Multimodal.ImageCodec.needsBigInt
    assert(!needsBigInt(765L, 100000000L))      // 8-bit RGB, 1e8 px: exact in Long
    assert(needsBigInt(765L, 4000000000L))      // 8-bit RGB, 4e9 px: overflows
    assert(needsBigInt(65535L, 100000000L))     // 16-bit gray, 1e8 px: overflows
    assert(needsBigInt(65535L, 12000000L))      // 16-bit gray, 1.2e7 px: overflows
    assert(!needsBigInt(65535L, 10000000L))     // 16-bit gray, 1e7 px: still exact
  }

  test("extractImageFeatures is deterministic, partition-parallel, null-safe") {
    val media = Multimodal.imageTable(docs).repartition(3)
    def run() = Multimodal.extractImageFeatures(media)
      .select("media_id", "width", "height", "lum_sum", "ahash_bits")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getLong(3),
        r.getString(4))).sortBy(_._1).toSeq
    val f1 = run(); val f2 = run()
    assert(f1 == f2 && f1.map(_._1) == Seq(1L, 2L, 3L))
    // corrupt payload -> null features, not a task failure
    val corrupt = Seq((9L, Array[Byte](1, 2, 3),
      Multimodal.MediaMeta("image/png", 3L, "x"))).toDF("media_id", "content", "meta")
    val r = Multimodal.extractImageFeatures(corrupt).head()
    assert(r.isNullAt(r.fieldIndex("width")) && r.isNullAt(r.fieldIndex("ahash_bits")))
  }

  test("extractImageFeatures evaluates the decode expression ONCE per row " +
    "(field extraction must not collapse into seven decodes)") {
    val plan = Multimodal.extractImageFeatures(Multimodal.imageTable(docs))
      .queryExecution.executedPlan.toString
    val n = "image_features\\(".r.findAllIn(plan).length
    assert(n == 1, s"expected exactly one image_features eval in the plan, got $n:\n$plan")
  }

  test("AudioCodec decodes a real WAV to the closed-form sample features") {
    val d = 5L
    val f = Multimodal.AudioCodec.decode(Multimodal.syntheticWav(d)).get
    val n = (64 + d % 64).toInt
    val s = (0 until n).map(k => ((d * 131 + k * 17) % 65536 - 32768).toInt)
    assert(f.sampleRate == 8000 && f.channels == 1 && f.nSamples == n)
    assert(f.absSum == s.map(x => math.abs(x).toLong).sum)
    assert(f.sqSum == s.map(x => x.toLong * x).sum)
    assert(f.zeroCrossings ==
      s.sliding(2).count(p => p.head.toLong * p(1) < 0))
    // corrupt payload -> None, not an exception
    assert(Multimodal.AudioCodec.decode(Array[Byte](9, 9, 9)).isEmpty)
  }

  test("extractAudioFeatures: null-safe typed decode over the media table") {
    val media = Multimodal.audioTable(docs).repartition(2)
    val rows = Multimodal.extractAudioFeatures(media)
      .select("media_id", "n_samples", "sq_sum")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).sortBy(_._1)
    assert(rows.map(_._1).toSeq == Seq(1L, 2L, 3L))
    assert(rows.forall(r => r._2 == 64 + r._1 % 64 && r._3 > 0))
  }

  test("Mp4Meta parses a real ISO-BMFF container to the closed-form fields") {
    val d = 7L
    val m = Multimodal.Mp4Meta.parse(Multimodal.syntheticMp4(d)).get
    assert(m.brand == "isom" && m.timescale == 1000)
    assert(m.durationMs == 1000 + d % 9000)
    assert(m.nTracks == (1 + d % 2).toInt)
    assert(m.width == 16 * (1 + d % 4) && m.height == 16 * (1 + (d / 4) % 4))
    // truncated/garbage payloads -> None, never a task failure
    assert(Multimodal.Mp4Meta.parse(Multimodal.syntheticMp4(d).take(10)).isEmpty)
    assert(Multimodal.Mp4Meta.parse(Array[Byte](1, 2, 3, 4)).isEmpty)
  }

  test("Mp4Meta reads version-1 mvhd (64-bit times) correctly") {
    def be32(v: Long): Array[Byte] =
      Array(((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
        ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
    def box(tpe: String, payload: Array[Byte]): Array[Byte] =
      be32(payload.length + 8L) ++ tpe.getBytes("US-ASCII") ++ payload
    // v1 mvhd: [ver=1 + flags][creation 8][modification 8][timescale 4]
    // [duration 8] + the remaining 80 fixed bytes
    val mvhdV1 = box("mvhd",
      Array[Byte](1, 0, 0, 0) ++ Array.fill[Byte](16)(0) ++
        be32(600) ++ be32(0) ++ be32(3000) ++ Array.fill[Byte](80)(0))
    val mp4 = box("ftyp", "isom".getBytes("US-ASCII") ++ be32(0)) ++ box("moov", mvhdV1)
    val m = Multimodal.Mp4Meta.parse(mp4).get
    assert(m.timescale == 600 && m.durationMs == 3000L * 1000 / 600, m.toString)
    // unknown versions refuse rather than misparse
    val mvhdV9 = box("mvhd", Array[Byte](9, 0, 0, 0) ++ Array.fill[Byte](96)(0))
    assert(Multimodal.Mp4Meta.parse(
      box("ftyp", "isom".getBytes("US-ASCII") ++ be32(0)) ++ box("moov", mvhdV9)).isEmpty)
  }

  test("AudioCodec honors container byte order: AIFF decodes equal to WAV") {
    import javax.sound.sampled._
    val d = 11L
    val wavFeatures = Multimodal.AudioCodec.decode(Multimodal.syntheticWav(d)).get
    // same PCM samples packaged as big-endian AIFF via the JDK writer
    val n = (64 + d % 64).toInt
    val pcmBE = new Array[Byte](n * 2)
    (0 until n).foreach { k =>
      val s = (((d * 131 + k * 17) % 65536) - 32768).toInt
      pcmBE(2 * k) = ((s >> 8) & 0xff).toByte
      pcmBE(2 * k + 1) = (s & 0xff).toByte
    }
    val fmt = new AudioFormat(8000f, 16, 1, true, true) // signed PCM16 BE
    val out = new java.io.ByteArrayOutputStream()
    AudioSystem.write(
      new AudioInputStream(new java.io.ByteArrayInputStream(pcmBE), fmt, n.toLong),
      AudioFileFormat.Type.AIFF, out)
    val aiff = Multimodal.AudioCodec.decode(out.toByteArray).get
    assert(aiff.absSum == wavFeatures.absSum && aiff.sqSum == wavFeatures.sqSum &&
      aiff.zeroCrossings == wavFeatures.zeroCrossings,
      s"$aiff vs $wavFeatures")
  }

  test("sampleFrames emits strided frame indices without touching bytes") {
    val out = Multimodal.sampleFrames(
      Multimodal.packBinary(docs)
        .withColumn("n_frames", (lit(1) + col("meta.byte_len") % 16).cast("int")),
      stride = 4)
    val frames = out.filter(col("media_id") === 3).head()
      .getAs[scala.collection.Seq[Int]]("sampled_frames")
    assert(frames.nonEmpty && frames.head == 0 && frames.forall(_ % 4 == 0))
  }

  test("sampleFrames: zero or NULL frame counts plan NO frames, not [0]") {
    val m = Seq((1L, Some(0)), (2L, None), (3L, Some(5)))
      .toDF("media_id", "n_frames")
    val rows = Multimodal.sampleFrames(m, stride = 4)
      .collect().map(r => r.getLong(0) ->
        r.getAs[scala.collection.Seq[Int]]("sampled_frames")).toMap
    assert(rows(1L).isEmpty && rows(2L).isEmpty, rows.toString)
    assert(rows(3L) == Seq(0, 4), rows(3L).toString)
  }

  test("Mp4Meta walks largesize (size==1) and to-end (size==0) boxes") {
    def be32(v: Long): Array[Byte] =
      Array(((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
        ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
    def box(tpe: String, payload: Array[Byte]): Array[Byte] =
      be32(payload.length + 8L) ++ tpe.getBytes("US-ASCII") ++ payload
    val base = Multimodal.syntheticMp4(0L)
    // a largesize mdat BETWEEN ftyp and moov must be walked past, and a
    // final size==0 free box (extends to EOF) must terminate cleanly
    val ftypLen = 20 // built by syntheticMp4: 12B ftyp payload + 8B header
    val (ftyp, rest) = base.splitAt(ftypLen)
    val mdatPayload = Array.fill[Byte](10)(7)
    val mdat64 = be32(1L) ++ "mdat".getBytes("US-ASCII") ++
      Array[Byte](0, 0, 0, 0) ++ be32(16L + mdatPayload.length) ++ mdatPayload
    val free0 = be32(0L) ++ "free".getBytes("US-ASCII") ++ Array.fill[Byte](4)(0)
    val m = Multimodal.Mp4Meta.parse(ftyp ++ mdat64 ++ rest ++ free0).get
    val expected = Multimodal.Mp4Meta.parse(base).get
    assert(m == expected, s"$m vs $expected")
  }

  test("JPEG: committed fixture bytes decode to the pinned features") {
    // JPEG is lossy with encoder-defined quantization, so there is no
    // closed-form oracle; the contract is pinned against COMMITTED bytes
    // (decode is standardized and stable; re-encoding is not — regenerate
    // via graft.tools.GenJpegFixtures only when the contract changes).
    def fixture(name: String): Array[Byte] = {
      val in = getClass.getResourceAsStream(s"/graft/$name")
      assert(in != null, s"missing committed fixture $name")
      try in.readAllBytes() finally in.close()
    }
    val f0 = Multimodal.ImageCodec.decode(fixture("img_d0_q90.jpg")).get
    assert(f0.width == 8 && f0.height == 8 && f0.channels == 3)
    assert(f0.lumSum == 13416L, s"lumSum drifted: ${f0.lumSum}")
    assert(f0.aHashBits ==
      "0000000000000000000000010000011100011111011111111111111111111111",
      f0.aHashBits)
    val f3 = Multimodal.ImageCodec.decode(fixture("img_d3_q90.jpg")).get
    assert(f3.width == 16 && f3.height == 16 && f3.channels == 3)
    assert(f3.lumSum == 95556L, s"lumSum drifted: ${f3.lumSum}")
    assert(f3.aHashBits ==
      "0011111111111110111111001111000011100000110000000000001100000111",
      f3.aHashBits)
    // the lossy decode stays CLOSE to the lossless original - the whole
    // premise of hashing decoded pixels (PNG d0 lumSum is 13440: 0.2% off)
    val p0 = Multimodal.ImageCodec.decode(Multimodal.syntheticPng(0L)).get
    assert(math.abs(f0.lumSum - p0.lumSum) * 100 < p0.lumSum,
      s"JPEG luminance >1% off PNG: ${f0.lumSum} vs ${p0.lumSum}")
  }

  test("imageTable(format=jpeg): real JPEGs flow the same decode plumbing") {
    val ids = (0L until 12L).map(d => (d, s"t$d")).toDF("doc_id", "text")
    val feats = Multimodal.extractImageFeatures(
      Multimodal.imageTable(ids, format = "jpeg"))
    val rows = feats.collect()
    assert(rows.length == 12 && rows.forall(!_.isNullAt(1)), "undecodable JPEG")
    val mimes = Multimodal.imageTable(ids, format = "jpeg")
      .select("meta.mime").distinct().collect().map(_.getString(0)).toSeq
    assert(mimes == Seq("image/jpeg"))
    intercept[IllegalArgumentException] {
      Multimodal.imageTable(ids, format = "tiff")
    }
  }

  test("aHash near-dup pairs every PNG with its JPEG re-encode across containers") {
    // the actual corpus-cleaning case: the same image saved twice, once
    // lossless and once lossy - exact-hash dedup misses it, banded
    // Hamming join must catch it
    val n = 24L
    val ids = (0L until n).map(d => (d, s"t$d")).toDF("doc_id", "text")
    val png = Multimodal.extractImageFeatures(Multimodal.imageTable(ids))
    val jpg = Multimodal.extractImageFeatures(
        Multimodal.imageTable(ids, format = "jpeg"))
      .withColumn("media_id", col("media_id") + 1000L)
    val pairs = Multimodal.aHashNearDupPairs(png.unionByName(jpg), maxHamming = 7)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    val crossCodec = pairs.collect { case (a, b, h) if b == a + 1000L => a -> h }.toMap
    val missing = (0L until n).filterNot(crossCodec.contains)
    assert(missing.isEmpty,
      s"re-encodes not paired for ids $missing (found ${crossCodec.keySet.toSeq.sorted})")
    // and the distances are genuinely small - aHash robustness, measured
    assert(crossCodec.values.forall(_ <= 7))
  }

  test("aHashNearDupPairs at maxHamming=0 equals the exact-equality join") {
    val ids = (0L until 40L).map(d => (d, s"t$d")).toDF("doc_id", "text")
    val f = Multimodal.extractImageFeatures(Multimodal.imageTable(ids))
    val banded = Multimodal.aHashNearDupPairs(f, maxHamming = 0)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = f.as("a").join(f.as("b"), Seq("ahash"))
      .filter(col("a.media_id") < col("b.media_id"))
      .select(col("a.media_id"), col("b.media_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(banded == exact)
    intercept[IllegalArgumentException] {
      Multimodal.aHashNearDupPairs(f, maxHamming = 8)
    }
  }

  test("the guarded GATE's bucket bound genuinely fires at gate scale (sf0.01)") {
    // q_mm_ahash_neardup_guarded exists to adjudicate the guard PATH; if
    // corpus generation or the bound ever drifts so that no sf0.01 band
    // bucket exceeds AHashGateMaxBucket, the gate silently degrades into
    // a duplicate of the unguarded one — this pin goes red instead
    import graft.queries.PipelineQueries
    val qs = graft.SparkEntry.queries
    val unguarded = qs("q_mm_ahash_neardup")(spark, sf("sf0.01")).count()
    val guarded = qs("q_mm_ahash_neardup_guarded")(spark, sf("sf0.01")).count()
    assert(guarded < unguarded,
      s"guard did not fire at gate scale: $guarded vs $unguarded " +
        s"(bound ${PipelineQueries.AHashGateMaxBucket})")
    assert(guarded > 0, "guard must drop buckets, not the whole result")
  }

  test("aHashNearDupPairs skew guard drops boilerplate cliques, keeps honest pairs") {
    import spark.implicits._
    // 40 copies of ONE hash (the blank-page clique) + two near twins
    val clique = (0L until 40L).map(id => (id, 0x0123456789abcdefL))
    val twins = Seq((100L, 0x7000000000000001L), (101L, 0x7000000000000003L)) // hamming 1
    val f = (clique ++ twins).toDF("media_id", "ahash")
    val guarded = Multimodal.aHashNearDupPairs(f, maxHamming = 3, maxBucket = 10)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // every band of the clique is one 40-member bucket > 10 -> excluded;
    // the twins' buckets are tiny -> kept
    assert(guarded == Set((100L, 101L)), guarded.toString)
    // without the guard the clique contributes C(40,2) = 780 pairs
    val unguarded = Multimodal.aHashNearDupPairs(f, maxHamming = 3).count()
    assert(unguarded == 781L, unguarded.toString)
  }
}