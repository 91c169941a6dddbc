package graft.tools

import graft.ops.Multimodal

/** One-off generator for the committed JPEG fixtures MultimodalSpec pins
  * its lossy-codec constants against. Re-run (`sbt "Test/runMain
  * graft.tools.GenJpegFixtures"`) only when the fixture contract changes
  * — the WHOLE POINT of committing the bytes is that the spec decodes
  * the same bits forever, instead of trusting every future JDK's JPEG
  * ENCODER to quantize identically (decode is far more stable than
  * encode across implementations). */
object GenJpegFixtures {
  def main(args: Array[String]): Unit = {
    val dir = java.nio.file.Paths.get("src/test/resources/graft")
    java.nio.file.Files.createDirectories(dir)
    Seq(0L, 3L).foreach { d =>
      val bytes = Multimodal.syntheticJpeg(d, quality = 0.9f)
      val f = dir.resolve(s"img_d${d}_q90.jpg")
      java.nio.file.Files.write(f, bytes)
      val feat = Multimodal.ImageCodec.decode(bytes).get
      println(s"$f -> w=${feat.width} h=${feat.height} ch=${feat.channels} " +
        s"lumSum=${feat.lumSum} aHash=${feat.aHash}L aHashBits=${feat.aHashBits}")
    }
  }
}
