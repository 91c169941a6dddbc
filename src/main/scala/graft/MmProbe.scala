package graft

/** Throwaway micro-probe for the multimodal fixture path: where do the
  * microseconds go — PNG encode, SHA-256, ImageIO decode, or the feature
  * loop? Single-threaded, no Spark. Deleted after diagnosis. */
object MmProbe {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(20000)
    javax.imageio.ImageIO.setUseCache(false)
    def time[A](label: String)(body: => A): A = {
      val t0 = System.nanoTime()
      val r = body
      println(f"[mmprobe] $label%-18s ${(System.nanoTime() - t0) / 1e9}%.3f s (${(System.nanoTime() - t0) / 1e3 / n}%.1f us/img)")
      r
    }
    // warm
    (0 until 2000).foreach { i =>
      graft.ops.Multimodal.ImageCodec.decode(graft.ops.Multimodal.syntheticPng(i.toLong))
    }
    val pngs = time("png encode") {
      Array.tabulate(n)(i => graft.ops.Multimodal.syntheticPng(i.toLong))
    }
    val digest = java.security.MessageDigest.getInstance("SHA-256")
    time("sha256 hex") {
      var i = 0
      var acc = 0
      while (i < n) {
        acc += digest.digest(pngs(i)).map("%02x".format(_)).mkString.length
        i += 1
      }
      acc
    }
    val imgs = time("ImageIO.read") {
      pngs.map(b => javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(b)))
    }
    time("full decode") {
      var i = 0
      while (i < n) { graft.ops.Multimodal.ImageCodec.decode(pngs(i)); i += 1 }
    }
    println("[mmprobe] img0 type=" + imgs(0).getType)
  }
}
