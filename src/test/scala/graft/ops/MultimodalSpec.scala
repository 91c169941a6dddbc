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

  test("extractFeatures is deterministic and partition-parallel") {
    val media = Multimodal.packBinary(docs).repartition(3)
    val f1 = Multimodal.extractFeatures(media).select("media_id", "width", "mean_byte")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2))).sortBy(_._1).toSeq
    val f2 = Multimodal.extractFeatures(media).select("media_id", "width", "mean_byte")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2))).sortBy(_._1).toSeq
    assert(f1 == f2)
    assert(f1.map(_._1) == Seq(1L, 2L, 3L))
    // empty payload: defined, zero mean
    assert(f1(1)._3 == 0.0)
  }

  test("sampleFrames emits strided frame indices without touching bytes") {
    val out = Multimodal.sampleFrames(
      Multimodal.extractFeatures(Multimodal.packBinary(docs)), stride = 4)
    val frames = out.filter(col("media_id") === 3).head()
      .getAs[scala.collection.Seq[Int]]("sampled_frames")
    assert(frames.nonEmpty && frames.head == 0 && frames.forall(_ % 4 == 0))
  }
}
