package graft.connectors.vectorstore

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.functions.BinaryVectors
import graft.model.Canonical

/** BINARY_VECTOR collections through the Milvus DSv2 path — the reference
  * accepts FLOAT_VECTOR or BINARY_VECTOR as the vector field
  * (`adapters/milvus.py:82`); this covers the byte-array carry, schema
  * switching, metric rules, and capability gating. */
class BinaryVectorSpec extends SparkSpec {
  import spark.implicits._

  private def binDf(n: Int) = {
    val rows = (0 until n).map(i =>
      (s"$i", Array.tabulate(3)(b => ((i + b) % 256).toByte), Map("k" -> s"v$i")))
    rows.toDF(Canonical.ID, Canonical.VECTOR, Canonical.METADATA)
  }

  // writes declare vector_type explicitly: on the FIRST write the
  // collection doesn't exist yet, so without the option the provider
  // infers the float schema and Spark's byName validation rejects the
  // binary column before the sink ever runs
  private val BIN = "BINARY_VECTOR"

  test("binary write + read round trip carries bytes bit-for-bit") {
    binDf(300).write.format("graft-milvus")
      .option("collection", "bin_rt").option("vector_type", BIN).option("distance", "Hamming")
      .option("recreate", "true").option("batch_size", "64")
      .mode("overwrite").save()
    assert(VectorStore.count("bin_rt") == 300)
    assert(VectorStore.config("bin_rt").exists(_.vectorType == VectorTypes.Binary))
    // schema inferred from the stored collection config — no option needed
    val back = spark.read.format("graft-milvus").option("collection", "bin_rt").load()
    assert(back.schema == Canonical.binarySchema)
    val got = back.select(Canonical.ID, Canonical.VECTOR).as[(String, Array[Byte])]
      .collect().toMap
    assert(got.size == 300)
    (0 until 300).foreach { i =>
      assert(java.util.Arrays.equals(got(s"$i"), Array.tabulate(3)(b => ((i + b) % 256).toByte)))
    }
  }

  test("packed sign bits survive the round trip (hamming vs source signs)") {
    val src = Seq(("a", Seq(1f, -2f, 3f, -4f, 5f, 0f, -7f, 8f, 9f)),
      ("b", Seq(-1f, -2f, -3f, 4f, 5f, 6f, 7f, -8f, -9f)))
      .toDF("id", "v")
    src.select(col("id"), BinaryVectors.pack(col("v")).as(Canonical.VECTOR),
      map().cast("map<string,string>").as(Canonical.METADATA))
      .write.format("graft-milvus").option("collection", "bin_pk").option("vector_type", BIN)
      .option("recreate", "true").mode("overwrite").save()
    val back = spark.read.format("graft-milvus").option("collection", "bin_pk").load()
    val d = back.filter(col(Canonical.ID) === "a").crossJoin(
      back.filter(col(Canonical.ID) === "b").select(col(Canonical.VECTOR).as("vb")))
      .select(BinaryVectors.hamming(col(Canonical.VECTOR), col("vb")).as("d"))
      .head().getInt(0)
    // signs differ at dims 0,2,5(0 vs 6>0),6,7,8 → a:{1,0,1,0,1,0,0,1,1} b:{0,0,0,1,1,1,1,0,0}
    assert(d == 7)
  }

  test("metadata filters still push down on binary collections") {
    binDf(50).write.format("graft-milvus")
      .option("collection", "bin_flt").option("vector_type", BIN).option("distance", "Jaccard")
      .option("recreate", "true").mode("overwrite").save()
    val df = spark.read.format("graft-milvus").option("collection", "bin_flt").load()
      .filter(element_at(col(Canonical.METADATA), "k") === "v7")
    assert(df.queryExecution.executedPlan.toString.contains("VectorStoreScan"))
    assert(df.count() == 1)
  }

  test("binary collections take binary metrics only; float metrics rejected") {
    val e = intercept[Exception] {
      binDf(1).write.format("graft-milvus")
        .option("collection", "bin_cos").option("vector_type", BIN).option("distance", "Cosine")
        .option("recreate", "true").mode("overwrite").save()
    }
    assert(e.getMessage.contains("BINARY_VECTOR") ||
      Option(e.getCause).exists(_.getMessage.contains("BINARY_VECTOR")))
  }

  test("appending float records into a binary collection is a schema error") {
    binDf(5).write.format("graft-milvus")
      .option("collection", "bin_mix").option("vector_type", BIN).option("distance", "Hamming")
      .option("recreate", "true").mode("overwrite").save()
    val floats = Seq(("x", Seq(1f, 2f), Map.empty[String, String]))
      .toDF(Canonical.ID, Canonical.VECTOR, Canonical.METADATA)
    val e = intercept[Exception] {
      floats.write.format("graft-milvus").option("collection", "bin_mix")
        .mode("append").save()
    }
    // either our vector-type guard or Spark's own table-schema check fires
    assert(e.getMessage != null)
    assert(VectorStore.config("bin_mix").exists(_.vectorType == VectorTypes.Binary))
  }

  test("backends without the capability reject BINARY_VECTOR (qdrant emulation)") {
    val e = intercept[Exception] {
      binDf(1).write.format("graft-qdrant")
        .option("collection", "bin_qd").option("vector_type", BIN).option("recreate", "true")
        .mode("overwrite").save()
    }
    assert(e.getMessage.contains("BINARY_VECTOR") ||
      Option(e.getCause).exists(_.getMessage.contains("BINARY_VECTOR")))
  }
}
