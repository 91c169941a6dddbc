package graft.connectors

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.connectors.vectorstore._

/** SQL UPDATE / MERGE INTO over vector-store collections via SupportsDelta:
  * per-row deltas route to the store's native upsert/delete — only touched
  * rows move, carry-over rows never leave the backend. */
class RowLevelOpsSpec extends SparkSpec {
  import spark.implicits._

  private def install(cat: String): Unit =
    spark.conf.set(s"spark.sql.catalog.$cat", classOf[VSCatalog].getName)

  private def seed(coll: String, n: Int): Unit = {
    VectorStore.drop(coll)
    VectorStore.createCollection(coll, CollectionConfig(dim = 2), recreate = true)
    VectorStore.upsert(coll, (0 until n).map(i =>
      VSRecord(s"$i", Array(i.toFloat, 1f), Map("lab" -> s"${i % 3}"))))
  }

  test("UPDATE mutates only matching rows; vectors survive untouched") {
    install("vsr"); seed("rlo_upd", 10)
    spark.sql("UPDATE vsr.rlo_upd SET metadata = map('lab', 'hit') " +
      "WHERE element_at(metadata, 'lab') = '1'")
    val rows = VectorStore.scroll("rlo_upd", 0, 100)
    assert(rows.length == 10)
    val hit = rows.filter(_.metadata("lab") == "hit").map(_.id.toInt).sorted
    assert(hit == Seq(1, 4, 7), hit.toString)
    // vectors of updated rows are intact (UPDATE did not touch the column)
    assert(rows.find(_.id == "4").exists(r => r.vector.toSeq == Seq(4f, 1f)))
    VectorStore.drop("rlo_upd")
  }

  test("UPDATE that changes the row id deletes the old id") {
    install("vsr"); seed("rlo_uid", 4)
    spark.sql("UPDATE vsr.rlo_uid SET id = concat('x', id) WHERE id = '2'")
    val ids = VectorStore.scroll("rlo_uid", 0, 100).map(_.id).sorted
    assert(ids == Seq("0", "1", "3", "x2"), ids.toString)
    VectorStore.drop("rlo_uid")
  }

  test("MERGE INTO applies update + delete + insert in one statement") {
    install("vsr"); seed("rlo_mrg", 6) // target ids 0..5
    val src = Seq(
      ("4", Array(40f, 1f), Map("lab" -> "upd")),   // matched -> update
      ("5", Array(50f, 1f), Map("lab" -> "doom")),  // matched -> delete
      ("9", Array(90f, 1f), Map("lab" -> "new")))   // not matched -> insert
      .toDF("id", "vector", "metadata")
    src.createOrReplaceTempView("rlo_mrg_src")
    spark.sql(
      """MERGE INTO vsr.rlo_mrg t USING rlo_mrg_src s ON t.id = s.id
        |WHEN MATCHED AND element_at(s.metadata, 'lab') = 'doom' THEN DELETE
        |WHEN MATCHED THEN UPDATE SET vector = s.vector, metadata = s.metadata
        |WHEN NOT MATCHED THEN INSERT (id, vector, metadata)
        |  VALUES (s.id, s.vector, s.metadata)""".stripMargin)
    val rows = VectorStore.scroll("rlo_mrg", 0, 100).map(r => r.id -> r).toMap
    assert(rows.keySet == Set("0", "1", "2", "3", "4", "9"), rows.keySet.toString)
    assert(rows("4").vector.toSeq == Seq(40f, 1f) && rows("4").metadata("lab") == "upd")
    assert(rows("9").metadata("lab") == "new")
    assert(rows("0").vector.toSeq == Seq(0f, 1f)) // carry-over untouched
    VectorStore.drop("rlo_mrg")
  }

  test("MERGE deltas travel a real socket: upserts and deletes over the wire") {
    val store = new InMemoryStore
    val server = new QdrantWireServer(store)
    try {
      store.createCollection("rlo_wire", CollectionConfig(dim = 2), recreate = true)
      store.upsert("rlo_wire", (0 until 5).map(i =>
        VSRecord(s"$i", Array(i.toFloat, 1f), Map("lab" -> "old"))))
      spark.conf.set("spark.sql.catalog.vsw", classOf[VSCatalog].getName)
      spark.conf.set("spark.sql.catalog.vsw.url", server.url)
      val src = Seq(
        ("1", Array(11f, 1f), Map("lab" -> "upd")),
        ("3", Array(0f, 0f), Map("lab" -> "doom")),
        ("7", Array(77f, 1f), Map("lab" -> "new"))).toDF("id", "vector", "metadata")
      src.createOrReplaceTempView("rlo_wire_src")
      val before = server.requestLines.length
      spark.sql(
        """MERGE INTO vsw.rlo_wire t USING rlo_wire_src s ON t.id = s.id
          |WHEN MATCHED AND element_at(s.metadata, 'lab') = 'doom' THEN DELETE
          |WHEN MATCHED THEN UPDATE SET vector = s.vector, metadata = s.metadata
          |WHEN NOT MATCHED THEN INSERT (id, vector, metadata)
          |  VALUES (s.id, s.vector, s.metadata)""".stripMargin)
      val wire = server.requestLines.drop(before)
      // every delta leg crossed the socket in the Qdrant dialect
      assert(wire.exists(_.startsWith("PUT /collections/rlo_wire/points")), wire.mkString("\n"))
      assert(wire.exists(_.startsWith("POST /collections/rlo_wire/points/delete")),
        wire.mkString("\n"))
      val rows = store.scroll("rlo_wire", 0, 100).map(r => r.id -> r).toMap
      assert(rows.keySet == Set("0", "1", "2", "4", "7"), rows.keySet.toString)
      assert(rows("1").vector.toSeq == Seq(11f, 1f) && rows("1").metadata("lab") == "upd")
      assert(rows("7").metadata("lab") == "new")
      assert(rows("0").metadata("lab") == "old") // carry-over never rewritten
    } finally server.stop()
  }

  test("multi-page UPDATE with a non-idempotent SET applies exactly once") {
    // regression: deltas must NOT be applied while the op's scan is still
    // paging the live collection — a writer that flushed eagerly would
    // shift rows under another task's scroll cursor, re-reading (double-
    // applying x = x + 1) or skipping rows. page_size 7 < 50 rows forces
    // many scan partitions; batch_size 5 would have forced mid-scan
    // flushes under the old eager writer.
    spark.conf.set("spark.sql.catalog.vspg", classOf[VSCatalog].getName)
    spark.conf.set("spark.sql.catalog.vspg.page_size", "7")
    spark.conf.set("spark.sql.catalog.vspg.batch_size", "5")
    seed("rlo_page", 50)
    spark.sql("UPDATE vspg.rlo_page SET metadata = map('lab', " +
      "CAST(CAST(element_at(metadata, 'lab') AS INT) + 10 AS STRING))")
    val rows = VectorStore.scroll("rlo_page", 0, 1000)
    assert(rows.length == 50, s"row count drifted: ${rows.length}")
    // every row advanced by exactly 10 — no double-apply, no skips
    rows.foreach { r =>
      assert(r.metadata("lab").toInt == r.id.toInt % 3 + 10,
        s"id=${r.id} lab=${r.metadata("lab")}")
    }
    VectorStore.drop("rlo_page")
  }

  test("staged deltas: touched set >> threshold spills to scratch, identical result") {
    // with a staging dir configured, tasks stream deltas to files past the
    // threshold and the commit message carries only paths — driver memory
    // stays O(batch_size) however many rows the command touches
    val stageDir = java.nio.file.Files.createTempDirectory("vs_delta_stage").toString
    spark.conf.set("spark.sql.catalog.vstg", classOf[VSCatalog].getName)
    spark.conf.set("spark.sql.catalog.vstg.delta_stage_dir", stageDir)
    spark.conf.set("spark.sql.catalog.vstg.delta_stage_threshold", "8")
    spark.conf.set("spark.sql.catalog.vstg.batch_size", "10")
    seed("rlo_stage", 120)
    val spillsBefore = DeltaStaging.spillCount.get()
    spark.sql("UPDATE vstg.rlo_stage SET metadata = map('lab', 'bulk') " +
      "WHERE CAST(id AS INT) >= 20")
    assert(DeltaStaging.spillCount.get() > spillsBefore, "no task spilled")
    val rows = VectorStore.scroll("rlo_stage", 0, 1000)
    assert(rows.length == 120, s"row count drifted: ${rows.length}")
    rows.foreach { r =>
      val expect = if (r.id.toInt >= 20) "bulk" else (r.id.toInt % 3).toString
      assert(r.metadata("lab") == expect, s"id=${r.id} lab=${r.metadata("lab")}")
      assert(r.vector.toSeq == Seq(r.id.toFloat, 1f), s"vector drifted for ${r.id}")
    }
    // staged DELETEs stream the same way
    spark.sql("DELETE FROM vstg.rlo_stage WHERE CAST(id AS INT) < 30")
    assert(VSWriteStats.deleted("rlo_stage") == 30L,
      s"deleted=${VSWriteStats.deleted("rlo_stage")}")
    assert(VectorStore.scroll("rlo_stage", 0, 1000).length == 90)
    // staged files are consumed and removed at commit
    val left = Option(new java.io.File(stageDir).listFiles()).getOrElse(Array.empty)
    assert(left.isEmpty, left.mkString(","))
    VectorStore.drop("rlo_stage")
  }

  test("staged delete of an id containing a newline survives the line codec") {
    // ids are arbitrary strings; staged delete lines are JSON-escaped so a
    // raw '\n' cannot split one delete into two bogus ones
    val stageDir = java.nio.file.Files.createTempDirectory("vs_delta_nl").toString
    spark.conf.set("spark.sql.catalog.vsnl", classOf[VSCatalog].getName)
    spark.conf.set("spark.sql.catalog.vsnl.delta_stage_dir", stageDir)
    spark.conf.set("spark.sql.catalog.vsnl.delta_stage_threshold", "1")
    VectorStore.drop("rlo_nl")
    VectorStore.createCollection("rlo_nl", CollectionConfig(dim = 2), recreate = true)
    VectorStore.upsert("rlo_nl", Seq(
      VSRecord("a\nb", Array(1f, 1f), Map("k" -> "v")),
      VSRecord("keep", Array(2f, 2f), Map("k" -> "v"))))
    spark.sql("DELETE FROM vsnl.rlo_nl WHERE element_at(metadata, 'k') = 'v' AND id != 'keep'")
    val ids = VectorStore.scroll("rlo_nl", 0, 10).map(_.id)
    assert(ids == Seq("keep"), ids.toString)
    VectorStore.drop("rlo_nl")
  }

  test("delta commit records the delete count in VSWriteStats") {
    install("vsr"); seed("rlo_cnt", 12)
    spark.sql("DELETE FROM vsr.rlo_cnt WHERE CAST(id AS INT) < 5")
    assert(VSWriteStats.deleted("rlo_cnt") == 5L,
      s"deleted=${VSWriteStats.deleted("rlo_cnt")}")
    assert(VectorStore.scroll("rlo_cnt", 0, 100).length == 7)
    VectorStore.drop("rlo_cnt")
  }

  test("row-level DELETE with an un-pushable predicate ships only matching ids") {
    install("vsr"); seed("rlo_del", 9)
    // size(vector) predicates can never push to the store — the delta
    // rewrite scans, Spark evaluates, only matching ids are deleted
    spark.sql("DELETE FROM vsr.rlo_del WHERE size(vector) = 2 " +
      "AND CAST(id AS INT) % 3 = 0")
    val ids = VectorStore.scroll("rlo_del", 0, 100).map(_.id.toInt).sorted
    assert(ids == Seq(1, 2, 4, 5, 7, 8), ids.toString)
    VectorStore.drop("rlo_del")
  }
}
