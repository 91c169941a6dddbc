package graft.plans

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.model.Canonical

class PushVectorSearchSpec extends SparkSpec {
  import spark.implicits._

  private def load(coll: String, n: Int): Unit = {
    val rnd = new scala.util.Random(5)
    (0 until n).map(i => (i.toString, Seq.fill(8)(rnd.nextFloat()), Map.empty[String, String]))
      .toDF(Canonical.ID, Canonical.VECTOR, Canonical.METADATA)
      .write.format("graft-qdrant").option("collection", coll)
      .option("recreate", "true").option("page_size", "500").mode("overwrite").save()
  }

  private val qv: Seq[Float] = {
    val rnd = new scala.util.Random(17)
    Seq.fill(8)(rnd.nextFloat())
  }

  private def topk(coll: String) =
    spark.read.format("graft-qdrant").option("collection", coll).load()
      .withColumn("score",
        graft.functions.VectorExpressions.cosine(col(Canonical.VECTOR), typedLit(qv)))
      .orderBy(col("score").desc, col(Canonical.ID).asc)
      .limit(7)
      .select(Canonical.ID)

  test("ORDER BY cosine DESC LIMIT k rewrites into a native search scan") {
    load("pvs", 3000)
    val df = topk("pvs")
    val physical = df.queryExecution.executedPlan.toString
    assert(physical.contains("search=topk(k=7"), physical)
  }

  test("rewritten plan returns the exact same top-k as a non-pushable plan") {
    load("pvs2", 3000)
    val pushed = topk("pvs2").as[String].collect().toSeq
    // computing the same thing outside the rewrite window (distinct+sort
    // breaks the Limit(Sort(relation)) pattern) -> exact reference answer
    val exact = spark.read.format("graft-qdrant").option("collection", "pvs2").load()
      .withColumn("score",
        graft.functions.VectorExpressions.cosine(col(Canonical.VECTOR), typedLit(qv)))
      .select(col(Canonical.ID), col("score")).distinct()
      .orderBy(col("score").desc, col(Canonical.ID).asc).limit(7)
      .select(Canonical.ID).as[String].collect().toSeq
    assert(pushed == exact)
  }

  test("a Filter outside the translatable surface disables the rewrite") {
    load("pvs3", 1000)
    // id predicates are not on the metadata.<key> translate surface, so
    // this Filter cannot be guaranteed to run BEFORE top-k at the store —
    // the rewrite must not fire (filter-after-top-k would drop winners)
    val df = spark.read.format("graft-qdrant").option("collection", "pvs3").load()
      .filter(col(Canonical.ID) =!= "climate")
      .withColumn("score",
        graft.functions.VectorExpressions.cosine(col(Canonical.VECTOR), typedLit(qv)))
      .orderBy(col("score").desc, col(Canonical.ID).asc).limit(5)
    val physical = df.queryExecution.executedPlan.toString
    assert(!physical.contains("search=topk"), physical)
    assert(df.count() == 5)
  }

  private def loadMeta(coll: String, n: Int): Unit = {
    val rnd = new scala.util.Random(5)
    (0 until n).map(i => (i.toString, Seq.fill(8)(rnd.nextFloat()),
      Map("cat" -> s"c${i % 5}", "rank" -> i.toString)))
      .toDF(Canonical.ID, Canonical.VECTOR, Canonical.METADATA)
      .write.format("graft-qdrant").option("collection", coll)
      .option("recreate", "true").option("page_size", "500").mode("overwrite").save()
  }

  private def filteredTopk(coll: String, extra: Option[org.apache.spark.sql.Column] = None) = {
    val base = spark.read.format("graft-qdrant").option("collection", coll).load()
    val cond = element_at(col(Canonical.METADATA), "cat") === "c1"
    base.filter(extra.map(cond && _).getOrElse(cond))
      .withColumn("score",
        graft.functions.VectorExpressions.cosine(col(Canonical.VECTOR), typedLit(qv)))
      .orderBy(col("score").desc, col(Canonical.ID).asc)
      .limit(7)
      .select(Canonical.ID)
  }

  test("metadata-filtered top-k rewrites into a FILTERED search scan") {
    loadMeta("pvsf", 3000)
    val df = filteredTopk("pvsf")
    val physical = df.queryExecution.executedPlan.toString
    // search spec AND the metadata predicate both inside the scan
    assert(physical.contains("search=topk(k=7"), physical)
    val scanLine = physical.linesIterator.find(_.contains("VectorStoreScan")).getOrElse("")
    assert(scanLine.contains("cat"), physical)
    // exact same rows as the non-rewritable shape (distinct breaks the
    // Limit(Sort(Filter(relation))) pattern -> brute-force reference)
    val exact = spark.read.format("graft-qdrant").option("collection", "pvsf").load()
      .filter(element_at(col(Canonical.METADATA), "cat") === "c1")
      .withColumn("score",
        graft.functions.VectorExpressions.cosine(col(Canonical.VECTOR), typedLit(qv)))
      .select(col(Canonical.ID), col("score")).distinct()
      .orderBy(col("score").desc, col(Canonical.ID).asc).limit(7)
      .select(Canonical.ID).as[String].collect().toSeq
    assert(df.as[String].collect().toSeq == exact)
  }

  test("user-ordered aliased shape rewrites: withColumn → filter → desc(name)") {
    loadMeta("pvsa", 2000)
    // score column FIRST, metadata filter ABOVE it, sort by the alias NAME
    // — the kernel lives in a lower Project and the Sort references the
    // attribute; the optimizer pushes the filter through the Project and
    // resolveScore follows the alias
    val df = spark.read.format("graft-qdrant").option("collection", "pvsa").load()
      .withColumn("score",
        graft.functions.VectorExpressions.cosine(col(Canonical.VECTOR), typedLit(qv)))
      .filter(element_at(col(Canonical.METADATA), "cat") === "c1")
      .orderBy(desc("score"), asc(Canonical.ID))
      .limit(7)
      .select(Canonical.ID)
    val physical = df.queryExecution.executedPlan.toString
    assert(physical.contains("search=topk(k=7"), physical)
    val scanLine = physical.linesIterator.find(_.contains("VectorStoreScan")).getOrElse("")
    assert(scanLine.contains("cat"), physical)
    // exact same rows as the non-rewritable brute-force shape
    val exact = spark.read.format("graft-qdrant").option("collection", "pvsa").load()
      .filter(element_at(col(Canonical.METADATA), "cat") === "c1")
      .withColumn("score",
        graft.functions.VectorExpressions.cosine(col(Canonical.VECTOR), typedLit(qv)))
      .select(col(Canonical.ID), col("score")).distinct()
      .orderBy(col("score").desc, col(Canonical.ID).asc).limit(7)
      .select(Canonical.ID).as[String].collect().toSeq
    assert(df.as[String].collect().toSeq == exact)
    // pruned-projection variant: select(id, score) BETWEEN score and sort
    val pruned = spark.read.format("graft-qdrant").option("collection", "pvsa").load()
      .withColumn("score",
        graft.functions.VectorExpressions.cosine(col(Canonical.VECTOR), typedLit(qv)))
      .select("id", "score")
      .orderBy(desc("score"), asc(Canonical.ID)).limit(7).select(Canonical.ID)
    assert(pruned.queryExecution.executedPlan.toString.contains("search=topk(k=7"),
      pruned.queryExecution.executedPlan.toString)
    // a filter ON the score alias is NOT a metadata filter: no rewrite,
    // results still Spark-exact through the ordinary scan
    val onScore = spark.read.format("graft-qdrant").option("collection", "pvsa").load()
      .withColumn("score",
        graft.functions.VectorExpressions.cosine(col(Canonical.VECTOR), typedLit(qv)))
      .filter(col("score") > -2.0)
      .orderBy(desc("score"), asc(Canonical.ID)).limit(7).select(Canonical.ID)
    assert(!onScore.queryExecution.executedPlan.toString.contains("search=topk"),
      onScore.queryExecution.executedPlan.toString)
    assert(onScore.count() == 7)
  }

  test("negated predicates block the rewrite (3-valued vs store 2-valued Not)") {
    // records LACKING the key: Spark drops them under =!= (null), but the
    // store's 2-valued Not would PASS them into top-k slots — evicting
    // genuine winners the plan Filter can't restore. The rewrite must not
    // fire; the results must still be Spark-exact.
    val rnd = new scala.util.Random(11)
    (0 until 600).map { i =>
      val meta = if (i % 3 == 0) Map.empty[String, String]
      else Map("cat" -> s"c${i % 4}")
      (f"n$i%03d", Seq.fill(8)(rnd.nextFloat()), meta)
    }.toDF(Canonical.ID, Canonical.VECTOR, Canonical.METADATA)
      .write.format("graft-qdrant").option("collection", "pvsn")
      .option("recreate", "true").option("page_size", "200").mode("overwrite").save()
    val base = spark.read.format("graft-qdrant").option("collection", "pvsn").load()
    val df = base
      .filter(element_at(col(Canonical.METADATA), "cat") =!= "c2")
      .withColumn("score",
        graft.functions.VectorExpressions.cosine(col(Canonical.VECTOR), typedLit(qv)))
      .orderBy(col("score").desc, col(Canonical.ID).asc).limit(5)
      .select(Canonical.ID)
    assert(!df.queryExecution.executedPlan.toString.contains("search=topk"),
      df.queryExecution.executedPlan.toString)
    // Spark-exact: only rows WITH the key and != c2, never the keyless ones
    val exact = base
      .filter(element_at(col(Canonical.METADATA), "cat") =!= "c2")
      .withColumn("score",
        graft.functions.VectorExpressions.cosine(col(Canonical.VECTOR), typedLit(qv)))
      .select(col(Canonical.ID), col("score")).distinct()
      .orderBy(col("score").desc, col(Canonical.ID).asc).limit(5)
      .select(Canonical.ID).as[String].collect().toSeq
    assert(df.as[String].collect().toSeq == exact)
    // IsNotNull on a metadata KEY stays absorbable (null-unambiguous):
    val notNull = base
      .filter(element_at(col(Canonical.METADATA), "cat").isNotNull)
      .withColumn("score",
        graft.functions.VectorExpressions.cosine(col(Canonical.VECTOR), typedLit(qv)))
      .orderBy(col("score").desc, col(Canonical.ID).asc).limit(5)
    assert(notNull.queryExecution.executedPlan.toString.contains("search=topk(k=5"),
      notNull.queryExecution.executedPlan.toString)
    assert(notNull.count() == 5)
  }

  test("one untranslatable conjunct blocks the filtered-search rewrite") {
    loadMeta("pvsg", 500)
    // length(id) > 0 is outside the translate surface: the WHOLE filter
    // must stay Spark-side and the plan keeps the scan + TakeOrdered shape
    val df = filteredTopk("pvsg", Some(length(col(Canonical.ID)) > 0))
    val physical = df.queryExecution.executedPlan.toString
    assert(!physical.contains("search=topk"), physical)
    assert(df.count() == 7)
  }

  test("filtered search over the wire is ONE filtered /points/search call") {
    import graft.connectors.vectorstore._
    val server = new QdrantWireServer(new InMemoryStore)
    try {
      val rnd = new scala.util.Random(5)
      (0 until 2000).map(i => (i.toString, Seq.fill(8)(rnd.nextFloat()),
        Map("cat" -> s"c${i % 5}")))
        .toDF(Canonical.ID, Canonical.VECTOR, Canonical.METADATA)
        .write.format("graft-qdrant").option("collection", "pvsw")
        .option("url", server.url).option("recreate", "true").mode("overwrite").save()
      val mark = server.requestLines.size
      val got = spark.read.format("graft-qdrant").option("collection", "pvsw")
        .option("url", server.url).load()
        .filter(element_at(col(Canonical.METADATA), "cat") === "c1")
        .withColumn("score",
          graft.functions.VectorExpressions.cosine(col(Canonical.VECTOR), typedLit(qv)))
        .orderBy(col("score").desc, col(Canonical.ID).asc).limit(7)
        .select(Canonical.ID).as[String].collect().toSeq
      assert(got.length == 7)
      val lines = server.requestLines.drop(mark)
      assert(lines.count(_.startsWith("POST /collections/pvsw/points/search")) == 1, lines)
      // the whole collection never scrolled: the filtered search replaced it
      assert(!lines.exists(_.startsWith("POST /collections/pvsw/points/scroll")), lines)
      // and the search body carried the filter (pre-top-k at the backend)
      assert(server.bodiesOf("POST /collections/pvsw/points/search")
        .exists(b => b.contains("\"filter\"") && b.contains("cat")), "filter missing from search body")
    } finally server.stop()
  }

  private def filteredWireTopk(fmt: String, url: String, coll: String): Seq[String] = {
    val rnd = new scala.util.Random(5)
    (0 until 1200).map(i => (i.toString, Seq.fill(8)(rnd.nextFloat()),
      Map("cat" -> s"c${i % 5}")))
      .toDF(Canonical.ID, Canonical.VECTOR, Canonical.METADATA)
      .write.format(fmt).option("collection", coll)
      .option("url", url).option("recreate", "true").mode("overwrite").save()
    spark.read.format(fmt).option("collection", coll).option("url", url).load()
      .filter(element_at(col(Canonical.METADATA), "cat") === "c1")
      .withColumn("score",
        graft.functions.VectorExpressions.cosine(col(Canonical.VECTOR), typedLit(qv)))
      .orderBy(col("score").desc, col(Canonical.ID).asc).limit(7)
      .select(Canonical.ID).as[String].collect().toSeq
  }

  test("filtered search rides the milvus and pinecone wires too (one call each)") {
    import graft.connectors.vectorstore._
    // the exact answer is backend-independent: brute force on the local frame
    val rnd = new scala.util.Random(5)
    def cos(a: Seq[Float], b: Seq[Float]): Double = {
      val dot = a.zip(b).map { case (x, y) => x.toDouble * y.toDouble }.sum
      val na = math.sqrt(a.map(x => x.toDouble * x.toDouble).sum)
      val nb = math.sqrt(b.map(x => x.toDouble * x.toDouble).sum)
      if (na * nb == 0.0) 0.0 else dot / (na * nb)
    }
    val rows = (0 until 1200).map(i => (i.toString, Seq.fill(8)(rnd.nextFloat())))
    val exact = rows.filter(_._1.toInt % 5 == 1)
      .map { case (id, v) => (id, cos(v, qv)) }
      .sortBy { case (id, s) => (-s, id) }.take(7).map(_._1)

    val ms = new MilvusWireServer(new InMemoryStore)
    try {
      val mark = ms.requestLines.size
      assert(filteredWireTopk("graft-milvus", ms.url, "pvsm") == exact)
      val lines = ms.requestLines.drop(mark)
      assert(lines.count(_.startsWith("POST /v2/vectordb/entities/search")) == 1, lines)
      assert(ms.bodiesOf("POST /v2/vectordb/entities/search")
        .exists(b => b.contains("\"filter\"") && b.contains("cat")))
    } finally ms.stop()

    val ps = new PineconeWireServer(new InMemoryStore)
    try {
      val mark = ps.requestLines.size
      assert(filteredWireTopk("graft-pinecone", ps.url, "pvsp") == exact)
      val lines = ps.requestLines.drop(mark)
      assert(lines.count(_.startsWith("POST /query")) == 1, lines)
      assert(ps.bodiesOf("POST /query")
        .exists(b => b.contains("\"filter\"") && b.contains("cat")))
    } finally ps.stop()
  }
}
