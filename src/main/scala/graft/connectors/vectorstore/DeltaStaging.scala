package graft.connectors.vectorstore

import java.io.{BufferedReader, BufferedWriter, InputStreamReader, OutputStreamWriter}
import java.net.URI
import java.nio.ByteBuffer
import java.nio.ByteOrder
import java.nio.charset.StandardCharsets
import java.util.Base64

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}

/** Durable-scratch staging for row-level deltas (SQL UPDATE / MERGE / the
  * delete leg of id-changing updates).
  *
  * The delta protocol applies AT COMMIT (see [[VSRowLevelOperation]]) — the
  * scan pages the live collection, so nothing may mutate it until every
  * task has drained. Without staging, each task's touched rows ride its
  * [[VSDeltaCommit]] message and the driver holds the WHOLE touched set in
  * memory: fine for corrections, driver-bound for a MERGE touching 1% of
  * 10^9 rows (10^7 records through commit messages). With a staging
  * directory configured, each task SPILLS past a row threshold: deltas
  * stream to per-task files, the commit message carries only the paths,
  * and the job-level commit streams deletes-then-upserts back out in
  * `batch_size` groups — driver memory stays O(batch_size), not O(touched).
  *
  * The directory must be visible to executors AND the driver (HDFS/S3/...
  * on a cluster — the same constraint as `spark.graft.checkpoint.dir`,
  * which is the default location when set). Files are written once,
  * streamed once, deleted at commit; an aborted task deletes its own
  * files, and a job-level abort removes whatever committed tasks staged.
  *
  * Format: one op per line (JSONL for upserted records — vectors/binaries
  * as base64 of their exact bytes, so the round trip is bit-identical;
  * plain text for delete ids). Line-oriented so the commit can stream with
  * a constant-memory reader; parquet would need a SparkSession the
  * executor-side writer doesn't have.
  */
object DeltaStaging {

  /** Session conf: staging directory (falls back to
    * `spark.graft.checkpoint.dir` + "/vs-delta-staging"; staging is OFF
    * when neither is set — deltas ride commit messages as before). */
  val DirKey = "spark.graft.delta.stage.dir"
  /** Session conf: per-task buffered-row count that triggers the spill. */
  val ThresholdKey = "spark.graft.delta.stage.threshold"
  val DefaultThreshold = 100000

  case class Spec(dir: String, threshold: Int)

  /** Spill events since JVM start — observability for specs and tuning. */
  val spillCount = new java.util.concurrent.atomic.AtomicLong(0)

  private def fs(path: String): FileSystem =
    FileSystem.get(new URI(path), new Configuration())

  def newWriter(path: String): BufferedWriter =
    new BufferedWriter(new OutputStreamWriter(
      fs(path).create(new Path(path), true), StandardCharsets.UTF_8))

  /** Stream a staged file's lines; the handle closes on exhaustion (commit
    * always drains) and file deletion below releases the rest. */
  def lines(path: String): Iterator[String] = {
    val reader = new BufferedReader(new InputStreamReader(
      fs(path).open(new Path(path)), StandardCharsets.UTF_8))
    new Iterator[String] {
      private var nextLine = reader.readLine()
      override def hasNext: Boolean = nextLine != null
      override def next(): String = {
        val l = nextLine
        nextLine = reader.readLine()
        if (nextLine == null) reader.close()
        l
      }
    }
  }

  def delete(path: String): Unit =
    try fs(path).delete(new Path(path), false)
    catch { case _: java.io.IOException => () } // best-effort cleanup

  // ---------------------------------------------------------- record codec

  private val mapper = new ObjectMapper()

  private def floatsToB64(v: Array[Float]): String = {
    val bb = ByteBuffer.allocate(v.length * 4).order(ByteOrder.LITTLE_ENDIAN)
    v.foreach(bb.putFloat)
    Base64.getEncoder.encodeToString(bb.array())
  }

  private def b64ToFloats(s: String): Array[Float] = {
    val bb = ByteBuffer.wrap(Base64.getDecoder.decode(s)).order(ByteOrder.LITTLE_ENDIAN)
    Array.fill(bb.remaining() / 4)(bb.getFloat)
  }

  def recordToJson(r: VSRecord): String = {
    val n = mapper.createObjectNode()
    n.put("id", r.id)
    if (r.vector != null) n.put("v", floatsToB64(r.vector))
    if (r.binary != null) n.put("b", Base64.getEncoder.encodeToString(r.binary))
    val m = n.putObject("m")
    r.metadata.foreach { case (k, v) =>
      if (v == null) m.putNull(k) else m.put(k, v)
    }
    mapper.writeValueAsString(n)
  }

  def recordFromJson(line: String): VSRecord = {
    val n = mapper.readTree(line)
    val meta = {
      val m = n.get("m")
      val it = m.fields()
      val b = Map.newBuilder[String, String]
      while (it.hasNext) {
        val e = it.next()
        b += e.getKey -> (if (e.getValue.isNull) null else e.getValue.asText())
      }
      b.result()
    }
    VSRecord(
      id = n.get("id").asText(),
      vector = if (n.has("v")) b64ToFloats(n.get("v").asText()) else null,
      metadata = meta,
      binary = if (n.has("b")) Base64.getDecoder.decode(n.get("b").asText()) else null)
  }
}
