package graft.connectors.vectorstore

import java.util.concurrent.ConcurrentHashMap
import scala.collection.mutable.ArrayBuffer

/** One stored vector record — the wire shape every emulated backend trades
  * in (the reference's canonical `{id, vector, metadata}` dict,
  * `core/adapter.py:33-42`). */
case class VSRecord(id: String, vector: Array[Float], metadata: Map[String, String])

case class CollectionConfig(
    distance: String = "Cosine",
    dim: Int = 0,
    onDisk: Boolean = false,
    props: Map[String, String] = Map.empty)

/** Shared-JVM vector-store emulation: collections of [[VSRecord]]s with
  * per-collection config. In `local[n]` the executors share this JVM, so
  * the DSv2 readers/writers exercise the full distributed code path against
  * it; a production deployment swaps this object for a network client with
  * the same five calls (connect/scroll/upsert/createCollection/describe —
  * the adapter ABC surface, `core/adapter.py:20-66`).
  */
object VectorStore {
  private val data = new ConcurrentHashMap[String, ArrayBuffer[VSRecord]]()
  private val configs = new ConcurrentHashMap[String, CollectionConfig]()

  def createCollection(name: String, config: CollectionConfig, recreate: Boolean): Unit = synchronized {
    if (recreate || !data.containsKey(name)) {
      data.put(name, ArrayBuffer.empty)
      configs.put(name, config)
    }
  }

  def exists(name: String): Boolean = data.containsKey(name)

  def config(name: String): Option[CollectionConfig] = Option(configs.get(name))

  /** Paged scroll — full pagination, unlike the reference's single-page
    * Qdrant scroll that silently truncates at `limit`
    * (`adapters/qdrant.py:99-106`, defect noted in SURVEY §2). */
  def scroll(name: String, fromIdx: Int, pageSize: Int): Seq[VSRecord] = {
    val buf = Option(data.get(name)).getOrElse(
      throw new NoSuchElementException(s"collection not found: $name"))
    buf.synchronized { buf.slice(fromIdx, fromIdx + pageSize).toSeq }
  }

  def count(name: String): Int =
    Option(data.get(name)).map(b => b.synchronized(b.length)).getOrElse(0)

  /** Batched upsert (id-keyed replace), returns records written. */
  def upsert(name: String, records: Seq[VSRecord]): Int = {
    val buf = Option(data.get(name)).getOrElse(
      throw new NoSuchElementException(s"collection not found: $name (create it first)"))
    buf.synchronized {
      val byId = records.map(r => r.id -> r).toMap
      val kept = buf.filterNot(r => byId.contains(r.id))
      buf.clear()
      buf ++= kept ++= records
    }
    records.length
  }

  def drop(name: String): Unit = { data.remove(name); configs.remove(name) }
  def clear(): Unit = { data.clear(); configs.clear() }
}
