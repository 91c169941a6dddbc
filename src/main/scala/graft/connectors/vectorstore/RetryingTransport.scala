package graft.connectors.vectorstore

/** Bounded-retry decorator for any [[VectorStoreTransport]] — the
  * production-hardening layer the reference leaves to its DB client
  * libraries (its adapters call `psycopg2`/`qdrant_client` once and turn
  * ANY failure into `False`/empty, e.g. `adapters/pgvector.py:235-242`).
  *
  * Every call is retried up to `maxAttempts` with exponential backoff
  * (backoffMs · 2^attempt, capped). Safe by the transport's own contract:
  * `upsert` is an id-keyed replace (re-delivery lands identically —
  * the same idempotency the streaming sink's exactly-once test relies
  * on), reads are pure, and `createCollection`/`drop` are idempotent on
  * the emulated store and on every real backend's create-if-missing /
  * drop-if-exists form. Executor-thread-safe iff the inner transport is.
  *
  * `retryOn` filters which failures are worth re-attempting (default:
  * everything except `NoSuchElementException` — a missing collection is a
  * logic error, not a transient fault; a network impl would match on its
  * client's timeout/unavailable exceptions instead).
  */
case class RetryingTransport(
    inner: VectorStoreTransport,
    maxAttempts: Int = 3,
    backoffMs: Long = 100L,
    maxBackoffMs: Long = 5000L,
    retryOn: Throwable => Boolean = RetryingTransport.defaultRetryOn)
  extends VectorStoreTransport {

  require(maxAttempts >= 1, "maxAttempts must be >= 1")

  private def withRetry[A](f: => A): A = {
    var attempt = 0
    while (true) {
      try return f
      catch {
        case e: Throwable if attempt < maxAttempts - 1 && retryOn(e) =>
          val wait = math.min(backoffMs << attempt, maxBackoffMs)
          if (wait > 0) Thread.sleep(wait)
          attempt += 1
      }
    }
    throw new IllegalStateException("unreachable")
  }

  override def createCollection(name: String, config: CollectionConfig, recreate: Boolean): Unit =
    withRetry(inner.createCollection(name, config, recreate))
  override def exists(name: String): Boolean = withRetry(inner.exists(name))
  override def describe(name: String): Option[CollectionConfig] = withRetry(inner.describe(name))
  override def scroll(name: String, fromIdx: Int, pageSize: Int): Seq[VSRecord] =
    withRetry(inner.scroll(name, fromIdx, pageSize))
  override def cursorPaged: Boolean = inner.cursorPaged
  // retry-safe: re-fetching the SAME cursor re-reads the same page
  override def scrollPage(name: String, cursor: Option[String],
                          pageSize: Int): (Seq[VSRecord], Option[String]) =
    withRetry(inner.scrollPage(name, cursor, pageSize))
  override def scrollFiltered(name: String, fromIdx: Int, pageSize: Int,
                              filter: Option[String]): Seq[VSRecord] =
    withRetry(inner.scrollFiltered(name, fromIdx, pageSize, filter))
  override def scrollPageFiltered(name: String, cursor: Option[String], pageSize: Int,
                                  filter: Option[String]): (Seq[VSRecord], Option[String]) =
    withRetry(inner.scrollPageFiltered(name, cursor, pageSize, filter))
  override def serverSideFilters: Boolean = inner.serverSideFilters
  override def supportsNativeSearch(metric: String): Boolean =
    inner.supportsNativeSearch(metric)
  override def supportsSearchFilter: Boolean = inner.supportsSearchFilter
  override def nativeSearch(name: String, sp: SearchSpec,
                            filter: Option[String]): Option[Seq[VSRecord]] =
    withRetry(inner.nativeSearch(name, sp, filter))
  override def count(name: String): Int = withRetry(inner.count(name))
  override def countFiltered(name: String, filter: Option[String]): Int =
    withRetry(inner.countFiltered(name, filter))
  override def upsert(name: String, records: Seq[VSRecord]): Int =
    withRetry(inner.upsert(name, records))
  // idempotent like upsert: a re-delivered delete of an already-removed id
  // is a no-op (the count reflects the final attempt only)
  override def delete(name: String, ids: Seq[String]): Int =
    withRetry(inner.delete(name, ids))
  override def drop(name: String): Unit = withRetry(inner.drop(name))
  override def listCollections(): Seq[String] = withRetry(inner.listCollections())
  // forwarded so a native-rename backend keeps its single atomic verb
  // (the trait default would otherwise re-implement rename as copy+drop
  // over this wrapper's retried calls)
  override def rename(from: String, to: String): Unit = withRetry(inner.rename(from, to))
}

object RetryingTransport {
  /** Retry transient-looking faults; never retry a missing collection. */
  val defaultRetryOn: Throwable => Boolean = {
    case _: NoSuchElementException => false
    case _ => true
  }
}
