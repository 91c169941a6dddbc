package graft.connectors.vectorstore

/** Backfill of the numeric `__gid` metadata mirror into a FOREIGN
  * collection (one not written by this engine's codecs).
  *
  * The mirror is what makes parallel cursor extraction possible on
  * backends whose wire cannot range-address record ids (Qdrant payload
  * ranges, Pinecone `/query` metadata ranges — see
  * `VSScan.planCursorSlices`): collections missing it degrade to ONE
  * sequential walk — exactly the collections a migrator reads most. This
  * verb runs the sequential walk ONCE (there is no parallel way to read
  * an unmirrored collection — that is the point), re-upserting each page
  * so the codec injects the mirror; every later extraction slices.
  *
  * Safety of mutating while walking:
  *  - Qdrant: the scroll is point-id-ordered and the walk is FILTERED to
  *    `__gid is null` server-side, so a backfilled record leaves the
  *    filtered sequence and pages behind the cursor are never revisited.
  *  - Pinecone: `/vectors/list` pagination is id-stable and the upsert
  *    replaces ids in place, so positions don't shift under the token.
  *  - Idempotent either way: upserts are id-keyed replaces; re-running
  *    converges to the same state (Pinecone re-scans mirrored records —
  *    the mirror is invisible client-side — but rewrites are no-ops).
  *
  * Records that cannot carry a mirror are counted, not touched: ids that
  * are not canonical unsigned integers (they stay on the catch-all walk),
  * and records already carrying a FOREIGN `__gid` value (user data — the
  * codec would reject or strip it; this verb does neither silently).
  */
object GidBackfill {

  case class Report(scanned: Long, backfilled: Long,
                    skippedNonNumericId: Long, skippedForeignGid: Long) {
    override def toString: String =
      s"scanned=$scanned backfilled=$backfilled " +
        s"skipped_non_numeric_id=$skippedNonNumericId " +
        s"skipped_foreign_gid=$skippedForeignGid"
  }

  def run(spec: TransportSpec, collection: String, batchSize: Int = 200): Report = {
    val store = VectorStore.resolve(spec)
    // Qdrant excludes already-mirrored records server-side; other
    // backends walk everything (mirrored records re-upsert as no-ops)
    val filter = spec.backend match {
      case "qdrant" => Some("""{"must":[{"is_null":{"key":"__gid"}}]}""")
      case _ => None
    }
    var scanned = 0L; var backfilled = 0L; var skippedNon = 0L; var skippedForeign = 0L
    VSPaging.cursorWalk(c =>
      store.scrollPageFiltered(collection, c, batchSize, filter)).foreach { recs =>
      scanned += recs.length
      val (foreign, clean) = recs.partition(_.metadata.contains("__gid"))
      skippedForeign += foreign.length
      val (numeric, non) = clean.partition(r =>
        r.id != null && r.id.toLongOption.exists(l => l >= 0 && l.toString == r.id))
      skippedNon += non.length
      if (numeric.nonEmpty) {
        store.upsert(collection, numeric) // the codec injects the mirror
        backfilled += numeric.length
      }
    }
    Report(scanned, backfilled, skippedNon, skippedForeign)
  }
}
