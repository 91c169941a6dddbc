package graft.cli

import org.apache.spark.sql.DataFrame
import graft.GraftSession
import graft.core.Migrator

/** CLI with the reference's flag surface (`cli/migrate.py:151-233`):
  * `--config <json>` (required), `--transform <class>`, `--verbose`,
  * `--version`; exit code 0 on success, 1 on failure.
  *
  * `--transform` names a class implementing `DataFrame => DataFrame` with a
  * no-arg constructor — the JVM equivalent of the reference's dynamic
  * module loading (`cli/migrate.py:66-93`). Like the reference, a transform
  * that cannot be LOADED degrades to a warning + no-op, not an abort.
  * (A loadable class implementing the WRONG `Function1` type passes the
  * erasure-blind cast and fails the run at apply time as a
  * TransformException — a loud failure, deliberately not a silent no-op:
  * by then the operator explicitly named a class that exists but does not
  * transform DataFrames, which is a config error, not a missing plugin.)
  */
object Main {
  val version = "0.2.0"

  /** Control-flow marker for a value-taking flag with no value (usage is
    * already printed when it is thrown). */
  private case object MissingFlagValue extends RuntimeException

  /** The operator verbs' shared config shape: `{"type": .., "connection":
    * {..}, "collection": ..}` with a namespace suffix. One parser so the
    * null-node and namespace rules can never drift between verbs. */
  private case class OpConfig(backend: String, collection: String,
                              conn: com.fasterxml.jackson.databind.JsonNode,
                              root: com.fasterxml.jackson.databind.JsonNode) {
    def connStr(k: String): Option[String] =
      Option(conn.get(k)).filterNot(_.isNull).map(_.asText()).filter(_.nonEmpty)
  }

  private def readOpConfig(path: String, verb: String): OpConfig = {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val root = mapper.readTree(new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(path)), java.nio.charset.StandardCharsets.UTF_8))
    def str(k: String): Option[String] =
      Option(root.get(k)).filterNot(_.isNull).map(_.asText()).filter(_.nonEmpty)
    val backend = str("type").getOrElse(
      throw new graft.config.ConfigException(s"$verb config needs 'type'"))
    val conn = Option(root.get("connection"))
      .getOrElse(mapper.createObjectNode(): com.fasterxml.jackson.databind.JsonNode)
    val base = str("collection").getOrElse(
      throw new graft.config.ConfigException(s"$verb config needs 'collection'"))
    val ns = Option(conn.get("namespace")).filterNot(_.isNull)
      .map(_.asText()).filter(_.nonEmpty)
    OpConfig(backend, ns.map(n => s"$base::$n").getOrElse(base), conn, root)
  }

  def main(args: Array[String]): Unit = sys.exit(run(args))

  def run(args: Array[String]): Int = {
    var config: Option[String] = None
    var transformCls: Option[String] = None
    var verbose = false
    var validate = false
    var incremental = false
    var buildIndex: Option[String] = None
    var ingest: Option[String] = None
    var compactIndex: Option[String] = None
    var backfillGid: Option[String] = None
    var sweepStaging: Option[String] = None
    var i = 0
    // value-taking flags guard the index: `--config` as the LAST token
    // used to throw a raw ArrayIndexOutOfBoundsException instead of usage
    def value(flag: String): String = {
      if (i + 1 >= args.length) {
        System.err.println(s"$flag needs a value\n$usage")
        throw MissingFlagValue
      }
      args(i + 1)
    }
    try while (i < args.length) {
      args(i) match {
        case f @ ("--config" | "-c") => config = Some(value(f)); i += 2
        case f @ ("--transform" | "-t") => transformCls = Some(value(f)); i += 2
        case "--validate" => validate = true; i += 1
        case "--incremental" => incremental = true; i += 1
        case f @ "--build-index" => buildIndex = Some(value(f)); i += 2
        case f @ "--ingest" => ingest = Some(value(f)); i += 2
        case f @ "--compact-index" => compactIndex = Some(value(f)); i += 2
        case f @ "--backfill-gid" => backfillGid = Some(value(f)); i += 2
        case f @ "--sweep-staging" => sweepStaging = Some(value(f)); i += 2
        case "--verbose" | "-v" => verbose = true; i += 1
        case "--version" => println(s"graft $version"); return 0
        case "--help" | "-h" => println(usage); return 0
        case other => System.err.println(s"unknown argument: $other\n$usage"); return 1
      }
    } catch { case MissingFlagValue => return 1 }
    // a migration config combined with an op verb used to run ONLY the
    // verb and exit 0 — the user's migration silently never happened.
    // One invocation does one thing; refuse the ambiguity loudly.
    val opVerbs = Seq(buildIndex, ingest, compactIndex, backfillGid, sweepStaging)
    if (config.isDefined && opVerbs.exists(_.isDefined)) {
      System.err.println("--config cannot be combined with an operational verb " +
        "(--build-index/--ingest/--compact-index/--backfill-gid/--sweep-staging): " +
        s"only the verb would run and the migration would be silently skipped\n$usage")
      return 1
    }
    // the same silent-skip hazard BETWEEN verbs: dispatch order would run
    // only the first of --backfill-gid + --sweep-staging (exit 0, sweep
    // never happened). Exception: the sig-index trio composes by design
    // (build, then ingest, then compact — one session, documented).
    val sigVerbs = Seq(buildIndex, ingest, compactIndex).count(_.isDefined)
    val soloVerbs = Seq(backfillGid, sweepStaging).count(_.isDefined)
    if (soloVerbs > 1 || (soloVerbs > 0 && sigVerbs > 0)) {
      System.err.println("--backfill-gid / --sweep-staging cannot be combined " +
        "with each other or with the sig-index verbs: only the first would " +
        s"run and the rest would be silently skipped\n$usage")
      return 1
    }
    // migration-only flags alongside a verb would be silently ignored
    if (opVerbs.exists(_.isDefined) &&
        (validate || incremental || transformCls.isDefined)) {
      System.err.println("--validate/--incremental/--transform apply only to a " +
        s"--config migration; combined with an operational verb they would be " +
        s"silently ignored\n$usage")
      return 1
    }
    backfillGid.foreach { path => return runBackfillGid(path) }
    sweepStaging.foreach { path => return runSweepStaging(path) }
    // signature-index verbs: dedup today's crawl against history
    if (buildIndex.isDefined || ingest.isDefined || compactIndex.isDefined)
      return runSigIndex(buildIndex, ingest, compactIndex, verbose)
    config match {
      case None => System.err.println(s"--config is required\n$usage"); 1
      case Some(path) =>
        val transform: Option[DataFrame => DataFrame] = transformCls.flatMap { cls =>
          try Some(Class.forName(cls).getDeclaredConstructor().newInstance()
            .asInstanceOf[DataFrame => DataFrame])
          catch {
            case e: Exception =>
              // degrade to no-op like cli/migrate.py:83-93
              System.err.println(s"warning: could not load transform $cls (${e.getMessage}); continuing without")
              None
          }
        }
        // reuse an already-running session (library embedding); only stop
        // sessions this CLI itself created
        val preExisting = org.apache.spark.sql.SparkSession.getActiveSession
          .orElse(org.apache.spark.sql.SparkSession.getDefaultSession).isDefined
        val spark = GraftSession.local("graft-migrate")
        // only quiet logs on a session this CLI created: setLogLevel is a
        // CONTEXT-global mutation, and downgrading an embedding host
        // application's logging for the rest of its lifetime is a side
        // effect on a session we explicitly treat as not-owned
        if (!verbose && !preExisting) spark.sparkContext.setLogLevel("WARN")
        try {
          val report =
            if (incremental)
              graft.core.IncrementalMigrator.run(spark,
                graft.config.MigrationConfig.fromFile(path), transform)
            else Migrator.runMigration(spark, path, transform)
          if (verbose || !report.success) println(report)
          if (report.success) {
            println(s"migration complete: ${report.written} records " +
              s"${report.sourceType} -> ${report.targetType}" +
              (if (report.skipped > 0) s" (${report.skipped} skipped)" else ""))
            if (validate) {
              val cfgV = graft.config.MigrationConfig.fromFile(path)
              // Validator's append contract: on a recreate run extras are
              // defects (strict); on an append run ids_extra_in_target is
              // informational (prior contents are legitimate) while the
              // shipped-id checks — missing, dups, vector mismatches —
              // stay strict in both modes
              if (!cfgV.target.load.exists(_.recreate))
                System.err.println("note: --validate on an append run — " +
                  "ids_extra_in_target reports prior target contents " +
                  "informationally (not a failure); duplicate-id and " +
                  "vector-mismatch checks remain strict")
              val rows = graft.core.Validator.validateMigration(spark,
                cfgV, transform).collect()
              rows.foreach(r => println(f"validate: ${r.getString(0)}%-24s " +
                f"${r.getLong(1)}%10d  ${if (r.getBoolean(2)) "ok" else "FAIL"}"))
              val failed = rows.count(!_.getBoolean(2))
              if (failed > 0) {
                System.err.println(s"validation failed: $failed check(s)")
                return 1
              }
              println("validation passed")
            }
            0
          } else {
            System.err.println(s"migration failed: ${report.error.getOrElse("unknown error")}")
            1
          }
        } catch {
          case e: Exception => System.err.println(s"migration failed: ${e.getMessage}"); 1
        } finally if (!preExisting) spark.stop()
    }
  }

  /** `--build-index cfg.json` builds the persisted near-dedup signature
    * index from a corpus; `--ingest cfg.json` checks a batch against it,
    * writes the novel docs, and appends them to the index. Both may appear
    * together: build from the corpus, then ingest (the configs differ in
    * their `documents` block). */
  private def runSigIndex(build: Option[String], ingest: Option[String],
                          compactIdx: Option[String], verbose: Boolean): Int = {
    val preExisting = org.apache.spark.sql.SparkSession.getActiveSession
      .orElse(org.apache.spark.sql.SparkSession.getDefaultSession).isDefined
    val spark = GraftSession.local("graft-sig-index")
    // not-owned sessions keep their host's log level (see run())
    if (!verbose && !preExisting) spark.sparkContext.setLogLevel("WARN")
    try {
      build.foreach { path =>
        val cfg = graft.core.SigIndex.configFromFile(path)
        val n = graft.core.SigIndex.build(spark,
          graft.core.SigIndex.readDocs(spark, cfg), cfg.indexDir, cfg.params)
        println(s"index built: $n docs -> ${cfg.indexDir}")
      }
      ingest.foreach { path =>
        val cfg = graft.core.SigIndex.configFromFile(path)
        val r = graft.core.SigIndex.ingest(spark,
          graft.core.SigIndex.readDocs(spark, cfg), cfg.indexDir, cfg.params,
          cfg.novelOutput)
        println(s"ingest complete: ${r.batchDocs} batch docs, " +
          s"${r.alreadyIndexed} already indexed, " +
          s"${r.corpusDups} near-duplicates of history, " +
          s"${r.withinBatchDups} collapsed within the batch, ${r.novelDocs} novel" +
          cfg.novelOutput.map(o => s" -> $o").getOrElse(""))
      }
      compactIdx.foreach { path =>
        val cfg = graft.core.SigIndex.configFromFile(path)
        val r = graft.core.SigIndex.compact(spark, cfg.indexDir)
        r.toSeq.sortBy(_._1).foreach { case (art, (before, after)) =>
          println(s"compacted $art: $before -> $after files")
        }
      }
      0
    } catch {
      case e: Exception => System.err.println(s"sig-index failed: ${e.getMessage}"); 1
    } finally if (!preExisting) spark.stop()
  }

  /** `--backfill-gid cfg.json`: mirror numeric record ids into the
    * reserved `__gid` metadata field of a FOREIGN collection so later
    * extractions run as parallel sliced cursor walks (one sequential walk,
    * driver-side, no SparkSession — see
    * [[graft.connectors.vectorstore.GidBackfill]]). Config:
    * `{"type": "qdrant"|"pinecone", "connection": {"url": ..,
    * "api_key": ..}, "collection": "c", "batch_size": 200}` (Pinecone
    * namespaces via `connection.namespace`, like a migration source). */
  private def runBackfillGid(path: String): Int = {
    import graft.connectors.vectorstore.{GidBackfill, TransportSpec}
    try {
      val cfg = readOpConfig(path, "backfill-gid")
      // only these codecs inject the mirror on upsert — any other backend
      // would rewrite the whole collection and accomplish nothing
      if (cfg.backend != "qdrant" && cfg.backend != "pinecone")
        throw new graft.config.ConfigException(
          s"backfill-gid supports qdrant and pinecone (the __gid-mirroring " +
            s"codecs), got '${cfg.backend}'")
      val spec = TransportSpec.fromOptions(cfg.connStr, backend = cfg.backend)
      // reject-don't-coerce, like MigrationConfig's numeric fields: a raw
      // asInt() turns "abc"/objects into 0 and the walk pages with limit 0
      val batch = Option(cfg.root.get("batch_size")).filterNot(_.isNull).map { n =>
        if (n.isNumber && n.canConvertToExactIntegral && n.canConvertToInt) n.asInt()
        else if (n.isTextual && n.asText().trim.toIntOption.isDefined) n.asText().trim.toInt
        else throw new graft.config.ConfigException(s"'batch_size' must be an integer, got: $n")
      }.getOrElse(200)
      if (batch <= 0)
        throw new graft.config.ConfigException(s"'batch_size' must be positive, got: $batch")
      val r = GidBackfill.run(spec, cfg.collection, batch)
      println(s"backfill-gid complete on ${cfg.collection}: $r")
      0
    } catch {
      case e: Exception => System.err.println(s"backfill-gid failed: ${e.getMessage}"); 1
    }
  }

  /** `--sweep-staging cfg.json`: drop `__staging_*` generations of a
    * target stranded by crashed or lost-response atomic publishes. An
    * OPERATOR verb by design — dropping staging siblings from a running
    * commit could destroy a concurrent publish's live shadow, so the
    * engine never sweeps automatically; run this when no publish to the
    * target is in flight. Config: `{"type": ..., "connection": {...},
    * "collection": "target"}` (same shape as backfill-gid). */
  private def runSweepStaging(path: String): Int = {
    import graft.connectors.vectorstore.{TransportSpec, VectorStore}
    try {
      val cfg = readOpConfig(path, "sweep-staging")
      val target = cfg.collection
      val store = VectorStore.resolve(TransportSpec.fromOptions(cfg.connStr, cfg.backend))
      // two shadow shapes: sibling collections (`t__staging_*`) and, for
      // backends that stage in a namespace of a bare-index target
      // (Pinecone), `t::__staging_*`. Live generations never appear here:
      // listCollections hides pointer targets behind their logical name.
      val doomed = store.listCollections()
        .filter(c => c.startsWith(s"${target}__staging_") ||
          c.startsWith(s"$target::__staging_"))
      doomed.foreach(store.drop)
      println(s"sweep-staging complete on $target: " +
        s"${doomed.length} stranded generation(s) dropped" +
        (if (doomed.nonEmpty) doomed.mkString(" (", ", ", ")") else ""))
      0
    } catch {
      case e: Exception => System.err.println(s"sweep-staging failed: ${e.getMessage}"); 1
    }
  }

  private val usage =
    """usage: graft-migrate --config <config.json> [--transform <class>] [--validate] [--incremental] [--verbose] [--version]
      |       graft-migrate --build-index <sig.json> | --ingest <sig.json> | --compact-index <sig.json>
      |  --build-index   build the persisted near-dedup signature index
      |                  (sigs/bands/bucket-widths) from a document corpus
      |  --ingest        dedup a batch against the index: novel docs written
      |                  to 'novel_output', then appended to the index
      |  --compact-index rewrite the index artifacts to bounded file counts
      |                  (run offline; appends accumulate small files)
      |  --backfill-gid  mirror numeric ids into the __gid metadata field of
      |                  a foreign collection (one sequential walk) so later
      |                  extractions run as parallel sliced cursor walks
      |  --sweep-staging drop __staging_* generations stranded by crashed or
      |                  lost-response atomic publishes (run when no publish
      |                  to the target is in flight)
      |  --config/-c     migration config JSON (same shape as the reference tool)
      |  --transform/-t  fully-qualified class implementing DataFrame => DataFrame
      |  --validate      after a successful run, re-derive the expected target
      |                  and check the collection (counts, ids, dups, vector
      |                  signatures); exit 1 on any failed check. On append
      |                  runs (recreate: false) ids_extra_in_target is
      |                  informational — prior contents are not defects
      |  --incremental   ship only records NEW or CHANGED vs the target
      |                  collection (the reference's named future work);
      |                  appends regardless of 'recreate'
      |  --verbose/-v    verbose logging + full run report
      |  --version       print version and exit""".stripMargin
}
