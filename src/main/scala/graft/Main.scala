package graft

import org.apache.spark.sql.SparkSession

import graft.core.Settings
import graft.engine.SyncRunner

/** CLI mirroring the reference's control-plane verbs (SURVEY.md §2.K) —
  * the transport-free restatement of its REST API:
  *
  * {{{
  * sync <warehouseDir> <sources> <collection>   POST /sync/{collection}
  * scheduled <warehouseDir> <sources> <colls>   the APScheduler job body
  * logs <warehouseDir> [limit]                  GET /sync/logs
  * health <warehouseDir>                        GET /health
  * show <warehouseDir> <collection> [n]         read back a warehouse table
  * }}}
  *
  * `<sources>` uses the reference's setting syntax: a JSON object of
  * name → path or a comma-separated path list (auto-named source_N).
  */
object Main {

  private def session(): SparkSession =
    graft.core.Sessions.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"),
      master = sys.env.get("SPARK_GRAFT_MASTER"))

  /** Reference parity (config.py:60-70 validate): an empty source map is
    * a configuration error that exits 1 — not a silently successful no-op
    * sync.
    */
  private def requireSources(sources: String): Map[String, String] = {
    val parsed = Settings.parseSources(sources)
    if (parsed.isEmpty) {
      System.err.println("Configuration Errors:")
      System.err.println("- sources must be set (JSON dict or CSV list)")
      sys.exit(1)
    }
    parsed
  }

  def main(args: Array[String]): Unit = args.toList match {
    case "sync" :: wh :: sources :: collection :: Nil =>
      // Name gate (P7) runs before any path is built from the name.
      require(Settings.validCollectionName(collection),
        s"invalid collection name '$collection' (must match ${Settings.CollectionNamePattern})")
      val parsed = requireSources(sources)
      val spark = session()
      val runner = new SyncRunner(spark, Settings(wh, parsed))
      parsed.toSeq.sortBy(_._1).foreach { case (name, root) =>
        val res = runner.syncCollection(name, runner.resolveCollectionPath(root, collection),
          collection, graft.core.Schemas.byCollection.get(collection))
        println(s"[${res.status}] ${res.message}")
      }
      spark.stop()

    case "scheduled" :: wh :: sources :: colls :: Nil =>
      val parsed = requireSources(sources)
      val spark = session()
      val settings = Settings(wh, parsed,
        targetCollections = colls.split(",").toSeq)
      new SyncRunner(spark, settings).scheduledRun(graft.core.Schemas.byCollection)
        .foreach(r => println(s"[${r.status}] ${r.message}"))
      spark.stop()

    case "scheduled-loop" :: wh :: sources :: colls :: minutes :: rest =>
      // Resident scheduler (reference src/main.py:70-77): fixed-interval
      // ticks with coalesce/max_instances=1 overlap suppression; each tick
      // runs the scheduled job body then compacts the audit log so the
      // event-per-file append pattern stays bounded. Optional tick budget
      // for CLI drives; omit it for a run-forever resident driver.
      // Validate BEFORE starting Spark: a non-positive interval would
      // otherwise surface as an opaque timer exception mid-session.
      val intervalMillis = (minutes.toDouble * 60000L).toLong
      require(intervalMillis > 0, s"interval must be positive, got '$minutes' minutes")
      val parsed = requireSources(sources)
      val spark = session()
      val settings = Settings(wh, parsed,
        targetCollections = colls.split(",").toSeq)
      val runner = new SyncRunner(spark, settings)
      val loop = new graft.engine.ScheduledLoop(() => {
        runner.scheduledRun(graft.core.Schemas.byCollection)
          .foreach(r => println(s"[${r.status}] ${r.message}"))
        runner.history.compact()
      })
      loop.run(
        intervalMs = intervalMillis,
        maxTicks = rest.headOption.map(_.toLong).getOrElse(Long.MaxValue))
      println(s"[DONE] scheduled-loop ran ${loop.runCount} ticks, suppressed ${loop.skipCount}")
      spark.stop()

    case "logs" :: wh :: rest =>
      val spark = session()
      val runner = new SyncRunner(spark, Settings(wh))
      runner.history.recentRuns(rest.headOption.map(_.toInt).getOrElse(50))
        .show(100, truncate = false)
      spark.stop()

    case "health" :: wh :: Nil =>
      val spark = session()
      import scala.concurrent.ExecutionContext.Implicits.global
      val svc = new graft.api.SyncService(new SyncRunner(spark, Settings(wh)), Settings(wh))
      println(svc.health().map { case (k, v) => s"$k=$v" }.mkString(" "))
      spark.stop()

    case "stream" :: wh :: srcDir :: collection :: Nil =>
      // Structured Streaming drain-and-stop sync: Spark's streaming
      // checkpoint owns source offsets; repeated invocations process only
      // new files (SURVEY.md §2.I S1-S3).
      require(Settings.validCollectionName(collection),
        s"invalid collection name '$collection'")
      val schema = graft.core.Schemas.byCollection.getOrElse(collection,
        sys.error(s"no registered schema for '$collection' (streaming needs one)"))
      val spark = session()
      val q = graft.streaming.StreamingSync.availableNow(
        spark, srcDir, schema, sourceName = "stream",
        tablePath = s"$wh/$collection",
        checkpointDir = s"$wh/_meta/stream_ckpt_$collection")
      q.awaitTermination()
      val rows =
        if (graft.warehouse.MergeWriter.tableExists(spark, s"$wh/$collection"))
          graft.warehouse.MergeWriter.read(spark, s"$wh/$collection").count()
        else 0L // nothing to drain on the very first run of an empty source
      println(s"[SUCCESS] stream drain complete; table rows = $rows")
      spark.stop()

    case "load" :: wh :: file :: collection :: rest =>
      // dump.py parity: bulk file load with per-collection summary.
      val spark = session()
      val mode = rest.headOption.getOrElse("overwrite")
      val res = graft.sources.Loader.load(spark, wh, file, collection, mode)
      println(res.summary)
      spark.stop()

    case "curate" :: in :: out :: rest =>
      // End-to-end curation pipeline: dedup → split → pack → shards (the
      // training-data deliverable as one driven verb).
      val spark = session()
      val threshold = rest.headOption.map(_.toDouble).getOrElse(0.7)
      val maxPerFile = rest.drop(1).headOption.map(_.toLong).getOrElse(10000L)
      val report = graft.analytics.Curate.run(spark, in, out,
        threshold = threshold, maxRecordsPerFile = maxPerFile)
      println(report.summary)
      spark.stop()

    case "ann-index" :: emb :: out :: rest =>
      // Build the IVF ANN index lifecycle as a user verb: model + cell-
      // partitioned index land as ONE atomically-swapped bundle (a torn
      // model/index pair probes the wrong cell dirs — silently wrong).
      val spark = session()
      val k = rest.headOption.map(_.toInt).getOrElse(16)
      graft.analytics.IvfIndex.buildBundle(spark, spark.read.parquet(emb), out, k)
      println(s"[SUCCESS] IVF index bundle built: k=$k cells at $out")
      spark.stop()

    case "ann-search" :: out :: queriesPath :: rest =>
      // Probe a persisted bundle: loads the model, prunes to the probed
      // cell directories, exact-scores within them. External query sets
      // keep self-matches (their ids are unrelated to corpus ids).
      val spark = session()
      val k = rest.headOption.map(_.toInt).getOrElse(5)
      val nprobe = rest.drop(1).headOption.map(_.toInt).getOrElse(2)
      graft.analytics.IvfIndex.searchBundle(
        spark, out, spark.read.parquet(queriesPath), k, nprobe)
        .show(50, truncate = false)
      spark.stop()

    case "report" :: wh :: out :: Nil =>
      // Build the staff report from warehouse tables and write the JSON
      // array artifact (reference scraper.py:69-71). A missing input
      // table mirrors a failed per-staff fetch there (scraper.py:39-41):
      // warn, skip, and still write the artifact from what succeeded —
      // here an empty report — instead of dying on a raw read error.
      val spark = session()
      val runner = new SyncRunner(spark, Settings(wh))
      val missing = Seq("ticket", "users")
        .filterNot(t => graft.warehouse.MergeWriter.tableExists(spark, s"$wh/$t"))
      if (missing.isEmpty) {
        val report = graft.analytics.StaffReport.build(
          runner.readTable("ticket"), runner.readTable("users"))
        graft.warehouse.ReportSink.writeJsonArrayFile(report, out)
      } else {
        missing.foreach(t => System.err.println(s"warning: table '$t' not found in $wh; skipping"))
        java.nio.file.Files.write(java.nio.file.Paths.get(out), "[]".getBytes("UTF-8"))
      }
      println(s"Wrote staff report to $out")
      spark.stop()

    case "compact" :: table :: rest =>
      val spark = session()
      val targetMb = rest.headOption.map(_.toLong).getOrElse(128L)
      // lease=true: the CLI runs against live tables other drivers may be
      // reading/writing — cross-driver serialization is the safe default.
      val report = graft.warehouse.Compactor.compact(spark, table, targetMb << 20, lease = true)
      println(s"[compact] ${report.summary}")
      spark.stop()

    case "compact-index" :: kind :: root :: Nil =>
      // Maintenance verb for the incremental index/state family: fold the
      // per-batch delta dirs into one consolidated partition without
      // touching the `last_batch` commit marker (IndexCompaction). Same
      // lease default as `compact` — these roots are live foreachBatch
      // sinks.
      val spark = session()
      val reports = kind match {
        case "dedup" => graft.warehouse.DedupIndex.compact(spark, root, lease = true)
        case "retrieval" => graft.warehouse.RetrievalIndex.compact(spark, root, lease = true)
        case "covariance" => graft.warehouse.CovarianceState.compact(spark, root, lease = true)
        case "eval" => graft.warehouse.EvalState.compact(spark, root, lease = true)
        // The ANN states' compaction IS their model-refresh verb:
        // re-cluster / re-encode over everything committed, swap the
        // bundle, reclaim folded deltas (cell law / default codebook
        // sizing — the no-manual-tuning path).
        case "ivf" =>
          graft.warehouse.IvfState.recluster(spark, root, lease = true); Nil
        case "pq" =>
          graft.warehouse.PqState.retrain(spark, root, lease = true); Nil
        case "ivfpq" =>
          graft.warehouse.IvfPqState.recluster(spark, root, lease = true); Nil
        case "sq" =>
          graft.warehouse.SqState.recluster(spark, root, lease = true); Nil
        case "bit" =>
          graft.warehouse.BitState.recluster(spark, root, lease = true); Nil
        case "mips" =>
          graft.warehouse.MipsState.recluster(spark, root, lease = true); Nil
        case other =>
          System.err.println(s"unknown index kind: $other " +
            "(expected dedup|retrieval|covariance|eval|ivf|pq|ivfpq|sq|bit|mips)")
          spark.stop(); sys.exit(2)
      }
      reports.foreach(r => println(s"[compact-index] $r"))
      if (Set("ivf", "pq", "ivfpq", "sq", "bit", "mips")(kind))
        println(s"[compact-index] $kind state at $root re-folded " +
          "(bundle swapped, committed deltas reclaimed)")
      spark.stop()

    case "index-delete" :: kind :: root :: idsPath :: Nil =>
      // Curation verb for the encode-once ANN states: commit the id set
      // (a parquet with a vec_id column) as one TOMBSTONE epoch under
      // the exactly-once last_batch protocol. Search excludes the ids
      // immediately; the next compact-index fold purges them — a
      // curation pass no longer forces a full index rebuild.
      val spark = session()
      val face = kind match {
        case "sq" => graft.warehouse.SqState
        case "bit" => graft.warehouse.BitState
        case "mips" => graft.warehouse.MipsState
        case other =>
          System.err.println(s"unknown index kind: $other (expected sq|bit|mips)")
          spark.stop(); sys.exit(2)
      }
      val epoch = face.delete(spark, root, spark.read.parquet(idsPath), lease = true)
      println(s"[index-delete] $kind state at $root: tombstone epoch $epoch committed")
      spark.stop()

    case "migrate-state" :: kind :: root :: Nil =>
      // One-shot layout migration for a pre-delta-dir state table (the
      // verb CovarianceState's legacy guard points at): re-ingest the
      // old root-layout statistics as batch 0, then clear the legacy
      // files. Idempotent — safe to re-run after any crash point.
      // Covariance is the only family that ever shipped the old layout
      // (the other states were born on the delta-dir protocol).
      val spark = session()
      kind match {
        case "covariance" =>
          graft.warehouse.CovarianceState.migrateLegacy(spark, root, lease = true)
          println(s"[migrate-state] covariance state at $root migrated to " +
            "the delta-dir layout (legacy table ingested as batch 0)")
        case other =>
          System.err.println(s"unknown state kind: $other (expected " +
            "covariance — dedup/retrieval/eval states were born on the " +
            "delta-dir layout and have no legacy form)")
          spark.stop(); sys.exit(2)
      }
      spark.stop()

    case "cc-update" :: statePath :: edgesParquet :: Nil =>
      // Fold one parquet file of (a_id, b_id) edges into the incremental
      // connected-components state. Replayed edge files are structural
      // no-ops, so re-running after a crash is always safe.
      val spark = session()
      val edges = spark.read.parquet(edgesParquet)
      graft.warehouse.ComponentsState.update(spark, statePath, edges,
        lease = true)
      val n = spark.read.parquet(statePath).count()
      println(s"[cc-update] folded $edgesParquet into $statePath " +
        s"($n labeled nodes)")
      spark.stop()

    case "cc-components" :: statePath :: rest =>
      val spark = session()
      graft.warehouse.ComponentsState.components(spark, statePath)
        .orderBy(org.apache.spark.sql.functions.desc("n_nodes"))
        .show(rest.headOption.map(_.toInt).getOrElse(20), truncate = false)
      spark.stop()

    case "show" :: wh :: collection :: rest =>
      val spark = session()
      val runner = new SyncRunner(spark, Settings(wh))
      runner.readTable(collection).show(rest.headOption.map(_.toInt).getOrElse(20), truncate = false)
      spark.stop()

    case other =>
      System.err.println(
        s"""unknown command: ${other.mkString(" ")}
           |usage:
           |  sync <warehouseDir> <sources> <collection>
           |  scheduled <warehouseDir> <sources> <collections-csv>
           |  scheduled-loop <warehouseDir> <sources> <collections-csv> <minutes> [maxTicks]
           |  stream <warehouseDir> <srcDir> <collection>
           |  load <warehouseDir> <file> <collection> [overwrite|merge]
           |  curate <docsParquet> <outDir> [threshold] [maxRecordsPerFile]
           |  ann-index <embParquet> <outDir> [k]
           |  ann-search <outDir> <queriesParquet> [k] [nprobe]
           |  report <warehouseDir> <outFile.json>
           |  compact <tableDir> [targetMB]
           |  compact-index <dedup|retrieval|covariance|eval|ivf|pq|ivfpq|sq|bit|mips> <rootDir>
           |  index-delete <sq|bit|mips> <rootDir> <idsParquet>
           |  migrate-state <covariance> <rootDir>
           |  cc-update <statePath> <edgesParquet>
           |  cc-components <statePath> [n]
           |  logs <warehouseDir> [limit]
           |  health <warehouseDir>
           |  show <warehouseDir> <collection> [n]""".stripMargin)
      sys.exit(2)
  }
}
