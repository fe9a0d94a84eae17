package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-stress probe: replicates the sf0.1 inputs 10-20× in memory and
  * times the hottest paths, so "would this hold at 100×?" is answered with
  * numbers rather than hope. Run: `sbt "runMain graft.Stress"`.
  *
  * Replicated documents are exact twins — the worst case for LSH (every
  * bucket holds the full twin group), deliberately stressing candidate
  * generation and verification.
  */
object Stress {
  // Fixture dirs hold GB-scale replicated corpora; repeated stress runs
  // must not accumulate them in /tmp until the disk fills.
  private val tmpDirs = scala.collection.mutable.ArrayBuffer[String]()
  private def tmpDir(prefix: String): String = {
    val d = java.nio.file.Files.createTempDirectory(prefix).toString
    tmpDirs += d
    d
  }
  private def cleanup(): Unit = tmpDirs.foreach { d =>
    try {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(java.nio.file.Paths.get(d)).iterator().asScala.toSeq
        .sortBy(-_.getNameCount).foreach(java.nio.file.Files.deleteIfExists(_))
    } catch { case _: java.io.IOException => () }
  }

  private def time[T](name: String)(f: => T): T = {
    val t0 = System.nanoTime()
    val r = f
    println(f"[stress] $name%-42s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val dir = "/root/testdata/sf0.1"
    val spark = graft.core.Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))

    def replicate(df: DataFrame, idCol: String, n: Int): DataFrame =
      (0 until n).map(i =>
        df.withColumn(idCol, col(idCol) + lit(i.toLong * 10_000_000L)))
        .reduce(_ unionByName _)

    // 1. Near-dup detection over 100k docs (20× replication → dense twins).
    //    Materialized once — see the embedding-fixture note below.
    val docsDir = tmpDir("stress-docs")
    replicate(graft.core.Tables.documents(spark, dir), "doc_id", 20)
      .write.mode("overwrite").parquet(s"$docsDir/docs")
    val docs100k = spark.read.parquet(s"$docsDir/docs")
    println(s"[stress] documents rows = ${docs100k.count()}")
    val pairs = time("minhash near-dups, 100k docs") {
      graft.analytics.Dedup.minHashNearDups(docs100k, threshold = 0.9).count()
    }
    println(s"[stress]   verified pairs found = $pairs")
    time("simhash signatures, 100k docs") {
      graft.analytics.Dedup.simHashSignatures(docs100k)
        .write.mode("overwrite").format("noop").save()
    }

    // 1b. Embedding near-dups in the LSH DESIGN regime (high threshold,
    //     wide tables) — the q21 path at the scale shape it exists for:
    //     40k vectors holding 2000 groups of 20 planted near-twins
    //     (deterministic element noise → twin cosine ≈ 0.999 but ~6-9°
    //     pair angles, while unrelated pairs stay under 0.5). 8×16-bit
    //     tables prune the ~800M-pair space to ~0.07% (measured); recall
    //     at these params measures ~98% — the report prints both so the
    //     table-count/recall trade is a number, not a claim (q21's gated
    //     configuration is separately recall-1.0-audited).
    // Materialize the synthetic corpus ONCE: the 20-way union's noise
    // transform is an interpreted higher-order function (~3.5 s per full
    // evaluation), and an unmaterialized fixture would be re-derived
    // inside every timed section — the timings would measure fixture
    // synthesis, not the operators (measured: IVF search "cost" dropped
    // from ~22 s to ~3 s once the fixture stopped riding along).
    val embDir = tmpDir("stress-emb")
    (0 until 20).map { i =>
      graft.core.Tables.embeddings(spark, dir)
        .withColumn("vec_id", col("vec_id") + lit(i.toLong * 10_000_000L))
        .withColumn("embedding",
          transform(col("embedding"), (x, j) =>
            x.cast("double") + lit(0.02) * sin(col("vec_id") + j.cast("double"))))
    }.reduce(_ unionByName _).write.mode("overwrite").parquet(s"$embDir/emb")
    val emb40k = spark.read.parquet(s"$embDir/emb")
    println(s"[stress] embedding rows = ${emb40k.count()}")
    val candidates = time("lsh candidates (8×16-bit tables), 40k vecs") {
      graft.analytics.Similarity.lshCandidatePairs(
        emb40k, nTables = 8, bitsPerTable = 16).count()
    }
    val twinPairs = time("lsh cosine near-dups t=0.95, 40k vecs") {
      graft.analytics.Similarity.lshCosineNearDups(
        emb40k, threshold = 0.95, nTables = 8, bitsPerTable = 16).count()
    }
    println(f"[stress]   candidates = $candidates (${candidates * 100.0 / (40000L * 39999 / 2)}%.3f%% " +
      s"of the pair space); verified twin pairs = $twinPairs of ~380k expected")

    // 1c. ANN kNN paths at 40k corpus / 100 queries: the multi-table LSH
    //     variant (q20's shape) and the IVF partitioned-index path
    //     (write 64 cell dirs, probe 4) — both must stay
    //     candidates-≪-corpus, no quadratic work.
    val queries100 = emb40k.filter(col("vec_id") < 100)
    time("multi-table ANN top-10 (24×12), 40k corpus × 100 q") {
      // dim is the fixture's schema contract — passing it skips the probe
      // pass, the exactly-two-scans shape the scaladoc promises.
      graft.analytics.Similarity.annKnnMultiTable(emb40k, queries100, k = 10, dim = 64)
        .write.mode("overwrite").format("noop").save()
    }
    val ivfModel = time("IVF train k=64 iters=2, 40k vecs") {
      graft.analytics.IvfIndex.train(emb40k, k = 64, iters = 2)
    }
    val idxDir = tmpDir("stress-ivf") + "/index"
    time("IVF partitioned-index write, 64 cell dirs") {
      graft.analytics.IvfIndex.writePartitionedIndex(emb40k, ivfModel, idxDir)
    }
    time("IVF partitioned search, 100 q nprobe=4") {
      graft.analytics.IvfIndex.searchPartitioned(
        spark, idxDir, queries100, ivfModel, k = 10, nprobe = 4)
        .write.mode("overwrite").format("noop").save()
    }

    // 1d. The full curation pipeline over the 100k-doc corpus — dedup →
    //     split → pack → bounded shards, end to end, with its one-pass
    //     accounting.
    val curDocs = tmpDir("stress-cur")
    val report = time("curate end-to-end, 100k docs") {
      graft.analytics.Curate.run(spark, s"$docsDir/docs", s"$curDocs/shards",
        threshold = 0.9)
    }
    println(s"[stress]   ${report.summary}")

    // 1e. Round-5 text/dedup paths over the same 100k-doc corpus.
    time("window dedup (8-token, stride 1), 100k docs") {
      graft.analytics.Dedup.windowDupes(docs100k)
        .write.mode("overwrite").format("noop").save()
    }
    val incMatches = time("incremental near-dups, 5k batch vs 95k base") {
      graft.analytics.Dedup.incrementalNearDups(
        docs100k.filter(col("doc_id") % 20 === 0),
        docs100k.filter(col("doc_id") % 20 =!= 0), threshold = 0.9).count()
    }
    println(s"[stress]   cross-side matches = $incMatches")
    time("heavy hitters over ~9M tokens") {
      graft.functions.FrequentItems.heavyHitters(
        docs100k.select(explode(
          graft.functions.shingleStrings(col("text"), 1)).as("token")),
        "token", support = 0.01).count()
    }
    time("RAG chunking, 100k docs") {
      graft.analytics.TrainingData.chunkDocs(docs100k)
        .write.mode("overwrite").format("noop").save()
    }

    // 2. Relational over 6M lineitem rows (10×).
    val li6m = replicate(graft.core.Tables.lineitem(spark, dir), "l_orderkey", 10)
    println(s"[stress] lineitem rows = ${li6m.count()}")
    time("pricing summary agg, 6M rows") {
      li6m.groupBy("l_returnflag", "l_linestatus")
        .agg(sum("l_quantity"), avg("l_extendedprice"), count(lit(1)))
        .write.mode("overwrite").format("noop").save()
    }
    time("window dedupe (sort), 6M rows") {
      graft.warehouse.MergeWriter.latestByKey(
        li6m, "l_orderkey",
        Seq(desc("l_shipdate"), desc("l_linenumber"), desc("l_extendedprice")))
        .write.mode("overwrite").format("noop").save()
    }
    time("max-struct dedupe (hash agg), 6M rows") {
      graft.warehouse.MergeWriter.maxByKey(
        li6m, "l_orderkey",
        Seq(col("l_shipdate"), col("l_linenumber"), col("l_extendedprice")))
        .write.mode("overwrite").format("noop").save()
    }

    // 2b. Bin-bucketed range join: 6M ship-date points against ~14k
    //     30-day windows (the naive non-equi form is 8.2e10 comparisons).
    time("range join, 6M points × 14k intervals") {
      val win = 30L * 86400
      val intervals = graft.core.Tables.orders(spark, dir)
        .filter(col("o_orderkey") % 11 === 0)
        .select(col("o_orderkey"),
          col("o_orderdate").cast("timestamp").cast("long").as("lo"),
          (col("o_orderdate").cast("timestamp").cast("long") + win).as("hi"))
      val points = li6m.select(
        col("l_shipdate").cast("timestamp").cast("long").as("pt"))
      graft.analytics.RangeJoin.pointInInterval(points, "pt", intervals, "lo", "hi", win)
        .groupBy("o_orderkey").agg(count(lit(1)))
        .write.mode("overwrite").format("noop").save()
    }

    // 2c. SCD2 history derivation from a 6M-row change log (one window
    //     pass keyed on l_orderkey).
    time("scd2 buildHistory, 6M-row change log") {
      graft.warehouse.Scd2.buildHistory(
        li6m.select(col("l_orderkey"),
          col("l_returnflag").as("attr"),
          struct(col("l_shipdate").cast("timestamp").cast("long").as("sec"),
            col("l_linenumber")).as("ord")),
        "l_orderkey", "attr", "ord")
        .write.mode("overwrite").format("noop").save()
    }

    // 2d. Z-order layout of 1M orders on (custkey, price bucket), then the
    //     skipping ratio a price-band predicate achieves from footer stats.
    val zDir = tmpDir("stress-z")
    time("z-order write, 1M rows, 64 files") {
      graft.warehouse.ZOrder.write(
        replicate(graft.core.Tables.orders(spark, dir), "o_orderkey", 7)
          .select((col("o_custkey") % 65536).as("a"),
            floor(col("o_totalprice") / 10).cast("long").as("b")),
        "a", "b", s"$zDir/orders", partitions = 64)
    }
    val ranges = graft.core.ParquetMeta.longRanges(spark, s"$zDir/orders", "b")
    val hit = ranges.count { case (_, mn, mx) => mx >= 0 && mn <= 2000 }
    println(s"[stress]   price-band files hit = $hit/${ranges.size} (linear layout hits all)")

    // 2e. Incremental HLL distinct-state over 2M events in 10 batches —
    //     per-update cost must track batch + state size, never history.
    val hllState = tmpDir("stress-hll") + "/state"
    val ev2m = replicate(
      graft.core.Tables.events(spark, dir).select(col("user_id"), col("event_type")),
      "user_id", 20)
    time("HLL state: 10 batch updates over 2M events") {
      (0 until 10).foreach { i =>
        graft.warehouse.SketchState.update(spark, hllState,
          ev2m.filter(col("user_id") % 10 === i), Seq("event_type"), "user_id")
      }
    }
    println(s"[stress]   state rows = ${spark.read.parquet(hllState).count()}")

    // 2f. Compact a 512-small-file table (the accumulation pathology).
    val fragDir = tmpDir("stress-compact") + "/tbl"
    replicate(graft.core.Tables.orders(spark, dir), "o_orderkey", 7)
      .repartition(512).write.mode("overwrite").parquet(fragDir)
    val creport = time("compact 512-file 1M-row table") {
      graft.warehouse.Compactor.compact(spark, fragDir)
    }
    println(s"[stress]   ${creport.summary}")

    // 3. Merge 10k updates into a 1M-row bucketed table: cost must track the
    //    batch + affected buckets, not the table.
    val wh = tmpDir("stress-wh")
    val tbl = s"$wh/big"
    val base = replicate(graft.core.Tables.orders(spark, dir), "o_orderkey", 7)
      .withColumn("_id", col("o_orderkey").cast("string"))
      .withColumn("_synced_at", lit(java.sql.Timestamp.valueOf("2024-01-01 00:00:00")))
    time("initial load, ~1M rows, 64 buckets") {
      graft.warehouse.MergeWriter.merge(spark, tbl, base)
    }
    val updates = base.limit(10000)
      .withColumn("_synced_at", lit(java.sql.Timestamp.valueOf("2024-06-01 00:00:00")))
    time("merge 10k updates into 1M-row table") {
      graft.warehouse.MergeWriter.merge(spark, tbl, updates)
    }
    println(s"[stress] merged table rows = ${graft.warehouse.MergeWriter.read(spark, tbl).count()}")

    // 4. Streaming state paths at 2M+ events — throughput and, crucially,
    //    STATE SIZE: keyed/join state must track keys / the watermark
    //    horizon, never total rows streamed (the unbounded-stream
    //    property the specs assert and this section puts numbers on).
    //    The fixture streams through 10 time-ordered files (one
    //    micro-batch each), so watermarks actually advance mid-run.
    import org.apache.spark.sql.streaming.Trigger
    import org.apache.spark.sql.types._
    val evSchema = StructType(Seq(
      StructField("event_id", LongType), StructField("user_id", LongType),
      StructField("event_type", StringType), StructField("ts", TimestampType),
      StructField("value", DoubleType)))
    val streamSrc = tmpDir("stress-stream") + "/src"
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val ev2mFull = replicate(
      graft.core.Tables.events(spark, dir)
        .select(col("event_id"), col("user_id"), col("event_type"),
          col("ts").cast("timestamp").as("ts"), col("value")),
      "user_id", 20)
      .withColumn("event_id",
        col("event_id") + (col("user_id") / 10_000_000L).cast("long") * 100_000_000L)
    ev2mFull.repartitionByRange(10, col("ts"))
      .sortWithinPartitions("ts")
      .write.mode("overwrite").parquet(streamSrc)
    // Pin arrival order = time order (file source sorts by mod time).
    new java.io.File(streamSrc).listFiles()
      .filter(_.getName.endsWith(".parquet")).sortBy(_.getName).zipWithIndex
      .foreach { case (f, i) => f.setLastModified(1700000000000L + i * 60000L) }
    val nStream = spark.read.parquet(streamSrc).count()
    println(s"[stress] stream fixture rows = $nStream (10 time-ordered files)")

    def runStream(name: String)(build: org.apache.spark.sql.DataFrame =>
        org.apache.spark.sql.DataFrame): Unit = {
      val src = spark.readStream.schema(evSchema)
        .option("maxFilesPerTrigger", 1).parquet(streamSrc)
      val t0 = System.nanoTime()
      val q = build(src).writeStream
        .trigger(Trigger.AvailableNow())
        .option("checkpointLocation", tmpDir(s"stress-ckpt-$name"))
        .format("noop").start()
      q.awaitTermination()
      val secs = (System.nanoTime() - t0) / 1e9
      val state = q.recentProgress.lastOption
        .map(_.stateOperators.map(_.numRowsTotal).sum).getOrElse(0L)
      val removed = q.recentProgress.flatMap(_.stateOperators.map(_.numRowsRemoved)).sum
      println(f"[stress] $name%-42s $secs%8.2f s  " +
        f"(${nStream / secs / 1e6}%.2f M rows/s in; state=$state rows, evicted=$removed)")
    }

    // 4a. Streaming SCD2 CDC fold: state = one current version per key.
    runStream("scd2 stream fold, 2M changes") { src =>
      import spark.implicits._
      graft.streaming.Scd2Stream.historyStream(
        src.select(col("user_id").as("key"), col("event_type").as("attr"),
          col("ts").cast("long").as("ord")).as[graft.streaming.Scd2Stream.Change]
      ).toDF()
    }

    // 4b. Watermarked ingestion dedup: every event arrives twice (self-
    //     union), state = keys within the watermark horizon only.
    runStream("watermark dedup, 2M events x2 arrivals") { src =>
      graft.streaming.StreamingSync.dedupedStream(
        src.unionByName(src), Seq("event_id"), "ts", lateness = "1 hour")
    }

    // 4c. Stream-stream funnel join: views x purchases within 30 min.
    runStream("stream-stream join, 2M events") { src =>
      graft.streaming.StreamingSync.streamJoin(
        src.filter(col("event_type") === "view")
          .select(col("user_id").as("v_user"), col("ts").as("v_ts")),
        src.filter(col("event_type") === "purchase")
          .select(col("user_id").as("b_user"), col("ts").as("b_ts")),
        leftKey = "v_user", rightKey = "b_user",
        leftTs = "v_ts", rightTs = "b_ts",
        within = "30 minutes", lateness = "10 minutes")
    }

    spark.stop()
    cleanup()
  }
}
