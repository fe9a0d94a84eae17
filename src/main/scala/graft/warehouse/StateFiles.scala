package graft.warehouse

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** The shared persistence discipline of the incremental state tables
  * ([[SketchState]], [[QuantileState]]): crash recovery from the backup
  * copy, then a two-rename staged swap so the state is never observable
  * half-written. Callers hold the table's [[graft.core.PathLocks]] lock
  * (and optionally the cross-driver [[LeaseLock]]) around both calls.
  */
private[graft] object StateFiles {

  private def bakPath(p: Path) = new Path(p.getParent, s".bak_${p.getName}")
  private def tmpPath(p: Path) = new Path(p.getParent, s".tmp_${p.getName}")

  /** Heal a crash between the two swap renames: live path missing with
    * the only copy in .bak → restore it, or the next update would
    * silently rebuild state from one batch and delete all accumulated
    * history.
    */
  def recover(spark: SparkSession, statePath: String): Unit = {
    val p = new Path(statePath)
    val hfs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val bak = bakPath(p)
    if (!hfs.exists(p) && hfs.exists(bak)) {
      if (!hfs.rename(bak, p)) sys.error(s"state recovery failed for $p")
    }
  }

  /** Write `merged` beside the live state, then swap it in with two
    * renames (live → .bak, .tmp → live); a failed install rolls back.
    */
  def install(spark: SparkSession, statePath: String, merged: DataFrame): Unit = {
    val p = new Path(statePath)
    val hfs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tmp = tmpPath(p)
    merged.write.mode("overwrite").parquet(tmp.toString)
    swapIn(hfs, tmp, p)
  }

  private def swapIn(hfs: org.apache.hadoop.fs.FileSystem, tmp: Path, p: Path): Unit = {
    val bak = bakPath(p)
    if (hfs.exists(bak)) hfs.delete(bak, true)
    if (hfs.exists(p) && !hfs.rename(p, bak)) sys.error(s"state backup failed for $p")
    if (!hfs.rename(tmp, p)) {
      hfs.rename(bak, p)
      sys.error(s"state install failed for $p")
    }
    hfs.delete(bak, true)
  }

  // ------------------------------------------------------------ markers
  //
  // Single-row commit markers (`last_batch`, `folded_through`, …) are
  // driver-side METADATA, but reading one as `spark.read.parquet(..).head()`
  // and writing one as `Seq(..).toDF.write.parquet` costs a full Spark job
  // each — schema inference, plan, task launch, commit protocol — and a
  // state lifecycle touches its markers 5–12 times. Measured on the gated
  // state queries: roughly half their wall time was this orchestration,
  // not data work. The helpers below move marker I/O to direct
  // parquet-hadoop reads/writes on the driver (zero Spark jobs), keeping
  // the FILE FORMAT exactly parquet so existing states written by Spark
  // read back unchanged and every marker this writes remains readable by
  // `spark.read.parquet` (MarkerFilesSpec pins both directions).
  // Supported field types: Long and Seq[String] — the whole marker
  // surface of the state family.

  /** Build the parquet schema for a marker row. */
  private def markerSchema(fields: Seq[(String, Any)]): org.apache.parquet.schema.MessageType = {
    import org.apache.parquet.schema.{LogicalTypeAnnotation, Types}
    import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName._
    val b = Types.buildMessage()
    fields.foreach {
      case (n, _: Long) => b.addField(Types.required(INT64).named(n))
      case (n, _: Seq[_]) => b.addField(
        Types.optionalList()
          .optionalElement(BINARY).as(LogicalTypeAnnotation.stringType())
          .named(n))
      case (n, v) => sys.error(s"marker field $n: unsupported type $v")
    }
    b.named("spark_schema")
  }

  /** Write a single-row marker parquet dir directly (no Spark job). */
  def writeMarkerDir(spark: SparkSession, dir: String,
                     fields: Seq[(String, Any)]): Unit = {
    val conf = spark.sparkContext.hadoopConfiguration
    val d = new Path(dir)
    val hfs = d.getFileSystem(conf)
    hfs.delete(d, true)
    hfs.mkdirs(d)
    val schema = markerSchema(fields)
    val g = new org.apache.parquet.example.data.simple.SimpleGroup(schema)
    fields.foreach {
      case (n, v: Long) => g.add(n, v)
      case (n, vs: Seq[_]) =>
        val lg = g.addGroup(n)
        vs.foreach(s => lg.addGroup("list").add("element", s.toString))
      case _ => ()
    }
    val file = new Path(d, "part-00000-marker.parquet")
    val w = org.apache.parquet.hadoop.example.ExampleParquetWriter
      .builder(org.apache.parquet.hadoop.util.HadoopOutputFile.fromPath(file, conf))
      .withConf(conf).withType(schema).build()
    try w.write(g) finally w.close()
  }

  /** Read the single marker row (no Spark job): field name → Long /
    * Seq[String], or None when the dir is missing/empty. Reads markers
    * written by Spark AND by [[writeMarkerDir]]; lists are navigated
    * structurally so both writers' inner naming resolves.
    */
  def readMarker(spark: SparkSession, dir: String): Option[Map[String, Any]] = {
    val conf = spark.sparkContext.hadoopConfiguration
    val d = new Path(dir)
    val hfs = d.getFileSystem(conf)
    if (!hfs.exists(d)) return None
    val parts = hfs.listStatus(d).toSeq
      .filter { st =>
        val n = st.getPath.getName
        st.isFile && !n.startsWith("_") && !n.startsWith(".") && st.getLen > 0
      }
      .sortBy(_.getPath.getName)
    parts.iterator.flatMap { st =>
      val reader = org.apache.parquet.hadoop.ParquetReader
        .builder(new org.apache.parquet.hadoop.example.GroupReadSupport(), st.getPath)
        .withConf(conf).build()
      try {
        Option(reader.read()).map { g =>
          val t = g.getType
          (0 until t.getFieldCount).flatMap { i =>
            val f = t.getType(i)
            val name = f.getName
            if (f.isPrimitive) {
              if (g.getFieldRepetitionCount(i) == 0) None
              else f.asPrimitiveType().getPrimitiveTypeName match {
                case org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName.INT64 =>
                  Some(name -> g.getLong(i, 0))
                case org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName.INT32 =>
                  Some(name -> g.getInteger(i, 0).toLong)
                case org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName.BINARY =>
                  Some(name -> g.getString(i, 0))
                case _ => None
              }
            } else { // 3-level list: group (LIST) { repeated group { element } }
              if (g.getFieldRepetitionCount(i) == 0) Some(name -> Seq.empty[String])
              else {
                val lg = g.getGroup(i, 0)
                val n = lg.getFieldRepetitionCount(0)
                Some(name -> (0 until n).map { j =>
                  val e = lg.getGroup(0, j)
                  if (e.getFieldRepetitionCount(0) > 0) e.getString(0, 0) else null
                }.toSeq)
              }
            }
          }.toMap
        }
      } finally reader.close()
    }.nextOption()
  }

  /** [[install]] for a marker row: direct write + the same staged swap —
    * zero Spark jobs.
    */
  def installMarker(spark: SparkSession, statePath: String,
                    fields: Seq[(String, Any)]): Unit = {
    val p = new Path(statePath)
    val hfs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tmp = tmpPath(p)
    writeMarkerDir(spark, tmp.toString, fields)
    swapIn(hfs, tmp, p)
  }

  def exists(spark: SparkSession, statePath: String): Boolean = {
    val p = new Path(statePath)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }

  // ---------------------------------------------------- footer row counts
  //
  // The state reclusters used to run TWO Spark count jobs per fold — one
  // to size the corpus (`all.count()`: cell-law k, empty-fold short-
  // circuit) and one to verify the staged index row count before the
  // swap. Every frame those counts measure is a parquet directory this
  // module itself wrote (bundle/index, deltas/batch=N, .staging_bundle/
  // index), so both numbers are already sitting in the files' footers:
  // read them on the driver like any other planning-time metadata
  // ([[graft.core.ParquetMeta.rowCount]] — O(files), no data pages, no
  // job). The verify keeps its meaning: footer record counts are written
  // by the writer of the staged files, so a lossy rewrite still shows up
  // as a mismatch.

  /** Footer row count of a parquet dir, 0 when it does not exist. */
  def dirRowCount(spark: SparkSession, dir: String): Long = {
    val p = new Path(dir)
    val hfs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!hfs.exists(p)) 0L
    else graft.core.ParquetMeta.rowCount(spark, dir)
  }

  /** Footer row count of the delta dirs `batch=N` with from < N ≤ last
    * under `deltasDir` — the exact row count of the unfolded tail, with
    * no Spark job (each batch dir was written by this state's own
    * update verb).
    */
  def tailRowCount(spark: SparkSession, deltasDir: String,
                   from: Long, last: Long): Long = {
    val p = new Path(deltasDir)
    val hfs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!hfs.exists(p)) 0L
    else hfs.listStatus(p).iterator
      .filter { st =>
        st.isDirectory && st.getPath.getName.stripPrefix("batch=").toLongOption
          .exists(b => b > from && b <= last)
      }
      .map(st => graft.core.ParquetMeta.rowCount(spark, st.getPath.toString))
      .sum
  }

  // ------------------------------------------------- bounded long pairs
  //
  // Driver-side read/write of a SMALL two-long-column parquet state (the
  // ComponentsState (node, label) table under its driver-arm cap): the
  // same job-free parquet-hadoop discipline as the markers, for states
  // that are metadata-sized by construction when the bounded dispatch
  // arm is taken. Both directions stay plain parquet — Spark-written
  // states read back, and driver-written states remain readable by
  // `spark.read.parquet` (MarkerFilesSpec's contract, extended by
  // ComponentsStateSpec over the fold path).

  /** All (a, b) rows under `dir` read on the driver, or None when the
    * footer row count exceeds `cap` (caller falls back to the cluster).
    */
  def readLongPairs(spark: SparkSession, dir: String, aCol: String,
                    bCol: String, cap: Long): Option[Array[(Long, Long)]] = {
    val conf = spark.sparkContext.hadoopConfiguration
    val d = new Path(dir)
    val hfs = d.getFileSystem(conf)
    if (!hfs.exists(d)) return Some(Array.empty)
    val n = graft.core.ParquetMeta.rowCount(spark, dir)
    if (n > cap) return None
    val out = new scala.collection.mutable.ArrayBuffer[(Long, Long)](n.toInt)
    val parts = hfs.listStatus(d).toSeq
      .filter { st =>
        val nm = st.getPath.getName
        st.isFile && nm.endsWith(".parquet") && !nm.startsWith("_") &&
          !nm.startsWith(".") && st.getLen > 0
      }
      .sortBy(_.getPath.getName)
    parts.foreach { st =>
      val reader = org.apache.parquet.hadoop.ParquetReader
        .builder(new org.apache.parquet.hadoop.example.GroupReadSupport(), st.getPath)
        .withConf(conf).build()
      try {
        var g = reader.read()
        while (g != null) {
          val t = g.getType
          out += ((g.getLong(t.getFieldIndex(aCol), 0),
            g.getLong(t.getFieldIndex(bCol), 0)))
          g = reader.read()
        }
      } finally reader.close()
    }
    Some(out.toArray)
  }

  /** [[install]] for a driver-held (a, b) long-pair table: direct
    * parquet write + the same staged swap — zero Spark jobs. Bounded by
    * the caller's dispatch cap, never corpus-sized.
    */
  def installLongPairs(spark: SparkSession, statePath: String, aCol: String,
                       bCol: String, rows: Array[(Long, Long)]): Unit = {
    import org.apache.parquet.schema.{PrimitiveType, Types}
    val p = new Path(statePath)
    val hfs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val conf = spark.sparkContext.hadoopConfiguration
    val tmp = tmpPath(p)
    hfs.delete(tmp, true)
    hfs.mkdirs(tmp)
    val schema = Types.buildMessage()
      .addField(Types.optional(PrimitiveType.PrimitiveTypeName.INT64).named(aCol))
      .addField(Types.optional(PrimitiveType.PrimitiveTypeName.INT64).named(bCol))
      .named("spark_schema")
    val file = new Path(tmp, "part-00000-state.parquet")
    val w = org.apache.parquet.hadoop.example.ExampleParquetWriter
      .builder(org.apache.parquet.hadoop.util.HadoopOutputFile.fromPath(file, conf))
      .withConf(conf).withType(schema).build()
    try rows.foreach { case (a, b) =>
      val g = new org.apache.parquet.example.data.simple.SimpleGroup(schema)
      g.add(aCol, a); g.add(bCol, b)
      w.write(g)
    } finally w.close()
    swapIn(hfs, tmp, p)
  }

  /** The ANN states' shared tail crossJoin with a SIZED broadcast side —
    * broadcast is a command, not a suggestion, so a hint goes only on a
    * side that is MEASURED small (r15 ADVICE: the unconditional
    * `broadcast(tail)` arm could ship a near-recluster-threshold tail of
    * raw dim-double vectors past the driver's broadcast limits — failing
    * exactly the large-|Q| job the query-side gate protects):
    *
    *  - query batch known small (`querySideSmall` from the bundle
    *    probe's sizing, or a bounded probe here) → broadcast it;
    *  - else tail measured small (one bounded job against the same
    *    [[graft.analytics.IvfIndex.queryBroadcastMaxRows]] ceiling) →
    *    broadcast the tail;
    *  - else NO hint: a plain crossJoin (CartesianProduct) is the
    *    scale-correct plan when both sides are genuinely large, and AQE
    *    still re-promotes a runtime-small side on its own.
    */
  def tailCross(qb: DataFrame, tail: DataFrame,
                querySideSmall: Option[Boolean]): DataFrame = {
    import graft.analytics.IvfIndex.{boundedCount, queryBroadcastMaxRows}
    import org.apache.spark.sql.functions.broadcast
    val qSmall = querySideSmall.getOrElse(
      boundedCount(qb, queryBroadcastMaxRows).isDefined)
    if (qSmall) tail.crossJoin(broadcast(qb))
    else if (boundedCount(tail, queryBroadcastMaxRows).isDefined)
      broadcast(tail).crossJoin(qb)
    else tail.crossJoin(qb)
  }
}
