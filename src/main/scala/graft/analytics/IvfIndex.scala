package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.dotProduct

/** IVF (inverted-file) approximate nearest neighbor — the coarse-quantizer
  * scale path alongside the LSH variant in [[Similarity]]:
  *
  *  1. TRAIN: k centroids via Lloyd iterations, fully distributed —
  *     assignment is a broadcast-centroid argmax per row; the update step
  *     posexplodes vectors to (cluster, dim) and hash-aggregates
  *     means, so no driver-side math over the corpus (the centroid set
  *     itself is tiny and collected).
  *  2. INDEX: each corpus vector is assigned to its nearest centroid —
  *     a narrow projection, storable as a partition column so probes
  *     prune at the scan.
  *  3. SEARCH: a query scores only the vectors in its `nprobe` nearest
  *     cells — corpus work drops by ~k/nprobe.
  *
  * Determinism: initial centroids are the vectors with the k smallest ids
  * (seeded sampling would also do); every later step is pure.
  *
  * Assignment has three plan shapes, dispatched on k by
  * [[withNearestCells]]: a per-centroid literal expression tree
  * (cheapest at small k); a broadcast (cell, centroid) table join with
  * a bounded-heap top-n aggregation (plan size O(1) in k — the
  * extreme-scale path, since k ~ √n reaches 10⁵ at the 10¹⁰-vector
  * design point where a literal tree would defeat codegen and drown the
  * driver in plan work); and past the codebook-broadcast ceiling
  * ([[hierarchicalAssignMinK]]) a two-level EXACT hierarchical assign
  * that broadcasts only a √k-row super-codebook
  * ([[hierarchicalNearestCell]] for corpus n = 1,
  * [[hierarchicalNearestCellsN]] for query n > 1). The paths are pinned
  * equal — doubles, ties and all — by IvfJoinAssignSpec and
  * HierarchicalAssignSpec.
  */
object IvfIndex {

  /** A trained coarse quantizer with two storage faces for the codebook:
    *
    *  - SEQ face (`Model(centroids)` / small [[load]]s): the k-cell
    *    codebook is a driver `Seq` — right for every small/medium-k
    *    consumer (literal expression trees, broadcast join tables,
    *    driver-arm probes are all built FROM driver data anyway).
    *  - TABLE face ([[Model.table]] / [[load]] past
    *    [[tableModelMinK]]): the codebook stays a parquet table on disk
    *    and the driver holds only `(path, k)` — the extreme-k form
    *    (k·dim·8 ≈ 10 GB at k = 10⁷, dim 128, the last documented ANN
    *    asymptote of rounds 14–15). The hierarchical assign + super-model
    *    build consume it through [[centroidsDf]] (a distributed scan), so
    *    nothing codebook-sized ever lands in driver heap on the
    *    load→assign→search lifecycle.
    *
    * A table-backed model at SMALL k still serves every path:
    * [[centroids]] materializes the driver Seq on demand (memoized), but
    * REFUSES past [[materializeMaxK]] — any extreme-k caller reaching for
    * driver centroids is sizing into the asymptote this face removes
    * (`centroidsDf` is the scale-correct accessor). Training still
    * returns the seq face (Lloyd's collected means are codebook-sized by
    * construction — a disk-trained codebook enters via [[Model.table]]).
    *
    * `path` records where the codebook parquet lives when known (both
    * faces after [[save]]/[[load]]), so [[superModelFor]] can persist and
    * reload the super-model beside it.
    */
  final case class Model private (
      private val seqOpt: Option[Seq[(Int, Seq[Double])]],
      path: Option[String],
      k: Int) {

    def tableBacked: Boolean = seqOpt.isEmpty

    /** Driver-side centroids — the seq face's field; the table face
      * materializes on demand below [[materializeMaxK]] and refuses
      * above it (use [[centroidsDf]] there).
      */
    def centroids: Seq[(Int, Seq[Double])] = seqOpt.getOrElse(materialized)

    @transient private lazy val materialized: Seq[(Int, Seq[Double])] = {
      require(k <= materializeMaxK,
        s"IvfIndex.Model: driver-side centroids requested on a table-backed " +
          s"codebook of k=$k cells (${path.getOrElse("?")}) — that is the " +
          s"driver-heap asymptote the table face exists to remove; consume " +
          s"the codebook via centroidsDf instead")
      val spark = org.apache.spark.sql.SparkSession.active
      spark.read.parquet(path.get).collect()
        .map(r => r.getInt(0) -> r.getSeq[Double](1).toSeq)
        .sortBy(_._1).toSeq
    }

    /** The codebook as a (cell, centroid) DataFrame — the scale face:
      * a distributed parquet scan for table-backed models, a local
      * relation of the driver Seq otherwise (same values either way).
      */
    def centroidsDf(spark: org.apache.spark.sql.SparkSession): DataFrame = {
      import spark.implicits._
      seqOpt match {
        case Some(seq) => seq.toDF("cell", "centroid")
        case None => spark.read.parquet(path.get)
          .select(col("cell"), col("centroid"))
      }
    }

    /** 128-bit content fingerprint, computed ONCE per instance (lazy) —
      * the super-model cache key: the old WeakHashMap keyed on Model
      * VALUE equality re-paid an O(k·dim) deep hash inside the map lock
      * on every lookup and evicted whenever the first-inserted instance
      * was GC'd (r15 ADVICE). Seq face: MD5 over (k, every id, every
      * centroid double) — collision-free in practice, amortized over the
      * instance's lifetime. Table face: MD5 over (path, k, the parquet
      * FILE LISTING — name/length/mtime per visible file). Path alone is
      * NOT an identity (r16 ADVICE): reclusters rewrite codebooks at
      * FIXED paths (IvfState's `bundle/model`, trainTableSized's
      * `.train_model/iterN`), so a second same-k generation at the same
      * path would collide in [[superModelCache]] and serve the previous
      * codebook's supers/radii/members to the new one's searches. Spark
      * part files carry fresh UUID names on every write, so the listing
      * pins the generation at O(#files) driver cost — still O(1) in k.
      */
    @transient lazy val fingerprint: (Long, Long) = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val buf = java.nio.ByteBuffer.allocate(8)
      def putLong(x: Long): Unit = {
        buf.clear(); buf.putLong(x); md.update(buf.array())
      }
      putLong(k.toLong)
      seqOpt match {
        case Some(seq) =>
          seq.foreach { case (id, c) =>
            putLong(id.toLong)
            c.foreach(x => putLong(java.lang.Double.doubleToLongBits(x)))
          }
        case None =>
          val utf8 = java.nio.charset.StandardCharsets.UTF_8
          md.update(path.get.getBytes(utf8))
          val hp = new org.apache.hadoop.fs.Path(path.get)
          val hfs = hp.getFileSystem(org.apache.spark.sql.SparkSession.active
            .sparkContext.hadoopConfiguration)
          hfs.listStatus(hp)
            .filter(st => st.isFile && {
              val n = st.getPath.getName
              !n.startsWith("_") && !n.startsWith(".")
            })
            .sortBy(_.getPath.getName)
            .foreach { st =>
              md.update(st.getPath.getName.getBytes(utf8))
              putLong(st.getLen)
              putLong(st.getModificationTime)
            }
      }
      val d = md.digest()
      val bb = java.nio.ByteBuffer.wrap(d)
      (bb.getLong, bb.getLong)
    }

    // k=10⁷ centroids would render a multi-GB default toString into logs.
    override def toString: String =
      s"IvfIndex.Model(k=$k, ${if (tableBacked) s"table=${path.get}" else "seq"})"
  }

  object Model {
    /** The seq face — source-compatible with the historical
      * `Model(centroids)` constructor.
      */
    def apply(centroids: Seq[(Int, Seq[Double])]): Model =
      new Model(Some(centroids), None, centroids.size)

    private[analytics] def seqAt(centroids: Seq[(Int, Seq[Double])],
                                 path: String): Model =
      new Model(Some(centroids), Some(path), centroids.size)

    /** The table face: the codebook stays in the parquet table at
      * `path`; the driver holds (path, k) only.
      */
    def table(spark: org.apache.spark.sql.SparkSession, path: String): Model = {
      val k = spark.read.parquet(path).count()
      require(k > 0 && k <= Int.MaxValue, s"Model.table: bad codebook row count $k at $path")
      new Model(None, Some(path), k.toInt)
    }

    /** Table face with a caller-known k (skips the count job; specs use
      * it to simulate extreme k on small fixtures).
      */
    private[analytics] def tableAt(path: String, k: Int): Model =
      new Model(None, Some(path), k)
  }

  /** k ceiling above which [[load]] returns the TABLE face instead of
    * collecting the codebook to a driver Seq. Default = the hierarchical
    * dispatch threshold: past it every assign path consumes the codebook
    * as data anyway, so the driver copy has no consumer. Override via
    * `-Dgraft.ivf.tableModelMinK`; specs/gated queries force a face
    * through [[tableModelMinKOverride]].
    */
  private[graft] def tableModelMinK: Int =
    tableModelMinKOverride.value.getOrElse(
      sys.props.get("graft.ivf.tableModelMinK").map(_.toInt)
        .getOrElse(1 << 20))

  private[graft] val tableModelMinKOverride =
    new scala.util.DynamicVariable[Option[Int]](None)

  /** Hard ceiling for materializing a table-backed codebook into driver
    * heap (k·dim·8 bytes — ~2 GB at the default with dim 64). Fixed, not
    * dispatch-coupled: forcing a spec's dispatch thresholds to 0 must not
    * also forbid a small fixture from materializing.
    */
  private[graft] val materializeMaxK: Int = 1 << 22

  private def sqDist(v: Column, c: Seq[Double]): Column = {
    // ||v - c||² = ||v||² - 2·v·c + ||c||² ; for argmin over c the ||v||²
    // term is constant → rank by (||c||² - 2·v·c), no per-pair norm.
    val dot = dotProduct(v, typedlit(c))
    lit(c.map(x => x * x).sum) - lit(2.0) * dot
  }

  /** Nearest-centroid ids for a vector column, cheapest-first — the
    * LITERAL assign path: one struct expression per centroid, sorted and
    * sliced per row. Cheapest plan at small k (single map stage, fully
    * whole-stage-codegen'd, zero shuffle) but the plan itself is O(k):
    * at k ≳ 10⁴ the expression tree breaks codegen and plan build time
    * dominates — which is why [[withNearestCells]] dispatches to
    * [[joinNearestCells]] above [[literalAssignMaxK]].
    */
  // Native single-node form of the k-struct literal tree it replaced
  // (r18): same distances, same (d, cell) order — bit-identical structs;
  // the legacy tree stays below as the spec's reference implementation.
  private def nearestCells(v: Column, model: Model, n: Int): Column =
    graft.functions.nearestCellsOf(v.cast("array<double>"), model.centroids, n)

  // Reference implementation for NearestCellsSpec (the pre-r18 literal
  // expression tree — O(k) plan nodes, k struct allocations per row).
  private[graft] def nearestCellsLegacy(v: Column, model: Model, n: Int): Column = {
    val scored = model.centroids.map { case (id, c) =>
      struct(sqDist(v, c).as("d"), lit(id).as("cell"))
    }
    slice(array_sort(array(scored: _*)), 1, n)
  }

  def assignCell(v: Column, model: Model): Column =
    nearestCells(v, model, 1).getItem(0).getField("cell")

  /** k ceiling for the literal assign path. Below it the k-struct-literal
    * expression tree is the cheapest plan (fully inlined, zero
    * exchanges); above it the tree defeats whole-stage codegen and
    * per-row eval goes super-linear while the join path stays flat —
    * the measured crossover on the 16k-row IvfAssignCheck harness sits
    * at k ≈ 64–128 (literal 27 s at k=1024, 127 s at k=4096 vs join
    * 0.9/1.9 s; BASELINE.md round-14 table), so the default hands
    * everything past the small-quantizer regime to the join. Overridable
    * via `-Dgraft.ivf.literalAssignMaxK=`; specs force a path
    * thread-locally through [[literalAssignMaxKOverride]].
    */
  private[graft] def literalAssignMaxK: Int =
    literalAssignMaxKOverride.value.getOrElse(
      sys.props.get("graft.ivf.literalAssignMaxK").map(_.toInt).getOrElse(128))

  private[graft] val literalAssignMaxKOverride =
    new scala.util.DynamicVariable[Option[Int]](None)

  /** Row ceiling for BROADCASTING the query-side frame into a search
    * join. ANN search joins the corpus against a query-derived frame
    * (|Q|·nprobe probe rows here; |Q|·nprobe LUT rows in [[IvfPq]]) and
    * a broadcast hint is right only while that frame is actually small:
    * a FAISS-style query batch (10s–10³ rows) broadcast in one block
    * beats shuffling the corpus side. But the hint is a command, not a
    * suggestion — at a nightly-inference batch (|Q| ~10⁵–10⁶ rows of
    * dim doubles, GBs) an unconditional `broadcast(q)` ships the whole
    * frame to every executor and OOMs the driver building the broadcast
    * relation. Above this row count the hint is dropped: the join keys
    * on `cell` either way, so Spark falls back to a shuffle join on the
    * cell key (both sides partition by cell — the scale-correct plan)
    * or AQE re-promotes to broadcast if runtime stats allow. Results are
    * join-strategy-invariant; IvfQueryScaleSpec pins equality and the
    * absence of a query-side BroadcastExchange above the threshold.
    * Override via `-Dgraft.ivf.queryBroadcastMaxRows`; specs force a
    * path through [[queryBroadcastMaxRowsOverride]].
    */
  private[graft] def queryBroadcastMaxRows: Long =
    queryBroadcastMaxRowsOverride.value.getOrElse(
      sys.props.get("graft.ivf.queryBroadcastMaxRows").map(_.toLong)
        .getOrElse(1L << 16))

  private[graft] val queryBroadcastMaxRowsOverride =
    new scala.util.DynamicVariable[Option[Long]](None)

  /** Apply the query-side broadcast policy: hint only below the
    * [[queryBroadcastMaxRows]] ceiling (`qRows` = the row count of the
    * frame that would be broadcast, probe/LUT expansion included).
    */
  private[graft] def hintQuerySide(df: DataFrame, qRows: Long): DataFrame =
    if (qRows <= queryBroadcastMaxRows) broadcast(df) else df

  /** Bounded sizing: `Some(n)` (the EXACT row count) if the frame has ≤
    * `cap` rows, `None` if it exceeds the cap. One parallel `count()`
    * job — deliberately NOT `limit(cap+1).count`: CollectLimit executes
    * INCREMENTALLY (1 partition, then scaleUpFactor× more, ...), so on a
    * frame smaller than the cap — every gated shape — the limit probe is
    * several sequential mini-jobs where the count is one parallel one
    * (measured as q28/q47/q117 floor upticks when this helper briefly
    * shipped limit-based).
    */
  private[graft] def boundedCount(df: DataFrame, cap: Long): Option[Long] = {
    val n = df.count()
    if (n <= math.max(cap, 0L)) Some(n) else None
  }

  /** Bounded collect: the rows themselves if the frame has ≤ `cap` rows,
    * `None` past the cap. Fuses the r15 "count, then collect" driver-arm
    * prologue into ONE parallel job when the optimizer's size estimate
    * says a straight collect is safe (≤ [[collectProbeMaxBytes]] —
    * estimates for file sources are pre-filter, so this errs large);
    * past the estimate it counts first (one job — the cost every search
    * paid in r15) and collects only under the cap, so nothing
    * corpus-sized ever lands in driver heap on a mis-estimate. NOT
    * limit-based — the [[boundedCount]] incremental-execution trap.
    */
  private[graft] def boundedCollect(df: DataFrame,
      cap: Long): Option[Array[org.apache.spark.sql.Row]] = {
    val capL = math.max(cap, 0L)
    val est = df.queryExecution.optimizedPlan.stats.sizeInBytes
    if (est <= collectProbeMaxBytes) {
      val rows = df.collect()
      if (rows.length <= capL) Some(rows) else None
    } else if (df.count() <= capL) Some(df.collect())
    else None
  }

  /** Size-estimate ceiling for [[boundedCollect]]'s single-job fast path
    * (the TRANSIENT driver allocation a mis-capped probe may briefly
    * hold). Override via `-Dgraft.ivf.collectProbeMaxBytes`.
    */
  private[graft] def collectProbeMaxBytes: Long =
    sys.props.get("graft.ivf.collectProbeMaxBytes").map(_.toLong)
      .getOrElse(1L << 28)

  /** DataFrame-level nearest-cells: attaches `outCol` = the n cheapest
    * cells as a sorted `array<struct<d:double, cell:int>>` (the literal
    * path's exact shape — IvfJoinAssignSpec pins the two paths equal,
    * doubles included). Every assignment in this object and its callers
    * (index build, Lloyd training, probe selection, [[graft.warehouse
    * .IvfState]]) routes through here, so the k-dispatch is global.
    */
  private[graft] def withNearestCells(df: DataFrame, vecCol: String, model: Model,
                                      n: Int, outCol: String): DataFrame =
    if (model.k <= literalAssignMaxK)
      df.withColumn(outCol, nearestCells(col(vecCol), model, n))
    else if (model.k > hierarchicalAssignMinK) {
      if (n == 1) hierarchicalNearestCell(df, vecCol, model, outCol)
      else hierarchicalNearestCellsN(df, vecCol, model, n, outCol)
    } else joinNearestCells(df, vecCol, model, n, outCol)

  /** JOIN assign path — the extreme-scale form (k beyond what a literal
    * expression tree tolerates, i.e. coarse quantizers sized k ~ √n for
    * n ≳ 10⁸ vectors):
    *
    *  1. The codebook becomes a broadcast (cell, centroid, ‖c‖²) table —
    *     DATA, not expressions, so the plan stays O(1) in k and the
    *     executors receive one broadcast block instead of a k-node tree.
    *  2. A broadcast nested-loop join scores every (row, centroid) pair
    *     map-side with the same `‖c‖² − 2·v·c` ranking as the literal
    *     path (same operand order → bitwise-equal doubles).
    *  3. An argmin aggregation keyed by a per-row id collapses the ×k
    *     pair stream back to one row per input row IN THE MAP TASK —
    *     partial aggregation sees all k pairs of a row locally (the
    *     broadcast join emits them contiguously), so no exchange ever
    *     carries the pair stream: the agg exchange moves one ~20-byte
    *     row per input row, and the original columns are joined back by
    *     row key afterwards rather than riding the ×k stream (n=1 uses
    *     codegen'd min/min_by over primitive buffers; n>1 the bounded-
    *     heap top-n udaf). IvfJoinAssignSpec pins the plan shape.
    *
    * Tie-break parity: TopK's total order is (−score asc, key asc) =
    * (d asc, cell asc) — exactly `array_sort`'s lexicographic struct
    * order on (d, cell), so equal-distance centroids resolve to the same
    * cell on both paths. Score negation round-trips exactly (IEEE
    * `-(-x) == x`), so the emitted `d` doubles are bit-identical too.
    *
    * Broadcast bound: k·dim·8 bytes — ~100 MB at k=10⁵, dim=128, fine to
    * broadcast; past [[hierarchicalAssignMinK]] (codebook approaching
    * executor memory) the n = 1 corpus-assign shape dispatches to
    * [[hierarchicalNearestCell]], which broadcasts only the √k-row
    * super-codebook.
    */
  private[graft] def joinNearestCells(df: DataFrame, vecCol: String, model: Model,
                                      n: Int, outCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    // DESCENDING cell order: Spark 4.1's min_by keeps the LAST minimal
    // row in update order, and the broadcast relation iterates in this
    // frame's row order — so a descending build side makes equal-d ties
    // land on the SMALLEST cell, matching the literal path's (d, cell)
    // struct sort. The tie fixture in IvfJoinAssignSpec fails loudly if
    // a Spark upgrade ever flips min_by's tie side.
    val cents = model.centroids.sortBy(-_._1)
      .map { case (id, c) => (id, c, c.map(x => x * x).sum) }
      .toDF("__cell", "__centroid", "__cnorm")
    val rowKey = "__assign_row"
    val origCols = df.columns.toSeq
    val keyed = keyedStable(df, rowKey)
    val d = col("__cnorm") - lit(2.0) * dotProduct(col(vecCol), col("__centroid"))
    // The pair stream carries ONLY (rowKey, vec-projection inputs) into
    // the aggregate — original columns do NOT ride the ×k stream and are
    // joined back by rowKey afterwards. This is what keeps the hot loop
    // whole-stage-codegen'd: any carry aggregate (first(struct(...)))
    // has a non-primitive buffer, which silently demotes the whole
    // aggregate to SortAggregate over the n·k pair stream — measured 6×
    // slower at k=4096. With an 8-byte group key and primitive (double,
    // int) buffers the n=1 branch is a generated HashAggregate whose
    // exchange carries one 20-byte row per input row; the join-back is
    // an n-row equi-join (AQE broadcasts the small aggregated side when
    // it fits).
    val pairs = keyed
      .select(col(rowKey), col(vecCol))
      .crossJoin(broadcast(cents))
    // n = 1 is the CORPUS-scale case (index build, Lloyd assignment):
    // min/min_by over primitive buffers. Tie-break: min_by keeps the
    // LAST minimal row in update order and cents is descending, so
    // equal-d ties land on the smallest cell — the literal path's
    // (d, cell) struct-sort order; IvfJoinAssignSpec's identical-
    // centroids fixture fails loudly if a Spark upgrade flips min_by's
    // tie side. n > 1 is the QUERY-side nprobe shape — bounded-heap
    // top-n udaf (ObjectHashAggregate), fine at query cardinalities.
    val best =
      if (n == 1)
        pairs.groupBy(col(rowKey)).agg(
            min(d).as("__d"), min_by(col("__cell"), d).as("__cell"))
          .select(col(rowKey),
            array(struct(col("__d").as("d"), col("__cell").as("cell"))).as(outCol))
      else
        pairs.groupBy(col(rowKey)).agg(
            graft.functions.TopK.topK(n)(-d, col("__cell").cast("long"), lit(0L))
              .as("__top"))
          .select(col(rowKey), transform(col("__top"), e => struct(
            (-e.getField("score")).as("d"),
            e.getField("key").cast("int").as("cell"))).as(outCol))
    keyed.join(best, Seq(rowKey))
      .select(origCols.map(col) :+ col(outCol): _*)
  }

  /** k ceiling for the FLAT join assign's codebook broadcast. The join
    * path ships the whole (cell, centroid) table to every executor —
    * k·dim·8 bytes, ~100 MB at k = 10⁵/dim = 128 and ~1 GB at 10⁶: past
    * that the broadcast relation itself is the asymptote (the
    * BASELINE.md "k ≳ 10⁷ needs a hierarchical coarse quantizer" note).
    * Above this k, [[withNearestCells]] dispatches to the two-level
    * forms — [[hierarchicalNearestCell]] for the corpus-scale n = 1
    * shape (index build, Lloyd), [[hierarchicalNearestCellsN]] for the
    * query-side n > 1 probe — which broadcast only the √k-row
    * super-codebook and ship the member centroids as a shuffled DATA
    * join. Override via `-Dgraft.ivf.hierarchicalAssignMinK`; specs
    * force the path through [[hierarchicalAssignMinKOverride]].
    */
  private[graft] def hierarchicalAssignMinK: Int =
    hierarchicalAssignMinKOverride.value.getOrElse(
      sys.props.get("graft.ivf.hierarchicalAssignMinK").map(_.toInt)
        .getOrElse(1 << 20))

  private[graft] val hierarchicalAssignMinKOverride =
    new scala.util.DynamicVariable[Option[Int]](None)

  /** A trained two-level coarse quantizer: `supers` = (sid,
    * super-centroid, radius) for every NON-EMPTY super-cell, where
    * radius(s) = max over member centroids c of the TRUE distance
    * ‖c − s‖ (the triangle-inequality ball bound — an empty super has
    * no witness member, so it must not appear in the pruning minimum at
    * all); `members` = the cell→super assignment WITH the member
    * centroids, (__sid, __cell, __centroid, __cnorm), held as a
    * localCheckpoint-pinned DataFrame — k rows in EXECUTOR storage, not
    * driver heap (the r15 `memberSid: Map` was the last O(k) driver
    * collect in the family), shared by every hierarchical assign on the
    * model instead of re-shipping a k-row local relation per call.
    */
  private[graft] final case class SuperModel(
      supers: Seq[(Int, Seq[Double], Double)], members: DataFrame)

  // Keyed by (applicationId, model fingerprint): the fingerprint is
  // computed once per Model instance (not per lookup — the old
  // WeakHashMap deep-hashed the whole codebook inside the map lock on
  // EVERY get), the applicationId scopes the cached members checkpoint
  // to the SparkContext that owns its blocks, and soft values let
  // eviction track memory pressure instead of the identity of the first
  // loader (r15 ADVICE + verdict item 4).
  private[graft] val superModelCache =
    new java.util.concurrent.ConcurrentHashMap[
      (String, (Long, Long)), java.lang.ref.SoftReference[SuperModel]]()

  private def superDirFor(path: String): String = s"$path/_super"

  private[graft] def superModelFor(spark: org.apache.spark.sql.SparkSession,
                                   model: Model): SuperModel = {
    val key = (spark.sparkContext.applicationId, model.fingerprint)
    val ref = superModelCache.get(key)
    val cached = if (ref != null) ref.get() else null
    if (cached != null) cached
    else {
      def persisted(p: String): Boolean = {
        val hp = new org.apache.hadoop.fs.Path(s"${superDirFor(p)}/members")
        hp.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(hp)
      }
      val sm = model.path
        .filter(persisted)
        .map(p => loadSuperModel(spark, model, superDirFor(p)))
        .getOrElse {
          val built = buildSuperModel(spark, model)
          // Write-through beside a persisted codebook (√k + k·(2 ints)
          // rows — tiny next to the table), so the NEXT process skips
          // the O(k·√k·dim) super-Lloyd entirely (verdict item 4:
          // restart cost at extreme k).
          model.path.foreach { p =>
            try persistSuperModel(spark, built, superDirFor(p))
            catch { case e: Exception =>
              log.warn(s"super-model write-through failed under $p: ${e.getMessage}")
            }
          }
          built
        }
      superModelCache.put(key, new java.lang.ref.SoftReference(sm))
      sm
    }
  }

  /** Persist (supers, cell→sid membership) under `dir` — `_super`-named
    * so parquet readers of the enclosing codebook dir ignore it (the
    * `_`-prefix hidden-path convention). Centroids are NOT duplicated:
    * members reload as a membership∞codebook join, keeping the persisted
    * super O(k) ints instead of a second copy of the k·dim table.
    */
  private def persistSuperModel(spark: org.apache.spark.sql.SparkSession,
                                sm: SuperModel, dir: String): Unit = {
    import spark.implicits._
    sm.supers.toDF("sid", "scent", "r")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/supers")
    // Members keep their source partitioning (r16 verdict item 7): at
    // k=10⁷ a coalesce(1) funnels the k-row membership through ONE task;
    // the supers stay one file (√k rows, genuinely tiny).
    sm.members.select(col("__cell").as("cell"), col("__sid").as("sid"))
      .write.mode("overwrite").parquet(s"$dir/members")
  }

  /** Reload a persisted super-model: supers collect √k rows; members
    * rebuild as membership JOIN codebook (both distributed scans — the
    * k-row stream never touches the driver), checkpointed once for the
    * process. Loaded ≡ rebuilt is pinned by TableModelSpec — exactness
    * does not depend on super GEOMETRY (any cell→super partition with
    * valid radii is exact), but the loaded radii must pair with the
    * loaded assignment, which the atomic `_super` dir guarantees.
    */
  private def loadSuperModel(spark: org.apache.spark.sql.SparkSession,
                             model: Model, dir: String): SuperModel = {
    val supers = spark.read.parquet(s"$dir/supers").collect()
      .map(r => (r.getInt(0), r.getSeq[Double](1).toSeq, r.getDouble(2)))
      .sortBy(_._1).toSeq
    val members = spark.read.parquet(s"$dir/members")
      .select(col("sid").as("__sid"), col("cell").as("__cell"))
      .join(model.centroidsDf(spark).withColumnRenamed("cell", "__cell"),
        Seq("__cell"))
      .select(col("__sid"), col("__cell"),
        col("centroid").as("__centroid"),
        dotProduct(col("centroid"), col("centroid")).as("__cnorm"))
      .localCheckpoint(eager = true)
    SuperModel(supers, members)
  }

  /** Cluster the CODEBOOK into ⌈√k⌉ super-cells — a distributed Lloyd
    * over the k centroids (the same machinery, one level up; the inner
    * assigns are pinned to the flat join path, so building the
    * hierarchy can never recurse into itself). Build cost is
    * O(k·√k·dim) distributed FLOPs — the same order as one indexing
    * pass over a k-cell corpus, paid once per model, memoized, and
    * persisted beside a disk-backed codebook. Driver state: the √k-row
    * super list and √k radii — the k-row member stream stays in
    * executor checkpoint storage for BOTH codebook faces.
    */
  private def buildSuperModel(spark: org.apache.spark.sql.SparkSession,
                              model: Model): SuperModel =
    hierarchicalAssignMinKOverride.withValue(Some(Int.MaxValue)) {
      import spark.implicits._
      val k = model.k
      val s = math.max(1, math.ceil(math.sqrt(k.toDouble)).toInt)
      val centDf = model.centroidsDf(spark)
        .select(col("cell").as("member_cell"), col("centroid"))
      val superModel = trainSized(centDf, _ => s, iters = 2,
        "member_cell", "centroid")
      val assigned = index(centDf, superModel, "centroid")
        .select(col("cell").as("__sid"), col("member_cell").as("__cell"),
          col("centroid").as("__centroid"),
          dotProduct(col("centroid"), col("centroid")).as("__cnorm"))
        .localCheckpoint(eager = true) // one assign pass serves radii + members
      val superCents = superModel.centroids.toDF("__sid", "__scent")
      val radii = assigned.join(broadcast(superCents), Seq("__sid"))
        .select(col("__sid"), sqrt(greatest(lit(0.0),
          col("__cnorm")
            - lit(2.0) * dotProduct(col("__centroid"), col("__scent"))
            + dotProduct(col("__scent"), col("__scent")))).as("r"))
        .groupBy("__sid").agg(max(col("r")).as("r"))
        .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
      // Only supers that HAVE members participate (radii keys) — the
      // exactness proof needs a witness member inside every ball that
      // enters the pruning minimum.
      SuperModel(
        superModel.centroids.collect {
          case (sid, c) if radii.contains(sid) => (sid, c, radii(sid))
        },
        assigned)
    }

  /** Two-level EXACT nearest-cell assign — the extreme-k form past the
    * flat join path's codebook-broadcast ceiling ([[hierarchicalAssignMinK]]).
    * Executors never see the k-cell codebook; they see the ⌈√k⌉-row
    * super-codebook (broadcast) and the member centroids as a DATA
    * table joined by super id (shuffle join — O(k) rows through the
    * exchange once, not per input row).
    *
    * Exactness (the q47 ball-probe argument, one level up): with
    * B(v) = min over supers s of (‖v − s‖ + r(s)), every super has a
    * member within ‖v − s‖ + r(s) of v, so the true nearest centroid
    * satisfies ‖v − c*‖ ≤ B(v); and every member of a pruned super
    * (‖v − s‖ − r(s) > B(v)) is strictly farther than B(v) ≥ ‖v − c*‖ —
    * pruned supers can hold neither the argmin nor any tie of it, so
    * scanning the kept supers' members is exhaustive. Distances in the
    * pruning are TRUE distances (the √ form with ‖v‖²); the final
    * ranking over kept members uses the same ‖c‖² − 2⟨v,c⟩ surrogate
    * and the same (d, cell) total order as the other two paths — via
    * two order-insensitive codegen'd min passes (min distance, then
    * min cell among the distance ties; the post-shuffle member stream
    * has no controllable row order for the flat path's min_by trick) —
    * so all three assign paths emit bit-identical rows
    * (HierarchicalAssignSpec).
    *
    * Plan shape: three map-side-collapsed aggregations (pruning bound,
    * min distance, tie-resolving min cell — no exchange ever carries
    * the ×√k super stream; the ×members stream is either generated
    * post-broadcast or co-partitioned by super id, and always dies in a
    * partial aggregation) plus row-keyed equi-joins of row-sized
    * frames. The r15 "driver still holds the codebook" asymptote is
    * closed by the TABLE face of [[Model]]: members come from the
    * super-model's checkpointed frame (executor storage), and with a
    * [[Model.table]] codebook the driver holds (path, k) — the q264
    * oracle face and TableModelSpec pin it. Driver state here is the
    * √k-row super list either way.
    */
  private[graft] def hierarchicalNearestCell(df: DataFrame, vecCol: String,
      model: Model, outCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val sm = superModelFor(spark, model)
    val supersDf = broadcast(
      sm.supers.map { case (sid, c, r) => (sid, c, r, c.map(x => x * x).sum) }
        .toDF("__sid", "__scent", "__r", "__snorm"))
    val members = sm.members
    val rowKey = "__hier_row"
    val origCols = df.columns.toSeq
    val keyed = keyedStable(df, rowKey)
    val v = col(vecCol)
    // ‖v‖² once per ROW (it rode the ×√k pair stream in the r15 form —
    // √k redundant dim-length dots per row), reused by ds and the slack.
    def withVn2(base: DataFrame): DataFrame =
      base.withColumn("__vn2", dotProduct(v, v))
    val ds = sqrt(greatest(lit(0.0),
      col("__vn2") - lit(2.0) * dotProduct(v, col("__scent"))
        + col("__snorm")))
    // Stage 1: pruning bound B — the ×√k super stream collapses in
    // map-side partial aggregation (one ~16-byte row per input row
    // through the exchange).
    val bounds = withVn2(keyed.select(col(rowKey), v))
      .crossJoin(supersDf)
      .groupBy(col(rowKey)).agg(min(ds + col("__r")).as("__B"))
    // Stage 2: rows rejoin their bound 1:1, then re-score the supers
    // map-side and keep those whose ball can still beat B. The slack
    // term absorbs float rounding in the ball arithmetic: the proof is
    // a real-number theorem, and a boundary-exact super (its lower
    // bound EQUALS B in reals) must never be dropped by a rounding
    // flip — widening the kept set only adds candidates, never
    // wrongness. MAGNITUDE-SCALED (r15 ADVICE): ds and the radii come
    // from the cancellation-prone ‖v‖²−2⟨v,s⟩+‖s‖² form under sqrt,
    // whose worst-case error is ~√(dim·ε)·(‖v‖+‖s‖) ≈ 2e-7·(‖v‖+‖s‖)
    // at dim 128 (err(ds) ≤ √err(ds²) as ds→0, err(ds²) ≲
    // dim·ε·(‖v‖+‖s‖)²) — a fixed 1e-9·(1+|B|) slack is too narrow for
    // large-magnitude unnormalized vectors. 1e-6·(1+‖v‖+‖s‖+r+|B|)
    // dominates that bound at every operand scale while staying far
    // below real inter-cell distances.
    def slack = lit(1e-6) * (lit(1.0) + abs(col("__B")) + col("__r") +
      sqrt(col("__vn2")) + sqrt(col("__snorm")))
    val cand = withVn2(keyed.select(col(rowKey), v)).join(bounds, Seq(rowKey))
      .crossJoin(supersDf)
      .filter(ds - col("__r") <= col("__B") + slack)
      .select(col(rowKey), v.as("__v"), col("__sid"))
    // Stage 3: candidates meet their supers' members (k-row DATA side,
    // sid equi-join) and collapse to the per-row MINIMUM distance — a
    // codegen'd primitive-buffer HashAggregate. (A bounded-heap TopK
    // udaf here measured ~200× slower at like candidate volumes:
    // interpreted per-row heap updates on the ×members stream vs
    // generated min updates — the same demotion trap the flat join path
    // documents for carry aggregates.)
    val d = col("__cnorm") - lit(2.0) * dotProduct(col("__v"), col("__centroid"))
    val dmin = cand.join(members, Seq("__sid"))
      .groupBy(col(rowKey)).agg(min(d).as("__dmin"))
    // Stage 4: ties (equal minimal d) must resolve to the SMALLEST cell
    // — the literal path's (d, cell) struct order — and the post-shuffle
    // member stream has no controllable row order for the flat path's
    // min_by trick, so take a SECOND codegen'd pass: re-derive the
    // candidate×member stream map-side (deterministic kernels — the
    // recompute emits bit-identical doubles), keep rows equal to the
    // minimum, take min(cell). __dmin rides the row-keyed frames (the
    // bound join's shape), never the member stream.
    val best = withVn2(keyed.select(col(rowKey), v))
      .join(bounds, Seq(rowKey)).join(dmin, Seq(rowKey))
      .crossJoin(supersDf)
      .filter(ds - col("__r") <= col("__B") + slack)
      .select(col(rowKey), v.as("__v"), col("__sid"), col("__dmin"))
      .join(members, Seq("__sid"))
      .filter(d === col("__dmin"))
      .groupBy(col(rowKey))
      .agg(min(col("__cell")).as("__cell"), min(col("__dmin")).as("__d"))
      .select(col(rowKey),
        array(struct(col("__d").as("d"), col("__cell").as("cell"))).as(outCol))
    keyed.join(best, Seq(rowKey))
      .select(origCols.map(col) :+ col(outCol): _*)
  }

  /** The n > 1 hierarchical form — the QUERY-side nprobe shape past the
    * codebook-broadcast ceiling (an inference batch probing a k ≥ 10⁶
    * quantizer), so the LAST extreme-k caller no longer ships the
    * codebook to executors. Same two-level structure as
    * [[hierarchicalNearestCell]] with two generalizations, both exact:
    *
    *  - Pruning bound: Bₙ(v) = the n-th smallest (‖v − s‖ + r(s)) over
    *    the supers. The n nearest-by-(d+r) supers each contain a
    *    witness member within their (d+r), giving n distinct candidates
    *    ≤ Bₙ — so the true n-th nearest distance is ≤ Bₙ, and a super
    *    with ‖v − s‖ − r(s) > Bₙ can contribute nothing to the top n
    *    (nor any tie of its boundary). Looser than a member-count-aware
    *    prefix bound but sound, and one bounded-heap aggregate.
    *  - Ranking: bounded-heap top-n over the kept members with the
    *    (d, cell) total order — the interpreted heap aggregate is FINE
    *    here because this is the query shape (|Q| ≪ corpus rows; the
    *    corpus-scale n = 1 form uses the codegen'd two-pass min
    *    precisely because its stream is corpus-sized).
    *
    * Emits the literal path's exact output shape (sorted
    * array<struct<d, cell>>, slice-n semantics: distance ties beyond
    * position n drop on both paths by the same (d, cell) order) —
    * HierarchicalAssignSpec pins n = 4 bit-equality and the full-search
    * face.
    */
  private[graft] def hierarchicalNearestCellsN(df: DataFrame, vecCol: String,
      model: Model, n: Int, outCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val sm = superModelFor(spark, model)
    val supersDf = broadcast(
      sm.supers.map { case (sid, c, r) => (sid, c, r, c.map(x => x * x).sum) }
        .toDF("__sid", "__scent", "__r", "__snorm"))
    val members = sm.members
    val rowKey = "__hiern_row"
    val origCols = df.columns.toSeq
    val keyed = keyedStable(df, rowKey)
    val v = col(vecCol)
    def withVn2(base: DataFrame): DataFrame =
      base.withColumn("__vn2", dotProduct(v, v))
    val ds = sqrt(greatest(lit(0.0),
      col("__vn2") - lit(2.0) * dotProduct(v, col("__scent"))
        + col("__snorm")))
    // Bₙ = n-th smallest (d + r): bounded-heap top-n over the ×√k super
    // stream (map-side collapse; one row per input row through the
    // exchange), Bₙ = the heap's worst member.
    val bounds = withVn2(keyed.select(col(rowKey), v))
      .crossJoin(supersDf)
      .groupBy(col(rowKey))
      .agg(graft.functions.TopK.topK(n)(
        -(ds + col("__r")), col("__sid").cast("long"), lit(0L)).as("__near"))
      .select(col(rowKey),
        (-element_at(col("__near"), size(col("__near"))).getField("score"))
          .as("__B"))
    // Magnitude-scaled rounding slack — the [[hierarchicalNearestCell]]
    // derivation.
    def slack = lit(1e-6) * (lit(1.0) + abs(col("__B")) + col("__r") +
      sqrt(col("__vn2")) + sqrt(col("__snorm")))
    val cand = withVn2(keyed.select(col(rowKey), v)).join(bounds, Seq(rowKey))
      .crossJoin(supersDf)
      .filter(ds - col("__r") <= col("__B") + slack)
      .select(col(rowKey), v.as("__v"), col("__sid"))
    val d = col("__cnorm") - lit(2.0) * dotProduct(col("__v"), col("__centroid"))
    val best = cand.join(members, Seq("__sid"))
      .groupBy(col(rowKey))
      .agg(graft.functions.TopK.topK(n)(-d, col("__cell").cast("long"), lit(0L))
        .as("__top"))
      .select(col(rowKey), transform(col("__top"), e => struct(
        (-e.getField("score")).as("d"),
        e.getField("key").cast("int").as("cell"))).as(outCol))
    keyed.join(best, Seq(rowKey))
      .select(origCols.map(col) :+ col(outCol): _*)
  }

  /** Attach a stable per-row key for plans whose row key appears in TWO
    * subtrees (an argmin aggregation and its join-back), each evaluated
    * independently — monotonically_increasing_id is (partition,
    * position)-derived, so the two evaluations agree ONLY if the input
    * yields rows in the same per-partition order both times. Scans do; a
    * SHUFFLE upstream does not (reduce-side row order is network-arrival
    * order), and a mismatch would silently pair rows with the wrong
    * cells. When the plan contains a shuffle-inducing or
    * non-deterministic node, pin the keyed frame with a lazy
    * localCheckpoint: both subtrees then read the same materialized
    * blocks. Scan-only inputs (every in-repo caller: cached Lloyd
    * projections, parquet scans, bundle ∪ tail unions) skip the
    * materialization.
    */
  private def keyedStable(df: DataFrame, rowKey: String): DataFrame = {
    val plan = df.queryExecution.optimizedPlan
    val orderUnstable = plan.collectFirst {
      case p: org.apache.spark.sql.catalyst.plans.logical.Join => p
      case p: org.apache.spark.sql.catalyst.plans.logical.Aggregate => p
      case p: org.apache.spark.sql.catalyst.plans.logical.Window => p
      case p: org.apache.spark.sql.catalyst.plans.logical.RepartitionOperation => p
      case p: org.apache.spark.sql.catalyst.plans.logical.Sort => p
      case p: org.apache.spark.sql.catalyst.plans.logical.Sample => p
      case p if p.expressions.exists(!_.deterministic) => p
    }.isDefined
    val keyed0 = df.withColumn(rowKey, monotonically_increasing_id())
    if (orderUnstable) keyed0.localCheckpoint(eager = false) else keyed0
  }

  /** The cell count the IVF sizing rule prescribes for an n-row corpus:
    * ~√n (balances the k-centroid argmax per probe against the n/k rows
    * scanned per probed cell — the standard IVF heuristic).
    */
  def recommendedCellCount(nRows: Long): Int =
    math.max(1, math.ceil(math.sqrt(nRows.toDouble)).toInt)

  private lazy val log = org.slf4j.LoggerFactory.getLogger(getClass)

  /** Lloyd training. `k` small (centroid set is broadcast); `iters` 2-3
    * suffice for a coarse quantizer.
    *
    * k ∝ n contract: an index trained with k an order of magnitude under
    * [[recommendedCellCount]] has cells ~n/k rows deep — probes scan
    * 10×+ the sized-right volume, and the SemDeDup caller's pair work
    * goes quadratic. The count is free here (the projection is cached
    * for the training passes anyway), so the guard warns loudly instead
    * of trusting the caller.
    */
  def train(corpus: DataFrame, k: Int, iters: Int = 3,
            idCol: String = "vec_id", vecCol: String = "embedding",
            knownCount: Option[Long] = None): Model =
    trainSized(corpus, (n: Long) => {
      val rec = recommendedCellCount(n)
      if (k.toLong * 10L < rec)
        log.warn(s"IvfIndex.train: k=$k is >10x below the recommended cell " +
          s"count $rec for n=$n rows — cells will average ${n / math.max(k, 1)} " +
          "rows and probes scan that many per cell (sizing rule: k ~ sqrt(n)).")
      k
    }, iters, idCol, vecCol, knownCount)

  /** Cell-law training: k = ⌈n/targetCellSize⌉, derived from the CACHED
    * projection's count — the pass is reused by the Lloyd iterations, so
    * the k ∝ n contract costs no extra scan (the SemDeDup entry point).
    */
  def trainCellLaw(corpus: DataFrame, targetCellSize: Long, iters: Int = 3,
                   idCol: String = "vec_id", vecCol: String = "embedding",
                   knownCount: Option[Long] = None): Model =
    trainSized(corpus,
      (n: Long) => math.max(1L, (n + targetCellSize - 1) / targetCellSize).toInt,
      iters, idCol, vecCol, knownCount)

  /** Shared Lloyd body: `pickK` sees the cached projection's row count
    * and returns the cell count (deriving it, or warning on a pinned k).
    * `knownCount` skips the sizing job when the caller already holds the
    * exact row count (the state reclusters size their fold from parquet
    * footers); the dimension comes from the init collect's first row
    * instead of a separate head() probe — two fewer jobs per train with
    * identical arithmetic.
    */
  private[analytics] def trainSized(corpus: DataFrame, pickK: Long => Int, iters: Int,
                         idCol: String, vecCol: String,
                         knownCount: Option[Long] = None): Model = {
    // Training makes iters+1 passes over the vectors — cache the projection.
    val vecs = corpus.select(col(idCol), col(vecCol)).cache()
    try {
      val n = knownCount.getOrElse(vecs.count())
      val k = pickK(n)
      val init = vecs.orderBy(col(idCol)).limit(k)
        .select(col(vecCol)).collect()
      require(init.nonEmpty,
        s"IvfIndex.train: empty corpus — nothing to cluster ($idCol/$vecCol)")
      val dim = init.head.getSeq[Number](0).length
      var model = Model(
        init.zipWithIndex
          .map { case (r, i) =>
            // element type may be float OR double — both flow through the kernels
            i -> r.getSeq[Number](0).map(_.doubleValue()).toSeq
          }.toSeq)

      (0 until iters).foreach { _ =>
        // Routed through the k-dispatched assign (literal below
        // literalAssignMaxK, broadcast join above), so Lloyd training
        // itself survives extreme k — the assignment was the only O(k)
        // plan element; the mean update below is already a distributed
        // (cell, dim) hash-agg whose collect is codebook-sized (k·dim),
        // the same driver footprint as the Model value itself.
        val assigned = index(vecs.select(col(vecCol)), model, vecCol)
      val means = assigned
        .select(col("cell"), posexplode(col(vecCol)).as(Seq("pos", "x")))
        .groupBy("cell", "pos")
        .agg(avg(col("x").cast("double")).as("m"))
        .collect()
        .groupBy(_.getInt(0))
        .map { case (cell, rows) =>
          val vec = new Array[Double](dim)
          rows.foreach(r => vec(r.getInt(1)) = r.getDouble(2))
          cell -> vec.toSeq
        }
        // Empty cells keep their previous centroid.
        model = Model(model.centroids.map { case (id, c) => id -> means.getOrElse(id, c) })
      }
      model
    } finally vecs.unpersist()
  }

  /** [[train]]'s TABLE-route sibling — Lloyd whose codebook NEVER
    * materializes on the driver, completing the extreme-k lifecycle the
    * table face of [[Model]] opened for load/assign/search: each
    * iteration's centroids are WRITTEN as a parquet codebook and re-enter
    * the next assignment as [[Model.table]]'s distributed scan (the
    * k-dispatched [[withNearestCells]], so the assign is the join or
    * hierarchical form as k demands). Per iteration the driver sees
    * nothing codebook-proportional: the mean update is the SAME
    * (cell, pos) hash-agg as [[trainSized]] but its result flows to
    * parquet through a cell-grain re-assembly instead of a collect.
    *
    * Init = the k smallest-id vectors, cell-indexed by id rank — one
    * GlobalLimit task bounded by k·dim bytes (EXECUTOR memory, the same
    * ceiling class as a codebook broadcast; the corpus never funnels).
    * Empty cells carry the previous centroid via a left join with the
    * prior iteration's table (the `getOrElse` of the seq route, as a
    * plan). The final codebook installs into `path` through [[save]]'s
    * two-rename swap; the returned model is [[load]]'s face dispatch.
    * TableTrainSpec pins table-trained ≡ seq-trained BIT-equal when the
    * assign SHAPES match (the default dispatch); under a cross-shape
    * forcing (hierarchical over a parquet member frame vs literal over
    * a local relation) the distributed mean's partial merges re-order
    * and centroids wobble in the last ulp — the documented Lloyd-wobble
    * doctrine ([[PqIndex]]) — so that face pins approximate centroids
    * plus EXACT search.
    */
  def trainTable(corpus: DataFrame, k: Int, path: String, iters: Int = 3,
                 idCol: String = "vec_id", vecCol: String = "embedding",
                 knownCount: Option[Long] = None): Model =
    trainTableSized(corpus, (n: Long) => {
      val rec = recommendedCellCount(n)
      if (k.toLong * 10L < rec)
        log.warn(s"IvfIndex.trainTable: k=$k is >10x below the recommended " +
          s"cell count $rec for n=$n rows (sizing rule: k ~ sqrt(n)).")
      k
    }, path, iters, idCol, vecCol, knownCount)

  /** Cell-law table training: k = ⌈n/targetCellSize⌉ — [[trainCellLaw]]
    * on the table route.
    */
  def trainTableCellLaw(corpus: DataFrame, targetCellSize: Long, path: String,
                        iters: Int = 3, idCol: String = "vec_id",
                        vecCol: String = "embedding",
                        knownCount: Option[Long] = None): Model =
    trainTableSized(corpus,
      (n: Long) => math.max(1L, (n + targetCellSize - 1) / targetCellSize).toInt,
      path, iters, idCol, vecCol, knownCount)

  private def trainTableSized(corpus: DataFrame, pickK: Long => Int,
      path: String, iters: Int, idCol: String, vecCol: String,
      knownCount: Option[Long] = None): Model = {
    val spark = corpus.sparkSession
    val vecs = corpus.select(col(idCol), col(vecCol)).cache()
    try {
      val n = knownCount.getOrElse(vecs.count())
      val k = pickK(n)
      val kEff = math.min(k.toLong, n).toInt // k > n: every row a centroid
      val p = new org.apache.hadoop.fs.Path(path)
      val hfs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      // Hidden PARENT, plain leaf (the .staging_bundle/index convention):
      // a dot-prefixed LEAF read works but trips DataSource's
      // "all paths were ignored" warning on every scan.
      val trainDir = new org.apache.hadoop.fs.Path(p.getParent, s".train_${p.getName}")
      hfs.delete(trainDir, true)
      def iterPath(i: Int) = new org.apache.hadoop.fs.Path(trainDir, s"iter$i")
      // INIT: cell i = the vector with the i-th smallest id — the seq
      // route's exact mapping, expressed as an id-rank window over the
      // k-row GlobalLimit (single partition by construction, bounded by
      // k·dim — never the corpus).
      vecs.orderBy(col(idCol)).limit(k)
        .select(col(idCol).as("__id"),
          col(vecCol).cast("array<double>").as("centroid"))
        .withColumn("cell",
          (row_number().over(Window.orderBy(col("__id"))) - 1).cast("int"))
        .select(col("cell"), col("centroid"))
        .write.mode("overwrite").parquet(iterPath(0).toString)
      var cur = iterPath(0)
      (0 until iters).foreach { it =>
        val model = Model.tableAt(cur.toString, kEff)
        val assigned = index(vecs.select(col(vecCol)), model, vecCol)
        // The SAME (cell, pos) mean aggregation as the seq route (same
        // values), re-assembled to (cell, centroid) as a plan: positions
        // sort inside their cell's collect_list — dim-bounded per group.
        val means = assigned
          .select(col("cell"), posexplode(col(vecCol)).as(Seq("pos", "x")))
          .groupBy("cell", "pos")
          .agg(avg(col("x").cast("double")).as("m"))
          .groupBy("cell")
          .agg(transform(
            array_sort(collect_list(struct(col("pos"), col("m")))),
            e => e.getField("m")).as("__new"))
        val next = spark.read.parquet(cur.toString)
          .join(means, Seq("cell"), "left")
          .select(col("cell"),
            coalesce(col("__new"), col("centroid")).as("centroid"))
        val nxt = iterPath(it + 1)
        next.write.mode("overwrite").parquet(nxt.toString)
        hfs.delete(cur, true)
        cur = nxt
      }
      save(spark, Model.tableAt(cur.toString, kEff), path)
      hfs.delete(trainDir, true)
      load(spark, path)
    } finally { vecs.unpersist(); () }
  }

  /** Persist a trained model as a tiny parquet table (cell, centroid) —
    * at corpus scale the quantizer is trained ONCE on a sample and reused
    * by every indexing/search job; retraining per query would both waste
    * the corpus passes and silently re-assign cells (breaking a
    * partitioned index). The write stages to a hidden sibling dir and
    * renames into place (Spark's overwrite mode is delete-then-write, so
    * a concurrent [[load]] mid-save would otherwise see a missing or
    * partial model — exactly the hazard persistence exists to prevent).
    */
  def save(spark: org.apache.spark.sql.SparkSession, model: Model, path: String): Unit =
    graft.core.PathLocks.forPath(path).synchronized {
      val p = new org.apache.hadoop.fs.Path(path)
      val hfs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val tmp = new org.apache.hadoop.fs.Path(p.getParent, s".staging_${p.getName}")
      // Seq face: one file (the codebook is KBs–MBs). Table face: keep
      // the source partitioning — a k=10⁷ codebook must not funnel
      // through one writer.
      val out = model.centroidsDf(spark)
      (if (model.tableBacked) out else out.coalesce(1))
        .write.mode("overwrite").parquet(tmp.toString)
      // An already-built super-model travels with the codebook (√k +
      // 2k-int rows — tiny), atomically under the same swap, so the
      // NEXT process loads it instead of re-running the super-Lloyd
      // (verdict item 4). Saves of models that never went hierarchical
      // skip this — zero cost for every small-k caller.
      cachedSuperModel(spark, model).foreach { sm =>
        persistSuperModel(spark, sm, superDirFor(tmp.toString))
      }
      // Two-rename swap with a .bak, the Checkpoints/History pattern: a
      // crash between the renames leaves the backup, which recover()
      // restores — never a window with no model at all (delete-then-
      // rename had one, and no recovery if the process died inside it).
      recover(hfs, p)
      val bak = bakPath(p)
      if (hfs.exists(bak)) hfs.delete(bak, true)
      if (hfs.exists(p) && !hfs.rename(p, bak))
        sys.error(s"model save: backup rename of $path failed")
      if (!hfs.rename(tmp, p)) sys.error(s"model save: rename into $path failed")
      hfs.delete(bak, true)
    }

  private def bakPath(p: org.apache.hadoop.fs.Path) =
    new org.apache.hadoop.fs.Path(p.getParent, s".bak_${p.getName}")

  private def recover(hfs: org.apache.hadoop.fs.FileSystem,
                      p: org.apache.hadoop.fs.Path): Unit = {
    val bak = bakPath(p)
    if (!hfs.exists(p) && hfs.exists(bak)) hfs.rename(bak, p)
  }

  /** The cache's super-model for `model`, if one was ever built this
    * process — a read-only peek ([[save]] uses it to persist without
    * triggering a build).
    */
  private def cachedSuperModel(spark: org.apache.spark.sql.SparkSession,
                               model: Model): Option[SuperModel] = {
    val ref = superModelCache.get(
      (spark.sparkContext.applicationId, model.fingerprint))
    Option(if (ref != null) ref.get() else null)
  }

  /** Load a persisted model; centroid order/ids round-trip exactly.
    * Takes the same per-path lock as [[save]] (a read mid-swap would see
    * a missing dir) and restores the .bak if a crashed save left one.
    *
    * FACE DISPATCH: a [[boundedCollect]] probe decides — at or under
    * the ceiling the rows just read ARE the seq face (one job, exactly
    * the r15 cost); past it the codebook stays on
    * disk and the TABLE face comes back, so loading a k=10⁷ model costs
    * the driver (path, k) instead of ~10 GB. The table face's plans read
    * the files lazily — a caller that deletes the model dir mid-query
    * owns that race (the same contract as any warehouse scan).
    */
  def load(spark: org.apache.spark.sql.SparkSession, path: String): Model =
    graft.core.PathLocks.forPath(path).synchronized {
      val p = new org.apache.hadoop.fs.Path(path)
      recover(p.getFileSystem(spark.sparkContext.hadoopConfiguration), p)
      boundedCollect(spark.read.parquet(path), tableModelMinK.toLong) match {
        case Some(rows) =>
          Model.seqAt(rows.map(r => r.getInt(0) -> r.getSeq[Double](1).toSeq)
            .sortBy(_._1).toSeq, path)
        case None => Model.table(spark, path)
      }
    }

  /** Index the corpus: adds the `cell` assignment column. At warehouse
    * scale this is the partition column (`partitionBy("cell")`) so probes
    * scan only `nprobe` of `k` partitions.
    */
  def index(corpus: DataFrame, model: Model, vecCol: String = "embedding"): DataFrame =
    withNearestCells(corpus, vecCol, model, 1, "__cells")
      .withColumn("cell", col("__cells").getItem(0).getField("cell"))
      .drop("__cells")

  /** Materialize the index in its warehouse layout: one directory per
    * cell (`partitionBy("cell")`), so a probe's cell filter prunes at
    * file-listing time — a search lists and scans only `nprobe` of `k`
    * directories (spec-evidenced by IvfPruneSpec's input-file audit).
    */
  /** Writer-task count for the partitioned index write: k while small
    * (one writer per cell), CAPPED past [[maxIndexWriters]] — at a
    * cell-law k ~ 10⁶ an uncapped `repartition(k)` schedules a million
    * near-empty tasks whose launch overhead dwarfs the write. Hash
    * partitioning by cell keeps EVERY cell's rows in exactly one task at
    * any count, so each cell dir still gets one writer/one file; the cap
    * only lets one task write several cell dirs.
    */
  private[graft] def indexWriterCount(k: Int): Int =
    math.min(k, sys.props.get("graft.ivf.maxIndexWriters").map(_.toInt)
      .getOrElse(1 << 12))

  def writePartitionedIndex(corpus: DataFrame, model: Model, path: String,
                            vecCol: String = "embedding",
                            dropCols: Seq[String] = Nil): Unit =
    // Repartition BY CELL before the partitioned write: without it every
    // upstream partition writes a sliver into every cell directory
    // (upstream-partitions × k tiny files — measured 5× slower searches
    // from listing/open overhead at 40k rows); with it each cell is one
    // writer's output. The count is PINNED (an unpinned repartition
    // of a byte-small projection gets coalesced by AQE to a handful of
    // writer tasks (the recorded CandidateJoin lesson), serializing the
    // write) to k capped at [[indexWriterCount]]. Paid once at
    // index-build time — the whole point of an index. `dropCols` sheds
    // columns that existed only for the assignment (a caller clustering
    // in a transformed space — MipsState's transient augmentation —
    // stores the raw layout, not the assign-time one).
    index(corpus, model, vecCol).drop(dropCols: _*)
      .repartition(indexWriterCount(model.k), col("cell"))
      .write.mode("overwrite").partitionBy("cell").parquet(path)

  /** Probe-pruned scan of a [[writePartitionedIndex]] layout: the query
    * set's probed-cell union (≤ |queries|·nprobe ints — metadata-sized,
    * driver-safe) becomes a STATIC partition filter, so pruning happens at
    * plan time regardless of join strategy — unlisted cell directories are
    * never touched.
    */
  def prunedIndexScan(spark: org.apache.spark.sql.SparkSession, path: String,
                      queries: DataFrame, model: Model, nprobe: Int = 2,
                      vecCol: String = "embedding"): DataFrame = {
    val probed = withNearestCells(queries.select(col(vecCol)), vecCol, model, nprobe, "__cells")
      .select(explode(col("__cells").getField("cell")).as("cell"))
      .distinct()
    // The union is ≤ min(|Q|·nprobe, k): a STATIC partition filter while
    // it is genuinely metadata-sized, a full scan past the ceiling — an
    // isin over ~10⁶ cells (inference batch × extreme k) is itself a
    // plan-size/driver hazard, and at that fan-in the downstream cell
    // equi-join filters the same rows with runtime pruning instead.
    boundedCollect(probed, staticPruneMaxCells) match {
      case Some(cells) =>
        spark.read.parquet(path)
          .filter(col("cell").isin(cells.map(_.getInt(0)).toSeq: _*))
      case None => spark.read.parquet(path)
    }
  }

  /** Ceiling on the probed-cell union used as a static `isin` partition
    * filter: above it the plan falls back to an unfiltered scan + the
    * cell equi-join (InSet stays cheap to ~10⁴ literals; past that the
    * collect and the plan node are the asymptote, not the scan).
    * Override via `-Dgraft.ivf.staticPruneMaxCells`.
    */
  private[graft] def staticPruneMaxCells: Long =
    sys.props.get("graft.ivf.staticPruneMaxCells").map(_.toLong)
      .getOrElse(1L << 14)

  /** [[search]] against an on-disk partitioned index, scanning only the
    * probed cell directories — through [[scoredCandidatesPruned]], so
    * the query probe runs ONCE for both its consumers.
    */
  def searchPartitioned(spark: org.apache.spark.sql.SparkSession, path: String,
                        queries: DataFrame, model: Model, k: Int, nprobe: Int = 2,
                        idCol: String = "vec_id", vecCol: String = "embedding",
                        excludeSelf: Boolean = true): DataFrame =
    Similarity.topK(
      scoredCandidatesPruned(spark, path, queries, model, nprobe, idCol,
        vecCol, excludeSelf, querySideSmall = None),
      k, idCol)

  /** One-probe pruned candidates against a [[writePartitionedIndex]]
    * layout: the r15 shape ran the coarse assign on the query frame
    * TWICE per search — once in [[prunedIndexScan]] for the static
    * partition filter, once in [[scoredCandidates]] for the join frame
    * (the double-probe IvfPqState lost in r15). Here the probe frame is
    * computed once, checkpointed (|Q|·nprobe rows, executor storage),
    * and serves both: its distinct cells become the static filter
    * (ceilinged — the [[prunedIndexScan]] fallback rule) and the frame
    * itself is the candidate join side.
    */
  private[graft] def scoredCandidatesPruned(
      spark: org.apache.spark.sql.SparkSession, path: String,
      queries: DataFrame, model: Model, nprobe: Int, idCol: String,
      vecCol: String, excludeSelf: Boolean,
      querySideSmall: Option[Boolean]): DataFrame = {
    val q0 = withNearestCells(
        queries.select(col(idCol).as("query_id"), col(vecCol).as("q_vec")),
        "q_vec", model, nprobe, "cells")
      .withColumn("cell", explode(col("cells").getField("cell")))
      .drop("cells")
    // Driver arm (the lutFrame dispatch pattern): a broadcast-small probe
    // frame collects ONCE and serves every consumer its former jobs fed —
    // the |Q| sizing pass, the eager checkpoint, and the distinct-cells
    // collect for the static partition filter — as driver-local data; the
    // candidate join side becomes a broadcast LocalRelation of the same
    // rows. A caller that measured the batch big (querySideSmall =
    // Some(false)) skips the attempt; a bounded collect past the cap
    // falls back to the checkpointed distributed frame unchanged.
    val collected =
      if (querySideSmall.contains(false)) None
      else boundedCollect(q0, queryBroadcastMaxRows)
    val (q, hintProbe, cellsOpt) = collected match {
      case Some(rows) =>
        val local = spark.createDataFrame(
          java.util.Arrays.asList(rows: _*), q0.schema)
        val cells = rows.map(_.getAs[Int]("cell")).distinct
        (local, true,
          if (cells.length <= staticPruneMaxCells) Some(cells.toSeq) else None)
      case None =>
        val ckpt = q0.localCheckpoint(eager = true)
        val cells = boundedCollect(ckpt.select("cell").distinct(),
          staticPruneMaxCells).map(_.map(_.getInt(0)).toSeq)
        (ckpt, false, cells)
    }
    val scan = cellsOpt match {
      case Some(cells) => spark.read.parquet(path)
        .filter(col("cell").isin(cells: _*))
      case None => spark.read.parquet(path)
    }
    val joined = scan.join(if (hintProbe) broadcast(q) else q, Seq("cell"))
    val candidates =
      if (excludeSelf) joined.filter(col(idCol) =!= col("query_id")) else joined
    candidates
      .withColumn("score", graft.functions.cosineSimilarity(col("q_vec"), col(vecCol)))
  }

  /** ANN top-k: each query probes its `nprobe` nearest cells, exact cosine
    * within them.
    *
    * `excludeSelf` drops corpus rows whose id EQUALS the query id — correct
    * when queries ARE corpus rows (the q28 shape), WRONG for an external
    * query set whose ids coincidentally collide with corpus ids (both id
    * spaces naturally start at 0): there it silently hides a true nearest
    * neighbor. External-query callers (the `ann-search` CLI) pass false.
    */
  def search(indexed: DataFrame, queries: DataFrame, model: Model, k: Int,
             nprobe: Int = 2, idCol: String = "vec_id", vecCol: String = "embedding",
             excludeSelf: Boolean = true): DataFrame =
    Similarity.topK(
      scoredCandidates(indexed, queries, model, nprobe, idCol, vecCol, excludeSelf),
      k, idCol)

  /** The pre-top-k candidate frame of [[search]]: (query_id, idCol,
    * score) for every corpus row in a probed cell. Exposed so a caller
    * holding TWO candidate sources (e.g. [[graft.warehouse.IvfState]]'s
    * bundle + unfolded tail) can union them BEFORE the rank window —
    * ranking each source separately and unioning after would miss a
    * tail row that belongs in the global top k.
    */
  private[graft] def scoredCandidates(indexed: DataFrame, queries: DataFrame,
      model: Model, nprobe: Int, idCol: String, vecCol: String,
      excludeSelf: Boolean, querySideSmall: Option[Boolean] = None): DataFrame = {
    // One BOUNDED pass over the query frame sizes the broadcast decision
    // (queries are corpus-independent — the probe never touches the
    // index side): `limit(cap+1).count` early-stops instead of the r15
    // full count, and a caller that already sized the batch (the state
    // faces) passes `querySideSmall` to skip the job entirely. The
    // alternative — an unconditional hint — OOMs at inference-batch |Q|
    // (the [[queryBroadcastMaxRows]] rationale).
    val hintProbe = querySideSmall.getOrElse(
      boundedCount(queries, queryBroadcastMaxRows / math.max(nprobe, 1)).isDefined)
    val q = withNearestCells(
        queries.select(col(idCol).as("query_id"), col(vecCol).as("q_vec")),
        "q_vec", model, nprobe, "cells")
      .withColumn("cell", explode(col("cells").getField("cell")))
      .drop("cells")
    val joined = indexed.join(if (hintProbe) broadcast(q) else q, Seq("cell"))
    val candidates =
      if (excludeSelf) joined.filter(col(idCol) =!= col("query_id")) else joined
    candidates
      .withColumn("score", graft.functions.cosineSimilarity(col("q_vec"), col(vecCol)))
  }

  /** Build model + partitioned index as ONE atomically-swapped bundle dir
    * (`<path>/model`, `<path>/index`): swapping them independently has a
    * torn window where a reader pairs the NEW centroids with the OLD (or
    * partial) cell layout and probes the wrong directories — silently
    * wrong neighbors. The bundle stages to a hidden sibling and renames
    * into place with the same .bak crash recovery as [[save]].
    */
  def buildBundle(spark: org.apache.spark.sql.SparkSession, corpus: DataFrame,
                  path: String, k: Int, iters: Int = 3,
                  vecCol: String = "embedding"): Model =
    graft.core.PathLocks.forPath(path).synchronized {
      val p = new org.apache.hadoop.fs.Path(path)
      val hfs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val tmp = new org.apache.hadoop.fs.Path(p.getParent, s".staging_${p.getName}")
      hfs.delete(tmp, true)
      val model = train(corpus, k, iters, vecCol = vecCol)
      save(spark, model, new org.apache.hadoop.fs.Path(tmp, "model").toString)
      writePartitionedIndex(corpus, model, new org.apache.hadoop.fs.Path(tmp, "index").toString, vecCol)
      recover(hfs, p)
      val bak = bakPath(p)
      if (hfs.exists(bak)) hfs.delete(bak, true)
      if (hfs.exists(p) && !hfs.rename(p, bak))
        sys.error(s"index bundle: backup rename of $path failed")
      if (!hfs.rename(tmp, p)) sys.error(s"index bundle: rename into $path failed")
      hfs.delete(bak, true)
      model
    }

  /** Search a [[buildBundle]] layout. Read-path recovery is NON-mutating
    * (a crashed swap's `.bak_<bundle>` is served in place — the bak→live
    * rename is reserved for [[buildBundle]], which holds the path lock;
    * a reader-side rename racing a rebuild between its two swap renames
    * could re-install the stale bundle over the fresh one, the
    * [[graft.warehouse.IvfState]] r13-ADVICE hazard). External query
    * sets default to `excludeSelf = false` — their id space is unrelated
    * to the corpus ids.
    */
  def searchBundle(spark: org.apache.spark.sql.SparkSession, path: String,
                   queries: DataFrame, k: Int, nprobe: Int = 2,
                   idCol: String = "vec_id", vecCol: String = "embedding",
                   excludeSelf: Boolean = false): DataFrame = {
    val p = new org.apache.hadoop.fs.Path(path)
    val hfs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val live = if (hfs.exists(p)) p else {
      val bak = bakPath(p)
      if (hfs.exists(bak)) bak
      else sys.error(s"IvfIndex.searchBundle: no bundle at $path")
    }
    val model = load(spark, new org.apache.hadoop.fs.Path(live, "model").toString)
    searchPartitioned(spark, new org.apache.hadoop.fs.Path(live, "index").toString,
      queries, model, k, nprobe, idCol, vecCol, excludeSelf)
  }

  // ---------------------------------------------------------------- q28
  /** IVF ANN top-5 over the planted-margin corpus (k=16 cells, nprobe=4),
    * query vectors vec_id < 10. Each planted twin sits within ~0.11 of its
    * query (cosine ≥ 0.992 vs a natural max ≈ 0.48), so the twins share
    * the query's cell (or a probed neighbor cell) and the IVF answer is
    * the exact top-5 — hash-checked against the shared exact-kNN oracle
    * ([[Similarity.plantedKnnSql]]), with equality against the brute-force
    * baseline additionally CI-audited at every harness SF by
    * AnnExactnessSpec. Training is deterministic (min-id init, pure Lloyd
    * steps), so the cell layout — and with it the query result — is
    * reproducible run to run.
    */
  def ivfKnn(spark: org.apache.spark.sql.SparkSession, dir: String): DataFrame = {
    val corpus = Similarity.plantedKnnCorpus(graft.core.Tables.embeddings(spark, dir))
    val model = train(corpus, k = 16, iters = 2)
    search(index(corpus, model), corpus.filter(col("vec_id") < 10), model, k = 5, nprobe = 4)
  }

  // --------------------------------------------------------------- q261
  /** The q28 search with the coarse assign FORCED onto the hierarchical
    * path — the oracle-gated face of [[hierarchicalNearestCell]] (specs
    * pin path equality; this row pins the path against the DuckDB
    * exact-kNN oracle every round, the q28 discipline). The forcing
    * scope covers plan CONSTRUCTION — dispatch happens when
    * [[withNearestCells]] builds the plan, and the super-model build
    * runs its Spark actions inside the same scope — so the returned
    * frame executes the hierarchical plan regardless of when the driver
    * materializes it. n = 1 assigns (index build, Lloyd) take the
    * codegen'd two-pass form; the n = 4 query probe takes the
    * bounded-heap n > 1 form — both levels of the dispatch are on this
    * row's oracle hook.
    */
  def ivfKnnHier(spark: org.apache.spark.sql.SparkSession, dir: String): DataFrame =
    literalAssignMaxKOverride.withValue(Some(0)) {
      hierarchicalAssignMinKOverride.withValue(Some(0)) {
        ivfKnn(spark, dir)
      }
    }

  // --------------------------------------------------------------- q264
  /** The q261 hierarchical search with the codebook FORCED onto the
    * TABLE face — the oracle-gated face of the disk-backed codebook
    * (the r16 lead item): the model round-trips through [[save]], comes
    * back as [[Model.table]] (`tableModelMinK` forced to 0), the
    * super-model is built from the parquet scan, WRITE-THROUGH persisted
    * beside it, and the search runs the hierarchical plans whose member
    * stream never touches the driver. A SECOND load + search on the same
    * dir then exercises the persisted-super load path (membership ⋈
    * codebook join) inside the same gated result — both faces of
    * verdict items 1 and 4 answer to the DuckDB exact-kNN oracle every
    * round (the q261/q262 discipline). The eager checkpoint runs inside
    * the try: the table face reads its parquet lazily, and the temp
    * model dir is deleted on exit.
    */
  def ivfKnnTable(spark: org.apache.spark.sql.SparkSession, dir: String): DataFrame = {
    val corpus = Similarity.plantedKnnCorpus(graft.core.Tables.embeddings(spark, dir))
    val tmp = java.nio.file.Files.createTempDirectory("graft-ivftable")
    try {
      val modelPath = s"$tmp/model"
      save(spark, train(corpus, k = 16, iters = 2), modelPath)
      tableModelMinKOverride.withValue(Some(0)) {
        literalAssignMaxKOverride.withValue(Some(0)) {
          hierarchicalAssignMinKOverride.withValue(Some(0)) {
            val m1 = load(spark, modelPath) // table face; super built + persisted
            val queries = corpus.filter(col("vec_id") < 10)
            val first = search(index(corpus, m1), queries, m1, k = 5, nprobe = 4)
              .localCheckpoint(eager = true)
            // Fresh-process simulation: drop the cache entry, reload, and
            // let the persisted super serve the second search.
            superModelCache.remove(
              (spark.sparkContext.applicationId, m1.fingerprint))
            val m2 = load(spark, modelPath)
            val second = search(index(corpus, m2), queries, m2, k = 5, nprobe = 4)
              .localCheckpoint(eager = true)
            // Built-super ≡ loaded-super results, enforced ON the gated
            // row (the oracle then checks `first` against DuckDB).
            val n = first.unionByName(second).distinct().count()
            require(n == first.count(),
              s"q264: persisted-super search diverged from built-super ($n rows)")
            first
          }
        }
      }
    } finally graft.core.Fs.deleteRecursively(tmp)
  }

  val queries: Seq[graft.NamedQuery] = Seq(
    graft.NamedQuery("q28_knn_ivf", ivfKnn _, Some(Similarity.plantedKnnSql)),
    graft.NamedQuery("q261_knn_ivf_hier", ivfKnnHier _, Some(Similarity.plantedKnnSql)),
    graft.NamedQuery("q264_knn_ivf_table", ivfKnnTable _, Some(Similarity.plantedKnnSql)))
}
