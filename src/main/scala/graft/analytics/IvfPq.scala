package graft.analytics

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.NamedQuery
import graft.functions.{cosineSimilarity, dotProduct}

/** IVF-PQ composite index — the production trillion-vector ANN
  * architecture (FAISS's IVFADC; Jégou et al. TPAMI 2011 §V): a coarse
  * quantizer prunes the corpus to `nprobe` of `kCells` inverted lists,
  * and within the probed lists candidates are scanned as m-byte PQ codes
  * of the RESIDUAL (v − centroid(v)) — so a query touches
  * `nprobe/kCells` of the corpus AND reads ~32× fewer bytes per
  * candidate than raw floats, multiplying [[IvfIndex]]'s pruning by
  * [[PqIndex]]'s compression. Residual encoding matters: residuals are
  * centered near 0 with far less variance than raw vectors, so the same
  * ksub^m code space quantizes them with much smaller error.
  *
  * SEARCH (asymmetric distance, cross-cell comparable): per (query,
  * probed cell) an m × ksub lookup table of TRUE squared subspace
  * distances ‖q′_s − c‖² = ‖q′_s‖² − 2⟨q′_s, c⟩ + ‖c‖²
  * where q′ = q − centroid(cell). Unlike flat PQ (where the ‖q_s‖² term
  * is constant per query and rank-equivalence suffices,
  * [[PqIndex.scoredShortlist]]), IVF-PQ ranks candidates from DIFFERENT
  * cells in one shortlist window, and the query residual differs per
  * cell — dropping the ‖q′_s‖² term would bias the comparison toward
  * far cells. The LUT rows (|queries|·nprobe·m·ksub doubles) join the
  * candidates by cell EQUI-join (the probed-cell filter IS the join
  * key, no crossJoin; broadcast-hinted only while the query batch is
  * small — [[IvfIndex.queryBroadcastMaxRows]]), ADC is m array lookups
  * + a sum per candidate, and the `shortlist` best per query re-rank
  * with EXACT cosine on the raw vectors — the answer is exact whenever
  * the true top-k survives the shortlist (planted-margin gate + per-SF
  * brute-force parity in AnnExactnessSpec, the q28/q117 discipline).
  *
  * Coarse assignment rides [[IvfIndex.withNearestCells]], so indexing
  * inherits the k-dispatched literal/join assign and its extreme-k
  * ceiling fix. The QUERY-side probe + LUT build dispatch the same way
  * ([[lutFrame]]): small batches × small quantizers take a zero-job
  * driver path in plain Scala (identical arithmetic sequence →
  * identical doubles → identical probe sets); past the
  * [[driverProbeMaxWork]] product the probe rides `withNearestCells` on
  * the query FRAME and the LUTs are built as expressions over the
  * plan-literal codebooks ([[lutFrameEngine]]) — bit-equal to the
  * driver arm (IvfPqEngineProbeSpec), with O(codebook) driver memory at
  * any |Q|.
  *
  * 100 TB shape: the persisted layout is (vec_id, cell, codes [, raw
  * vector for re-rank]) partitioned by cell — [[IvfIndex
  * .writePartitionedIndex]]'s directory pruning with an 8-byte payload
  * per row; training cost is one coarse Lloyd + one residual PQ Lloyd,
  * both distributed with codebook-sized driver state.
  */
object IvfPq {

  final case class Model(coarse: IvfIndex.Model, pq: PqIndex.Model)

  /** Train coarse quantizer, then PQ codebooks on the coarse RESIDUALS. */
  def train(corpus: DataFrame, kCells: Int, m: Int, ksub: Int = 16,
            iters: Int = 2, idCol: String = "vec_id",
            vecCol: String = "embedding",
            knownCount: Option[Long] = None): Model = {
    val coarse = IvfIndex.train(corpus, kCells, iters, idCol, vecCol, knownCount)
    val pq = PqIndex.train(residuals(corpus, coarse, idCol, vecCol),
      m, ksub, iters, idCol, "__resid")
    Model(coarse, pq)
  }

  /** Cell-law training — coarse k = ⌈n/targetCellSize⌉ derived from the
    * corpus itself ([[IvfIndex.trainCellLaw]]), PQ books on the
    * residuals; the no-manual-tuning entry point for state maintenance.
    */
  def trainCellLaw(corpus: DataFrame, targetCellSize: Long, m: Int,
                   ksub: Int = 16, iters: Int = 2, idCol: String = "vec_id",
                   vecCol: String = "embedding",
                   knownCount: Option[Long] = None): Model = {
    val coarse = IvfIndex.trainCellLaw(corpus, targetCellSize, iters, idCol,
      vecCol, knownCount)
    val pq = PqIndex.train(residuals(corpus, coarse, idCol, vecCol),
      m, ksub, iters, idCol, "__resid")
    Model(coarse, pq)
  }

  /** [[train]]'s TABLE-route sibling: the coarse quantizer trains
    * through [[IvfIndex.trainTable]] straight into `path`/coarse (its
    * codebook never on the driver), the PQ books — m·ksub·dsub doubles,
    * KBs at ANY corpus scale — train on the residuals as usual and
    * persist beside it, so the whole composite model lands at `path` in
    * the [[saveModel]] layout without a driver-side codebook. The
    * extreme-k entry point for [[graft.warehouse.IvfPqState.recluster]].
    */
  def trainTable(corpus: DataFrame, kCells: Int, m: Int, path: String,
                 ksub: Int = 16, iters: Int = 2, idCol: String = "vec_id",
                 vecCol: String = "embedding",
                 knownCount: Option[Long] = None): Model = {
    val coarse = IvfIndex.trainTable(corpus, kCells, s"$path/coarse", iters,
      idCol, vecCol, knownCount)
    val pq = PqIndex.train(residuals(corpus, coarse, idCol, vecCol),
      m, ksub, iters, idCol, "__resid")
    PqIndex.saveModel(corpus.sparkSession, pq, s"$path/pq")
    Model(coarse, pq)
  }

  /** (idCol, vecCol, cell, __resid = v − centroid(cell)) — one coarse
    * assign + a broadcast centroid join + a fused zip_with subtraction.
    */
  private def residuals(df: DataFrame, coarse: IvfIndex.Model,
                        idCol: String, vecCol: String): DataFrame = {
    // centroidsDf (not the driver Seq) keeps a table-backed coarse model
    // off the driver; the broadcast hint goes only on a seq-faced
    // codebook (k below the broadcast ceiling by construction) — a
    // table-backed one shuffles the cell equi-join, the scale-correct
    // plan at extreme k.
    val cents = coarse.centroidsDf(df.sparkSession)
      .withColumnRenamed("centroid", "__cent")
    IvfIndex.index(df.select(col(idCol), col(vecCol)), coarse, vecCol)
      .join(if (coarse.tableBacked) cents else broadcast(cents), Seq("cell"))
      .withColumn("__resid",
        zip_with(col(vecCol).cast("array<double>"), col("__cent"), _ - _))
      .drop("__cent")
  }

  /** The scan table: (idCol, vecCol, cell, codes). At warehouse scale
    * persist it `partitionBy("cell")` (the [[IvfIndex
    * .writePartitionedIndex]] layout) so probes prune at file listing.
    */
  def index(corpus: DataFrame, model: Model, idCol: String = "vec_id",
            vecCol: String = "embedding"): DataFrame =
    PqIndex.encode(residuals(corpus, model.coarse, idCol, vecCol),
        model.pq, "__resid")
      .select(col(idCol), col(vecCol), col("cell"), col("codes"))

  /** ANN top-k: coarse probe ([[lutFrame]], |Q|-dispatched driver/
    * engine) → per-(query, cell) residual LUTs → cell equi-join → ADC
    * shortlist → exact re-rank.
    */
  def search(indexed: DataFrame, queries: DataFrame, model: Model, k: Int,
             nprobe: Int = 2, shortlist: Int = 50, idCol: String = "vec_id",
             vecCol: String = "embedding",
             excludeSelf: Boolean = true): DataFrame =
    Similarity.topK(
      scoredShortlist(indexed, queries, model, nprobe, shortlist, idCol,
        vecCol, excludeSelf),
      k, idCol)

  /** |Q|·kCells ceiling for the DRIVER-side probe path. The driver probe
    * ([[lutFrameDriver]]) collects the query set and does
    * O(|Q|·kCells·dim) FLOPs single-threaded plus |Q|·nprobe LUT rows of
    * driver memory — genuinely metadata-sized for FAISS-style query
    * batches (the gated shape: |Q|=10, 16 cells), but at the design
    * point (kCells ~10⁵ by the cell law, a nightly inference batch
    * |Q| ~10⁵–10⁶) that is 10¹⁰⁺ serial FLOPs and GBs of driver heap.
    * Above this |Q|·kCells product the probe + LUT build run ENGINE-side
    * ([[lutFrameEngine]]) — the same symmetry [[IvfIndex
    * .withNearestCells]] already applies to coarse ASSIGNMENT. Override
    * via `-Dgraft.ivfpq.driverProbeMaxWork`; specs force a path through
    * [[driverProbeMaxWorkOverride]].
    */
  private[graft] def driverProbeMaxWork: Long =
    driverProbeMaxWorkOverride.value.getOrElse(
      sys.props.get("graft.ivfpq.driverProbeMaxWork").map(_.toLong)
        .getOrElse(1L << 20))

  private[graft] val driverProbeMaxWorkOverride =
    new scala.util.DynamicVariable[Option[Long]](None)

  /** Independent |Q| ROW ceiling on the driver arm (r15 ADVICE): the
    * FLOPs product alone admits |Q| up to 2²⁰/kCells — at a SMALL
    * quantizer (kCells = 16) that is ~65k queries whose
    * |Q|·nprobe·(m·ksub + dim) LUT doubles (~GBs) would sit in driver
    * heap before anything ships, contradicting the O(codebook)-driver
    * claim in that regime. The row cap bounds driver LUT heap to
    * ~maxRows·nprobe·(m·ksub + dim)·8 bytes (~400 MB at the defaults)
    * regardless of kCells. Deliberately NOT the broadcast gate
    * ([[IvfIndex.queryBroadcastMaxRows]]): arm choice and join-side
    * hints are separate decisions — specs force them independently.
    */
  private[graft] def driverProbeMaxRows: Long =
    sys.props.get("graft.ivfpq.driverProbeMaxRows").map(_.toLong)
      .getOrElse(1L << 16)

  /** Per-(query, probed cell) residual-ADC LUT rows
    * (query_id, q_vec, cell, lut) — already carrying the query-side
    * broadcast policy ([[IvfIndex.hintQuerySide]]) — plus the probed-cell
    * union (≤ min(|Q|·nprobe, kCells) ints, driver-safe at any |Q|), so
    * a partitioned-layout caller can turn the union into a STATIC
    * partition filter ([[IvfIndex.prunedIndexScan]] rationale).
    *
    * Dispatches on |Q|·kCells ([[driverProbeMaxWork]]): small batches
    * keep the zero-job driver path; large ones compute probes and LUTs
    * engine-side with bit-identical arithmetic (IvfPqEngineProbeSpec).
    */
  private[graft] def lutFrame(spark: SparkSession, model: Model,
      queries: DataFrame, nprobe: Int, idCol: String, vecCol: String)
      : (DataFrame, Seq[Int]) = {
    val (df, cells, _) = lutFrameSized(spark, model, queries, nprobe, idCol, vecCol)
    // cells=None means the probed union ALREADY exceeded
    // staticPruneMaxCells inside lutFrameSized — re-collecting it
    // unbounded here would reintroduce the driver-collect/isin-plan
    // hazard the ceiling exists to prevent (r16 ADVICE). Empty = "no
    // static filter; lean on the cell equi-join's runtime pruning" —
    // the same contract lutFrameSized's None carries.
    (df, cells.getOrElse(Seq.empty))
  }

  /** [[lutFrame]] plus the |Q| the sizing probe learned (`Some(n)` when
    * the batch fit the driver-arm cap) — so a caller with a SECOND
    * query-size decision (the state faces' tail-broadcast side) reuses
    * this probe's answer instead of paying another job (the r15 verdict
    * measured the per-search sizing `count()` as q117/q161/q165 floor
    * drift; r15 ADVICE flagged the double count in IvfPqState.search).
    *
    * Sizing is [[IvfIndex.boundedCollect]] — one parallel job in the
    * estimate-small regime, whose rows ARE the driver arm's input (the
    * r15 shape paid a full count THEN a full collect); past the cap the
    * probe is dropped and the engine arm plans over the query frame.
    * The cap is DUAL-TERM (r15 ADVICE): |Q|·kCells ≤
    * [[driverProbeMaxWork]] bounds the driver arm's serial FLOPs, and
    * |Q| ≤ [[driverProbeMaxRows]] independently bounds its LUT-row heap
    * (the FLOPs gate alone admitted ~GB driver LUT builds at small
    * kCells). The broadcast hint stays the separate
    * [[IvfIndex.hintQuerySide]] decision: the driver arm knows |Q|
    * exactly from the collect; the engine arm never hints — its |Q| is
    * only known to exceed the cap, and AQE re-promotes a runtime-small
    * side on its own.
    */
  private[graft] def lutFrameSized(spark: SparkSession, model: Model,
      queries: DataFrame, nprobe: Int, idCol: String, vecCol: String)
      : (DataFrame, Option[Seq[Int]], Option[Long]) = {
    val kCells = model.coarse.k
    val rowCap = math.min(
      driverProbeMaxWork / math.max(kCells, 1), driverProbeMaxRows)
    IvfIndex.boundedCollect(
      queries.select(col(idCol).cast("long"), col(vecCol).cast("array<double>")),
      rowCap) match {
      case Some(rows) =>
        val (df, cells) = lutFromRows(spark, model, rows, nprobe)
        (IvfIndex.hintQuerySide(df, rows.length.toLong * nprobe), Some(cells),
          Some(rows.length.toLong))
      case None =>
        // ONE materialized probe pass: the coarse assign is the expensive
        // half of the engine arm (|Q|·kCells pair scoring through the
        // join assign), and BOTH consumers need it — the probed-cell
        // union collect and the LUT build (which is map-side expressions
        // ON TOP of the probe rows, no further shuffle). The checkpoint
        // holds |Q|·nprobe × (dim + 2) values in executor (not driver)
        // storage; without it the assign would run twice (measured ~2×
        // the probe wall at |Q| = 10⁵, IvfPqProbeCheck). The cell union
        // is a STATIC partition filter only while metadata-sized
        // ([[IvfIndex.staticPruneMaxCells]]): at an inference batch over
        // an extreme-k quantizer the union approaches k and the isin
        // plan node — not the scan — becomes the hazard; None tells the
        // caller to lean on the cell equi-join's runtime pruning.
        val probes = probeFrame(model, queries, nprobe, idCol, vecCol)
          .localCheckpoint(eager = true)
        val cells = IvfIndex.boundedCollect(
            probes.select("cell").distinct(), IvfIndex.staticPruneMaxCells)
          .map(_.map(_.getInt(0)).toSeq)
        (lutOnProbes(model, probes), cells, None)
    }
  }

  /** Driver-path probe: per query the `nprobe` nearest cells (same
    * (‖c‖²−2⟨q,c⟩, cell) ordering as the engine assign, in plain Scala)
    * with the per-cell residual ADC LUT — zero Spark jobs, right for
    * small query batches where launching distributed work costs more
    * than the probe itself.
    */
  private[graft] def lutFrameDriver(spark: SparkSession, model: Model,
      queries: DataFrame, nprobe: Int, idCol: String, vecCol: String)
      : (DataFrame, Seq[Int]) =
    lutFromRows(spark, model,
      queries.select(col(idCol).cast("long"), col(vecCol).cast("array<double>"))
        .collect(),
      nprobe)

  /** The driver arm's core over ALREADY-collected query rows — split out
    * so the dispatch's bounded sizing collect IS the arm's input read
    * (one job, not count-then-collect).
    */
  private def lutFromRows(spark: SparkSession, model: Model,
      collected: Array[org.apache.spark.sql.Row], nprobe: Int)
      : (DataFrame, Seq[Int]) = {
    import spark.implicits._
    val m = model.pq.m
    val dsub = model.pq.dsub
    def dot(a: Seq[Double], b: Seq[Double]): Double =
      a.zip(b).map { case (x, y) => x * y }.sum
    val centById = model.coarse.centroids.toMap
    val qRows = collected.map(r => (r.getLong(0), r.getSeq[Double](1).toSeq))
    val lutRows = qRows.toSeq.flatMap { case (qid, qv) =>
      val probed = model.coarse.centroids
        .map { case (cid, c) =>
          (c.map(x => x * x).sum - 2.0 * dot(qv, c), cid)
        }.sorted.take(nprobe)
      probed.map { case (_, cid) =>
        val qr = qv.zip(centById(cid)).map { case (a, b) => a - b }
        val lut = (0 until m).map { s =>
          val qs = qr.slice(s * dsub, (s + 1) * dsub)
          val qn = qs.map(x => x * x).sum
          model.pq.books(s).map(c =>
            qn - 2.0 * dot(qs, c) + c.map(x => x * x).sum)
        }
        (qid, qv, cid, lut)
      }
    }
    (lutRows.toDF("query_id", "q_vec", "cell", "lut"),
      lutRows.map(_._3).distinct)
  }

  /** Engine-path probe + LUT build — [[lutFrame]]'s scale arm. Coarse
    * probing rides the k-dispatched [[IvfIndex.withNearestCells]] on the
    * QUERY frame (literal expression tree at small kCells, broadcast
    * codebook join above it — the extreme-k ceiling fix is inherited);
    * the per-(query, cell) residual LUT is then a column expression over
    * the PLAN-literal PQ codebooks: per subspace `s`, a `transform` over
    * that subspace's ksub sub-centroids computes the true squared
    * subspace distance ‖q′_s − c‖² with the driver path's exact
    * arithmetic sequence — left-fold dots ([[dotProduct]]'s kernel ≡
    * Scala's zip/map/sum), `(qn − 2·dot) + cnorm` association — so the
    * two paths emit bit-identical doubles (IvfPqEngineProbeSpec pins
    * LUTs and end-to-end search equal, the IvfJoinAssignSpec pattern).
    *
    * Driver memory is O(codebook): the codebooks enter the plan as m
    * array literals (the full PQ codebook is m·ksub·dsub = ksub·dim
    * doubles — KBs) and nothing query-proportional is collected or
    * broadcast from the driver. Per probe row the HOF evaluates
    * ~3·ksub·dim interpreted multiplies — distributed over the cluster,
    * vs the driver arm's same total work on one thread.
    */
  private[graft] def lutFrameEngine(model: Model, queries: DataFrame,
      nprobe: Int, idCol: String, vecCol: String): DataFrame =
    lutOnProbes(model, probeFrame(model, queries, nprobe, idCol, vecCol))

  /** The engine arm's probe half: (query_id, q_vec, cell) — one row per
    * (query, probed cell), via the k-dispatched assign on the query
    * frame. Split from [[lutOnProbes]] so the dispatch can materialize
    * the probe ONCE for its two consumers (cell union + LUT build).
    */
  private def probeFrame(model: Model, queries: DataFrame,
      nprobe: Int, idCol: String, vecCol: String): DataFrame =
    IvfIndex.withNearestCells(
        queries.select(col(idCol).cast("long").as("query_id"),
          col(vecCol).cast("array<double>").as("q_vec")),
        "q_vec", model.coarse, nprobe, "__cells")
      .withColumn("cell", explode(col("__cells").getField("cell")))
      .drop("__cells")

  /** The engine arm's LUT half: residual + m×ksub true-squared-distance
    * tables as map-side expressions over the probe rows — no shuffle.
    */
  private def lutOnProbes(model: Model, probes: DataFrame): DataFrame = {
    val m = model.pq.m
    val dsub = model.pq.dsub
    // centroidsDf, not the driver Seq: the engine arm must stay
    // O(codebook-path) on the driver for a table-backed coarse model.
    // Probe rows are ≤ |Q|·nprobe but the centroid side is k rows — the
    // hint goes on the side the PROBE bounds... both sides can be large
    // at extreme k; the probed-cell set is ≤ min(|Q|·nprobe, k) DISTINCT
    // cells, so the centroid join stays an equi-join either way and AQE
    // picks the strategy when the hint is absent.
    val cents = model.coarse.centroidsDf(probes.sparkSession)
      .withColumnRenamed("centroid", "__cent")
    val probed = probes
      .join(if (model.coarse.tableBacked) cents else broadcast(cents),
        Seq("cell"))
      .withColumn("__resid",
        zip_with(col("q_vec"), col("__cent"), _ - _))
    val lut = array((0 until m).map { s =>
      val qs = slice(col("__resid"), s * dsub + 1, dsub)
      val qn = dotProduct(qs, qs)
      transform(typedlit(model.pq.books(s)), c =>
        qn - lit(2.0) * dotProduct(qs, c) + dotProduct(c, c))
    }: _*)
    probed.select(col("query_id"), col("q_vec"), col("cell"), lut.as("lut"))
  }

  /** The exactly-re-ranked shortlist of [[search]] BEFORE the final
    * top-k window — exposed so a caller holding TWO candidate sources
    * ([[graft.warehouse.IvfPqState]]'s bundle + unfolded raw tail) can
    * union them before ranking (the [[IvfIndex.scoredCandidates]] /
    * [[PqIndex.scoredShortlist]] rationale).
    */
  private[graft] def scoredShortlist(indexed: DataFrame, queries: DataFrame,
      model: Model, nprobe: Int, shortlist: Int, idCol: String,
      vecCol: String, excludeSelf: Boolean): DataFrame =
    // lutFrameSized, not lutFrame: this caller has no partitioned layout
    // to static-filter, so the probed-cell union would be computed only
    // to be discarded (r16 ADVICE — its engine-arm collect is a real job).
    scoredShortlistWith(indexed,
      lutFrameSized(indexed.sparkSession, model, queries, nprobe, idCol, vecCol)._1,
      shortlist, idCol, vecCol, excludeSelf)

  /** [[scoredShortlist]] against a PRE-computed [[lutFrame]] — so a
    * caller that already paid the probe for its static partition filter
    * ([[graft.warehouse.IvfPqState.search]]) doesn't probe twice. The
    * LUT frame arrives carrying its own broadcast policy (hinted only
    * below [[IvfIndex.queryBroadcastMaxRows]] — above it the cell
    * equi-join shuffles both sides by cell, the scale-correct plan).
    */
  private[graft] def scoredShortlistWith(indexed: DataFrame,
      lutRows: DataFrame, shortlist: Int, idCol: String,
      vecCol: String, excludeSelf: Boolean): DataFrame =
    Similarity.rerankShortlist(
      indexed.join(lutRows, Seq("cell")), // probed cells ONLY
      approx = PqIndex.adcScore, approxAsc = true, exactGuard = lit(true),
      shortlist = shortlist, idCol = idCol, vecCol = vecCol,
      excludeSelf = excludeSelf)

  /** Persist a trained composite model under `path` (`coarse` +
    * `pq` subdirs, each the family's tiny parquet table). Callers owning
    * a larger atomic unit (IvfPqState's bundle) write into their own
    * staging dir — the [[PqIndex.saveModel]] convention.
    */
  def saveModel(spark: SparkSession, model: Model, path: String): Unit = {
    IvfIndex.save(spark, model.coarse, s"$path/coarse")
    PqIndex.saveModel(spark, model.pq, s"$path/pq")
  }

  def loadModel(spark: SparkSession, path: String): Model =
    Model(IvfIndex.load(spark, s"$path/coarse"),
      PqIndex.loadModel(spark, s"$path/pq"))

  // --------------------------------------------------------------- q238
  /** IVF-PQ ANN top-5 over the planted-margin corpus — the q28 coarse
    * shape (16 cells, nprobe=4) times the q117 code shape (m=8 × 16
    * codes, shortlist 50), on residuals. The planted ~0.5 cosine margin
    * dwarfs both the probe risk (twin shares the query's probed cells)
    * and the residual quantization error, so the composite answer IS
    * the exact top-5 — hash-checked against the shared exact-kNN oracle
    * and CI-audited per SF by AnnExactnessSpec.
    */
  def ivfPqKnn(spark: SparkSession, dir: String): DataFrame = {
    val corpus = Similarity.plantedKnnCorpus(graft.core.Tables.embeddings(spark, dir))
    val model = train(corpus, kCells = 16, m = 8, ksub = 16, iters = 2)
    search(index(corpus, model), corpus.filter(col("vec_id") < 10), model,
      k = 5, nprobe = 4, shortlist = 50)
  }

  // --------------------------------------------------------------- q262
  /** The q238 search with the query-side probe FORCED onto the engine
    * arm AND the LUT broadcast gate forced open (shuffle cell join) —
    * the oracle-gated face of the r15 scale path: probes via
    * `withNearestCells` on the query frame, LUTs as expressions over
    * plan-literal codebooks, no query-proportional driver state, no
    * query-side broadcast. Forcing covers plan construction (both
    * dispatches choose at build time; the engine probe's checkpoint
    * action runs inside the scope), so the driver-side materialization
    * later executes the engine plan. Same planted exact-kNN oracle as
    * q238 — the composite answer must be bit-identical on either arm.
    */
  def ivfPqKnnEngine(spark: SparkSession, dir: String): DataFrame =
    driverProbeMaxWorkOverride.withValue(Some(0L)) {
      IvfIndex.queryBroadcastMaxRowsOverride.withValue(Some(0L)) {
        ivfPqKnn(spark, dir)
      }
    }

  val queries: Seq[NamedQuery] = Seq(
    NamedQuery("q238_knn_ivfpq", ivfPqKnn _, Some(Similarity.plantedKnnSql)),
    NamedQuery("q262_knn_ivfpq_engine", ivfPqKnnEngine _, Some(Similarity.plantedKnnSql)))
}
