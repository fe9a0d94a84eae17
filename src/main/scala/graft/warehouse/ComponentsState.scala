package graft.warehouse

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.NamedQuery

/** Incremental connected-components maintenance — the GRAPH member of
  * the state-table family (moments: [[MomentsState]]; quantiles:
  * [[QuantileState]]; ANN: [[IvfState]]/[[PqState]]): persist one
  * (node, label) row per node, label = the minimum node id in the
  * component, and fold EDGE batches in without ever re-scanning edge
  * history.
  *
  * The fold is the standard incremental-CC reduction: look up the
  * current label of each batch endpoint (new nodes label themselves),
  * contract the batch to REDUCED edges between distinct labels, run
  * label propagation ([[graft.analytics.Dedup.clusters]] — the q30
  * kernel) on that contracted graph, and map the state through the
  * relabeling. Because every component's label is its min node, the
  * min over merged labels IS the min node of the union — so k-batch
  * fold ≡ one-shot closure exactly, on any edge partitioning (the q103
  * replay invariant, lifted to graphs).
  *
  * Scale shape: state is nodes-sized (2 longs/node); each fold costs
  * one batch scan + one state join + label propagation on a graph the
  * size of the COMPONENTS the batch touches — never the corpus, never
  * the edge history. The q30 convergence contract carries over:
  * label-prop rounds ∝ contracted-graph diameter, loud failure past
  * the cap.
  *
  * Same persistence discipline as the family: [[StateFiles]] staged
  * swap + crash recovery, in-JVM path lock, opt-in cross-driver
  * [[LeaseLock]].
  */
object ComponentsState {

  /** Fold one batch of (aCol, bCol) edges into the components state at
    * `statePath`; returns the post-merge (node, label) table, eagerly
    * materialized so the snapshot survives the next swap.
    * `materializeReturn = false` skips that read+checkpoint for callers
    * that discard the return (a fold loop reading the state once at the
    * end — the q251 shape): the state on disk is identical either way,
    * only the unused snapshot job is saved.
    */
  def update(spark: SparkSession, statePath: String, edges: DataFrame,
             aCol: String = "a_id", bCol: String = "b_id",
             lease: Boolean = false,
             materializeReturn: Boolean = true): DataFrame =
    graft.core.PathLocks.forPath(statePath).synchronized {
      LeaseLock.withLease(spark, statePath, lease) {
        StateFiles.recover(spark, statePath)
        val e0 = edges.select(col(aCol).cast("long").as("a"),
          col(bCol).cast("long").as("b")).filter(col("a") =!= col("b"))
        // |state|+|batch|-dispatched DRIVER FOLD (the Dedup.clusters
        // union-find arm, lifted to the whole fold): a label-prop fold
        // over a bounded graph is ~27 Spark jobs of pure orchestration
        // (2 checkpoints, the contraction joins' AQE stage
        // materializations, the install write — measured 82 jobs for
        // q251's 3 folds), while the data is kilobytes. When the prior
        // state's FOOTER count and the batch's bounded collect both fit
        // under ccDriverMaxRows (16 MB of longs at the default), the
        // fold runs exactly in memory — same lookup/contract/union-find/
        // relabel/merge algebra, ComponentsStateSpec + the q251 oracle
        // pin equality — and the state installs through the job-free
        // long-pair writer. One Spark job total (the batch collect).
        // Past the cap: the distributed fold below, unchanged (100 TB
        // states never collect).
        val cap = graft.analytics.Dedup.ccDriverMaxRows
        val priorSmall = !StateFiles.exists(spark, statePath) ||
          StateFiles.dirRowCount(spark, statePath) <= cap
        val driverFold =
          if (!priorSmall) None
          else graft.analytics.IvfIndex.boundedCollect(e0, cap).flatMap { eRows =>
            StateFiles.readLongPairs(spark, statePath, "node", "label", cap)
              .map(prevPairs => (eRows, prevPairs))
          }
        driverFold match {
          case Some((eRows, prevPairs)) =>
            val prevMap = new java.util.HashMap[Long, Long](prevPairs.length * 2)
            prevPairs.foreach { case (n, l) => prevMap.put(n, l) }
            def labelOf(n: Long): Long = prevMap.getOrDefault(n, n)
            // Batch endpoints with their current labels (unseen nodes
            // self-label) — the `nodes` frame.
            val touched = new java.util.LinkedHashMap[Long, Long]()
            eRows.foreach { r =>
              val a = r.getLong(0); val b = r.getLong(1)
              if (!touched.containsKey(a)) touched.put(a, labelOf(a))
              if (!touched.containsKey(b)) touched.put(b, labelOf(b))
            }
            // Contract to distinct label-level edges, drop self-loops.
            val reduced = new java.util.LinkedHashSet[(Long, Long)]()
            eRows.foreach { r =>
              val la = touched.get(r.getLong(0))
              val lb = touched.get(r.getLong(1))
              if (la != lb) reduced.add((la, lb))
            }
            // Union-find over the contracted label graph → label → new.
            val epIds = new java.util.LinkedHashSet[java.lang.Long]()
            reduced.forEach { ed => epIds.add(ed._1); epIds.add(ed._2) }
            val ids = new Array[Long](epIds.size)
            var i = 0
            val epIt = epIds.iterator()
            while (epIt.hasNext) { ids(i) = epIt.next(); i += 1 }
            import scala.jdk.CollectionConverters._
            val relabel = graft.analytics.Dedup.unionFindMinLabels(ids,
              reduced.iterator().asScala)
            // merged = (prev ∪ nodes) min-label per node, mapped through
            // the relabeling — prev and nodes agree wherever both hold a
            // node (nodes' labels were looked up from prev), so the
            // union-min is a keyed overlay.
            val merged = new java.util.LinkedHashMap[Long, Long]()
            prevPairs.foreach { case (n, l) => merged.put(n, l) }
            touched.forEach { (n, l) => if (!merged.containsKey(n)) merged.put(n, l) }
            val out = new Array[(Long, Long)](merged.size)
            i = 0
            merged.forEach { (n, l) =>
              val nl = relabel.get(l)
              out(i) = (n, if (nl != null) nl.longValue() else l)
              i += 1
            }
            StateFiles.installLongPairs(spark, statePath, "node", "label", out)
            if (materializeReturn)
              spark.read.parquet(statePath).localCheckpoint(eager = true)
            else spark.read.parquet(statePath)
          case None => distributedFold(spark, statePath, e0, materializeReturn)
        }
      }
    }

  /** The distributed (above-cap) fold — the pre-r19 update body,
    * unchanged: 100 TB states never collect.
    */
  private def distributedFold(spark: SparkSession, statePath: String,
      e0: DataFrame, materializeReturn: Boolean): DataFrame = {
        val e = e0.localCheckpoint(eager = true)
        val prev =
          if (StateFiles.exists(spark, statePath))
            spark.read.parquet(statePath)
          else spark.range(0).select(col("id").as("node"),
            col("id").as("label"))
        // Current label per batch endpoint; unseen nodes self-label.
        val nodes = e.select(col("a").as("node"))
          .unionByName(e.select(col("b").as("node"))).distinct()
          .join(prev, Seq("node"), "left")
          .select(col("node"), coalesce(col("label"), col("node")).as("label"))
          .localCheckpoint(eager = true)
        // Contract the batch to label-level edges; self-loops vanish —
        // the propagation graph is components-sized, not corpus-sized.
        val la = nodes.select(col("node").as("a"), col("label").as("la"))
        val lb = nodes.select(col("node").as("b"), col("label").as("lb"))
        val reduced = e.join(la, Seq("a")).join(lb, Seq("b"))
          .select(col("la").as("a_id"), col("lb").as("b_id"))
          .filter(col("a_id") =!= col("b_id")).distinct()
        // Touched labels ARE the contracted edges' endpoints, so the
        // edge-derived clusters face collects the (bounded) contracted
        // graph once instead of running the endpoint union+distinct as
        // a second pass over the same join pipeline.
        val relabel = graft.analytics.Dedup.clustersFromEdges(reduced)
          .select(col("doc_id").as("label"), col("cluster_id").as("new_label"))
        val merged = prev.unionByName(nodes)
          .groupBy("node").agg(min("label").as("label"))
          .join(relabel, Seq("label"), "left")
          .select(col("node"),
            coalesce(col("new_label"), col("label")).as("label"))
        StateFiles.install(spark, statePath, merged)
        if (materializeReturn)
          spark.read.parquet(statePath).localCheckpoint(eager = true)
        else spark.read.parquet(statePath)
  }

  /** Current per-component rollup — a state-table read. */
  def components(spark: SparkSession, statePath: String): DataFrame =
    spark.read.parquet(statePath)
      .groupBy(col("label"))
      .agg(count(lit(1)).as("n_nodes"), min("node").as("min_node"),
        max("node").as("max_node"))

  // --------------------------------------------------------------- q251
  /** End-to-end incremental-CC gate: the same-language CHAIN graph over
    * documents (an edge between doc i and i+1 iff they share `lang`)
    * folded in three batches split by edge hash — maximally adversarial
    * for incrementality, since chain fragments from different batches
    * must merge across folds. The DuckDB oracle computes the closure
    * independently as gaps-and-islands over the doc sequence (a chain's
    * components ARE its maximal equal-lang runs), so the hash gate
    * proves 3-batch fold ≡ one-shot transitive closure exactly.
    */
  def componentsStateCheck(spark: SparkSession, dir: String): DataFrame = {
    val docs = graft.core.Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"))
    val next = docs.select((col("doc_id") - 1L).as("doc_id"),
      col("lang").as("next_lang"))
    val edges = docs.join(next, Seq("doc_id"))
      .filter(col("lang") === col("next_lang"))
      .select(col("doc_id").as("a_id"), (col("doc_id") + 1L).as("b_id"))
    val stateRoot = java.nio.file.Files.createTempDirectory("graft-ccstate")
    val statePath = stateRoot.toString + "/state"
    (0 until 3).foreach { i =>
      update(spark, statePath, edges.filter(pmod(col("a_id") * 31L, lit(3L)) === i),
        materializeReturn = false) // state read once, below
    }
    val labels = spark.read.parquet(statePath)
    // Singleton docs (no same-lang neighbor) are components of size 1 —
    // emit them too so the table covers the whole corpus.
    val out = docs.select(col("doc_id"))
      .join(labels.withColumnRenamed("node", "doc_id"), Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("label"), col("doc_id")).as("component"))
    val sizes = out.groupBy(col("component").as("c"))
      .agg(count(lit(1)).as("component_size"))
    val res = out.join(sizes, col("component") === col("c")).drop("c")
      .select(col("doc_id"), col("component"), col("component_size"))
      .localCheckpoint(eager = true)
    graft.core.Fs.deleteRecursively(stateRoot)
    res
  }

  private val componentsStateSql =
    """WITH runs AS (
      |  SELECT doc_id, lang,
      |    CASE WHEN lag(lang) OVER (ORDER BY doc_id) = lang
      |      AND lag(doc_id) OVER (ORDER BY doc_id) = doc_id - 1
      |      THEN 0 ELSE 1 END AS brk
      |  FROM documents
      |),
      |grp AS (
      |  SELECT doc_id,
      |    sum(brk) OVER (ORDER BY doc_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run_id
      |  FROM runs
      |),
      |comp AS (
      |  SELECT doc_id, min(doc_id) OVER (PARTITION BY run_id) AS component,
      |    count(*) OVER (PARTITION BY run_id) AS component_size
      |  FROM grp
      |)
      |SELECT doc_id, CAST(component AS BIGINT) AS component,
      |  CAST(component_size AS BIGINT) AS component_size
      |FROM comp""".stripMargin

  val queries: Seq[NamedQuery] = Seq(
    NamedQuery("q251_components_state", componentsStateCheck _,
      Some(componentsStateSql)))
}
