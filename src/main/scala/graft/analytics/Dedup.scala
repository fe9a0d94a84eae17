package graft.analytics

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.NamedQuery
import graft.core.Tables

/** Near-duplicate detection at corpus scale: MinHash + banded LSH and
  * 64-bit SimHash. Both follow the shuffle-minimal plan shape:
  *
  *   explode shingles once → ONE hash-aggregate computes the whole
  *   signature (64 mins / 64 bit-sums in a single pass) → band/bucket
  *   explode → self-join on (band, signature) finds candidates → exact
  *   verification only on candidates.
  *
  * The candidate join is the only O(pairs) step and it only sees colliding
  * buckets — the whole point of LSH: at 100 TB you never materialize the
  * n² pair space. Hash family: Spark's codegen'd murmur3/xxhash64 with the
  * seed folded in (`hash(w, lit(i))`), so signatures are deterministic
  * across runs and cluster layouts.
  */
object Dedup {

  val NumHashes = 64
  val NumBands = 16 // 4 rows per band → LSH threshold ≈ (1/16)^(1/4) ≈ 0.5

  /** doc → distinct word-shingle rows (one explode, reused by both sigs). */
  private def shingled(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol), explode(TextAnalysis.tokenSet(col(textCol))).as("w"))

  /** MinHash signatures: one row per doc, NumHashes min-hash columns
    * computed in a single hash aggregate.
    */
  def minHashSignatures(docs: DataFrame, idCol: String = "doc_id",
                        textCol: String = "text"): DataFrame = {
    val aggs = (0 until NumHashes).map(i => min(hash(col("w"), lit(i))).as(s"h$i"))
    shingled(docs, idCol, textCol).groupBy(idCol).agg(aggs.head, aggs.tail: _*)
  }

  /** LSH candidate pairs: docs sharing at least one band signature.
    * Symmetric pairs deduped to a < b.
    */
  def lshCandidates(sigs: DataFrame, idCol: String = "doc_id"): DataFrame = {
    val bandStructs = (0 until NumBands).map { b =>
      val rowCols = (b * NumHashes / NumBands until (b + 1) * NumHashes / NumBands)
        .map(i => col(s"h$i"))
      struct(lit(b).as("band"), hash(rowCols: _*).as("sig"))
    }
    val bands = sigs
      .select(col(idCol), explode(array(bandStructs: _*)).as("bs"))
      .select(col(idCol), col("bs.band").as("band"), col("bs.sig").as("sig"))
    bands.alias("x")
      .join(bands.withColumnRenamed(idCol, "b_id").alias("y"), Seq("band", "sig"))
      .filter(col(idCol) < col("b_id"))
      .select(col(idCol).as("a_id"), col("b_id"))
      .distinct()
  }

  /** Full MinHash-LSH near-dup pipeline: candidates verified with exact
    * word-set Jaccard, keeping pairs ≥ `threshold`.
    */
  def minHashNearDups(docs: DataFrame, threshold: Double, idCol: String = "doc_id",
                      textCol: String = "text"): DataFrame = {
    val sets = docs.select(col(idCol), TextAnalysis.tokenSet(col(textCol)).as("ws"))
    val pairs = lshCandidates(minHashSignatures(docs, idCol, textCol), idCol)
    pairs
      .join(sets.select(col(idCol).as("a_id"), col("ws").as("a_ws")), "a_id")
      .join(sets.select(col(idCol).as("b_id"), col("ws").as("b_ws")), "b_id")
      .withColumn("jaccard",
        size(array_intersect(col("a_ws"), col("b_ws"))).cast("double") /
          size(array_union(col("a_ws"), col("b_ws"))).cast("double"))
      .filter(col("jaccard") >= threshold)
      .select(col("a_id"), col("b_id"), round(col("jaccard"), 6).as("jaccard"))
  }

  /** 64-bit SimHash: xxhash64 per shingle, per-bit ±1 sums in one
    * aggregate, sign bits reassembled into a long.
    */
  def simHashSignatures(docs: DataFrame, idCol: String = "doc_id",
                        textCol: String = "text"): DataFrame = {
    val hashed = shingled(docs, idCol, textCol).withColumn("h", xxhash64(col("w")))
    val bitSums = (0 until 64).map { i =>
      sum(when(shiftright(col("h"), i).bitwiseAND(lit(1L)) === 1L, lit(1))
        .otherwise(lit(-1))).as(s"b$i")
    }
    val sums = hashed.groupBy(idCol).agg(bitSums.head, bitSums.tail: _*)
    val sim = (0 until 64)
      .map(i => when(col(s"b$i") > 0, shiftleft(lit(1L), i)).otherwise(lit(0L)))
      .reduce((a, b) => a.bitwiseOR(b))
    sums.select(col(idCol), sim.as("simhash"))
  }

  /** SimHash near-dup pairs within `maxHamming` (must be < 4): pigeonhole
    * on four 16-bit chunks — a pair within hamming 3 shares at least one
    * chunk, so the join only touches chunk-colliding buckets.
    */
  def simHashNearDups(docs: DataFrame, maxHamming: Int = 3,
                      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(maxHamming < 4, "chunked index supports hamming < 4")
    val sigs = simHashSignatures(docs, idCol, textCol)
    val chunks = sigs.select(
      col(idCol), col("simhash"),
      explode(array((0 until 4).map(c =>
        struct(lit(c).as("chunk"),
          shiftright(col("simhash"), c * 16).bitwiseAND(lit(0xFFFFL)).as("ck"))): _*)).as("cs"))
      .select(col(idCol), col("simhash"), col("cs.chunk"), col("cs.ck"))
    chunks.alias("x")
      .join(chunks
        .withColumnRenamed(idCol, "b_id")
        .withColumnRenamed("simhash", "b_simhash").alias("y"), Seq("chunk", "ck"))
      .filter(col(idCol) < col("b_id"))
      .select(col(idCol).as("a_id"), col("b_id"),
        bit_count(col("simhash").bitwiseXOR(col("b_simhash"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  // ---------------------------------------------------------------- q17
  /** Per-doc near-dup summary via MinHash LSH (threshold 0.7). Per-doc so
    * the output is non-empty and stable regardless of how many pairs
    * exist. Not ANSI-SQL-expressible (murmur3 hash family) → rows-only
    * driver check; exactness is covered by DedupSpec against a brute-force
    * Jaccard oracle.
    */
  def minHashSummary(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val pairs = minHashNearDups(docs, threshold = 0.7)
    val perDoc = pairs.select(col("a_id").as("doc_id"))
      .unionByName(pairs.select(col("b_id").as("doc_id")))
      .groupBy("doc_id").agg(count(lit(1)).as("n_neardups"))
    docs.select("doc_id")
      .join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"), coalesce(col("n_neardups"), lit(0L)).as("n_neardups"))
  }

  // ---------------------------------------------------------------- q18
  /** Per-doc SimHash signature + candidate count at hamming ≤ 3. Rows-only
    * (xxhash64 not expressible in ANSI SQL).
    */
  def simHashSummary(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val pairs = simHashNearDups(docs, maxHamming = 3)
    val perDoc = pairs.select(col("a_id").as("doc_id"))
      .unionByName(pairs.select(col("b_id").as("doc_id")))
      .groupBy("doc_id").agg(count(lit(1)).as("n_candidates"))
    simHashSignatures(docs)
      .join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"), col("simhash"),
        coalesce(col("n_candidates"), lit(0L)).as("n_candidates"))
  }

  val queries: Seq[NamedQuery] = Seq(
    NamedQuery.rowsOnly("q17_minhash_neardups")(minHashSummary _),
    NamedQuery.rowsOnly("q18_simhash_signatures")(simHashSummary _))
}
