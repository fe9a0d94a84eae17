package graft.streaming

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.analytics.Curate

/** Streaming shard export: a doc_id-ordered 3-micro-batch stream must
  * produce exactly the rows the one-shot batch Curate run produces on
  * the same corpus (dedup base, split assignment, and pack offsets all
  * continue across batches); commits must be atomic (no staging residue,
  * no partial batch dir) and replays must converge to identical output.
  */
class StreamingCurateSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def docs = spark.read.parquet(s"$dir/documents.parquet")

  private def shardKey(df: org.apache.spark.sql.DataFrame): Seq[(Long, String, String, Long, Long)] = {
    import spark.implicits._
    df.select(col("doc_id"), col("split"), col("source"), col("n_toks"), col("seq_id"))
      .as[(Long, String, String, Long, Long)].collect().sortBy(_._1).toSeq
  }

  test("3 doc_id-ordered micro-batches == the batch Curate run, row for row") {
    val out = tmpDir("scur")
    val parts = Seq(
      docs.filter(col("doc_id") < 170),
      docs.filter(col("doc_id") >= 170 && col("doc_id") < 340),
      docs.filter(col("doc_id") >= 340))
    parts.zipWithIndex.foreach { case (p, i) =>
      StreamingCurate.processBatch(p, i.toLong, out)
    }
    val streamed = StreamingCurate.publishedShards(spark, out).get
    val batch = Curate.curated(docs)
    assert(shardKey(streamed) == shardKey(batch),
      "streamed shards must equal the one-shot batch curation")
    // Atomicity residue: no staging dirs, only complete batch_N dirs.
    val ls = Files.list(Paths.get(out)).toArray.map(_.toString)
    assert(!ls.exists(_.contains(".staging")), s"staging residue: ${ls.toSeq}")
    val batchDirs = Files.list(Paths.get(s"$out/batches")).toArray.map(_.toString)
    assert(batchDirs.length == 3 && batchDirs.forall(_.contains("batch_")))
  }

  test("a replayed batch id is a no-op; a crash-replay before commit converges") {
    val out = tmpDir("scur")
    val b0 = docs.filter(col("doc_id") < 250)
    val b1 = docs.filter(col("doc_id") >= 250)
    StreamingCurate.processBatch(b0, 0L, out)
    // Snapshot the pack state = the world as of "batch 1 not committed".
    val packSrc = Paths.get(s"$out/_state/pack")
    val snap = Paths.get(tmpDir("packsnap"), "pack")
    copyTree(packSrc, snap)

    StreamingCurate.processBatch(b1, 1L, out)
    val first = shardKey(StreamingCurate.publishedShards(spark, out).get)

    // Fully-committed replay: must short-circuit (state keeps last_batch=1).
    StreamingCurate.processBatch(b1, 1L, out)
    assert(shardKey(StreamingCurate.publishedShards(spark, out).get) == first)

    // Crash-replay: shards + kept dir for batch 1 exist, but the state
    // install "never happened" (restore the snapshot). The replay must
    // recompute batch 1 from the same pre-1 state and converge.
    deleteTree(packSrc)
    copyTree(snap, packSrc)
    StreamingCurate.processBatch(b1, 1L, out)
    assert(shardKey(StreamingCurate.publishedShards(spark, out).get) == first,
      "crash-replay must rebuild identical shards")
  }

  test("availableNow drains an NDJSON directory one file per micro-batch") {
    val out = tmpDir("scur")
    val watch = tmpDir("scur-src")
    val ckpt = tmpDir("scur-ckpt")
    val small = docs.filter(col("doc_id") < 150)
    val parts = Seq(
      small.filter(col("doc_id") < 50),
      small.filter(col("doc_id") >= 50 && col("doc_id") < 100),
      small.filter(col("doc_id") >= 100))
    parts.zipWithIndex.foreach { case (p, i) =>
      val stage = tmpDir("scur-stage")
      p.coalesce(1).write.mode("overwrite").json(stage)
      val part = Files.list(Paths.get(stage)).toArray.map(_.toString)
        .find(_.endsWith(".json")).get
      val target = Paths.get(watch, f"$i%04d.json")
      Files.move(Paths.get(part), target, StandardCopyOption.ATOMIC_MOVE)
      // Strictly increasing mtimes pin the source's oldest-first order.
      Files.setLastModifiedTime(target,
        java.nio.file.attribute.FileTime.fromMillis(1000000L + i * 10000))
    }
    val q = StreamingCurate.availableNow(
      spark, watch, small.schema, out, ckpt)
    q.awaitTermination()
    val streamed = StreamingCurate.publishedShards(spark, out).get
    assert(shardKey(streamed) == shardKey(Curate.curated(small)),
      "file-stream curation must equal the batch run")
  }

  private def copyTree(src: java.nio.file.Path, dst: java.nio.file.Path): Unit = {
    import scala.jdk.CollectionConverters._
    Files.walk(src).iterator().asScala.toSeq.foreach { p =>
      val t = dst.resolve(src.relativize(p).toString)
      if (Files.isDirectory(p)) Files.createDirectories(t)
      else { Files.createDirectories(t.getParent); Files.copy(p, t) }
    }
  }

  private def deleteTree(p: java.nio.file.Path): Unit =
    graft.core.Fs.deleteRecursively(p)
}
