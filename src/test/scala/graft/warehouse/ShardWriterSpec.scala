package graft.warehouse

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ShardWriterSpec extends SparkSpec {

  test("shards are partition-routed and every file respects the record cap") {
    val docs = graft.core.Tables.documents(spark, "/root/testdata/sf0.001")
      .withColumn("split", graft.analytics.TrainingData.hashSplit(col("doc_id")))
    val out = tmpDir("shards") + "/corpus"
    val report = ShardWriter.writeShards(docs, out, Seq("split"), maxRecordsPerFile = 50)

    assert(report.rows == docs.count(), "export must be lossless")
    // Routing columns became directory partitions.
    val dirs = new java.io.File(out).listFiles().filter(_.isDirectory).map(_.getName).sorted
    assert(dirs.sameElements(Array("split=test", "split=train", "split=val")), dirs.toSeq.toString)
    // Enough files that the cap actually bit, and no file exceeds it.
    assert(report.files >= math.ceil(report.rows / 50.0).toLong)
    val back = spark.read.parquet(out)
    val perFile = back.groupBy(input_file_name()).count().collect().map(_.getLong(1))
    assert(perFile.forall(_ <= 50), s"oversized shard: ${perFile.max}")
    // Round-trip preserves the split assignment (partition column readable).
    assert(back.filter(col("split").isNull).count() == 0)
  }
}
