package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.ingest.{DeterministicHashEmbedder, Ingest}

/** The documents table is id-hash-bucket-partitioned: writes rewrite only
  * touched buckets, point reads prune partitions, and the logical view
  * (readDocuments) is unchanged.
  */
class BucketedTableSpec extends SparkSpec {

  private def bucketDirs(path: String): Map[String, Set[String]] =
    new java.io.File(path).listFiles().toSeq
      .filter(f => f.isDirectory && f.getName.startsWith("bucket="))
      .map(d => d.getName -> d.listFiles().map(_.getName).toSet).toMap

  test("upsert/delete rewrite only the touched buckets; untouched files survive verbatim") {
    val wh = Files.createTempDirectory("graft-wh").toString
    val api = new Api(spark, wh, new DeterministicHashEmbedder(16))
    import spark.implicits._
    api.createCollection("bk",
      documents = Some((0 until 300).map(i => s"bucket doc $i").toDF("content")))
    val entry = api.catalog.getCollection(api.catalog.physicalName("default", "bk"))
    val path = api.catalog.tablePath(entry)

    val before = bucketDirs(path)
    assert(before.size > 10, s"300 ids should spread over many buckets, got ${before.size}")
    // logical view hides the partition column
    assert(!api.catalog.readDocuments(entry).columns.contains("bucket"))

    // a one-document upsert touches exactly that id's bucket
    api.addDocuments("bk", Seq("a single new document").toDF("content"))
    val after = bucketDirs(path)
    val changed = after.keySet.filter(k => before.get(k) != after.get(k)) ++
      (before.keySet -- after.keySet)
    assert(changed.size == 1, s"one new id must touch one bucket, touched: $changed")
    assert(api.catalog.readDocuments(entry).count() == 301)

    // delete two ids -> only their (<=2) buckets change
    val victims = api.catalog.readDocuments(entry)
      .filter(col("content").isin("bucket doc 7", "bucket doc 8"))
      .select("id").collect().map(_.getString(0)).toSeq
    val expectedBuckets = victims.map(Ingest.idBucketScala).distinct
      .map(b => s"bucket=$b").toSet
    val beforeDel = bucketDirs(path)
    api.deleteDocuments("bk", victims)
    val afterDel = bucketDirs(path)
    val delChanged = afterDel.keySet.filter(k => beforeDel.get(k) != afterDel.get(k)) ++
      (beforeDel.keySet -- afterDel.keySet)
    assert(delChanged == expectedBuckets,
      s"delete must touch exactly the victims' buckets: $delChanged vs $expectedBuckets")
    assert(api.catalog.readDocuments(entry).count() == 299)

    // merge result == the logical full-table MERGE plan would produce
    val ids = api.catalog.readDocuments(entry).select("id")
      .collect().map(_.getString(0)).toSet
    assert(ids.size == 299 && victims.forall(!ids.contains(_)))
    api.deleteCollection("bk", confirm = true)
  }

  test("point lookups prune to the ids' buckets (PartitionFilters)") {
    val wh = Files.createTempDirectory("graft-wh").toString
    val api = new Api(spark, wh, new DeterministicHashEmbedder(16))
    import spark.implicits._
    api.createCollection("bp",
      documents = Some((0 until 100).map(i => s"point doc $i").toDF("content")))
    val entry = api.catalog.getCollection(api.catalog.physicalName("default", "bp"))
    val someIds = api.catalog.readDocuments(entry).select("id")
      .limit(3).collect().map(_.getString(0)).toSeq

    val lookup = api.getDocumentsByIds("bp", someIds)
    assert(lookup.count() == 3)
    val scan = api.catalog.readDocumentsForIds(entry, someIds)
      .queryExecution.executedPlan.collect {
        case f: org.apache.spark.sql.execution.FileSourceScanExec => f
      }.head
    assert(scan.partitionFilters.exists(_.toString.contains("bucket")),
      "id lookup must prune bucket partitions physically")

    // emptying delete leaves a valid (empty) bucketed table; re-add works
    val all = api.catalog.readDocuments(entry).select("id")
      .collect().map(_.getString(0)).toSeq
    api.deleteDocuments("bp", all)
    assert(api.catalog.readDocuments(entry).count() == 0)
    api.addDocuments("bp", Seq("post-empty doc").toDF("content"))
    assert(api.catalog.readDocuments(entry).count() == 1)
    assert(api.getDocumentsByIds("bp",
      api.catalog.readDocuments(entry).select("id").collect().map(_.getString(0)).toSeq)
      .count() == 1)
    api.deleteCollection("bp", confirm = true)
    assert(!Files.exists(Paths.get(api.catalog.tablePath(entry) + ".delta")))
  }

  private def maxFilesPerDir(tablePath: String, prefix: String): Int = {
    val base = Paths.get(tablePath)
    java.nio.file.Files.list(base).toArray.toSeq
      .map(_.asInstanceOf[java.nio.file.Path])
      .filter(p => p.getFileName.toString.startsWith(prefix))
      .map(p => java.nio.file.Files.list(p).toArray.toSeq
        .map(_.asInstanceOf[java.nio.file.Path])
        .count(_.getFileName.toString.endsWith(".parquet")))
      .maxOption.getOrElse(0)
  }

  test("compactPartitions: fragmented dirs coalesce row-identically; engine writes never fragment") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // external-writer fragmentation: 6 append-mode writes into one table
    val tablePath = Files.createTempDirectory("graft-frag").toString + "/t"
    (0 until 6).foreach { i =>
      (0 until 40).map(j => (s"r$i-$j", (j % 4).toString))
        .toDF("id", "payload")
        .withColumn("bucket", org.apache.spark.sql.functions.pmod(
          org.apache.spark.sql.functions.crc32(col("id")), org.apache.spark.sql.functions.lit(4)))
        .write.mode("append").partitionBy("bucket").parquet(tablePath)
    }
    assert(maxFilesPerDir(tablePath, "bucket=") > 1, "setup must fragment")
    val before = spark.read.parquet(tablePath)
      .select("id").collect().map(_.getString(0)).toSet
    val compacted = graft.catalog.PartitionedTable.compactPartitions(
      spark, tablePath, Seq("bucket"), sortCol = None, maxFiles = 1)
    assert(compacted.nonEmpty)
    assert(maxFilesPerDir(tablePath, "bucket=") == 1, "one file per dir now")
    val after = spark.read.parquet(tablePath)
      .select("id").collect().map(_.getString(0)).toSet
    assert(after == before, "layout-only: row set unchanged")
    // second pass: nothing left to do
    assert(graft.catalog.PartitionedTable.compactPartitions(
      spark, tablePath, Seq("bucket"), None, maxFiles = 1).isEmpty)

    // and the engine's OWN write path never needs it: stage-and-swap lands
    // one file per touched bucket by construction, so compactStorage on a
    // repeatedly-written collection is a no-op
    val dir = Files.createTempDirectory("graft-wh").toString
    val api = new Api(spark, dir, new graft.ingest.DeterministicHashEmbedder(32))
    api.createCollection("frag")
    (0 until 4).foreach { i =>
      api.addDocuments("frag", (0 until 8).map(j => s"doc $i $j").toDF("content"))
    }
    assert(api.compactStorage("frag", maxFiles = 1).values.sum == 0,
      "engine writes are already one file per partition")
    assert(api.search("frag", "doc", numberResults = 3).results.nonEmpty)
  }
}
