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
}
