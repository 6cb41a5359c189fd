package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.ingest.{DeterministicHashEmbedder, Ingest}
import graft.search.{Lexical, LexIndex}

class LexIndexSpec extends SparkSpec {

  private def corpus() = {
    import spark.implicits._
    (0 until 80).map { i =>
      s"document $i mentions spark ${if (i % 3 == 0) "join table" else ""} " +
        s"${if (i % 5 == 0) "vector stream data" else "plain filler words"}"
    }.toDF("content")
  }

  test("persistent lexical index is bucket-partitioned and bucket filters prune physically") {
    val wh = Files.createTempDirectory("graft-wh").toString
    val api = new Api(spark, wh, new DeterministicHashEmbedder(16))
    api.createCollection("lex", documents = Some(corpus()))
    val entry = api.catalog.getCollection(api.catalog.physicalName("default", "lex"))
    api.buildLexicalIndex("lex")
    val dirs = new java.io.File(LexIndex.indexPath(api.catalog, entry))
      .listFiles().map(_.getName).filter(_.startsWith("bucket="))
    assert(dirs.length > 1, "postings must be physically partitioned by bucket")

    val index = LexIndex.load(spark, api.catalog, entry)
    val pruned = LexIndex.prunedPostings(index, Seq("spark", "join"))
    val scan = pruned.queryExecution.executedPlan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }.head
    assert(scan.partitionFilters.exists(_.toString.contains("bucket")),
      "bucket predicate must land in PartitionFilters (physical pruning)")
    // and the term equality is pushed into the surviving parquet
    assert(scan.metadata.get("PushedFilters").exists(_.contains("In(term")),
      s"term filter must push down, got ${scan.metadata.get("PushedFilters")}")
    // column bucket mirror agrees with the SQL-expressible definition
    val chk = spark.range(1).select(
      LexIndex.bucketOf(lit("spark")).as("b")).collect()(0).getInt(0)
    assert(chk == LexIndex.bucketOfScala("spark"))
  }

  test("TF and BM25 through the persistent index match the scan paths bit-exactly") {
    val wh = Files.createTempDirectory("graft-wh").toString
    val api = new Api(spark, wh, new DeterministicHashEmbedder(16))
    api.createCollection("lex2", documents = Some(corpus()))
    val entry = api.catalog.getCollection(api.catalog.physicalName("default", "lex2"))
    api.buildLexicalIndex("lex2")
    val index = LexIndex.load(spark, api.catalog, entry)
    val docs = api.catalog.readDocuments(entry)
    val queries = Seq((0, "spark join table"), (1, "vector stream data"))

    val tfScan = Lexical.search(docs, queries, 10)
      .orderBy("query_idx", "id").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getDouble(2))).toSeq
    val tfIdx = LexIndex.searchTf(index, queries, 10)
      .orderBy("query_idx", "id").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getDouble(2))).toSeq
    assert(tfScan.nonEmpty && tfScan == tfIdx)

    val bmScan = Lexical.searchBm25Many(docs.select(col("id"), col("content")), queries, 10)
      .orderBy("query_idx", "id").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getDouble(2))).toSeq
    val bmIdx = LexIndex.searchBm25(index, queries, 10)
      .orderBy("query_idx", "id").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getDouble(2))).toSeq
    assert(bmScan.nonEmpty && bmScan == bmIdx,
      "persistent-index BM25 must reproduce scan BM25 bit-for-bit")

    // governed API round trip
    val res = api.lexicalSearchIndexed("lex2", Seq("spark join"), 5)
    assert(res.results.nonEmpty && res.results.head.content.contains("spark"))
  }

  test("derived indexes refresh on document writes (no stale serving)") {
    val wh = Files.createTempDirectory("graft-wh").toString
    val api = new Api(spark, wh, new DeterministicHashEmbedder(16))
    import spark.implicits._
    api.createCollection("live", documents = Some(corpus()))
    api.buildLexicalIndex("live")
    api.buildAnnIndex("live", nClusters = 4)
    api.buildLshIndex("live", bits = 4, tables = 4)

    // an upsert introducing a brand-new term must be served by the index
    api.addDocuments("live", Seq("zeppelin archive entry").toDF("content"))
    val hit = api.lexicalSearchIndexed("live", Seq("zeppelin"), 5)
    assert(hit.results.nonEmpty && hit.results.head.content.contains("zeppelin"),
      "postings index must include rows upserted after the build")
    val bm = api.lexicalSearchBm25Indexed("live", Seq("zeppelin"), 5)
    assert(bm.results.nonEmpty && bm.results.head.content.contains("zeppelin"))
    // the new document is reachable through both refreshed ANN layouts
    val sem = api.semanticSearchApprox("live", Seq("zeppelin archive entry"), 3)
    assert(sem.results.head.content == "zeppelin archive entry")
    val lsh = api.semanticSearchLsh("live", Seq("zeppelin archive entry"), 3)
    assert(lsh.results.head.content == "zeppelin archive entry")

    // a delete must disappear from index-served results too
    val id = hit.results.head.id
    api.deleteDocuments("live", Seq(id))
    assert(api.lexicalSearchIndexed("live", Seq("zeppelin"), 5).results.isEmpty,
      "postings index must not serve deleted documents")
    assert(!api.semanticSearchApprox("live", Seq("zeppelin archive entry"), 3)
      .results.exists(_.id == id))
    assert(!api.semanticSearchLsh("live", Seq("zeppelin archive entry"), 3)
      .results.exists(_.id == id))
    api.deleteCollection("live", confirm = true)

    // an index emptied by deletes serves empty results, not an error
    api.createCollection("solo", documents = Some(Seq("only doc").toDF("content")))
    api.buildLexicalIndex("solo")
    val soloId = api.lexicalSearchIndexed("solo", Seq("only"), 1).results.head.id
    api.deleteDocuments("solo", Seq(soloId))
    assert(api.lexicalSearchBm25Indexed("solo", Seq("only"), 5).results.isEmpty)
    assert(api.lexicalSearchIndexed("solo", Seq("only"), 5).results.isEmpty)
    api.deleteCollection("solo", confirm = true)
  }

  test("derived indexes die with the collection (no stale serving after recreate)") {
    val wh = Files.createTempDirectory("graft-wh").toString
    val api = new Api(spark, wh, new DeterministicHashEmbedder(16))
    import spark.implicits._
    api.createCollection("reborn", documents = Some(corpus()))
    val entry = api.catalog.getCollection(api.catalog.physicalName("default", "reborn"))
    api.buildLexicalIndex("reborn")
    api.buildAnnIndex("reborn", nClusters = 4)
    assert(new java.io.File(LexIndex.indexPath(api.catalog, entry)).exists())
    api.deleteCollection("reborn", confirm = true)
    assert(!new java.io.File(LexIndex.indexPath(api.catalog, entry)).exists(),
      "posting index must be deleted with the collection")
    assert(!new java.io.File(graft.ann.IvfIndex.indexPath(api.catalog, entry)).exists(),
      "ANN index must be deleted with the collection")
    assert(!new java.io.File(graft.ann.IvfIndex.centroidsPath(api.catalog, entry)).exists(),
      "persisted centroids must be deleted with the collection")
    // recreate under the same name: no derived artifacts resurrected
    api.createCollection("reborn", documents = Some(Seq("fresh doc").toDF("content")))
    assert(!new java.io.File(LexIndex.indexPath(api.catalog, entry)).exists())
  }
}
