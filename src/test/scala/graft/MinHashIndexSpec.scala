package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.dedup.MinHashIndex
import graft.ingest.DeterministicHashEmbedder
import graft.model.GraftException

class MinHashIndexSpec extends SparkSpec {

  private def freshApi() = {
    val wh = Files.createTempDirectory("graft-wh").toString
    new Api(spark, wh, new DeterministicHashEmbedder(16))
  }

  test("layout: pbucket partition dirs, pruned probe scan, meta sidecar") {
    val api = freshApi()
    import spark.implicits._
    val docs = (0 until 80)
      .map(i => s"minhash corpus doc $i with shared words w${i % 7} tail")
      .toDF("content")
    api.createCollection("mh", documents = Some(docs))
    val entry = api.catalog.getCollection(api.catalog.physicalName("default", "mh"))
    api.buildMinHashIndex("mh", bands = 16, shingleN = 3)

    val root = new java.io.File(MinHashIndex.indexPath(api.catalog, entry))
    val dirs = root.listFiles().map(_.getName).filter(_.startsWith("pbucket="))
    assert(dirs.nonEmpty && dirs.length <= MinHashIndex.NumBuckets)

    val index = MinHashIndex.load(spark, api.catalog, entry)
    val pruned = index.filter(col("pbucket").isin(0, 1, 2))
    val scan = pruned.queryExecution.executedPlan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }.head
    assert(scan.partitionFilters.exists(_.toString.contains("pbucket")),
      "probe predicate must land in PartitionFilters")

    val meta = MinHashIndex.requireMeta(spark, api.catalog, entry)
    assert(meta.bands == 16 && meta.shingleN == 3)
    // every document with >= shingleN tokens has exactly `bands` rows
    assert(index.count() == 80L * 16)
    api.deleteCollection("mh", confirm = true)
    assert(!root.exists(), "index dies with the collection")
  }

  test("content gate: rejects textual near-dups, passes novel, same-id update ok") {
    val api = freshApi()
    import spark.implicits._
    // docs share a short prefix but diverge in a long per-doc tail, so
    // CROSS-document jaccard stays far below the 0.6 gate (otherwise an
    // exact re-send would legitimately flag against its near-dup SIBLINGS)
    val base = (0 until 40).map(i =>
      s"the quick brown fox number $i jumps tok${i}a tok${i}b tok${i}c " +
        s"tok${i}d tok${i}e tok${i}f tok${i}g tok${i}h")
    api.createCollection("gate", documents = Some(base.toDF("content")))
    api.buildMinHashIndex("gate", bands = 16, shingleN = 3)

    // near-dup of doc 7 (one token changed -> jaccard far above 0.6),
    // one novel doc, and one EXACT re-send of doc 3 (same id -> update,
    // never self-flagged)
    val batch = Seq(
      base(7).replace("tok7h", "tok7zzz"),
      "completely different content about spark shuffles and parquet files",
      base(3)).toDF("content")
    val (written, rejected) = api.addDocumentsDedupContent("gate", batch, 0.6)
    assert(written == 2 && rejected == 1, s"got written=$written rejected=$rejected")

    val entry = api.catalog.getCollection(api.catalog.physicalName("default", "gate"))
    val contents = api.catalog.readDocuments(entry)
      .select("content").collect().map(_.getString(0)).toSet
    assert(contents.contains("completely different content about spark shuffles and parquet files"))
    assert(!contents.exists(_.contains("tok7zzz")), "near-dup must not land")

    // the write refreshed the index incrementally: novel doc is now corpus,
    // so re-sending it WITH A TWEAK gets gated against it (the one-token
    // change on a 9-token doc leaves jaccard 5/9 — threshold 0.5)
    val (w2, r2) = api.addDocumentsDedupContent("gate",
      Seq("completely different content about spark shuffles and orc files")
        .toDF("content"), 0.5)
    assert(w2 == 0 && r2 == 1, "gate must see documents added through itself")
  }

  test("index-served corpus pairs equal the from-scratch minhash dedup") {
    val api = freshApi()
    import spark.implicits._
    // clusters of planted near-dups (one-token variants) + distinct tails
    val base = (0 until 30).map(i =>
      s"corpus pair doc $i alpha beta gamma tok${i}a tok${i}b tok${i}c")
    val dups = Seq(3, 7, 11).map(i =>
      s"corpus pair doc $i alpha beta gamma tok${i}a tok${i}b tok${i}zz")
    api.createCollection("pairs", documents = Some((base ++ dups).toDF("content")))
    api.buildMinHashIndex("pairs", bands = 16, shingleN = 3)
    val entry = api.catalog.getCollection(api.catalog.physicalName("default", "pairs"))
    val fromIndex = MinHashIndex.nearDupPairs(spark, api.catalog, entry, 0.5)
      .select("a", "b").collect().map(r => (r.getString(0), r.getString(1))).toSet
    val scratch = graft.dedup.Dedup.minHashNearDups(
        api.catalog.readDocuments(entry).select("id", "content"), threshold = 0.5)
      .select("a", "b").collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(fromIndex == scratch && fromIndex.size >= 3,
      s"index-served pairs must equal from-scratch (got ${fromIndex.size} vs ${scratch.size})")
    // degraded candidate read (semi-join instead of driver collect) must
    // produce the same verified sets — force it with collectLimit = 0
    val candIds = fromIndex.flatMap(p => Seq(p._1, p._2)).toSeq.distinct
      .toDF("id")
    val viaSemi = MinHashIndex.candidateSets(spark, api.catalog, entry,
        candIds, shingleN = 3, collectLimit = 0)
      .select("id").collect().map(_.getString(0)).toSet
    val viaCollect = MinHashIndex.candidateSets(spark, api.catalog, entry,
        candIds, shingleN = 3)
      .select("id").collect().map(_.getString(0)).toSet
    assert(viaSemi == viaCollect && viaSemi == candIds.collect()
      .map(_.getString(0)).toSet)
  }

  test("gate is governed when no index exists; empty-delete keeps meta") {
    val api = freshApi()
    import spark.implicits._
    api.createCollection("nogate",
      documents = Some(Seq("some document body here").toDF("content")))
    val e = intercept[GraftException] {
      api.addDocumentsDedupContent("nogate",
        Seq("another doc").toDF("content"), 0.5)
    }
    assert(e.code == graft.model.ErrorCodes.DedupIndexNotFound)

    // build, then empty the collection: meta must survive so the NEXT write
    // still maintains the index (the ADVICE-r3 empty-rebuild hazard)
    api.buildMinHashIndex("nogate", bands = 8, shingleN = 2)
    val entry = api.catalog.getCollection(api.catalog.physicalName("default", "nogate"))
    val ids = api.catalog.readDocuments(entry).select("id")
      .collect().map(_.getString(0)).toSeq
    api.deleteDocuments("nogate", ids)
    assert(MinHashIndex.load(spark, api.catalog, entry).count() == 0)
    val meta = MinHashIndex.requireMeta(spark, api.catalog, entry)
    assert(meta.bands == 8 && meta.shingleN == 2)

    api.addDocuments("nogate", Seq("fresh after empty body text").toDF("content"))
    assert(MinHashIndex.load(spark, api.catalog, entry).count() == 8,
      "post-empty writes must re-enter the index under the surviving meta")
  }
}
