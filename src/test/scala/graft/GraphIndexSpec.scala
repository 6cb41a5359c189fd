package graft

import java.nio.file.Files
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.ann.GraphIndex
import graft.ingest.DeterministicHashEmbedder

/** Persistent kNN-graph index: exact incremental maintenance (upsert and
  * delete row-identical to a full rebuild) + beam-search serving.
  */
class GraphIndexSpec extends SparkSpec {
  import spark.implicits._

  private val K = 4

  private def newApi(): Api = {
    val wh = Files.createTempDirectory("graft-wh").toString
    new Api(spark, wh, new DeterministicHashEmbedder(32))
  }

  private def docsDf(is: Seq[Int]): DataFrame =
    is.map(i => s"document number $i carries words w$i and w${i % 7}").toDF("content")

  private def adjacency(api: Api, entry: graft.model.CollectionEntry): Seq[(String, String, Int)] =
    GraphIndex.load(spark, api.catalog, entry)
      .select("qid", "neighbor", "rank")
      .collect().map(r => (r.getString(0), r.getString(1), r.getInt(2)))
      .sortBy(x => (x._1, x._3))

  test("write-path upsert maintenance is row-identical to a full rebuild") {
    // the Api write path (stage/applyPending) maintains the graph index
    // automatically; the result must equal a from-scratch rebuild
    val api = newApi()
    api.createCollection("g1", documents = Some(docsDf(0 until 30)))
    val entry = api.catalog.getCollection(api.catalog.physicalName("default", "g1"))
    GraphIndex.build(spark, api.catalog, entry, K)
    assert(api.addDocuments("g1", docsDf(30 until 36)) == 6)
    val incremental = adjacency(api, entry)
    assert(incremental.map(_._1).distinct.size == 36)
    GraphIndex.build(spark, api.catalog, entry, K)
    assert(incremental == adjacency(api, entry))
  }

  test("write-path delete maintenance is row-identical to a full rebuild") {
    val api = newApi()
    api.createCollection("g2", documents = Some(docsDf(0 until 30)))
    val entry = api.catalog.getCollection(api.catalog.physicalName("default", "g2"))
    GraphIndex.build(spark, api.catalog, entry, K)

    val victims = api.catalog.readDocuments(entry)
      .select("id").as[String].collect().sorted.take(5).toSeq
    api.deleteDocuments("g2", victims)
    val incremental = adjacency(api, entry)

    GraphIndex.build(spark, api.catalog, entry, K)
    assert(incremental == adjacency(api, entry))
    // no deleted id survives anywhere in the adjacency
    assert(!incremental.exists(e => victims.contains(e._1) || victims.contains(e._2)))
  }

  test("beam search over the persisted graph matches GraphSearch on the fresh graph") {
    val api = newApi()
    api.createCollection("g3", documents = Some(docsDf(0 until 40)))
    val entry = api.catalog.getCollection(api.catalog.physicalName("default", "g3"))
    GraphIndex.build(spark, api.catalog, entry, K)

    val emb = new DeterministicHashEmbedder(32)
    val qs = Seq(0 -> emb.embedQuery("document number 7").toSeq)
    val viaIndex = GraphIndex.search(spark, api.catalog, entry, qs,
      entries = 4, beam = 8, hops = 3, k = 5)
      .collect().map(r => (r.getInt(0), r.getString(1))).sorted
    val vecs = api.catalog.readDocuments(entry).select("id", "embedding", "norm")
    val fresh = graft.ann.GraphSearch.beamSearch(
      graft.ann.Ann.knnJoin(vecs, K).select("qid", "neighbor"),
      vecs, qs, entries = 4, beam = 8, hops = 3, k = 5)
      .collect().map(r => (r.getInt(0), r.getString(1))).sorted
    assert(viaIndex.toSeq == fresh.toSeq)
    // the index dir is physically partitioned by qid hash bucket
    val dirs = new java.io.File(GraphIndex.indexPath(api.catalog, entry))
      .listFiles().map(_.getName).filter(_.startsWith("bucket="))
    assert(dirs.length > 1)
  }
}
