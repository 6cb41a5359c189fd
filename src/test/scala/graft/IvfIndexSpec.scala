package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.ann.{Ann, IvfIndex}
import graft.ingest.DeterministicHashEmbedder

class IvfIndexSpec extends SparkSpec {

  test("persistent IVF index prunes partitions and returns probed-exact top-k") {
    val wh = Files.createTempDirectory("graft-wh").toString
    val api = new Api(spark, wh, new DeterministicHashEmbedder(32))
    import spark.implicits._
    val docs = (0 until 200).map(i => s"document number $i with words w$i").toDF("content")
    api.createCollection("ivf", documents = Some(docs))
    val entry = api.catalog.getCollection(api.catalog.physicalName("default", "ivf"))

    val centroids = IvfIndex.build(spark, api.catalog, entry, nClusters = 8).cache()
    assert(centroids.count() == 8)
    // the index dir is physically partitioned by cluster_id
    val dirs = new java.io.File(IvfIndex.indexPath(api.catalog, entry))
      .listFiles().map(_.getName).filter(_.startsWith("cluster_id="))
    assert(dirs.length > 1)

    val q = new DeterministicHashEmbedder(32).embedQuery("document number 7").toSeq
    val res = IvfIndex.search(spark, api.catalog, entry, centroids,
      Seq(0 -> q), k = 5, nprobe = 3)
    assert(res.count() == 5)

    // partition pruning is visible in the physical plan of the probed scan
    val assigned = spark.read.parquet(IvfIndex.indexPath(api.catalog, entry))
    val pruned = assigned.filter(col("cluster_id").isin(0, 1))
    val scanExec = pruned.queryExecution.executedPlan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }.head
    assert(scanExec.partitionFilters.exists(_.toString.contains("cluster_id")),
      "probe filter must land in PartitionFilters (physical pruning)")

    // probed-exactness: IVF result == brute force restricted to the probed clusters
    val probeRows = centroids.collect().map { r =>
      val c = r.getSeq[Float](1)
      val dot = c.zip(q).map { case (x, y) => x.toDouble * y.toDouble }.sum
      val qn = math.sqrt(q.map(v => v.toDouble * v.toDouble).sum)
      (1.0 - dot / (r.getDouble(2) * qn), r.getLong(0))
    }.sortBy { case (d, id) => (d, id.toString) }.take(3).map(_._2).toSet
    val brute = assigned.filter(col("cluster_id").isin(probeRows.toSeq: _*))
      .withColumn("score",
        graft.search.Semantic.scoreAgainst(col("embedding"), col("norm"), q))
      .orderBy(col("score").desc, col("id").asc).limit(5)
      .select("id").as[String].collect().toSet
    val ivf = res.select("id").as[String].collect().toSet
    assert(ivf == brute)
    centroids.unpersist()
  }

  test("Api.semanticSearchApprox: adaptive probes reach the oversampling floor; recall==1 when pool covers corpus") {
    val wh = Files.createTempDirectory("graft-wh").toString
    val api = new Api(spark, wh, new DeterministicHashEmbedder(32))
    import spark.implicits._
    val docs = (0 until 150).map(i => s"record $i text t${i % 11}").toDF("content")
    api.createCollection("approx", documents = Some(docs))
    val centroids = api.buildAnnIndex("approx", nClusters = 6).cache()
    // numCandidates = max(10*k,100); with 150 docs in 6 clusters the
    // adaptive probe covers ~100+ docs, k=5
    val approx = api.semanticSearchApprox("approx", centroids, Seq("record 7 text"), 5)
    assert(approx.results.size == 5)
    assert(approx.results.map(_.score) == approx.results.map(_.score).sorted.reverse)
    val exact = api.semanticSearch("approx", Seq("record 7 text"), 5)
    val overlap = approx.results.map(_.id).toSet
      .intersect(exact.results.map(_.id).toSet).size
    assert(overlap >= 3, s"approx should mostly agree with exact, got $overlap/5")
    centroids.unpersist()
  }
}
