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
    val res = IvfIndex.search(spark, api.catalog, entry,
      Seq(0 -> q), k = 5, nprobe = 3)
    assert(res.count() == 5)

    // partition pruning is visible in the physical plan of the probed scan
    // (loadIndex declares cluster_id as Long; Long probe literals must
    // still land in PartitionFilters)
    val assigned = IvfIndex.loadIndex(spark, api.catalog, entry)
    val pruned = assigned.filter(col("cluster_id").isin(0L, 1L))
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
    api.buildAnnIndex("approx", nClusters = 6)
    // numCandidates = max(10*k,100); with 150 docs in 6 clusters the
    // adaptive probe covers ~100+ docs, k=5
    val approx = api.semanticSearchApprox("approx", Seq("record 7 text"), 5)
    assert(approx.results.size == 5)
    assert(approx.results.map(_.score) == approx.results.map(_.score).sorted.reverse)
    val exact = api.semanticSearch("approx", Seq("record 7 text"), 5)
    val overlap = approx.results.map(_.id).toSet
      .intersect(exact.results.map(_.id).toSet).size
    assert(overlap >= 3, s"approx should mostly agree with exact, got $overlap/5")
    // past the batch threshold the SAME questions route through the
    // one-plan adaptive batch (Ann.ivfTopKBatchAdaptive) — per-query
    // results must be unchanged. 40 questions > BatchedServeThreshold;
    // question 7 repeats the loop-served question above.
    val qs = (0 until 40).map(i => s"record $i text")
    assert(qs.size > Api.BatchedServeThreshold)
    val batched = api.semanticSearchApprox("approx", qs, 5)
    assert(batched.results.size == 40 * 5)
    val single = api.semanticSearchApprox("approx", Seq("record 7 text"), 5)
    // serialize flattens query-major: question 7's block sits at [35, 40)
    assert(batched.results.slice(35, 40).map(r => (r.id, r.score)) ==
      single.results.map(r => (r.id, r.score)))
  }

  test("adaptive probe selection stops once cluster sizes cover numCandidates (strict subset)") {
    val wh = Files.createTempDirectory("graft-wh").toString
    val api = new Api(spark, wh, new DeterministicHashEmbedder(32))
    import spark.implicits._
    val docs = (0 until 150).map(i => s"entry $i body b${i % 13}").toDF("content")
    api.createCollection("probes", documents = Some(docs))
    api.buildAnnIndex("probes", nClusters = 6)
    val entry = api.catalog.getCollection(api.catalog.physicalName("default", "probes"))
    val assigned = IvfIndex.loadIndex(spark, api.catalog, entry)
    // with the index loaded Long-typed, sizes key on Long and the lookup hits
    val sizes = assigned.groupBy("cluster_id").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sizes.values.sum == 150)
    val ranked = IvfIndex.loadCentroids(spark, api.catalog, entry)
      .collect().map(r => (r.getLong(0).toDouble, r.getLong(0))).sortBy(identity).toSeq
    val probes = IvfIndex.adaptiveProbes(ranked, sizes, numCandidates = 100)
    assert(probes.nonEmpty && probes.size < 6,
      s"sizes cover the floor before all clusters: got ${probes.size}/6 probes")
    // degenerate guard the bug produced: unknown (mistyped) keys -> all clusters
    val mistyped = IvfIndex.adaptiveProbes(ranked, Map.empty, numCandidates = 100)
    assert(mistyped.size == 6, "empty size map degrades to scanning every cluster")
  }

  test("centroids are persisted at build time and survive document mutation") {
    val wh = Files.createTempDirectory("graft-wh").toString
    val api = new Api(spark, wh, new DeterministicHashEmbedder(32))
    import spark.implicits._
    api.createCollection("stale",
      documents = Some((0 until 60).map(i => s"stale doc $i").toDF("content")))
    val entry = api.catalog.getCollection(api.catalog.physicalName("default", "stale"))
    api.buildAnnIndex("stale", nClusters = 4)
    val before = IvfIndex.loadCentroids(spark, api.catalog, entry)
      .orderBy("centroid_id").collect().map(_.getSeq[Float](1)).toSeq
    // mutate the documents table after the build
    api.addDocuments("stale", (100 until 160).map(i => s"later doc $i").toDF("content"))
    val after = IvfIndex.loadCentroids(spark, api.catalog, entry)
      .orderBy("centroid_id").collect().map(_.getSeq[Float](1)).toSeq
    assert(before == after,
      "persisted centroids must not drift when documents change post-build")
    // and approx search still works against the persisted pair
    assert(api.semanticSearchApprox("stale", Seq("stale doc 7"), 5).results.size == 5)
  }

  test("deterministic kmeans refinement improves quantization and is bit-reproducible") {
    import spark.implicits._
    import graft.functions.VectorFunctions
    // 4 gaussian-ish blobs on orthogonal axes, ids ordered so the first-K
    // seeds all land in blob 0 (worst case for the seed heuristic)
    val rows = (0 until 120).map { i =>
      val blob = i / 30 // ids 0..29 -> blob 0, 30..59 -> blob 1, ...
      val v = Array.tabulate(8)(j =>
        (if (j == blob * 2) 10f else 0f) + 0.05f * ((i * 31 + j * 17) % 7))
      (f"v$i%03d", v)
    }
    val vecs = rows.toDF("id", "embedding")
      .withColumn("norm", VectorFunctions.l2Norm(col("embedding")))
    def meanDist(centroids: org.apache.spark.sql.DataFrame): Double =
      Ann.assign(vecs, centroids)
        .join(centroids, col("cluster_id") === col("centroid_id"))
        .select(avg(lit(1.0) -
          VectorFunctions.dot(col("embedding"), col("centroid")) /
            (col("norm") * col("centroid_norm"))))
        .collect()(0).getDouble(0)
    val seeds = vecs.orderBy("id").limit(4)
      .select(monotonically_increasing_id().as("centroid_id"),
        col("embedding").as("centroid"), col("norm").as("centroid_norm"))
    val refined = Ann.kmeansCentroids(vecs, 4, iters = 3)
    assert(meanDist(refined) < meanDist(seeds) - 0.05,
      "3 Lloyd iterations must substantially improve quantization over first-K seeds")
    // bit-reproducibility: decimal-exact means give identical centroids
    val again = Ann.kmeansCentroids(vecs.repartition(7), 4, iters = 3)
    val a = refined.orderBy("centroid_id").collect().map(_.getSeq[Float](1))
    val b = again.orderBy("centroid_id").collect().map(_.getSeq[Float](1))
    assert(a.toSeq == b.toSeq, "centroids must be identical across partition layouts")
  }

  test("bounded-sample training: full-corpus assignment, reproducible centroids") {
    val wh = Files.createTempDirectory("graft-wh-ts").toString
    val api = new Api(spark, wh, new DeterministicHashEmbedder(32))
    import spark.implicits._
    val docs = (0 until 300).map(i => s"sampled training doc $i body b${i % 11}").toDF("content")
    api.createCollection("ivfs", documents = Some(docs))
    val entry = api.catalog.getCollection(api.catalog.physicalName("default", "ivfs"))
    // quantizer trains on ~half the vectors; assignment must still cover ALL
    api.buildAnnIndex("ivfs", nClusters = 4, kmeansIters = 2, trainFraction = 0.5)
    assert(IvfIndex.loadIndex(spark, api.catalog, entry).count() == 300,
      "every document gets assigned regardless of the training sample")
    val c1 = IvfIndex.loadCentroids(spark, api.catalog, entry)
      .orderBy("centroid_id").collect().map(_.getSeq[Float](1).toSeq).toSeq
    // rebuild: the hash-of-id sample is partitioning-independent, so the
    // quantizer is bit-identical
    api.buildAnnIndex("ivfs", nClusters = 4, kmeansIters = 2, trainFraction = 0.5)
    val c2 = IvfIndex.loadCentroids(spark, api.catalog, entry)
      .orderBy("centroid_id").collect().map(_.getSeq[Float](1).toSeq).toSeq
    assert(c1 == c2, "sampled training must stay deterministic across rebuilds")
    // and the index still serves
    val q = new DeterministicHashEmbedder(32).embedQuery("sampled training doc 5").toSeq
    assert(IvfIndex.search(spark, api.catalog, entry, Seq(0 -> q), k = 3, nprobe = 2)
      .count() == 3)
  }

  test("blocked kNN self-join equals exact kNN when clusters are well-separated") {
    import spark.implicits._
    import graft.functions.VectorFunctions
    // 3 tight clusters on orthogonal axes: every point's true neighbors
    // share its cluster, so the blocked (within-cluster) join is lossless
    val base = Seq(
      Array(10f, 0f, 0f, 0f), Array(0f, 10f, 0f, 0f), Array(0f, 0f, 10f, 0f))
    val rows = (0 until 30).map { i =>
      val c = base(i % 3)
      val v = c.zipWithIndex.map { case (x, j) => x + (i / 3) * 0.01f * (j + 1) }
      (f"v$i%03d", v, i % 3)
    }
    val vecs = rows.toDF("id", "embedding", "label")
      .withColumn("norm", VectorFunctions.l2Norm(col("embedding")))
    val exact = Ann.knnJoin(vecs.select("id", "embedding", "norm"), 3)
      .select("qid", "neighbor").collect().map(r => (r.getString(0), r.getString(1))).toSet
    val centroids = Ann.representativeCentroids(vecs, "label")
    val blocked = Ann.knnJoinBlocked(vecs.select("id", "embedding", "norm"), 3, centroids)
      .select("qid", "neighbor").collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(blocked == exact,
      "well-separated clusters: blocked kNN must recover the exact neighbor set")
    // and the blocked join's pair count is the per-cluster sum, not N^2:
    // 3 clusters x 10 x 9 = 270 scored pairs vs 30 x 29 = 870 exact
    val scoredPairs = Ann.knnJoinBlocked(vecs.select("id", "embedding", "norm"),
      30, centroids).count()
    assert(scoredPairs == 270)
  }

  test("empty question batches are rejected; engine layers return typed empties") {
    val wh = Files.createTempDirectory("graft-wh").toString
    val api = new Api(spark, wh, new DeterministicHashEmbedder(32))
    import spark.implicits._
    api.createCollection("e", documents = Some(Seq("only doc").toDF("content")))
    assert(intercept[graft.model.GraftException](
      api.semanticSearch("e", Seq.empty, 5)).code
      == graft.model.ErrorCodes.SearchQuestionInvalid)
    assert(intercept[graft.model.GraftException](
      api.lexicalSearch("e", Seq.empty, 5)).code
      == graft.model.ErrorCodes.SearchQuestionInvalid)
    assert(intercept[graft.model.GraftException](
      api.semanticSearchApprox("e", Seq.empty, 5)).code
      == graft.model.ErrorCodes.SearchQuestionInvalid)
    // engine-level: empty batch -> schema-correct zero-row result, no throw
    val entry = api.catalog.getCollection(api.catalog.physicalName("default", "e"))
    val d = api.catalog.readDocuments(entry)
    val sem = graft.search.Semantic.search(d, Seq.empty, 5)
    assert(sem.columns.toSeq == Seq("query_idx", "id", "score") && sem.count() == 0)
    val lex = graft.search.Lexical.search(d, Seq.empty, 5)
    assert(lex.columns.toSeq == Seq("query_idx", "id", "score") && lex.count() == 0)
  }
}
