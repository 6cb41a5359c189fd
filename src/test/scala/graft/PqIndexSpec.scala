package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.ann.{Pq, PqIndex}
import graft.ingest.DeterministicHashEmbedder
import graft.model.{ErrorCodes, GraftException}

class PqIndexSpec extends SparkSpec {

  test("persistent IVF-PQ: cluster-partitioned codes, pruned ADC scan, exact re-rank recall") {
    val wh = Files.createTempDirectory("graft-wh").toString
    val api = new Api(spark, wh, new DeterministicHashEmbedder(32))
    import spark.implicits._
    val docs = (0 until 200).map(i => s"pq document number $i tokens t$i").toDF("content")
    api.createCollection("pq", documents = Some(docs))
    val entry = api.catalog.getCollection(api.catalog.physicalName("default", "pq"))

    // IVF first (shared quantizer), then PQ on top
    api.buildAnnIndex("pq", nClusters = 8)
    api.buildPqIndex("pq", m = 4, k = 8, iters = 1)

    // codes are physically partitioned by cluster
    val dirs = new java.io.File(PqIndex.indexPath(api.catalog, entry))
      .listFiles().map(_.getName).filter(_.startsWith("cluster_id="))
    assert(dirs.length > 1, "PQ codes must be cluster-partitioned")

    // persisted codebooks round-trip with the declared (m, k) shape
    val cb = PqIndex.loadCodebooks(spark, api.catalog, entry).get
    assert(cb.size == 4 && cb.forall(_.size == 8) && cb.forall(_.forall(_.length == 8)))

    // probe filter lands in PartitionFilters (physical pruning)
    val pruned = PqIndex.load(spark, api.catalog, entry)
      .filter(col("cluster_id").isin(0L, 1L))
    val scan = pruned.queryExecution.executedPlan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }.head
    assert(scan.partitionFilters.exists(_.toString.contains("cluster_id")))
    // ...and the pruned scan reads codes, never the embedding column
    assert(!scan.schema.fieldNames.contains("embedding"),
      "ADC candidate scan must not read float embeddings")

    // a stored document queried by its own content must surface at rank 1:
    // oversampled ADC shortlist + exact re-rank (its own cluster is probed,
    // its codes are its own nearest, exact rerank is exact)
    val res = api.semanticSearchPq("pq", Seq("pq document number 7 tokens t7"), 3)
    assert(res.results.nonEmpty &&
      res.results.head.content == "pq document number 7 tokens t7")

    api.deleteCollection("pq", confirm = true)
    assert(!Files.exists(java.nio.file.Paths.get(PqIndex.indexPath(api.catalog, entry))))
    assert(!Files.exists(java.nio.file.Paths.get(PqIndex.codebooksPath(api.catalog, entry))))
  }

  test("PQ without IVF centroids: single-partition codes, search still serves") {
    val wh = Files.createTempDirectory("graft-wh").toString
    val api = new Api(spark, wh, new DeterministicHashEmbedder(32))
    import spark.implicits._
    api.createCollection("pqflat",
      documents = Some((0 until 50).map(i => s"flat doc $i").toDF("content")))
    api.buildPqIndex("pqflat", m = 4, k = 4, iters = 0)
    val entry = api.catalog.getCollection(api.catalog.physicalName("default", "pqflat"))
    val clusters = PqIndex.load(spark, api.catalog, entry)
      .select("cluster_id").distinct().collect().map(_.getLong(0)).toSet
    assert(clusters == Set(0L))
    val res = api.semanticSearchPq("pqflat", Seq("flat doc 3"), 2)
    assert(res.results.nonEmpty && res.results.head.content == "flat doc 3")
    api.deleteCollection("pqflat", confirm = true)
  }

  test("bounded-sample codebook training: full-corpus codes, reproducible, serves") {
    val wh = Files.createTempDirectory("graft-wh-pqts").toString
    val api = new Api(spark, wh, new DeterministicHashEmbedder(32))
    import spark.implicits._
    api.createCollection("pqts",
      documents = Some((0 until 200).map(i => s"pq sampled doc $i tail t${i % 9}")
        .toDF("content")))
    val entry = api.catalog.getCollection(api.catalog.physicalName("default", "pqts"))
    api.buildPqIndex("pqts", m = 4, k = 4, iters = 2, trainFraction = 0.5)
    assert(PqIndex.load(spark, api.catalog, entry).count() == 200,
      "encoding covers every document regardless of the training sample")
    val cb1 = PqIndex.loadCodebooks(spark, api.catalog, entry).get
    api.buildPqIndex("pqts", m = 4, k = 4, iters = 2, trainFraction = 0.5)
    val cb2 = PqIndex.loadCodebooks(spark, api.catalog, entry).get
    assert(cb1.map(_.map(_.toSeq)) == cb2.map(_.map(_.toSeq)),
      "hash-of-id sampled training must stay deterministic across rebuilds")
    val res = api.semanticSearchPq("pqts", Seq("pq sampled doc 11 tail t2"), 3)
    assert(res.results.nonEmpty)
    api.deleteCollection("pqts", confirm = true)
  }

  test("governed error for a missing PQ index; codebooks survive an emptying delete") {
    val wh = Files.createTempDirectory("graft-wh").toString
    val api = new Api(spark, wh, new DeterministicHashEmbedder(16))
    import spark.implicits._
    api.createCollection("pqe", documents = Some(Seq("solo").toDF("content")))
    val noIdx = intercept[GraftException](api.semanticSearchPq("pqe", Seq("solo"), 2))
    assert(noIdx.code == ErrorCodes.AnnIndexNotFound)

    api.addDocuments("pqe", (0 until 30).map(i => s"pq doc $i").toDF("content"))
    api.buildPqIndex("pqe", m = 4, k = 4, iters = 0)
    val entry = api.catalog.getCollection(api.catalog.physicalName("default", "pqe"))
    val cbBefore = PqIndex.loadCodebooks(spark, api.catalog, entry).get

    val allIds = api.catalog.readDocuments(entry)
      .select("id").collect().map(_.getString(0)).toSeq
    api.deleteDocuments("pqe", allIds)
    assert(api.catalog.readDocuments(entry).count() == 0)
    assert(PqIndex.load(spark, api.catalog, entry).count() == 0)
    // the quantizer is part of the index: it must survive zero rows
    val cbAfter = PqIndex.loadCodebooks(spark, api.catalog, entry).get
    assert(cbBefore.flatten.map(_.toSeq) == cbAfter.flatten.map(_.toSeq))
    // searching the emptied index is governed-empty, not an error
    assert(api.semanticSearchPq("pqe", Seq("pq doc 3"), 2).results.isEmpty)

    // re-added documents re-enter the index under the surviving codebooks
    api.addDocuments("pqe", Seq("pq reborn").toDF("content"))
    val res = api.semanticSearchPq("pqe", Seq("pq reborn"), 2)
    assert(res.results.nonEmpty && res.results.head.content == "pq reborn")
    api.deleteCollection("pqe", confirm = true)
  }

  test("residual IVF-PQ (IVFADC): serves through the index, meta survives, re-adds re-encode") {
    val wh = Files.createTempDirectory("graft-wh").toString
    val api = new Api(spark, wh, new DeterministicHashEmbedder(32))
    import spark.implicits._
    val docs = (0 until 200).map(i => s"res document number $i tokens t$i").toDF("content")
    api.createCollection("pqr", documents = Some(docs))
    val entry = api.catalog.getCollection(api.catalog.physicalName("default", "pqr"))

    api.buildAnnIndex("pqr", nClusters = 8)
    api.buildPqIndex("pqr", m = 4, k = 8, iters = 1, residual = true)
    assert(PqIndex.isResidual(spark, api.catalog, entry), "meta must record residual encoding")

    // a stored document queried by its own content surfaces at rank 1
    // (own cluster probed, residual ADC shortlist, exact re-rank)
    val res = api.semanticSearchPq("pqr", Seq("res document number 7 tokens t7"), 3)
    assert(res.results.nonEmpty &&
      res.results.head.content == "res document number 7 tokens t7")

    // the encoding convention survives an emptying delete (meta + codebooks
    // are index state), and re-added docs re-enter RESIDUAL-encoded via the
    // incremental write path
    val allIds = api.catalog.readDocuments(entry)
      .select("id").collect().map(_.getString(0)).toSeq
    api.deleteDocuments("pqr", allIds)
    assert(PqIndex.load(spark, api.catalog, entry).count() == 0)
    assert(PqIndex.isResidual(spark, api.catalog, entry))
    api.addDocuments("pqr", Seq("res reborn").toDF("content"))
    val reborn = api.semanticSearchPq("pqr", Seq("res reborn"), 2)
    assert(reborn.results.nonEmpty && reborn.results.head.content == "res reborn")
    api.deleteCollection("pqr", confirm = true)
    assert(!Files.exists(java.nio.file.Paths.get(PqIndex.metaPath(api.catalog, entry))))
  }

  test("IVF rebuild re-encodes an existing PQ index (no stale flat codes)") {
    val wh = Files.createTempDirectory("graft-wh").toString
    val api = new Api(spark, wh, new DeterministicHashEmbedder(32))
    import spark.implicits._
    api.createCollection("pqsync",
      documents = Some((0 until 60).map(i => s"sync doc $i w$i").toDF("content")))
    val entry = api.catalog.getCollection(api.catalog.physicalName("default", "pqsync"))
    // PQ first (flat: every code in cluster_id=0), centroids AFTER
    api.buildPqIndex("pqsync", m = 4, k = 4, iters = 0)
    assert(PqIndex.load(spark, api.catalog, entry)
      .select("cluster_id").distinct().collect().map(_.getLong(0)).toSet == Set(0L))
    api.buildAnnIndex("pqsync", nClusters = 4)
    // the codes must have re-partitioned under the new quantizer...
    val clusters = PqIndex.load(spark, api.catalog, entry)
      .select("cluster_id").distinct().collect().map(_.getLong(0)).toSet
    assert(clusters.size > 1, s"codes still flat after IVF build: $clusters")
    // ...so a delete keyed by CURRENT centroids removes the code row too
    val someId = api.catalog.readDocuments(entry)
      .select("id").orderBy("id").limit(1).collect()(0).getString(0)
    api.deleteDocuments("pqsync", Seq(someId))
    assert(PqIndex.load(spark, api.catalog, entry)
      .filter(col("id") === someId).count() == 0,
      "stale code row survived the delete")
    api.deleteCollection("pqsync", confirm = true)
  }

  test("residual quantization error beats raw encoding on clustered vectors") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    // 4 well-separated cluster centers + small noise: residuals concentrate
    // near 0, which is exactly where IVFADC spends its codebook budget
    val centers = (0 until 4).map(c => Array.fill(16)(rnd.nextGaussian() * 10f))
    val rows = (0 until 80).map { i =>
      val c = i % 4
      val v = centers(c).map(x => (x + rnd.nextGaussian() * 0.3).toFloat)
      (f"v$i%03d", v.toSeq, c.toLong)
    }
    val vecs = rows.toDF("id", "embedding", "cluster_id")
      .select(col("id"), col("embedding").cast("array<float>").as("embedding"),
        col("cluster_id"))
    val centroids = centers.zipWithIndex
      .map { case (c, i) => (i.toLong, c.toSeq) }.toDF("cluster_id", "centroid")
      .select(col("cluster_id"), col("centroid").cast("array<float>").as("centroid"))

    def reconstructionMse(train: org.apache.spark.sql.DataFrame): Double = {
      val cb = Pq.train(train.select("id", "embedding"), dim = 16, m = 4, k = 8, iters = 2)
      val codes = Pq.encode(train.select("id", "embedding"), 16, cb)
        .collect().map(r => r.getString(0) -> r.getSeq[Int](1)).toMap
      val orig = train.select("id", "embedding")
        .collect().map(r => r.getString(0) -> r.getSeq[Float](1)).toMap
      orig.map { case (id, v) =>
        val rec = codes(id).zipWithIndex.flatMap { case (code, j) => cb(j)(code) }
        v.zip(rec).map { case (x, y) => (x - y).toDouble * (x - y) }.sum / v.size
      }.sum / orig.size
    }
    val rawMse = reconstructionMse(vecs)
    val resMse = reconstructionMse(Pq.residualOf(vecs, centroids))
    assert(resMse < rawMse,
      s"residual quantization must beat raw on clustered data: $resMse vs $rawMse")
  }

  test("ADC shortlist ordering is deterministic and rerank equals brute force on a covering probe") {
    val wh = Files.createTempDirectory("graft-wh").toString
    val api = new Api(spark, wh, new DeterministicHashEmbedder(32))
    import spark.implicits._
    val docs = (0 until 120).map(i => s"cover doc $i w$i").toDF("content")
    api.createCollection("pqc", documents = Some(docs))
    api.buildPqIndex("pqc", m = 4, k = 16, iters = 1)
    val entry = api.catalog.getCollection(api.catalog.physicalName("default", "pqc"))
    val vectors = api.catalog.readDocuments(entry).select("id", "embedding", "norm")

    // without centroids every row is scanned (covering probe): an
    // oversample big enough to cover the corpus makes rerank == brute force
    val emb = new DeterministicHashEmbedder(32)
    val q = Seq(0 -> emb.embedQuery("cover doc 42 w42").toSeq)
    val pqTop = PqIndex.search(spark, api.catalog, entry, vectors, q,
      k = 5, numCandidates = 1000, oversample = 1000)
      .select("id").collect().map(_.getString(0)).toSeq
    val brute = graft.ann.Ann.bruteTopK(vectors, q, 5)
      .select("id").collect().map(_.getString(0)).toSeq
    assert(pqTop == brute, "covering-oversample PQ rerank must equal brute force")
    api.deleteCollection("pqc", confirm = true)
  }
}
