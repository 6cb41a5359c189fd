package graft

import java.nio.file.Files
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.ingest.DeterministicHashEmbedder
import graft.model.GraftException
import graft.search.{ChunkIndex, MaxSim}

/** Persistent chunk-vector (late-interaction) index: write-path
  * incremental maintenance row-identical to a full rebuild, delete
  * hygiene, and maxsim serving from persisted state equal to the
  * operator over freshly-derived chunk vectors.
  */
class ChunkIndexSpec extends SparkSpec {
  import spark.implicits._

  private val MaxTok = 6

  private def newApi(): Api = {
    val wh = Files.createTempDirectory("graft-wh-chunk").toString
    new Api(spark, wh, new DeterministicHashEmbedder(16))
  }

  private def docsDf(is: Seq[Int]): DataFrame =
    is.map(i => s"document number $i talks about topic t${i % 5} " +
        s"and later about other topic u${i % 3} with trailing words w$i")
      .toDF("content")

  private def rows(df: DataFrame): Seq[(String, Int, Seq[Float])] =
    df.select("id", "chunk_idx", "vec").collect()
      .map(r => (r.getString(0), r.getInt(1), r.getSeq[Float](2)))
      .sortBy(x => (x._1, x._2)).toSeq

  test("write-path upsert and delete keep the chunk index rebuild-identical") {
    val api = newApi()
    api.createCollection("c1", documents = Some(docsDf(0 until 20)))
    val entry = api.catalog.getCollection(api.catalog.physicalName("default", "c1"))
    val emb = new DeterministicHashEmbedder(16)
    ChunkIndex.build(spark, api.catalog, entry, emb, MaxTok)
    // build == indexRows over the table (the definitional identity)
    def rebuilt() = rows(ChunkIndex.indexRows(
      api.catalog.readDocuments(entry).select("id", "content"), emb, MaxTok))
    assert(rows(ChunkIndex.load(spark, api.catalog, entry)) == rebuilt())
    // upsert: only the batch's buckets rewrite, result == rebuild
    assert(api.addDocuments("c1", docsDf(20 until 26)) == 6)
    val afterUpsert = rows(ChunkIndex.load(spark, api.catalog, entry))
    assert(afterUpsert == rebuilt())
    assert(afterUpsert.map(_._1).distinct.size == 26)
    // multi-chunk docs really exist (maxTokens 6 splits every doc)
    assert(afterUpsert.groupBy(_._1).values.exists(_.size > 1))
    // delete: the doc's chunk rows disappear, still rebuild-identical
    val victim = afterUpsert.head._1
    api.deleteDocuments("c1", Seq(victim))
    val afterDelete = rows(ChunkIndex.load(spark, api.catalog, entry))
    assert(afterDelete == rebuilt())
    assert(!afterDelete.exists(_._1 == victim))
  }

  test("maxsim serving from persisted state equals the operator at full candidate width") {
    val api = newApi()
    api.createCollection("c2", documents = Some(docsDf(0 until 30)))
    val entry = api.catalog.getCollection(api.catalog.physicalName("default", "c2"))
    val emb = new DeterministicHashEmbedder(16)
    ChunkIndex.build(spark, api.catalog, entry, emb, MaxTok)
    // T wide enough to shortlist everything -> search == exact maxsim
    val served = ChunkIndex.search(spark, api.catalog, entry, emb,
        Seq(0 -> "topic words document"), k = 8, perTokenT = 1000)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getDouble(2))).toSeq
    val toks = Seq("topic", "words", "document")
    val qdf = emb.embedBatch(toks).zipWithIndex.map { case (v, i) =>
      val n = math.sqrt(v.map(x => x.toDouble * x.toDouble).sum)
      (0, i, v.map(x => (x / n).toFloat).toSeq)
    }.toDF("query_idx", "tok_idx", "vec")
    val chunkVecs = ChunkIndex.load(spark, api.catalog, entry)
      .select(col("id").as("doc_id"), col("vec"))
    val exact = MaxSim.topK(chunkVecs, qdf, k = 8)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getDouble(2))).toSeq
    assert(served.nonEmpty && served.sortBy(_._2) == exact.sortBy(_._2))
    // scores descend and respect k
    assert(served.size <= 8)
    assert(served.map(_._3).sliding(2).forall {
      case Seq(a, b) => a >= b; case _ => true })
  }

  test("ANN-pruned serving: full width == exact maxsim; Api routes on candidateSource") {
    val api = newApi()
    api.createCollection("c7", documents = Some(docsDf(0 until 30)))
    val entry = api.catalog.getCollection(api.catalog.physicalName("default", "c7"))
    val emb = new DeterministicHashEmbedder(16)
    ChunkIndex.build(spark, api.catalog, entry, emb, MaxTok)
    // candidateSource="ivf" without a doc-level IVF index is governed
    val exI = intercept[GraftException] {
      api.maxsimSearch("c7", "topic words", nResults = 5, candidateSource = "ivf")
    }
    assert(exI.code == graft.model.ErrorCodes.AnnIndexNotFound)
    // auto without an IVF index == the chunk route
    val viaAuto = api.maxsimSearch("c7", "topic words document", nResults = 6)
    val viaChunk = api.maxsimSearch("c7", "topic words document", nResults = 6,
      candidateSource = "chunk")
    assert(viaAuto.results == viaChunk.results)
    intercept[IllegalArgumentException] {
      api.maxsimSearch("c7", "topic", nResults = 5, candidateSource = "nope")
    }
    // build the doc-level IVF: auto now routes through the ANN candidates
    api.buildAnnIndex("c7", nClusters = 4)
    // at full shortlist width the ANN route's union covers every probed
    // doc and numCandidates covers every cluster -> exact maxsim rows
    val served = ChunkIndex.searchAnn(spark, api.catalog, entry, emb,
        Seq(0 -> "topic words document"), k = 6, perTokenT = 1000)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getDouble(2))).toSeq
    val toks = Seq("topic", "words", "document")
    val qdf = emb.embedBatch(toks).zipWithIndex.map { case (v, i) =>
      val n = math.sqrt(v.map(x => x.toDouble * x.toDouble).sum)
      (0, i, v.map(x => (x / n).toFloat).toSeq)
    }.toDF("query_idx", "tok_idx", "vec")
    val exact = MaxSim.topK(
        ChunkIndex.load(spark, api.catalog, entry)
          .select(col("id").as("doc_id"), col("vec")), qdf, k = 6)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getDouble(2))).toSeq
    assert(served.nonEmpty && served.sortBy(_._2) == exact.sortBy(_._2))
    // the governed auto route serves end to end through the ANN leg
    val viaIvf = api.maxsimSearch("c7", "topic words document", nResults = 6,
      candidateSource = "ivf")
    val autoNow = api.maxsimSearch("c7", "topic words document", nResults = 6)
    assert(viaIvf.results == autoNow.results && viaIvf.results.nonEmpty)
  }

  test("chunk-level IVF: governed builds, rebuild-identical maintenance, exact at full width, auto routing") {
    val api = newApi()
    api.createCollection("c8", documents = Some(docsDf(0 until 30)))
    val entry = api.catalog.getCollection(api.catalog.physicalName("default", "c8"))
    val emb = new DeterministicHashEmbedder(16)
    // both prerequisites are governed, in either missing order
    assert(intercept[GraftException](api.buildChunkIvfIndex("c8")).code
      == graft.model.ErrorCodes.AnnIndexNotFound)
    api.buildChunkIndex("c8", MaxTok)
    assert(intercept[GraftException](api.buildChunkIvfIndex("c8")).code
      == graft.model.ErrorCodes.AnnIndexNotFound)
    api.buildAnnIndex("c8", nClusters = 4)
    assert(api.buildChunkIvfIndex("c8") > 30) // multi-chunk corpus
    import graft.search.ChunkIvfIndex
    def rowsIvf(df: DataFrame): Seq[(String, Long, Seq[Float])] =
      df.select("id", "cluster_id", "embedding").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getSeq[Float](2)))
        .sortBy(_._1).toSeq
    def rebuilt() = rowsIvf(ChunkIvfIndex.indexRows(
      ChunkIndex.load(spark, api.catalog, entry),
      graft.ann.IvfIndex.loadCentroids(spark, api.catalog, entry)))
    assert(rowsIvf(ChunkIvfIndex.load(spark, api.catalog, entry)) == rebuilt())
    // upsert: only the touched clusters rewrite, result == rebuild
    api.addDocuments("c8", docsDf(30 until 36))
    val afterUpsert = rowsIvf(ChunkIvfIndex.load(spark, api.catalog, entry))
    assert(afterUpsert == rebuilt())
    assert(afterUpsert.map(_._1.split("#")(0)).distinct.size == 36)
    // delete: the doc's chunk rows leave every cluster, still rebuild-identical
    val victim = afterUpsert.head._1.split("#")(0)
    api.deleteDocuments("c8", Seq(victim))
    val afterDelete = rowsIvf(ChunkIvfIndex.load(spark, api.catalog, entry))
    assert(afterDelete == rebuilt())
    assert(!afterDelete.exists(_._1.startsWith(victim + "#")))
    // serving at full width probes everything -> exact maxsim rows
    val served = ChunkIndex.searchChunkIvf(spark, api.catalog, entry, emb,
        Seq(0 -> "topic words document"), k = 6, perTokenT = 10000)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getDouble(2))).toSeq
    val toks = Seq("topic", "words", "document")
    val qdf = emb.embedBatch(toks).zipWithIndex.map { case (v, i) =>
      val n = math.sqrt(v.map(x => x.toDouble * x.toDouble).sum)
      (0, i, v.map(x => (x / n).toFloat).toSeq)
    }.toDF("query_idx", "tok_idx", "vec")
    val exact = MaxSim.topK(
        ChunkIndex.load(spark, api.catalog, entry)
          .select(col("id").as("doc_id"), col("vec")), qdf, k = 6)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getDouble(2))).toSeq
    assert(served.nonEmpty && served.sortBy(_._2) == exact.sortBy(_._2))
    // auto routing now prefers the chunk-level index
    val auto = api.maxsimSearch("c8", "topic words document", nResults = 6)
    val forced = api.maxsimSearch("c8", "topic words document", nResults = 6,
      candidateSource = "chunkivf")
    assert(auto.results == forced.results && auto.results.nonEmpty)
    // rebuilding the quantizer re-assigns the chunk-level index too
    api.buildAnnIndex("c8", nClusters = 2)
    assert(rowsIvf(ChunkIvfIndex.load(spark, api.catalog, entry)) == rebuilt())
    // RE-CHUNKING re-derives it too: the sidecar is a function of the
    // chunk rows, and a stale one would desync maintenance permanently
    api.buildChunkIndex("c8", MaxTok + 2)
    assert(rowsIvf(ChunkIvfIndex.load(spark, api.catalog, entry)) == rebuilt())
    assert(api.maxsimSearch("c8", "topic words", nResults = 3,
      candidateSource = "chunkivf").results.nonEmpty)
  }

  test("chunk-trained quantizer: own sidecar, doc-IVF-independent, rebuild-identical maintenance") {
    val api = newApi()
    api.createCollection("c11", documents = Some(docsDf(0 until 30)))
    val entry = api.catalog.getCollection(api.catalog.physicalName("default", "c11"))
    val emb = new DeterministicHashEmbedder(16)
    import graft.search.ChunkIvfIndex
    // governed: chunk-trained still needs the chunk index...
    assert(intercept[GraftException](
      api.buildChunkIvfIndex("c11", trainOn = "chunks", nClusters = 4)).code
      == graft.model.ErrorCodes.AnnIndexNotFound)
    api.buildChunkIndex("c11", MaxTok)
    // ...but NOT the doc-level IVF: the quantizer is its own
    assert(api.buildChunkIvfIndex("c11", trainOn = "chunks", nClusters = 4) > 30)
    assert(ChunkIvfIndex.hasOwnCentroids(api.catalog, entry))
    def rowsIvf(): Seq[(String, Long)] =
      ChunkIvfIndex.load(spark, api.catalog, entry)
        .select("id", "cluster_id").collect()
        .map(r => (r.getString(0), r.getLong(1))).sortBy(_._1).toSeq
    def rebuilt(): Seq[(String, Long)] =
      ChunkIvfIndex.indexRows(
          ChunkIndex.load(spark, api.catalog, entry),
          ChunkIvfIndex.quantizer(spark, api.catalog, entry))
        .select("id", "cluster_id").collect()
        .map(r => (r.getString(0), r.getLong(1))).sortBy(_._1).toSeq
    assert(rowsIvf() == rebuilt())
    // auto routing serves the chunkivf route with no doc-level IVF at all
    val auto = api.maxsimSearch("c11", "topic words document", nResults = 6)
    val forced = api.maxsimSearch("c11", "topic words document", nResults = 6,
      candidateSource = "chunkivf")
    assert(auto.results == forced.results && auto.results.nonEmpty)
    // serving at full width == exact maxsim over the chunk rows
    val served = ChunkIndex.searchChunkIvf(spark, api.catalog, entry, emb,
        Seq(0 -> "topic words document"), k = 6, perTokenT = 10000)
      .collect().map(r => (r.getString(1), r.getDouble(2))).sortBy(_._1).toSeq
    val qdf = emb.embedBatch(Seq("topic", "words", "document")).zipWithIndex
      .map { case (v, i) =>
        val n = math.sqrt(v.map(x => x.toDouble * x.toDouble).sum)
        (0, i, v.map(x => (x / n).toFloat).toSeq)
      }.toDF("query_idx", "tok_idx", "vec")
    val exact = MaxSim.topK(
        ChunkIndex.load(spark, api.catalog, entry)
          .select(col("id").as("doc_id"), col("vec")), qdf, k = 6)
      .collect().map(r => (r.getString(1), r.getDouble(2))).sortBy(_._1).toSeq
    assert(served.nonEmpty && served == exact)
    // write-path maintenance stays rebuild-identical under the frozen
    // own quantizer
    api.addDocuments("c11", docsDf(30 until 34))
    assert(rowsIvf() == rebuilt())
    val victim = rowsIvf().head._1.split("#")(0)
    api.deleteDocuments("c11", Seq(victim))
    assert(rowsIvf() == rebuilt())
    // a doc-IVF (re)build leaves a chunk-trained index UNTOUCHED — its
    // quantizer is independent, so no invalidate, no re-assign
    val before = rowsIvf()
    api.buildAnnIndex("c11", nClusters = 3)
    assert(ChunkIvfIndex.exists(api.catalog, entry))
    assert(ChunkIvfIndex.hasOwnCentroids(api.catalog, entry))
    assert(rowsIvf() == before)
    // a re-chunk re-derives the index under the SAME frozen quantizer
    api.buildChunkIndex("c11", MaxTok + 2)
    assert(ChunkIvfIndex.hasOwnCentroids(api.catalog, entry))
    assert(rowsIvf() == rebuilt())
    // explicit switch back to doc-aligned drops the own sidecar and keys
    // on the doc centroids again
    api.buildChunkIvfIndex("c11", trainOn = "doc")
    assert(!ChunkIvfIndex.hasOwnCentroids(api.catalog, entry))
    assert(rowsIvf() == rebuilt())
    intercept[IllegalArgumentException] {
      api.buildChunkIvfIndex("c11", trainOn = "tokens")
    }
    // nClusters = 0 auto-sizes the quantizer: ~sqrt(chunk rows), floor 16
    api.buildChunkIvfIndex("c11", trainOn = "chunks", nClusters = 0)
    val nChunks = ChunkIndex.load(spark, api.catalog, entry).count()
    val expectedK = math.max(16, math.ceil(math.sqrt(nChunks.toDouble)).toInt)
    assert(ChunkIvfIndex.quantizer(spark, api.catalog, entry).count() == expectedK)
  }

  test("residual-PQ chunk codes: governed builds, rebuild-identical maintenance, exact at full width, auto routing") {
    val api = newApi()
    api.createCollection("c12", documents = Some(docsDf(0 until 30)))
    val entry = api.catalog.getCollection(api.catalog.physicalName("default", "c12"))
    val emb = new DeterministicHashEmbedder(16)
    import graft.search.ChunkPqIndex
    // both prerequisites are governed, in either missing order
    assert(intercept[GraftException](api.buildChunkPqIndex("c12")).code
      == graft.model.ErrorCodes.AnnIndexNotFound)
    api.buildChunkIndex("c12", MaxTok)
    assert(intercept[GraftException](api.buildChunkPqIndex("c12")).code
      == graft.model.ErrorCodes.AnnIndexNotFound)
    api.buildAnnIndex("c12", nClusters = 4)
    assert(api.buildChunkPqIndex("c12", m = 4, k = 8) > 30)
    assert(ChunkPqIndex.usable(api.catalog, entry))
    def rowsPq(df: DataFrame): Seq[(String, Seq[Int], Long)] =
      df.select("id", "codes", "cluster_id").collect()
        .map(r => (r.getString(0), r.getSeq[Int](1), r.getLong(2)))
        .sortBy(_._1).toSeq
    def rebuilt(): Seq[(String, Seq[Int], Long)] = rowsPq(
      ChunkPqIndex.encodeChunkRows(spark, api.catalog, entry,
        ChunkIndex.load(spark, api.catalog, entry),
        ChunkPqIndex.loadCodebooks(spark, api.catalog, entry).get))
    assert(rowsPq(ChunkPqIndex.load(spark, api.catalog, entry)) == rebuilt())
    // every chunk row carries m=4 codes
    assert(rowsPq(ChunkPqIndex.load(spark, api.catalog, entry))
      .forall(_._2.size == 4))
    // upsert: only the touched clusters re-encode, result == rebuild
    api.addDocuments("c12", docsDf(30 until 36))
    val afterUpsert = rowsPq(ChunkPqIndex.load(spark, api.catalog, entry))
    assert(afterUpsert == rebuilt())
    assert(afterUpsert.map(_._1.split("#")(0)).distinct.size == 36)
    // delete: the doc's coded rows leave every cluster, still identical
    val victim = afterUpsert.head._1.split("#")(0)
    api.deleteDocuments("c12", Seq(victim))
    val afterDelete = rowsPq(ChunkPqIndex.load(spark, api.catalog, entry))
    assert(afterDelete == rebuilt())
    assert(!afterDelete.exists(_._1.startsWith(victim + "#")))
    // serving at full width probes everything and shortlists every doc ->
    // the exact maxsim rows (the ADC approximation only ORDERS candidates;
    // at full width the shortlist is the corpus and rescore is exact)
    val served = ChunkIndex.searchCpq(spark, api.catalog, entry, emb,
        Seq(0 -> "topic words document"), k = 6, perTokenT = 10000)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getDouble(2))).toSeq
    val qdf = emb.embedBatch(Seq("topic", "words", "document")).zipWithIndex
      .map { case (v, i) =>
        val n = math.sqrt(v.map(x => x.toDouble * x.toDouble).sum)
        (0, i, v.map(x => (x / n).toFloat).toSeq)
      }.toDF("query_idx", "tok_idx", "vec")
    val exact = MaxSim.topK(
        ChunkIndex.load(spark, api.catalog, entry)
          .select(col("id").as("doc_id"), col("vec")), qdf, k = 6)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getDouble(2))).toSeq
    assert(served.nonEmpty && served.sortBy(_._2) == exact.sortBy(_._2))
    // auto routing now prefers the compressed route
    val auto = api.maxsimSearch("c12", "topic words document", nResults = 6)
    val forced = api.maxsimSearch("c12", "topic words document", nResults = 6,
      candidateSource = "cpq")
    assert(auto.results == forced.results && auto.results.nonEmpty)
    // rebuilding the doc-level quantizer re-encodes the codes (frozen
    // codebooks, new residual basis)
    api.buildAnnIndex("c12", nClusters = 2)
    assert(rowsPq(ChunkPqIndex.load(spark, api.catalog, entry)) == rebuilt())
    // re-chunking re-derives them too
    api.buildChunkIndex("c12", MaxTok + 2)
    assert(rowsPq(ChunkPqIndex.load(spark, api.catalog, entry)) == rebuilt())
    // a chunk-quantizer retrain re-encodes under the NEW quantizer
    api.buildChunkIvfIndex("c12", trainOn = "chunks", nClusters = 8)
    assert(rowsPq(ChunkPqIndex.load(spark, api.catalog, entry)) == rebuilt())
    // ...and a doc-IVF rebuild now leaves the chunk-trained-keyed codes
    // untouched (their quantizer is the own sidecar)
    val before = rowsPq(ChunkPqIndex.load(spark, api.catalog, entry))
    api.buildAnnIndex("c12", nClusters = 3)
    assert(rowsPq(ChunkPqIndex.load(spark, api.catalog, entry)) == before)
    // batched serving equals the per-question loop on the cpq route
    val qs = Seq("topic words document", "trailing words")
    val perQ = qs.map(q => api.maxsimSearch("c12", q, nResults = 4,
      candidateSource = "cpq").results)
    val many = api.maxsimSearchMany("c12", qs, nResults = 4,
      candidateSource = "cpq").results
    val grouped = many.groupBy(_.metadata("query_idx").toInt)
      .view.mapValues(_.map(h => h.copy(metadata = h.metadata - "query_idx"))).toMap
    perQ.zipWithIndex.foreach { case (exp, qi) =>
      assert(grouped.getOrElse(qi, Nil) == exp)
    }
  }

  test("a crash between a parent rebuild and the chunk-PQ re-encode reads as codes-absent") {
    val api = newApi()
    api.createCollection("c13", documents = Some(docsDf(0 until 24)))
    val entry = api.catalog.getCollection(api.catalog.physicalName("default", "c13"))
    val emb = new DeterministicHashEmbedder(16)
    api.buildChunkIndex("c13", MaxTok)
    api.buildAnnIndex("c13", nClusters = 4)
    api.buildChunkPqIndex("c13")
    import graft.search.ChunkPqIndex
    // the crash window: parents invalidate the codes FIRST, rewrite, then
    // re-encode — a crash right after the parent rewrite leaves this state
    ChunkPqIndex.invalidate(api.catalog, entry)
    ChunkIndex.build(spark, api.catalog, entry, emb, MaxTok + 2)
    assert(!ChunkPqIndex.usable(api.catalog, entry))
    // auto falls back (never serves torn codes); forcing cpq is governed
    val auto = api.maxsimSearch("c13", "topic words document", nResults = 5)
    val ivf = api.maxsimSearch("c13", "topic words document", nResults = 5,
      candidateSource = "ivf")
    assert(auto.results == ivf.results && auto.results.nonEmpty)
    assert(intercept[GraftException](api.maxsimSearch("c13", "topic words",
      nResults = 3, candidateSource = "cpq")).code
      == graft.model.ErrorCodes.AnnIndexNotFound)
    // maintenance skips the absent codes instead of desyncing them
    api.addDocuments("c13", docsDf(24 until 27))
    assert(!ChunkPqIndex.usable(api.catalog, entry))
    // explicit rebuild repairs
    assert(api.buildChunkPqIndex("c13") > 24)
    assert(ChunkPqIndex.usable(api.catalog, entry))
    assert(api.maxsimSearch("c13", "topic words", nResults = 3,
      candidateSource = "cpq").results.nonEmpty)
  }

  test("a crash between a parent rebuild and the chunk-IVF re-derive reads as index-absent") {
    val api = newApi()
    api.createCollection("c10", documents = Some(docsDf(0 until 24)))
    val entry = api.catalog.getCollection(api.catalog.physicalName("default", "c10"))
    val emb = new DeterministicHashEmbedder(16)
    api.buildChunkIndex("c10", MaxTok)
    api.buildAnnIndex("c10", nClusters = 4)
    api.buildChunkIvfIndex("c10")
    import graft.search.ChunkIvfIndex
    // simulate the crash window: buildChunkIndex/buildAnnIndex invalidate
    // the sidecar FIRST, then rewrite the parent, then re-derive — a crash
    // right after the parent rewrite leaves exactly this state
    ChunkIvfIndex.invalidate(api.catalog, entry)
    ChunkIndex.build(spark, api.catalog, entry, emb, MaxTok + 2)
    assert(!ChunkIvfIndex.exists(api.catalog, entry))
    // serving: auto falls back to the doc-level IVF route (never the torn
    // sidecar); forcing chunkivf is governed
    val auto = api.maxsimSearch("c10", "topic words document", nResults = 5)
    val ivf = api.maxsimSearch("c10", "topic words document", nResults = 5,
      candidateSource = "ivf")
    assert(auto.results == ivf.results && auto.results.nonEmpty)
    assert(intercept[GraftException](api.maxsimSearch("c10", "topic words",
      nResults = 3, candidateSource = "chunkivf")).code
      == graft.model.ErrorCodes.AnnIndexNotFound)
    // maintenance skips the absent index instead of desyncing it
    api.addDocuments("c10", docsDf(24 until 27))
    assert(!ChunkIvfIndex.exists(api.catalog, entry))
    // explicit rebuild repairs, and the result is rebuild-identical
    api.buildChunkIvfIndex("c10")
    def rowsIvf(df: DataFrame): Seq[(String, Long)] =
      df.select("id", "cluster_id").collect()
        .map(r => (r.getString(0), r.getLong(1))).sortBy(_._1).toSeq
    assert(rowsIvf(ChunkIvfIndex.load(spark, api.catalog, entry)) ==
      rowsIvf(ChunkIvfIndex.indexRows(
        ChunkIndex.load(spark, api.catalog, entry),
        graft.ann.IvfIndex.loadCentroids(spark, api.catalog, entry))))
  }

  test("collection delete takes EVERY sidecar: a same-name re-create cannot resurrect a stale chunk index") {
    val api = newApi()
    api.createCollection("c9", documents = Some(docsDf(0 until 12)))
    api.buildChunkIndex("c9", MaxTok)
    api.buildAnnIndex("c9", nClusters = 2)
    api.buildChunkIvfIndex("c9")
    val entry = api.catalog.getCollection(api.catalog.physicalName("default", "c9"))
    val table = java.nio.file.Paths.get(api.catalog.tablePath(entry))
    api.deleteCollection("c9", confirm = true)
    // nothing with the table's prefix survives (enumerated suffix lists
    // leaked the chunk index before — the recreate would have served the
    // previous incarnation's rows)
    val leftovers = java.nio.file.Files.list(table.getParent)
      .toArray.map(_.toString)
      .filter(_.contains(table.getFileName.toString))
    assert(leftovers.isEmpty, s"sidecars survived the delete: ${leftovers.toSeq}")
    api.createCollection("c9", documents = Some(docsDf(20 until 25)))
    val ex = intercept[GraftException] {
      api.maxsimSearch("c9", "topic words", nResults = 3)
    }
    assert(ex.code == graft.model.ErrorCodes.AnnIndexNotFound)
  }

  test("serving pins nothing: getPersistentRDDs unchanged by a maxsim serve") {
    val api = newApi()
    api.createCollection("c5", documents = Some(docsDf(0 until 25)))
    api.buildChunkIndex("c5", MaxTok)
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val res = api.maxsimSearch("c5", "topic words document", nResults = 5)
    assert(res.results.nonEmpty)
    // the serve recomputes its shortlist rescore from the candidate join —
    // no checkpoint/persist survives (or is even created): executor-loss
    // tolerant and storage-free at any corpus size
    assert(spark.sparkContext.getPersistentRDDs.keySet == before)
  }

  test("a chunk index without its meta sidecar fails the write loudly") {
    val api = newApi()
    api.createCollection("c6", documents = Some(docsDf(0 until 10)))
    val entry = api.catalog.getCollection(api.catalog.physicalName("default", "c6"))
    api.buildChunkIndex("c6", MaxTok)
    // meta is written BEFORE the index data, so only external damage can
    // produce index-without-meta — and then maintenance must refuse to
    // write (a silent skip would serve stale maxsim rows forever)
    graft.catalog.PartitionedTable.deleteDir(
      java.nio.file.Paths.get(ChunkIndex.metaPath(api.catalog, entry)))
    val ex = intercept[IllegalArgumentException] {
      api.addDocuments("c6", docsDf(10 until 12))
    }
    assert(ex.getMessage.contains("meta sidecar"))
    // rebuild repairs: meta restored, writes flow again
    api.buildChunkIndex("c6", MaxTok)
    assert(api.addDocuments("c6", docsDf(10 until 12)) == 2)
  }

  test("Api.maxsimSearch: governed without an index, serves with one") {
    val api = newApi()
    api.createCollection("c3", documents = Some(docsDf(0 until 12)))
    val ex = intercept[GraftException] {
      api.maxsimSearch("c3", "topic words", nResults = 5)
    }
    assert(ex.code == graft.model.ErrorCodes.AnnIndexNotFound)
    // request validation precedes index state: an invalid question on an
    // UNINDEXED collection reports the question error, never the index
    val exQ = intercept[GraftException] {
      api.maxsimSearch("c3", "", nResults = 5)
    }
    assert(exQ.code == graft.model.ErrorCodes.SearchQuestionInvalid)
    intercept[IllegalArgumentException] {
      api.maxsimSearch("c3", "topic", nResults = 5, perTokenT = 0)
    }
    assert(api.buildChunkIndex("c3", MaxTok) > 12) // multi-chunk corpus
    val res = api.maxsimSearch("c3", "topic words", nResults = 5)
    assert(res.results.size == 5)
    assert(res.results.forall(_.content.nonEmpty))
    assert(res.results.map(_.score).sliding(2).forall {
      case Seq(a, b) => a >= b; case _ => true })
  }
}
