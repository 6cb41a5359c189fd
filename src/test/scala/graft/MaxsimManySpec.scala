package graft

import java.nio.file.Files
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col
import graft.ingest.DeterministicHashEmbedder
import graft.model.{ErrorCodes, GraftException}

/** Batched maxsim serving (`Api.maxsimSearchMany`, MCP
  * `vectorSearchMany` semanticMode="maxsim"): Q questions through ONE
  * candidate + rescore plan pair must return exactly the per-question
  * loop's results, per question, on every candidate route.
  */
class MaxsimManySpec extends SparkSpec {
  import spark.implicits._

  private def newApi(): Api = {
    val wh = Files.createTempDirectory("graft-wh-msm").toString
    new Api(spark, wh, new DeterministicHashEmbedder(16))
  }

  private def docsDf(is: Seq[Int]): DataFrame =
    is.map(i => s"document number $i covers topic t${i % 7} " +
        s"then topic u${i % 4} and trailing words w$i extra$i")
      .toDF("content")

  private val questions =
    Seq("topic words document", "trailing extra words", "document covers")

  /** Per-question slices of a batched response, attributed by the
    * `query_idx` metadata key (per-question counts can vary, so stride
    * slicing is wrong by design) and stripped of it for comparison with
    * the single-question route's hits.
    */
  private def byQuestion(res: Seq[HitRow]): Map[Int, Seq[HitRow]] =
    res.groupBy(_.metadata("query_idx").toInt)
      .view.mapValues(_.map(h => h.copy(metadata = h.metadata - "query_idx")))
      .toMap

  test("maxsimSearchMany == per-question loop on every candidate route") {
    val api = newApi()
    api.createCollection("m1", documents = Some(docsDf(0 until 40)))
    api.buildChunkIndex("m1", maxTokens = 6)
    api.buildAnnIndex("m1", nClusters = 4)
    api.buildChunkIvfIndex("m1")
    for (src <- Seq("chunk", "ivf", "chunkivf", "auto")) {
      val perQ = questions.map(q =>
        api.maxsimSearch("m1", q, nResults = 5, candidateSource = src).results)
      val many = api.maxsimSearchMany("m1", questions, nResults = 5,
        candidateSource = src).results
      assert(many.nonEmpty)
      // results arrive in question order...
      assert(many.map(_.metadata("query_idx").toInt) ==
        many.map(_.metadata("query_idx").toInt).sorted)
      // ...and each question's slice equals its single-question serve
      val grouped = byQuestion(many)
      perQ.zipWithIndex.foreach { case (exp, qi) =>
        assert(grouped.getOrElse(qi, Nil) == exp, s"route $src q$qi diverged")
      }
    }
    // chunk-trained quantizer serves the batch identically too
    api.buildChunkIvfIndex("m1", trainOn = "chunks", nClusters = 8)
    val perQCt = questions.map(q =>
      api.maxsimSearch("m1", q, nResults = 5, candidateSource = "chunkivf").results)
    val manyCt = byQuestion(api.maxsimSearchMany("m1", questions, nResults = 5,
      candidateSource = "chunkivf").results)
    perQCt.zipWithIndex.foreach { case (exp, qi) =>
      assert(manyCt.getOrElse(qi, Nil) == exp)
    }
  }

  test("maxsimSearchMany validation and governance match the single-question route") {
    val api = newApi()
    api.createCollection("m2", documents = Some(docsDf(0 until 10)))
    // request validation precedes index state
    assert(intercept[GraftException](
      api.maxsimSearchMany("m2", Seq.empty)).code
      == ErrorCodes.SearchQuestionInvalid)
    assert(intercept[GraftException](
      api.maxsimSearchMany("m2", Seq("ok", ""))).code
      == ErrorCodes.SearchQuestionInvalid)
    intercept[IllegalArgumentException] {
      api.maxsimSearchMany("m2", Seq("ok"), candidateSource = "graph")
    }
    // governed without an index, like the single-question route
    assert(intercept[GraftException](
      api.maxsimSearchMany("m2", Seq("topic words"))).code
      == ErrorCodes.AnnIndexNotFound)
  }

  test("metadata-filtered maxsim: fills k from the sub-corpus, identical across routes at full width") {
    val api = newApi()
    val docs = (0 until 36).map(i =>
      (s"document number $i covers topic t${i % 7} and words w$i",
        Map("tier" -> (if (i % 3 == 0) "gold" else "base"))))
      .toDF("content", "metadata")
    api.createCollection("mf", documents = Some(docs))
    api.buildChunkIndex("mf", maxTokens = 6)
    api.buildAnnIndex("mf", nClusters = 4)
    api.buildChunkIvfIndex("mf")
    val entry = api.catalog.getCollection(api.catalog.physicalName("default", "mf"))
    val goldIds = api.catalog.readDocuments(entry)
      .filter(col("metadata")("tier") === "gold")
      .select("id").collect().map(_.getString(0)).toSet
    assert(goldIds.size == 12)
    val where = Some(col("metadata")("tier") === "gold")
    for (src <- Seq("chunk", "ivf", "chunkivf")) {
      // k = 8 of 12 qualifying docs: an unfiltered top-8 post-filtered
      // would under-fill; the pushdown must return 8 gold docs
      val res = api.maxsimSearch("mf", "topic words document", nResults = 8,
        perTokenT = 10000, candidateSource = src, where = where)
      assert(res.results.size == 8, s"route $src under-filled")
      assert(res.results.forall(h => goldIds.contains(h.id)), s"route $src leaked")
    }
    // at full candidate width every route equals exact maxsim over the
    // SUB-corpus chunk rows
    val exactIds = {
      val emb = new DeterministicHashEmbedder(16)
      val qdf = emb.embedBatch(Seq("topic", "words", "document")).zipWithIndex
        .map { case (v, i) =>
          val n = math.sqrt(v.map(x => x.toDouble * x.toDouble).sum)
          (0, i, v.map(x => (x / n).toFloat).toSeq)
        }.toDF("query_idx", "tok_idx", "vec")
      graft.search.MaxSim.topK(
          graft.search.ChunkIndex.load(spark, api.catalog, entry)
            .filter(col("id").isin(goldIds.toSeq: _*))
            .select(col("id").as("doc_id"), col("vec")), qdf, k = 8)
        .collect().map(_.getString(1)).toSeq
    }
    val served = api.maxsimSearch("mf", "topic words document", nResults = 8,
      perTokenT = 10000, candidateSource = "chunkivf", where = where)
    assert(served.results.map(_.id) == exactIds)
    // the batched route filters identically
    val many = api.maxsimSearchMany("mf", questions, nResults = 4, where = where)
    assert(many.results.nonEmpty && many.results.forall(h => goldIds.contains(h.id)))
  }

  test("searchIndexedMany == per-question searchIndexed loop across the mode matrix") {
    val api = newApi()
    api.createCollection("m4", documents = Some(docsDf(0 until 30)))
    api.buildChunkIndex("m4", maxTokens = 6)
    api.buildAnnIndex("m4", nClusters = 4)
    api.buildLexicalIndex("m4")
    api.buildLshIndex("m4")
    api.buildPqIndex("m4")
    val modes = Seq(
      ("approx", "bm25_indexed"), ("maxsim", "indexed"),
      ("lsh", "bm25_indexed"), ("pq", "indexed"), ("exact", "bm25"))
    for ((sm, lm) <- modes) {
      val perQ = questions.map(q => api.searchIndexed("m4", q,
        numberResults = 4, semanticMode = sm, lexicalMode = lm).results)
      val many = byQuestion(api.searchIndexedMany("m4", questions,
        numberResults = 4, semanticMode = sm, lexicalMode = lm).results)
      perQ.zipWithIndex.foreach { case (exp, qi) =>
        assert(many.getOrElse(qi, Nil) == exp, s"modes ($sm, $lm) q$qi diverged")
      }
    }
    // unknown modes governed like the per-question route
    assert(intercept[GraftException](api.searchIndexedMany("m4", questions,
      semanticMode = "graph")).code == ErrorCodes.SearchActionInvalid)
    assert(intercept[GraftException](api.searchIndexedMany("m4", questions,
      lexicalMode = "phrase")).code == ErrorCodes.SearchActionInvalid)
    // MCP batched search action routes index-backed modes through it
    val surface = new McpSurface(api)
    val viaMcp = surface.vectorSearchMany("search", "m4", questions,
      numberResults = 4, semanticMode = "maxsim", lexicalMode = "bm25_indexed")
    val direct = api.searchIndexedMany("m4", questions, numberResults = 4,
      semanticMode = "maxsim", lexicalMode = "bm25_indexed")
    assert(viaMcp("results").asInstanceOf[Seq[Map[String, Any]]]
      .map(m => (m("id"), m("score"))) ==
      direct.results.map(h => (h.id, h.score)))
  }

  test("MCP vectorSearchMany routes the maxsim mode to the batched serve") {
    val api = newApi()
    api.createCollection("m3", documents = Some(docsDf(0 until 25)))
    api.buildChunkIndex("m3", maxTokens = 6)
    val surface = new McpSurface(api)
    val viaMcp = surface.vectorSearchMany("semantic_search", "m3",
      questions, numberResults = 4, semanticMode = "maxsim")
    val direct = api.maxsimSearchMany("m3", questions, nResults = 4)
    val mcpRows = viaMcp("results").asInstanceOf[Seq[Map[String, Any]]]
    assert(mcpRows.map(m => (m("id"), m("score"))) ==
      direct.results.map(h => (h.id, h.score)))
    // unknown mode is governed like an unknown action
    assert(intercept[GraftException](
      surface.vectorSearchMany("semantic_search", "m3", questions,
        semanticMode = "diverse")).code == ErrorCodes.SearchActionInvalid)
    // the hybrid action routes to the fused batch plan
    val fused = surface.vectorSearchMany("search", "m3", questions.take(2))
    assert(fused("results").asInstanceOf[Seq[Map[String, Any]]].nonEmpty)
  }

  test("reserved response keys: stored metadata carrying them neither throws nor shadows") {
    val api = newApi()
    // documents whose OWN metadata already uses the engine's reserved
    // response keys — under the default mapKeyDedupPolicy=EXCEPTION a
    // plain map_concat would throw at serialize time, and under LAST_WIN
    // the stored value could corrupt attribution
    val docs = (0 until 12).map(i =>
        (s"document number $i covers topic t${i % 5} alpha beta words w$i",
          Map("query_idx" -> "999", "snippet" -> "user-owned", "keep" -> s"v$i")))
      .toDF("content", "metadata")
    api.createCollection("mr", documents = Some(docs))
    api.buildChunkIndex("mr", maxTokens = 6)
    val many = api.maxsimSearchMany("mr", questions, nResults = 4)
    assert(many.results.nonEmpty)
    // the engine's attribution wins; a non-reserved stored key survives
    assert(many.results.forall(h => h.metadata("query_idx").toInt < questions.size))
    assert(many.results.forall(h => h.metadata("keep").startsWith("v")))
    // the phrase route's snippet/phrase_tf keys are reserved the same way
    val ph = api.phraseSearch("mr", "alpha beta", nResults = 3)
    assert(ph.results.nonEmpty)
    assert(ph.results.forall(h => h.metadata("snippet").contains("alpha beta")))
    // the batched hybrid serializes through the same guarded concat
    api.buildLexicalIndex("mr")
    val hyb = api.searchIndexedMany("mr", questions, numberResults = 3,
      semanticMode = "exact")
    assert(hyb.results.nonEmpty &&
      hyb.results.forall(h => h.metadata("query_idx").toInt < questions.size))
  }
}
