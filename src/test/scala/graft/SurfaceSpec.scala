package graft

import java.nio.file.{Files, Paths}
import graft.ingest.{DeterministicHashEmbedder, DocumentInputs, Loaders}
import graft.model.{ErrorCodes, GraftException}
import graft.retriever.Retriever

/** Contract tests for the outer surfaces: path confinement
  * (tests/test_document_inputs.py matrix), file loaders, retriever
  * protocol, MCP action routing (tests/test_mcp_server.py semantics).
  */
class SurfaceSpec extends SparkSpec {

  private def tempRoot() = {
    val root = Files.createTempDirectory("graft-docs")
    Files.writeString(root.resolve("a.txt"), "alpha document text")
    Files.createDirectory(root.resolve("sub"))
    Files.writeString(root.resolve("sub/b.txt"), "beta document text")
    root
  }

  test("path confinement: rejection matrix") {
    val root = tempRoot().toString
    def reject(path: String): Unit = {
      val e = intercept[IllegalArgumentException](
        DocumentInputs.resolveDocumentInputs(root, includeConfiguredDirectory = false,
          relativePaths = Seq(path)))
      assert(e.getMessage.nonEmpty, s"expected rejection for $path")
    }
    reject("/etc/passwd")              // absolute
    reject("C:/windows/system32")      // windows drive
    reject("..")                       // traversal
    reject("sub/../../x")              // nested traversal
    reject("http://host/doc")          // URL
    reject("\\\\server\\share")        // UNC
    reject("a" * 5000)                 // over-length
    reject("")                         // empty
    reject("missing.txt")              // nonexistent
  }

  test("path confinement: valid selection, dedupe, directory scan") {
    val root = tempRoot()
    val r = DocumentInputs.resolveDocumentInputs(root.toString,
      includeConfiguredDirectory = false,
      relativePaths = Seq("a.txt", "sub/b.txt", "a.txt"))
    assert(r.paths.get.size == 2) // deduped
    val r2 = DocumentInputs.resolveDocumentInputs(root.toString,
      includeConfiguredDirectory = true)
    assert(r2.directory.contains(root.toRealPath()))
    // no inputs at all -> (None, None)
    val r3 = DocumentInputs.resolveDocumentInputs(root.toString,
      includeConfiguredDirectory = false)
    assert(r3.directory.isEmpty && r3.paths.isEmpty)
  }

  test("path confinement: symlink rejected at any component") {
    val root = tempRoot()
    Files.createSymbolicLink(root.resolve("link.txt"), root.resolve("a.txt"))
    val e = intercept[IllegalArgumentException](
      DocumentInputs.resolveDocumentInputs(root.toString,
        includeConfiguredDirectory = false, relativePaths = Seq("link.txt")))
    assert(e.getMessage.contains("symbolic link"))
    val e2 = intercept[IllegalArgumentException](
      DocumentInputs.resolveDocumentInputs(root.toString,
        includeConfiguredDirectory = true))
    assert(e2.getMessage.contains("symbolic link"))
  }

  test("loaders: text files + directory feed the ingest pipeline") {
    val root = tempRoot()
    val r = DocumentInputs.resolveDocumentInputs(root.toString,
      includeConfiguredDirectory = true,
      relativePaths = Seq("a.txt"))
    val single = Loaders.loadTextFiles(spark, r.paths.get)
    assert(single.count() == 1)
    val all = Loaders.loadTextDirectory(spark, r.directory.get)
    assert(all.count() == 2)
    assert(all.columns.toSet == Set("content", "metadata"))
  }

  test("loaders: pdf/epub inputs fail governed, not silent text-read") {
    val dir = java.nio.file.Files.createTempDirectory("graft-pdf")
    java.nio.file.Files.write(dir.resolve("doc.pdf"),
      Array[Byte]('%', 'P', 'D', 'F', '-', '1', '.', '7'))
    java.nio.file.Files.writeString(dir.resolve("ok.txt"), "plain text")
    val exPath = intercept[graft.model.GraftException](
      Loaders.loadTextFiles(spark, Seq(dir.resolve("doc.pdf"))))
    assert(exPath.code == graft.model.ErrorCodes.DocumentParseUnsupported)
    val exDir = intercept[graft.model.GraftException](
      Loaders.loadTextDirectory(spark, dir))
    assert(exDir.code == graft.model.ErrorCodes.DocumentParseUnsupported)
    val exEpub = intercept[graft.model.GraftException](
      Loaders.loadTextFiles(spark, Seq(dir.resolve("book.EPUB"))))
    assert(exEpub.code == graft.model.ErrorCodes.DocumentParseUnsupported)
    // a pdf-free selection in the same root still loads
    assert(Loaders.loadTextFiles(spark, Seq(dir.resolve("ok.txt"))).count() == 1)
  }

  test("loaders: html strips markup, decodes entities, drops empty docs") {
    val dir = java.nio.file.Files.createTempDirectory("graft-html")
    java.nio.file.Files.writeString(dir.resolve("a.html"),
      """<html><head><title>T</title><style>p { color: red; }</style>
        |<script>var x = "<p>not text</p>";</script></head>
        |<body><!-- comment --><h1>Header</h1>
        |<p>alpha &amp; beta &lt;tag&gt; &quot;q&quot;&nbsp;end</p>
        |<div>second   block</div></body></html>""".stripMargin)
    java.nio.file.Files.writeString(dir.resolve("empty.html"),
      "<html><body><script>only_code();</script></body></html>")
    val rows = Loaders.loadHtmlDirectory(spark, dir).collect()
    assert(rows.length == 1, "markup-only file strips to empty and drops")
    val text = rows(0).getString(0)
    // decoded "&lt;tag&gt;" legitimately yields "<tag>"; real markup is gone
    assert(!text.contains("<p>") && !text.contains("<div") &&
      !text.contains("<html") && !text.contains("color") &&
      !text.contains("not text") && !text.contains("comment"))
    assert(!text.startsWith("\n") && !text.endsWith("\n"), "trimmed")
    assert(text.contains("T") && text.contains("Header"))
    assert(text.contains("alpha & beta <tag> \"q\" end"), s"entities: $text")
    assert(text.contains("second block"), "inner whitespace collapses")
    assert(text.split("\n").map(_.trim).count(_.nonEmpty) >= 3,
      "block closers become line breaks")
  }

  test("loaders: jsonl parses with explicit schema, drops bad lines") {
    val dir = java.nio.file.Files.createTempDirectory("graft-jsonl")
    val f = dir.resolve("corpus.jsonl")
    java.nio.file.Files.writeString(f,
      """{"content": "doc one", "metadata": {"lang": "en"}}
        |{"content": "doc two"}
        |not json at all
        |{"metadata": {"lang": "de"}}
        |""".stripMargin)
    val df = Loaders.loadJsonl(spark, Seq(f))
    val rows = df.orderBy("content").collect()
    assert(rows.length == 2, "bad lines and content-less lines drop")
    assert(rows(0).getString(0) == "doc one" &&
      rows(0).getMap[String, String](1).get("lang").contains("en"))
    assert(rows(1).getString(0) == "doc two" &&
      rows(1).getMap[String, String](1).isEmpty)
  }

  test("retriever protocol: init, chunked add, query shapes") {
    val dir = Files.createTempDirectory("graft-wh").toString
    val api = new Api(spark, dir, new DeterministicHashEmbedder(32))
    val retr = new Retriever(api, "rag")
    retr.initializeCollection()
    import spark.implicits._
    val longDoc = (1 to 1200).map(i => s"tok$i").mkString(" ")
    val added = retr.addDocuments(Seq(longDoc, "short doc").toDF("content"),
      maxTokensPerChunk = 512)
    assert(added == 4) // 1200 tokens -> 3 chunks, plus the short doc
    val hits = retr.query("tok5 tok6", topK = 2)
    assert(hits.size == 2)
    assert(hits.forall(h => h.text.nonEmpty && h.id.nonEmpty))
    val lex = retr.bm25Query("tok1199", topK = 4)
    assert(lex.nonEmpty)
    assert(lex.head.text.contains("tok1199"))
  }

  test("retriever protocol: connect_database + the three document-input kinds") {
    val wh = Files.createTempDirectory("graft-wh").toString
    val docRoot = Files.createTempDirectory("graft-docs")
    Files.writeString(docRoot.resolve("a.txt"), "alpha file content")
    Files.writeString(docRoot.resolve("b.txt"), "beta file content")
    val api = new Api(spark, wh, new DeterministicHashEmbedder(32))
    val retr = new Retriever(api, "rag2", documentRoot = Some(docRoot.toString))
    assert(retr.connectDatabase())

    // initialize_collection with inline contents (protocol default overwrite=true)
    assert(retr.initializeCollection(
      documentContents = Seq("inline gamma content")))
    // directory + path-list ingest through the confined resolver
    val n1 = retr.addDocumentInputs(documentDirectory = Some(docRoot.toString))
    assert(n1 == 2)
    val n2 = retr.addDocumentInputs(documentPaths = Seq("a.txt"))
    assert(n2 == 1) // content-addressed id: re-adding a.txt merges, count is batch size
    assert(retr.query("alpha file content", topK = 1).head.text.contains("alpha"))
    assert(retr.bm25Query("gamma", topK = 1).head.text.contains("gamma"))
    // escaping the root is a protocol failure, not a crash
    assert(intercept[Exception](
      retr.addDocumentInputs(documentPaths = Seq("../outside.txt"))) != null)
    // a caller-supplied directory NARROWS the scan inside the root...
    val sub = Files.createDirectory(docRoot.resolve("sub"))
    Files.writeString(sub.resolve("c.txt"), "delta subdir content")
    assert(retr.addDocumentInputs(documentDirectory = Some("sub")) == 1)
    assert(retr.addDocumentInputs(documentDirectory = Some(sub.toString)) == 1)
    // ...and can NEVER replace the configured root (absolute dir outside)
    val outside = Files.createTempDirectory("graft-outside")
    Files.writeString(outside.resolve("x.txt"), "outside content")
    assert(intercept[Exception](retr.addDocumentInputs(
      documentDirectory = Some(outside.toString))).getMessage
      .contains("inside the configured root"))
    assert(intercept[Exception](retr.addDocumentInputs(
      documentDirectory = Some("../"))).getMessage
      .contains("inside the configured root"))
    // a retriever with NO configured root rejects directory inputs
    val rootless = new Retriever(api, "rag2")
    assert(intercept[Exception](rootless.addDocumentInputs(
      documentDirectory = Some(outside.toString))).getMessage
      .contains("root is unavailable"))
    // initialize failure surfaces as false (protocol bool), not an exception
    val bad = new Retriever(api, "bad name!", None)
    assert(!bad.initializeCollection())
  }

  test("mcp surface: action routing, response shapes, error codes") {
    val dir = Files.createTempDirectory("graft-wh").toString
    val api = new Api(spark, dir, new DeterministicHashEmbedder(32))
    val mcp = new McpSurface(api)
    import spark.implicits._
    val created = mcp.vectorCollectionManagement("Create-Collection",
      collectionName = "mc",
      documents = Some(Seq("hello world doc", "another doc").toDF("content")))
    assert(created("status") == "ready" && created("documents_added") == 2L)
    val listed = mcp.vectorCollectionManagement("list_collections")
    assert(listed("collections") == Seq(Map("collection_name" -> "mc")))
    val res = mcp.vectorSearch("search", "mc", "hello")
    val hits = res("results").asInstanceOf[Seq[Map[String, Any]]]
    assert(hits.nonEmpty && hits.head.keySet == Set("id", "content", "metadata", "score"))
    assert(intercept[GraftException](
      mcp.vectorCollectionManagement("drop_everything")).code
      == ErrorCodes.CollectionActionInvalid)
    assert(intercept[GraftException](
      mcp.vectorSearch("fuzzy", "mc", "q")).code == ErrorCodes.SearchActionInvalid)
    assert(intercept[GraftException](
      mcp.vectorCollectionManagement("delete_collection",
        collectionName = "mc")).code == ErrorCodes.DeleteConfirmationRequired)
  }

  test("mcp surface: entitlement filter scopes listing, fails open") {
    val dir = Files.createTempDirectory("graft-wh").toString
    val api = new Api(spark, dir, new DeterministicHashEmbedder(32))
    import spark.implicits._
    val base = new McpSurface(api)
    base.vectorCollectionManagement("create_collection", collectionName = "teama",
      documents = Some(Seq("a doc").toDF("content")))
    base.vectorCollectionManagement("create_collection", collectionName = "teamb",
      documents = Some(Seq("b doc").toDF("content")))
    def names(m: Map[String, Any]): Seq[String] =
      m("collections").asInstanceOf[Seq[Map[String, Any]]]
        .map(_("collection_name").asInstanceOf[String])
    // entitled subset lists; resolver cannot invent names
    val scoped = new McpSurface(api, entitlements =
      Some((ns, ns2) => { assert(ns == "collection"); Seq("teama", "ghost") }))
    assert(names(scoped.vectorCollectionManagement("list_collections"))
      == Seq("teama"))
    // resolver failure = FULL set (fail-open, mcp_server.py:79-80)
    val failing = new McpSurface(api, entitlements =
      Some((_, _) => throw new RuntimeException("idp down")))
    assert(names(failing.vectorCollectionManagement("list_collections"))
      == Seq("teama", "teamb"))
    // no resolver configured = unchanged behavior
    assert(names(base.vectorCollectionManagement("list_collections"))
      == Seq("teama", "teamb"))
  }

  test("mcp surface: execution-variant routing via semanticMode/lexicalMode") {
    val dir = Files.createTempDirectory("graft-wh").toString
    val api = new Api(spark, dir, new DeterministicHashEmbedder(32))
    val mcp = new McpSurface(api)
    import spark.implicits._
    mcp.vectorCollectionManagement("create_collection", collectionName = "mv",
      documents = Some(Seq("alpha beta gamma", "alpha alpha delta",
        "beta beta beta", "epsilon zeta").toDF("content")))
    api.buildAnnIndex("mv", nClusters = 2)
    api.buildPqIndex("mv", m = 4, k = 4, iters = 1)
    api.buildLshIndex("mv", bits = 4, tables = 4)
    api.buildLexicalIndex("mv")
    def ids(m: Map[String, Any]): Seq[Any] =
      m("results").asInstanceOf[Seq[Map[String, Any]]].map(_("id"))
    // every variant routes and returns the canonical result shape; the
    // indexed/approx paths must agree with their exact/scan counterparts
    // on this small corpus (index recall is total at this scale)
    val semExact = mcp.vectorSearch("semantic_search", "mv", "alpha beta")
    assert(ids(mcp.vectorSearch("semantic_search", "mv", "alpha beta",
      semanticMode = "approx")) == ids(semExact))
    assert(ids(mcp.vectorSearch("semantic_search", "mv", "alpha beta",
      semanticMode = "lsh")) == ids(semExact))
    assert(ids(mcp.vectorSearch("semantic_search", "mv", "alpha beta",
      semanticMode = "pq")) == ids(semExact))
    // late-interaction mode routes through the persisted chunk index
    // (legitimately different scoring — per-token best chunks — so only
    // the result shape and row count are pinned here; scoring equality
    // lives in ChunkIndexSpec)
    api.buildChunkIndex("mv", maxTokens = 2)
    val maxsim = mcp.vectorSearch("semantic_search", "mv", "alpha beta",
      semanticMode = "maxsim")
    assert(ids(maxsim).size == 4)
    val lexScan = mcp.vectorSearch("lexical_search", "mv", "beta")
    assert(ids(mcp.vectorSearch("lexical_search", "mv", "beta",
      lexicalMode = "indexed")) == ids(lexScan))
    val bm25Scan = mcp.vectorSearch("lexical_search", "mv", "beta",
      lexicalMode = "bm25")
    assert(ids(mcp.vectorSearch("lexical_search", "mv", "beta",
      lexicalMode = "bm25_indexed")) == ids(bm25Scan))
    // index-served hybrid: same RRF math, both inputs from indexes. With
    // TF-indexed lexical (same ranks as the scan) and total-recall
    // semantic indexes, the fused ORDER must match the scan hybrid
    // exactly; BM25 lexical legitimately re-ranks, so there the fused
    // top-k is compared as a set.
    val hybridScan = mcp.vectorSearch("search", "mv", "alpha beta")
    for (sm <- Seq("approx", "lsh", "pq"))
      assert(ids(mcp.vectorSearch("search", "mv", "alpha beta",
        semanticMode = sm, lexicalMode = "indexed")) == ids(hybridScan),
        s"index-served hybrid ($sm/indexed) must match the scan hybrid here")
    assert(ids(mcp.vectorSearch("search", "mv", "alpha beta",
      semanticMode = "approx", lexicalMode = "bm25_indexed")).toSet ==
      ids(hybridScan).toSet,
      "bm25-fused hybrid reranks but serves the same documents here")
    // maxsim as a hybrid leg: late-interaction ranks fuse with the
    // lexical ranks through the same RRF math (rank-only fusion, so the
    // different scorer needs no rescaling); serves the result shape and
    // the same documents on this total-recall corpus
    assert(ids(mcp.vectorSearch("search", "mv", "alpha beta",
      semanticMode = "maxsim", lexicalMode = "indexed")).toSet ==
      ids(hybridScan).toSet,
      "maxsim-fused hybrid reranks but serves the same documents here")
    // mode spellings normalize on EVERY action — the hybrid must accept
    // the same "Exact"/" scan " forms the single-sided actions do
    assert(ids(mcp.vectorSearch("search", "mv", "alpha beta",
      semanticMode = "Exact", lexicalMode = " scan ")) == ids(hybridScan))
    // phrase mode: adjacency + order — "alpha beta" matches only the doc
    // where they are adjacent in order; snippet + phrase_tf ride metadata
    val phrase = mcp.vectorSearch("lexical_search", "mv", "alpha beta",
      lexicalMode = "phrase")
    val phraseHits = phrase("results").asInstanceOf[Seq[Map[String, Any]]]
    assert(phraseHits.length == 1, s"got $phraseHits")
    val md = phraseHits.head("metadata").asInstanceOf[Map[String, String]]
    assert(md("phrase_tf") == "1")
    assert(md("snippet").contains("alpha beta"))
    // reversed order must NOT match
    assert(mcp.vectorSearch("lexical_search", "mv", "beta alpha",
      lexicalMode = "phrase")("results").asInstanceOf[Seq[_]].isEmpty)
    // phrase is a lexical_search-only mode: the hybrid rejects it governed
    val exH = intercept[graft.model.GraftException](
      mcp.vectorSearch("search", "mv", "alpha beta", lexicalMode = "phrase"))
    assert(exH.code == graft.model.ErrorCodes.SearchActionInvalid)
    // unknown modes are governed exactly like unknown actions
    assert(intercept[GraftException](mcp.vectorSearch("semantic_search", "mv",
      "q", semanticMode = "hnsw")).code == ErrorCodes.SearchActionInvalid)
    assert(intercept[GraftException](mcp.vectorSearch("search", "mv",
      "q", semanticMode = "hnsw")).code == ErrorCodes.SearchActionInvalid)
    assert(intercept[GraftException](mcp.vectorSearch("lexical_search", "mv",
      "q", lexicalMode = "fts")).code == ErrorCodes.SearchActionInvalid)
    assert(intercept[GraftException](mcp.vectorSearch("search", "mv",
      "q", semanticMode = "hnsw", lexicalMode = "indexed"))
      .code == ErrorCodes.SearchActionInvalid)
  }

  test("verbose tools dispatch to the condensed handlers with same codes") {
    val dir = Files.createTempDirectory("graft-wh-verbose").toString
    val api = new Api(spark, dir, new DeterministicHashEmbedder(32))
    val surface = new McpSurface(api)
    surface.vectorCollectionManagement("create_collection", "verbosecoll",
      documents = Some(Loaders.loadInline(spark, Seq("spark join doc"))))
    val listed = surface.verboseTool("list_collections")
    assert(listed("collections").asInstanceOf[Seq[Map[String, String]]]
      .exists(_("collection_name") == "verbosecoll"))
    val hits = surface.verboseTool("semantic-search",
      collectionName = "verbosecoll", question = "spark join")
    assert(hits.contains("results"))
    val bad = intercept[graft.model.GraftException](
      surface.verboseTool("drop_everything"))
    assert(bad.code == graft.model.ErrorCodes.CollectionActionInvalid)
    val badSearch = intercept[graft.model.GraftException](
      surface.verboseTool("mega_search", collectionName = "verbosecoll",
        question = "x"))
    assert(badSearch.code == graft.model.ErrorCodes.SearchActionInvalid)
  }

  test("mcp add_documents routes through the near-dup gate when the knob is set") {
    val dir = Files.createTempDirectory("graft-wh-gate").toString
    val api = new Api(spark, dir, new DeterministicHashEmbedder(32))
    val surface = new McpSurface(api)
    surface.vectorCollectionManagement("create_collection", "gatecoll",
      documents = Some(Loaders.loadInline(spark, Seq("seed doc one", "seed doc two"))))
    api.buildLshIndex("gatecoll", bits = 1, tables = 8)
    val res = surface.vectorCollectionManagement("add_documents", "gatecoll",
      documents = Some(Loaders.loadInline(spark, Seq("an unrelated new doc"))),
      nearDupThreshold = Some(-1.0)) // any bucket-mate rejects
    assert(res("documents_added") == 0L && res("documents_rejected") == 1L)
    val res2 = surface.vectorCollectionManagement("add_documents", "gatecoll",
      documents = Some(Loaders.loadInline(spark, Seq("an unrelated new doc"))),
      nearDupThreshold = Some(1.1)) // nothing can clear it
    assert(res2("documents_added") == 1L && res2("documents_rejected") == 0L)

    // content mode routes to the MinHash gate (and is governed before build)
    val noIdx = intercept[GraftException] {
      surface.vectorCollectionManagement("add_documents", "gatecoll",
        documents = Some(Loaders.loadInline(spark, Seq("whatever text here"))),
        nearDupThreshold = Some(0.5), nearDupMode = "content")
    }
    assert(noIdx.code == ErrorCodes.DedupIndexNotFound)
    api.buildMinHashIndex("gatecoll", bands = 16, shingleN = 2)
    val res3 = surface.vectorCollectionManagement("add_documents", "gatecoll",
      documents = Some(Loaders.loadInline(spark, Seq("seed doc one extra"))),
      nearDupThreshold = Some(0.5), nearDupMode = "content")
    assert(res3("documents_added") == 0L && res3("documents_rejected") == 1L,
      "2-gram jaccard 2/3 vs 'seed doc one' must reject at 0.5")
    val badMode = intercept[GraftException] {
      surface.vectorCollectionManagement("add_documents", "gatecoll",
        documents = Some(Loaders.loadInline(spark, Seq("x y z"))),
        nearDupThreshold = Some(0.5), nearDupMode = "simhash")
    }
    assert(badMode.code == ErrorCodes.CollectionActionInvalid)
  }

  test("backend policy: fail-closed allow-list with canonicalization and default") {
    import graft.model.BackendPolicy
    // allow-list passes, canonicalized (backend_policy.py:7-31)
    for (b <- Seq("epistemic_graph", "mongodb", "postgres", "qdrant"))
      assert(BackendPolicy.ensureBackendAvailable(b) == b)
    assert(BackendPolicy.ensureBackendAvailable("  Postgres ") == "postgres")
    // unknown -> vector_backend_unsupported; empty -> vector_backend_not_configured
    assert(intercept[GraftException](
      BackendPolicy.ensureBackendAvailable("oracle")).code
      == ErrorCodes.VectorBackendUnsupported)
    assert(intercept[GraftException](
      BackendPolicy.ensureBackendAvailable("")).code
      == ErrorCodes.VectorBackendNotConfigured)
    // unset db_type resolves to the configured default (mcp_server.py:46-50)
    assert(BackendPolicy.resolve(null) == "epistemic_graph")
    assert(intercept[GraftException](
      BackendPolicy.resolve(null, configuredDefault = "")).code
      == ErrorCodes.VectorBackendNotConfigured)
    // and the MCP surface gates on it before touching the engine
    val dir = Files.createTempDirectory("graft-wh").toString
    val api = new Api(spark, dir, new DeterministicHashEmbedder(32))
    val mcp = new McpSurface(api)
    assert(intercept[GraftException](
      mcp.vectorSearch("search", "any", "q", dbType = "sqlite")).code
      == ErrorCodes.VectorBackendUnsupported)
    val listed = mcp.vectorCollectionManagement("list_collections", dbType = "Qdrant")
    assert(listed("db_type") == "qdrant")
    // non-throwing doctor probe (backend_policy.py:34-56)
    assert(BackendPolicy.backendStatus("postgres")
      == BackendPolicy.BackendStatus("postgres", true, "available", None))
    assert(BackendPolicy.backendStatus("")
      == BackendPolicy.BackendStatus("", false, "vector backend is not configured", None))
    assert(BackendPolicy.backendStatus("Oracle")
      == BackendPolicy.BackendStatus("oracle", false, "unsupported vector backend", None))
  }
}
