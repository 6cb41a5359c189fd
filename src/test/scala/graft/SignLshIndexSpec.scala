package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.ann.SignLshIndex
import graft.ingest.DeterministicHashEmbedder

class SignLshIndexSpec extends SparkSpec {

  test("sign-LSH index: (table,key)-partitioned layout, pruned probes, self-recall 1") {
    val wh = Files.createTempDirectory("graft-wh").toString
    val api = new Api(spark, wh, new DeterministicHashEmbedder(32))
    import spark.implicits._
    val docs = (0 until 200).map(i => s"lsh doc $i body b${i % 13}").toDF("content")
    api.createCollection("lsh", documents = Some(docs))
    val entry = api.catalog.getCollection(api.catalog.physicalName("default", "lsh"))
    api.buildLshIndex("lsh", bits = 6, tables = 4)

    // physical layout: table=*/key=* nested partition dirs
    val root = new java.io.File(SignLshIndex.indexPath(api.catalog, entry))
    val tableDirs = root.listFiles().map(_.getName).filter(_.startsWith("table="))
    assert(tableDirs.sorted.toSeq == Seq("table=0", "table=1", "table=2", "table=3"))
    val keyDirs = new java.io.File(root, "table=0").listFiles()
      .map(_.getName).filter(_.startsWith("key="))
    assert(keyDirs.nonEmpty && keyDirs.forall(_.matches("key=[01]{6}")))

    // the probe is a partition-pruned scan
    val index = SignLshIndex.load(spark, api.catalog, entry)
    val pruned = index.filter(col("table") === 0 && col("key") === "101010")
    val scan = pruned.queryExecution.executedPlan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }.head
    assert(scan.partitionFilters.exists(_.toString.contains("table")) &&
      scan.partitionFilters.exists(_.toString.contains("key")),
      "probe predicates must land in PartitionFilters")

    // column/driver key parity: stored key for a vector == keyOf(vector)
    val ps = SignLshIndex.planes(32, 6, 4, 42L)
    val sample = index.filter(col("table") === 2).select("embedding", "key").limit(5).collect()
    sample.foreach { r =>
      assert(SignLshIndex.keyOf(r.getSeq[Float](0), ps(2)) == r.getString(1))
    }

    // a stored document queried by its own text must return itself first
    // (its embedding shares every bucket with itself)
    val res = api.semanticSearchLsh("lsh", Seq("lsh doc 17 body b4"), 3)
    assert(res.results.nonEmpty)
    assert(res.results.head.content == "lsh doc 17 body b4")
    assert(math.abs(res.results.head.score - 1.0) < 1e-6)

    // approx results agree with exact search on the overlap
    val exact = api.semanticSearch("lsh", Seq("lsh doc 17 body b4"), 3)
    assert(res.results.map(_.id).toSet.subsetOf(
      api.semanticSearch("lsh", Seq("lsh doc 17 body b4"), 200).results.map(_.id).toSet))
    assert(exact.results.head.id == res.results.head.id)

    // derived index dies with the collection
    api.deleteCollection("lsh", confirm = true)
    assert(!root.exists(), "sign-LSH index must be deleted with the collection")
  }

  test("index-served embedding pairs: verified subset of exact, planted dups found") {
    val wh = Files.createTempDirectory("graft-wh-lshpairs").toString
    val embedder = new DeterministicHashEmbedder(32)
    val api = new Api(spark, wh, embedder)
    import spark.implicits._
    // identical texts never coexist (content-addressed ids), so plant
    // EXACT-duplicate embeddings by supplying them explicitly
    val base = (0 until 60).map(i => (s"pairs doc $i body", i))
    val docs = base.map { case (t, i) =>
      // docs 0/1 and 2/3 share an embedding (cosine 1.0); rest are hash-distinct
      val src = if (i == 1) "pairs doc 0 body" else if (i == 3) "pairs doc 2 body" else t
      (t, embedder.embedQuery(src).toIndexedSeq)
    }.toDF("content", "embedding")
    api.createCollection("lshp", documents = Some(docs))
    api.buildLshIndex("lshp", bits = 4, tables = 6)
    val entry = api.catalog.getCollection(api.catalog.physicalName("default", "lshp"))
    val pairs = SignLshIndex.nearDupPairs(spark, api.catalog, entry, 0.999)
      .collect().map(r => (r.getString(0), r.getString(1), r.getDouble(2)))
    assert(pairs.length >= 2, s"both planted duplicate pairs must surface: ${pairs.length}")
    assert(pairs.forall(_._3 >= 0.999))
    // subset of the exact answer: every reported pair really is a near-dup
    val vecs = api.catalog.readDocuments(entry).select("id", "embedding", "norm")
    val exact = graft.dedup.Dedup.embeddingNearDups(vecs, 0.999)
      .select("a", "b").collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(pairs.map(p => (p._1, p._2)).toSet.subsetOf(exact))
  }

  test("meta sidecar: params survive an emptying delete; missing index is governed") {
    val wh = Files.createTempDirectory("graft-wh").toString
    val api = new Api(spark, wh, new DeterministicHashEmbedder(32))
    import spark.implicits._

    // no index built yet -> governed error, not a raw storage exception
    api.createCollection("m0", documents = Some(Seq("x").toDF("content")))
    val noIdx = intercept[graft.model.GraftException](
      api.semanticSearchLsh("m0", Seq("x"), 3))
    assert(noIdx.code == graft.model.ErrorCodes.AnnIndexNotFound)

    val docs = (0 until 40).map(i => s"meta doc $i").toDF("content")
    api.createCollection("meta", documents = Some(docs))
    val entry = api.catalog.getCollection(api.catalog.physicalName("default", "meta"))
    api.buildLshIndex("meta", bits = 5, tables = 3)
    assert(SignLshIndex.loadMeta(spark, api.catalog, entry)
      .contains(graft.ann.LshMeta(5, 3, 42L, 32)))

    // delete EVERY document: the refresh rebuilds an empty index, and the
    // (bits, tables) must survive in the sidecar (they are unrecoverable
    // from zero rows — the round-3 stale-serving bug)
    val allIds = api.getDocumentsByIds("meta",
      api.catalog.readDocuments(entry).select("id").collect().map(_.getString(0)).toSeq)
      .select("id").collect().map(_.getString(0)).toSeq
    api.deleteDocuments("meta", allIds)
    assert(api.catalog.readDocuments(entry).count() == 0)
    assert(SignLshIndex.loadMeta(spark, api.catalog, entry)
      .contains(graft.ann.LshMeta(5, 3, 42L, 32)), "meta must survive an empty rebuild")
    // searching the emptied index is governed-empty, not an error
    assert(api.semanticSearchLsh("meta", Seq("meta doc 7"), 3).results.isEmpty)

    // documents added AFTER the emptying delete must re-enter the index
    api.addDocuments("meta", Seq("reborn doc").toDF("content"))
    val res = api.semanticSearchLsh("meta", Seq("reborn doc"), 3)
    assert(res.results.nonEmpty && res.results.head.content == "reborn doc")
    // and the layout still uses the original build parameters
    val keyDirs = new java.io.File(
      SignLshIndex.indexPath(api.catalog, entry) + "/table=0").listFiles()
      .map(_.getName).filter(_.startsWith("key="))
    assert(keyDirs.nonEmpty && keyDirs.forall(_.matches("key=[01]{5}")))
    api.deleteCollection("meta", confirm = true)
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(
      SignLshIndex.metaPath(api.catalog, entry))), "meta sidecar dies with the collection")
  }

  test("multi-probe: lowest-margin bit flips, key-set shape, recall recovery") {
    val dim = 16
    val ps = SignLshIndex.planes(dim, 8, 1, 42L)
    val rnd = new scala.util.Random(7)
    val vecs = (0 until 300).map(i =>
      i.toString -> Seq.fill(dim)((rnd.nextGaussian() * 0.5).toFloat))

    // probe-key set shape: base key first, each extra differs in exactly
    // one bit, margin-ordered flips are deterministic
    val v = vecs.head._2
    val keys = SignLshIndex.probeKeysOf(v, ps.head, 3)
    assert(keys.size == 4 && keys.head == SignLshIndex.keyOf(v, ps.head))
    assert(keys.tail.forall(k =>
      k.zip(keys.head).count { case (a, b) => a != b } == 1))
    assert(keys.distinct.size == keys.size)
    assert(SignLshIndex.probeKeysOf(v, ps.head, 3) == keys)

    // find a pair whose keys differ in exactly one bit, that bit being
    // the query's LOWEST-margin bit — the pair a 1-table plain probe
    // misses and the first flip probe must recover
    val withKeys = vecs.map { case (id, vec) =>
      (id, vec, SignLshIndex.keyOf(vec, ps.head),
        SignLshIndex.probeKeysOf(vec, ps.head, 1)(1))
    }
    val pair = (for {
      (qi, qv, qk, qflip) <- withKeys.iterator
      (xi, _, xk, _) <- withKeys.iterator
      if qi != xi && xk == qflip && xk != qk
    } yield (qi, qv, xi)).nextOption()
    assert(pair.isDefined, "fixture must contain a hamming-1 low-margin pair")
    val (_, qVec, targetId) = pair.get

    val wh = Files.createTempDirectory("graft-wh").toString
    val api = new Api(spark, wh, new DeterministicHashEmbedder(dim))
    import spark.implicits._
    api.createCollection("mp",
      documents = Some(vecs.map(_._1).toDF("content")))
    // the corpus embeddings here are the synthetic gaussian vectors, not
    // text-derived ones, so write the index layout directly with the same
    // sign-key column logic the builder uses
    val entry = api.catalog.getCollection(api.catalog.physicalName("default", "mp"))
    val vecDf = vecs.toDF("id", "embedding")
      .select(col("id"), col("embedding"),
        graft.functions.VectorFunctions.l2Norm(col("embedding")).as("norm"))
    val idxPath = SignLshIndex.indexPath(api.catalog, entry)
    val keyColumn =
      ps.head.map { p =>
        val arr = array(p.map(lit): _*)
        when(graft.functions.VectorFunctions.dot(col("embedding"), arr) >= 0,
          lit("1")).otherwise(lit("0"))
      }.reduce(concat(_, _))
    vecDf.select(col("id"), col("embedding"), col("norm"),
        lit(0).as("table"), keyColumn.as("key"))
      .write.partitionBy("table", "key")
      .mode(org.apache.spark.sql.SaveMode.Overwrite).parquet(idxPath)
    val index = SignLshIndex.load(spark, api.catalog, entry)

    val plain = SignLshIndex.search(index, Seq(0 -> qVec), 300, dim,
      bits = 8, tables = 1, multiProbe = 0)
      .select("id").collect().map(_.getString(0)).toSet
    val multi = SignLshIndex.search(index, Seq(0 -> qVec), 300, dim,
      bits = 8, tables = 1, multiProbe = 1)
      .select("id").collect().map(_.getString(0)).toSet
    assert(!plain.contains(targetId),
      "plain 1-table probe must miss the hamming-1 neighbor")
    assert(multi.contains(targetId),
      "first multi-probe flip must recover the lowest-margin neighbor")
    assert(plain.subsetOf(multi), "multi-probe only widens the candidate set")
    api.deleteCollection("mp", confirm = true)
  }
}
