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
}
