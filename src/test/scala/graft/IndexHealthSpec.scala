package graft

import java.nio.file.Files
import org.apache.spark.sql.DataFrame
import graft.ingest.DeterministicHashEmbedder
import graft.model.{ErrorCodes, GraftException}

/** Index-health drift probe (`Api.indexHealth` / ann.IndexHealth): a
  * corpus that drifts away from the frozen quantizer's build-time
  * distribution must flag `rebuild_recommended`; a rebuild re-baselines
  * and clears it.
  */
class IndexHealthSpec extends SparkSpec {
  import spark.implicits._

  private def newApi(): Api = {
    val wh = Files.createTempDirectory("graft-wh-health").toString
    new Api(spark, wh, new DeterministicHashEmbedder(16))
  }

  /** Pinned embeddings near basis direction `base` (+ small per-doc
    * noise) — addDocuments fills only NULL embeddings, so these flow
    * through unchanged and give the corpus real cluster structure.
    */
  private def pinned(tag: String, base: Int, is: Seq[Int]): DataFrame =
    is.map(i => (s"doc $tag $i",
        Seq.tabulate(16)(d => if (d == base) 100f else (i % 7) * 0.5f)))
      .toDF("content", "embedding")

  test("drifted corpus flags rebuild_recommended; rebuild re-baselines and clears it") {
    val api = newApi()
    api.createCollection("h1", documents = Some(pinned("a", 0, 0 until 20)))
    api.buildAnnIndex("h1", nClusters = 4)
    val h0 = api.indexHealth("h1")
    assert(h0("rebuild_recommended") == false, s"fresh index flagged: $h0")
    assert(h0("n_baseline") == 20L && h0("n_current") == 20L)
    // the drift: twice as many documents pointing at an ORTHOGONAL
    // direction — their residual to the frozen centroids is ~maximal
    api.addDocuments("h1", pinned("b", 8, 0 until 40))
    val h1 = api.indexHealth("h1")
    assert(h1("rebuild_recommended") == true, s"drift not flagged: $h1")
    assert(h1("residual_drift") == true)
    assert(h1("n_current") == 60L && h1("n_baseline") == 20L)
    // an explicit rebuild retrains the quantizer AND re-baselines
    api.buildAnnIndex("h1", nClusters = 4)
    val h2 = api.indexHealth("h1")
    assert(h2("rebuild_recommended") == false, s"rebuild did not clear: $h2")
    assert(h2("n_baseline") == 60L)
  }

  test("chunk-level IVF health: probe runs on both quantizer sources and clears on rebuild") {
    val api = newApi()
    api.createCollection("h2", documents = Some(pinned("a", 0, 0 until 16)))
    api.buildChunkIndex("h2", maxTokens = 8)
    api.buildAnnIndex("h2", nClusters = 4)
    api.buildChunkIvfIndex("h2")
    assert(api.indexHealth("h2", "chunkivf")("rebuild_recommended") == false)
    // chunk-trained quantizer carries its own baseline
    api.buildChunkIvfIndex("h2", trainOn = "chunks", nClusters = 4)
    val h = api.indexHealth("h2", "chunkivf")
    assert(h("rebuild_recommended") == false && h("index") == "chunkivf")
  }

  test("a perfect baseline (every row its own centroid) never flags negligible residuals") {
    val api = newApi()
    api.createCollection("h4", documents = Some(pinned("a", 0, 0 until 6)))
    // nClusters = docs: every row sits ON its centroid, so the baseline
    // mean residual floors to 0 or -1 nano. Without the MinResidualNano
    // guard, ANY later residual (even one from FP noise) would read as
    // infinite relative drift and flag spuriously.
    api.buildAnnIndex("h4", nClusters = 6)
    api.addDocuments("h4", pinned("a", 0, Seq(7))) // i%7=0: same direction as doc 0
    val h = api.indexHealth("h4")
    assert(h("rebuild_recommended") == false, s"degenerate baseline flagged: $h")
  }

  test("governed errors: missing index or baseline, invalid index name") {
    val api = newApi()
    api.createCollection("h3", documents = Some(pinned("a", 0, 0 until 8)))
    assert(intercept[GraftException](api.indexHealth("h3")).code
      == ErrorCodes.AnnIndexNotFound)
    assert(intercept[GraftException](api.indexHealth("h3", "chunkivf")).code
      == ErrorCodes.AnnIndexNotFound)
    intercept[IllegalArgumentException] {
      api.indexHealth("h3", "lsh")
    }
  }
}
