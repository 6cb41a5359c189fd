package graft.ann

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.catalog.Catalog
import graft.functions.VectorFunctions
import graft.model.CollectionEntry

/** Index-health / drift probe for the frozen-quantizer indexes (doc-level
  * IVF and chunk-level IVF). Centroids are frozen at build time — the
  * standard production-IVF invariant this engine keeps — so a corpus that
  * drifts away from the build-time distribution silently degrades
  * candidate recall: rows land in clusters whose centroid no longer
  * represents them, probe ordering stops predicting where true neighbors
  * live, and no query errors. This probe makes that decay MEASURABLE and
  * actionable (the first silent quality regression a 100 TB continuous-
  * ingest pipeline hits).
  *
  * Metrics, both exact and partitioning-invariant:
  *   - mean quantization residual: per stored row, the cosine distance to
  *     its assigned centroid, floored to nano units (ONE double
  *     expression per row from the stored values, so the long aggregate
  *     is order-independent); the mean is the integer division of the
  *     exact nano sum.
  *   - assignment entropy over cluster sizes (nano-floored per-cluster
  *     terms of -p·ln p): a drifting corpus typically COLLAPSES into the
  *     few clusters nearest its new mode, so entropy falls even when
  *     residuals stay moderate.
  *
  * A baseline stats row is persisted beside each index at (re)build time
  * ([[baseline]] sidecars written by the build paths); [[compare]] flags
  * `rebuild_recommended` when the current mean residual exceeds the
  * baseline's by more than [[DriftRatioPercent]] (integer arithmetic —
  * replayed by the `q_index_drift` oracle from the planted fixture) or
  * the assignment entropy lost more than that share.
  *
  * Scale shape: ONE scan of the index frame (column-pruned to embedding/
  * norm/cluster_id) into a cluster-keyed aggregate with map-side combine;
  * everything after is cluster-count-sized. No window, no corpus shuffle.
  */
object IndexHealth {

  /** Flag when mean residual grew, or entropy fell, by more than 25%. */
  val DriftRatioPercent = 25

  /** Absolute floor (nano cosine-distance units = 1e-5) under which a
    * current mean residual never flags: a PERFECT baseline (every row on
    * its centroid — nClusters >= rows — floors to 0 or −1 nano) would
    * otherwise make ANY later residual an "infinite" relative drift, and
    * residuals this small cannot decay recall.
    */
  val MinResidualNano = 10000L

  def ivfBaselinePath(catalog: Catalog, entry: CollectionEntry): String =
    catalog.tablePath(entry) + ".ivf.health"

  def chunkIvfBaselinePath(catalog: Catalog, entry: CollectionEntry): String =
    catalog.tablePath(entry) + ".chunkvecs.ivf.health"

  /** One-row health stats (n, mean_res_nano, entropy_nano) of an index
    * frame (id, embedding, norm, cluster_id) under its frozen centroid
    * table. Exact: per-row residuals quantize to nano longs BEFORE any
    * aggregate, entropy terms derive from exact cluster counts.
    */
  def stats(assigned: DataFrame, centroids: DataFrame): DataFrame = {
    val perCluster = assigned
      .join(broadcast(centroids.select(
          col("centroid_id"), col("centroid"), col("centroid_norm"))),
        col("cluster_id") === col("centroid_id"))
      .select(col("cluster_id"),
        floor((lit(1.0) -
          VectorFunctions.dot(col("embedding"), col("centroid")) /
            (col("norm") * col("centroid_norm"))) * lit(1e9))
          .cast("long").as("res_nano"))
      .groupBy("cluster_id")
      .agg(count(lit(1)).as("nc"), sum("res_nano").as("sr"))
    val tot = perCluster.agg(
      sum(col("nc")).as("n"), sum(col("sr")).as("s"))
    perCluster.crossJoin(broadcast(tot))
      .select(col("n"), col("s"),
        floor(-(col("nc").cast("double") / col("n").cast("double")) *
          log(col("nc").cast("double") / col("n").cast("double")) * lit(1e9))
          .cast("long").as("eterm"))
      .groupBy("n", "s")
      .agg(sum(col("eterm")).as("entropy_nano"))
      .select(col("n"),
        expr("s div n").as("mean_res_nano"),
        col("entropy_nano"))
  }

  /** Drift verdict from a baseline row vs a current row (both [[stats]]
    * shapes, driver-side): integer-arithmetic comparisons only, so the
    * flag replays exactly from planted fixtures.
    */
  def compare(
      baseline: (Long, Long, Long),
      current: (Long, Long, Long)): Map[String, Any] = {
    val (nRef, resRef, entRef) = baseline
    val (nCur, resCur, entCur) = current
    // max(resRef, 0): on-centroid rows floor to −1 nano, and a negative
    // baseline would flag any positive residual; the absolute floor keeps
    // a perfect baseline (resRef = 0) from flagging negligible residuals
    val residualDrift = resCur > MinResidualNano &&
      100L * resCur > (100L + DriftRatioPercent) * math.max(resRef, 0L)
    val entropyCollapse = 100L * entCur < (100L - DriftRatioPercent) * entRef
    Map(
      "n_baseline" -> nRef, "n_current" -> nCur,
      "mean_res_nano_baseline" -> resRef, "mean_res_nano_current" -> resCur,
      "entropy_nano_baseline" -> entRef, "entropy_nano_current" -> entCur,
      "residual_drift" -> residualDrift,
      "entropy_collapse" -> entropyCollapse,
      "rebuild_recommended" -> (residualDrift || entropyCollapse))
  }

  /** Persist the build-time baseline beside the index (one tiny row). */
  def writeBaseline(assigned: DataFrame, centroids: DataFrame, path: String): Unit =
    stats(assigned, centroids).coalesce(1)
      .write.mode(SaveMode.Overwrite).parquet(path)

  def readStatsRow(spark: SparkSession, path: String): Option[(Long, Long, Long)] =
    if (!java.nio.file.Files.exists(java.nio.file.Paths.get(path))) None
    else spark.read.parquet(path).collect().headOption
      .map(r => (r.getAs[Long]("n"), r.getAs[Long]("mean_res_nano"),
        r.getAs[Long]("entropy_nano")))

  def statsRow(assigned: DataFrame, centroids: DataFrame): (Long, Long, Long) = {
    val r = stats(assigned, centroids).collect().headOption
      .getOrElse(return (0L, 0L, 0L))
    (r.getAs[Long]("n"), r.getAs[Long]("mean_res_nano"),
      r.getAs[Long]("entropy_nano"))
  }
}
