package graft.ann

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.catalog.Catalog
import graft.model.CollectionEntry

/** Persistent IVF-PQ index — the reference's literal engine-side ANN claim
  * ("IVF-PQ", vector_mcp/vectordb/epistemic_graph.py:5-8) as a Spark
  * storage layout:
  *
  *   - the corpus's PQ codes (m small ints per vector, [[Pq]]) written
  *     PARTITIONED BY the vector's IVF cluster, so a probe is a
  *     physically pruned scan (PartitionFilters) that reads ONLY
  *     (id, codes) — never the float embeddings;
  *   - the per-subspace codebooks persisted next to the codes (the
  *     quantizer is part of the index, exactly like IvfIndex's centroid
  *     table and SignLshIndex's meta sidecar — never re-derived from
  *     rows, so it survives a delete that empties the collection);
  *   - serving = driver-side probe selection over the tiny centroid
  *     table, ADC over the probed partitions' codes, then exact cosine
  *     re-rank of the tiny oversampled shortlist against the documents
  *     table (the only touch of the embedding column).
  *
  * At 100 TB the arithmetic is the point: a 768-dim float corpus stores
  * 3 KiB of floats per vector but only m bytes of codes — the ADC scan
  * reads ~1/100 of the bytes, over ~nprobe/K of the partitions.
  *
  * The IVF layer reuses the collection's persisted [[IvfIndex]] centroids
  * when they exist (one quantizer for both indexes); without them the
  * codes live in a single cluster-0 partition — ADC still scans only
  * codes, there is just no partition pruning.
  */
object PqIndex {

  def indexPath(catalog: Catalog, entry: CollectionEntry): String =
    catalog.tablePath(entry) + ".pq"

  def codebooksPath(catalog: Catalog, entry: CollectionEntry): String =
    catalog.tablePath(entry) + ".pq.codebooks"

  def metaPath(catalog: Catalog, entry: CollectionEntry): String =
    catalog.tablePath(entry) + ".pq.meta"

  private def exists(p: String) = Files.exists(Paths.get(p))

  /** Whether the persisted codes are RESIDUAL-encoded (quantized
    * embedding - centroid, the IVFADC design) — part of the index's
    * identity like the codebooks themselves: decoding/serving must use
    * the same convention the build used. Indexes without a meta sidecar
    * predate residual support and are raw-encoded.
    */
  def isResidual(spark: SparkSession, catalog: Catalog, entry: CollectionEntry): Boolean =
    exists(metaPath(catalog, entry)) && {
      val rows = spark.read.parquet(metaPath(catalog, entry)).select("residual").collect()
      rows.nonEmpty && rows(0).getBoolean(0)
    }

  private def saveMeta(
      spark: SparkSession,
      catalog: Catalog,
      entry: CollectionEntry,
      residual: Boolean): Unit = {
    import spark.implicits._
    Seq(residual).toDF("residual")
      .coalesce(1).write.mode(SaveMode.Overwrite).parquet(metaPath(catalog, entry))
  }

  /** Build (or rebuild) the index from the collection's documents table:
    * train codebooks (deterministic, [[Pq.train]]), persist them, encode
    * every vector, and write the codes cluster-partitioned.
    */
  def build(
      spark: SparkSession,
      catalog: Catalog,
      entry: CollectionEntry,
      dim: Int,
      m: Int = 8,
      k: Int = 16,
      iters: Int = 3,
      residual: Boolean = false,
      trainFraction: Double = 1.0): Unit = {
    require(trainFraction > 0 && trainFraction <= 1,
      s"trainFraction $trainFraction out of (0,1]")
    val docs = catalog.readDocuments(entry)
      .select(col("id"), col("embedding"), col("norm"))
    // codebooks, like the IVF quantizer, need a REPRESENTATIVE sample,
    // not every row: trainFraction < 1 bounds the per-iteration training
    // scans with the deterministic hash-of-id gate (IvfIndex.build has the
    // same knob and rationale); ENCODING below always covers the corpus
    val trainDocs =
      if (trainFraction >= 1.0) docs
      else graft.operators.Sampling.sample(docs, "id", trainFraction)
    // residual encoding needs an IVF quantizer to take residuals AGAINST;
    // without centroids it degenerates to raw encoding, so record raw
    val doResidual = residual && exists(IvfIndex.centroidsPath(catalog, entry))
    val trainRows =
      if (!doResidual) trainDocs.select("id", "embedding")
      else {
        val cents = IvfIndex.loadCentroids(spark, catalog, entry)
        Pq.residualOf(
          Ann.assign(trainDocs, cents),
          cents.select(col("centroid_id").as("cluster_id"), col("centroid")))
          .select("id", "embedding")
      }
    val cb = Pq.train(trainRows, dim, m, k, iters)
    saveCodebooks(spark, catalog, entry, cb)
    saveMeta(spark, catalog, entry, doResidual)
    val codes = encodeRows(spark, catalog, entry, docs, cb)
    codes
      // one writer per cluster partition (see IvfIndex.build)
      .repartition(col("cluster_id"))
      .write
      .partitionBy("cluster_id")
      .mode(SaveMode.Overwrite)
      .parquet(indexPath(catalog, entry))
  }

  /** PQ-encode a set of rows (id, embedding, norm) and attach their IVF
    * cluster — the row-level unit [[build]] (whole table) and the write
    * path's incremental partition refresh (Δ batch only) share. Honors
    * the index's persisted encoding convention: residual indexes encode
    * (embedding - assigned centroid) under the SAME quantizer every
    * earlier row used.
    */
  def encodeRows(
      spark: SparkSession,
      catalog: Catalog,
      entry: CollectionEntry,
      rows: DataFrame,
      cb: Pq.Codebooks): DataFrame = {
    val dim = cb.size * cb.head.head.length
    if (!exists(IvfIndex.centroidsPath(catalog, entry)))
      return Pq.encode(rows.select("id", "embedding"), dim, cb)
        .withColumn("cluster_id", lit(0L))
    val cents = IvfIndex.loadCentroids(spark, catalog, entry)
    val assigned = Ann.assign(rows.select("id", "embedding", "norm"), cents)
    if (isResidual(spark, catalog, entry)) {
      val residuals = Pq.residualOf(assigned,
        cents.select(col("centroid_id").as("cluster_id"), col("centroid")))
      Pq.encode(residuals.select("id", "embedding"), dim, cb)
        .join(residuals.select(col("id"), col("cluster_id")), "id")
    } else {
      Pq.encode(rows.select("id", "embedding"), dim, cb)
        .join(assigned.select(col("id"), col("cluster_id")), "id")
    }
  }

  /** Re-derive the persisted codes from the CURRENT documents table under
    * the EXISTING persisted codebooks (the quantizer stays fixed, exactly
    * like [[IvfIndex.reassign]]; retraining is an explicit [[build]]).
    */
  def reencode(spark: SparkSession, catalog: Catalog, entry: CollectionEntry): Unit =
    loadCodebooks(spark, catalog, entry).foreach { cb =>
      val docs = catalog.readDocuments(entry)
        .select(col("id"), col("embedding"), col("norm"))
      encodeRows(spark, catalog, entry, docs, cb)
        .repartition(col("cluster_id"))
        .write
        .partitionBy("cluster_id")
        .mode(SaveMode.Overwrite)
        .parquet(indexPath(catalog, entry))
    }

  /** Clusters the given rows would land in — the write path's affected-
    * partition probe (Δ-sized; no index read).
    */
  def clustersOf(
      spark: SparkSession,
      catalog: Catalog,
      entry: CollectionEntry,
      rows: DataFrame): Seq[Long] =
    if (exists(IvfIndex.centroidsPath(catalog, entry))) {
      val cents = IvfIndex.loadCentroids(spark, catalog, entry)
      Ann.assign(rows.select("id", "embedding", "norm"), cents)
        .select("cluster_id").distinct().collect().map(_.getLong(0)).toSeq
    } else Seq(0L)

  private def saveCodebooks(
      spark: SparkSession,
      catalog: Catalog,
      entry: CollectionEntry,
      cb: Pq.Codebooks): Unit = {
    import spark.implicits._
    cb.zipWithIndex.flatMap { case (words, j) =>
      words.zipWithIndex.map { case (w, c) => (j, c, w.toSeq) }
    }.toDF("j", "code", "cw")
      .select(col("j"), col("code"), col("cw").cast("array<float>").as("cw"))
      .coalesce(1)
      .write.mode(SaveMode.Overwrite).parquet(codebooksPath(catalog, entry))
  }

  /** The persisted codebooks, or None when no PQ index was ever built. */
  def loadCodebooks(
      spark: SparkSession,
      catalog: Catalog,
      entry: CollectionEntry): Option[Pq.Codebooks] =
    if (!exists(codebooksPath(catalog, entry))) None
    else {
      val rows = spark.read.parquet(codebooksPath(catalog, entry))
        .select("j", "code", "cw").collect()
        .map(r => (r.getInt(0), r.getInt(1)) -> r.getSeq[Float](2).toArray)
        .toMap
      val m = rows.keys.map(_._1).max + 1
      val k = rows.keys.map(_._2).max + 1
      Some((0 until m).map(j => (0 until k).map(c => rows((j, c)))))
    }

  /** Schema the codes are read back under (declared: see
    * IvfIndex.IndexSchema for why partition-column inference is avoided).
    */
  private val IndexSchema: org.apache.spark.sql.types.StructType = {
    import org.apache.spark.sql.types._
    StructType(Seq(
      StructField("id", StringType),
      StructField("codes", ArrayType(IntegerType)),
      StructField("cluster_id", LongType)))
  }

  def load(spark: SparkSession, catalog: Catalog, entry: CollectionEntry): DataFrame =
    spark.read.schema(IndexSchema).parquet(indexPath(catalog, entry))

  /** Approximate top-k through the persisted index: driver-side probe
    * selection (adaptive, numCandidates oversampling floor — reference
    * mongodb.py:277) over the centroid table, ADC over the probed
    * partitions' codes, exact cosine re-rank of the shortlist against
    * `vectors` (the documents table — the only embedding read).
    */
  def search(
      spark: SparkSession,
      catalog: Catalog,
      entry: CollectionEntry,
      vectors: DataFrame, // (id, embedding, norm)
      queries: Seq[(Int, Seq[Float])],
      k: Int,
      numCandidates: Long,
      oversample: Int = 4): DataFrame = {
    val cb = loadCodebooks(spark, catalog, entry).getOrElse(
      throw new graft.model.GraftException(graft.model.ErrorCodes.AnnIndexNotFound))
    val index = load(spark, catalog, entry)
    val hasCentroids = exists(IvfIndex.centroidsPath(catalog, entry))
    val centroidRows =
      if (!hasCentroids) Array.empty[org.apache.spark.sql.Row]
      else IvfIndex.loadCentroids(spark, catalog, entry)
        .select("centroid_id", "centroid", "centroid_norm").collect()
    val (pruned, probedIds) =
      if (!hasCentroids) (index, Seq.empty[Long])
      else {
        val clusterSizes = index.groupBy("cluster_id").count()
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        val probes = queries.flatMap { case (_, qVec) =>
          val qNorm = math.sqrt(qVec.map(v => v.toDouble * v.toDouble).sum)
          val ranked = centroidRows.map { r =>
            val c = r.getSeq[Float](1)
            val dot = c.zip(qVec).map { case (x, y) => x.toDouble * y.toDouble }.sum
            (1.0 - dot / (r.getDouble(2) * qNorm), r.getLong(0))
          }.sortBy(identity)
          IvfIndex.adaptiveProbes(ranked.toSeq, clusterSizes, numCandidates)
        }.distinct
        (index.filter(col("cluster_id").isin(probes: _*)), probes)
      }
    if (isResidual(spark, catalog, entry)) {
      // residual codes are meaningless without the centroids they were
      // taken against — a missing quantizer is a governed error, not an
      // empty result
      if (!hasCentroids)
        throw new graft.model.GraftException(graft.model.ErrorCodes.AnnIndexNotFound)
      // per-(query, probed-cluster) ADC tables against the SAME centroids
      // the codes were residual-encoded with
      val centroidMap = centroidRows
        .filter(r => probedIds.contains(r.getLong(0)))
        .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
      Pq.searchAdcRerankClustered(pruned.select("id", "codes", "cluster_id"),
        vectors, cb, centroidMap, queries, k, oversample)
    } else
      Pq.searchAdcRerank(pruned.select("id", "codes"), vectors, cb, queries, k, oversample)
  }
}
