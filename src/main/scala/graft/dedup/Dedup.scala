package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.storage.StorageLevel
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions._
import graft.functions.VectorFunctions

/** Corpus deduplication operators — the LLM-training-pipeline extensions
  * (BASELINE.json north_star; beyond the reference's content-hash dedup at
  * vector_api.py:363-366).
  *
  * Dataflow design: everything is EXPLODE + JOIN + AGGREGATE — no nested
  * higher-order functions. Interpreted HOF lambdas re-evaluate free
  * subtrees per element (a shingles-inside-minhash formulation re-ran the
  * tokenizer regex ~6000x per document before this rewrite); the relational
  * shape computes each regex/md5 exactly once per token row and keeps every
  * hot loop inside WholeStageCodegen. It is also the shape that scales:
  * shuffles are keyed (by id / shingle / band bucket), never all-pairs.
  */
object Dedup {

  private val log = org.slf4j.LoggerFactory.getLogger(getClass)

  /** Materialization sink for the adaptive route's output-sized pair
    * frame. The routes persist corpus-derived diagnosis frames and must
    * fully materialize the (much smaller) pair result before releasing
    * them — HOW it materializes is a deployment choice:
    *
    *  - [[PairSink.Local]] (default): `localCheckpoint()` — zero-config
    *    and lineage-free, but blocks live in executor storage, so it is
    *    NOT executor-loss-tolerant on a real cluster.
    *  - [[PairSink.Reliable]]: `checkpoint()` to the session's reliable
    *    checkpoint dir (`sparkContext.setCheckpointDir` — HDFS/S3 in
    *    production). Survives executor loss; the 100 TB default.
    *  - [[PairSink.Table]]: explicit parquet write + read-back — the
    *    pair set becomes a queryable artifact of the pipeline run
    *    (resumable downstream, inspectable, retained on your terms).
    *
    * All three return the identical frame (DedupSpec proves it); only
    * durability and lifecycle differ.
    */
  sealed trait PairSink
  object PairSink {
    case object Local extends PairSink
    case object Reliable extends PairSink
    final case class Table(path: String) extends PairSink
  }

  private[dedup] def materialize(df: DataFrame, sink: PairSink): DataFrame = sink match {
    case PairSink.Local => df.localCheckpoint()
    case PairSink.Reliable =>
      require(df.sparkSession.sparkContext.getCheckpointDir.isDefined,
        "PairSink.Reliable needs sparkContext.setCheckpointDir(...) first")
      df.checkpoint()
    case PairSink.Table(path) =>
      df.write.mode(org.apache.spark.sql.SaveMode.Overwrite).parquet(path)
      df.sparkSession.read.parquet(path)
  }

  /** Exact dedup by content digest: one row per distinct content with the
    * surviving (minimum) id and the duplicate count.
    */
  def exact(docs: DataFrame, idCol: String = "id", contentCol: String = "content"): DataFrame =
    docs
      .select(col(idCol).as("id"), sha2(col(contentCol), 256).as("digest"))
      .groupBy("digest")
      .agg(min("id").as("keep_id"), count(lit(1)).as("n_dups"))

  /** Distinct word n-gram shingle ROWS per document: (id, sh).
    *
    * Shingle assembly happens per document inside array functions: the
    * tokenizer regex runs once per document into a materialized `toks`
    * column (its own projection, so CollapseProject cannot inline the regex
    * into the lambda — it is referenced more than once and is not cheap),
    * then [[TextFunctions.shingles]] slides over the array and
    * `array_distinct` dedups IN PLACE. Compared to the previous
    * window(lead)-based formulation this needs NO shuffle at all — no
    * partitionBy(id) sort for the window and no global distinct — so the
    * operator scales embarrassingly-parallel with the scan and cannot spill.
    * Per-document distinct equals the global (id, sh) distinct.
    */
  def shingleRows(docs: DataFrame, n: Int = 3): DataFrame =
    shingleSets(docs, n).select(col("id"), explode(col("shs")).as("sh"))

  /** Per-document distinct shingle SETS: (id, shs: array<string>, len).
    * The doc-level (un-exploded) form of [[shingleRows]] — same scan, no
    * shuffle; `len == size(shs)` is the set cardinality every Jaccard
    * denominator needs. Arrays are SORTED (once per document, here) so
    * per-pair verification can merge-count intersections instead of
    * building hash sets; row consumers (explode targets) are all
    * order-insensitive aggregates/joins.
    */
  def shingleSets(docs: DataFrame, n: Int = 3): DataFrame =
    docs
      .select(col("id"), tokens(col("content")).as("toks"))
      .select(col("id"), sort_array(shingles(col("toks"), n)).as("shs"))
      .withColumn("len", size(col("shs")))

  /** CJK codepoint class (kana + Han incl. ext A) as a Java-regex body.
    * Explicit \\uXXXX ranges — NOT \\p{script=...} — so the DuckDB oracle's
    * RE2 \\x{...} form denotes bit-identical codepoint sets regardless of
    * either engine's Unicode table version.
    */
  private[dedup] val CjkClass = "\\u3040-\\u30ff\\u3400-\\u4dbf\\u4e00-\\u9fff"

  /** Script-routed shingle sets for MULTILINGUAL corpora: (id, shs, len).
    *
    * The §2-parity tokenizer is the reference's own `[a-z0-9_]{2,}` casefold
    * (epistemic_graph.py:55) — correct for parity, but a no-space-script
    * document (CJK han/kana) tokenizes to an EMPTY set, so near-dup
    * detection silently no-ops on the majority of a real multilingual web
    * corpus. This mode routes per DOCUMENT:
    *   - char mode (≥30% CJK among non-space chars): overlapping character
    *     `charN`-grams over the lowercased text stripped to [a-z0-9]+CJK —
    *     the standard shingle unit where whitespace carries no word
    *     boundary (integer 10·cjk ≥ 3·nonspace comparison: no float fuzz,
    *     oracle-exact);
    *   - word mode otherwise: `[\p{L}0-9_]{2,}` word tokens (the \p{L}
    *     class covers accented Latin/Greek/Cyrillic/Arabic/Hebrew words the
    *     ASCII canon drops) joined into `wordN`-gram shingles.
    * Routing is a per-row `when()` — one scan, no shuffle, same downstream
    * contract as [[shingleSets]], so every pair generator (plain inverted
    * index, PPJoin prefix, adaptive) composes unchanged via
    * [[ngramJaccardFromSets]].
    */
  def shingleSetsMultiscript(
      docs: DataFrame, wordN: Int = 3, charN: Int = 3): DataFrame = {
    val lowered = lower(col("content"))
    val cjkChars = length(regexp_replace(lowered, s"[^$CjkClass]", ""))
    val nonSpace = length(regexp_replace(lowered, "\\s", ""))
    val charSrc = regexp_replace(lowered, s"[^a-z0-9$CjkClass]", "")
    // native CharNgrams, NOT a transform() lambda: the HOF form would
    // re-run the regexp_replace normalization once per n-gram (the
    // documented TextExpressions projection-collapse trap)
    val charSh = graft.functions.TextExpressions.charNgrams(charSrc, charN)
    val wordToks = regexp_extract_all(lowered, lit("[\\p{L}0-9_]{2,}"), lit(0))
    val wordSh = graft.functions.TextFunctions.shingles(wordToks, wordN)
    docs
      .select(col("id"),
        sort_array(array_distinct(
          when(cjkChars * 10 >= nonSpace * 3, charSh).otherwise(wordSh))).as("shs"))
      .withColumn("len", size(col("shs")))
  }

  /** Exact Jaccard near-dup pairs over the script-routed shingle sets —
    * [[ngramJaccard]]'s multilingual sibling. Same inverted-index pair
    * generation ([[ngramJaccardFromSets]]); only the shingle unit routes.
    */
  def multiscriptNearDups(
      docs: DataFrame, threshold: Double,
      wordN: Int = 3, charN: Int = 3): DataFrame = {
    val sets = shingleSetsMultiscript(docs, wordN, charN).persist(StorageLevel.MEMORY_ONLY)
    // pairs are output-sized; materializing them inside the try lets the
    // shingle frame unpersist deterministically (the adaptive-route pattern)
    try ngramJaccardFromSets(sets, threshold).localCheckpoint()
    finally sets.unpersist()
  }

  /** Deterministic MinHash permutation constants (fixed, engine-versioned). */
  val MinHashSeeds: Seq[(Long, Long)] = {
    val p = MinHashP
    (1 to 32).map { i =>
      val a = (2654435761L * i + 1013904223L) % p
      val b = (1103515245L * i + 12345L) % p
      (if (a == 0) 1L else a, b)
    }
  }

  /** MinHash signatures from shingle rows: md5 once per (id, shingle) row,
    * then 32 codegen'd MIN aggregates. Output: (id, n_sh, m0..m31).
    */
  def minHashSignatures(sh: DataFrame): DataFrame = {
    val hashed = sh.withColumn("h", stableHash32(col("sh")))
    val aggs = count(lit(1)).as("n_sh") +:
      MinHashSeeds.zipWithIndex.map { case ((a, b), i) =>
        min((lit(a) * col("h") + lit(b)) % lit(MinHashP)).as(s"m$i")
      }
    hashed.groupBy("id").agg(aggs.head, aggs.tail: _*)
  }

  /** LSH candidate pairs + exact-Jaccard verification.
    *
    * bands=16 x rows=2 over 32 hashes: P(candidate | J) = 1-(1-J^2)^16,
    * ~1 at J>=0.8 (miss probability < 1e-11 at J=0.9), so for corpora whose
    * near-dups sit well above the threshold the verified output equals the
    * exact all-pairs answer. Every candidate is verified with exact Jaccard
    * (shared-shingle count via the inverted index) before emission.
    *
    * Shuffles: signature groupBy, band-bucket groupBy, verify join — all
    * keyed. Bucket skew is bounded by `maxBucketSize`.
    */
  def minHashNearDups(
      docs: DataFrame,
      threshold: Double = 0.6,
      shingleN: Int = 3,
      bands: Int = 16,
      maxBucketSize: Int = 1000): DataFrame = {
    val sets = shingleSets(docs, shingleN).persist(StorageLevel.MEMORY_ONLY)
    // verified pairs are output-sized; materialize before the shingle
    // frame unpersists (the adaptive-route cleanup pattern)
    try minHashNearDupsFromSets(sets, threshold, bands, maxBucketSize).localCheckpoint()
    finally sets.unpersist()
  }

  /** [[minHashNearDups]] over an ALREADY-PERSISTED shingle frame — the
    * un-checkpointed dataflow (plan-inspectable; PlanSpec audits the
    * candidate joins here). Caller owns the persist lifetime.
    */
  private[graft] def minHashNearDupsFromSets(
      sets: DataFrame,
      threshold: Double,
      bands: Int = 16,
      maxBucketSize: Int = 1000): DataFrame = {
    val sigs = minHashSignatures(sets.select(col("id"), explode(col("shs")).as("sh")))
    val rowsPerBand = MinHashSeeds.size / bands
    val bandKeys = (0 until bands).map { b =>
      concat_ws("_", (0 until rowsPerBand).map(r => col(s"m${b * rowsPerBand + r}")): _*)
    }
    val banded = sigs.select(col("id"),
      posexplode(array(bandKeys: _*)).as(Seq("band", "bucket")))
    verifyJaccard(bucketPairs(banded, "band", "bucket", maxBucketSize), sets, threshold)
  }

  /** Bipartite MinHash+LSH near-dup join ACROSS two corpora — "which
    * incoming documents near-duplicate the reference corpus" (dedup of a
    * new crawl against an existing training set, the cross-snapshot
    * CC-dedup shape), without ever comparing either corpus to itself.
    *
    * Same signature scheme, band math, and recall argument as
    * [[minHashNearDups]] (P(candidate | J) = 1-(1-J^2)^16 over 16x2
    * bands), but candidates come from an INNER equi-join of the two
    * sides' (band, bucket) rows, so the candidate volume is
    * output-shaped: buckets present on only one side produce nothing
    * (no singleton-window pass needed), and the per-side stop-bucket
    * guard bounds skew exactly like [[bucketPairs]]. `a` is always the
    * left corpus id, `b` the right — ids may collide across corpora
    * (the same document in both sides is a legitimate cross-match), so
    * no a<b canonicalization applies. Every candidate is verified with
    * exact Jaccard before emission.
    */
  def minHashNearDupsAcross(
      left: DataFrame,
      right: DataFrame,
      threshold: Double = 0.6,
      shingleN: Int = 3,
      bands: Int = 16,
      maxBucketSize: Int = 1000): DataFrame = {
    val setsL = shingleSets(left, shingleN).persist(StorageLevel.MEMORY_ONLY)
    val setsR = shingleSets(right, shingleN).persist(StorageLevel.MEMORY_ONLY)
    try {
    val rowsPerBand = MinHashSeeds.size / bands
    def bandedOf(sets: DataFrame): DataFrame = {
      val sigs = minHashSignatures(sets.select(col("id"), explode(col("shs")).as("sh")))
      val bandKeys = (0 until bands).map { b =>
        concat_ws("_", (0 until rowsPerBand).map(r => col(s"m${b * rowsPerBand + r}")): _*)
      }
      sigs.select(col("id"), posexplode(array(bandKeys: _*)).as(Seq("band", "bucket")))
    }
    def eligible(banded0: DataFrame): DataFrame = {
      // one materialization per side: the banded frame feeds the
      // stop-bucket count AND the probe — left lazy, each side's whole
      // signature computation re-executes per consumer (the bucketPairs
      // lesson; the frame is the side's LSH index table, linear-sized)
      val banded = banded0.localCheckpoint()
      val oversized = banded.groupBy("band", "bucket").agg(count(lit(1)).as("__n"))
        .filter(col("__n") > maxBucketSize)
        .select("band", "bucket")
      banded.join(broadcast(oversized), Seq("band", "bucket"), "left_anti")
    }
    val cands = eligible(bandedOf(setsL)).select(col("band"), col("bucket"), col("id").as("a"))
      .join(eligible(bandedOf(setsR)).select(col("band"), col("bucket"), col("id").as("b")),
        Seq("band", "bucket"))
      .select("a", "b").distinct()
    cands
      .join(setsL.select(col("id").as("a"), col("shs").as("sha"), col("len").as("la")), "a")
      .join(setsR.select(col("id").as("b"), col("shs").as("shb"), col("len").as("lb")), "b")
      .withColumn("inter",
        graft.functions.VectorExpressions.sortedIntersectCount(col("sha"), col("shb")))
      .withColumn("jaccard",
        col("inter").cast("double") / (col("la") + col("lb") - col("inter")).cast("double"))
      .filter(col("jaccard") >= threshold)
      .select("a", "b", "jaccard")
      // cross-matches are output-sized; materialize before both shingle
      // frames unpersist (the adaptive-route cleanup pattern)
      .localCheckpoint()
    } finally { setsL.unpersist(); setsR.unpersist() }
  }

  /** Distinct candidate pairs (a < b) from rows sharing a (block, key)
    * bucket, as a KEYED SELF-JOIN. The earlier collect_list + nested-HOF
    * pair expansion materialized up to maxBucketSize^2 structs in ONE array
    * per bucket on a single task; the join shape streams the same pairs
    * through a hash join and scales with executors. Two guards drop
    * non-pair-producing buckets before the join: oversized stop buckets
    * (> maxBucketSize) go first via a partial-aggregated blacklist
    * (skew-immune: map-side combine collapses a hot bucket to one count
    * row; only the tiny oversized key set broadcasts back as an
    * anti-join), then singleton buckets drop via a bucket-count WINDOW
    * over the same (block, key) partitioning the self-join shuffles on —
    * the window rides the join's own exchange, and with stop buckets
    * already gone its largest group is bounded by maxBucketSize.
    */
  private[graft] def bucketPairs(
      banded: DataFrame, // (id, <blockCol>, <keyCol>)
      blockCol: String,
      keyCol: String,
      maxBucketSize: Int): DataFrame = {
    require(banded.columns.contains(blockCol) && banded.columns.contains(keyCol),
      s"bucketPairs needs ($blockCol, $keyCol) in ${banded.columns.mkString(",")}")
    val keyCols = Seq(col(blockCol), col(keyCol))
    val keyNames = Seq(blockCol, keyCol)
    // Materialize the banded frame ONCE: it feeds the stop-bucket count
    // AND the self-join's two legs, and its upstream is typically the
    // whole signature computation (MinHash: 32 permutation mins over
    // every (doc, shingle) row) — left lazy, that computation re-executes
    // per consumer (measured 3x on q_dedup_minhash: three ~32-task
    // signature stages per run). The frame is the LSH index table itself
    // (docs x bands narrow rows — the thing a production index PERSISTS),
    // so one eager materialization is the at-scale shape too.
    val bandedM = banded.localCheckpoint()
    // Stop buckets are excluded BEFORE the window: the window's
    // partitionBy ships every row of a bucket to one task, so a 100M-row
    // stop bucket would be a single-task straggler exactly on the skewed
    // input the guard exists for. The blacklist count is a partial
    // aggregate (map-side combine collapses the hot bucket before its
    // shuffle) and only oversized keys — a tiny set by construction —
    // broadcast back as an anti-join. On corpora with no stop buckets the
    // blacklist is empty and the anti-join is a no-op probe.
    val oversized = bandedM.groupBy(keyCols: _*).agg(count(lit(1)).as("__n"))
      .filter(col("__n") > maxBucketSize)
      .select(keyCols: _*)
    val sizeW = org.apache.spark.sql.expressions.Window.partitionBy(keyCols: _*)
    val eligible = bandedM
      .join(broadcast(oversized), keyNames, "left_anti")
      .withColumn("bsz", count(lit(1)).over(sizeW))
      .filter(col("bsz") >= 2)
      .drop("bsz")
    eligible.as("x").join(eligible.as("y"),
        keyNames.map(c => col(s"x.$c") === col(s"y.$c"))
          .reduce(_ && _) && col("x.id") < col("y.id"))
      .select(col("x.id").as("a"), col("y.id").as("b"))
      .distinct()
  }

  /** Re-spread an under-partitioned frame whose DOWNSTREAM per-row cost
    * is heavy (verify intersections, edit-distance DP): a checkpointed or
    * AQE-coalesced candidate frame often sits at 1-2 partitions because
    * coalescing targets bytes, serializing the verify stage onto one
    * core. Keyed (deterministic) exchange, no-op when already wide.
    */
  private[dedup] def spreadByKeys(df: DataFrame, keys: org.apache.spark.sql.Column*): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    df.queryExecution.logical match {
      // ONLY for checkpointed frames: their partition count is a plain
      // RDD property. Asking a LAZY adaptive plan for partitions
      // (df.rdd.getNumPartitions) EXECUTES its whole stage DAG as a
      // throwaway run — measured +30-50% on the minhash-route queries —
      // and un-checkpointed candidates keep AQE's own sizing anyway.
      case lr: org.apache.spark.sql.execution.LogicalRDD
          if lr.rdd.getNumPartitions < target =>
        df.repartition(target, keys: _*)
      case _ => df
    }
  }

  /** Exact Jaccard for candidate pairs: two keyed joins fetch each side's
    * shingle SET ([[shingleSets]] sorted arrays), then a native merge-count
    * ([[VectorExpressions.SortedIntersectCount]]) computes the overlap
    * IN-ROW. The earlier inverted-index verify expanded every pair by
    * |sh(a)| rows and re-aggregated (a near-dup-heavy corpus put ~50x the
    * candidate count through an extra shuffle); this shape's shuffle is
    * exactly candidate-sized and the intersection is an allocation-free
    * O(|a|+|b|) scan inside codegen — cheap enough that the optimizer
    * collapsing the jaccard filter into the join condition (which
    * re-evaluates it per probed row) does not hurt. Both joins are plain
    * equi-joins on id — broadcast when the doc-set side is small,
    * shuffle-hash otherwise, output-proportional either way.
    */
  private[dedup] def verifyJaccard(cands: DataFrame, sets: DataFrame, threshold: Double): DataFrame =
    // spread the candidate frame first: it usually arrives as a
    // checkpointed/AQE-coalesced frame of 1-2 partitions (coalescing
    // targets BYTES, and a pair row is ~16 bytes), but each row costs an
    // O(|shs|) intersect below — traced as ONE ~4-5 s task out of a
    // 6.5 s q_dedup_ngram_prefix run. One output-sized keyed exchange
    // buys a verify stage that scales with the session's cores.
    spreadByKeys(cands, col("a"), col("b"))
      .join(sets.select(col("id").as("a"), col("shs").as("sha"), col("len").as("la")), "a")
      .join(sets.select(col("id").as("b"), col("shs").as("shb"), col("len").as("lb")), "b")
      .withColumn("inter",
        graft.functions.VectorExpressions.sortedIntersectCount(col("sha"), col("shb")))
      .withColumn("jaccard",
        col("inter").cast("double") / (col("la") + col("lb") - col("inter")).cast("double"))
      .filter(col("jaccard") >= threshold)
      .select("a", "b", "jaccard")

  /** SimHash near-dups: 32-bit fingerprints from exploded token rows
    * (md5 once per token, 32 codegen'd conditional sums), block-combination
    * blocking, hamming verify. Exact w.r.t. the simhash fingerprints.
    *
    * Blocking (Manku et al., WWW'07 §3): the fingerprint splits into
    * `blocks` nearly-even bit slices; `maxHamming` errors corrupt at most
    * `maxHamming` slices, so at least `blocks - maxHamming` slices are
    * clean and the key concatenating those slices matches exactly. One
    * candidate table per C(blocks, blocks-maxHamming) slice combination.
    * At blocks = maxHamming+1 this degenerates to classic single-slice
    * pigeonhole banding; LARGER `blocks` trades more tables for much
    * wider keys — e.g. d=3: blocks=4 gives 4 tables of 8-bit keys (256
    * buckets, ~N^2/512 candidate pairs), blocks=6 gives 20 tables of
    * 16/17-bit keys (~N^2·20/2^17 pairs — ~50x fewer at N=50k, and the
    * gap widens with N). Candidate volume, not verify cost, dominates
    * this operator, so the default is blocks=6.
    *
    * Scale shape: candidate generation runs over DISTINCT fingerprints, not
    * documents. Near-dup corpora collapse many documents onto one
    * fingerprint, so doc-level banded self-joins grow quadratically with
    * dup-group size while the fingerprint-level join is capped by |distinct
    * fp| (<= 2^32) regardless of corpus size. The hamming filter runs
    * INSIDE the join stage (pipelined, before any dedup shuffle), so only
    * surviving fingerprint pairs — output-sized, not candidate-sized — ever
    * shuffle. Doc pairs are then recovered by two keyed equi-joins on fp
    * (cross-fingerprint pairs) plus a keyed self-join on fp (identical
    * fingerprints, hamming 0); both are output-proportional.
    */
  def simHashNearDups(
      docs: DataFrame,
      maxHamming: Int = 3,
      blocks: Int = 6,
      max32BitDocs: Long = 4000L,
      sizeHint: Option[Long] = None): DataFrame = {
    require(maxHamming < blocks && blocks <= 32,
      "pigeonhole guarantee needs maxHamming < blocks <= 32")
    // birthday guard (measured on the r5 sweep: at 5k prose docs the
    // 32-bit measure already emits 104k hamming<=3 pairs where the 64-bit
    // fingerprint finds 932 true near-dups; at 320k docs the 32-bit run
    // was 48.7s of mostly-spurious output): above the cutoff route to the
    // 64-bit fingerprint variant, whose space stays unsaturated to ~10^9.
    // The cutoff sits BELOW the 5k point where saturation is already
    // measured — r5's 10k default left a 5k corpus on the saturated path,
    // paying 104k-pair candidate joins for output that is >99% noise.
    // SimHash near-dup is a recall-oriented candidate measure, so the wider
    // fingerprint is the documented semantics at corpus scale; callers
    // needing 32-bit behavior regardless can raise max32BitDocs.
    //
    // Single upstream pass: fp_hi of the 64-bit fingerprint is the SAME
    // aggregation as the 32-bit fp (same token hash, same bit fold), so the
    // routing count runs over the persisted narrow fingerprint frame — the
    // count materializes the cache and whichever route wins reads from it;
    // the upstream plan (possibly an expensive parsed/filtered corpus)
    // executes exactly once. A caller-supplied sizeHint skips even that.
    val fp64 = simHashFingerprints64(docs).persist(StorageLevel.MEMORY_ONLY)
    try {
      val n = sizeHint.getOrElse(fp64.count())
      val pairs = if (n > max32BitDocs) {
        log.info(s"simHashNearDups: $n docs > max32BitDocs=$max32BitDocs, routing to 64-bit fingerprint")
        simHash64NearDupsFromFingerprints(fp64, maxHamming, blocks = 4)
      } else {
        log.info(s"simHashNearDups: $n docs <= max32BitDocs=$max32BitDocs, 32-bit fingerprint")
        simHashNearDups32FromFingerprints(
          fp64.select(col("id"), col("fp_hi").as("fp")), maxHamming, blocks)
      }
      // candidate pairs are output-sized; materialize before the
      // fingerprint frame unpersists (the adaptive-route cleanup pattern)
      pairs.localCheckpoint()
    } finally fp64.unpersist()
  }

  /** 32-bit candidate generation over a precomputed (id, fp) frame (cached
    * by [[simHashNearDups]]; re-references below are cache reads).
    */
  private[graft] def simHashNearDups32FromFingerprints(
      fp: DataFrame,
      maxHamming: Int,
      blocks: Int): DataFrame = {
    val fps = fp.select("fp").distinct()
    val widths = (0 until blocks).map(i => 32 / blocks + (if (i < 32 % blocks) 1 else 0))
    val offsets = widths.scanLeft(0)(_ + _)
    def blockVal(b: Int): Column =
      call_function("shiftright", col("fp"), lit(offsets(b))) % (1L << widths(b))
    // one key per slice combination: clean slices concatenated into a long
    // (injective: each slice lands at its cumulative-width bit offset)
    val comboKeys = (0 until blocks).combinations(blocks - maxHamming).toSeq.map { combo =>
      combo.foldLeft((lit(0L), 0)) { case ((acc, at), b) =>
        (acc + blockVal(b) * lit(1L << at), at + widths(b))
      }._1
    }
    val banded = fps.select(
      col("fp"),
      posexplode(array(comboKeys: _*)).as(Seq("block", "key")))
    val fpPairs = banded.as("x").join(banded.as("y"),
        col("x.block") === col("y.block") && col("x.key") === col("y.key") &&
          col("x.fp") < col("y.fp"))
      .select(col("x.fp").as("fp_a"), col("y.fp").as("fp_b"))
      .withColumn("hamming", hamming(col("fp_a"), col("fp_b")))
      .filter(col("hamming") <= maxHamming)
      .distinct()
    val cross = fpPairs
      .join(fp.select(col("id").as("ia"), col("fp").as("fp_a")), "fp_a")
      .join(fp.select(col("id").as("ib"), col("fp").as("fp_b")), "fp_b")
      .select(least(col("ia"), col("ib")).as("a"),
        greatest(col("ia"), col("ib")).as("b"), col("hamming"))
    val same = fp.as("x").join(fp.as("y"),
        col("x.fp") === col("y.fp") && col("x.id") < col("y.id"))
      .select(col("x.id").as("a"), col("y.id").as("b"),
        hamming(col("x.fp"), col("y.fp")).as("hamming"))
    cross.unionByName(same)
  }

  /** 32-bit SimHash per document: bit i set iff the tf-weighted sum of
    * (+1/-1 by bit i of each token hash) is positive. (id, fp).
    */
  def simHashFingerprints(docs: DataFrame): DataFrame = {
    val toks = docs
      .select(col("id"), explode(tokens(col("content"))).as("tok"))
      .withColumn("h", stableHash32(col("tok")))
    val bitAggs = (0 until 32).map { i =>
      sum(when(call_function("shiftright", col("h"), lit(i)) % 2 === 1, 1L)
        .otherwise(-1L)).as(s"b$i")
    }
    toks.groupBy("id").agg(bitAggs.head, bitAggs.tail: _*)
      .select(col("id"),
        (0 until 32).map(i =>
          when(col(s"b$i") > 0, lit(1L << i)).otherwise(lit(0L)))
          .reduce(_ + _).as("fp"))
  }

  /** 64-bit SimHash near-dups — the corpus-scale variant of
    * [[simHashNearDups]]. 32-bit fingerprints saturate by birthday
    * collision once |distinct fp| approaches 2^16·sqrt-scale corpora
    * (hundreds of thousands of documents produce spurious hamming<=3
    * pairs between unrelated texts, and the 8-bit band keys degrade into
    * 256 giant buckets); 64 bits push both cliffs out by a factor of
    * 2^32. Default blocks=4 (classic pigeonhole, 16-bit keys): the
    * 64-bit space stays unsaturated to ~10^9 distinct fingerprints, and
    * the C(6,3)=20-table combination layout costs 5x the banding rows
    * for sharpness those corpora don't need (measured 1.7x slower at
    * 320k docs). blocks=6 (32/33-bit combo keys, see [[simHashNearDups]])
    * is the knob for corpora past ~10^8 distinct fingerprints, where
    * 16-bit buckets themselves start crowding.
    *
    * The fingerprint is held as two 32-bit halves (hi = md5 hex 1-8,
    * lo = hex 9-16) so every number stays inside SIGNED 64-bit range in
    * both Spark and the DuckDB oracle; hamming = popcount(hi xor hi') +
    * popcount(lo xor lo'). Same candidate shape as the 32-bit operator:
    * banding over DISTINCT fingerprints, hamming filter inside the join,
    * doc pairs recovered by keyed equi-joins.
    */
  def simHash64NearDups(
      docs: DataFrame,
      maxHamming: Int = 3,
      blocks: Int = 4): DataFrame = {
    val fp = simHashFingerprints64(docs).persist(StorageLevel.MEMORY_ONLY)
    try simHash64NearDupsFromFingerprints(fp, maxHamming, blocks).localCheckpoint()
    finally fp.unpersist()
  }

  /** 64-bit candidate generation over a precomputed (id, fp_hi, fp_lo)
    * frame (cached by the caller; re-references below are cache reads).
    */
  private[graft] def simHash64NearDupsFromFingerprints(
      fp: DataFrame,
      maxHamming: Int,
      blocks: Int): DataFrame = {
    require(maxHamming < blocks, "pigeonhole guarantee needs maxHamming < blocks")
    require(blocks % 2 == 0 && blocks <= 64,
      s"blocks=$blocks must be even (half the slices per 32-bit half) and <= 64")
    val fps = fp.select("fp_hi", "fp_lo").distinct()
    // blocks/2 nearly-even slices per 32-bit half; slice widths sum to 32.
    val perHalf = blocks / 2
    val widths = (0 until perHalf).map(i => 32 / perHalf + (if (i < 32 % perHalf) 1 else 0))
    val offsets = widths.scanLeft(0)(_ + _)
    def blockVal(b: Int): Column = {
      val half = if (b < perHalf) col("fp_lo") else col("fp_hi")
      val i = if (b < perHalf) b else b - perHalf
      call_function("shiftright", half, lit(offsets(i))) % (1L << widths(i))
    }
    def widthOf(b: Int): Int = widths(if (b < perHalf) b else b - perHalf)
    // combination keys (same guarantee as the 32-bit form): one table per
    // C(blocks, blocks-maxHamming) slice combo; combos of <= 48 bits of
    // slices (blocks=6, d=3) stay inside a signed long
    val comboKeys = (0 until blocks).combinations(blocks - maxHamming).toSeq.map { combo =>
      combo.foldLeft((lit(0L), 0)) { case ((acc, at), b) =>
        (acc + blockVal(b) * lit(1L << at), at + widthOf(b))
      }._1
    }
    require(comboKeys.nonEmpty &&
      (0 until blocks).combinations(blocks - maxHamming)
        .forall(_.map(widthOf).sum <= 62),
      "combo key must fit a signed long; raise blocks or maxHamming")
    val banded = fps.select(
      col("fp_hi"), col("fp_lo"),
      posexplode(array(comboKeys: _*)).as(Seq("block", "key")))
    val ham = hamming(col("x.fp_hi"), col("y.fp_hi")) +
      hamming(col("x.fp_lo"), col("y.fp_lo"))
    val fpPairs = banded.as("x").join(banded.as("y"),
        col("x.block") === col("y.block") && col("x.key") === col("y.key") &&
          (col("x.fp_hi") < col("y.fp_hi") ||
            (col("x.fp_hi") === col("y.fp_hi") && col("x.fp_lo") < col("y.fp_lo"))))
      .withColumn("hamming", ham)
      .filter(col("hamming") <= maxHamming)
      .select(col("x.fp_hi").as("ha"), col("x.fp_lo").as("la"),
        col("y.fp_hi").as("hb"), col("y.fp_lo").as("lb"), col("hamming"))
      .distinct()
    val cross = fpPairs
      .join(fp.select(col("id").as("ia"), col("fp_hi").as("ha"), col("fp_lo").as("la")),
        Seq("ha", "la"))
      .join(fp.select(col("id").as("ib"), col("fp_hi").as("hb"), col("fp_lo").as("lb")),
        Seq("hb", "lb"))
      .select(least(col("ia"), col("ib")).as("a"),
        greatest(col("ia"), col("ib")).as("b"), col("hamming"))
    val same = fp.as("x").join(fp.as("y"),
        col("x.fp_hi") === col("y.fp_hi") && col("x.fp_lo") === col("y.fp_lo") &&
          col("x.id") < col("y.id"))
      .select(col("x.id").as("a"), col("y.id").as("b"), lit(0).as("hamming"))
    cross.unionByName(same)
  }

  /** 64-bit SimHash per document as two 32-bit halves: bit i of each half
    * set iff the tf-weighted sum of (+1/-1 by bit i of that half's token
    * hash) is positive. (id, fp_hi, fp_lo).
    */
  def simHashFingerprints64(docs: DataFrame): DataFrame = {
    val toks = docs
      .select(col("id"), explode(tokens(col("content"))).as("tok"))
      .withColumn("hh", stableHash32(col("tok")))
      .withColumn("hl", graft.functions.TextFunctions.stableHash32b(col("tok")))
    def bitAggs(h: String, p: String) = (0 until 32).map { i =>
      sum(when(call_function("shiftright", col(h), lit(i)) % 2 === 1, 1L)
        .otherwise(-1L)).as(s"$p$i")
    }
    val aggs = bitAggs("hh", "h") ++ bitAggs("hl", "l")
    def fold(p: String) = (0 until 32).map(i =>
      when(col(s"$p$i") > 0, lit(1L << i)).otherwise(lit(0L))).reduce(_ + _)
    toks.groupBy("id").agg(aggs.head, aggs.tail: _*)
      .select(col("id"), fold("h").as("fp_hi"), fold("l").as("fp_lo"))
  }

  /** Exact n-gram Jaccard over the shingle inverted index: pairs sharing at
    * least one shingle get their intersection counted by a groupBy — the
    * all-pairs cross join never materializes.
    */
  def ngramJaccard(
      docs: DataFrame,
      threshold: Double,
      shingleN: Int = 3,
      maxShingleDf: Int = Int.MaxValue): DataFrame = {
    val sets = shingleSets(docs, shingleN).persist(StorageLevel.MEMORY_ONLY)
    try ngramJaccardFromSets(sets, threshold, maxShingleDf).localCheckpoint()
    finally sets.unpersist()
  }

  /** [[ngramJaccard]] over an ALREADY-PERSISTED shingle frame — the reuse
    * seam for [[ngramJaccardAdaptive]], whose diagnosis pass has the frame
    * cached already; re-shingling the corpus in the chosen route would
    * triple the dominant scan at 100 TB. Caller owns the persist.
    */
  private[graft] def ngramJaccardFromSets(
      sets: DataFrame,
      threshold: Double,
      maxShingleDf: Int = Int.MaxValue): DataFrame = {
    val sh = sets.select(col("id"), explode(col("shs")).as("sh"))
    val sizes = sets.select(col("id"), col("len")) // set cardinality, no shuffle
    // Skew guard for the inverted join: a shingle shared by d documents
    // contributes d^2 candidate pairs, so one stop-shingle can explode the
    // join. maxShingleDf drops such shingles from PAIR GENERATION only
    // (sizes keep them), which can only shrink reported intersections —
    // i.e. a documented under-count for pathological corpora, exact
    // (default: no cap) otherwise. The standard stop-shingle treatment.
    val joinSh =
      if (maxShingleDf == Int.MaxValue) sh
      else sh.join(
        sh.groupBy("sh").agg(count(lit(1)).as("df"))
          .filter(col("df") <= maxShingleDf).select("sh"),
        Seq("sh"), "left_semi")
    val co = joinSh.as("x").join(joinSh.as("y"),
        col("x.sh") === col("y.sh") && col("x.id") < col("y.id"))
      .groupBy(col("x.id").as("a"), col("y.id").as("b"))
      .agg(count(lit(1)).as("inter"))
    co
      .join(sizes.select(col("id").as("a"), col("len").as("la")), "a")
      .join(sizes.select(col("id").as("b"), col("len").as("lb")), "b")
      .withColumn("jaccard",
        col("inter").cast("double") /
          (col("la") + col("lb") - col("inter")).cast("double"))
      .filter(col("jaccard") >= threshold)
      .select("a", "b", "jaccard")
  }

  /** Asymmetric within-corpus containment pairs — quote/subset detection:
    * `|Sa ∩ Sb| / |Sa| >= t` flags documents largely CONTAINED in another
    * even when symmetric Jaccard stays low (a tweet quoted inside an
    * article never clears a Jaccard cutoff; its containment is ~1). The
    * directed sibling of [[ngramJaccard]] (same inverted-index join and
    * stop-shingle guard semantics) and the within-corpus form of
    * [[containment]]'s train-vs-eval check. Emits BOTH directions of each
    * co-occurring pair — the candidate join still generates each
    * unordered pair once; the direction fan-out is output-sized.
    */
  def ngramContainmentPairs(
      docs: DataFrame,
      threshold: Double,
      shingleN: Int = 3,
      maxShingleDf: Int = Int.MaxValue): DataFrame = {
    val sets = shingleSets(docs, shingleN).persist(StorageLevel.MEMORY_ONLY)
    try {
      val sh = sets.select(col("id"), explode(col("shs")).as("sh"))
      val sizes = sets.select(col("id"), col("len"))
      val joinSh =
        if (maxShingleDf == Int.MaxValue) sh
        else sh.join(
          sh.groupBy("sh").agg(count(lit(1)).as("df"))
            .filter(col("df") <= maxShingleDf).select("sh"),
          Seq("sh"), "left_semi")
      val co = joinSh.as("x").join(joinSh.as("y"),
          col("x.sh") === col("y.sh") && col("x.id") < col("y.id"))
        .groupBy(col("x.id").as("a"), col("y.id").as("b"))
        .agg(count(lit(1)).as("inter"))
        .join(sizes.select(col("id").as("a"), col("len").as("la")), "a")
        .join(sizes.select(col("id").as("b"), col("len").as("lb")), "b")
      co.select(col("a").as("src"), col("b").as("dst"), col("inter"), col("la").as("src_len"))
        .unionByName(
          co.select(col("b").as("src"), col("a").as("dst"), col("inter"), col("lb").as("src_len")))
        .withColumn("containment",
          col("inter").cast("double") / col("src_len").cast("double"))
        .filter(col("containment") >= threshold)
        .select("src", "dst", "containment")
        // directed pairs are output-sized; materialize before the shingle
        // frame unpersists (the adaptive-route cleanup pattern)
        .localCheckpoint()
    } finally sets.unpersist()
  }

  /** [[ngramContainmentPairs]] with one-sided prefix + size filtering —
    * identical results, the 100 TB candidate path. The containment
    * adaptation of the prefix-filter machinery: C(a→b) ≥ t needs
    * |Sa∩Sb| ≥ ceil(t·|Sa|), so (prefix) a must share a shingle within
    * its |Sa| − ceil(t·|Sa|) + 1 globally-RAREST shingles — the probe
    * side alone is prefix-filtered; (size) the dst must have at least
    * ceil(t·|Sa|) shingles at all. Stop shingles fall out of probe
    * prefixes by construction, which kills the d² candidate blowup the
    * plain form inherits (measured 139.6 s at the 64× sweep point).
    *
    * The indexed side stays the RAW shingle frame — no df join, no
    * per-document rank window, no materialization. A first cut ranked
    * BOTH sides (to add PPJoin's positional bound on the indexed side,
    * mirroring [[ngramJaccardPrefix]]'s symmetric form) and was SLOWER
    * than the plain form it was meant to fix (343 s vs 139.6 s at the
    * 64× sweep point): a contained doc may sit anywhere in its
    * container's rarity order, so the indexed side cannot be
    * prefix-shrunk, and windowing + checkpointing the full corpus-sized
    * shingle frame costs more than the y-rank positional term ever
    * prunes. One window over the probe side only; the probe prefix's
    * low-df shingles bound the join fan-out on their own.
    */
  /** Ceiling on exact df-frame entries below which the frame is
    * broadcast into the prefix join. The df frame holds one 16-byte
    * (hash, count) row per DISTINCT shingle — aggregate-sized, orders of
    * magnitude under the occurrence frame — so up to ~4M entries
    * (~100 MB hashed) an explicit broadcast is strictly better than a
    * shuffle of every shingle occurrence. The EXPLICIT hint exists
    * because AQE's own estimate of this frame sits near its 10 MB
    * boundary at mid-scale corpora and the broadcast/SMJ decision
    * flapped run-to-run (measured: 36.4 s vs 138.9 s on two identical
    * fresh-JVM 8x containment-prefix sweeps). Counting the persisted
    * aggregate is one cheap action; past the gate the shuffle join is
    * the right plan anyway.
    */
  private val DfBroadcastMaxEntries = 4L << 20

  /** Broadcast-hint an already-counted df frame: callers that produced the
    * frame in their own diagnosis pass (the adaptive router) pass the known
    * entry count so the gate costs ZERO extra jobs here.
    */
  private def dfFrameHintedKnown(dfs: DataFrame, entries: Long): DataFrame =
    if (entries <= DfBroadcastMaxEntries) broadcast(dfs) else dfs

  /** Persist + count + broadcast-hint a freshly built df frame. Returns the
    * hinted frame AND the persisted handle — the caller unpersists it once
    * the candidate set is materialized (the df frame feeds candidate
    * generation only, never verification, so holding it past the
    * localCheckpoint of the candidates would leak a session-lived cache).
    */
  private def dfFrameOwned(dfs: DataFrame): (DataFrame, DataFrame) = {
    val d = dfs.persist(StorageLevel.MEMORY_ONLY)
    (if (d.count() <= DfBroadcastMaxEntries) broadcast(d) else d, d)
  }

  def ngramContainmentPairsPrefix(
      docs: DataFrame,
      threshold: Double,
      shingleN: Int = 3): DataFrame = {
    require(threshold > 0 && threshold <= 1, s"threshold $threshold out of (0,1]")
    val sets = shingleSets(docs, shingleN).persist(StorageLevel.MEMORY_ONLY)
    try {
    val sh = sets
      .select(col("id"), explode(col("shs")).as("sh"), col("len"))
      .withColumn("h", xxhash64(col("sh")))
    val (dfs, dfOwned) = dfFrameOwned(sh.groupBy("h").agg(count(lit(1)).as("df")))
    val rankW = org.apache.spark.sql.expressions.Window
      .partitionBy("id").orderBy(col("df").asc, col("h").asc, col("sh").asc)
    // per-doc prefix length varies with |Sa|, and a length-DEPENDENT
    // row_number cutoff cannot use WindowGroupLimit — the whole corpus's
    // shingle frame would go through a real per-partition sort. A
    // CONSTANT cap of (1-t)·maxLen + 1 (one 1-row aggregate, baked as a
    // literal) dominates every per-doc prefix, turns the window into a
    // bounded per-id heap, and the exact per-doc cutoff filters on top.
    val maxLen = sets.agg(max(col("len")).cast("long")).head().getLong(0)
    val cap = math.floor((1 - threshold) * maxLen).toInt + 2
    val pref = sh.join(dfs, "h")
      .withColumn("rnk", row_number().over(rankW))
      .filter(col("rnk") <= lit(cap))
      .filter(col("rnk") <=
        col("len") - ceil(lit(threshold) * col("len") - lit(1e-9)) + 1)
      .select("id", "h", "len")
    // candidates are output-sized; materializing them here lets the df
    // frame (candidate-generation-only) unpersist deterministically
    val cands = pref.as("x").join(sh.select("id", "h", "len").as("y"),
        col("x.h") === col("y.h") && col("x.id") =!= col("y.id") &&
          col("y.len") >= lit(threshold) * col("x.len") - lit(1e-9))
      .select(col("x.id").as("src"), col("y.id").as("dst"))
      .distinct()
      .localCheckpoint()
    dfOwned.unpersist()
    // spreadByKeys: the verifyJaccard rationale — don't verify a
    // byte-coalesced candidate frame on one core
    spreadByKeys(cands, col("src"), col("dst"))
      .join(sets.select(col("id").as("src"), col("shs").as("sha"),
        col("len").as("src_len")), "src")
      .join(sets.select(col("id").as("dst"), col("shs").as("shb")), "dst")
      .withColumn("inter",
        graft.functions.VectorExpressions.sortedIntersectCount(col("sha"), col("shb")))
      .withColumn("containment",
        col("inter").cast("double") / col("src_len").cast("double"))
      .filter(col("containment") >= threshold)
      .select("src", "dst", "containment")
      // verified pairs are output-sized; materialize before the shingle
      // frame unpersists (the adaptive-route cleanup pattern)
      .localCheckpoint()
    } finally sets.unpersist()
  }

  /** Exact n-gram Jaccard with PPJoin-style prefix + size filtering —
    * identical results to [[ngramJaccard]], far fewer candidates.
    *
    * Order every document's shingles by GLOBAL rarity (df asc, tiebreak
    * below); a pair with Jaccard >= t must share a shingle within both
    * documents' first `len - ceil(t*len) + 1` shingles (prefix-filter
    * theorem) and satisfy t*|A| <= |B| (size filter). Candidate
    * generation joins ONLY prefix rows — and since prefixes hold each
    * document's RAREST shingles, the stop-shingle d^2 blowup that forces
    * [[ngramJaccard]]'s maxShingleDf cap cannot happen: frequent shingles
    * fall out of prefixes by construction. Verification counts exact
    * intersections over the FULL shingle sets for surviving pairs only.
    * The epsilon inside ceil() guards against float fuzz enlarging the
    * prefix cutoff (a slightly larger prefix is always safe; a smaller
    * one is not).
    *
    * Every shuffle in candidate generation is keyed by an 8-byte
    * `xxhash64(sh)` instead of the shingle STRING (a word 3-gram averages
    * ~25 bytes and the df/join stages ship every shingle occurrence):
    * df counting groups by hash, the df join probes on hash, and the
    * prefix self-join matches on hash — ~3x less shuffle volume and
    * fixed-width comparisons throughout. Correctness is unaffected:
    * the prefix theorem holds for ANY consistent total order, and
    * (df(h(sh)), h(sh), sh) IS one (sh appears as the final tiebreak, so
    * hash ties between distinct shingles still order consistently across
    * documents); equal shingles always share a hash, so the hash join
    * finds every true candidate, and a hash COLLISION can only add a
    * false candidate that the exact-Jaccard verify discards.
    */
  /** Diagnosed route chooser between [[ngramJaccard]] (cheapest
    * constants, but its inverted candidate join carries a Σ df² term one
    * stop-shingle spike blows up unboundedly) and [[ngramJaccardPrefix]]
    * (PPJoin — no d² term, ~2× the constants at mild skew, measured at
    * sf0.1). The decision statistic IS the plain route's risk term: the
    * expected candidate fan-out per document, Σ df·(df−1)/2 ÷ n_docs,
    * from one aggregate-sized pass over the shingle df frame. Mild
    * corpora (fan-out ≤ `maxCandidatesPerDoc`) take the plain route;
    * df-spiky corpora take the prefix route. Both routes are proven
    * result-identical (DedupSpec), so consumers only ever see the cost
    * difference — the same diagnosed-routing pattern as the skew-aware
    * curation rollup (SkewTools). Diagnosis cost: ONE extra aggregate —
    * the shingle frame is persisted once and THREADED into the chosen
    * route, and the df frame it aggregates (keyed by the same xxhash64
    * the prefix route joins on) is passed through with its known entry
    * count so the prefix route neither re-shingles nor recounts. The
    * result is materialized (output-sized) before both frames unpersist,
    * so the diagnosis leaves no session-lived cache behind.
    */
  def ngramJaccardAdaptive(
      docs: DataFrame,
      threshold: Double,
      shingleN: Int = 3,
      maxCandidatesPerDoc: Long = 1024L,
      pairSink: PairSink = PairSink.Local): DataFrame = {
    require(maxCandidatesPerDoc >= 1, s"bad cap $maxCandidatesPerDoc")
    val sets = shingleSets(docs, shingleN).persist(StorageLevel.MEMORY_ONLY)
    // df keyed by xxhash64(sh), exactly the prefix route's join key: the
    // risk statistic is insensitive to the astronomically-rare hash
    // collision (it would only merge two df cells), and keying by the
    // 8-byte hash instead of the ~25-byte shingle string is the same
    // 3x-shuffle-volume win the prefix route measures.
    val dfFrame = sets
      .select(explode(col("shs")).as("sh"))
      .select(xxhash64(col("sh")).as("h"))
      .groupBy("h").agg(count(lit(1)).as("df"))
      .persist(StorageLevel.MEMORY_ONLY)
    try {
      val nDocs = math.max(sets.count(), 1L)
      val stats = dfFrame.agg(
        coalesce(sum(expr("df * (df - 1) div 2")), lit(0L)).as("cand"),
        count(lit(1)).as("entries")).head()
      val (cand, entries) = (stats.getLong(0), stats.getLong(1))
      val pairs =
        if (cand / nDocs <= maxCandidatesPerDoc)
          ngramJaccardFromSets(sets, threshold)
        else
          ngramJaccardPrefixFromSets(sets, threshold, Some((dfFrame, entries)))
      // near-dup pairs are output-sized; materializing them inside the
      // try (through the configured sink — localCheckpoint by default,
      // reliable checkpoint / table write on a real cluster) lets BOTH
      // diagnosis frames unpersist deterministically
      materialize(pairs, pairSink)
    } finally {
      dfFrame.unpersist()
      sets.unpersist()
    }
  }

  def ngramJaccardPrefix(
      docs: DataFrame,
      threshold: Double,
      shingleN: Int = 3): DataFrame = {
    val sets = shingleSets(docs, shingleN).persist(StorageLevel.MEMORY_ONLY)
    try ngramJaccardPrefixFromSets(sets, threshold).localCheckpoint()
    finally sets.unpersist()
  }

  /** [[ngramJaccardPrefix]] over an already-persisted shingle frame, with
    * an optional pre-aggregated (df frame, entry count) from the caller's
    * diagnosis pass — [[ngramJaccardAdaptive]]'s reuse seam. When absent,
    * the df frame is built, gate-counted, and unpersisted here once the
    * candidate set is materialized.
    */
  private[dedup] def ngramJaccardPrefixFromSets(
      sets: DataFrame,
      threshold: Double,
      knownDf: Option[(DataFrame, Long)] = None): DataFrame = {
    require(threshold > 0 && threshold <= 1, s"threshold $threshold out of (0,1]")
    val sh = sets
      .select(col("id"), explode(col("shs")).as("sh"), col("len"))
      .withColumn("h", xxhash64(col("sh")))
    val (dfs, dfOwned) = knownDf match {
      case Some((d, entries)) => (dfFrameHintedKnown(d, entries), None)
      case None =>
        val (hinted, owned) = dfFrameOwned(sh.groupBy("h").agg(count(lit(1)).as("df")))
        (hinted, Some(owned))
    }
    val rankW = org.apache.spark.sql.expressions.Window
      .partitionBy("id").orderBy(col("df").asc, col("h").asc, col("sh").asc)
    // constant rank cap (the ngramContainmentPairsPrefix trick): the
    // per-doc prefix cutoff is length-DEPENDENT, which WindowGroupLimit
    // cannot see, so without a literal bound the rank window full-sorts
    // the corpus's shingle frame. (1-t)·maxLen + 2 dominates every
    // per-doc prefix; the exact cutoff still filters on top.
    val maxLen = sets.agg(max(col("len")).cast("long")).head().getLong(0)
    val cap = math.floor((1 - threshold) * maxLen).toInt + 2
    // prefix frame materialized ONCE: it feeds BOTH sides of the
    // candidate self-join below, and the group-limited rank window
    // otherwise re-executes per join side (the exchange below it is
    // reused, but the WindowGroupLimit + Window + filters run again on
    // each consumer — measured as the two largest stages of
    // q_dedup_ngram_prefix, ~15 s of ~34 s executor time per run). The
    // frame is prefix-BOUNDED: <= cap rows per doc of (id, h, len, rnk).
    val pref = sh.join(dfs, "h")
      .withColumn("rnk", row_number().over(rankW))
      .filter(col("rnk") <= lit(cap))
      .filter(col("rnk") <=
        col("len") - ceil(lit(threshold) * col("len") - lit(1e-9)) + 1)
      .select("id", "h", "len", "rnk")
      .localCheckpoint()
    // Positional filter (PPJoin proper, Xiao et al. WWW'08): J >= t is
    // |x∩y| >= alpha with alpha = ceil(t/(1+t) * (|x|+|y|)); a pair's
    // FIRST shared shingle in the global order (ranks i, j) bounds the
    // whole overlap by min(|x|-i, |y|-j) + 1, so candidate rows failing
    // the bound drop — lossless, because every true pair still passes at
    // its first-match row. This is the lever when prefixes alone are weak
    // (small shared vocabularies: many docs share "rare" shingles), where
    // it cuts candidates by multiples before the expensive distinct.
    val alpha = ceil((lit(threshold) / (lit(1.0) + lit(threshold))) *
      (col("x.len") + col("y.len")) - lit(1e-9))
    // candidates are output-sized; materializing them here lets the df
    // frame (candidate-generation-only) unpersist deterministically
    val cands = pref.as("x").join(pref.as("y"),
        col("x.h") === col("y.h") && col("x.id") < col("y.id") &&
          col("x.len") * lit(threshold) <= col("y.len") &&
          col("y.len") * lit(threshold) <= col("x.len") &&
          least(col("x.len") - col("x.rnk"), col("y.len") - col("y.rnk")) +
            lit(1) >= alpha)
      .select(col("x.id").as("a"), col("y.id").as("b"))
      .distinct()
      .localCheckpoint()
    // cands is materialized (eager checkpoint): the prefix frame's
    // checkpoint blocks — candidate-generation-only, like the df frame —
    // can be released NOW rather than lingering until ContextCleaner GC
    graft.Checkpoints.free(pref)
    dfOwned.foreach(_.unpersist())
    verifyJaccard(cands, sets, threshold)
  }

  /** Duplicate-cluster resolution: near-dup PAIRS → connected components,
    * so a pipeline knows what to KEEP when A~B and B~C (pairs alone
    * cannot say). Output: (id, comp) with comp = the component's minimum
    * id — the canonical survivor.
    *
    * Two execution paths behind one contract:
    *   - edge sets at or under `localEdgeLimit` (near-dup graphs are
    *     output-sized — tiny next to the corpus) solve DRIVER-SIDE with
    *     path-compressed union-find: one collect, zero shuffle rounds.
    *   - larger graphs run iterative min-label propagation in plain
    *     DataFrames — each round every node takes the minimum component
    *     label among itself and its neighbors; converges in O(graph
    *     diameter) rounds (near-dup clusters are shallow — diameter
    *     tracks cluster size, not corpus size). Each round is one keyed
    *     join + aggregate; localCheckpoint severs the growing lineage so
    *     round N's plan does not replay rounds 1..N-1.
    */
  def duplicateClusters(
      pairs: DataFrame,
      maxIter: Int = 50,
      localEdgeLimit: Long = 1L << 20): DataFrame = {
    // materialize the incoming pairs BEFORE symmetrizing: the union reads
    // its input twice, and an un-materialized pairs argument is typically
    // a whole candidate-generation pipeline (measured: q_dedup_clusters
    // 7.8 s -> 4.4 s at sf0.1 from this checkpoint alone)
    val p0 = pairs.select(col("a"), col("b")).localCheckpoint()
    // symmetrized distinct edge set, materialized ONCE — both paths read it
    val edges = p0
      .unionByName(p0.select(col("b").as("a"), col("a").as("b")))
      .distinct().localCheckpoint()
    // Near-dup edge sets are OUTPUT-sized (pairs above a high threshold),
    // usually orders of magnitude smaller than the corpus — when the whole
    // graph fits on the driver, path-compressed union-find solves it in one
    // collect + one parallelize instead of O(diameter) join+agg rounds
    // (each a full shuffle + localCheckpoint). The distributed loop below
    // stays the scale path for graphs past the limit (~2M symmetrized rows
    // ≈ tens of MB collected) and for id types without a driver-side
    // ordering mirror.
    if (edges.count() <= 2 * localEdgeLimit) {
      val local = duplicateClustersLocal(edges)
      if (local.isDefined) return local.get
    }
    var labels = edges.select(col("a").as("id")).distinct()
      .withColumn("comp", col("id")).localCheckpoint()
    var changed = 1L
    var i = 0
    while (changed > 0 && i < maxIter) {
      val neighborMin = edges
        .join(labels.select(col("id").as("b"), col("comp").as("ncomp")), "b")
        .groupBy(col("a").as("id")).agg(min("ncomp").as("nmin"))
      val stepped = labels.join(neighborMin, Seq("id"), "left")
        .select(col("id"),
          least(col("comp"), coalesce(col("nmin"), col("comp"))).as("comp"),
          (coalesce(col("nmin"), col("comp")) < col("comp"))
            .cast("long").as("__chg"))
        .localCheckpoint()
      changed = stepped.agg(coalesce(sum("__chg"), lit(0L))).collect()(0).getLong(0)
      labels = stepped.select("id", "comp")
      i += 1
    }
    require(changed == 0, s"label propagation did not converge in $maxIter rounds")
    labels
  }

  /** Driver-side connected components for collected edge lists: standard
    * union-find with path compression + union by rank, then a min-id pass
    * per root. Identical output contract to the distributed loop:
    * (id, comp) for every id appearing in an edge, comp = the component's
    * minimum id under the same ordering Spark's `min`/`least` use —
    * numeric order for numerics, UTF-8 BYTE order for strings
    * (UTF8String.compareTo, NOT java.lang.String's UTF-16 order: the two
    * disagree for supplementary-plane characters, and the survivor must
    * not depend on which path ran). Returns None for id types without a
    * driver-side ordering mirror here (decimal, date, ...) — the caller
    * then falls through to the distributed loop, which supports any
    * orderable type.
    */
  private def duplicateClustersLocal(undirected: DataFrame): Option[DataFrame] = {
    val spark = undirected.sparkSession
    val idType = undirected.schema("a").dataType
    val ord: Ordering[Any] = (idType match {
      case org.apache.spark.sql.types.StringType =>
        Ordering.by((s: String) =>
          org.apache.spark.unsafe.types.UTF8String.fromString(s))
      case org.apache.spark.sql.types.LongType => Ordering.Long
      case org.apache.spark.sql.types.IntegerType => Ordering.Int
      case org.apache.spark.sql.types.ShortType => Ordering.Short
      case org.apache.spark.sql.types.DoubleType => Ordering.Double.TotalOrdering
      case org.apache.spark.sql.types.FloatType => Ordering.Float.TotalOrdering
      case _ => return None
    }).asInstanceOf[Ordering[Any]]
    val rows = undirected.collect()
    val index = scala.collection.mutable.HashMap.empty[Any, Int]
    val values = scala.collection.mutable.ArrayBuffer.empty[Any]
    def idx(v: Any): Int = index.getOrElseUpdate(v, { values += v; values.size - 1 })
    val pairsIdx = rows.map(r => (idx(r.get(0)), idx(r.get(1))))
    val parent = Array.tabulate(values.size)(identity)
    val rank = new Array[Int](values.size)
    def find(x: Int): Int = {
      var r = x
      while (parent(r) != r) r = parent(r)
      var c = x
      while (parent(c) != r) { val n = parent(c); parent(c) = r; c = n }
      r
    }
    pairsIdx.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) {
        if (rank(ra) < rank(rb)) parent(ra) = rb
        else if (rank(rb) < rank(ra)) parent(rb) = ra
        else { parent(rb) = ra; rank(ra) += 1 }
      }
    }
    val minOfRoot = scala.collection.mutable.HashMap.empty[Int, Any]
    values.indices.foreach { i =>
      val r = find(i)
      val v = values(i)
      minOfRoot.get(r) match {
        case Some(m) if ord.lteq(m, v) => ()
        case _ => minOfRoot(r) = v
      }
    }
    val out = values.indices.map(i => org.apache.spark.sql.Row(values(i), minOfRoot(find(i))))
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id", idType),
      org.apache.spark.sql.types.StructField("comp", idType)))
    Some(spark.createDataFrame(spark.sparkContext.parallelize(out.toSeq, 1), schema))
  }

  /** Benchmark decontamination: bipartite shingle-containment join. For
    * each (train, eval) document pair sharing at least one word n-gram,
    * containment = |sh(train) ∩ sh(eval)| / |sh(train)|; pairs at or above
    * `threshold` are flagged (the C4/GPT-style eval-overlap check, done
    * with n-gram sets instead of exact 13-gram hits so partial overlap
    * surfaces too). Same inverted-index shape as [[ngramJaccard]] — the
    * train x eval cross product never materializes; candidates are
    * generated per shared shingle, keyed by the shingle. `maxShingleDf`
    * drops stop-shingles (by EVAL-side document frequency) from candidate
    * generation, the standard skew guard.
    */
  def containment(
      train: DataFrame,
      eval: DataFrame,
      threshold: Double,
      shingleN: Int = 5,
      maxShingleDf: Int = Int.MaxValue): DataFrame = {
    val setsT = shingleSets(train, shingleN).persist(StorageLevel.MEMORY_ONLY)
    try {
      val shT = setsT.select(col("id"), explode(col("shs")).as("sh"))
      val shE = shingleRows(eval, shingleN)
      val sizesT = setsT.select(col("id"), col("len")) // set cardinality, no shuffle
      val joinE =
        if (maxShingleDf == Int.MaxValue) shE
        else shE.join(
          shE.groupBy("sh").agg(count(lit(1)).as("df"))
            .filter(col("df") <= maxShingleDf).select("sh"),
          Seq("sh"), "left_semi")
      val co = shT.as("x").join(joinE.as("y"), col("x.sh") === col("y.sh"))
        .groupBy(col("x.id").as("train_id"), col("y.id").as("eval_id"))
        .agg(count(lit(1)).as("inter"))
      co.join(sizesT.select(col("id").as("train_id"), col("len")), "train_id")
        .withColumn("containment",
          col("inter").cast("double") / col("len").cast("double"))
        .filter(col("containment") >= threshold)
        .select("train_id", "eval_id", "containment")
        // flagged pairs are output-sized; materialize before the train
        // shingle frame unpersists (the adaptive-route cleanup pattern)
        .localCheckpoint()
    } finally setsT.unpersist()
  }

  /** Per-document NOVELTY against a reference corpus: the fraction of a
    * document's distinct word n-grams that appear NOWHERE in the
    * reference — "how much of this crawl is actually new text", the
    * incremental-ingest complement of [[containment]] (which flags
    * specific overlapping pairs; novelty aggregates the overlap away and
    * scores each incoming document alone).
    *
    * Dataflow: reference shingles dedupe to one row per distinct n-gram
    * (vocabulary-sized, keyed agg), incoming shingles probe them with a
    * LEFT SEMI join (shingle-keyed, no pair blowup — a document matching
    * thousands of reference docs still contributes |sh(doc)| rows), and
    * two per-doc aggs produce seen/total counts. Only documents with at
    * least one n-gram (≥ shingleN tokens) emit a row, the [[shingleSets]]
    * convention the dedup family shares.
    */
  def noveltyScore(
      docs: DataFrame,
      reference: DataFrame,
      shingleN: Int = 3): DataFrame = {
    val refSh = shingleSets(reference, shingleN)
      .select(explode(col("shs")).as("sh")).distinct()
    val docSh = shingleSets(docs, shingleN)
      .select(col("id"), explode(col("shs")).as("sh"))
      .persist(StorageLevel.MEMORY_ONLY)
    try {
      val tot = docSh.groupBy("id").agg(count(lit(1)).as("n_shingles"))
      val seen = docSh.join(refSh, Seq("sh"), "left_semi")
        .groupBy("id").agg(count(lit(1)).as("n_seen"))
      tot.join(seen, Seq("id"), "left")
        .withColumn("n_novel", col("n_shingles") - coalesce(col("n_seen"), lit(0L)))
        .withColumn("novelty",
          col("n_novel").cast("double") / col("n_shingles").cast("double"))
        .select("id", "n_shingles", "n_novel", "novelty")
        // one narrow row per doc; materialize before the shingle rows
        // unpersist (the adaptive-route cleanup pattern)
        .localCheckpoint()
    } finally docSh.unpersist()
  }

  /** Embedding near-duplicates: pairs with cosine >= threshold.
    *
    * The exact form is an all-pairs inequality self-join — O(N²) and a
    * BroadcastNestedLoopJoin physically, which is only acceptable on small
    * inputs (an eval set, one collection). Above `maxExactRows` the call
    * routes to [[embeddingNearDupsLsh]] (banded candidates + exact-cosine
    * verify), so composing this operator into a corpus-scale pipeline can
    * never silently materialize the quadratic product. Near-dup detection
    * is recall-oriented, so the LSH path's (bits, tables) recall envelope
    * is the documented semantics at scale; callers needing the exact join
    * regardless of size can raise `maxExactRows` explicitly.
    */
  def embeddingNearDups(
      vectors: DataFrame, // (id, embedding, norm)
      threshold: Double,
      maxExactRows: Long = 100000L,
      sizeHint: Option[Long] = None): DataFrame = {
    // The routing count() is column-pruned (reads no embedding bytes) but
    // still executes the upstream plan once before the real job; callers
    // whose `vectors` is an expensive derived frame should pass sizeHint
    // (or persist upstream) to make routing free. Embedding frames are too
    // wide to persist unilaterally here, so the hint is the contract.
    val n = sizeHint.getOrElse(vectors.count())
    if (n > maxExactRows) {
      log.info(s"embeddingNearDups: $n rows > maxExactRows=$maxExactRows, routing to sign-LSH")
      val dim = vectors.select(size(col("embedding")).as("d")).head().getInt(0)
      embeddingNearDupsLsh(vectors, threshold, dim)
    } else {
      log.info(s"embeddingNearDups: $n rows <= maxExactRows=$maxExactRows, exact pairwise")
      val a = vectors.select(col("id").as("a"), col("embedding").as("ea"), col("norm").as("na"))
      val b = vectors.select(col("id").as("b"), col("embedding").as("eb"), col("norm").as("nb"))
      a.join(b, col("a") < col("b"))
        .withColumn("cosine",
          VectorFunctions.dot(col("ea"), col("eb")) / (col("na") * col("nb")))
        .filter(col("cosine") >= threshold)
        .select("a", "b", "cosine")
    }
  }

  /** Scale path: random-hyperplane (sign) LSH blocking + exact cosine
    * verify. `tables` independent hash tables of `bitsPerTable` hyperplane
    * signs each; a pair is a candidate iff it shares a full sign-key in at
    * least one table, then exact cosine filters. Recall for a pair at
    * angular similarity s = 1 - acos(cos)/pi is 1-(1-s^bits)^tables —
    * choose (bits, tables) for the corpus's near-dup band. Candidates only
    * ever meet inside a bucket join; the all-pairs product never exists.
    *
    * Hyperplanes are seeded deterministically (engine-versioned) so index
    * builds are reproducible across runs and clusters.
    */
  def embeddingNearDupsLsh(
      vectors: DataFrame, // (id, embedding, norm)
      threshold: Double,
      dim: Int,
      bitsPerTable: Int = 8,
      tables: Int = 8,
      seed: Long = 42L,
      maxBucketSize: Int = 10000): DataFrame = {
    val rnd = new scala.util.Random(seed)
    // tables x bits hyperplanes, each a dim-vector of N(0,1) literals
    val planes: Seq[Seq[Array[Double]]] =
      Seq.fill(tables)(Seq.fill(bitsPerTable)(Array.fill(dim)(rnd.nextGaussian())))
    val keyCols = planes.map { tablePlanes =>
      tablePlanes.map { p =>
        val lits = array(p.toIndexedSeq.map(lit): _*)
        when(VectorFunctions.dot(col("embedding"), lits) >= 0, lit("1")).otherwise(lit("0"))
      }.reduce(concat(_, _))
    }
    val banded = vectors
      .select(col("id"), posexplode(array(keyCols: _*)).as(Seq("table", "key")))
    val cands = bucketPairs(banded, "table", "key", maxBucketSize)
    cands
      .join(vectors.select(col("id").as("a"), col("embedding").as("ea"),
        col("norm").as("na")), "a")
      .join(vectors.select(col("id").as("b"), col("embedding").as("eb"),
        col("norm").as("nb")), "b")
      .withColumn("cosine",
        VectorFunctions.dot(col("ea"), col("eb")) / (col("na") * col("nb")))
      .filter(col("cosine") >= threshold)
      .select("a", "b", "cosine")
  }

  /** SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic dedup via
    * cluster-then-dedup-within — k-means partitions the embedding space so
    * the pairwise cosine pass runs per cluster (the blocked-kNN shape:
    * cluster-keyed self-join, never an all-pairs product), pairs above the
    * threshold form ε-balls, and one representative survives per ball.
    *
    * Deterministic survivor rule: connected components over the pair graph
    * with the minimum id as the component label — the paper's greedy
    * "keep one per ball" realized with the same component machinery as
    * [[duplicateClusters]], so survivors are partitioning-invariant (the
    * paper itself keeps a random/centroid-distance pick; min-id is this
    * engine's reproducible convention, as in exact dedup).
    *
    * Scale shape: centroid assignment is a broadcast map (k centroids);
    * the within-cluster join is bounded by the largest cluster (size k for
    * balance — same operating guidance as [[graft.ann.Ann.knnJoinWithin]]);
    * component resolution is output-sized. Cross-cluster near-dups at the
    * Voronoi boundary are the documented recall loss the paper accepts.
    *
    * Input: (id, embedding, norm) + a (centroid_id, centroid,
    * centroid_norm) frame (train with [[graft.ann.Ann.kmeansCentroids]] or
    * serve from a persisted [[graft.ann.IvfIndex]]). Output: one row per
    * input id — (id, cluster_id, comp, keep); keep = id is its ball's
    * survivor.
    */
  def semDeDup(
      vectors: DataFrame, // (id, embedding, norm)
      centroids: DataFrame, // (centroid_id, centroid, centroid_norm)
      threshold: Double): DataFrame = {
    // assignment read twice (pair join sides + output) — persist the
    // narrow (id, cluster) map; embeddings re-read from the source frame
    val assigned = graft.ann.Ann.assign(vectors, centroids)
      .select(col("id"), col("embedding"), col("norm"), col("cluster_id"))
      .persist(StorageLevel.MEMORY_ONLY)
    try {
      val a = assigned.select(col("cluster_id"), col("id").as("a"),
        col("embedding").as("ea"), col("norm").as("na"))
      val b = assigned.select(col("cluster_id"), col("id").as("b"),
        col("embedding").as("eb"), col("norm").as("nb"))
      val pairs = a.join(b, Seq("cluster_id")).filter(col("a") < col("b"))
        .withColumn("cosine",
          VectorFunctions.dot(col("ea"), col("eb")) / (col("na") * col("nb")))
        .filter(col("cosine") >= threshold)
        .select("a", "b")
      val comps = duplicateClusters(pairs)
      assigned.select("id", "cluster_id")
        .join(comps, Seq("id"), "left")
        .withColumn("comp", coalesce(col("comp"), col("id")))
        .withColumn("keep", col("comp") === col("id"))
        .select("id", "cluster_id", "comp", "keep")
        // one narrow row per id; materialize before the assignment map
        // unpersists (the adaptive-route cleanup pattern)
        .localCheckpoint()
    } finally assigned.unpersist()
  }

  /** Cross-set SEMANTIC decontamination — the embedding sibling of the
    * n-gram containment gate (q_decontaminate): every eval vector is
    * checked against the TRAIN set for cosine >= threshold within its
    * centroid cell, i.e. the [[semDeDup]] blocking applied BIPARTITE, so
    * candidates are cluster-local eval x train, never the full cross
    * product. Paraphrased or re-embedded benchmark leakage that n-gram
    * containment misses (reworded questions, translated answers) shows
    * up here; Voronoi-boundary recall loss is the same documented
    * SemDeDup trade, and within the cell the check is exact.
    *
    * Output: one row per EVAL id — (eval_id, n_hits, top_train_id,
    * top_cosine, contaminated); rows with no hit carry (0, -1, 0.0,
    * false), so the frame is a complete per-eval audit, not a hit list.
    *
    * Scale shape: two broadcast-map assignments + ONE cluster-keyed
    * bipartite join bounded by cluster size x eval density, a per-eval
    * bounded argmax window, and a LEFT join back to the eval ids —
    * output eval-sized at any corpus scale.
    */
  def semanticContamination(
      train: DataFrame, // (id, embedding, norm)
      evalSet: DataFrame, // (id, embedding, norm)
      centroids: DataFrame, // (centroid_id, centroid, centroid_norm)
      threshold: Double): DataFrame = {
    require(threshold > 0 && threshold <= 1, s"threshold in (0,1], got $threshold")
    val at = graft.ann.Ann.assign(train, centroids)
      .select(col("id").cast("long").as("train_id"), col("embedding").as("et"),
        col("norm").as("nt"), col("cluster_id"))
    val ae = graft.ann.Ann.assign(evalSet, centroids)
      .select(col("id").cast("long").as("eval_id"), col("embedding").as("ee"),
        col("norm").as("ne"), col("cluster_id"))
      .persist(StorageLevel.MEMORY_ONLY)
    try {
      val hits = ae.join(at, Seq("cluster_id"))
        .withColumn("cosine",
          VectorFunctions.dot(col("ee"), col("et")) / (col("ne") * col("nt")))
        .filter(col("cosine") >= threshold)
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("eval_id").orderBy(col("cosine").desc, col("train_id"))
      val perEval = hits
        .withColumn("n_hits", count(lit(1)).over(
          org.apache.spark.sql.expressions.Window.partitionBy("eval_id")))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("eval_id"), col("n_hits"),
          col("train_id").as("top_train_id"), col("cosine").as("top_cosine"))
      ae.select("eval_id")
        .join(perEval, Seq("eval_id"), "left")
        .select(col("eval_id"),
          coalesce(col("n_hits"), lit(0L)).as("n_hits"),
          coalesce(col("top_train_id"), lit(-1L)).as("top_train_id"),
          coalesce(col("top_cosine"), lit(0.0)).as("top_cosine"),
          (coalesce(col("n_hits"), lit(0L)) > 0).as("contaminated"))
        .localCheckpoint() // eval-sized; release the assignment map
    } finally ae.unpersist()
  }
}
