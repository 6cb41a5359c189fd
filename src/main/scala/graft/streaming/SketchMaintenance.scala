package graft.streaming

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.{Cms, Hll}

/** Continuous corpus profiling: persisted HLL register and CMS cell
  * tables maintained per micro-batch — the auditable-sketch analog of the
  * Bloom existence fold ([[graft.ingest.BloomGate.noteInserted]]). The
  * reference has no streaming surface at all (SURVEY §1.3); this is the
  * 100 TB-pipeline extension that keeps "how many distinct documents have
  * we ever ingested / what are the heavy-hitter tokens" queryable without
  * ever rescanning the corpus.
  *
  * Why a per-batch fold is EXACT, not approximate-on-approximate: both
  * sketches are commutative monoids over their register/cell tables —
  * HLL merges by union+max ([[Hll.merge]]), CMS by union+sum
  * ([[Cms.merge]]) — so folding batch registers into the stored table
  * yields a table bit-identical to the batch sketch computed over the
  * union of every batch (StreamingSpec asserts register equality). The
  * estimate read off the stored table is therefore exactly the estimate a
  * full recompute would produce.
  *
  * Scale shape per fold: one batch-sized register build (narrow map +
  * combiner-collapsed aggregate), one merge against a SKETCH-BOUNDED
  * stored table (≤ 2^p rows per group for HLL, ≤ width·depth cells for
  * CMS), one sketch-bounded rewrite. Stream length never appears in the
  * cost — the stored table cannot grow past the sketch bound. Writes go
  * to a `.delta` staging dir then swap in (the PartitionedTable
  * discipline: never read and overwrite one path in a single job).
  */
object SketchMaintenance {

  /** JVM-wide monitor serializing the swap renames against [[load]]'s
    * recovery rename: a reader (hllEstimate from a monitoring thread)
    * must never observe writeSwap's mid-swap live-missing window and
    * "recover" the backup while the staging move is about to land.
    * Cross-JVM exclusion is the warehouse write lock's job (compaction
    * holds it around the folds); this monitor covers lock-free readers
    * in the same JVM.
    */
  private val swapLock = new Object

  /** The stored register/cell table, or None before the first fold.
    * Recovers from a [[writeSwap]] torn between its two renames: if the
    * live dir is missing but the `.bak` (the previous committed sketch)
    * survives, the backup is READ IN PLACE — never renamed back. A
    * rename-based recovery raced cross-process writers: a reader in
    * another JVM (outside [[swapLock]]) restoring `.bak` during a live
    * writer's mid-swap window would make the writer's staging→live
    * ATOMIC_MOVE fail with FileAlreadyExists. Reading in place keeps
    * load() mutation-free, so only [[writeSwap]] ever renames; the next
    * successful fold lands a fresh live dir and clears the backup (the
    * crashed fold simply re-runs against the pre-crash state it read).
    */
  def load(spark: SparkSession, path: String): Option[DataFrame] =
    swapLock.synchronized {
      if (Files.exists(Paths.get(path))) Some(spark.read.parquet(path))
      else if (Files.exists(Paths.get(path + ".bak")))
        Some(spark.read.parquet(path + ".bak"))
      else None
    }

  /** Run the READ-ONLY `use` over the loaded sketch, retrying ONCE on a
    * missing-file failure. [[swapLock]] covers same-JVM readers, but a
    * reader in ANOTHER process can lose its files mid-scan to the live
    * writer's [[writeSwap]] in two shapes: a live scan whose dir is
    * renamed to `.bak` between listing and read, or a `.bak`-recovered
    * scan whose backup is cleared right after the new live lands. In BOTH
    * shapes a complete sketch exists at every instant (the swap commits
    * the new live before anything readable disappears), so one re-load
    * observes a committed state and succeeds. A retry against genuinely
    * missing data re-fails with the same error — one extra attempt, no
    * masking.
    *
    * The FOLD WRITERS deliberately do not route through here: folds are
    * single-writer (the warehouse write lock serializes them across
    * processes, [[swapLock]] within one), so their loads can never lose a
    * race — and a retry around a load+merge+swap closure is actively
    * dangerous: if a failure classified as missing-file ever escaped
    * AFTER writeSwap committed the merged table (e.g. in the post-commit
    * cleanup renames), the re-run would merge the batch into the
    * already-merged sketch a second time. HLL would shrug (register max
    * is idempotent) but CMS cells are ADDITIVE — counts would double.
    * Read-only estimates have no such hazard: re-running them is a pure
    * re-read.
    */
  private def withLoaded[T](spark: SparkSession, path: String)(
      use: Option[DataFrame] => T): T =
    try use(load(spark, path))
    catch {
      case e: Throwable if isMissingFile(e) => use(load(spark, path))
    }

  private def isMissingFile(e: Throwable): Boolean =
    Iterator.iterate(e)(_.getCause).takeWhile(_ != null).take(16).exists { t =>
      t.isInstanceOf[java.io.FileNotFoundException] ||
        Option(t.getMessage).exists(m =>
          m.contains("FileNotFoundException") || m.contains("does not exist") ||
            m.contains("PATH_NOT_FOUND"))
    }

  /** Fold one micro-batch into the persisted HLL register table at
    * `path` (created on first fold). groupCols/valueCol/p must be stable
    * across folds — they are sketch identity, like BloomGate's meta.
    */
  def foldHll(
      path: String,
      batch: DataFrame,
      groupCols: Seq[String],
      valueCol: String,
      p: Int = Hll.DefaultP): Unit = {
    // unretried by design: see withLoaded — a re-run after a post-commit
    // failure would re-merge the batch (harmless for HLL's max-merge,
    // but the writers share one discipline with the additive CMS fold)
    val prev = load(batch.sparkSession, path)
    val regs = Hll.registers(batch, groupCols, valueCol, p)
    val merged = prev.map(Hll.merge(_, regs, groupCols)).getOrElse(regs)
    writeSwap(merged, path)
  }

  /** Fold one micro-batch into the persisted CMS cell table at `path`
    * (created on first fold). width/depth are sketch identity.
    */
  def foldCms(
      path: String,
      batch: DataFrame,
      valueCol: String,
      width: Int,
      depth: Int,
      weightCol: Option[String] = None): Unit = {
    // unretried by design: CMS cells are additive — a retry that re-ran
    // the merge after a committed swap would double every count
    val prev = load(batch.sparkSession, path)
    val cells = Cms.sketch(batch, valueCol, width, depth, weightCol)
    val merged = prev.map(Cms.merge(_, cells)).getOrElse(cells)
    writeSwap(merged, path)
  }

  /** Distinct-count estimates off the stored HLL table — serving reads
    * the sketch-bounded parquet, never the corpus. The returned frame is
    * MATERIALIZED (estimate-sized: one row per group) so a lock-free
    * reader in another process can never have the sketch files swapped
    * out from under a still-lazy plan after this call returns.
    */
  def hllEstimate(
      spark: SparkSession, path: String,
      groupCols: Seq[String], p: Int = Hll.DefaultP): Option[DataFrame] =
    withLoaded(spark, path)(_.map(t =>
      materialized(spark, Hll.estimate(t, groupCols, p))))

  /** Point estimates for `keys` off the stored CMS table — materialized
    * like [[hllEstimate]] (keys-sized output).
    */
  def cmsEstimate(
      spark: SparkSession, path: String,
      keys: Seq[String], width: Int, depth: Int): Option[DataFrame] =
    withLoaded(spark, path)(_.map(t =>
      materialized(spark, Cms.estimate(t, keys, width, depth))))

  /** Pin an estimate frame's ROWS driver-side (bounded by group/key
    * count, never sketch or corpus size) so the caller's frame no longer
    * depends on the swap-managed files. A plain collect+recreate — no
    * executor storage is pinned.
    */
  private def materialized(spark: SparkSession, df: DataFrame): DataFrame = {
    val rows = df.collect().toSeq
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1), df.schema)
  }

  /** Stage-then-swap rewrite: the merged frame READS the live table, so
    * it must fully materialize (the staging write) before the live dir is
    * replaced. Sketch-bounded rows → one output file.
    *
    * Crash safety: the live dir is RENAMED to `.bak` (not deleted) before
    * staging moves in, so every crash point leaves a loadable sketch —
    * before the bak-rename: live intact; between the renames: `.bak`
    * intact ([[load]] reads it in place); after the staging move: the new
    * live is committed and the stale `.bak` is garbage the next swap
    * clears. When this fold RAN against a `.bak`-recovered state, the
    * staging write above already materialized everything read from it,
    * so the delete below cannot orphan data.
    * The renames run under [[swapLock]] so a same-JVM reader can never
    * observe (and "recover") the mid-swap window; cross-process writers
    * are excluded by the warehouse write lock around the folds.
    */
  private def writeSwap(df: DataFrame, path: String): Unit = {
    val staging = path + ".delta"
    df.coalesce(1).write.mode(SaveMode.Overwrite).parquet(staging)
    swapLock.synchronized {
      val live = Paths.get(path)
      val bak = Paths.get(path + ".bak")
      if (Files.exists(live)) {
        graft.catalog.PartitionedTable.deleteDir(bak) // stale from a past crash
        Files.move(live, bak, StandardCopyOption.ATOMIC_MOVE)
        Files.move(Paths.get(staging), live, StandardCopyOption.ATOMIC_MOVE)
        graft.catalog.PartitionedTable.deleteDir(bak)
      } else {
        // live missing = this fold ran against a .bak-recovered state:
        // the backup is the ONLY committed sketch and must survive until
        // the new live lands — land staging FIRST, then clear it.
        // (Deleting .bak first would open a crash window with NO loadable
        // sketch at all, breaking the every-crash-point invariant above.)
        Files.move(Paths.get(staging), live, StandardCopyOption.ATOMIC_MOVE)
        graft.catalog.PartitionedTable.deleteDir(bak)
      }
    }
  }
}
