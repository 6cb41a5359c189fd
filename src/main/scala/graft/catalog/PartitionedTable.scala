package graft.catalog

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import java.util.Comparator

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions.col

/** Partition-level replacement for hash/cluster-partitioned parquet tables
  * (the documents table's id buckets and every derived index).
  *
  * [[replacePartitions]] rebuilds ONLY the named partition dirs from
  * `replacement` (which must contain rows for exactly those partitions):
  * write to a sibling `.delta` staging dir, then per partition delete the
  * live dir and move the staged one in — an absent staged dir means the
  * partition drained empty and the delete stands alone, so a stale
  * partition can never survive a write that emptied it. The same swap
  * discipline as a full rewrite (never reads and overwrites one path in a
  * single job); on a distributed filesystem each move is one rename.
  */
object PartitionedTable {

  def replacePartitions(
      replacement: DataFrame,
      tablePath: String,
      partCols: Seq[String],
      sortCol: Option[String],
      affectedDirs: Seq[String]): Unit = {
    val staging = tablePath + ".delta"
    val repart = replacement.repartition(partCols.map(col): _*)
    val sorted = sortCol.fold(repart)(c => repart.sortWithinPartitions(c))
    sorted.write
      .partitionBy(partCols: _*)
      .mode(SaveMode.Overwrite)
      .parquet(staging)
    affectedDirs.foreach { rel =>
      val target = Paths.get(s"$tablePath/$rel")
      deleteDir(target)
      val src = Paths.get(s"$staging/$rel")
      if (Files.exists(src)) {
        Files.createDirectories(target.getParent)
        Files.move(src, target, StandardCopyOption.ATOMIC_MOVE)
      }
    }
    deleteDir(Paths.get(staging))
  }

  def deleteDir(p: Path): Unit =
    if (Files.exists(p)) {
      val stream = Files.walk(p)
      try stream.sorted(Comparator.reverseOrder[Path]())
        .forEach(f => Files.delete(f))
      finally stream.close()
    }

  /** Children of `dir`, with the listing stream CLOSED (an unclosed
    * Files.list leaks a file handle per call — a long-lived driver JVM
    * running periodic maintenance would bleed descriptors).
    */
  private def listAll(dir: Path): Seq[Path] = {
    val stream = Files.list(dir)
    try stream.toArray.toSeq.map(_.asInstanceOf[Path])
    finally stream.close()
  }

  /** Bin-pack fragmented partitions. Every incremental write leaves at
    * least one new file in each touched partition dir, so a frequently-
    * written bucket accumulates files and scan cost grows with WRITE COUNT
    * instead of data size — the classic small-files problem. This rewrites
    * ONLY partitions holding more than `maxFiles` parquet files, each down
    * to one file (bucket/partition granularity IS the size unit — the
    * bucket-count constant is the deployment sizing knob), through the
    * same stage-and-swap discipline as [[replacePartitions]]. Pure layout:
    * row-identical, no schema or partitioning change. Returns the relative
    * partition dirs compacted.
    */
  def compactPartitions(
      spark: org.apache.spark.sql.SparkSession,
      tablePath: String,
      partCols: Seq[String],
      sortCol: Option[String],
      maxFiles: Int = 4): Seq[String] = {
    require(maxFiles >= 1, s"need maxFiles >= 1 (got $maxFiles)")
    val base = Paths.get(tablePath)
    if (!Files.exists(base)) return Seq.empty
    // partition dirs = partCols.size levels of `col=value` directories
    def partDirs(dir: Path, level: Int): Seq[Path] =
      if (level == partCols.size) Seq(dir)
      else {
        val prefix = partCols(level) + "="
        val kids = listAll(dir)
          .filter(p => Files.isDirectory(p) && p.getFileName.toString.startsWith(prefix))
        kids.flatMap(partDirs(_, level + 1))
      }
    val fragmented = partDirs(base, 0).filter { d =>
      listAll(d).count(_.getFileName.toString.endsWith(".parquet")) > maxFiles
    }
    if (fragmented.isEmpty) return Seq.empty
    val rels = fragmented.map(d => base.relativize(d).toString)
    // basePath keeps the partition columns while reading only the
    // fragmented dirs; replacePartitions' repartition on the partition
    // keys lands each key in one task = one output file per dir
    val df = spark.read.option("basePath", tablePath)
      .parquet(fragmented.map(_.toString): _*)
    replacePartitions(df, tablePath, partCols, sortCol, rels)
    rels
  }
}
