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
    if (Files.exists(p))
      Files.walk(p).sorted(Comparator.reverseOrder[Path]())
        .forEach(f => Files.delete(f))
}
