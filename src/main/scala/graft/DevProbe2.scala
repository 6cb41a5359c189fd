package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel
import graft.dedup.Dedup

/** Scratch profiling harness for the prefix-filter dedup path (not part of
  * the library surface).
  */
object DevProbe2 {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.icu.caseMappings.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"$name%-28s ${(System.nanoTime() - t0) / 1e9}%6.2fs"); r
    }
    val docs = Tables.textCorpus(spark, sfDir)
    time("warm.prefix")(Dedup.ngramJaccardPrefix(docs, 0.5).count())
    spark.catalog.clearCache()
    (1 to 3).foreach { i =>
      time(s"full.prefix#$i")(Dedup.ngramJaccardPrefix(docs, 0.5).count())
      spark.catalog.clearCache()
    }

    val sets = Dedup.shingleSets(docs, 3).persist(StorageLevel.MEMORY_ONLY)
    time("sets.cache")(sets.count())
    val sh = sets.select(col("id"), explode(col("shs")).as("sh"), col("len"))
    val dfs = sh.groupBy("sh").agg(count(lit(1)).as("df"))
    time("dfs.count")(dfs.count())
    val rankW = org.apache.spark.sql.expressions.Window
      .partitionBy("id").orderBy(col("df").asc, col("sh").asc)
    val pref = sh.join(dfs, "sh")
      .withColumn("rnk", row_number().over(rankW))
      .filter(col("rnk") <=
        col("len") - ceil(lit(0.5) * col("len") - lit(1e-9)) + 1)
      .select("id", "sh", "len")
    time("pref.count")(pref.count())
    val cands = pref.as("x").join(pref.as("y"),
        col("x.sh") === col("y.sh") && col("x.id") < col("y.id") &&
          col("x.len") * lit(0.5) <= col("y.len") &&
          col("y.len") * lit(0.5) <= col("x.len"))
      .select(col("x.id").as("a"), col("y.id").as("b"))
      .distinct()
    time("cands.count")(cands.count())
    val ver = cands
      .join(sets.select(col("id").as("a"), col("shs").as("sha"), col("len").as("la")), "a")
      .join(sets.select(col("id").as("b"), col("shs").as("shb"), col("len").as("lb")), "b")
      .withColumn("inter",
        graft.functions.VectorExpressions.sortedIntersectCount(col("sha"), col("shb")))
      .withColumn("jaccard",
        col("inter").cast("double") / (col("la") + col("lb") - col("inter")).cast("double"))
      .filter(col("jaccard") >= 0.5)
      .select("a", "b", "jaccard")
    time("verify.count")(ver.count())
    spark.stop()
  }
}
