package graft

import org.apache.spark.sql.SparkSession
import graft.dedup.Dedup

/** Scratch profiling harness for the dedup paths (not part of the library
  * surface). Times only PUBLIC operators so the measured code is always
  * the shipped code.
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
    time("warm")(Dedup.ngramJaccardPrefix(docs, 0.5).count())
    spark.catalog.clearCache()
    (1 to 3).foreach { i =>
      time(s"ngramJaccardPrefix#$i")(Dedup.ngramJaccardPrefix(docs, 0.5).count())
      spark.catalog.clearCache()
      time(s"ngramJaccard#$i")(Dedup.ngramJaccard(docs, 0.5).count())
      spark.catalog.clearCache()
      time(s"minHashNearDups#$i")(Dedup.minHashNearDups(docs, 0.6).count())
      spark.catalog.clearCache()
      time(s"simHashNearDups#$i")(Dedup.simHashNearDups(docs).count())
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
