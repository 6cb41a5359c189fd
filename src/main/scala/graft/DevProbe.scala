package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.dedup.Dedup

/** Scratch profiling harness (not part of the library surface). */
object DevProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.icu.caseMappings.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"$name%-24s ${(System.nanoTime() - t0) / 1e9}%6.2fs"); r
    }
    val docs = Tables.textCorpus(spark, sfDir)
    time("docs.count")(docs.count())
    val sh = Dedup.shingleRows(docs, 3)
    time("shingle.count")(sh.count())
    val shc = sh.cache()
    time("shingle.cache")(shc.count())
    val sigs = Dedup.minHashSignatures(shc)
    time("sigs.count")(sigs.count())
    time("sigs.count(warm)")(sigs.count())
    val full = Dedup.minHashNearDups(docs, threshold = 0.6)
    time("minhash.full")(full.count())
    time("minhash.full(2nd)")(Dedup.minHashNearDups(docs, threshold = 0.6).count())
    spark.stop()
  }
}
