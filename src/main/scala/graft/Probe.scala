package graft

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._

/** Scratch profiling main — not part of the library surface. */
object Probe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.icu.caseMappings.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id").as("id"), col("text").as("content"))

    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"== $name: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }

    import graft.functions.TextFunctions.{tokens, stableHash32}
    val toks = docs.select(col("id"), explode(tokens(col("content"))).as("tok"))
    t("tokenize only")(println("tok rows: " + toks.count()))
    t("tokenize+md5")(println(
      toks.withColumn("h", stableHash32(col("tok"))).agg(sum("h")).collect()(0)))
    t("tok counts")(println("distinct (id,tok): " +
      toks.groupBy("id", "tok").count().count()))
    println("distinct tok: " + toks.select("tok").distinct().count())
    t("fingerprints current") {
      println(graft.dedup.Dedup.simHashFingerprints(docs).agg(sum("fp")).collect()(0))
    }
    // variant: 32 aggs on bit extraction without when/otherwise
    t("fingerprints bitsum") {
      val h = toks.withColumn("h", stableHash32(col("tok")))
      val bitAggs = sum(lit(1L)).as("t") +:
        (0 until 32).map(i =>
          sum(call_function("shiftright", col("h"), lit(i)) % 2).as(s"s$i"))
      val agg = h.groupBy("id").agg(bitAggs.head, bitAggs.tail: _*)
      val fp = agg.select(col("id"),
        (0 until 32).map(i =>
          when(col(s"s$i") * 2 > col("t"), lit(1L << i)).otherwise(lit(0L)))
          .reduce(_ + _).as("fp"))
      println(fp.agg(sum("fp")).collect()(0))
    }
    // join-side stages of simHashNearDups(3, 6)
    import org.apache.spark.storage.StorageLevel
    val fpDf = graft.dedup.Dedup.simHashFingerprints(docs)
      .persist(StorageLevel.MEMORY_ONLY)
    fpDf.count()
    val maxHamming = 3; val blocks = 6
    val fps = fpDf.select("fp").distinct()
    val widths = (0 until blocks).map(i => 32 / blocks + (if (i < 32 % blocks) 1 else 0))
    val offsets = widths.scanLeft(0)(_ + _)
    def blockVal(b: Int): Column =
      call_function("shiftright", col("fp"), lit(offsets(b))) % (1L << widths(b))
    val comboKeys = (0 until blocks).combinations(blocks - maxHamming).toSeq.map { combo =>
      combo.foldLeft((lit(0L), 0)) { case ((acc, at), b) =>
        (acc + blockVal(b) * lit(1L << at), at + widths(b))
      }._1
    }
    println("combos: " + comboKeys.size)
    val banded = fps.select(
      col("fp"), posexplode(array(comboKeys: _*)).as(Seq("block", "key")))
    t("banding")(println("banded rows: " + banded.count()))
    val bandedP = banded.persist(StorageLevel.MEMORY_ONLY)
    bandedP.count()
    import graft.functions.TextFunctions.hamming
    val fpPairs = bandedP.as("x").join(bandedP.as("y"),
        col("x.block") === col("y.block") && col("x.key") === col("y.key") &&
          col("x.fp") < col("y.fp"))
      .select(col("x.fp").as("fp_a"), col("y.fp").as("fp_b"))
      .withColumn("hamming", hamming(col("fp_a"), col("fp_b")))
      .filter(col("hamming") <= maxHamming)
      .distinct()
    t("fpPairs (banded persisted)")(println("fp pairs: " + fpPairs.count()))
    t("full op again") {
      println("pairs: " + graft.dedup.Dedup.simHashNearDups(docs, 3, 6)
        .queryExecution.toRdd.count())
    }
    t("full op third") {
      println("pairs: " + graft.dedup.Dedup.simHashNearDups(docs, 3, 6)
        .queryExecution.toRdd.count())
    }
    spark.stop()
  }
}
