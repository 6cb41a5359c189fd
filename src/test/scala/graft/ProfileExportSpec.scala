package graft

import org.apache.spark.sql.functions._
import graft.operators.{Mixture, Profile}

/** Profile long-form semantics and the physical shard writer. */
class ProfileExportSpec extends SparkSpec {

  import spark.implicits._

  test("profile counts nulls and distincts per column, native-order min/max") {
    val df = Seq(
      (Some(10L), Some("b")), (Some(2L), None), (None, Some("a")), (Some(2L), Some("a"))
    ).toDF("n", "s")
    val rows = Profile.profile(df, Seq("n", "s")).collect()
      .map(r => r.getString(0) -> r).toMap
    val n = rows("n")
    assert(n.getLong(1) == 4 && n.getLong(2) == 1 && n.getLong(3) == 2)
    // native numeric order: min 2, max 10 (lexicographic would say "10" < "2")
    assert(n.getString(4) == "2" && n.getString(5) == "10")
    val s = rows("s")
    assert(s.getLong(2) == 1 && s.getLong(3) == 2)
    assert(s.getString(4) == "a" && s.getString(5) == "b")
  }

  test("approx-distinct profile stays within a few percent") {
    val df = spark.range(10000).select(col("id"), (col("id") % 1000).as("m"))
    val exact = Profile.profile(df, Seq("m")).collect()(0).getLong(3)
    val approx = Profile.profile(df, Seq("m"), approxDistinct = true)
      .collect()(0).getLong(3)
    assert(exact == 1000L)
    assert(math.abs(approx - 1000L) <= 50, s"approx $approx too far from 1000")
  }

  test("writeShards lays each shard down in pos order, one file per shard") {
    val tmp = java.nio.file.Files.createTempDirectory("shards").toString
    val docs = (1L to 500L).map(i => (i, s"payload$i")).toDF("id", "payload")
    Mixture.writeShards(docs, col("id"), nShards = 4, path = tmp)
    val back = spark.read.parquet(tmp)
    assert(back.count() == 500)
    assert(back.select("shard").distinct().count() == 4)
    // one data file per shard directory (no tiny-file spray)
    (0 until 4).foreach { s =>
      val files = new java.io.File(s"$tmp/shard=$s")
        .listFiles().filter(_.getName.endsWith(".parquet"))
      assert(files.length == 1, s"shard $s has ${files.length} files")
    }
    // layout matches the logical exportShards assignment exactly
    val logical = Mixture.exportShards(docs, col("id"), 4)
      .select("id", "shard", "pos").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val physical = back.select("id", "shard", "pos").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(logical == physical)
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(tmp))
  }

  test("vocab coverage matches a hand-built Zipf-ish corpus") {
    // 10 docs of "a", 5 of "b b", 1 of "c": f(a)=10, f(b)=10, f(c)=1, T=21
    val docs = ((1 to 10).map(i => (i.toLong, Seq("a"))) ++
      (11 to 15).map(i => (i.toLong, Seq("b", "b"))) :+ (16L, Seq("c")))
      .toDF("id", "toks")
    val rows = graft.operators.Vocab.coverage(docs, Seq(0.5, 0.95, 1.0))
      .collect().map(r => r.getDouble(0) -> r.getLong(1)).toMap
    // 50%: need ceil(10.5)=11 tokens -> both f=10 types needed (block math)
    assert(rows(0.5) == 2L)
    // 95%: ceil(19.95)=20 -> two types cover 20 >= 20
    assert(rows(0.95) == 2L)
    // 100%: all three
    assert(rows(1.0) == 3L)
  }
}
