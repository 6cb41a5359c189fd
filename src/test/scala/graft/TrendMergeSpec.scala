package graft

import org.apache.spark.sql.functions._
import graft.operators.{Profile, Trend}

/** Mergeable profile and grouped OLS trend. */
class TrendMergeSpec extends SparkSpec {

  test("mergeProfiles of disjoint halves equals the full profile") {
    import spark.implicits._
    val rows = (0 until 200)
      .map(i => (i.toLong, if (i % 11 == 0) None else Some((i * 3 % 97).toLong)))
      .toDF("id", "v")
    val full = Profile.profileLong(rows, Seq("id", "v"))
      .collect().map(r => r.getString(0) -> r.toSeq.tail).toMap
    val merged = Profile.mergeProfiles(
        Profile.profileLong(rows.filter(col("id") < 100), Seq("id", "v")),
        Profile.profileLong(rows.filter(col("id") >= 100), Seq("id", "v")))
      .collect().map(r => r.getString(0) -> r.toSeq.tail).toMap
    assert(merged == full)
    // null accounting is real: v has nulls, id has none
    assert(full("v")(1).asInstanceOf[Long] > 0 && full("id")(1) == 0L)
  }

  test("groupOls recovers a planted linear relation exactly") {
    import spark.implicits._
    // y = 7x + 13 within group a; pure noise-free fit -> slope 7.000000
    val rows = ((1 to 50).map(x => ("a", x.toLong, 7L * x + 13)) ++
      (1 to 50).map(x => ("b", 5L, x.toLong))) // degenerate: constant x
      .toDF("g", "x", "y")
    val out = Trend.groupOls(rows, "g", "x", "y").collect()
      .map(r => r.getString(0) -> (r.getLong(2), r.getLong(3))).toMap
    assert(out("a") == ((7000000L, 13L)), s"got ${out("a")}")
    assert(out("b") == ((0L, 0L)), "degenerate group must report 0 by convention")
  }

  test("groupOls is partitioning-invariant") {
    import spark.implicits._
    val rows = (0 until 300).map(i => (s"g${i % 3}", (i % 17).toLong, (i % 29).toLong))
      .toDF("g", "x", "y")
    val a = Trend.groupOls(rows, "g", "x", "y").collect().map(_.toSeq).toSet
    val b = Trend.groupOls(rows.repartition(13), "g", "x", "y").collect().map(_.toSeq).toSet
    assert(a == b)
  }
}
