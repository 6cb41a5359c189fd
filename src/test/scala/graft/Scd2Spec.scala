package graft

import org.apache.spark.sql.functions._
import graft.operators.Scd2

/** SCD2 history build: run collapse, versioning, open current interval,
  * null-safe attribute compare, tie ordering, point-in-time lookup.
  */
class Scd2Spec extends SparkSpec {
  import spark.implicits._

  private val log = Seq(
    // key 1: gold -> gold (no-op) -> silver -> gold
    (1L, 10L, Some("gold")),
    (1L, 20L, Some("gold")),
    (1L, 30L, Some("silver")),
    (1L, 40L, Some("gold")),
    // key 2: null -> null (no-op) -> bronze
    (2L, 10L, None),
    (2L, 15L, None),
    (2L, 25L, Some("bronze")))
    .toDF("k", "ts", "tier")

  test("fromChangeLog collapses runs and versions per key") {
    val got = Scd2.fromChangeLog(log, "k", Seq("tier"), "ts")
      .collect().map(r => (r.getLong(0), r.getInt(1), Option(r.getString(2)),
        r.getLong(3), Option(r.get(4)).map(_.asInstanceOf[Long]),
        r.getBoolean(5))).toSeq.sortBy(t => (t._1, t._2))
    assert(got == Seq(
      (1L, 1, Some("gold"), 10L, Some(30L), false),
      (1L, 2, Some("silver"), 30L, Some(40L), false),
      (1L, 3, Some("gold"), 40L, None, true),
      (2L, 1, None, 10L, Some(25L), false),
      (2L, 2, Some("bronze"), 25L, None, true)))
  }

  test("equal timestamps order by the tie column") {
    val ties = Seq((1L, 10L, 1L, "a"), (1L, 10L, 2L, "b"), (1L, 10L, 3L, "b"))
      .toDF("k", "ts", "seq", "v")
    val got = Scd2.fromChangeLog(ties, "k", Seq("v"), "ts", Seq("seq"))
      .orderBy("version")
      .collect().map(r => (r.getInt(1), r.getString(2))).toSeq
    assert(got == Seq((1, "a"), (2, "b")))
  }

  test("asOf picks the interval containing the instant") {
    val hist = Scd2.fromChangeLog(log, "k", Seq("tier"), "ts")
    def at(k: Long, t: Long): Option[String] =
      Scd2.asOf(hist, lit(t)).filter(col("k") === k)
        .collect().headOption.map(_.getString(2))
    assert(at(1L, 9L).isEmpty)   // before first version
    assert(at(1L, 10L).contains("gold"))
    assert(at(1L, 35L).contains("silver"))
    assert(at(1L, 99L).contains("gold")) // open current interval
    assert(at(2L, 30L).contains("bronze"))
  }

  test("applyDelta equals a full rebuild (append, no-op change, new key, untouched key)") {
    // base: keys 1-3; delta: key 1 appends a real change then a no-op,
    // key 2's delta is a PURE no-op (attrs equal its current version),
    // key 4 is brand new, key 3 is untouched by the delta
    val base = Seq(
      (1L, 10L, Some("gold")), (1L, 30L, Some("silver")),
      (2L, 10L, None), (2L, 25L, Some("bronze")),
      (3L, 5L, Some("iron")))
      .toDF("k", "ts", "tier")
    val delta = Seq(
      (1L, 50L, Some("gold")), (1L, 60L, Some("gold")),
      (2L, 40L, Some("bronze")),
      (4L, 7L, None), (4L, 9L, Some("new")))
      .toDF("k", "ts", "tier")
    val incr = Scd2.applyDelta(
      Scd2.fromChangeLog(base, "k", Seq("tier"), "ts"),
      delta, "k", Seq("tier"), "ts")
    val full = Scd2.fromChangeLog(base.unionByName(delta), "k", Seq("tier"), "ts")
    assert(incr.exceptAll(full).count() == 0 && full.exceptAll(incr).count() == 0,
      s"incr:\n${incr.orderBy("k", "version").collect().mkString("\n")}\n" +
        s"full:\n${full.orderBy("k", "version").collect().mkString("\n")}")
    // delta-equal-ts tie ordering also matches the rebuild
    val deltaTie = Seq((1L, 50L, Some("a")), (1L, 50L, Some("b")))
      .toDF("k", "ts", "tier").withColumn("eid", col("tier"))
    val base2 = base.withColumn("eid", col("tier"))
    val incr2 = Scd2.applyDelta(
      Scd2.fromChangeLog(base2, "k", Seq("tier"), "ts", Seq("eid")),
      deltaTie, "k", Seq("tier"), "ts", Seq("eid"))
    val full2 = Scd2.fromChangeLog(base2.unionByName(deltaTie),
      "k", Seq("tier"), "ts", Seq("eid"))
    assert(incr2.exceptAll(full2).count() == 0 && full2.exceptAll(incr2).count() == 0)
  }

  test("guards") {
    intercept[IllegalArgumentException] {
      Scd2.fromChangeLog(log, "k", Seq.empty, "ts")
    }
  }
}
