package graft

import org.apache.spark.sql.functions._
import graft.operators.Hll

/** Oracle-replayable HLL: register derivation hand-checked against an
  * independent md5 computation, exact union-max mergeability, and
  * estimate accuracy in both the HLL and linear-counting regimes.
  */
class HllSpec extends SparkSpec {
  import spark.implicits._

  test("register derivation matches an independent md5 computation") {
    val v = "hello"
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(v.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val h = java.lang.Long.parseLong(hex.take(15), 16)
    val p = 9; val w = 60 - p
    val expIdx = h >>> w
    val z = h & ((1L << w) - 1)
    val expRho = if (z == 0) w + 1 else w + 1 - (64 - java.lang.Long.numberOfLeadingZeros(z))
    val got = Hll.registers(Seq(("g", v)).toDF("grp", "v"), Seq("grp"), "v", p)
      .collect().head
    assert(got.getLong(1) == expIdx && got.getInt(2) == expRho,
      s"got (${got.getLong(1)}, ${got.getInt(2)}) want ($expIdx, $expRho)")
  }

  test("merge of two halves equals the whole, row-identical") {
    val vals = (0 until 2000).map(i => ("g", s"item$i"))
    val all = Hll.registers(vals.toDF("grp", "v"), Seq("grp"), "v")
    val a = Hll.registers(vals.take(1200).toDF("grp", "v"), Seq("grp"), "v")
    val b = Hll.registers(vals.drop(800).toDF("grp", "v"), Seq("grp"), "v") // overlap on purpose
    val merged = Hll.merge(a, b, Seq("grp"))
    assert(merged.exceptAll(all).isEmpty && all.exceptAll(merged).isEmpty)
  }

  test("estimate within the expected error in the HLL regime") {
    // m = 512 -> relative error ~1.04/sqrt(512) = 4.6%; allow 3 sigma
    val n = 20000
    val vals = (0 until n).map(i => ("g", s"val-$i-x"))
    val est = Hll.estimate(
        Hll.registers(vals.toDF("grp", "v"), Seq("grp"), "v"), Seq("grp"))
      .collect().head.getDouble(3)
    assert(math.abs(est / n - 1.0) < 0.14, s"est $est for $n distinct")
  }

  test("linear counting handles small cardinalities tightly") {
    val n = 30
    val vals = (0 until n).map(i => ("g", s"tiny$i"))
    val est = Hll.estimate(
        Hll.registers(vals.toDF("grp", "v"), Seq("grp"), "v"), Seq("grp"))
      .collect().head.getDouble(3)
    assert(math.abs(est - n) <= 2, s"LC est $est for $n distinct")
  }

  test("duplicates do not move the sketch") {
    val once = Hll.registers(Seq(("g", "x"), ("g", "y")).toDF("grp", "v"),
      Seq("grp"), "v")
    val dup = Hll.registers(
      Seq(("g", "x"), ("g", "x"), ("g", "y"), ("g", "y")).toDF("grp", "v"),
      Seq("grp"), "v")
    assert(once.exceptAll(dup).isEmpty && dup.exceptAll(once).isEmpty)
  }

  test("guards") {
    intercept[IllegalArgumentException] {
      Hll.registers(Seq(("g", "x")).toDF("grp", "v"), Seq("grp"), "v", p = 2)
    }
  }
}
