package graft

import graft.operators.{Drift, Eval}
import org.apache.spark.sql.DataFrame

/** Exact AUC (tie-aware, distributed prefix-sum form) and PSI drift:
  * hand-computed values, boundary cases, and partitioning/bucket-count
  * invariance (the distributed form must be a pure function of the data).
  */
class EvalSpec extends SparkSpec {

  import spark.implicits._

  private def auc(rows: Seq[(Long, Long)], buckets: Int = 1024): (Long, Long, Long, Option[Long], Option[Long]) = {
    val r = Eval.aucExact(rows.toDF("margin_micro", "pos"), buckets = buckets).head()
    (r.getAs[Long]("n_pos"), r.getAs[Long]("n_neg"), r.getAs[Long]("n_margins"),
      Option(r.getAs[java.lang.Long]("auc_micro")).map(_.longValue()),
      Option(r.getAs[java.lang.Long]("gini_micro")).map(_.longValue()))
  }

  test("perfect separation gives AUC 1.0, reversed gives 0.0") {
    val perfect = Seq((10L, 1L), (9L, 1L), (2L, 0L), (1L, 0L))
    assert(auc(perfect) == ((2L, 2L, 4L, Some(1000000L), Some(1000000L))))
    val reversed = perfect.map { case (m, p) => (m, 1L - p) }
    assert(auc(reversed) == ((2L, 2L, 4L, Some(0L), Some(-1000000L))))
  }

  test("all-tied margins give AUC 0.5 (Gini 0)") {
    assert(auc(Seq((5L, 1L), (5L, 1L), (5L, 0L), (5L, 0L), (5L, 0L))) ==
      ((2L, 3L, 1L, Some(500000L), Some(0L))))
  }

  test("hand-computed tie case: pos {3,1}, neg {2,1} -> 2.5/4 = 0.625") {
    assert(auc(Seq((3L, 1L), (1L, 1L), (2L, 0L), (1L, 0L))) ==
      ((2L, 2L, 3L, Some(625000L), Some(250000L))))
  }

  test("single-class input yields null AUC, empty input yields zero row") {
    val onlyPos = auc(Seq((3L, 1L), (1L, 1L)))
    assert(onlyPos == ((2L, 0L, 2L, None, None)))
    val empty = Eval.aucExact(Seq.empty[(Long, Long)].toDF("margin_micro", "pos")).head()
    assert(empty.getAs[Long]("n_pos") == 0L && empty.isNullAt(3))
  }

  test("AUC is invariant to partitioning and bucket count") {
    // deterministic pseudo-random margins with label correlation + ties
    val rows = (1 to 500).map { i =>
      val m = (i * 2654435761L) % 97L
      (m, if ((m * 7 + i) % 3 != 0) (if (m > 48) 1L else 0L) else (if (m > 20) 1L else 0L))
    }
    val base = auc(rows)
    assert(base._4.get > 500000L) // positively correlated by construction
    assert(auc(rows, buckets = 1) == base)
    assert(auc(rows, buckets = 7) == base)
    val repart = Eval.aucExact(
      rows.toDF("margin_micro", "pos").repartition(13), buckets = 64).head()
    assert(repart.getAs[Long]("auc_micro") == base._4.get)
  }

  private def psi(ref: DataFrame, cur: DataFrame, bins: Int = 10): Seq[(Long, Long, Long, Long, Long, Long)] =
    Drift.psi(ref, cur, "v", bins).orderBy("bin").collect().toSeq
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))

  test("identical distributions give PSI exactly 0") {
    val d = (1L to 200L).toDF("v")
    val rows = psi(d, d)
    assert(rows.size == 10)
    assert(rows.forall(_._5 == 0L) && rows.forall(_._6 == 0L))
  }

  test("shifted distribution registers drift; out-of-range clamps to edge bins") {
    val ref = (100L to 199L).toDF("v")
    val cur = (160L to 299L).toDF("v") // half out of range above
    val rows = psi(ref, cur)
    val total = rows.head._6
    assert(total > 250000000L, s"PSI total $total should exceed 0.25 (nano)")
    // bin 9 = in-range 190..199 (10 rows) + all 100 clamped 200..299
    assert(rows.find(_._1 == 9L).get._4 == 110L)
    // bins hold the full current count despite the range mismatch
    assert(rows.map(_._4).sum == 140L)
    assert(rows.map(_._3).sum == 100L)
  }

  test("anomaly z-scores: hand-computed spike, zero-filled silent bucket") {
    import graft.operators.Anomaly
    // type A hour 0: counts 2,2,5 across days 0..2 -> day2 z = 6/sqrt(18)
    // type B only exists on day 2 (makes day2 part of the grid for A too)
    val ev = (Seq.fill(2)(("A", 0L)) ++ Seq.fill(2)(("A", 86400000L)) ++
      Seq.fill(5)(("A", 2 * 86400000L)) ++ Seq.fill(1)(("B", 2 * 86400000L + 3600000L)))
      .toDF("event_type", "ts_ms")
    val out = Anomaly.hourlyZScores(ev).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)) ->
        (r.getLong(3), r.getLong(4), r.getLong(6))).toMap
    assert(out(("A", 2L, 0L)) == ((5L, 3L, 1414L)))
    assert(out(("A", 0L, 0L)) == ((2L, 3L, -708L))) // floor(-707.1)
    // B's hour 1: counts 0,0,1 -> day2 dev 2, var_num 2, z = sqrt(2)
    assert(out(("B", 2L, 1L)) == ((1L, 3L, 1414L)))
    // A's silent hour-1 buckets zero-fill but have zero variance -> absent
    assert(!out.contains(("A", 0L, 1L)))
    // repartition invariance
    val out2 = Anomaly.hourlyZScores(ev.repartition(7)).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)) -> r.getLong(6)).toMap
    assert(out2 == out.view.mapValues(_._3).toMap)
  }

  test("PCA power iteration finds the dominant direction and centers means") {
    import graft.operators.Pca
    // variance overwhelmingly along dim 0 (+ constant offset on dim 2)
    val vecs = (1 to 400).map { i =>
      val main = ((i % 21) - 10).toFloat // spread -10..10 on dim 0
      val noise = (((i * 7) % 5) - 2).toFloat * 0.01f
      (i.toLong, Array(main, noise, 3.0f + noise, 0.0f).toSeq)
    }.toDF("id", "embedding")
    val rows = Pca.topComponent(vecs, iters = 3).orderBy("dim").collect()
    assert(rows.length == 4)
    val v = rows.map(_.getAs[Long]("v_micro"))
    assert(math.abs(v(0)) > 999000L, s"dominant dim not found: ${v.toSeq}")
    assert(math.abs(v(1)) < 20000L && math.abs(v(3)) < 20000L)
    // dim-2 mean ~3.0 captured; its centered variance is noise-sized
    assert(math.abs(rows(2).getAs[Long]("mean_micro") - 3000000L) < 15000L)
    assert(rows.head.getAs[Long]("explained_ppm") > 990000L)
    // deterministic + partitioning-invariant
    val again = Pca.topComponent(vecs.repartition(13), iters = 3)
      .orderBy("dim").collect()
    assert(again.map(_.toSeq).toSeq == rows.map(_.toSeq).toSeq)
  }

  test("abTest: hand-computed two-proportion z; degenerate cases null") {
    import graft.operators.Experiment
    // arm0 1/4 vs arm1 3/4: pool .5, z = .5/sqrt(.125) = 1.41421
    val units = (Seq.fill(1)((0L, 1L)) ++ Seq.fill(3)((0L, 0L)) ++
      Seq.fill(3)((1L, 1L)) ++ Seq.fill(1)((1L, 0L))).toDF("arm", "converted")
    val r = Experiment.abTest(units).head()
    assert(r.getAs[Long]("n_0") == 4L && r.getAs[Long]("n_1") == 4L)
    assert(r.getAs[Long]("rate_0_micro") == 250000L)
    assert(r.getAs[Long]("rate_1_micro") == 750000L)
    assert(r.getAs[Long]("lift_micro") == 500000L)
    assert(r.getAs[Long]("z_milli") == 1414L)
    // everyone converted -> zero pooled variance -> null z
    val flat = Experiment.abTest(Seq((0L, 1L), (1L, 1L)).toDF("arm", "converted")).head()
    assert(flat.isNullAt(flat.fieldIndex("z_milli")))
    // one empty arm -> null rate + z
    val one = Experiment.abTest(Seq((0L, 1L), (0L, 0L)).toDF("arm", "converted")).head()
    assert(one.isNullAt(one.fieldIndex("rate_1_micro")) &&
      one.isNullAt(one.fieldIndex("z_milli")))
  }

  test("sessionPaths: 3-step paths respect session gaps and rank by count") {
    import graft.operators.Transitions
    val m = 60000L
    val ev = Seq(
      // user 1, one session: A B C D
      (1L, 1L, "A", 0L), (1L, 2L, "B", m), (1L, 3L, "C", 2 * m), (1L, 4L, "D", 3 * m),
      // user 2, one session: A B C
      (2L, 5L, "A", 0L), (2L, 6L, "B", m), (2L, 7L, "C", 2 * m),
      // user 3: A B, 31-min gap, C D -> no 3-path
      (3L, 8L, "A", 0L), (3L, 9L, "B", m), (3L, 10L, "C", 32 * m), (3L, 11L, "D", 33 * m)
    ).toDF("user_id", "event_id", "event_type", "ts_ms")
    val out = Transitions.sessionPaths(ev, steps = 3, k = 10).collect()
      .map(r => r.getString(0) -> r.getLong(1))
    assert(out.toSeq == Seq("A > B > C" -> 2L, "B > C > D" -> 1L))
    // k truncates after the (count desc, path asc) order
    val top1 = Transitions.sessionPaths(ev, steps = 3, k = 1).collect()
    assert(top1.length == 1 && top1.head.getString(0) == "A > B > C")
  }

  test("PSI is partitioning-invariant and symmetric-ish under swap") {
    val ref = (1L to 300L).map(i => i % 50L).toDF("v")
    val cur = (1L to 200L).map(i => (i * i) % 50L).toDF("v")
    val a = psi(ref, cur)
    val b = psi(ref.repartition(11), cur.repartition(3))
    assert(a == b)
    // swapping sides flips each term's sign context but PSI stays positive
    assert(a.head._6 > 0L)
  }
}
