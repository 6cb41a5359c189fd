package graft

import graft.operators.Privacy

/** k-anonymity / l-diversity audit: exact hand-computed counts. */
class PrivacySpec extends SparkSpec {
  import spark.implicits._

  test("kAnonymityReport: violations, suppression ppm, diversity floor") {
    // class (en,1): 5 rows, 3 sources; (en,2): 2 rows, 1 source;
    // (de,1): 1 row, 1 source — total 8
    val rows = Seq(
      ("en", 1L, "s1"), ("en", 1L, "s1"), ("en", 1L, "s2"),
      ("en", 1L, "s3"), ("en", 1L, "s3"),
      ("en", 2L, "s1"), ("en", 2L, "s1"),
      ("de", 1L, "s2")).toDF("lang", "band", "source")
    val got = Privacy.kAnonymityReport(rows, Seq("lang", "band"), "source",
        ks = Seq(2, 5, 6))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toSeq
    assert(got == Seq(
      (2, 3L, 1L, 1L, 2L, 125000L),   // only (de,1) under k=2
      (5, 3L, 2L, 3L, 2L, 375000L),   // (en,2) + (de,1)
      (6, 3L, 3L, 8L, 2L, 1000000L))) // everything suppressed
  }

  test("kAnonymityReport guards empty inputs and arguments") {
    val rows = Seq(("en", "s")).toDF("lang", "source")
    intercept[IllegalArgumentException] {
      Privacy.kAnonymityReport(rows, Seq.empty, "source", Seq(2))
    }
    intercept[IllegalArgumentException] {
      Privacy.kAnonymityReport(rows, Seq("lang"), "source", Seq.empty)
    }
    intercept[IllegalArgumentException] {
      Privacy.kAnonymityReport(rows.limit(0), Seq("lang"), "source", Seq(2))
    }
  }
}
