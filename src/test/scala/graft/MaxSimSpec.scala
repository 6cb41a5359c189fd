package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.search.MaxSim

/** Late-interaction maxsim retrieval: hand-computed scoring contract,
  * repeated-token semantics, and the ANN-shortlist serving path's
  * equivalence to the full scan restricted to the shortlist.
  */
class MaxSimSpec extends SparkSpec {
  import spark.implicits._

  private def vecs(rows: Seq[(Long, Seq[Double])]): DataFrame =
    rows.toDF("doc_id", "vec")

  private def toks(rows: Seq[(Int, Int, Seq[Double])]): DataFrame =
    rows.toDF("query_idx", "tok_idx", "vec")

  test("score = sum over query tokens of the best chunk dot product") {
    val chunks = vecs(Seq(
      1L -> Seq(1.0, 0.0), 1L -> Seq(0.0, 1.0), // doc 1: two chunks
      2L -> Seq(2.0, 2.0))) // doc 2: one chunk
    val q = toks(Seq((0, 0, Seq(1.0, 0.0)), (0, 1, Seq(0.0, 3.0))))
    val got = MaxSim.topK(chunks, q, k = 10).collect()
      .map(r => (r.getLong(1), r.getDouble(2))).sortBy(_._1).toSeq
    // doc1: max(1,0) + max(0,3) = 4 ; doc2: 2 + 6 = 8
    assert(got == Seq(1L -> 4.0, 2L -> 8.0))
  }

  test("a repeated query token scores twice — tok_idx keeps both rows") {
    val chunks = vecs(Seq(1L -> Seq(1.0, 1.0)))
    val q = toks(Seq((0, 0, Seq(1.0, 0.0)), (0, 1, Seq(1.0, 0.0))))
    val got = MaxSim.topK(chunks, q, k = 1).head()
    assert(got.getDouble(2) == 2.0)
  }

  test("candidate-pruned serving equals the full scan restricted to the shortlist") {
    val chunks = vecs((1L to 40L).flatMap { d =>
      (0 until 3).map(c => d -> Seq((d % 7).toDouble, c.toDouble, (d % 5).toDouble))
    })
    val q = toks(Seq(
      (0, 0, Seq(1.0, 2.0, 0.0)), (0, 1, Seq(0.0, 1.0, 3.0)),
      (1, 0, Seq(2.0, 0.0, 1.0))))
    // shortlist: query 0 -> docs 1..20, query 1 -> even docs
    val cand = ((1L to 20L).map(0 -> _) ++ (1L to 40L).filter(_ % 2 == 0).map(1 -> _))
      .toDF("query_idx", "doc_id")
    val full = MaxSim.topK(chunks, q, k = 1000)
      .join(cand, Seq("query_idx", "doc_id"), "left_semi")
      .select("query_idx", "doc_id", "score")
    val pruned = MaxSim.topK(chunks, q, k = 1000, candidates = Some(cand))
    assert(pruned.exceptAll(full).count() == 0 &&
      full.exceptAll(pruned).count() == 0)
    // and the pruned top-k never scores a non-candidate
    val top = MaxSim.topK(chunks, q, k = 5, candidates = Some(cand)).collect()
    assert(top.forall(r => r.getInt(0) != 1 || r.getLong(1) % 2 == 0))
  }

  test("topK equals the brute-force maxsim definition over randomized fixtures") {
    for (seed <- 1 to 5) {
      val rnd = new scala.util.Random(seed)
      val dim = 3
      def vec() = Seq.fill(dim)((rnd.nextInt(7) - 3).toDouble)
      val nDocs = 1 + rnd.nextInt(8)
      val chunks: Seq[(Long, Seq[Double])] = (1L to nDocs).flatMap { d =>
        Seq.fill(1 + rnd.nextInt(3))(d -> vec())
      }
      val toksS: Seq[(Int, Int, Seq[Double])] = (0 until 1 + rnd.nextInt(3)).flatMap { q =>
        (0 until 1 + rnd.nextInt(3)).map(t => (q, t, vec()))
      }
      val got = MaxSim.topK(vecs(chunks), toks(toksS), k = nDocs).collect()
        .map(r => (r.getInt(0), r.getLong(1)) -> r.getDouble(2)).toMap
      val want = (for {
        q <- toksS.map(_._1).distinct
        d <- 1L to nDocs
      } yield (q, d) -> toksS.filter(_._1 == q).map { case (_, _, qv) =>
        chunks.filter(_._1 == d)
          .map(c => c._2.zip(qv).map { case (a, b) => a * b }.sum).max
      }.sum).toMap
      assert(got == want, s"seed=$seed")
    }
  }

  test("token-frame size gate: shuffle path equals broadcast path") {
    val chunks = vecs((1L to 30L).flatMap { d =>
      (0 until 2).map(c => d -> Seq((d % 5).toDouble, c.toDouble))
    })
    val q = toks(Seq((0, 0, Seq(1.0, 2.0)), (1, 0, Seq(2.0, 1.0))))
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2)))
      .sortBy(x => (x._1, x._2)).toSeq
    val full = rows(MaxSim.topK(chunks, q, k = 8))
    assert(full.nonEmpty && full == rows(
      MaxSim.topK(chunks, q, k = 8, broadcastRowLimit = 0L)))
    val cand = Seq((0, 3L), (0, 7L), (1, 4L), (1, 9L)).toDF("query_idx", "doc_id")
    val p = rows(MaxSim.topK(chunks, q, k = 8, candidates = Some(cand)))
    assert(p.nonEmpty && p == rows(MaxSim.topK(chunks, q, k = 8,
      candidates = Some(cand), broadcastRowLimit = 0L)))
  }
}
