package graft

import org.apache.spark.sql.functions._
import graft.dedup.EditJoin

class EditJoinSpec extends SparkSpec {

  private def pairs(df: org.apache.spark.sql.DataFrame): Set[(String, String, Long)] =
    df.collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet

  private def strs(ss: Seq[String]) = {
    import spark.implicits._
    ss.toDF("str").select(col("str").as("id"), col("str"))
  }

  test("prefix-filtered edit join equals the naive form, both legs exercised") {
    // heavy strings (typo families), light strings (<= kq+q-1 chars,
    // including len < q), and light-heavy boundary pairs
    val corpus = strs(Seq(
      "distributed shuffle", "distributed shufle", "distribted shuffle",
      "broadcast hash join", "broadcast hash joins", "broadcast nash join",
      "catalyst optimizer", "catalyst optimiser",
      "ab", "ac", "a", "b", "abcd", "abce", "abcdef",
      "wholestage codegen"))
    for (k <- Seq(1, 2, 3)) {
      val fast = pairs(EditJoin.editDistancePairs(corpus, k))
      val naive = pairs(EditJoin.editDistancePairsNaive(corpus, k))
      assert(fast == naive, s"k=$k: pruning changed the pair set")
      assert(naive.nonEmpty, s"k=$k suspiciously empty")
    }
  }

  test("identical strings under distinct ids pair at distance 0") {
    import spark.implicits._
    val df = Seq(("x1", "same text here"), ("x2", "same text here"))
      .toDF("id", "str")
    val got = pairs(EditJoin.editDistancePairs(df, k = 1))
    assert(got == Set(("x1", "x2", 0L)))
  }

  test("matches the part-name vocabulary against duckdb-counted truth") {
    // 24 unordered pairs at k=2 over sf0.01 distinct part names — counted
    // independently in DuckDB while designing q_dedup_editdist
    val names = Tables.t(spark, "/root/testdata/sf0.01", "part")
      .select(col("p_name").as("str")).distinct()
      .select(col("str").as("id"), col("str"))
    val fast = EditJoin.editDistancePairs(names, k = 2)
    assert(fast.count() == 24L)
    assert(pairs(fast) == pairs(EditJoin.editDistancePairsNaive(names, k = 2)))
  }

  test("partitioning invariance") {
    val corpus = strs(Seq(
      "distributed shuffle", "distributed shufle", "ab", "ac", "abcd", "abce"))
    val one = pairs(EditJoin.editDistancePairs(corpus.repartition(1), 2))
    val many = pairs(EditJoin.editDistancePairs(corpus.repartition(7), 2))
    assert(one == many)
  }
}
