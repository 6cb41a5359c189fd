package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Physical-plan regression guards: the scale properties README promises
  * (bounded top-k, broadcast joins, pushdown, pruning) asserted on the
  * actual executed plans so a refactor can't silently regress them.
  */
class PlanSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def plan(df: DataFrame): String = {
    df.queryExecution.executedPlan.toString
  }

  test("semantic top-k compiles to TakeOrderedAndProject over a pruned scan") {
    val docs = Tables.vectors(spark, dir)
    val qs = Tables.queryVectors(spark, dir, Seq(0))
    val p = plan(graft.search.Semantic.search(docs, qs, 10))
    assert(p.contains("TakeOrderedAndProject"))
    assert(!p.contains("Exchange")) // no shuffle of the corpus for top-k
    // column pruning: content-free scan
    val scan = p.linesIterator.find(_.contains("FileScan")).getOrElse("")
    assert(!scan.contains("label"), "scan should prune unused columns")
  }

  test("star join broadcasts every dimension and pushes the region filter") {
    val p = plan(graft.entry.OlapQueries.q5Nation(spark, dir))
    assert(p.contains("BroadcastHashJoin"))
    assert(!p.contains("CartesianProduct"))
    assert(!p.contains("BroadcastNestedLoopJoin"))
    assert(p.contains("PushedFilters") &&
      p.contains("EqualTo(r_name,ASIA)"), "r_name filter must reach the scan")
  }

  test("lexical TF search keeps bounded top-k (no global sort)") {
    val docs = Tables.corpus(spark, dir)
    val p = plan(graft.search.Lexical.search(docs, Seq((0, "spark join")), 10))
    assert(p.contains("TakeOrderedAndProject"))
    assert(!p.contains("GlobalSort"))
  }

  test("native vector expressions stay inside WholeStageCodegen") {
    val docs = Tables.vectors(spark, dir)
    val scored = docs.withColumn("score",
      graft.functions.VectorFunctions.dot(col("embedding"), col("embedding")))
    val p = scored.queryExecution.executedPlan.toString
    assert(p.contains("*(1)"), "project should carry the WholeStageCodegen marker")
    // the scoring project must NOT fall out of codegen: dot is codegen'd
    val codegenDump = org.apache.spark.sql.execution.debug.codegenString(
      scored.queryExecution.executedPlan)
    assert(codegenDump.contains("numElements"), "DotProduct loop should be in generated code")
  }

  test("IVF probe prunes to the probed clusters (filter above the scan)") {
    val vecs = Tables.vectors(spark, dir)
    val centroids = graft.ann.Ann.representativeCentroids(vecs, "label")
    val assigned = graft.ann.Ann.assign(vecs, centroids).cache()
    assigned.count()
    val qs = Tables.queryVectors(spark, dir, Seq(0))
    val p = plan(graft.ann.Ann.ivfTopK(assigned, centroids, qs, 5, 3))
    assert(p.contains("cluster_id"))
    assert(p.contains("TakeOrderedAndProject"))
    assigned.unpersist()
  }
}
