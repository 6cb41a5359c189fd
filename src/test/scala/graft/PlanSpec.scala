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

  test("filtered vector search pushes the metadata predicate into the scan") {
    val p = plan(SparkEntry.queries("q_semantic_filtered")(spark, dir))
    assert(p.contains("PushedFilters") && p.contains("EqualTo(label,1)"),
      "label filter must reach the parquet scan, not sit above scoring")
    assert(p.contains("TakeOrderedAndProject"), "top-k must stay bounded")
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

  test("PQ ADC candidate scan reads codes only and stays keyed") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val vecs = (0 until 80).map { i =>
      (f"v$i%03d", Array.fill(16)(rnd.nextGaussian().toFloat).toSeq)
    }.toDF("id", "embedding")
      .select(col("id"), col("embedding").cast("array<float>").as("embedding"))
      .withColumn("norm", graft.functions.VectorFunctions.l2Norm(col("embedding")))
    val cb = graft.ann.Pq.train(vecs.select("id", "embedding"), 16, m = 4, k = 4, iters = 1)
    val codes = graft.ann.Pq.encode(vecs.select("id", "embedding"), 16, cb).cache()
    codes.count()
    try {
      val q = Seq(0 -> (0 until 16).map(_.toFloat))
      val adc = graft.ann.Pq.searchAdc(codes.select("id", "codes"), cb, q, 5)
      adc.collect()
      val p = adc.queryExecution.executedPlan.toString
      assert(p.contains("TakeOrderedAndProject"), "ADC top-k must stay bounded")
      assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
        "ADC scoring is a scan over codes, never a join")
      val rr = graft.ann.Pq.searchAdcRerank(codes.select("id", "codes"),
        vecs.select("id", "embedding", "norm"), cb, q, 5, oversample = 4)
      rr.collect()
      val rp = rr.queryExecution.executedPlan.toString.split("InMemoryRelation").head
      assert(!rp.contains("CartesianProduct"),
        "re-rank joins the tiny shortlist by id, never all-pairs")
    } finally codes.unpersist()
  }

  test("dedup pipelines never materialize an all-pairs product") {
    // the public routes eagerly checkpoint (so their persisted diagnosis
    // frames can unpersist deterministically), which collapses their
    // executed plan to an RDD scan — audit the un-checkpointed FromSets/
    // FromFingerprints dataflows the routes delegate to instead
    import spark.implicits._
    val docs = (0 until 60)
      .map(i => (s"d$i", s"shared prefix words here plus unique token u$i and filler f${i % 7}"))
      .toDF("id", "content")
    val sets = graft.dedup.Dedup.shingleSets(docs, 3)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_ONLY)
    val fp = graft.dedup.Dedup.simHashFingerprints64(docs)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_ONLY)
    try {
      for (df <- Seq(
          graft.dedup.Dedup.minHashNearDupsFromSets(sets, threshold = 0.6),
          graft.dedup.Dedup.ngramJaccardFromSets(sets, threshold = 0.5),
          graft.dedup.Dedup.simHashNearDups32FromFingerprints(
            fp.select(col("id"), col("fp_hi").as("fp")), maxHamming = 3, blocks = 4))) {
        df.collect() // finalize the adaptive plan before inspecting it
        val p = df.queryExecution.executedPlan.toString
        assert(!p.contains("CartesianProduct"),
          "candidate generation must stay keyed (bucket/shingle/block joins)")
        assert(!p.contains("BroadcastNestedLoopJoin"),
          "no non-equi join anywhere in the dedup dataflow")
      }
    } finally { sets.unpersist(); fp.unpersist() }
  }

  test("blocked kNN self-joins on cluster_id; only the K-centroid broadcast is unkeyed") {
    import spark.implicits._
    val rows = (0 until 30).map { i =>
      val v = Array.tabulate(4)(j => if (j == i % 3) 10f else 0.01f * i)
      (f"v$i%03d", v, i % 3)
    }
    val vecs = rows.toDF("id", "embedding", "label")
      .withColumn("norm", graft.functions.VectorFunctions.l2Norm(col("embedding")))
    val centroids = graft.ann.Ann.representativeCentroids(vecs, "label")
    val assigned = graft.ann.Ann.assign(vecs.select("id", "embedding", "norm"), centroids).cache()
    assigned.count()
    try {
      val blocked = graft.ann.Ann.knnJoinWithin(assigned, 3)
      blocked.collect()
      // the plan string embeds the CACHED assignment's build plan inside
      // InMemoryRelation; only the region above it is what executes here
      val p = blocked.queryExecution.executedPlan.toString
        .split("InMemoryRelation").head
      // over a materialized assignment the whole dataflow is keyed: the
      // centroid cross happened once at assignment build, not per side
      assert(!p.contains("CartesianProduct"))
      assert(!p.contains("BroadcastNestedLoopJoin"),
        "self-join over the materialized assignment must be keyed")
      assert("(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin) \\[cluster_id".r
        .findFirstIn(p).isDefined,
        "self-join must key on cluster_id")
    } finally assigned.unpersist()
  }

  test("as-of join plans as one keyed window — no join operator at all") {
    import spark.implicits._
    val left = (0 until 40).map(i => (i % 5L, i * 10L, i.toLong)).toDF("k", "ts", "lid")
    val right = (0 until 40).map(i => (i % 5L, i * 7L, i.toLong)).toDF("k", "rts", "rid")
    val df = graft.operators.AsOfJoin.asof(left, right, Seq("k"), "ts", "rts",
      leftCols = Seq("lid"), rightCols = Seq("rid"))
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("Window"), "as-of carries matches via an ordered window")
    assert(!p.contains("Join"),
      "no join operator: the inequality must never become a theta-join")
  }

  test("range join stays a keyed equi-join with the range filter inside") {
    import spark.implicits._
    val left = (0 until 40).map(i => (i % 5L, i * 10L, i.toLong)).toDF("k", "ts", "lid")
    val right = (0 until 40).map(i => (i % 5L, i * 7L, i.toLong)).toDF("k", "rts", "rid")
    val df = graft.operators.RangeJoin.range(left, right, Seq("k"), "ts", "rts",
      before = 15L, after = 5L, leftCols = Seq("lid"), rightCols = Seq("rid"))
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "banding must make the range join an equi-join")
    assert("(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin).*__bucket".r
      .findFirstIn(p).isDefined, "join must key on (keys, bucket)")
  }

  test("rollup plans as Expand + ONE aggregate exchange (no union of scans)") {
    val df = graft.entry.OlapQueries.corpusRollup(spark, dir)
    df.collect()
    // an adaptive plan's toString repeats the tree ("Final Plan" then
    // "Initial Plan") — inspect the final section only
    val p = df.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
    assert(p.contains("Expand"), "grouping sets must go through Expand")
    // one partial+final aggregate pair -> exactly one hash-partitioned
    // exchange below the final sort; a union-of-scans formulation would
    // show one per grouping set. The doc_id-keyed exchange is the read
    // spread (Tables.spread), not aggregation — excluded.
    val exchanges = p.linesIterator.count(l =>
      l.contains("Exchange hashpartitioning") && !l.contains("doc_id"))
    assert(exchanges == 1, s"expected 1 aggregate exchange, saw $exchanges in\n$p")
    assert(p.linesIterator.count(_.contains("Scan parquet")) == 1,
      "rollup must read the corpus once")
  }

  test("jaccard verify is candidate-sized: no row expansion after the bucket join") {
    import spark.implicits._
    val docs = (0 until 60)
      .map(i => (s"d$i", s"shared prefix words here plus unique token u$i and filler f${i % 7}"))
      .toDF("id", "content")
    val sets = graft.dedup.Dedup.shingleSets(docs, 3)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_ONLY)
    try {
      val df = graft.dedup.Dedup.minHashNearDupsFromSets(sets, threshold = 0.6)
      df.collect()
      val p = df.queryExecution.executedPlan.toString
      // the verify joins fetch shingle SETS per candidate id: above the
      // candidate-pair aggregate there must be no Generate (explode) —
      // i.e. nothing multiplies candidate rows back out by shingle count
      val aboveCands = p.split("HashAggregate").head
      assert(!aboveCands.contains("Generate"),
        "verification must join per-pair shingle sets, not re-exploded rows")
    } finally sets.unpersist()
  }

  test("no entry query plans an unpartitioned window (global single-task sort)") {
    // An empty window partition spec ships EVERY row to one task — the
    // classic silent scale killer (WindowExec logs 'No Partition Defined').
    // Catalyst can also CREATE one by constant-folding a literal partition
    // key (how the single-query RRF path once degenerated), so guard the
    // executed plans of the whole query surface, not just the code.
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    import org.apache.spark.sql.execution.window.WindowExec
    def badWindows(p: SparkPlan): Seq[String] = {
      val buf = scala.collection.mutable.Buffer[String]()
      def walk(n: SparkPlan): Unit = {
        n match {
          case w: WindowExec if w.partitionSpec.isEmpty =>
            buf += w.simpleString(120)
          case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
          case _ => ()
        }
        n.children.foreach(walk)
      }
      walk(p)
      buf.toSeq
    }
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      val bad = badWindows(fn(spark, dir).queryExecution.executedPlan)
      assert(bad.isEmpty, s"$name has unpartitioned window(s): ${bad.mkString("; ")}")
    }
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
