package graft

import org.apache.spark.sql.functions._
import graft.operators.{AsOfJoin, Mixture, RangeJoin}

/** Semantics of the as-of and banded range join operators. */
class OperatorsSpec extends SparkSpec {

  import spark.implicits._

  test("asof matches the most recent right row at or before the left ts") {
    val left = Seq((1L, 100L, "l1"), (1L, 250L, "l2"), (2L, 50L, "l3"))
      .toDF("k", "ts", "lp")
    val right = Seq((1L, 100L, "r100"), (1L, 200L, "r200"), (2L, 60L, "r60"))
      .toDF("k", "rts", "rp")
    val out = AsOfJoin.asof(left, right, Seq("k"), "ts", "rts",
      leftCols = Seq("lp"), rightCols = Seq("rp"))
      .orderBy("lp").collect().map(r => (r.getString(1), r.getString(2)))
    // l1: equal ts matches (inclusive); l2: latest prior is r200;
    // l3: only right row is AFTER it -> dropped (inner semantics)
    assert(out.toSeq == Seq(("l1", "r100"), ("l2", "r200")))
  }

  test("asof drops null-key rows like a SQL equi-join would") {
    val left = Seq((Some(1L), 10L, "l1"), (None, 10L, "lnull"))
      .toDF("k", "ts", "lp")
    val right = Seq((Some(1L), 5L, "r1"), (None, 5L, "rnull"))
      .toDF("k", "rts", "rp")
    val out = AsOfJoin.asof(left, right, Seq("k"), "ts", "rts",
      leftCols = Seq("lp"), rightCols = Seq("rp")).collect()
    assert(out.length == 1 && out(0).getString(1) == "l1")
  }

  test("asof tie-break picks the last right row in tie-break order") {
    val left = Seq((1L, 10L, "l")).toDF("k", "ts", "lp")
    val right = Seq((1L, 5L, "first"), (1L, 5L, "second"))
      .toDF("k", "rts", "rp")
    val out = AsOfJoin.asof(left, right, Seq("k"), "ts", "rts",
      leftCols = Seq("lp"), rightCols = Seq("rp"), rightTieBreak = Seq("rp"))
      .collect()
    assert(out.length == 1 && out(0).getString(2) == "second")
  }

  test("asof equals the naive inequality-join formulation on random data") {
    val rnd = new scala.util.Random(7)
    val left = Seq.tabulate(200)(i => (rnd.nextInt(5).toLong, rnd.nextInt(1000).toLong, i.toLong))
      .toDF("k", "ts", "lid")
    val right = Seq.tabulate(200)(i => (rnd.nextInt(5).toLong, rnd.nextInt(1000).toLong, i.toLong))
      .toDF("k", "rts", "rid")
    // dedupe right per (k, rts) the same way the operator's tie-break does
    // (max rid wins) so the naive join is deterministic too
    val out = AsOfJoin.asof(left, right, Seq("k"), "ts", "rts",
      leftCols = Seq("lid"), rightCols = Seq("rid"), rightTieBreak = Seq("rid"))
      .select("k", "lid", "rid")
    val naive = left.as("l").join(right.as("r"),
        $"l.k" === $"r.k" && $"r.rts" <= $"l.ts")
      .groupBy($"l.k".as("k"), $"l.lid".as("lid"), $"l.ts".as("ts"))
      .agg(max(struct($"r.rts", $"r.rid")).getField("rid").as("rid"))
      .select("k", "lid", "rid")
    assert(out.exceptAll(naive).count() == 0 && naive.exceptAll(out).count() == 0)
  }

  test("chunked as-of equals the single-window as-of on random data") {
    val rnd = new scala.util.Random(13)
    val left = Seq.tabulate(300)(i =>
      (rnd.nextInt(4).toLong, rnd.nextInt(2000).toLong, i.toLong))
      .toDF("k", "ts", "lid")
    val right = Seq.tabulate(300)(i =>
      (rnd.nextInt(4).toLong, rnd.nextInt(2000).toLong, i.toLong))
      .toDF("k", "rts", "rid")
    val plain = AsOfJoin.asof(left, right, Seq("k"), "ts", "rts",
      leftCols = Seq("lid"), rightCols = Seq("rid"), rightTieBreak = Seq("rid"))
    for (chunk <- Seq(1L, 7L, 100L, 10000L)) {
      val chunked = AsOfJoin.asofChunked(left, right, Seq("k"), "ts", "rts",
        leftCols = Seq("lid"), rightCols = Seq("rid"), chunk = chunk,
        rightTieBreak = Seq("rid"))
      assert(chunked.exceptAll(plain).count() == 0 &&
        plain.exceptAll(chunked).count() == 0, s"mismatch at chunk=$chunk")
    }
  }

  test("range join honors inclusive bounds and bucket boundaries") {
    // window [ts-10, ts]: right at exactly ts-10 and ts are in; ts-11 and
    // ts+1 are out. Bucket width = 10, so these probes cross bucket edges.
    val left = Seq((1L, 100L, "L")).toDF("k", "ts", "lp")
    val right = Seq((1L, 89L), (1L, 90L), (1L, 95L), (1L, 100L), (1L, 101L))
      .toDF("k", "rts")
    val out = RangeJoin.range(left, right, Seq("k"), "ts", "rts",
      before = 10L, after = 0L, leftCols = Seq("lp"), rightCols = Seq("rts"))
      .select("rts").as[Long].collect().sorted
    assert(out.toSeq == Seq(90L, 95L, 100L))
  }

  test("range join emits each qualifying pair exactly once") {
    val rnd = new scala.util.Random(11)
    val left = Seq.tabulate(150)(i => (rnd.nextInt(3).toLong, rnd.nextInt(500).toLong, i.toLong))
      .toDF("k", "ts", "lid")
    val right = Seq.tabulate(150)(i => (rnd.nextInt(3).toLong, rnd.nextInt(500).toLong, i.toLong))
      .toDF("k", "rts", "rid")
    val out = RangeJoin.range(left, right, Seq("k"), "ts", "rts",
      before = 30L, after = 20L, leftCols = Seq("lid"), rightCols = Seq("rid"))
    val naive = left.as("l").join(right.as("r"),
      $"l.k" === $"r.k" && $"r.rts" >= $"l.ts" - 30L && $"r.rts" <= $"l.ts" + 20L)
      .select($"l.k".as("k"), $"l.lid".as("lid"), $"r.rid".as("rid"))
    assert(out.exceptAll(naive).count() == 0 && naive.exceptAll(out).count() == 0)
  }

  test("tokenBudgetFill (threshold form) equals the naive greedy window on random data") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val docs = (0 until 400).map { i =>
      (f"d$i%03d", s"g${i % 3}",
        // coarse quality grid forces multi-doc bins (the boundary-bin path)
        (rnd.nextInt(8) / 8.0), 20L + rnd.nextInt(80))
    }.toDF("id", "group", "quality", "tokens")
    for (budget <- Seq(100L, 1500L, 10000L, 1000000L)) {
      val got = Mixture.tokenBudgetFill(docs, budget)
        .select("group", "id").collect().map(r => (r.getString(0), r.getString(1))).toSet
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("group").orderBy(col("quality").desc, col("id"))
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
      val naive = docs.withColumn("cum", sum(col("tokens")).over(w))
        .filter(col("cum") <= budget)
        .select("group", "id").collect().map(r => (r.getString(0), r.getString(1))).toSet
      assert(got == naive, s"budget=$budget: threshold form diverged from greedy")
    }
  }

  test("tokenBudgetFill never single-task-sorts a whole group or bin") {
    import spark.implicits._
    val docs = (0 until 100)
      .map(i => (s"d$i", "onegroup", (i % 5) / 5.0, 10L))
      .toDF("id", "group", "quality", "tokens")
    val df = Mixture.tokenBudgetFill(docs, 300L)
    df.collect()
    // the per-DOCUMENT window (boundary fill) must partition on
    // (group, __part) — a range slice of a bin, never a whole group or a
    // whole bin (a dominant (group, quality) bin would serialize);
    // group-only windows may exist only over tiny aggregates (per-bin
    // sums, per-partition offsets)
    val p = df.queryExecution.executedPlan.toString
    val sliceWindow = p.linesIterator.exists(l =>
      l.contains("Window [") &&
        "windowspecdefinition\\(group#\\d+, __part#\\d+".r.findFirstIn(l).isDefined)
    assert(sliceWindow,
      s"the boundary fill must window on (group, __part) range slices:\n$p")
    // and a dominant single bin still yields the exact greedy prefix
    assert(df.count() == 30L, "300-token budget over 10-token docs keeps 30")
  }

  test("tokenBudgetFill skew: one dominant (group, quality) bin stays exact") {
    import spark.implicits._
    // every doc in ONE bin -> the entire corpus is the boundary bin; the
    // distributed prefix sum must reproduce the naive greedy answer
    val docs = (0 until 500).map(i => (f"d$i%03d", "g0", 1.0, 7L))
      .toDF("id", "group", "quality", "tokens")
      .repartition(13) // adversarial input partitioning
    val got = Mixture.tokenBudgetFill(docs, 700L)
      .select("id").collect().map(_.getString(0)).toSet
    // greedy keeps the first 100 ids in id order (7L * 100 = 700)
    val expect = (0 until 100).map(i => f"d$i%03d").toSet
    assert(got == expect)
  }

  test("temperatureBudgets: alpha endpoints, capacity cap, epochs") {
    import spark.implicits._
    val docs = (Seq.fill(90)("big") ++ Seq.fill(10)("small")).zipWithIndex
      .map { case (g, i) => (s"d$i", g, 100L) }
      .toDF("id", "group", "tokens") // big: 9000 tokens, small: 1000
    def budgets(alpha: Double, target: Long) =
      graft.operators.Mixture.temperatureBudgets(docs, alpha, target)
        .collect().map(r => r.getString(0) ->
          (r.getLong(1), r.getDouble(2), r.getLong(3), r.getDouble(4))).toMap
    // alpha = 1: proportional split (9000:1000 -> 90%:10% of target)
    val prop = budgets(1.0, 1000L)
    assert(prop("big")._3 == 900L && prop("small")._3 == 100L)
    // alpha = 0: uniform weights -> equal budgets
    val unif = budgets(0.0, 1000L)
    assert(unif("big")._3 == 500L && unif("small")._3 == 500L)
    // alpha = 0.5 smooths between: small's share rises above 10%
    val smooth = budgets(0.5, 1000L)
    assert(smooth("small")._3 > 100L && smooth("small")._3 < 500L)
    assert(math.abs(smooth("big")._2 + smooth("small")._2 - 1.0) < 1e-6,
      "weights normalize")
    // budgets cap at capacity; epochs reports the uncapped share
    val over = budgets(1.0, 100000L)
    assert(over("big")._3 == 9000L, "budget capped at group capacity")
    assert(over("big")._4 > 1.0, "epochs > 1 records the implied upsampling")
  }

  test("temperatureMixture equals the naive per-group greedy fill") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val docs = (0 until 300)
      .map(i => (f"d$i%03d", s"g${i % 4}", 10L + rnd.nextInt(40)))
      .toDF("id", "group", "tokens").repartition(7)
    val got = graft.operators.Mixture.temperatureMixture(docs, 0.5, 3000L)
      .select("group", "id").collect().map(r => (r.getString(0), r.getString(1))).toSet
    // naive: per-group budget from the quantized integer split, then a
    // greedy window in (hash-bucket, id) order
    val budgets = graft.operators.Mixture.temperatureBudgets(
        docs.select("group", "tokens"), 0.5, 3000L)
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    val h = graft.functions.TextFunctions.stableHash32(col("id").cast("string"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("group").orderBy(col("q").desc, col("id"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val naive = docs
      .withColumn("q", -(h % lit(4096L)).cast("double"))
      .withColumn("cum", sum(col("tokens")).over(w))
      .collect().filter { r =>
        r.getAs[Long]("cum") <= budgets(r.getAs[String]("group"))
      }.map(r => (r.getAs[String]("group"), r.getAs[String]("id"))).toSet
    assert(got == naive)
    // and the kept token mass respects each group's budget
    val sums = graft.operators.Mixture.temperatureMixture(docs, 0.5, 3000L)
      .groupBy("group").agg(sum("tokens").as("t"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    sums.foreach { case (g, t) => assert(t <= budgets(g), s"group $g over budget") }
  }

  test("domainTokenCap: per-group token sums within cap, partition-invariant") {
    import spark.implicits._
    val docs = (0 until 200)
      .map(i => (s"d$i", s"src${i % 4}", 15L + (i % 9)))
      .toDF("id", "group", "tokens")
    val cap = 120L
    val kept = Mixture.domainTokenCap(docs, col("id"), cap)
    val sums = kept.groupBy("group").agg(sum("tokens").as("t"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(sums.nonEmpty && sums.values.forall(_ <= cap),
      s"every group must respect the cap: $sums")
    val a = kept.select("group", "id").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    val b = Mixture.domainTokenCap(docs.repartition(17), col("id"), cap)
      .select("group", "id").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(a == b, "selection must not depend on input partitioning")
  }

  test("exportShards: deterministic, partition-invariant, positions dense per shard") {
    import spark.implicits._
    val docs = (0 until 300).map(i => Tuple1(s"doc-$i")).toDF("id")
    val a = Mixture.exportShards(docs, col("id"), 7)
      .select("shard", "pos", "id").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getString(2))).toSet
    val b = Mixture.exportShards(docs.repartition(13), col("id"), 7)
      .select("shard", "pos", "id").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getString(2))).toSet
    assert(a == b, "shard+pos must not depend on input partitioning")
    val byShard = a.groupBy(_._1)
    assert(byShard.keySet.subsetOf((0 until 7).toSet))
    byShard.foreach { case (s, rows) =>
      assert(rows.map(_._2).toSeq.sorted == (1L to rows.size).toSeq,
        s"shard $s positions must be dense 1..n")
    }
  }

  test("deterministic sample is invariant to partitioning and repeatable") {
    val df = spark.range(0, 2000).toDF("id")
    val once = graft.operators.Sampling.sample(df, "id", 0.3)
      .as[Long].collect().sorted.toSeq
    val repart = graft.operators.Sampling.sample(df.repartition(13), "id", 0.3)
      .as[Long].collect().sorted.toSeq
    assert(once == repart, "hash gate must not depend on partition layout")
    assert(once.nonEmpty && once.size < 2000)
    // stratified: a stratum at rate 0 keeps nothing, at rate 1 everything
    val strata = df.withColumn("s",
      when(col("id") % 2 === 0, "even").otherwise("odd"))
    val kept = graft.operators.Sampling.stratified(
      strata, "id", "s", Map("even" -> 0.0), defaultRate = 1.0)
    assert(kept.filter(col("s") === "even").count() == 0)
    assert(kept.filter(col("s") === "odd").count() == 1000)
  }

  test("sample fractions nest: sample(f1) is a subset of sample(f2) for f1 <= f2") {
    val df = spark.range(0, 3000).toDF("id")
    val s30 = graft.operators.Sampling.sample(df, "id", 0.3)
      .as[Long].collect().toSet
    val s60 = graft.operators.Sampling.sample(df, "id", 0.6)
      .as[Long].collect().toSet
    assert(s30.subsetOf(s60),
      "the hash gate must make smaller fractions subsets of larger ones")
    assert(s30.nonEmpty && s60.size > s30.size)
  }

  test("asofForward: earliest following match, inclusive, first-tie wins") {
    val left = Seq((1L, 100L, "a"), (1L, 250L, "b"), (2L, 50L, "c"))
      .toDF("k", "ts", "lp")
    val right = Seq(
      (1L, 100L, 10L), // simultaneous -> inclusive match for "a"
      (1L, 300L, 11L), (1L, 300L, 12L), // tie at 300: lowest rid wins
      (2L, 40L, 13L)) // strictly before -> no forward match for "c"
      .toDF("k", "rts", "rid")
    val out = AsOfJoin.asofForward(left, right, Seq("k"), "ts", "rts",
      leftCols = Seq("lp"), rightCols = Seq("rid"), rightTieBreak = Seq("rid"))
      .collect().map(r => (r.getAs[String]("lp"), r.getAs[Long]("rid"))).toMap
    assert(out == Map("a" -> 10L, "b" -> 11L), s"got $out")
  }

  test("asofNearest: closer side wins, equidistant goes backward") {
    val left = Seq((1L, 100L, "a"), (1L, 200L, "b"), (2L, 10L, "c"))
      .toDF("k", "ts", "lid")
    val right = Seq(
      (1L, 90L, 10L),  // 10 behind "a"
      (1L, 104L, 11L), // 4 ahead of "a" -> forward wins for "a"
      (1L, 195L, 12L), (1L, 205L, 13L)) // equidistant for "b" -> backward 12
      .toDF("k", "rts", "rid")
    val out = AsOfJoin.asofNearest(left, right, Seq("k"), "ts", "rts",
      leftId = "lid", leftCols = Seq("lid", "ts"),
      rightCols = Seq("rid", "rts"), rightTieBreak = Seq("rid"))
      .collect().map(r => (r.getAs[String]("lid"), r.getAs[Long]("rid"))).toMap
    assert(out == Map("a" -> 11L, "b" -> 12L), s"got $out")
    assert(!out.contains("c"), "no right rows for key 2")
  }

  test("bpe: merge application is left-to-right non-overlapping") {
    import graft.operators.Bpe
    assert(Bpe.segment("aaaa", Seq(("a", "a"))) == Seq("aa", "aa"))
    assert(Bpe.segment("aaa", Seq(("a", "a"))) == Seq("aa", "a"))
    assert(Bpe.segment("hello", Seq(("l", "l"), ("e", "ll"), ("h", "ell")))
      == Seq("hell", "o"))
  }

  test("bpe: training learns the dominant pair first, lexical tie-break") {
    import graft.operators.Bpe
    // "abab" x3 + "cd" x1: pair counts ab=6, ba=3, cd=1 -> first merge (a,b);
    // round 2: (ab,ab)=3 beats (c,d)=1 -> second merge (ab,ab)
    val docs = Seq(
      (1L, Seq("abab", "abab", "abab", "cd"))).toDF("id", "toks")
    val m = Bpe.train(docs, merges = 2).orderBy("merge_rank")
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2),
        r.getString(3), r.getLong(4)))
    assert(m.toSeq == Seq((1, "a", "b", "ab", 6L), (2, "ab", "ab", "abab", 3L)))
    // tie-break: "ba" and "ab" both count 2 -> lexically smaller (a,b) wins
    val tie = Seq((1L, Seq("ab", "ab", "ba", "ba"))).toDF("id", "toks")
    val t1 = Bpe.train(tie, merges = 1).collect()(0)
    assert((t1.getString(1), t1.getString(2)) == ("a", "b"))
  }

  test("range join buckets are exact at epoch-ns magnitudes") {
    // 2026-era epoch ns ~ 1.78e18 — beyond double's 53-bit mantissa. A
    // float-division bucket key would misplace rows near bucket edges.
    val base = 1786576499000000000L
    val w = 1800000000000L // 30 min in ns
    // right row exactly at the lower window edge, left at a bucket edge
    val left = Seq((1L, base, "L")).toDF("k", "ts", "lp")
    val right = Seq((1L, base - w), (1L, base - w - 1), (1L, base))
      .toDF("k", "rts")
    val out = RangeJoin.range(left, right, Seq("k"), "ts", "rts",
      before = w, after = 0L, leftCols = Seq("lp"), rightCols = Seq("rts"))
      .select("rts").as[Long].collect().sorted
    assert(out.toSeq == Seq(base - w, base))
  }
}
