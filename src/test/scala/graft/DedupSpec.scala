package graft

import org.apache.spark.sql.functions._
import graft.dedup.Dedup

class DedupSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("hyperplane-LSH near-dup is a verified subset of exact, with high recall") {
    val vecs = Tables.vectors(spark, dir)
    val exact = Dedup.embeddingNearDups(vecs, 0.4)
      .select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Dedup.embeddingNearDupsLsh(vecs, 0.4, dim = 64,
      bitsPerTable = 6, tables = 12)
      .select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh.subsetOf(exact), "every LSH pair must survive exact verification")
    assert(exact.nonEmpty)
    val recall = lsh.size.toDouble / exact.size
    // cos>=0.4 is a LOW similarity band (angular sim ~0.63); 6-bit/12-table
    // sign-LSH keeps decent but not full recall there. Near-dup thresholds
    // (>=0.9) sit far right of this and recall ~1; this asserts the
    // mechanism, not production recall.
    assert(recall >= 0.5, s"recall $recall unexpectedly low")
  }

  test("cross-corpus minhash join equals exact bipartite jaccard; ids may collide") {
    import spark.implicits._
    val base = "spark shuffles keyed rows across executors while the optimizer prunes " +
      "columns and pushes filters into the parquet scan before any join runs"
    val left = Seq(
      (1L, base),
      (2L, "completely different text about cooking pasta with plenty of salted water"),
      (7L, "another unrelated document describing mountain weather and trail conditions today"))
      .toDF("id", "content")
    val right = Seq(
      (1L, base + " with one extra clause appended"), // near-dup of left 1, SAME id
      (5L, base),                                     // exact dup of left 1
      (9L, "entirely unrelated third text on gardening tomatoes in late summer heat"))
      .toDF("id", "content")
    val got = Dedup.minHashNearDupsAcross(left, right, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // exact bipartite jaccard over the engine's shingle sets
    val sl = Dedup.shingleSets(left).collect()
      .map(r => r.getLong(0) -> r.getSeq[String](1).toSet).toMap
    val sr = Dedup.shingleSets(right).collect()
      .map(r => r.getLong(0) -> r.getSeq[String](1).toSet).toMap
    val exact = (for {
      (a, sa) <- sl.toSeq; (b, sb) <- sr.toSeq
      inter = (sa & sb).size
      j = inter.toDouble / (sa.size + sb.size - inter)
      if j >= 0.5
    } yield (a, b)).toSet
    assert(got == exact, s"got $got, exact $exact")
    assert(got.contains((1L, 1L)), "same-id cross-corpus match must surface")
    assert(got.contains((1L, 5L)))
  }

  test("novelty score: all-new 1.0, fully-seen 0.0, partial overlap exact") {
    import spark.implicits._
    val ref = Seq((10L, "alpha beta gamma delta epsilon")).toDF("id", "content")
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon"),       // every shingle seen
      (2L, "zeta eta theta iota kappa"),            // nothing seen
      (3L, "alpha beta gamma completely new stuff"), // mixed
      (4L, "too short"))                            // < 3 tokens: no row
      .toDF("id", "content")
    val got = graft.dedup.Dedup.noveltyScore(docs, ref)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(got(1L) == ((3L, 0L, 0.0)))
    assert(got(2L) == ((3L, 3L, 1.0)))
    // doc 3 shingles: [alpha beta gamma, beta gamma completely,
    //  gamma completely new, completely new stuff] — only the first seen
    assert(got(3L) == ((4L, 3L, 0.75)))
    assert(!got.contains(4L), "sub-shingle docs emit no row (family convention)")
  }

  test("embeddingNearDups guard: above maxExactRows the plan is banded, never all-pairs") {
    val vecs = Tables.vectors(spark, dir)
    val guarded = Dedup.embeddingNearDups(vecs, 0.9, maxExactRows = 10)
    guarded.collect()
    val p = guarded.queryExecution.executedPlan.toString
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      "above the guard the quadratic self-join must never materialize")
    // under the guard (default 100k) the small input keeps the exact join —
    // the same call shape q_dedup_embedding relies on for oracle parity
    val exact = Dedup.embeddingNearDups(vecs, 0.9)
    exact.collect()
    val pe = exact.queryExecution.executedPlan.toString
    assert(pe.contains("BroadcastNestedLoopJoin") || pe.contains("CartesianProduct"),
      "small inputs stay on the exact all-pairs join")
  }

  test("simHashNearDups guard: above max32BitDocs it routes to the 64-bit variant") {
    val docs = Tables.t(spark, dir, "documents")
      .select(col("doc_id").as("id"), col("text").as("content"))
    val routed = Dedup.simHashNearDups(docs, max32BitDocs = 10)
      .selectExpr("a", "b", "CAST(hamming AS BIGINT) AS hamming").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val wide = Dedup.simHash64NearDups(docs)
      .selectExpr("a", "b", "CAST(hamming AS BIGINT) AS hamming").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(routed == wide, "guarded call must equal the 64-bit operator")
  }

  test("minhash LSH equals exact n-gram jaccard on this corpus (lossless band config)") {
    val docs = Tables.t(spark, dir, "documents")
      .select(col("doc_id").as("id"), col("text").as("content"))
    val lsh = Dedup.minHashNearDups(docs, threshold = 0.6)
      .select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = Dedup.ngramJaccard(docs, threshold = 0.6)
      .select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh == exact)
  }

  test("duplicateClusters resolves chains, separate components, long paths") {
    import spark.implicits._
    // chain 1~2~3, pair 10~11, and a 12-node path (multi-round convergence)
    val longChain = (100L until 111L).map(i => (i, i + 1))
    val pairs = (Seq((1L, 2L), (2L, 3L), (10L, 11L)) ++ longChain).toDF("a", "b")
    // localEdgeLimit = 0 forces the distributed loop; the default takes the
    // driver union-find path — both must produce the identical labeling
    for (limit <- Seq(0L, 1L << 20)) {
      val comp = Dedup.duplicateClusters(pairs, localEdgeLimit = limit)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(Seq(1L, 2L, 3L).forall(comp(_) == 1L), s"limit=$limit")
      assert(comp(10L) == 10L && comp(11L) == 10L, s"limit=$limit")
      assert((100L to 111L).forall(comp(_) == 100L), s"limit=$limit")
      // components partition the node set; every label is a member's min
      assert(comp.keySet == comp.values.toSet.flatMap((c: Long) =>
        comp.filter(_._2 == c).keySet), s"limit=$limit")
    }
  }

  test("duplicateClusters local and distributed paths agree on string ids") {
    import spark.implicits._
    val pairs = Seq(("d", "c"), ("b", "c"), ("x", "y")).toDF("a", "b")
    val expected = Map("b" -> "b", "c" -> "b", "d" -> "b", "x" -> "x", "y" -> "x")
    for (limit <- Seq(0L, 1L << 20)) {
      val comp = Dedup.duplicateClusters(pairs, localEdgeLimit = limit)
        .collect().map(r => r.getString(0) -> r.getString(1)).toMap
      assert(comp == expected, s"limit=$limit")
    }
    // non-ASCII survivor choice must match Spark's UTF-8 BYTE order on both
    // paths: U+FFFD (EF BF BD) sorts BELOW U+1F600 (F0 9F 98 80) in bytes,
    // though java.lang.String's UTF-16 order says the opposite
    val uni = Seq(("😀", "�")).toDF("a", "b")
    for (limit <- Seq(0L, 1L << 20)) {
      val comp = Dedup.duplicateClusters(uni, localEdgeLimit = limit)
        .collect().map(r => r.getString(0) -> r.getString(1)).toMap
      assert(comp.values.toSet == Set("�"), s"limit=$limit: $comp")
    }
  }

  test("duplicateClusters falls through to the distributed loop for decimal ids") {
    import spark.implicits._
    val pairs = Seq((BigDecimal(2), BigDecimal(1)), (BigDecimal(2), BigDecimal(3)))
      .toDF("a", "b")
    // small edge set, but DecimalType has no local-ordering mirror — the
    // distributed path must serve it instead of throwing
    val comp = Dedup.duplicateClusters(pairs)
      .collect().map(r => (r.getDecimal(0).intValue(), r.getDecimal(1).intValue())).toMap
    assert(comp == Map(1 -> 1, 2 -> 1, 3 -> 1))
  }

  test("containment pairs catch a quote symmetric jaccard misses") {
    import spark.implicits._
    val big = (1 to 40).map(i => s"w$i").mkString(" ")
    val quote = (10 to 15).map(i => s"w$i").mkString(" ") // 6 words inside big
    val corpus = Seq((1L, big), (2L, quote), (3L, "entirely different words here now"))
      .toDF("id", "content")
    val cont = Dedup.ngramContainmentPairs(corpus, threshold = 0.9, shingleN = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    // quote's 4 shingles all appear in big: containment(2 in 1) = 1.0
    assert(cont.exists { case (s, d, c) => s == 2L && d == 1L && c == 1.0 },
      s"missing full containment: ${cont.toSeq}")
    // the reverse direction is far below threshold (4/38) and absent
    assert(!cont.exists { case (s, d, _) => s == 1L && d == 2L })
    // symmetric jaccard misses the pair entirely at the same cutoff
    val jac = Dedup.ngramJaccard(corpus, threshold = 0.9, shingleN = 3)
      .collect()
    assert(jac.isEmpty)
  }

  test("prefix-filtered containment equals the plain form at several thresholds") {
    val corpus = Tables.textCorpus(spark, dir)
    for (t <- Seq(0.4, 0.6, 0.8)) {
      val plain = Dedup.ngramContainmentPairs(corpus, t)
        .collect().map(r => (r.getLong(0), r.getLong(1),
          math.round(r.getDouble(2) * 1e9))).toSet
      val pref = Dedup.ngramContainmentPairsPrefix(corpus, t)
        .collect().map(r => (r.getLong(0), r.getLong(1),
          math.round(r.getDouble(2) * 1e9))).toSet
      assert(pref == plain, s"threshold $t: pruning changed the pair set")
      assert(plain.nonEmpty || t > 0.7, s"threshold $t suspiciously empty")
    }
  }

  test("prefix-filtered n-gram jaccard equals the plain inverted-index form") {
    val docs = Tables.t(spark, dir, "documents")
      .select(col("doc_id").as("id"), col("text").as("content"))
    for (t <- Seq(0.3, 0.5, 0.8)) {
      val plain = Dedup.ngramJaccard(docs, t)
      val pref = Dedup.ngramJaccardPrefix(docs, t)
      assert(pref.exceptAll(plain).count() == 0 &&
        plain.exceptAll(pref).count() == 0, s"mismatch at threshold=$t")
      spark.catalog.clearCache()
    }
  }

  test("adaptive jaccard routing: both route choices return the identical pairs") {
    val docs = Tables.t(spark, dir, "documents")
      .select(col("doc_id").as("id"), col("text").as("content"))
    val plain = Dedup.ngramJaccard(docs, 0.5)
    // cap high -> diagnosis picks the plain route; cap 1 -> prefix route;
    // either way the result must be the plain form's exact pair set
    for (cap <- Seq(Long.MaxValue, 1L)) {
      val got = Dedup.ngramJaccardAdaptive(docs, 0.5, maxCandidatesPerDoc = cap)
      assert(got.exceptAll(plain).count() == 0 &&
        plain.exceptAll(got).count() == 0, s"mismatch at cap=$cap")
      spark.catalog.clearCache()
    }
  }

  test("adaptive jaccard pair sinks: reliable checkpoint and table write equal localCheckpoint") {
    val docs = Tables.t(spark, dir, "documents")
      .select(col("doc_id").as("id"), col("text").as("content"))
    val viaLocal = Dedup.ngramJaccardAdaptive(docs, 0.5)
    val ckptDir = java.nio.file.Files.createTempDirectory("graft-ckpt").toString
    val hadCkpt = spark.sparkContext.getCheckpointDir
    spark.sparkContext.setCheckpointDir(ckptDir)
    try {
      val viaReliable = Dedup.ngramJaccardAdaptive(docs, 0.5,
        pairSink = Dedup.PairSink.Reliable)
      val tbl = java.nio.file.Files.createTempDirectory("graft-pairs").toString + "/pairs"
      val viaTable = Dedup.ngramJaccardAdaptive(docs, 0.5,
        pairSink = Dedup.PairSink.Table(tbl))
      for ((name, got) <- Seq("reliable" -> viaReliable, "table" -> viaTable))
        assert(got.exceptAll(viaLocal).count() == 0 &&
          viaLocal.exceptAll(got).count() == 0, s"sink $name diverged")
      // the table sink leaves a queryable artifact behind
      assert(spark.read.parquet(tbl).count() == viaLocal.count())
    } finally spark.sparkContext.setCheckpointDir(hadCkpt.orNull) // restores None too
  }

  test("multiscript near-dups find the planted CJK pair the ASCII canon provably misses") {
    import spark.implicits._
    val corpus = Seq(
      1L -> "Apache Spark is a distributed engine for large scale data processing.",
      2L -> "Apache Spark is a distributed engine for large scale data analytics.",
      3L -> "分布式数据处理引擎用于大规模数据分析与机器学习任务的高效执行",
      4L -> "分布式数据处理引擎用于大规模数据分析和机器学习任务的高效执行",
      5L -> "これはテストのための日本語の文章ですトークン化の確認用",
      6L -> "今天天气很好我们一起去公园散步吧",
      7L -> "Completely different English text about storage systems and columnar file formats.")
      .toDF("id", "content")
    val multi = Dedup.multiscriptNearDups(corpus, 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(multi == Set((1L, 2L), (3L, 4L)), s"got $multi")
    // negative assertion: the reference-parity ASCII tokenizer yields
    // EMPTY shingle sets on the CJK docs, so it cannot see pair (3,4)
    val ascii = Dedup.ngramJaccard(corpus, 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(ascii == Set((1L, 2L)), s"ascii route got $ascii")
    val cjkSets = Dedup.shingleSets(corpus.filter(col("id").isin(3L, 4L, 5L, 6L)))
      .select("len").collect().map(_.getInt(0))
    assert(cjkSets.forall(_ == 0), "ASCII canon must produce empty CJK shingle sets")
    // accented-Latin word mode: \p{L} tokens keep the accents the ASCII
    // canon splits on, so the near-dup pair is found
    val latin = Seq(
      10L -> "le café était très agréable près de la rivière au printemps dernier",
      11L -> "le café était très agréable près de la rivière au printemps passé",
      12L -> "texte totalement différent sur la programmation des systèmes distribués")
      .toDF("id", "content")
    val latinPairs = Dedup.multiscriptNearDups(latin, 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(latinPairs == Set((10L, 11L)), s"got $latinPairs")
  }

  test("simhash blocking is lossless for hamming <= blocks-1") {
    val docs = Tables.t(spark, dir, "documents")
      .select(col("doc_id").as("id"), col("text").as("content"))
    // brute-force pairs over the fingerprints
    val fp = Dedup.simHashFingerprints(docs)
    val brute = fp.as("x").join(fp.as("y"), col("x.id") < col("y.id"))
      .withColumn("h", graft.functions.TextFunctions.hamming(col("x.fp"), col("y.fp")))
      .filter(col("h") <= 3)
      .select(col("x.id"), col("y.id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // blocks=4: single-slice pigeonhole banding; blocks=6/7: multi-slice
    // combination keys (uneven widths at 7). Same pair set from all.
    for (blocks <- Seq(4, 6, 7)) {
      val viaBlocks = Dedup.simHashNearDups(docs, maxHamming = 3, blocks = blocks)
        .select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(viaBlocks == brute, s"combination blocking lost pairs at blocks=$blocks")
      spark.catalog.clearCache()
    }
  }

  test("64-bit simhash blocking is lossless and strictly sharper than 32-bit") {
    val docs = Tables.t(spark, dir, "documents")
      .select(col("doc_id").as("id"), col("text").as("content"))
    // brute-force pairs over the two-half fingerprints
    val fp = Dedup.simHashFingerprints64(docs)
    val brute = fp.as("x").join(fp.as("y"), col("x.id") < col("y.id"))
      .withColumn("h",
        graft.functions.TextFunctions.hamming(col("x.fp_hi"), col("y.fp_hi")) +
          graft.functions.TextFunctions.hamming(col("x.fp_lo"), col("y.fp_lo")))
      .filter(col("h") <= 3)
      .select(col("x.id"), col("y.id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val viaBlocks = Dedup.simHash64NearDups(docs, maxHamming = 3, blocks = 4)
      .select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(viaBlocks == brute)
    // multi-slice combination keys (blocks=6: combos of 3 slices spanning
    // both halves) must recover the identical pair set
    val viaCombos = Dedup.simHash64NearDups(docs, maxHamming = 3, blocks = 6)
      .select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(viaCombos == brute, "combination blocking lost pairs at blocks=6")
    // 64 bits can only DROP pairs relative to its own hi-half (= the
    // 32-bit fingerprint): hamming64 >= hamming(hi), so the 64-bit pair
    // set is a subset of the 32-bit one at the same threshold
    val pairs32 = Dedup.simHashNearDups(docs, maxHamming = 3, blocks = 4)
      .select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(viaBlocks.subsetOf(pairs32))
  }

  test("semDeDup keeps exactly one survivor per within-cluster dup ball") {
    import spark.implicits._
    // two tight clusters; planted near-identical pairs inside each
    def v(xs: Double*) = xs.map(_.toFloat)
    val rows = Seq(
      (1L, v(1, 0, 0)), (2L, v(0.999, 0.01, 0)), (3L, v(0.7, 0.7, 0.3)),
      (10L, v(0, 1, 0)), (11L, v(0.01, 0.999, 0)), (12L, v(0.01, 0.998, 0.01))
    ).toDF("id", "embedding")
    val vecs = rows.select(col("id"), col("embedding"),
      graft.functions.VectorFunctions.l2Norm(col("embedding")).as("norm"))
    val cents = Seq((100L, v(1, 0, 0)), (200L, v(0, 1, 0)))
      .toDF("centroid_id", "centroid")
      .select(col("centroid_id"), col("centroid"),
        graft.functions.VectorFunctions.l2Norm(col("centroid")).as("centroid_norm"))
    val out = Dedup.semDeDup(vecs, cents, threshold = 0.99).orderBy("id").collect()
    val byId = out.map(r => r.getLong(0) ->
      (r.getLong(2), r.getBoolean(3))).toMap
    // ball {1,2}: min-id 1 survives; 3 is alone (cos to both < .99)
    assert(byId(1L) == (1L, true) && byId(2L) == (1L, false))
    assert(byId(3L)._2)
    // ball {10,11,12}: 10 survives
    assert(byId(10L) == (10L, true) && !byId(11L)._2 && !byId(12L)._2)
    // every ball has exactly one keeper
    out.groupBy(_.getLong(2)).foreach { case (_, rs) =>
      assert(rs.count(_.getBoolean(3)) == 1)
    }
  }

  test("semanticContamination flags planted leaks, clears clean eval rows") {
    import spark.implicits._
    def v(xs: Double*) = xs.map(_.toFloat)
    val train = Seq(
      (1L, v(1, 0, 0)), (2L, v(0.8, 0.6, 0)), (10L, v(0, 1, 0)))
      .toDF("id", "embedding")
      .select(col("id"), col("embedding"),
        graft.functions.VectorFunctions.l2Norm(col("embedding")).as("norm"))
    // eval: 100 is a LEAK (identical to train 1), 101 is near-identical
    // to train 10, 102 is clean (same cluster as 1, cosine ~0.7)
    val evalSet = Seq(
      (100L, v(1, 0, 0)), (101L, v(0.01, 0.999, 0)), (102L, v(0.7, 0.6, 0.4)))
      .toDF("id", "embedding")
      .select(col("id"), col("embedding"),
        graft.functions.VectorFunctions.l2Norm(col("embedding")).as("norm"))
    val cents = Seq((1L, v(1, 0, 0)), (2L, v(0, 1, 0)))
      .toDF("centroid_id", "centroid")
      .select(col("centroid_id"), col("centroid"),
        graft.functions.VectorFunctions.l2Norm(col("centroid")).as("centroid_norm"))
    val out = Dedup.semanticContamination(train, evalSet, cents, threshold = 0.99)
      .orderBy("eval_id").collect()
    assert(out.length == 3, "one audit row per EVAL id, hits or not")
    val byId = out.map(r => r.getLong(0) ->
      (r.getLong(1), r.getLong(2), r.getBoolean(4))).toMap
    assert(byId(100L) == ((1L, 1L, true)), s"leak must hit its source: ${byId(100L)}")
    assert(byId(101L)._3 && byId(101L)._2 == 10L)
    assert(byId(102L) == ((0L, -1L, false)), "clean eval row must audit clean")
  }

  test("embeddingNearDups sizeHint skips the routing pass over the source") {
    import org.apache.spark.sql.functions._
    val n = 40
    // an "expensive derived frame": a mapPartitions transform Spark cannot
    // prune, instrumented with an accumulator counting rows PRODUCED — each
    // full execution of the upstream adds exactly n
    def instrumented(acc: org.apache.spark.util.LongAccumulator) = {
      import spark.implicits._
      spark.range(n).as[Long].mapPartitions { it =>
        it.map { i =>
          acc.add(1)
          (i, Array.tabulate(4)(d => (i % 7 + d).toFloat))
        }
      }.toDF("id", "embedding")
        .withColumn("norm", graft.functions.VectorFunctions.l2Norm(col("embedding")))
    }
    val withHint = spark.sparkContext.longAccumulator("withHint")
    Dedup.embeddingNearDups(instrumented(withHint), threshold = 0.9,
      sizeHint = Some(n.toLong)).count()
    val noHint = spark.sparkContext.longAccumulator("noHint")
    Dedup.embeddingNearDups(instrumented(noHint), threshold = 0.9).count()
    // identical work except the routing count: the hint saves exactly one
    // full upstream execution
    assert(noHint.value == withHint.value + n,
      s"hint=${withHint.value} nohint=${noHint.value}")
  }

  test("no dedup route leaves a session-lived MEMORY_ONLY cache behind") {
    import spark.implicits._
    val docs = (0 until 40)
      .map(i => (s"d$i", s"shared prefix words here plus unique token u$i and filler f${i % 5}"))
      .toDF("id", "content").localCheckpoint()
    val other = (0 until 20)
      .map(i => (s"e$i", s"shared prefix words here plus unique token u${i * 2} extra"))
      .toDF("id", "content").localCheckpoint()
    val vecs = Tables.vectors(spark, dir)
    val cents = graft.ann.Ann.representativeCentroids(vecs, "label").localCheckpoint()
    // every route's internal MEMORY_ONLY diagnosis frame (shingles,
    // fingerprints, assignments) must be released once the output-sized
    // result is materialized — only localCheckpoint RDDs (DISK-backed,
    // owned by the returned frames) may remain
    def memOnly(): Seq[String] =
      spark.sparkContext.getPersistentRDDs.values
        .filter(_.getStorageLevel == org.apache.spark.storage.StorageLevel.MEMORY_ONLY)
        .map(_.toString).toSeq
    val routes: Seq[(String, () => Unit)] = Seq(
      "ngramJaccard" -> (() => Dedup.ngramJaccard(docs, 0.5).count()),
      "ngramJaccardPrefix" -> (() => Dedup.ngramJaccardPrefix(docs, 0.5).count()),
      "ngramJaccardAdaptive" -> (() => Dedup.ngramJaccardAdaptive(docs, 0.5).count()),
      "ngramContainmentPairs" -> (() => Dedup.ngramContainmentPairs(docs, 0.5).count()),
      "ngramContainmentPairsPrefix" -> (() => Dedup.ngramContainmentPairsPrefix(docs, 0.5).count()),
      "multiscriptNearDups" -> (() => Dedup.multiscriptNearDups(docs, 0.5).count()),
      "minHashNearDups" -> (() => Dedup.minHashNearDups(docs, 0.5).count()),
      "minHashNearDupsAcross" -> (() => Dedup.minHashNearDupsAcross(docs, other, 0.5).count()),
      "simHashNearDups" -> (() => Dedup.simHashNearDups(docs).count()),
      "simHash64NearDups" -> (() => Dedup.simHash64NearDups(docs).count()),
      "containment" -> (() => Dedup.containment(docs, other, 0.5).count()),
      "noveltyScore" -> (() => Dedup.noveltyScore(docs, other).count()),
      "semDeDup" -> (() => Dedup.semDeDup(vecs, cents, 0.95).count()))
    routes.foreach { case (name, run) =>
      run()
      val leaked = memOnly()
      assert(leaked.isEmpty, s"$name left MEMORY_ONLY caches: ${leaked.mkString("; ")}")
    }
  }
}
