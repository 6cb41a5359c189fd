package graft

import org.apache.spark.sql.functions._
import graft.ingest.Sanitize
import graft.operators.{Compaction, CorpusDiff, ZOrder}
import graft.ann.{Ann, GraphSearch}
import graft.functions.VectorFunctions

/** Round-7 ops tail: snapshot diff, compaction planning, Z-order layout,
  * graph-beam ANN, Luhn/IP redaction.
  */
class OpsSpec extends SparkSpec {
  import spark.implicits._

  // ---- Sanitize: Luhn + IPv4 ----

  test("luhnValid accepts known-good PANs and rejects off-by-one") {
    val df = Seq(
      ("4111111111111111", true),   // classic Visa test number
      ("4111111111111112", false),  // check digit off by one
      ("79927398713", false),       // Luhn-valid but too short (11 digits)
      ("5500005555555559", true)    // MC test number
    ).toDF("digits", "expected")
    val got = df.select(col("expected"), Sanitize.luhnValid(col("digits")).as("got"))
      .collect()
    got.foreach(r => assert(r.getBoolean(0) == r.getBoolean(1), r.toString))
  }

  test("redactCreditCards redacts only Luhn-valid candidates; IP pass redacts IPv4") {
    val df = Seq(
      ("pay 4111-1111-1111-1111 now", "pay [REDACTED_CC] now"),
      ("pay 4111-1111-1111-1112 now", "pay 4111-1111-1111-1112 now"), // invalid survives
      ("order 1234567 is fine", "order 1234567 is fine")              // too short, not a candidate
    ).toDF("in", "expected")
    df.select(col("expected"), Sanitize.redactCreditCards(col("in")).as("got"))
      .collect().foreach(r => assert(r.getString(0) == r.getString(1), r.toString))

    val ips = Seq(
      ("from 192.168.1.254 ok", "from [REDACTED_IP] ok"),
      ("v1.2.3.4000 is a version", "v1.2.3.4000 is a version"), // octet out of range
      ("pi is 3.14159", "pi is 3.14159")
    ).toDF("in", "expected")
    ips.select(col("expected"), Sanitize.redactIps(col("in")).as("got"))
      .collect().foreach(r => assert(r.getString(0) == r.getString(1), r.toString))
  }

  test("sanitizeTextExtended composes cards, ips, and the standard chain") {
    val got = Seq("mail a@b.co ip 10.0.0.1 card 4111 1111 1111 1111 path /etc/passwd/x")
      .toDF("c").select(Sanitize.sanitizeTextExtended(col("c"))).head().getString(0)
    assert(got == "mail [REDACTED_EMAIL] ip [REDACTED_IP] card [REDACTED_CC] path [REDACTED_PATH]")
  }

  // ---- CorpusDiff ----

  test("snapshot diff classifies added/removed/changed/unchanged") {
    val oldSnap = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "content")
    val newSnap = Seq((2L, "b"), (3L, "c2"), (4L, "d")).toDF("id", "content")
    val m = CorpusDiff.diff(oldSnap, newSnap).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(m == Map(1L -> "removed", 2L -> "unchanged", 3L -> "changed", 4L -> "added"))
    val s = CorpusDiff.summary(oldSnap, newSnap).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(s("changed") == ((1L, 3L)) && s("added") == ((1L, 4L)))
  }

  // ---- Compaction ----

  test("compaction plan equals the single-window prefix-sum definition") {
    // 10 files of varying size; target 100 → groups by exclusive prefix sum
    val files = (0L until 10L).map(i => (i, 30L + 7L * i)).toDF("file_id", "bytes")
    // small span forces multi-bucket composition (4 driver buckets)
    val got = Compaction.plan(files, target = 100L, span = 3L)
      .orderBy("merge_group").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    // naive reference
    var acc = 0L
    val groups = (0L until 10L).map { i =>
      val b = 30L + 7L * i; val g = acc / 100L; acc += b; (g, i, b)
    }
    val want = groups.groupBy(_._1).toSeq.sortBy(_._1).map { case (g, rows) =>
      (g, rows.size.toLong, rows.map(_._3).sum, rows.map(_._2).min, rows.map(_._2).max)
    }
    assert(got.toSeq == want)
    // groups are contiguous in file order
    got.sliding(2).foreach { case Array(a, b) => assert(b._4 == a._5 + 1); case _ => () }
  }

  // ---- ZOrder ----

  test("zValue interleaves bits (x even positions, y odd)") {
    val df = Seq((3L, 1L), (0L, 0L), (1023L, 0L), (0L, 1023L)).toDF("x", "y")
    val got = df.select(ZOrder.zValue(col("x"), col("y"), 10)).as[Long].collect()
    // x=0b11,y=0b01 -> 1<<0 | 1<<2 | 1<<1 = 7
    assert(got(0) == 7L)
    assert(got(1) == 0L)
    // x all-ones -> even bits set: sum of 4^i for i<10
    assert(got(2) == (0 until 10).map(i => 1L << (2 * i)).sum)
    assert(got(3) == (0 until 10).map(i => 1L << (2 * i + 1)).sum)
  }

  test("z-order buckets bound both dimensions (vs one-dim sort bounding only one)") {
    val pts = for { x <- 0L until 32L; y <- 0L until 32L } yield (x, y)
    val df = pts.toDF("x", "y")
    val rep = ZOrder.boxReport(df, col("x"), col("y"), bits = 5, buckets = 16).collect()
    // 16 buckets over a 32x32 grid: each z-range is an 8x8 tile
    assert(rep.length == 16)
    rep.foreach { r =>
      assert(r.getLong(3) - r.getLong(2) <= 7, s"x box too wide: $r")
      assert(r.getLong(5) - r.getLong(4) <= 7, s"y box too wide: $r")
    }
  }

  // ---- IntervalJoin ----

  test("bucketed overlap join equals the naive theta-join, each pair once") {
    // intervals crossing bucket boundaries, nested, disjoint, and touching
    val l = Seq((1L, 0L, 250L), (2L, 300L, 310L), (3L, 500L, 900L))
      .toDF("lid", "s", "e")
    val r = Seq((10L, 240L, 305L), (11L, 600L, 650L), (12L, 901L, 950L),
      (13L, 0L, 1000L)).toDF("rid", "s2", "e2")
    val got = graft.operators.IntervalJoin
      .overlap(l, r, "s", "e", "s2", "e2", width = 100L)
      .select("lid", "rid").collect().map(x => (x.getLong(0), x.getLong(1))).sorted
    val lv = Seq((1L, 0L, 250L), (2L, 300L, 310L), (3L, 500L, 900L))
    val rv = Seq((10L, 240L, 305L), (11L, 600L, 650L), (12L, 901L, 950L), (13L, 0L, 1000L))
    val want = (for {
      (li, ls, le) <- lv; (ri, rs, re) <- rv
      if ls <= re && rs <= le
    } yield (li, ri)).sorted
    assert(got.toSeq == want)
    // no duplicates even for the many-bucket-spanning (13) interval
    assert(got.length == got.distinct.length)
  }

  // ---- Divergence ----

  test("KL by slice: identical slice scores 0, shifted slice scores higher") {
    val docs = Seq(
      ("bal", Seq("a", "b", "a", "b")), // mirrors the corpus mix
      ("bal", Seq("a", "b")),
      ("skew", Seq("a", "a", "a", "a")), // all mass on one token
      ("skew", Seq("a", "a"))
    ).toDF("src", "tokens")
    val got = graft.operators.Divergence.klBySlice(docs, "src").collect()
      .map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(got("skew") > got("bal"), got.toString)
    // support column counts distinct observed tokens
    val sup = graft.operators.Divergence.klBySlice(docs, "src").collect()
      .map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(sup == Map("bal" -> 2L, "skew" -> 1L))
  }

  // ---- boolean retrieval ----

  test("searchBoolean: AND requires every term, NOT excludes, tf-sum scores") {
    val docs = Seq(
      (1L, "spark join spark"), // both, tf 3
      (2L, "spark join stream"), // excluded by NOT
      (3L, "spark alone here"), // missing 'join'
      (4L, "join spark"), // both, tf 2
      (5L, "nothing relevant")
    ).toDF("id", "content")
    val postings = graft.ingest.Ingest.postings(docs)
    val got = graft.search.Lexical
      .searchBoolean(postings, Seq("spark", "join"), Seq("stream"), 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(got.toSeq == Seq((1L, 3.0), (4L, 2.0)))
  }

  // ---- Binning ----

  test("equal-frequency binning: uniform values split into equal bins; ties stay together") {
    val vals = (0L until 100L).map(v => Tuple1(v)).toDF("value")
    val rep = graft.operators.Binning.report(vals, nBins = 10).collect()
    assert(rep.length == 10)
    rep.foreach(r => assert(r.getLong(1) == 10L, r.toString))
    // bin bounds tile the range contiguously
    assert(rep.map(r => (r.getLong(2), r.getLong(3))).toSeq ==
      (0 until 10).map(i => (i * 10L, i * 10L + 9L)))
    // mean of bin 0 = 4.5 -> 4500000 micro
    assert(rep.head.getLong(4) == 4500000L)

    // a tie group spanning a cut keeps its whole group in one bin
    val tied = (Seq.fill(15)(1L) ++ Seq.fill(5)(2L)).map(Tuple1(_)).toDF("value")
    val binsOfOne = graft.operators.Binning.equalFrequency(tied, nBins = 2)
      .filter(col("value") === 1L).select("bin").distinct().as[Long].collect()
    assert(binsOfOne.toSeq == Seq(0L))
  }

  // ---- Sequences ----

  test("sequence pattern: ordered encode + non-overlapping match count") {
    val ev = Seq(
      (1L, 1L, 10L, "v"), (1L, 2L, 20L, "c"), (1L, 3L, 30L, "p"), // v c p -> 1
      (1L, 4L, 40L, "v"), (1L, 5L, 50L, "p"), // v p -> second match
      (2L, 6L, 10L, "p"), (2L, 7L, 20L, "v"), // p then v: no match
      (3L, 8L, 20L, "v"), (3L, 9L, 10L, "c") // ordering: c before v by ts
    ).toDF("user", "eid", "ts", "code")
    val got = graft.operators.Sequences.patternCounts(
      graft.operators.Sequences.encode(ev, "user", "ts", "eid", col("code")),
      "v[^p]*p")
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    assert(got(1L) == (("vcpvp", 2L)))
    assert(got(2L) == (("pv", 0L)))
    assert(got(3L) == (("cv", 0L))) // time order, not insert order
  }

  // ---- Contracts ----

  test("data contract: completeness, uniqueness, predicate checks in exact ppm") {
    val df = Seq(
      (1L, Some("a"), 25L), (2L, Some("b"), 10L),
      (3L, None, 30L), (4L, Some("a"), 40L)
    ).toDF("id", "name", "len")
    import graft.operators.Contracts._
    val got = report(df, Seq(
      Complete("name", 1000000L),
      Unique("id", 1000000L),
      Unique("name", 1000000L),
      Satisfies("len_min_20", col("len") >= 20, 700000L)))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getBoolean(3))).toMap
    assert(got("complete(name)") == ((750000L, false)))
    assert(got("unique(id)") == ((1000000L, true)))
    // 2 distinct non-null names over 4 rows
    assert(got("unique(name)") == ((500000L, false)))
    assert(got("satisfies(len_min_20)") == ((750000L, true)))
  }

  // ---- GraphSearch ----

  test("beam search over an exact kNN graph finds the brute-force top-1") {
    // 40 deterministic pseudo-random 8-dim vectors (seeded => the kNN
    // graph is random-geometric: small diameter, no 1-D chain worst case)
    def vec(i: Int): Seq[Float] = {
      val r = new scala.util.Random(i * 1000 + 7)
      (0 until 8).map(_ => (r.nextDouble() * 2 - 1).toFloat)
    }
    val vecs = (0 until 40).map(i => (i.toLong, vec(i))).toDF("id", "embedding")
      .withColumn("norm", VectorFunctions.l2Norm(col("embedding")))
    val graph = Ann.knnJoin(vecs, 8).select(col("qid"), col("neighbor")).localCheckpoint()
    val queries = Seq(7, 23).map(i => (i, vec(i)))
    val got = GraphSearch.beamSearch(graph, vecs, queries,
      entries = 4, beam = 10, hops = 4, k = 3).collect()
    // a query that IS a corpus vector must find itself at rank 1
    queries.foreach { case (qi, _) =>
      val top = got.filter(_.getInt(0) == qi).maxBy(_.getDouble(2))
      assert(top.getLong(1) == qi.toLong, s"query $qi top hit was $top")
    }
  }

  test("filtered beam search answers top-k among visited ∩ predicate") {
    def vec(i: Int): Seq[Float] = {
      val r = new scala.util.Random(i * 1000 + 7)
      (0 until 8).map(_ => (r.nextDouble() * 2 - 1).toFloat)
    }
    val vecs = (0 until 40).map(i => (i.toLong, vec(i))).toDF("id", "embedding")
      .withColumn("norm", VectorFunctions.l2Norm(col("embedding")))
      .localCheckpoint()
    val graph = Ann.knnJoin(vecs, 8).select(col("qid"), col("neighbor")).localCheckpoint()
    val queries = Seq(7 -> vec(7), 23 -> vec(23))

    // pred ≡ true: the filtered route must equal the plain walk exactly —
    // the final frontier's top-k dominates every node that ever fell out
    // of the beam (k <= beam), so widening the answer set to `visited`
    // changes nothing when the predicate passes everyone
    val plain = GraphSearch.beamSearch(graph, vecs, queries,
      entries = 4, beam = 10, hops = 4, k = 3)
      .collect().map(r => (r.getInt(0), r.getLong(1))).sorted.toSeq
    val allPass = GraphSearch.beamSearchFiltered(graph, vecs, queries,
      entries = 4, beam = 10, hops = 4, k = 3, pred = lit(true))
      .collect().map(r => (r.getInt(0), r.getLong(1))).sorted.toSeq
    assert(allPass == plain)

    // selective predicate (4/40 ids): with a beam wide enough to visit the
    // whole (connected) graph, the answer IS the exact filtered top-k —
    // and the walk itself stayed unfiltered, so reachability never
    // depended on the predicate
    val pred = pmod(col("id"), lit(13)) === 0
    val truth = Ann.bruteTopK(vecs.filter(pred), queries, 3)
      .collect().map(r => (r.getInt(0), r.getLong(1))).sorted.toSeq
    val got = GraphSearch.beamSearchFiltered(graph, vecs, queries,
      entries = 4, beam = 40, hops = 6, k = 3, pred = pred)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getDouble(2)))
    assert(got.map(t => (t._1, t._2)).sorted.toSeq == truth)
    // every answer row satisfies the predicate
    assert(got.forall(_._2 % 13 == 0))
    // narrow walk: answers still only from pred rows, at most k per query
    val narrow = GraphSearch.beamSearchFiltered(graph, vecs, queries,
      entries = 2, beam = 3, hops = 1, k = 3, pred = pred).collect()
    assert(narrow.forall(_.getLong(1) % 13 == 0))
    assert(narrow.groupBy(_.getInt(0)).values.forall(_.length <= 3))
  }

  test("filtered IVF: pushdown is exact within probed clusters; post-filter oversample bounded") {
    def vec(i: Int): Seq[Float] = {
      val r = new scala.util.Random(i * 1000 + 7)
      (0 until 8).map(_ => (r.nextDouble() * 2 - 1).toFloat)
    }
    val vecs = (0 until 40).map(i => (i.toLong, vec(i), i % 4)).toDF("id", "embedding", "label")
      .withColumn("norm", VectorFunctions.l2Norm(col("embedding")))
      .localCheckpoint()
    val cents = Ann.representativeCentroids(vecs, "label").localCheckpoint()
    val assigned = Ann.assign(vecs, cents).localCheckpoint()
    val queries = Seq(7 -> vec(7), 23 -> vec(23))
    val pred = pmod(col("id"), lit(13)) === 0 // 4/40 qualify

    // pushdown with EVERY cluster probed == exact filtered top-k: the
    // predicate sits under the bounded heap, never changes probe routing
    val truth = Ann.bruteTopK(vecs.filter(pred), queries, 3)
      .collect().map(r => (r.getInt(0), r.getLong(1))).sorted.toSeq
    val push = Ann.ivfTopK(assigned.filter(pred), cents, queries, 3, nprobe = 4)
      .collect().map(r => (r.getInt(0), r.getLong(1))).sorted.toSeq
    assert(push == truth, s"pushdown with all clusters probed must be exact: $push vs $truth")

    // post-filter with oversample >= corpus and all clusters probed is
    // exact too; with a k-sized (no-oversample) serve on a selective
    // predicate it may return FEWER than k — the recall loss the
    // oversample floor exists to prevent (never non-qualifying rows)
    val post = Ann.ivfTopK(assigned, cents, queries, 40, nprobe = 4)
      .filter(pred)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getDouble(2)))
    val postTop3 = post.groupBy(_._1).values.flatMap(
        _.sortBy(t => (-t._3, t._2)).take(3).map(t => (t._1, t._2)))
      .toSeq.sorted
    assert(postTop3 == truth,
      s"oversampled post-filter must recover the exact filtered set: $postTop3 vs $truth")
    assert(post.forall(_._2 % 13 == 0))
    val starved = Ann.ivfTopK(assigned, cents, queries, 3, nprobe = 4)
      .filter(pred).collect()
    assert(starved.forall(_.getLong(1) % 13 == 0))
    assert(starved.groupBy(_.getInt(0)).values.forall(_.length <= 3))
  }
}
