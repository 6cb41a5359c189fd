package graft

import org.apache.spark.sql.functions._
import graft.functions.{TextFunctions, VectorFunctions}
import graft.ingest.{DeterministicHashEmbedder, Ingest}
import graft.search.Lexical

class FunctionsSpec extends SparkSpec {

  test("pii entity redaction: email/ssn/phone redact, near-misses survive, idempotent") {
    import spark.implicits._
    val in = Seq(
      "mail a.b+c@x-y.co now",                   // email
      "ssn 123-45-6789 here",                    // ssn
      "call 555-867-5309 or (555) 123-4567",     // phones
      "+1 555.867.5309 intl form",               // phone w/ country code
      "v1.2.3 and 12-34 and a@b stay",           // near-misses must survive
      "doc at /var/log/x.log with bob@corp.io")  // path + email compose
      .toDF("content")
    val out = in.select(graft.ingest.Sanitize.sanitizeTextFull($"content").as("c"))
      .collect().map(_.getString(0))
    assert(out(0) == "mail [REDACTED_EMAIL] now")
    assert(out(1) == "ssn [REDACTED_SSN] here")
    assert(out(2) == "call [REDACTED_PHONE] or ([REDACTED_PHONE]")
    // \b cannot sit before '+' (non-word on both sides), so the match
    // starts at the '1' — identical in Java regex and RE2, parity-safe
    assert(out(3) == "+[REDACTED_PHONE] intl form")
    assert(out(4) == "v1.2.3 and 12-34 and a@b stay")
    assert(out(5) == "doc at [REDACTED_PATH] with [REDACTED_EMAIL]")
    // idempotent: a second pass changes nothing
    val twice = in.select(graft.ingest.Sanitize.sanitizeTextFull(
      graft.ingest.Sanitize.sanitizeTextFull($"content")).as("c"))
      .collect().map(_.getString(0))
    assert(twice.toSeq == out.toSeq)
  }

  test("uuid5 NAMESPACE_OID byte parity with Python uuid.uuid5") {
    // expected values generated with CPython's uuid module
    assert(Ingest.uuid5Oid("test") == "b428b5d9-df19-5bb9-a1dc-115e071b836c")
    assert(Ingest.uuid5Oid(
      "b94d27b9934d3e08a52e52d7da7dabfac484efe37a5380ee9088f7ace2efcde9")
      == "6b7dfd25-6e32-5c87-849c-8b658ed84470")
  }

  test("graft_* SQL functions register and match the Column API bit-exactly") {
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark)
    Seq((Array(1.0f, 2.0f, 3.0f), Array(0.5f, -1.5f, 2.25f)))
      .toDF("a", "b").createOrReplaceTempView("vecs")
    val sqlRow = spark.sql(
      """SELECT graft_dot(a, b) AS d, graft_l2norm(a) AS n,
        |       graft_l2distsq(a, b) AS q, graft_cosine(a, b) AS c
        |FROM vecs""".stripMargin).collect()(0)
    val apiRow = spark.table("vecs").select(
      VectorFunctions.dot($"a", $"b"), VectorFunctions.l2Norm($"a"),
      VectorFunctions.l2DistanceSq($"a", $"b"),
      VectorFunctions.cosine($"a", $"b")).collect()(0)
    (0 until 4).foreach(i => assert(sqlRow.getDouble(i) == apiRow.getDouble(i)))
    // the config-based path injects the same builders without error
    new graft.functions.GraftExtensions().apply(
      new org.apache.spark.sql.SparkSessionExtensions)
  }

  test("native dot/l2Norm match interpreted HOF formulation bit-exactly") {
    import spark.implicits._
    val df = Seq(
      (Array(1.0f, 2.0f, 3.0f), Array(0.5f, -1.5f, 2.25f)),
      (Array(0.1f, 0.2f, 0.3f), Array(0.9f, 0.8f, 0.7f))
    ).toDF("a", "b")
    val hofDot = aggregate(zip_with($"a", $"b", (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)
    val hofNorm = sqrt(aggregate($"a", lit(0.0),
      (acc, x) => acc + x.cast("double") * x.cast("double")))
    val rows = df.select(
      VectorFunctions.dot($"a", $"b").as("nd"), hofDot.as("hd"),
      VectorFunctions.l2Norm($"a").as("nn"), hofNorm.as("hn")).collect()
    rows.foreach { r =>
      assert(r.getDouble(0) == r.getDouble(1))
      assert(r.getDouble(2) == r.getDouble(3))
    }
  }

  test("cosine of identical vectors is ~1, orthogonal is 0") {
    import spark.implicits._
    val df = Seq((Array(1.0f, 0.0f), Array(1.0f, 0.0f), Array(0.0f, 2.0f)))
      .toDF("a", "b", "c")
    val r = df.select(
      VectorFunctions.cosine($"a", $"b"), VectorFunctions.cosine($"a", $"c")).collect()(0)
    assert(math.abs(r.getDouble(0) - 1.0) < 1e-12)
    assert(math.abs(r.getDouble(1)) < 1e-12)
  }

  test("tokenizer: [a-z0-9_]{2,} casefolded; query dedup order-preserving") {
    assert(Lexical.tokenizeQuery("Spark JOIN spark x y2_z!") == Seq("spark", "join", "y2_z"))
    import spark.implicits._
    val toks = Seq("Hello, World_9 a bb").toDF("content")
      .select(TextFunctions.tokens(col("content"))).collect()(0).getSeq[String](0)
    assert(toks == Seq("hello", "world_9", "bb"))
  }

  test("deterministic embedder: stable across calls, bounded values, query==text") {
    val e = new DeterministicHashEmbedder(16)
    val a = e.embedBatch(Seq("hello")).head
    val b = e.embedQuery("hello")
    assert(a.toSeq == b.toSeq)
    assert(a.length == 16)
    assert(a.forall(v => v >= 0.0f && v < 1.0f))
    assert(e.embedBatch(Seq("hello")).head.toSeq == a.toSeq)
    assert(e.embedBatch(Seq("other")).head.toSeq != a.toSeq)
  }

  test("stableHash32 equals DuckDB's ('0x'||substr(md5(s),1,8))::bigint definition") {
    import spark.implicits._
    // expected: int('0cc175b9', 16) for 'a' (md5('a')=0cc175b9c0f1b6a831c399e269772661)
    val got = Seq("a").toDF("s")
      .select(TextFunctions.stableHash32(col("s"))).collect()(0).getLong(0)
    assert(got == java.lang.Long.parseLong("0cc175b9", 16))
  }

  test("shingles produce n-grams of consecutive tokens") {
    import spark.implicits._
    val sh = Seq("one two three four").toDF("content")
      .select(TextFunctions.shingles(TextFunctions.tokens(col("content")), 3))
      .collect()(0).getSeq[String](0)
    assert(sh == Seq("one two three", "two three four"))
  }

  test("sortedIntersectCount equals size(array_intersect) on sorted distinct arrays") {
    import spark.implicits._
    val cases = Seq(
      (Seq("a", "b", "c"), Seq("b", "c", "d")),
      (Seq("a"), Seq("a")),
      (Seq("a", "b"), Seq("c", "d")),
      (Seq.empty[String], Seq("a")),
      (Seq.empty[String], Seq.empty[String]),
      (Seq("aa", "ab", "b"), Seq("ab", "b", "z")))
    val df = cases.toDF("x", "y")
      .select(
        graft.functions.VectorExpressions.sortedIntersectCount(col("x"), col("y")).as("m"),
        size(array_intersect(col("x"), col("y"))).as("e"))
    assert(df.collect().forall(r => r.getInt(0) == r.getInt(1)))
    // SQL registration routes to the same expression
    graft.functions.GraftFunctions.register(spark)
    val viaSql = cases.toDF("x", "y")
      .selectExpr("graft_sorted_intersect(x, y) AS m",
        "size(array_intersect(x, y)) AS e")
    assert(viaSql.collect().forall(r => r.getInt(0) == r.getInt(1)))
    // non-string arrays are an ANALYSIS error, not runtime garbage
    // (getUTF8String over int slots would misread them as pointers)
    val err = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT graft_sorted_intersect(array(1, 2), array(1, 2))").collect()
    }
    assert(err.getMessage.contains("graft_sorted_intersect") ||
      err.getMessage.contains("DATATYPE_MISMATCH"))
  }

  test("graft_char_trigrams SQL function matches the Column API") {
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark)
    val df = Seq("hello", "ab", "").toDF("s")
    val viaSql = df.selectExpr("graft_char_trigrams(s) AS t")
      .collect().map(_.getSeq[String](0))
    val viaCol = df.select(graft.functions.TextExpressions.charTrigrams(col("s")))
      .collect().map(_.getSeq[String](0))
    assert(viaSql.toSeq == viaCol.toSeq)
    assert(viaSql.head == Seq("hel", "ell", "llo"))
  }

  test("native expressions codegen-compile when emitted twice in one scope") {
    // A filter collapsed into a join condition (or graft_cosine's two
    // L2Norms) emits the same expression twice into one generated
    // function; with fixed local names janino fails ("redefinition of
    // local variable i") and Spark silently falls back to interpreted
    // eval — correct results, hot path off codegen. Compiling the
    // predicate DIRECTLY surfaces that as a test failure.
    import org.apache.spark.sql.catalyst.expressions._
    import org.apache.spark.sql.catalyst.expressions.codegen.GeneratePredicate
    import org.apache.spark.sql.types._
    import graft.functions.VectorExpressions._
    val arr = AttributeReference("x", ArrayType(StringType, containsNull = false))()
    val brr = AttributeReference("y", ArrayType(StringType, containsNull = false))()
    val vec = AttributeReference("v", ArrayType(FloatType, containsNull = false))()
    val wec = AttributeReference("w", ArrayType(FloatType, containsNull = false))()
    val schema = Seq(arr, brr, vec, wec)
    def twice(e: Expression): Expression =
      And(GreaterThan(e, Literal(0.0)), LessThan(e, Literal(9.9)))
    GeneratePredicate.generate(twice(Cast(
      SortedIntersectCount(arr, brr), DoubleType)), schema)
    GeneratePredicate.generate(twice(DotProduct(vec, wec)), schema)
    GeneratePredicate.generate(twice(L2Norm(vec)), schema)
    GeneratePredicate.generate(twice(L2DistanceSq(vec, wec)), schema)
    GeneratePredicate.generate(twice(Divide(DotProduct(vec, wec),
      Multiply(L2Norm(vec), L2Norm(wec)))), schema)
  }

  test("RRF fusion math matches reference formula on a hand-computed case") {
    // reference: tests/test_vector_api.py:148-167 semantics —
    // doc in both lists at ranks r1, r2 scores w1/(k+r1)+w2/(k+r2)
    import spark.implicits._
    val sem = Seq((0, "d1", 0.9), (0, "d2", 0.8)).toDF("query_idx", "id", "score")
    val lex = Seq((0, "d2", 5.0), (0, "d3", 2.0)).toDF("query_idx", "id", "score")
    val fused = graft.search.Hybrid.rrf(sem, lex, 0.5, 0.5, 60, 10)
      .collect().map(r => r.getString(1) -> r.getDouble(2)).toMap
    assert(fused("d1") == 0.5 / 61)
    assert(fused("d2") == 0.5 / 62 + 0.5 / 61)
    assert(fused("d3") == 0.5 / 62)
  }

  test("searchMany (large-batch window path) agrees with per-query top-k path") {
    import spark.implicits._
    val dir = "/root/testdata/sf0.001"
    val docs = Tables.vectors(spark, dir)
    val qs = Tables.queryVectors(spark, dir, Seq(0, 1))
    val perQuery = graft.search.Semantic.search(docs, qs, 5)
      .select("query_idx", "id").collect()
      .map(r => (r.getInt(0), r.getLong(1))).toSet
    val qdf = qs.map { case (i, v) => (i, v) }.toDF("query_idx", "query_vec")
    val windowed = graft.search.Semantic.searchMany(docs, qdf, 5)
      .select("query_idx", "id").collect()
      .map(r => (r.getInt(0), r.getLong(1))).toSet
    assert(perQuery == windowed)
  }

  test("indexed BM25 equals scan BM25 bit-exactly; multi-query shares one stats pass") {
    import spark.implicits._
    val docs = Seq(
      "spark joins tables with spark sql",
      "vector streams of data flow through spark",
      "tables of data join other tables",
      "completely unrelated prose about nothing",
      "spark spark spark join join table"
    ).zipWithIndex.map { case (c, i) => (s"d$i", c) }.toDF("id", "content")
    val queries = Seq((0, "spark join table"), (1, "vector stream data"))
    val scan = Lexical.searchBm25Many(docs, queries, 10)
      .orderBy("query_idx", "id").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getDouble(2)))
    val postings = Ingest.postings(docs)
    val indexed = Lexical.searchBm25Indexed(postings, queries, 10)
      .orderBy("query_idx", "id").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getDouble(2)))
    assert(scan.nonEmpty)
    assert(scan.toSeq == indexed.toSeq,
      "index-backed BM25 must reproduce the scan scores bit-for-bit")
    // single-query searchBm25 agrees with the multi-query path on query 0
    val single = Lexical.searchBm25(docs, 0, "spark join table", 10)
      .orderBy("id").collect().map(r => (r.getInt(0), r.getString(1), r.getDouble(2)))
    assert(single.toSeq == scan.filter(_._1 == 0).toSeq)
  }

  test("salted aggregation equals plain aggregation on a skewed key") {
    import spark.implicits._
    // 90% of rows share one hot key
    val df = (1 to 2000).map(i => (if (i % 10 == 0) s"k${i % 7}" else "hot", i.toLong))
      .toDF("k", "v")
    val plain = df.groupBy("k").agg(sum($"v").as("v"), count($"v").as("c"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val salted = graft.functions.SkewTools
      .saltedAgg(df.withColumn("c", $"v"), Seq("k"),
        Map("v" -> "sum", "c" -> "count"), salts = 8)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(salted == plain)
  }

  test("salted join equals plain join on a skewed fact table") {
    import spark.implicits._
    // 90% of fact rows hit one hot key
    val fact = (0 until 2000)
      .map(i => (if (i % 10 == 0) s"k${i % 50}" else "hot", i.toLong))
      .toDF("key", "v")
    val dim = (Seq("hot") ++ (0 until 50).map(i => s"k$i"))
      .zipWithIndex.map { case (k, i) => (k, s"payload$i") }.toDF("key", "payload")
    val plain = fact.join(dim, Seq("key"))
      .select("key", "v", "payload").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2))).sorted.toSeq
    val salted = graft.functions.SkewTools.saltedJoin(fact, dim, "key", salts = 8)
      .select("key", "v", "payload").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2))).sorted.toSeq
    assert(plain.nonEmpty && salted == plain)
  }

  test("NFC normalization unifies composed and decomposed spellings") {
    import spark.implicits._
    import graft.functions.TextFunctions
    val out = Seq(("caf\u00e9", "cafe\u0301"))
      .toDF("composed", "decomposed")
      .select(
        TextFunctions.normalizeTextNfc(org.apache.spark.sql.functions.col("composed")).as("a"),
        TextFunctions.normalizeTextNfc(org.apache.spark.sql.functions.col("decomposed")).as("b"))
      .collect()(0)
    assert(out.getString(0) == out.getString(1), "NFC must unify the spellings")
    assert(out.getString(0).length == 4, "composed form is 4 chars")
  }

  test("error firewall collapses unstable messages") {
    import graft.model.ErrorCodes
    assert(ErrorCodes.firewall("collection_not_found") == "collection_not_found")
    assert(ErrorCodes.firewall("Some Backend Error!") == ErrorCodes.VectorBackendOperationFailed)
    assert(ErrorCodes.firewall(null) == ErrorCodes.VectorBackendOperationFailed)
    assert(ErrorCodes.firewall("x" * 100) == ErrorCodes.VectorBackendOperationFailed)
  }
}
