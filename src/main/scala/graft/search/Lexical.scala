package graft.search

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions._

/** Lexical (full-text) top-k — the lexical_search operator.
  *
  * The reference's backends disagree on the score scale (pg ts_rank_cd,
  * qdrant 1/rank, mongo textScore, chroma constant 1.0); per SURVEY §2.3 the
  * canonical engine semantics here are the deterministic ones:
  *
  *   v0 score  = TF-sum: sum over distinct query terms of the term's
  *               frequency in the document (the native-backend fallback,
  *               reference: vector_mcp/vectordb/epistemic_graph.py:352-375);
  *               docs with score 0 are excluded (a GIN/text-index match
  *               requires at least one term present).
  *   v1 score  = BM25 (k1=1.2, b=0.75, Lucene-style idf) — the intent named
  *               by RAGRetriever.bm25_query (retriever/retriever.py:90-101).
  *
  * Query tokenization mirrors epistemic_graph.py:55,:324-326 —
  * `[A-Za-z0-9_]{2,}`, casefold, order-preserving dedup.
  *
  * Scale design: scoring is a single corpus scan per query batch (terms are
  * broadcast literals), then bounded-heap top-k (TakeOrderedAndProject).
  * BM25 needs corpus stats (N, avgdl, per-term df): N/avgdl is one tiny
  * aggregate; df per term is computed in the same scan via conditional
  * aggregation — no posting-list shuffle in the serving path. A derived
  * posting table (`Ingest.postings`) exists for index-style reuse at scale.
  */
object Lexical {

  /** TF-sum top-k for multiple queries. Result: (query_idx, id, <payload...>, score). */
  def search(
      docs: DataFrame,
      queries: Seq[(Int, String)],
      k: Int,
      payload: Seq[String] = Nil
  ): DataFrame = {
    val results = queries.map { case (qIdx, q) =>
      val terms = tokenizeQuery(q)
      // materialize the tokenizer ONCE per row (same idiom as
      // Dedup.shingleSets): scoring references col("__toks") per term, so a
      // 3-term query pays the regex 1x, not 3x — CollapseProject keeps a
      // multiply-referenced non-trivial alias in its own projection
      val toks = col("__toks")
      val score = terms
        .map(t => tf(toks, lit(t)).cast("double"))
        .reduceOption(_ + _)
        .getOrElse(lit(0.0))
      docs
        .withColumn("__toks", tokens(col("content")))
        .withColumn("score", score)
        .filter(col("score") > 0)
        .withColumn("query_idx", lit(qIdx))
        .select((Seq("query_idx", "id") ++ payload ++ Seq("score")).map(col): _*)
        .orderBy(col("score").desc, col("id").asc)
        .limit(k)
    }
    // empty batch -> zero-row result with the result schema (see Semantic)
    results.reduceOption(_ unionAll _).getOrElse(
      search(docs, Seq(0 -> ""), k, payload).limit(0))
  }

  /** BM25 top-k for one query. Two-phase: (1) one aggregate over the corpus
    * computing N, avgdl and df per query term; (2) scan + score + top-k.
    * The stats row is collected (it is a single row) and folded into plan
    * literals — equivalent to broadcasting, with zero join.
    */
  def searchBm25(
      docs: DataFrame,
      queryIdx: Int,
      query: String,
      k: Int,
      k1: Double = 1.2,
      b: Double = 0.75,
      payload: Seq[String] = Nil
  ): DataFrame = {
    val terms = tokenizeQuery(query)
    // one tokenizer run per row in BOTH phases (see search): the stats
    // aggregate and the scoring scan each project __toks once and reference
    // it per term, instead of inlining the regex into every term expression
    val toksC = col("__toks")
    val statsAggs =
      Seq(count(lit(1)).as("n"), avg(size(toksC)).as("avgdl")) ++
        terms.zipWithIndex.map { case (t, i) =>
          sum(when(tf(toksC, lit(t)) > 0, 1L).otherwise(0L)).as(s"df_$i")
        }
    val stats = docs.select(tokens(col("content")).as("__toks"))
      .agg(statsAggs.head, statsAggs.tail: _*).collect()(0)
    val n = stats.getAs[Long]("n").toDouble
    val avgdl = stats.getAs[Double]("avgdl")
    val score = terms.zipWithIndex.map { case (t, i) =>
      val df = stats.getAs[Long](s"df_$i").toDouble
      val idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
      val f = tf(toksC, lit(t)).cast("double")
      lit(idf) * (f * (k1 + 1)) /
        (f + lit(k1) * (lit(1 - b) + lit(b) * size(toksC).cast("double") / lit(avgdl)))
    }.reduceOption(_ + _).getOrElse(lit(0.0))
    docs
      .withColumn("__toks", tokens(col("content")))
      .withColumn("score", score)
      .filter(col("score") > 0)
      .withColumn("query_idx", lit(queryIdx))
      .select((Seq("query_idx", "id") ++ payload ++ Seq("score")).map(col): _*)
      .orderBy(col("score").desc, col("id").asc)
      .limit(k)
  }

  /** Multi-query BM25: ONE corpus stats pass for the union of all query
    * terms (N, avgdl, every df in a single aggregate — the multi-query
    * analog of [[searchBm25]]'s phase 1), then one scan + bounded top-k per
    * query. Q queries cost 1 + Q corpus scans instead of 2Q.
    */
  def searchBm25Many(
      docs: DataFrame,
      queries: Seq[(Int, String)],
      k: Int,
      k1: Double = 1.2,
      b: Double = 0.75,
      payload: Seq[String] = Nil
  ): DataFrame = {
    val allTerms = queries.flatMap { case (_, q) => tokenizeQuery(q) }.distinct
    val toksC = col("__toks") // materialized once per row — see searchBm25
    val statsAggs =
      Seq(count(lit(1)).as("n"), avg(size(toksC)).as("avgdl")) ++
        allTerms.zipWithIndex.map { case (t, i) =>
          sum(when(tf(toksC, lit(t)) > 0, 1L).otherwise(0L)).as(s"df_$i")
        }
    val stats = docs.select(tokens(col("content")).as("__toks"))
      .agg(statsAggs.head, statsAggs.tail: _*).collect()(0)
    val n = stats.getAs[Long]("n").toDouble
    val avgdl = stats.getAs[Double]("avgdl")
    val dfByTerm = allTerms.zipWithIndex
      .map { case (t, i) => t -> stats.getAs[Long](s"df_$i").toDouble }.toMap
    val results = queries.map { case (qIdx, q) =>
      val score = tokenizeQuery(q).map { t =>
        val df = dfByTerm(t)
        val idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
        val f = tf(toksC, lit(t)).cast("double")
        lit(idf) * (f * (k1 + 1)) /
          (f + lit(k1) * (lit(1 - b) + lit(b) * size(toksC).cast("double") / lit(avgdl)))
      }.reduceOption(_ + _).getOrElse(lit(0.0))
      docs
        .withColumn("__toks", tokens(col("content")))
        .withColumn("score", score)
        .filter(col("score") > 0)
        .withColumn("query_idx", lit(qIdx))
        .select((Seq("query_idx", "id") ++ payload ++ Seq("score")).map(col): _*)
        .orderBy(col("score").desc, col("id").asc)
        .limit(k)
    }
    results.reduceOption(_ unionAll _).getOrElse(
      searchBm25(docs, 0, "", k, k1, b, payload).limit(0))
  }

  /** Index-backed BM25 over the postings table (id, dl, term, tf) — the
    * serving path that never touches document content. Stats (N, avgdl per
    * indexed doc, df per term) come from the index itself; the per-doc term
    * frequencies are assembled with one conditional-sum aggregate over the
    * term-filtered postings, so the score expression sums terms in the SAME
    * literal order as the scan path — bit-identical results, provable
    * against the same oracle.
    *
    * Scale shape: the postings filter is a pruned scan (term-bucketed at
    * 100 TB), the groupBy keys on (id, dl) over only matching rows, and df
    * collection is a tiny aggregate over the same filtered slice.
    */
  def searchBm25Indexed(
      postings: DataFrame,
      queries: Seq[(Int, String)],
      k: Int,
      k1: Double = 1.2,
      b: Double = 0.75
  ): DataFrame = {
    val docStats = postings.select("id", "dl").distinct()
      .agg(count(lit(1)).as("n"), avg(col("dl").cast("double")).as("avgdl"))
      .collect()(0)
    val n = docStats.getAs[Long]("n").toDouble
    val avgdl = docStats.getAs[Double]("avgdl")
    val allTerms = queries.flatMap { case (_, q) => tokenizeQuery(q) }.distinct
    val dfByTerm: Map[String, Double] =
      if (allTerms.isEmpty) Map.empty
      else postings.filter(col("term").isin(allTerms: _*))
        .groupBy("term").agg(count(lit(1)).as("df"))
        .collect().map(r => r.getString(0) -> r.getLong(1).toDouble).toMap
    val results = queries.map { case (qIdx, q) =>
      val terms = tokenizeQuery(q)
      val matched =
        if (terms.isEmpty) postings.limit(0)
        else postings.filter(col("term").isin(terms: _*))
      val tfCols = terms.zipWithIndex.map { case (t, i) =>
        sum(when(col("term") === t, col("tf")).otherwise(0L)).as(s"f_$i")
      }
      val pivoted =
        if (tfCols.isEmpty) matched.select(col("id"), col("dl"))
        else matched.groupBy("id", "dl").agg(tfCols.head, tfCols.tail: _*)
      val score = terms.zipWithIndex.map { case (t, i) =>
        val df = dfByTerm.getOrElse(t, 0.0)
        val idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
        val f = col(s"f_$i").cast("double")
        lit(idf) * (f * (k1 + 1)) /
          (f + lit(k1) * (lit(1 - b) + lit(b) * col("dl").cast("double") / lit(avgdl)))
      }.reduceOption(_ + _).getOrElse(lit(0.0))
      pivoted
        .withColumn("score", score)
        .filter(col("score") > 0)
        .withColumn("query_idx", lit(qIdx))
        .select("query_idx", "id", "score")
        .orderBy(col("score").desc, col("id").asc)
        .limit(k)
    }
    results.reduceOption(_ unionAll _).getOrElse(
      searchIndexed(postings, Seq(0 -> ""), k).limit(0))
  }

  /** Driver-side mirror of the column tokenizer, for query strings. */
  def tokenizeQuery(q: String): Seq[String] =
    TokenPattern.r.findAllIn(q.toLowerCase).toSeq.distinct

  /** Index-backed TF search over a postings table (id, dl, term, tf) built
    * once at ingest (Ingest.postings) — the engine's analog of the
    * reference's GIN inverted index (postgres.py:189-196). The query never
    * touches document content: it filters the postings by the (broadcast)
    * term list, sums tf per doc, and takes the bounded top-k. At 100 TB the
    * postings table is bucketed by term so this becomes a pruned scan.
    */
  def searchIndexed(
      postings: DataFrame,
      queries: Seq[(Int, String)],
      k: Int): DataFrame = {
    val results = queries.map { case (qIdx, q) =>
      val terms = tokenizeQuery(q)
      postings
        .filter(col("term").isin(terms: _*))
        .groupBy("id")
        .agg(sum(col("tf")).cast("double").as("score"))
        .withColumn("query_idx", lit(qIdx))
        .select("query_idx", "id", "score")
        .orderBy(col("score").desc, col("id").asc)
        .limit(k)
    }
    // empty batch -> zero-row result with the result schema (see Semantic)
    results.reduceOption(_ unionAll _).getOrElse(
      searchIndexed(postings, Seq(0 -> ""), k).limit(0))
  }

  /** Boolean retrieval over the postings table: documents containing ALL
    * `must` terms and NONE of the `mustNot` terms, scored by the must
    * terms' summed tf. Completes the lexical family next to TF/BM25/
    * phrase.
    *
    * Scale shape: term-pruned postings reads only (the term filter pushes
    * into the parquet scan of a persisted LexIndex; never touches
    * content). AND = one keyed agg counting distinct matched terms ==
    * |must| (no m-way self-join); NOT = one left-anti join against the
    * mustNot postings slice. Both frames are posting-list-sized.
    */
  def searchBoolean(
      postings: DataFrame,
      must: Seq[String],
      mustNot: Seq[String],
      k: Int): DataFrame = {
    require(must.nonEmpty, "boolean retrieval needs at least one must term")
    val mustT = must.map(_.toLowerCase).distinct
    val notT = mustNot.map(_.toLowerCase).distinct
    val hits = postings
      .filter(col("term").isin(mustT: _*))
      .groupBy("id")
      .agg(count(lit(1)).as("n_terms"), // postings are (id, term)-unique
        sum(col("tf")).cast("double").as("score"))
      .filter(col("n_terms") === mustT.size)
    val excluded =
      if (notT.isEmpty) hits
      else hits.join(
        postings.filter(col("term").isin(notT: _*)).select("id").distinct(),
        Seq("id"), "left_anti")
    excluded
      .select(col("id"), col("score"))
      .orderBy(col("score").desc, col("id").asc)
      .limit(k)
  }

  /** Phrase tokenization: [[tokenizeQuery]]'s regex WITHOUT the dedup —
    * a phrase is an ordered sequence, repeats included.
    */
  def tokenizePhrase(q: String): Seq[String] =
    TokenPattern.r.findAllIn(q.toLowerCase).toSeq

  /** Positional phrase search: top-k documents containing the query terms
    * ADJACENT and IN ORDER, scored by phrase occurrence count, with a
    * ±`window`-token snippet around the first occurrence (the highlight a
    * serving layer returns).
    *
    * Scale shape — the positional-index intersection, without an m-way
    * self-join: one posexplode pass keeps only phrase-term rows (for rare
    * phrases that is a sliver of the corpus), each row emits its candidate
    * phrase-START position for every slot its term could fill
    * (`p0 = pos − slot`), and a phrase match is a (id, p0) group whose
    * DISTINCT satisfied slots count m — ONE keyed shuffle on (id, p0),
    * output-proportional from the filter onward. Snippets are computed by
    * re-reading content for the ≤ Q·k winning docs only (bucket-pruned
    * point reads against a real table).
    */
  def phraseSearch(
      docs: DataFrame,
      queries: Seq[(Int, String)],
      k: Int,
      window: Int = 5): DataFrame = {
    val tokPos = docs
      .select(col("id"), posexplode(tokens(col("content"))).as(Seq("pos", "term")))
    val results = queries.flatMap { case (qIdx, q) =>
      val terms = tokenizePhrase(q)
      if (terms.isEmpty) None
      else Some {
        val m = terms.length
        // term -> slots it fills (repeated phrase terms fill several)
        val slotMap = terms.zipWithIndex.groupMap(_._1)(_._2)
        val slotExpr = map(slotMap.toSeq.sortBy(_._1).flatMap { case (t, slots) =>
          Seq(lit(t), array(slots.map(lit): _*))
        }: _*)
        val matches = tokPos
          .filter(col("term").isin(terms.distinct: _*))
          .select(col("id"), col("pos"), explode(element_at(slotExpr, col("term"))).as("slot"))
          .withColumn("p0", col("pos") - col("slot"))
          .filter(col("p0") >= 0)
          .groupBy("id", "p0")
          .agg(countDistinct(col("slot")).as("n_slots"))
          .filter(col("n_slots") === m)
        val perDoc = matches.groupBy("id")
          .agg(count(lit(1)).as("phrase_tf"), min(col("p0")).as("first_pos"))
          .orderBy(col("phrase_tf").desc, col("id").asc)
          .limit(k)
        // snippet: tokens [first_pos - window, first_pos + m + window) of the
        // winning docs only
        val withToks = perDoc.join(
          docs.select(col("id"), tokens(col("content")).as("__toks")), "id")
        val start = greatest(col("first_pos") - window, lit(0))
        withToks
          .withColumn("snippet", array_join(
            slice(col("__toks"), start + 1,
              col("first_pos") + lit(m + window) - start), " "))
          .withColumn("query_idx", lit(qIdx))
          .select(col("query_idx"), col("id"), col("phrase_tf"),
            col("first_pos"), col("snippet"))
          .orderBy(col("phrase_tf").desc, col("id").asc)
      }
    }
    results.reduceOption(_ unionAll _).getOrElse(
      docs.sparkSession.emptyDataFrame
        .select(lit(0).as("query_idx"), lit(0L).as("id"),
          lit(0L).as("phrase_tf"), lit(0).as("first_pos"),
          lit("").as("snippet")).limit(0))
  }
}
