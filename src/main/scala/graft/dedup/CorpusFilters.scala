package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.storage.StorageLevel
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions._

/** Corpus-filtering signals for pretraining pipelines, beyond pairwise
  * dedup: within-document repetition statistics (the Gopher/MassiveText
  * repetition rules, Rae et al. 2021 §A1.1) and corpus-level boilerplate
  * coverage (template/navigation n-grams shared by many documents, the
  * C4/RefinedWeb line-dedup idea expressed over token n-grams).
  *
  * Same dataflow contract as [[Dedup]]: EXPLODE + JOIN + AGGREGATE with
  * keyed shuffles only. The tokenizer regex runs once per document into a
  * materialized column; n-gram assembly is an in-row transform over that
  * array; every aggregation is combiner-friendly (map-side partial
  * collapses within-document repeats before any shuffle).
  */
object CorpusFilters {

  /** REPEATING (non-distinct) n-grams of a token array — unlike
    * [[graft.functions.TextFunctions.shingles]], duplicates stay, because
    * repetition counting is the point. Empty/short docs get an empty
    * array (guarded: `sequence(0, -1)` would otherwise emit a descending
    * range).
    */
  private def gramsOf(toks: Column, n: Int): Column =
    when(size(toks) < n, array().cast("array<string>")).otherwise(
      transform(sequence(lit(0), size(toks) - lit(n)), i =>
        concat_ws(" ", (0 until n).map(j => element_at(toks, i + lit(j + 1))): _*)))

  /** One tokenizer pass over the corpus: (id, toks). Every gate in this
    * object consumes THIS shape, so a pipeline composing several gates
    * (repetition + boilerplate + downstream dedup) tokenizes each
    * document exactly once — persist the result and fan out. At 100 TB
    * the tokenizer regex over the content column is a scan-dominating
    * cost; paying it per-gate would multiply the most expensive stage by
    * the gate count.
    */
  def tokenized(
      docs: DataFrame,
      idCol: String = "id",
      contentCol: String = "content"): DataFrame =
    docs.select(col(idCol).as("id"), tokens(col(contentCol)).as("toks"))

  /** n-gram occurrence rows with start positions:
    * (id, tok_len, pos, g), pos 0-based. One scan, no shuffle.
    */
  def gramRows(
      docs: DataFrame,
      n: Int,
      idCol: String = "id",
      contentCol: String = "content"): DataFrame =
    gramRowsFromToks(tokenized(docs, idCol, contentCol), n)

  /** [[gramRows]] over an existing (id, toks) frame ([[tokenized]]). */
  def gramRowsFromToks(tokd: DataFrame, n: Int): DataFrame =
    tokd.select(col("id"), size(col("toks")).as("tok_len"),
      posexplode(gramsOf(col("toks"), n)).as(Seq("pos", "g")))

  /** Within-document repetition signals, one row per (document, n):
    *
    *   - `total_ngrams` / `distinct_ngrams` — occurrence vs type counts
    *   - `dup_frac` — fraction of n-gram slots occupied by a repeat
    *     (`1 - distinct/total`; Gopher's "duplicate n-grams" family)
    *   - `top_frac` — the most frequent n-gram's share of all slots
    *     (Gopher's "top n-gram coverage")
    *
    * Documents with fewer than n tokens emit no row (no n-gram slots —
    * the fractions are undefined, matching Gopher which filters on
    * defined signals only).
    *
    * Scale shape: two keyed aggregations, (id, n, g) then (id, n). The
    * first has map-side combine — a pathologically repetitive document
    * (the very thing this signal flags) collapses to its type count
    * before the shuffle, so hot documents cannot skew it. Group keys
    * carry the gram string for oracle replay; an oracle-free deployment
    * can key on xxhash64(g) as in [[Dedup.ngramJaccardPrefix]].
    */
  def repetitionSignals(
      docs: DataFrame,
      ns: Seq[Int] = Seq(2, 3),
      idCol: String = "id",
      contentCol: String = "content"): DataFrame =
    repetitionSignalsFromToks(tokenized(docs, idCol, contentCol), ns)

  /** [[repetitionSignals]] over an existing (id, toks) frame. */
  def repetitionSignalsFromToks(
      tokd: DataFrame,
      ns: Seq[Int] = Seq(2, 3)): DataFrame = {
    require(ns.nonEmpty && ns.forall(_ >= 1), s"ns $ns must be positive")
    val grams = ns.map { n =>
      gramRowsFromToks(tokd, n).withColumn("n", lit(n))
    }.reduce(_ unionByName _)
    grams
      .groupBy("id", "n", "g").agg(count(lit(1)).as("c"))
      .groupBy("id", "n")
      .agg(sum("c").as("total_ngrams"),
        count(lit(1)).as("distinct_ngrams"),
        max("c").as("top_count"))
      .select(col("id"), col("n"),
        col("total_ngrams"), col("distinct_ngrams"),
        (lit(1.0) - col("distinct_ngrams").cast("double") /
          col("total_ngrams").cast("double")).as("dup_frac"),
        (col("top_count").cast("double") /
          col("total_ngrams").cast("double")).as("top_frac"))
  }

  /** Corpus-level boilerplate coverage: an n-gram appearing in at least
    * `minDf` DISTINCT documents is boilerplate; a document's coverage is
    * the fraction of its token positions lying inside at least one
    * boilerplate n-gram occurrence (interval union over [pos, pos+n)).
    * Output: (id, tok_len, covered_tokens, boilerplate_frac) — every
    * document appears, zero-covered ones included, so the result joins
    * directly into a keep/drop gate.
    *
    * Scale shape: df counting aggregates DISTINCT (id, g) rows — map-side
    * partial dedup bounds a repetitive document's contribution before the
    * shuffle — and only grams at df >= minDf survive into the left-semi
    * probe (broadcast-sized for realistic thresholds: boilerplate is by
    * definition a small fraction of the gram vocabulary). Position
    * expansion multiplies FLAGGED occurrences only by n, then collapses
    * per document. No all-pairs stage anywhere; everything keys on g or
    * id.
    */
  def boilerplateCoverage(
      docs: DataFrame,
      n: Int = 3,
      minDf: Int = 5,
      idCol: String = "id",
      contentCol: String = "content"): DataFrame =
    boilerplateCoverageFromToks(tokenized(docs, idCol, contentCol), n, minDf)

  /** Boilerplate REMOVAL (the C4/RefinedWeb cleaning transform, not just
    * the score): rebuild each document from the tokens NOT covered by any
    * corpus-frequent n-gram occurrence. Output: (id, tok_len,
    * kept_tokens, cleaned) — cleaned is the kept tokens re-joined in
    * order; a fully-boilerplate document comes out empty (kept_tokens 0),
    * ready for a length gate downstream. Token-space transform by design:
    * the tokenizer is lossy, so `cleaned` is normalized text, which is
    * what a training pipeline feeds the tokenizer anyway.
    *
    * Scale shape: the flagged-position set is computed exactly as in
    * [[boilerplateCoverageFromToks]]; the anti-join cutting covered
    * positions keys on (id, pos), and reassembly is one id-keyed
    * aggregate whose per-group payload is the document's own token list —
    * linear, skew bounded by document length.
    */
  def boilerplateStrip(
      docs: DataFrame,
      n: Int = 3,
      minDf: Int = 5,
      idCol: String = "id",
      contentCol: String = "content"): DataFrame =
    boilerplateStripFromToks(tokenized(docs, idCol, contentCol), n, minDf)

  /** [[boilerplateStrip]] over an existing (id, toks) frame. */
  def boilerplateStripFromToks(
      tokd: DataFrame,
      n: Int = 3,
      minDf: Int = 5): DataFrame = {
    require(n >= 1 && minDf >= 2, s"need n >= 1, minDf >= 2 (got n=$n, minDf=$minDf)")
    val rows = gramRowsFromToks(tokd, n).persist(StorageLevel.MEMORY_ONLY)
    val boiler = rows.select("id", "g").distinct()
      .groupBy("g").agg(count(lit(1)).as("df"))
      .filter(col("df") >= minDf)
      .select("g")
    val covered = rows.join(boiler, Seq("g"), "left_semi")
      .select(col("id"), explode(sequence(col("pos"), col("pos") + lit(n - 1))).as("p"))
      .distinct()
    val kept = tokd
      .select(col("id"), posexplode(col("toks")).as(Seq("p", "tok")))
      .join(covered, Seq("id", "p"), "left_anti")
    val rebuilt = kept.groupBy("id").agg(
      count(lit(1)).as("kept_tokens"),
      concat_ws(" ", transform(
        array_sort(collect_list(struct(col("p"), col("tok")))),
        s => s.getField("tok"))).as("cleaned"))
    tokd
      .select(col("id"), size(col("toks")).as("tok_len"))
      .join(rebuilt, Seq("id"), "left")
      .select(col("id"), col("tok_len"),
        coalesce(col("kept_tokens"), lit(0L)).as("kept_tokens"),
        coalesce(col("cleaned"), lit("")).as("cleaned"))
  }

  /** Duplicated-span removal with keep-first semantics (the ExactSubstr
    * dedup of Lee et al. 2022, "Deduplicating Training Data Makes
    * Language Models Better", approximated at fixed k-token span
    * granularity): a k-token span occurring more than once in the corpus
    * keeps only its globally FIRST occurrence — first in (id, pos)
    * order — and the tokens covered by every later occurrence are cut,
    * documents rebuilt from what remains. Output matches
    * [[boilerplateStrip]]: (id, tok_len, kept_tokens, cleaned).
    *
    * Distinct from [[boilerplateStrip]] in two ways: the trigger is ANY
    * repeat (df >= 2, not a frequency threshold), and one canonical copy
    * of each duplicated span always survives — the corpus keeps the
    * information, it just stops repeating it, which is the training-data
    * semantics (memorization comes from the repeats, not the content).
    *
    * Scale shape: the first-occurrence pass is ONE keyed aggregation on
    * g with map-side combine (min/count collapse a hot span's
    * occurrences within each partition before the shuffle — a span
    * repeated a million times contributes one row per task). The
    * occurrence⋈first join keys on g against a one-row-per-duplicated-
    * gram frame; position expansion multiplies non-first duplicated
    * occurrences only by k; cutting and reassembly are (id, pos)/id
    * keyed exactly as in [[boilerplateStripFromToks]]. No windows over
    * unbounded groups, no all-pairs stage.
    */
  def spanDedup(
      docs: DataFrame,
      k: Int = 5,
      idCol: String = "id",
      contentCol: String = "content"): DataFrame =
    spanDedupFromToks(tokenized(docs, idCol, contentCol), k)

  /** [[spanDedup]] over an existing (id, toks) frame. */
  def spanDedupFromToks(tokd: DataFrame, k: Int = 5): DataFrame = {
    require(k >= 1, s"need k >= 1 (got k=$k)")
    // gram rows feed the first-occurrence aggregate AND the occurrence
    // probe; persist for the same reason boilerplateStrip does
    val rows = gramRowsFromToks(tokd, k).persist(StorageLevel.MEMORY_ONLY)
    val first = rows
      .groupBy("g")
      .agg(min(struct(col("id"), col("pos"))).as("f"), count(lit(1)).as("occ"))
      .filter(col("occ") > 1)
      .select(col("g"), col("f.id").as("fid"), col("f.pos").as("fpos"))
    val covered = rows.join(first, Seq("g"))
      .filter(!(col("id") === col("fid") && col("pos") === col("fpos")))
      .select(col("id"),
        explode(sequence(col("pos"), col("pos") + lit(k - 1))).as("p"))
      .distinct()
    val kept = tokd
      .select(col("id"), posexplode(col("toks")).as(Seq("p", "tok")))
      .join(covered, Seq("id", "p"), "left_anti")
    val rebuilt = kept.groupBy("id").agg(
      count(lit(1)).as("kept_tokens"),
      concat_ws(" ", transform(
        array_sort(collect_list(struct(col("p"), col("tok")))),
        s => s.getField("tok"))).as("cleaned"))
    tokd
      .select(col("id"), size(col("toks")).as("tok_len"))
      .join(rebuilt, Seq("id"), "left")
      .select(col("id"), col("tok_len"),
        coalesce(col("kept_tokens"), lit(0L)).as("kept_tokens"),
        coalesce(col("cleaned"), lit("")).as("cleaned"))
  }

  /** CCNet-style PARAGRAPH dedup (Wenzek et al. 2019 §4.1: "we remove
    * duplicated paragraphs" corpus-wide before language modeling): split
    * each document on `sep`, keep only the globally FIRST occurrence of
    * every distinct paragraph (order: lowest (id, pos)), reassemble the
    * survivors per document in original order. Differs from [[spanDedup]]
    * in its unit — whole separator-delimited paragraphs, not overlapping
    * k-gram spans — which is the cheap form boilerplate headers/footers
    * actually dedupe under.
    *
    * Scale shape: one explode to (id, pos, par) rows, one keyed
    * (paragraph) aggregation for the first-occurrence winner (the
    * min(struct(id,pos)) argmin — map-side combinable), and a per-doc
    * ordered reassembly bounded by the document's own paragraph count.
    * Never all-pairs, no corpus-wide window.
    *
    * Output: (id, n_pars, kept_pars, cleaned) — documents whose every
    * paragraph lost keep a row with empty `cleaned`.
    */
  def paragraphDedup(
      docs: DataFrame,
      sep: String = "\n",
      idCol: String = "id",
      contentCol: String = "content"): DataFrame = {
    // persisted: the exploded frame feeds BOTH the argmin pass and the
    // per-doc paragraph counts — without it the (possibly expensive)
    // content derivation upstream runs twice (measured 4.2 -> 2.4s on the
    // sf0.1 bench, where content is a synthesized column)
    val pars = docs
      .select(col(idCol).as("id"),
        posexplode(split(col(contentCol), java.util.regex.Pattern.quote(sep)))
          .as(Seq("pos", "par")))
      .filter(trim(col("par")) =!= "")
      .persist(StorageLevel.MEMORY_ONLY)
    val counts = pars.groupBy("id").agg(count(lit(1)).as("n_pars"))
    // global argmin per paragraph: the ONLY shuffle keyed on content
    val kept = pars
      .groupBy("par")
      .agg(min(struct(col("id"), col("pos"))).as("f"))
      .select(col("f.id").as("id"), col("f.pos").as("pos"), col("par"))
    val rebuilt = kept
      .groupBy("id")
      .agg(count(lit(1)).as("kept_pars"),
        array_join(array_sort(collect_list(struct(col("pos"), col("par"))))
          .getField("par"), sep).as("cleaned"))
    // id-only probe of docs: column pruning keeps the content derivation
    // out of this branch entirely (zero-paragraph docs still get a row)
    docs.select(col(idCol).as("id"))
      .join(counts, Seq("id"), "left")
      .join(rebuilt, Seq("id"), "left")
      .select(col("id"),
        coalesce(col("n_pars"), lit(0L)).as("n_pars"),
        coalesce(col("kept_pars"), lit(0L)).as("kept_pars"),
        coalesce(col("cleaned"), lit("")).as("cleaned"))
  }

  /** [[boilerplateCoverage]] over an existing (id, toks) frame. */
  def boilerplateCoverageFromToks(
      tokd: DataFrame,
      n: Int = 3,
      minDf: Int = 5): DataFrame = {
    require(n >= 1 && minDf >= 2, s"need n >= 1, minDf >= 2 (got n=$n, minDf=$minDf)")
    // the gram rows feed BOTH the df pass and the semi-join probe; without
    // the persist the tokenize + explode scan runs twice (Dedup precedent:
    // shingleSets persists for the same reason)
    val rows = gramRowsFromToks(tokd, n).persist(StorageLevel.MEMORY_ONLY)
    val boiler = rows.select("id", "g").distinct()
      .groupBy("g").agg(count(lit(1)).as("df"))
      .filter(col("df") >= minDf)
      .select("g")
    val covered = rows.join(boiler, Seq("g"), "left_semi")
      .select(col("id"), explode(sequence(col("pos"), col("pos") + lit(n - 1))).as("p"))
      .distinct()
      .groupBy("id").agg(count(lit(1)).as("covered_tokens"))
    tokd
      .select(col("id"), size(col("toks")).as("tok_len"))
      .join(covered, Seq("id"), "left")
      .select(col("id"), col("tok_len"),
        coalesce(col("covered_tokens"), lit(0L)).as("covered_tokens"),
        when(col("tok_len") === 0, lit(0.0)).otherwise(
          coalesce(col("covered_tokens"), lit(0L)).cast("double") /
            col("tok_len").cast("double")).as("boilerplate_frac"))
  }

  /** The stopwords Gopher's "contains required words" rule checks for. */
  val GopherRequiredStops: Seq[String] =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  /** The full Gopher document-quality rule gate (Rae et al. 2021 §A1.1) —
    * per-document pass/fail flags for each rule plus the conjunction,
    * complementing [[repetitionSignals]] (the repetition half of the same
    * appendix) and the blended
    * [[graft.functions.TextFunctions.qualityScore]]:
    *
    *  1. word count within [minWords, maxWords]
    *  2. mean word length within [3, 10]
    *  3. symbol-to-word ratio (`#` chars + `...` occurrences) ≤ 0.1
    *  4. fraction of lines starting with a bullet (•, -, *) ≤ 0.9
    *  5. fraction of lines ending with an ellipsis ≤ 0.3
    *  6. fraction of words containing an alphabetic character ≥ 0.8
    *  7. at least 2 distinct words from [[GopherRequiredStops]]
    *
    * Words are whitespace-split (the paper's definition — NOT the engine
    * tokenizer, which drops 1-char words the length stats need). Entirely
    * narrow per-row column work: no shuffle, no UDF, whole-stage codegen.
    */
  def gopherRules(
      docs: DataFrame,
      minWords: Int = 50,
      maxWords: Int = 100000,
      idCol: String = "id",
      contentCol: String = "content"): DataFrame = {
    val text = col(contentCol)
    val words = filter(split(text, "\\s+"), w => length(w) > 0)
    val lines = filter(transform(split(text, "\n"), l => trim(l)), l => length(l) > 0)
    val nW = size(words).cast("long")
    val nL = size(lines).cast("long")
    val meanLen = when(nW === 0, lit(0.0)).otherwise(
      aggregate(words, lit(0L), (acc, w) => acc + length(w)).cast("double") / nW)
    val nHash = (length(text) - length(regexp_replace(text, "#", ""))).cast("long")
    val nEll = ((length(text) -
      length(regexp_replace(text, "\\.\\.\\.", ""))) / 3).cast("long")
    val symbolRatio = when(nW === 0, lit(0.0)).otherwise(
      (nHash + nEll).cast("double") / nW)
    val bulletFrac = when(nL === 0, lit(0.0)).otherwise(
      size(filter(lines, l =>
        l.startsWith("•") || l.startsWith("- ") || l.startsWith("* ")))
        .cast("double") / nL)
    val ellipsisFrac = when(nL === 0, lit(0.0)).otherwise(
      size(filter(lines, l => l.endsWith("..."))).cast("double") / nL)
    val alphaFrac = when(nW === 0, lit(0.0)).otherwise(
      size(filter(words, w => w.rlike("[a-zA-Z]"))).cast("double") / nW)
    val nStops = size(array_intersect(
      transform(words, w => lower(w)),
      array(GopherRequiredStops.map(lit): _*))).cast("long")
    docs.select(
        col(idCol).as("id"), nW.as("n_words"), meanLen.as("mean_word_len"),
        symbolRatio.as("symbol_ratio"), bulletFrac.as("bullet_frac"),
        ellipsisFrac.as("ellipsis_frac"), alphaFrac.as("alpha_frac"),
        nStops.as("n_req_stops"))
      .withColumn("pass_words",
        col("n_words") >= minWords && col("n_words") <= maxWords)
      .withColumn("pass_meanlen",
        col("mean_word_len") >= 3.0 && col("mean_word_len") <= 10.0)
      .withColumn("pass_symbol", col("symbol_ratio") <= 0.1)
      .withColumn("pass_bullet", col("bullet_frac") <= 0.9)
      .withColumn("pass_ellipsis", col("ellipsis_frac") <= 0.3)
      .withColumn("pass_alpha", col("alpha_frac") >= 0.8)
      .withColumn("pass_stops", col("n_req_stops") >= 2)
      .withColumn("keep",
        col("pass_words") && col("pass_meanlen") && col("pass_symbol") &&
          col("pass_bullet") && col("pass_ellipsis") && col("pass_alpha") &&
          col("pass_stops"))
  }

  /** The C4 cleaning gate (Raffel et al. 2020 §2.2) — the line-level and
    * page-level web-cleanup rules that produced C4 from Common Crawl,
    * complementing [[gopherRules]] (which judges whole documents but never
    * rewrites them):
    *
    *  - LINE filter: keep only lines that end in a terminal punctuation
    *    mark (`.`, `!`, `?`, or a closing quote) AND contain at least
    *    `minLineWords` whitespace-separated words. `cleaned` is the
    *    surviving lines rejoined with newlines.
    *  - PAGE filters: drop pages whose CLEANED text has fewer than
    *    `minSentences` sentences (runs of `[.!?]+`), pages containing the
    *    placeholder phrase "lorem ipsum", and pages containing `{` (the
    *    paper's code-page heuristic).
    *
    * The paper's bad-word-list rule is intentionally not reproduced (no
    * embedded word list in this engine); its line-level dedup is covered
    * corpus-wide by [[paragraphDedup]]/[[spanDedup]].
    *
    * Entirely narrow per-row column work — no shuffle, no UDF. The line
    * analysis runs as ONE native expression per row
    * ([[graft.functions.TextExpressions.C4LineStats]]): the declarative
    * `filter(transform(split...))` form is a CSE-exempt lambda HOF that
    * projection collapse re-inlines into all seven consuming outputs —
    * measured 3.1 s vs 0.6 s at sf0.1 for identical semantics. Like
    * [[gopherRules]] this emits every signal, not just `keep`, so a
    * downstream gate (or the oracle hash) sees each rule's arithmetic.
    */
  def c4Rules(
      docs: DataFrame,
      minLineWords: Int = 5,
      minSentences: Int = 3,
      idCol: String = "id",
      contentCol: String = "content"): DataFrame = {
    val text = col(contentCol)
    val st = graft.functions.TextExpressions.c4LineStats(text, minLineWords)
    val stage = docs.select(
      col(idCol).as("id"),
      st.getField("n_lines").as("n_lines"),
      st.getField("n_kept").as("n_kept"),
      st.getField("cleaned").as("cleaned"),
      lower(text).contains("lorem ipsum").as("has_lorem"),
      text.contains("{").as("has_brace"))
    stage
      .withColumn("kept_frac",
        when(col("n_lines") === 0, lit(0.0)).otherwise(
          col("n_kept").cast("double") / col("n_lines").cast("double")))
      .withColumn("n_sentences",
        size(regexp_extract_all(col("cleaned"), lit("[.!?]+"), lit(0))).cast("long"))
      .withColumn("keep",
        col("n_sentences") >= minSentences && !col("has_lorem") && !col("has_brace"))
      .select("id", "n_lines", "n_kept", "kept_frac", "n_sentences",
        "has_lorem", "has_brace", "keep", "cleaned")
  }

  /** Lexical-diversity signals — type-token ratio and hapax fraction, the
    * vocabulary-richness quality cues (template/spam pages repeat a tiny
    * vocabulary; TTR near 1 with high hapax share marks word-salad):
    * per-document `n_tokens`, `n_types`, `n_hapax` (types occurring once
    * in the document), `ttr = types/tokens`, `hapax_frac = hapax/types`.
    *
    * Shape: one explode + (id, term) keyed count + per-id aggregate —
    * map-side combine collapses within-document repeats before either
    * shuffle, so shuffled rows ≈ distinct (doc, term) pairs, the same
    * contract as [[graft.operators.Keywords]]. Zeroed ratios for empty
    * docs (kept: a gate must see every document).
    */
  def lexicalDiversity(
      docs: DataFrame,
      idCol: String = "id",
      contentCol: String = "content"): DataFrame = {
    val tokd = tokenized(docs, idCol, contentCol)
    val tf = tokd.select(col("id"), explode(col("toks")).as("term"))
      .groupBy("id", "term").agg(count(lit(1)).as("tf"))
    val agg = tf.groupBy("id").agg(
      sum(col("tf")).as("n_tokens"),
      count(lit(1)).as("n_types"),
      sum(when(col("tf") === 1, 1L).otherwise(0L)).as("n_hapax"))
    tokd.select(col("id")).join(agg, Seq("id"), "left")
      .select(col("id"),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        coalesce(col("n_types"), lit(0L)).as("n_types"),
        coalesce(col("n_hapax"), lit(0L)).as("n_hapax"))
      .withColumn("ttr",
        when(col("n_tokens") === 0, lit(0.0)).otherwise(
          col("n_types").cast("double") / col("n_tokens").cast("double")))
      .withColumn("hapax_frac",
        when(col("n_types") === 0, lit(0.0)).otherwise(
          col("n_hapax").cast("double") / col("n_types").cast("double")))
  }

  /** Flesch readability statistics — reading-ease and grade-level scores
    * from a deterministic syllable heuristic (runs of `[aeiouy]+` per
    * token, minimum 1), the lightweight fluency signal quality pipelines
    * put next to [[gopherRules]]/[[qualityScore]]-style gates.
    *
    * Tokens come from the engine tokenizer (casefolded `[a-z0-9_]{2,}`)
    * so the syllable regex sees canonical lowercase words; sentences are
    * runs of `[.!?]+` in the raw text (minimum 1 — headlines score as one
    * sentence, not a division by zero). Documents with no tokens emit
    * zeroed scores rather than NaN. All ratios divide exact integer
    * counts, so both sides of an oracle compute identical doubles.
    * Narrow per-row column work: no shuffle, no UDF.
    */
  def readability(
      docs: DataFrame,
      idCol: String = "id",
      contentCol: String = "content"): DataFrame = {
    val text = col(contentCol)
    val toks = tokens(text)
    val nWords = size(toks).cast("long")
    val nSyll = aggregate(toks, lit(0L), (acc, w) =>
      acc + greatest(size(regexp_extract_all(w, lit("[aeiouy]+"), lit(0))).cast("long"), lit(1L)))
    val nSent = greatest(size(regexp_extract_all(text, lit("[.!?]+"), lit(0))), lit(1))
      .cast("long")
    val base = docs.select(col(idCol).as("id"), nWords.as("n_words"),
      nSyll.as("n_syllables"), nSent.as("n_sentences"))
    val wps = col("n_words").cast("double") / col("n_sentences").cast("double")
    val spw = col("n_syllables").cast("double") / col("n_words").cast("double")
    base
      .withColumn("flesch",
        when(col("n_words") === 0, lit(0.0)).otherwise(
          round(lit(206.835) - lit(1.015) * wps - lit(84.6) * spw, 6)))
      .withColumn("fk_grade",
        when(col("n_words") === 0, lit(0.0)).otherwise(
          round(lit(0.39) * wps + lit(11.8) * spw - lit(15.59), 6)))
  }
}
