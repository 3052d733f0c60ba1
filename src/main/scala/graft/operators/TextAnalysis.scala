package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.Par
import graft.functions.TextFunctions._
import graft.sources.Tables

/** Text-analysis operators for training-data pipelines (SURVEY.md
  * §2.F): language-profile scoring, quality scoring, token counting,
  * fingerprinting, and the multimodal binary-column plumbing. All
  * narrow per-row transforms — linear scale, no shuffles except the
  * final presentation sort.
  */
object TextAnalysis {

  /** Vocabulary profiles for the n-gram/stopword language-ID
    * heuristic. The synthetic corpus shares one word pool across its
    * `lang` labels, so profiles are defined over that pool; on real
    * data these would be per-language stopword lists.
    */
  val Profiles: Seq[(String, Seq[String])] = Seq(
    "exec"    -> Seq("spark", "batch", "stream", "window", "join", "agg", "merge", "fast", "slow"),
    "query"   -> Seq("query", "scan", "filter", "sort", "group", "order"),
    "storage" -> Seq("table", "row", "column", "part", "key", "value", "hash"))

  /** Stopword set for quality scoring (stand-in for english stopwords
    * over the synthetic vocabulary).
    */
  val Stopwords: Seq[String] = Seq("a", "the", "data", "table", "row", "value")

  /** One profile's round4 overlap score for a text column — THE
    * lang_id scoring expression, shared with the curation funnel's
    * language gate so the two can never drift (both oracles spell
    * this same tree).
    */
  private[operators] def profileScore(text: Column, words: Seq[String]): Column = {
    val toks = array_distinct(tokens(text))
    Par.round4(size(array_intersect(toks, array(words.map(lit): _*))).cast("double")
      / size(toks))
  }

  /** Composite quality — THE quality_score formula (0.4·length +
    * 0.3·(1−stop) + 0.3·word-len terms, round4), shared with the
    * curation funnel's quality gate.
    */
  private[operators] def compositeQuality(text: Column): Column = {
    val toks = tokens(text)
    val words = size(toks)
    val stopRatio = size(array_intersect(array_distinct(toks),
      array(Stopwords.map(lit): _*))).cast("double") / size(array_distinct(toks))
    val avgWordLen = (length(text) - (words - 1)).cast("double") / words
    Par.round4(lit(0.4) * least(words.cast("double") / 100.0, lit(1.0))
      + lit(0.3) * (lit(1.0) - stopRatio)
      + lit(0.3) * least(avgWordLen / 10.0, lit(1.0)))
  }

  /** Argmax label over the three profile scores with the fixed-order
    * tie-break (CASE chain — portable to the oracle): THE
    * predicted-language spelling, shared by [[langId]] and the mixed
    * training-prep stratifier (Pack.trainPrepMixed) so the two cannot
    * drift.
    */
  private[operators] def predictedLang(sExec: Column, sQuery: Column,
      sStorage: Column): Column =
    when(sExec >= sQuery && sExec >= sStorage, "exec")
      .when(sQuery >= sStorage, "query")
      .otherwise("storage")

  /** Profile overlap scores + argmax label — the structure of an
    * n-gram language identifier, deterministic for the oracle.
    */
  def langId(spark: SparkSession, dir: String): DataFrame = {
    val scored = Tables.documents(spark, dir)
      .select(col("doc_id") +: Profiles.map { case (name, words) =>
        profileScore(col("text"), words).as(s"s_$name")
      }: _*)
    val predicted =
      predictedLang(col("s_exec"), col("s_query"), col("s_storage"))
    scored
      .select(col("doc_id") +: predicted.as("predicted") +:
        Profiles.map { case (n, _) => col(s"s_$n") }: _*)
      .orderBy(col("doc_id"))
  }

  /** Length / punctuation-ratio / stopword-ratio quality scoring —
    * the heuristics a pretraining cleaner applies per document.
    */
  def qualityScore(spark: SparkSession, dir: String): DataFrame = {
    val toks = tokens(col("text"))
    val chars = length(col("text"))
    val words = size(toks)
    val stop = size(array_intersect(array_distinct(toks),
      array(Stopwords.map(lit): _*)))
    val punct = length(regexp_replace(col("text"), "[^.,;:!?]", ""))
    // ratios feeding `quality` stay UNrounded: composing already-rounded
    // 4-decimal values lands systematically on .00005 round boundaries
    // where Spark (decimal-string HALF_UP) and DuckDB (binary) disagree
    val stopRatio = stop.cast("double") / size(array_distinct(toks))
    val avgWordLen = (chars - (words - 1)).cast("double") / words
    Tables.documents(spark, dir)
      .select(col("doc_id"), chars.cast("long").as("chars"), words.cast("long").as("words"),
        // empty-text guard: x/0 is NULL in Spark but inf in DuckDB
        Par.round4(when(chars === 0, 0.0)
          .otherwise(punct.cast("double") / chars)).as("punct_ratio"),
        Par.round4(stopRatio).as("stop_ratio"),
        Par.round4(avgWordLen).as("avg_word_len"),
        compositeQuality(col("text")).as("quality"))
      .orderBy(col("doc_id"))
  }

  /** Whitespace + BPE-ish regex token counts. */
  def tokenCount(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"),
        size(tokens(col("text"))).cast("long").as("ws_tokens"),
        regexp_count(col("text"), lit("[a-z]+|[0-9]+")).cast("long").as("bpe_ish_tokens"),
        length(col("text")).cast("long").as("chars"))
      .orderBy(col("doc_id"))

  /** Min-shingle rolling fingerprint: the lexicographic minimum of
    * the document's 3-shingle md5s plus its distinct-shingle count —
    * a locality-sensitive document signature.
    */
  def docFingerprint(spark: SparkSession, dir: String): DataFrame = {
    val sh = shingles(col("text"), 3)
    Tables.documents(spark, dir)
      .where(size(tokens(col("text"))) >= 3)
      .select(col("doc_id"),
        array_min(transform(sh, s => md5(s))).as("fingerprint"),
        size(sh).cast("long").as("n_shingles"))
      .orderBy(col("doc_id"))
  }

  /** Input validation as a data-quality filter — the batch twin of
    * validate_request_data (core/views.py:119: reject empty questions
    * and length > 1000), extended with a minimum-token gate. Produces
    * (doc_id, valid, reason) for downstream filtering or quarantine.
    */
  def validateDocs(spark: SparkSession, dir: String,
                   maxChars: Int = 1000, minTokens: Int = 3): DataFrame = {
    val reason = when(trim(col("text")) === "", "empty")
      .when(length(col("text")) > maxChars, "too_long")
      .when(size(tokens(col("text"))) < minTokens, "too_short")
      .otherwise("ok")
    Tables.documents(spark, dir)
      .select(col("doc_id"), reason.as("reason"))
      .withColumn("valid", col("reason") === "ok")
      .select(col("doc_id"), col("valid"), col("reason"))
      .orderBy(col("doc_id"))
  }

  /** Text normalization for the cleaning stage of a pretraining
    * pipeline: lowercase, strip non [a-z0-9 ] characters, collapse
    * whitespace runs, trim. Pure narrow transform; `changed` flags
    * rows the cleaner touched.
    */
  def cleanText(spark: SparkSession, dir: String,
                sorted: Boolean = true): DataFrame = {
    val cleaned = trim(regexp_replace(
      regexp_replace(lower(col("text")), "[^a-z0-9 ]", " "), " +", " "))
    Present.presented(
      Tables.documents(spark, dir)
        .select(col("doc_id"), cleaned.as("clean_text"),
          (cleaned =!= col("text")).as("changed")),
      sorted, "doc_id")
  }

  /** Multimodal binary-column plumbing: documents carried as opaque
    * `binary` payloads with typed metadata extraction. The real
    * decode (image/audio libs) is STUBBED as a deterministic
    * md5-derived fake (this container has no codec libraries —
    * SURVEY.md §2.F); the Spark-side schema, payload handling and
    * metadata columns are real.
    */
  def multimodalMeta(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("text").cast("binary").as("payload"), col("text"))
      .select(col("doc_id"),
        octet_length(col("payload")).cast("long").as("byte_len"),
        substring(col("text"), 1, 4).as("magic"),
        // STUB decode: deterministic fake dimensions in place of a codec
        (md5Long(col("text"), 1, 4) % 1920).as("fake_width"),
        (md5Long(col("text"), 5, 4) % 1080).as("fake_height"))
      .orderBy(col("doc_id"))

  /** PII patterns a pretraining scrubber redacts. Kept to syntax both
    * regex engines (Java / RE2) treat identically; the email class
    * covers mixed case and the +/_/%/- local-part characters real
    * addresses use (Bob+tag@Example.com must not survive scrubbing).
    */
  val PiiPatterns: Seq[(String, String)] = Seq(
    "email" -> "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}",
    "phone" -> "[0-9]{3}-[0-9]{3}-[0-9]{4}")

  /** PII scrubbing — redact emails/phone numbers, count redactions.
    * The synthetic corpus has no PII, so every 11th doc gets a
    * deterministic injected contact line (mirrored in the oracle):
    * the operator must both find the injected PII and leave every
    * other document untouched. Narrow per-row transform.
    */
  def piiScrub(spark: SparkSession, dir: String,
               sorted: Boolean = true): DataFrame = {
    val injected = when(col("doc_id") % 11 === 0,
      concat(col("text"), lit(" contact bob@example.com or 555-123-4567")))
      .otherwise(col("text"))
    val scrubbed = PiiPatterns.foldLeft(injected) { case (c, (_, pat)) =>
      regexp_replace(c, pat, "[REDACTED]")
    }
    // count markers in the OUTPUT, not matches in the input: with
    // overlapping patterns (phone inside an email) sequential
    // replacement performs fewer redactions than the per-pattern
    // pre-scrub match counts would claim
    val nRedactions =
      size(regexp_extract_all(scrubbed, lit("\\[REDACTED\\]"), lit(0))).cast("long")
    Present.presented(
      Tables.documents(spark, dir)
        .select(col("doc_id"), scrubbed.as("scrubbed_text"),
          nRedactions.as("n_redactions")),
      sorted, "doc_id")
  }

  /** Intra-document repetition score — the Gopher-style quality
    * signal a pretraining cleaner filters on: the fraction of a
    * doc's word-3-grams that are repeats of an earlier shingle
    * (1 - distinct/total). Reuses the cached natural posting list;
    * the total is pure arithmetic over the token count, so the only
    * shuffle is the posting count's map-side-combined groupBy.
    */
  def repetitionScore(spark: SparkSession, dir: String): DataFrame = {
    val distinctCnt = Dedup.natPosting(spark, dir)
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n_distinct"))
    Tables.documents(spark, dir)
      .select(col("doc_id"),
        greatest(size(tokens(col("text"))) - 2, lit(0)).cast("long").as("n_shingles"))
      .join(distinctCnt, Seq("doc_id"), "left")
      .na.fill(0L, Seq("n_distinct"))
      .select(col("doc_id"), col("n_shingles"), col("n_distinct"),
        when(col("n_shingles") === 0, 0.0)
          .otherwise(Par.round4(lit(1.0)
            - col("n_distinct").cast("double") / col("n_shingles"))).as("rep_ratio"))
      .orderBy(col("doc_id"))
  }

  /** Per-source cap sampling (training-mix balancing): keep at most
    * `cap` docs per source, chosen by deterministic md5 rank — the
    * reproducible way to downsample an over-represented source. The
    * bounded TopKAgg keeps the shuffle at cap rows per source per map
    * partition; a row_number window would move every row of the hot
    * source through one partition.
    */
  def stratifiedBalance(spark: SparkSession, dir: String, cap: Int = 400): DataFrame =
    Tables.documents(spark, dir)
      .select(col("source"), col("doc_id"),
        (md5Long(col("doc_id").cast("string"), 1, 8).cast("double") / 4294967296.0).as("u"))
      .groupBy(col("source"))
      .agg(graft.functions.TopK.topK(cap)(col("u"), col("doc_id")).as("top"))
      .select(col("source"), explode(col("top")).as("hit"))
      .select(col("hit.id").as("doc_id"), col("source"),
        Par.round4(col("hit.score")).as("u"))
      .orderBy(col("doc_id"))

  /** Sketch size for [[approxTopTokens]]: error ≤ N/(m+1) of the
    * corpus token stream.
    */
  val HeavyHitterCounters = 256

  /** Approximate corpus-frequent tokens via the mergeable
    * Misra–Gries sketch (functions/FreqSketch) — the vocabulary /
    * boilerplate heavy-hitter report a training-data pipeline runs
    * where an exact token groupBy-count would shuffle the whole
    * distinct vocabulary. Shuffle cost: ≤ m counters per map
    * partition. No DuckDB oracle (merge order shifts the bounded
    * error): rows-only check; TextOpsSpec asserts the sketch
    * guarantee against exact counts.
    */
  def approxTopTokens(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(explode(tokens(lower(col("text")))).as("tok"))
      .where(col("tok") =!= "")
      .agg(graft.functions.FreqSketch.heavyHitters(HeavyHitterCounters)(col("tok")).as("hh"))
      .select(explode(col("hh")).as("h"))
      .select(col("h.item").as("token"), col("h.count").as("est_count"),
        col("h.err").as("err"))
      .orderBy(col("est_count").desc, col("token"))
      .limit(20)

  /** EXACT corpus token frequencies, top-N — [[approxTopTokens]]'s
    * ground-truth twin. Same tokenization (lowercased whitespace
    * split), but a full explode + hash-aggregate: the map side
    * partial-aggregates per partition, so the shuffle carries one row
    * per (partition, distinct token), not one per token instance.
    * Run this when the vocabulary report must be exact (tokenizer
    * training, contamination audits); run the Misra–Gries sketch when
    * a bounded-error answer at a fraction of the shuffle will do —
    * TokenVocabSpec proves the sketch honest against this truth.
    */
  def tokenVocab(spark: SparkSession, dir: String, topN: Int = 50): DataFrame = {
    require(topN > 0, s"topN must be positive, got $topN")
    Tables.documents(spark, dir)
      .select(explode(tokens(lower(col("text")))).as("token"))
      .where(col("token") =!= "")
      .groupBy("token")
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("token"))
      .limit(topN)
  }

  /** [[tokenVocab]] parameterized by a pluggable
    * [[graft.functions.Tokenizer]] — the vocabulary report in the
    * units the trainer counts in (subword types under a BPE
    * artifact). Same conventions as the columnar path: text is
    * lowercased before tokenization and empty tokens are dropped, so
    * the whitespace stub reproduces tokenVocab exactly (TokenizerSpec
    * pins it). The tokenize seam is per-partition open() + batched
    * calls; downstream stays the same partial hash-aggregate +
    * bounded top-N sort.
    */
  def tokenVocabWith(spark: SparkSession, corpus: DataFrame,
                     tokenizer: graft.functions.Tokenizer,
                     topN: Int = 50): DataFrame = {
    require(topN > 0, s"topN must be positive, got $topN")
    import spark.implicits._
    corpus.select(lower(col("text"))).as[String]
      .mapPartitions { it =>
        val enc = tokenizer.open()   // per-partition artifact load
        it.grouped(tokenizer.batchSize).flatMap { batch =>
          val toks = enc.tokenize(batch)
          require(toks.size == batch.size,
            s"tokenizer returned ${toks.size} sequences for ${batch.size} texts")
          toks.iterator.flatten
        }
      }
      .toDF("token")
      .where(col("token") =!= "")
      .groupBy("token")
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("token"))
      .limit(topN)
  }

  // --- Gopher / MassiveText quality rules ------------------------------

  /** Gopher-rule thresholds (Rae et al. 2021 "Scaling Language Models:
    * Methods, Analysis & Insights from Training Gopher", Table A1),
    * adapted to this corpus's word-fraction spellings: the word-count
    * floor is lowered from Gopher's 50 to 20 (the synthetic docs are
    * 10–110 words), the stopword rule uses [[Stopwords]] in place of
    * Gopher's 8-word english list, and the duplicate-n-gram rule is a
    * token-fraction (1 − distinct/total 5-grams) rather than Gopher's
    * overlap-free character fraction — a deterministic spelling both
    * engines reproduce exactly.
    */
  val GopherMinWords       = 20
  val GopherMaxWords       = 100000
  val GopherMinMeanWordLen = 3.0
  val GopherMaxMeanWordLen = 10.0
  val GopherMinStopwords   = 2
  /** Max fraction of characters inside the most frequent word-n-gram
    * (count × gram length / doc chars; overlapping occurrences all
    * count, as in Gopher, so the raw ratio may exceed 1 on degenerate
    * repetition).
    */
  val GopherTopGramMax: Map[Int, Double] = Map(2 -> 0.20, 3 -> 0.18, 4 -> 0.16)
  /** Max repeated-5-gram token fraction (1 − distinct/total). */
  val GopherDupGramMax = 0.15

  /** Word n-gram list WITH duplicates (one entry per occurrence) —
    * the multiset the Gopher repetition metrics count over;
    * TextFunctions.shingles is its distinct twin. `toks` must be a
    * MATERIALIZED column (not an inlined `split`): HOF lambdas
    * re-evaluate inlined expressions per element, which would turn
    * this linear scan quadratic (TextFunctions.shinglePosting's
    * scaladoc documents the same trap).
    */
  private[graft] def gramsOf(toks: Column, n: Int): Column = {
    val grams = transform(
      sequence(lit(0), size(toks) - n),
      i => concat_ws(" ", (0 until n).map(j => element_at(toks, i + j + 1)): _*))
    // sequence(0, negative) counts DOWN in Spark — guard short docs
    when(size(toks) >= n, filter(grams, g => g =!= ""))
      .otherwise(array().cast("array<string>"))
  }

  /** Largest n-gram "mass" (occurrence count × gram length, maximized
    * over the doc's distinct n-grams) — the HOF spelling (run-length
    * fold over the SORTED n-gram multiset), kept as the independent
    * parity oracle for the native plans.GopherGramStats expression
    * (GopherExprSpec): interpreted HOF lambdas cost ~ms per doc,
    * which benched gopher_filter at 14 s on sf0.1; the production
    * path is the one-pass native expression below.
    */
  private[graft] def topGramMassHof(toks: Column, n: Int): Column = {
    val sorted = array_sort(gramsOf(toks, n))
    val init = struct(lit("").as("prev"), lit(0L).as("run"), lit(0L).as("best"))
    aggregate(sorted, init,
      (acc, g) => {
        val run = when(g === acc("prev"), acc("run") + 1L).otherwise(lit(1L))
        // mass grows monotonically within a run, so folding best at
        // every step (not just at run boundaries) loses nothing
        struct(g.as("prev"), run.as("run"),
          greatest(acc("best"), run * length(g).cast("long")).as("best"))
      },
      acc => acc("best"))
  }

  /** Per-doc Gopher rule metrics + keep verdict over ANY (doc_id,
    * text, lang, n_chars) frame — the composable core [[gopherQuality]]
    * presents and [[gopherFilter]] applies. Entirely narrow (the one
    * `toks` projection feeds every metric, the four gram statistics
    * are ONE native O(L) expression — plans.GopherGramStats), so the
    * operator is a single linear scan at any corpus size.
    */
  private[graft] def gopherMetricsOf(docs: DataFrame): DataFrame = {
    import org.apache.spark.sql.graftBridge
    val base = docs.select(col("doc_id"), col("lang"), col("n_chars"),
      length(col("text")).cast("long").as("chars"),
      tokens(col("text")).as("toks"))
      .withColumn("gs", graftBridge.columnOf(
        graft.plans.GopherGramStats(graftBridge.expressionOf(col("toks")))))
    val words = size(col("toks")).cast("long")
    val mwl = Par.round4(
      (col("chars") - (words - 1)).cast("double") / words.cast("double"))
    val nStop = size(array_intersect(array_distinct(col("toks")),
      array(Stopwords.map(lit): _*))).cast("long")
    def frac(mass: Column): Column =
      when(col("chars") === 0, 0.0)
        .otherwise(Par.round4(mass.cast("double") / col("chars").cast("double")))
    val dup5 = when(words < 5, 0.0).otherwise(Par.round4(lit(1.0)
      - col("gs.d5").cast("double") / (words - 4).cast("double")))
    val m = base.select(col("doc_id"), col("lang"), col("n_chars"),
      words.as("n_words"), mwl.as("mean_word_len"), nStop.as("n_stop"),
      frac(col("gs.top2")).as("top2_frac"),
      frac(col("gs.top3")).as("top3_frac"),
      frac(col("gs.top4")).as("top4_frac"),
      dup5.as("dup5_frac"))
    m.withColumn("keep",
      col("n_words").between(GopherMinWords, GopherMaxWords)
        && col("mean_word_len").between(GopherMinMeanWordLen, GopherMaxMeanWordLen)
        && col("n_stop") >= GopherMinStopwords
        && col("top2_frac") <= GopherTopGramMax(2)
        && col("top3_frac") <= GopherTopGramMax(3)
        && col("top4_frac") <= GopherTopGramMax(4)
        && col("dup5_frac") <= GopherDupGramMax)
  }

  /** Gopher/MassiveText document-quality rule report (Rae et al. 2021,
    * Table A1): per-doc word count, mean word length, stopword
    * presence, top-{2,3,4}-gram character fractions, repeated-5-gram
    * fraction, and the conjunctive keep verdict. The reference's
    * quality gate is a single composite score (core/views.py);
    * this is the rule-per-dimension form a pretraining cleaner audits.
    * One narrow pass, no shuffle except the presentation sort.
    */
  def gopherQuality(spark: SparkSession, dir: String): DataFrame =
    gopherMetricsOf(Tables.documentsSpread(spark, dir))
      .select(col("doc_id"), col("n_words"), col("mean_word_len"),
        col("n_stop"), col("top2_frac"), col("top3_frac"),
        col("top4_frac"), col("dup5_frac"), col("keep"))
      .orderBy(col("doc_id"))

  /** [[gopherQuality]]'s apply form: the surviving corpus (the docs a
    * MassiveText-style cleaner passes to the next pipeline stage).
    */
  def gopherFilter(spark: SparkSession, dir: String,
                   sorted: Boolean = true): DataFrame =
    Present.presented(
      gopherMetricsOf(Tables.documentsSpread(spark, dir))
        .where(col("keep"))
        .select(col("doc_id"), col("lang"), col("n_chars")),
      sorted, "doc_id")

  // --- C4 / FineWeb line-level quality rules ---------------------------

  /** C4 rule parameters (Raffel et al. 2020 "Exploring the Limits of
    * Transfer Learning with a Unified Text-to-Text Transformer",
    * §2.2), adapted to this corpus's scale: the sentence floor drops
    * from C4's 5 to 3 (the synthetic docs are 10–110 words ⇒ 1–10
    * derived lines of [[C4LineWords]] words).
    */
  val C4LineWords    = 12
  val C4MinLineWords = 3
  val C4MinKeptLines = 3
  /** C4's terminal-punctuation line gate: . ! ? or a closing quote. */
  val C4TerminalRe = "[.!?\"]$"

  /** The derived-lines gate corpus for the C4 family. The synthetic
    * documents have no newlines or punctuation, so a naive C4 port is
    * degenerate (every doc is one unpunctuated line and nothing
    * survives); like [[piiScrub]]'s injected contacts and
    * Dedup.dedupParagraph's planted copies, the GATED queries derive a
    * deterministic line structure in their own corpus prep — mirrored
    * exactly in the DuckDB oracle — while the operator itself
    * ([[c4MetricsOf]]) stays pure over any (doc_id, text-with-newlines)
    * frame. Per doc: words split into [[C4LineWords]]-word lines, then
    * per (doc_id, line_idx) coins plant the features each C4 rule
    * fires on — a 2-word degenerate line (id·5+i ≡ 0 mod 9), a
    * "lorem ipsum" prefix on line 0 (id ≡ 0 mod 23), an appended
    * "javascript" token (id·3+i ≡ 0 mod 13), an appended "{" token
    * (id·11+i ≡ 0 mod 29), and terminal punctuation on 3 of 4 lines
    * (id+i ≢ 3 mod 4). One narrow pass — the line array never leaves
    * its row.
    */
  private[graft] def c4DerivedCorpus(spark: SparkSession, dir: String): DataFrame = {
    val lw = C4LineWords
    val base = Tables.documentsSpread(spark, dir)
      .where(length(col("text")) > 0)
      .select(col("doc_id"), split(col("text"), " ").as("t"))
    val id = col("doc_id")
    val lines = transform(
      sequence(lit(0), ((size(col("t")) - 1) / lw).cast("int")),
      i => {
        val words = when((id * 5 + i) % 9 === 0,
          slice(col("t"), i * lw + 1, lit(2)))
          .otherwise(slice(col("t"), i * lw + 1, lit(lw)))
        concat(
          when(id % 23 === 0 && i === 0, "lorem ipsum ").otherwise(""),
          concat_ws(" ", words),
          when((id * 3 + i) % 13 === 0, " javascript").otherwise(""),
          when((id * 11 + i) % 29 === 0, " {").otherwise(""),
          when((id + i) % 4 =!= 3, ".").otherwise(""))
      })
    base.select(col("doc_id"), array_join(lines, "\n").as("text"))
  }

  /** Per-doc C4 line-rule metrics + verdicts over ANY (doc_id, text)
    * frame whose text carries newline-separated lines — the composable
    * core [[c4LineStats]] reports and [[c4Filter]] applies. Line rules
    * (Raffel et al. 2020 §2.2): keep a line iff it ends in terminal
    * punctuation, has ≥ [[C4MinLineWords]] words, and does not mention
    * "javascript". Page rules: drop the page if fewer than
    * [[C4MinKeptLines]] lines survive, if "lorem ipsum" appears, or if
    * it contains a curly brace. Entirely narrow — the split-lines
    * array is consumed by per-row HOFs, so the operator is a single
    * linear scan with no shuffle at any corpus size (the
    * gopher_quality plan shape).
    */
  private[graft] def c4MetricsOf(docs: DataFrame): DataFrame = {
    def lineWords(l: Column): Column = size(split(l, " "))
    def terminal(l: Column): Column = l.rlike(C4TerminalRe)
    def hasJs(l: Column): Column = l.contains("javascript")
    def lineKeep(l: Column): Column =
      terminal(l) && lineWords(l) >= C4MinLineWords && !hasJs(l)
    val base = docs.select(col("doc_id"), col("text"),
      split(col("text"), "\n").as("ls"))
    val kept = filter(col("ls"), l => lineKeep(l))
    base.select(col("doc_id"),
        size(col("ls")).cast("long").as("n_lines"),
        size(kept).cast("long").as("n_kept"),
        size(filter(col("ls"), l => lineWords(l) < C4MinLineWords))
          .cast("long").as("n_short"),
        size(filter(col("ls"), l => !terminal(l))).cast("long").as("n_noterm"),
        size(filter(col("ls"), l => hasJs(l))).cast("long").as("n_js"),
        col("text").contains("lorem ipsum").as("has_lorem"),
        col("text").contains("{").as("has_brace"),
        array_join(kept, "\n").as("clean_text"))
      .withColumn("keep",
        col("n_kept") >= C4MinKeptLines && !col("has_lorem") && !col("has_brace"))
  }

  /** C4 line-rule audit report over the derived-lines gate corpus:
    * per-doc line counts, per-rule violation counts, page-rule flags
    * and the keep verdict — the per-rule form a curation run audits
    * before committing to thresholds.
    */
  def c4LineStats(spark: SparkSession, dir: String): DataFrame =
    c4MetricsOf(c4DerivedCorpus(spark, dir))
      .select(col("doc_id"), col("n_lines"), col("n_kept"), col("n_short"),
        col("n_noterm"), col("n_js"), col("has_lorem"), col("has_brace"),
        col("keep"))
      .orderBy(col("doc_id"))

  /** [[c4LineStats]]'s apply form: surviving pages with their
    * line-filtered text (kept lines re-joined), the corpus a C4-style
    * cleaner hands to the next stage.
    */
  def c4Filter(spark: SparkSession, dir: String,
               sorted: Boolean = true): DataFrame =
    Present.presented(
      c4MetricsOf(c4DerivedCorpus(spark, dir))
        .where(col("keep"))
        .select(col("doc_id"), col("clean_text"), col("n_kept")),
      sorted, "doc_id")

  /** The boilerplate line the FineWeb-dedup gate corpus plants on
    * every 13th doc's first line — the cross-document duplicated-line
    * mass (cookie banners, newsletter prompts) the line-dedup rule
    * exists to remove. Terminal-punctuated and ≥ 3 words, so it
    * passes every C4 LINE rule: line-dedup catches what the quality
    * rules cannot.
    */
  val FinewebBoilerplate = "subscribe to the data stream today."

  /** [[c4DerivedCorpus]] with the planted boilerplate line — the gate
    * corpus of [[finewebLineDedup]] (its own prep, so the c4_* gate
    * outputs stay untouched).
    */
  private[graft] def finewebDerivedCorpus(spark: SparkSession, dir: String): DataFrame =
    c4DerivedCorpus(spark, dir)
      .select(col("doc_id"), split(col("text"), "\n").as("ls"))
      .select(col("doc_id"), array_join(
        when(col("doc_id") % 13 === 0,
          concat(array(lit(FinewebBoilerplate)), slice(col("ls"), lit(2), size(col("ls")))))
          .otherwise(col("ls")), "\n").as("text"))

  /** FineWeb-style corpus-wide exact LINE dedup (Penedo et al. 2024:
    * duplicated-line removal as a quality signal; C4 §2.2's
    * three-sentence-span dedup at line grain): every distinct line
    * keeps its FIRST occurrence corpus-wide (order = (doc_id,
    * line_idx)) and documents are rebuilt from their surviving lines.
    * Scale shape is [[Dedup.dedupParagraph]]'s: the winner per
    * distinct line is a map-side-combined min-struct aggregate on the
    * line hash — a boilerplate line with millions of copies contracts
    * to one row per map partition before any exchange, no winner join,
    * no hot reducer key; rebuild shuffles only surviving lines on
    * doc_id.
    */
  def finewebLineDedup(spark: SparkSession, dir: String,
                       sorted: Boolean = true): DataFrame =
    Present.presented(
      lineDedupOf(finewebDerivedCorpus(spark, dir), committed = None),
      sorted, "doc_id")

  /** The three-line boilerplate BLOCK the span-dedup gate corpus
    * plants at the head of every 17th doc — a nav/footer template
    * repeated across pages, each line individually C4-clean: span
    * dedup removes what neither the line rules nor single-line dedup
    * can (the lines also recur as a BLOCK, which is the signal).
    */
  val C4SpanBoilerplate: Seq[String] = Seq(
    "follow us on the data stream.",
    "subscribe for daily corpus updates.",
    "all rights reserved by the corpus.")

  /** Span length of C4's span-dedup rule ("three-sentence span"). */
  val C4SpanLines = 3

  /** [[c4DerivedCorpus]] with the planted boilerplate block — the
    * gate corpus of [[c4SpanDedup]] (its own prep, so the other c4/
    * fineweb gate outputs stay untouched).
    */
  private[graft] def c4SpanDerivedCorpus(spark: SparkSession, dir: String): DataFrame =
    c4DerivedCorpus(spark, dir)
      .select(col("doc_id"), split(col("text"), "\n").as("ls"))
      .select(col("doc_id"), array_join(
        when(col("doc_id") % 17 === 0,
          concat(array(C4SpanBoilerplate.map(lit): _*), col("ls")))
          .otherwise(col("ls")), "\n").as("text"))

  /** C4's ACTUAL dedup rule (Raffel et al. 2020 §2.2: "we removed
    * all but one of any three-sentence span occurring more than once
    * in the data set"), at line grain over the derived corpus: every
    * occurrence of a duplicated [[C4SpanLines]]-line span EXCEPT the
    * corpus-wide first (order = (doc_id, start_idx)) has its lines
    * removed, and documents are rebuilt from their surviving lines.
    * Overlapping removals union (a line dies if ANY removed
    * occurrence covers it) — the deterministic reading of the rule,
    * mirrored exactly by the oracle.
    *
    * Scale shape: spans are a narrow per-doc array transform (no
    * self-join); the first-occurrence winner is a map-side-combined
    * min-struct aggregate on the span hash — a boilerplate block
    * with millions of copies contracts to one row per map partition
    * before any exchange — and the removal join is hash-partitioned
    * on that same span hash, linear in occurrences. Rebuild shuffles
    * only surviving lines on doc_id.
    */
  def c4SpanDedup(spark: SparkSession, dir: String,
                  sorted: Boolean = true): DataFrame =
    Present.presented(
      c4SpanDedupOf(c4SpanDerivedCorpus(spark, dir)), sorted, "doc_id")

  /** The span-dedup core over ANY (doc_id, text) corpus — the seam
    * the planted-block spec drives with hand-built pages, and (with
    * `committed`) the streaming twin's per-batch body: every span
    * whose md5 is in the `h`-column committed index counts as
    * already-won elsewhere, so ALL its batch occurrences' lines drop
    * (the append-only cross-batch rule); None = the corpus-wide
    * batch run.
    */
  private[graft] def c4SpanDedupOf(corpus: DataFrame,
      committed: Option[DataFrame] = None): DataFrame = {
    val withLs = corpus.select(col("doc_id"), split(col("text"), "\n").as("ls"))
    val lines = withLs
      .select(col("doc_id"), posexplode(col("ls")).as(Seq("line_idx", "line")))
      .withColumn("line_idx", col("line_idx").cast("long"))
    val spans = withLs
      .where(size(col("ls")) >= C4SpanLines)
      .select(col("doc_id"), posexplode(transform(
        sequence(lit(0), size(col("ls")) - C4SpanLines),
        i => array_join(slice(col("ls"), i + 1, lit(C4SpanLines)), "\n")))
        .as(Seq("start_idx", "span")))
      .withColumn("start_idx", col("start_idx").cast("long"))
      .withColumn("h", md5(col("span")))
      .drop("span")
      // consumed by the winner aggregate AND the removal join (and the
      // committed-index joins in the streaming twin): persist so the
      // explode+md5 span derivation runs once per invocation (r17,
      // guide §2.4/§5 — the slate-materialization receipt)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    def linesUnder(occ: DataFrame): DataFrame = occ.select(col("doc_id"),
      explode(sequence(col("start_idx"),
        col("start_idx") + (C4SpanLines - 1))).as("line_idx"))
    // committed spans already won in an earlier batch: every local
    // occurrence is globally non-first, so all of them drop; only
    // FRESH spans play the within-batch first-occurrence rule —
    // with in-doc_id-order batches this reproduces the corpus-wide
    // run exactly (C4StreamSpec pins it)
    val idxH = committed.map(_.select(col("h")).distinct())
    val fresh = idxH.fold(spans)(i => spans.join(i, Seq("h"), "left_anti"))
    val winners = fresh.groupBy(col("h"))
      .agg(min(struct(col("doc_id"), col("start_idx"))).as("w"),
        count(lit(1)).as("occ"))
      .select(col("h"), col("w.doc_id").as("w_doc"),
        col("w.start_idx").as("w_start"), col("occ"))
    val removedWithin = fresh.join(winners, Seq("h"))
      .where(col("occ") > 1 &&
        !(col("doc_id") === col("w_doc") && col("start_idx") === col("w_start")))
    val removed = idxH.map(i => spans.join(i, Seq("h"), "left_semi"))
      .map(c => linesUnder(removedWithin).union(linesUnder(c)))
      .getOrElse(linesUnder(removedWithin))
      .distinct()
    val rebuilt = lines.join(removed, Seq("doc_id", "line_idx"), "left_anti")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_kept"),
        array_join(transform(
          array_sort(collect_list(struct(col("line_idx"), col("line")))),
          p => p("line")), "\n").as("kept_text"))
    corpus
      .select(col("doc_id"), size(split(col("text"), "\n")).cast("long").as("n_lines"))
      .join(rebuilt, Seq("doc_id"), "left")
      .na.fill(0L, Seq("n_kept")).na.fill("", Seq("kept_text"))
      .select(col("doc_id"), col("n_lines"), col("n_kept"), col("kept_text"))
  }

  /** The line-dedup core over ANY (doc_id, text) corpus — ONE
    * spelling shared by the gated batch query and the streaming twin
    * (streaming/C4Stream): explode lines, optionally drop every line
    * whose md5 is in `committed` (an `h`-column frame of line hashes —
    * the stream's frozen cross-batch line index; None for the
    * corpus-wide batch run), keep the
    * min-(doc_id, line_idx) winner per remaining distinct line, and
    * rebuild documents from their surviving lines. Map-side-combined
    * min-struct winner (the dedupParagraph bound: a boilerplate flood
    * contracts to one row per map partition before any exchange);
    * the committed side joins as a line-hash anti-join.
    */
  private[graft] def lineDedupOf(corpus: DataFrame,
      committed: Option[DataFrame]): DataFrame = {
    val lines0 = corpus
      .select(col("doc_id"), posexplode(split(col("text"), "\n"))
        .as(Seq("line_idx", "line")))
      .withColumn("line_idx", col("line_idx").cast("long"))
    val lines = committed.fold(lines0)(idx =>
      lines0.join(idx.select(col("h")).distinct(),
        md5(col("line")) === col("h"), "left_anti"))
    val winners = lines
      .groupBy(md5(col("line")).as("h"))
      .agg(min(struct(col("doc_id"), col("line_idx"), col("line"))).as("w"))
      .select(col("w.doc_id").as("doc_id"), col("w.line_idx").as("line_idx"),
        col("w.line").as("line"))
    val rebuilt = winners.groupBy("doc_id")
      .agg(count(lit(1)).as("n_kept"),
        array_join(transform(
          array_sort(collect_list(struct(col("line_idx"), col("line")))),
          p => p("line")), "\n").as("kept_text"))
    corpus
      .select(col("doc_id"), size(split(col("text"), "\n")).cast("long").as("n_lines"))
      .join(rebuilt, Seq("doc_id"), "left")
      .na.fill(0L, Seq("n_kept")).na.fill("", Seq("kept_text"))
      .select(col("doc_id"), col("n_lines"), col("n_kept"), col("kept_text"))
  }
}
