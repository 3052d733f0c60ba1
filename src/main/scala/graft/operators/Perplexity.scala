package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.DfCache
import graft.functions.Par
import graft.functions.TextFunctions._
import graft.sources.Tables

/** Perplexity-based quality filtering — the CCNet recipe (Wenzek et
  * al. 2019, "CCNet: Extracting High Quality Monolingual Datasets
  * from Web Crawl Data"): score every document by its cross-entropy
  * under an n-gram language model, then split the corpus into
  * head / middle / tail perplexity buckets so a curation pipeline can
  * keep the head, sample the middle, and drop the tail. This is the
  * model-based complement of [[TextAnalysis.qualityScore]]'s
  * closed-form heuristics, and the last major curation stage of a
  * pretraining pipeline the surface was missing (the reference's
  * quality signal is its per-answer rating, core/models.py — a human
  * score; perplexity is the automated stand-in a 100 TB crawl needs).
  *
  * Model: an add-one-smoothed bigram LM,
  * `P(w2 | w1) = (c(w1 w2) + 1) / (c(w1 ·) + V)`, trained by default
  * on the scored corpus itself (self-perplexity: boilerplate and
  * template text land in the head, rare constructions in the tail).
  * [[modelOf]] is public so a caller can train on a curated
  * reference corpus and score a crawl against it — CCNet's actual
  * shape, and the same pluggable-artifact seam as
  * `Pack.mixRatesOf`'s epoch-frozen rate table.
  *
  * Scale shape (the part that must survive 100 TB):
  *   - model build = the word-count pattern: explode to bigrams
  *     (narrow), two partial-aggregated shuffles on (w1,w2) then
  *     (w1); the model table is |distinct bigrams| rows, bounded by
  *     corpus vocabulary, not corpus size.
  *   - scoring = ONE hash join of the bigram stream against the
  *     model (AQE broadcasts it at test scale; at 100 TB it is a
  *     hash join on the bigram key, with a DETERMINISTIC doc-hash
  *     salt spreading Zipfian stopword keys — see [[ScoreSaltWidth]]
  *     for why AQE skew-split alone is not a reliable answer here),
  *     then a map-side-combined groupBy doc_id. Linear, no
  *     self-joins, no windows.
  *   - the per-doc score table is staged (DfCache.stagedFrame), the
  *     detect/apply boundary of every other curation stage here.
  *   - bucket cutoffs are an EXACT percentile over one double per
  *     doc; at 100 TB calibrate on a deterministic md5-coin sample
  *     (`calibFrac`) — the cutoffs are a 2-value epoch artifact, the
  *     same frozen-calibration argument as MixStream's rate table.
  */
object Perplexity {

  /** Documents with ≥ 2 whitespace tokens, tokenized — the corpus a
    * bigram model can see. One spelling shared by the bigram stream
    * and the vocabulary count so the two can never drift.
    */
  private def tokenized(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), tokens(col("text")).as("toks"))
      .where(size(col("toks")) >= 2)

  /** Consecutive-token bigrams, one row per position — zip_with over
    * two slices, so the explode is the only row-expanding step and
    * nothing shuffles.
    */
  private def bigramsOf(docs: DataFrame): DataFrame =
    tokenized(docs).select(col("doc_id"), explode(zip_with(
        slice(col("toks"), lit(1), size(col("toks")) - 1),
        slice(col("toks"), lit(2), size(col("toks")) - 1),
        (a, b) => struct(a.as("w1"), b.as("w2")))).as("bg"))
      .select(col("doc_id"), col("bg.w1").as("w1"), col("bg.w2").as("w2"))

  /** Add-one-smoothed bigram LM over `corpus`: one row per distinct
    * bigram with its count `c12`, its prefix total `c1` (= Σ_w2 c12,
    * so the conditional is properly normalized), and the corpus
    * vocabulary size `v` as a broadcast-scalar column. |vocabulary|²
    * bounds the row count; in practice it is the distinct-bigram
    * count, the classic word-count output size.
    */
  def modelOf(spark: SparkSession, corpus: DataFrame): DataFrame = {
    val bg = bigramsOf(corpus)
    val big = bg.groupBy("w1", "w2").agg(count(lit(1)).as("c12"))
    val uni = big.groupBy("w1").agg(sum("c12").as("c1"))
    val voc = tokenized(corpus)
      .select(explode(col("toks")).as("tok"))
      .agg(count_distinct(col("tok")).as("v"))
    big.join(uni, Seq("w1")).crossJoin(broadcast(voc))
  }

  /** Per-document cross-entropy (nats/bigram) of `corpus` under
    * `model`: join the bigram stream to the model, fold
    * `-Σ ln P(w2|w1) / n` per document. Exposed so a reference-
    * trained model can score a different corpus (the CCNet shape) —
    * which is exactly why the joins are LEFT: a bigram the model
    * never saw takes the smoothed floor (c12 = 0, and c1 = 0 too
    * when even the prefix is novel, so P = 1/V), instead of silently
    * dropping out of the document's average. On the self-trained
    * gate path every bigram is in the model, so left ≡ inner and the
    * oracle's inner-join spelling hashes identically. Plan: one hash
    * join on the bigram key (the data-sized one), one broadcastable
    * join on the vocab-sized prefix table, one broadcast scalar.
    */
  def scoreAgainst(model: DataFrame, corpus: DataFrame): DataFrame =
    rounded(scoreAgainstRaw(model, corpus))

  /** round4 the per-doc mean — the presentation step shared by both
    * scorers; the raw twin exists so PerplexitySpec can measure how
    * far every unrounded score sits from a rounding midpoint (the
    * cross-engine ln-parity receipt).
    */
  private def rounded(raw: DataFrame): DataFrame =
    raw.select(col("doc_id"), col("n_bigrams"),
      Par.round4(col("xent_raw")).as("xent"))

  /** [[scoreAgainst]] before the round4 presentation step — the value
    * both engines compute with their own `ln`; PerplexitySpec asserts
    * its distance to the nearest round4 midpoint is orders of
    * magnitude above cross-engine FP drift, which is the receipt that
    * rounding cannot flip a digit between Spark and the oracle.
    * Measured across sf0.001/sf0.01/sf0.1 + the 8× rung for all
    * three scorers: minimum midpoint distance 1.59e-10, vs a drift
    * bound of ~1e-13 (n_bigrams × accumulated ulp through ln and the
    * differently-ordered sum) — ≥ 3 orders of headroom, spec floor
    * 1e-11.
    */
  private[graft] def scoreAgainstRaw(model: DataFrame, corpus: DataFrame): DataFrame =
    saltedBigrams(corpus)
      .join(saltedModel(model.select("w1", "w2", "c12")),
        Seq("w1", "w2", "salt"), "left")
      .join(saltedModel(prefixOf(model)), Seq("w1", "salt"), "left")
      .crossJoin(broadcast(scalarsOf(model)))
      .select(col("doc_id"),
        log((coalesce(col("c12"), lit(0L)) + 1.0)
          / (coalesce(col("p_c1"), lit(0L)) + col("vv"))).as("lp"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"),
        ((-sum(col("lp"))) / count(lit(1))).as("xent_raw"))

  /** Salt width of the scoring joins. Bigram streams are Zipfian —
    * one stopword bigram can be percents of a 100 TB stream, and the
    * scoring joins key on exactly that skewed value. AQE's skew-split
    * is NOT a reliable mitigation here: OptimizeSkewedJoin only fires
    * when BOTH join children are dedicated ENSURE_REQUIREMENTS
    * shuffle stages, and the model side of these joins routinely
    * reuses its aggregation's (w1,w2) partitioning (no dedicated
    * exchange → rule silently skips — observed in the flood probe:
    * identical corpus, split at one broadcast threshold, serialized
    * 204k records through one task at another). So the skew story is
    * DETERMINISTIC instead: the corpus side carries a doc-hash salt,
    * the vocab-bounded model/prefix tables are replicated salt-wide,
    * and any hot key spreads over [[ScoreSaltWidth]] partitions on
    * every Spark, every plan shape. Cost: model-side rows × salt —
    * vocabulary-bounded, orders below the corpus side the join
    * shuffles anyway (and when the model side is small enough to
    * broadcast, the salt just widens a broadcast table; no shuffle
    * exists to skew). ScaleSmokeSpec's stopword-flood test is the
    * receipt: max per-task shuffle records ≈ total/salt under a
    * 99%-one-key corpus with broadcasts disabled.
    */
  val ScoreSaltWidth = 16

  private def saltedBigrams(corpus: DataFrame): DataFrame =
    bigramsOf(corpus).withColumn("salt",
      pmod(xxhash64(col("doc_id")), lit(ScoreSaltWidth.toLong)).cast("int"))

  private def saltedModel(t: DataFrame): DataFrame =
    t.withColumn("salt", explode(sequence(lit(0), lit(ScoreSaltWidth - 1))))

  private def prefixOf(model: DataFrame): DataFrame =
    model.groupBy("w1").agg(first("c1").as("p_c1"))

  /** The broadcast scalar row both scorers need: vocabulary size `vv`
    * and total training-bigram count `nn`, with the EMPTY-MODEL
    * guard — an empty model frame (e.g. a reference split that
    * selected no documents) aggregates to one row with NULL v, which
    * would propagate through log() into NULL xent for EVERY document
    * — silent garbage downstream. The guard is declarative and free:
    * evaluated once on the 1-row aggregate, never on the per-bigram
    * hot path.
    */
  private def scalarsOf(model: DataFrame): DataFrame =
    model.agg(first("v").as("vv0"), sum("c12").as("nn"))
      .select(when(col("vv0").isNull, raise_error(lit(
          "Perplexity.scoreAgainst: model is empty (no bigrams) — " +
          "train on a non-empty reference corpus")))
        .otherwise(col("vv0")).as("vv"), col("nn"))

  /** Interpolation weight of the bigram estimate in
    * [[scoreAgainstInterp]]. 0.75 is in the range CCNet-family
    * pipelines use for Jelinek–Mercer interpolation, and it is DYADIC
    * (0.75 and 1−0.75 = 0.25 are both exact doubles), so the Spark
    * and oracle spellings of λ and 1−λ cannot differ by an ulp.
    */
  val DefaultInterpLambda = 0.75

  /** Jelinek–Mercer interpolated bigram↔unigram scorer — the backoff
    * alternative to [[scoreAgainst]]'s add-one smoothing (Wenzek et
    * al. §3 train Kneser–Ney models; interpolation is the classic
    * member of the same backoff family that spells as pure rational
    * arithmetic + one ln, the repo's §6 transcendental budget):
    *
    *   `P(w2|w1) = λ·c12/c1 + (1−λ)·(cu(w2)+1)/(N+V)`
    *
    * where `cu(w2) = Σ_w1 c12` and `N = Σ c12` — the unigram backbone
    * is the distribution of SECOND tokens in the training bigram
    * stream, so the whole interpolated model derives from the SAME
    * [[modelOf]] artifact (one training pass, two scorers against
    * it). The unigram term is add-one-floored, so P > 0 even for a
    * token the model never saw; a novel prefix (c1 null) zeroes the
    * bigram term instead of dropping the row.
    *
    * Why it matters vs add-one: with a realistic vocabulary, add-one
    * divides by `c1 + V` where `V` dwarfs `c1`, so RARE-BUT-VALID
    * continuations after uncommon prefixes are crushed toward 1/V and
    * rank with garbage; interpolation lets the observed conditional
    * `c12/c1` dominate (λ) and smooths with the unigram prior instead
    * of the uniform one. PerplexitySpec pins a corpus where the two
    * scorers ORDER documents differently.
    *
    * Plan shape = [[scoreAgainst]] plus ONE more vocabulary-sized
    * left join (the unigram table) — same linear, no-window scoring
    * pass.
    */
  def scoreAgainstInterp(model: DataFrame, corpus: DataFrame,
      lambda: Double = DefaultInterpLambda): DataFrame =
    rounded(scoreAgainstInterpRaw(model, corpus, lambda))

  private[graft] def scoreAgainstInterpRaw(model: DataFrame, corpus: DataFrame,
      lambda: Double = DefaultInterpLambda): DataFrame = {
    require(lambda > 0.0 && lambda < 1.0,
      s"interpolation weight must be in (0,1), got $lambda")
    val uni = model.groupBy("w2").agg(sum("c12").as("cu"))
    saltedBigrams(corpus)
      .join(saltedModel(model.select("w1", "w2", "c12")),
        Seq("w1", "w2", "salt"), "left")
      .join(saltedModel(prefixOf(model)), Seq("w1", "salt"), "left")
      .join(saltedModel(uni), Seq("w2", "salt"), "left")
      .crossJoin(broadcast(scalarsOf(model)))
      .select(col("doc_id"),
        // operand shapes mirror the oracle SQL exactly — addition of
        // a double literal forces double division in both engines,
        // and the λ/1−λ literals are dyadic (see DefaultInterpLambda)
        log(lit(lambda) *
            when(col("p_c1").isNotNull,
              (coalesce(col("c12"), lit(0L)) + lit(0.0)) / col("p_c1"))
              .otherwise(lit(0.0))
          + lit(1.0 - lambda) *
            ((coalesce(col("cu"), lit(0L)) + lit(1.0)) / (col("nn") + col("vv"))))
          .as("lp"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"),
        ((-sum(col("lp"))) / count(lit(1))).as("xent_raw"))
  }

  /** Absolute discount of the Kneser–Ney scorer. 0.75 is the
    * classic Chen–Goodman fixed discount, and it is DYADIC (exact
    * double), so `c12 − D` is computed on the same bit pattern in
    * both engines.
    */
  val DefaultKnDiscount = 0.75

  /** Interpolated Kneser–Ney bigram scorer — the smoothing family
    * CCNet's deployed KenLM models actually use (Wenzek et al. §3;
    * Chen & Goodman 1998, "An Empirical Study of Smoothing Techniques
    * for Language Modeling" — public literature, not code):
    *
    *   `P(w2|w1) = max(c12 − D, 0)/c1 + (D·n1f(w1)/c1) · Pcont(w2)`
    *   `Pcont(w2) = (n1b(w2) + 1) / (ND + V)`
    *
    * where `n1f(w1) = |{w2 : c12 > 0}|` (distinct continuations of
    * the prefix — the mass discounted away is handed to the backoff
    * in proportion to how many types it was taken from), `n1b(w2) =
    * |{w1 : c12 > 0}|` (distinct CONTEXTS w2 follows — the KN
    * continuation count), and `ND = |distinct bigrams|`. The
    * continuation prior is the KN signature: a token seen many times
    * after ONE context (a burst artifact, boilerplate) gets a LOW
    * prior; a token seen across many distinct contexts gets a high
    * one — precisely the novelty-vs-template distinction a crawl
    * curator wants, which neither the uniform (add-one) nor the
    * frequency (Jelinek–Mercer) prior makes. PerplexitySpec pins a
    * corpus where KN orders documents differently from BOTH.
    *
    * All three derived tables (n1f, n1b, ND) come from the SAME
    * [[modelOf]] artifact — counting model ROWS per w1 / per w2 /
    * total — so one training pass still feeds every scorer. The
    * continuation prior takes an add-one floor (+1 / +V) so a novel
    * token keeps P > 0 under the left joins, and a novel PREFIX
    * backs off to the prior entirely (the standard unseen-context
    * rule). `c12 ≥ 1` in the model, so `max(c12 − D, 0)` only floors
    * on the null branch; D dyadic keeps the subtraction exact.
    *
    * Everything is rational arithmetic + the single ln the family
    * already budgets (§6); plan shape = [[scoreAgainstInterp]]
    * exactly (the n1f column rides the existing prefix-table join,
    * n1b replaces the unigram table — same three left joins + one
    * broadcast scalar, salted the same way).
    */
  def scoreAgainstKn(model: DataFrame, corpus: DataFrame,
      discount: Double = DefaultKnDiscount): DataFrame =
    rounded(scoreAgainstKnRaw(model, corpus, discount))

  private[graft] def scoreAgainstKnRaw(model: DataFrame, corpus: DataFrame,
      discount: Double = DefaultKnDiscount): DataFrame = {
    require(discount > 0.0 && discount < 1.0,
      s"KN discount must be in (0,1), got $discount")
    // n1f rides the prefix aggregation; n1b and ND are row counts of
    // the model — all vocabulary-bounded
    val pfx = model.groupBy("w1").agg(first("c1").as("p_c1"),
      count(lit(1)).as("n1f"))
    val cont = model.groupBy("w2").agg(count(lit(1)).as("n1b"))
    val scalars = model
      .agg(first("v").as("vv0"), count(lit(1)).as("nd"))
      .select(when(col("vv0").isNull, raise_error(lit(
          "Perplexity.scoreAgainstKn: model is empty (no bigrams) — " +
          "train on a non-empty reference corpus")))
        .otherwise(col("vv0")).as("vv"), col("nd"))
    saltedBigrams(corpus)
      .join(saltedModel(model.select("w1", "w2", "c12")),
        Seq("w1", "w2", "salt"), "left")
      .join(saltedModel(pfx), Seq("w1", "salt"), "left")
      .join(saltedModel(cont), Seq("w2", "salt"), "left")
      .crossJoin(broadcast(scalars))
      .select(col("doc_id"),
        // operand shapes mirror the oracle SQL exactly; the
        // continuation prior is spelled identically on both branches
        log(when(col("p_c1").isNotNull,
            greatest(coalesce(col("c12"), lit(0L)) - lit(discount), lit(0.0))
              / col("p_c1")
            + lit(discount) * col("n1f") / col("p_c1")
              * ((coalesce(col("n1b"), lit(0L)) + lit(1.0))
                 / (col("nd") + col("vv"))))
          .otherwise(
            (coalesce(col("n1b"), lit(0L)) + lit(1.0))
              / (col("nd") + col("vv"))))
          .as("lp"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"),
        ((-sum(col("lp"))) / count(lit(1))).as("xent_raw"))
  }

  /** Self-perplexity scores of the documents table, staged: the
    * score table is the reusable curation artifact (both queries and
    * any downstream keep/drop gate consume it), so it lands in
    * parquet once per (corpus fingerprint) and a fresh JVM reads it
    * back instead of retraining the LM.
    */
  private def scoredOf(spark: SparkSession, dir: String): DataFrame = {
    val fp = DfCache.inputFingerprint(spark, s"$dir/documents.parquet")
    DfCache.getOrCompute(spark, s"pplx_scored:$dir") {
      DfCache.stagedFrame(spark, "pplx_scored", fp) {
        val corpus = Tables.documents(spark, dir)
        scoreAgainst(modelOf(spark, corpus), corpus)
      }
    }
  }

  /** Gate query: (doc_id, n_bigrams, xent) per scoreable document. */
  def qualityPerplexity(spark: SparkSession, dir: String): DataFrame =
    scoredOf(spark, dir).orderBy(col("doc_id"))

  /** Gate query: the REFERENCE-TRAINED shape (CCNet's actual
    * deployment) — the LM is trained on a deterministic md5-coin half
    * of the corpus and scores EVERY document, so the other half's
    * novel bigrams exercise the left-join smoothing floor (c12 = 0,
    * and c1 = 0 for novel prefixes) against the DuckDB oracle, not
    * just the hand-computed spec. The coin (not id arithmetic) picks
    * the reference so replication rungs cannot split a spelling. The
    * 0.05 default is chosen to make the gate NON-vacuous on this
    * corpus: at 0.5 only 4 of 26,665 scored bigrams hit the floor
    * (the synthetic vocabulary is small); at 0.05 it is 7,041 novel
    * bigrams plus a novel prefix — both smoothing branches land
    * under the hash-exact compare.
    */
  def qualityPerplexityRef(spark: SparkSession, dir: String,
      refFrac: Double = 0.05): DataFrame = {
    val fp = DfCache.inputFingerprint(spark, s"$dir/documents.parquet")
    // staged like the self-trained score table: retraining + rescoring
    // per read recurred at 1.9-10.9 s across the 8×-128× rungs; the
    // staged artifact makes the recurring cost a parquet read
    DfCache.getOrCompute(spark, s"pplx_ref_scored:$dir:$refFrac") {
      DfCache.stagedFrame(spark, s"pplx_ref_scored_$refFrac", fp) {
        val corpus = Tables.documents(spark, dir)
        val ref = corpus.where(
          md5Long(concat(lit("pplxref:"), col("doc_id").cast("string")), 1, 8)
            .cast("double") / 4294967296.0 < refFrac)
        scoreAgainst(modelOf(spark, ref), corpus)
      }
    }.orderBy(col("doc_id"))
  }

  /** Gate query: the reference-trained shape scored with the
    * INTERPOLATED backoff model ([[scoreAgainstInterp]]) instead of
    * add-one — same md5-coin 5% training split as
    * [[qualityPerplexityRef]] (so both smoothing paths see the same
    * novel bigrams/prefixes/tokens), same one-artifact staging. The
    * model-quality step of the CCNet recipe the add-one family
    * approximates most weakly; kept as a SEPARATE gated query so both
    * smoothing variants stay under the hash-exact oracle side by
    * side and a caller picks per corpus.
    */
  def qualityPerplexityBackoff(spark: SparkSession, dir: String,
      refFrac: Double = 0.05,
      lambda: Double = DefaultInterpLambda): DataFrame = {
    val fp = DfCache.inputFingerprint(spark, s"$dir/documents.parquet")
    DfCache.getOrCompute(spark, s"pplx_backoff_scored:$dir:$refFrac:$lambda") {
      DfCache.stagedFrame(spark, s"pplx_backoff_scored_${refFrac}_$lambda", fp) {
        val corpus = Tables.documents(spark, dir)
        val ref = corpus.where(
          md5Long(concat(lit("pplxref:"), col("doc_id").cast("string")), 1, 8)
            .cast("double") / 4294967296.0 < refFrac)
        scoreAgainstInterp(modelOf(spark, ref), corpus, lambda)
      }
    }.orderBy(col("doc_id"))
  }

  /** Documents with ≥ 3 whitespace tokens — the corpus a TRIGRAM
    * model can see (one order stricter than [[tokenized]]).
    */
  private def tokenized3(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), tokens(col("text")).as("toks"))
      .where(size(col("toks")) >= 3)

  /** Consecutive-token trigrams, one row per position. */
  private def trigramsOf(docs: DataFrame): DataFrame =
    tokenized3(docs).select(col("doc_id"), explode(zip_with(
        zip_with(
          slice(col("toks"), lit(1), size(col("toks")) - 2),
          slice(col("toks"), lit(2), size(col("toks")) - 2),
          (a, b) => struct(a.as("w1"), b.as("w2"))),
        slice(col("toks"), lit(3), size(col("toks")) - 2),
        (p, c) => struct(p.getField("w1").as("w1"),
          p.getField("w2").as("w2"), c.as("w3")))).as("tg"))
      .select(col("doc_id"), col("tg.w1").as("w1"),
        col("tg.w2").as("w2"), col("tg.w3").as("w3"))

  /** Trigram count model over `corpus`: one row per distinct trigram
    * with its count `c123`, plus the corpus vocabulary size `v` as a
    * broadcast-scalar column — the single artifact every derived
    * table of [[scoreAgainstKn3]] is a row count of (the same
    * one-training-pass contract as [[modelOf]]).
    */
  def modelOf3(spark: SparkSession, corpus: DataFrame): DataFrame = {
    val tri = trigramsOf(corpus)
      .groupBy("w1", "w2", "w3").agg(count(lit(1)).as("c123"))
    val voc = tokenized3(corpus)
      .select(explode(col("toks")).as("tok"))
      .agg(count_distinct(col("tok")).as("v"))
    tri.crossJoin(broadcast(voc))
  }

  /** TRIGRAM interpolated Kneser–Ney scorer — one order up from
    * [[scoreAgainstKn]], the canonical step toward the 5-gram KenLM
    * models CCNet deploys (Wenzek et al. §3; Chen & Goodman 1998).
    * Two backoff levels, continuation counts at each:
    *
    *   P3(w3|w1w2) = max(c123−D,0)/c12 + D·n1f12/c12 · P2(w3|w2)
    *   P2(w3|w2)   = max(n1b23−D,0)/nmid + D·n1fmid/nmid · P1(w3)
    *   P1(w3)      = (n1b3 + 1) / (ND + V)
    *
    * where every quantity is a ROW COUNT of the [[modelOf3]] trigram
    * table: `c12 = Σ_w3 c123` and `n1f12 = |{w3}|` per (w1,w2);
    * `n1b23 = |{w1 : c123>0}|` per (w2,w3) (the mid-level KN
    * continuation count — HOW MANY contexts a bigram completes, not
    * how often); `nmid = Σ_w3 n1b23` and `n1fmid = |{w3}|` per w2;
    * `n1b3 = |{(w1,w2)}|` per w3; `ND = |distinct trigrams|`. A novel
    * (w1,w2) prefix backs off to P2, a novel middle token to P1, and
    * the unigram floor keeps P > 0 for a token the model never saw —
    * so the left joins never drop a row (the smoothing contract of
    * the whole family). Dyadic D keeps the discounts bit-exact; the
    * inner P2/P1 expressions are SHARED Column trees reused in both
    * branches, and the oracle SQL spells them verbatim twice, so the
    * float ops are identical in both engines by construction.
    *
    * Plan shape: the trigram stream (corpus-sized, doc-hash salted)
    * LEFT JOINs five vocabulary-bounded model tables (each replicated
    * salt-wide like the bigram scorers) + one broadcast scalar, then
    * one map-side-combined groupBy doc_id. Linear, no windows, no
    * self-joins — the same 100 TB shape as [[scoreAgainstRaw]] with
    * two more small joins.
    */
  def scoreAgainstKn3(model3: DataFrame, corpus: DataFrame,
      discount: Double = DefaultKnDiscount): DataFrame =
    rounded3(scoreAgainstKn3Raw(model3, corpus, discount))

  private def rounded3(raw: DataFrame): DataFrame =
    raw.select(col("doc_id"), col("n_trigrams"),
      Par.round4(col("xent_raw")).as("xent"))

  private[graft] def scoreAgainstKn3Raw(model3: DataFrame, corpus: DataFrame,
      discount: Double = DefaultKnDiscount): DataFrame = {
    require(discount > 0.0 && discount < 1.0,
      s"KN discount must be in (0,1), got $discount")
    val tri = model3.select("w1", "w2", "w3", "c123")
    val p12 = tri.groupBy("w1", "w2")
      .agg(sum("c123").as("c12"), count(lit(1)).as("n1f12"))
    val mid = tri.groupBy("w2", "w3").agg(count(lit(1)).as("n1b23"))
    val midp = mid.groupBy("w2")
      .agg(sum("n1b23").as("nmid"), count(lit(1)).as("n1fmid"))
    val cont = tri.groupBy("w3").agg(count(lit(1)).as("n1b3"))
    val scalars = model3
      .agg(first("v").as("vv0"), count(lit(1)).as("nd"))
      .select(when(col("vv0").isNull, raise_error(lit(
          "Perplexity.scoreAgainstKn3: model is empty (no trigrams) — " +
          "train on a non-empty reference corpus")))
        .otherwise(col("vv0")).as("vv"), col("nd"))
    // the shared backoff trees — reused Column instances, so both
    // branches of every CASE evaluate the IDENTICAL float expression
    val p1 = (coalesce(col("n1b3"), lit(0L)) + lit(1.0)) /
      (col("nd") + col("vv"))
    val p2 = when(col("nmid").isNotNull,
        greatest(coalesce(col("n1b23"), lit(0L)) - lit(discount), lit(0.0))
          / col("nmid")
        + lit(discount) * col("n1fmid") / col("nmid") * p1)
      .otherwise(p1)
    val p3 = when(col("c12").isNotNull,
        greatest(coalesce(col("c123"), lit(0L)) - lit(discount), lit(0.0))
          / col("c12")
        + lit(discount) * col("n1f12") / col("c12") * p2)
      .otherwise(p2)
    saltedTrigrams(corpus)
      .join(saltedModel(tri), Seq("w1", "w2", "w3", "salt"), "left")
      .join(saltedModel(p12), Seq("w1", "w2", "salt"), "left")
      .join(saltedModel(mid), Seq("w2", "w3", "salt"), "left")
      .join(saltedModel(midp), Seq("w2", "salt"), "left")
      .join(saltedModel(cont), Seq("w3", "salt"), "left")
      .crossJoin(broadcast(scalars))
      .select(col("doc_id"), log(p3).as("lp"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_trigrams"),
        ((-sum(col("lp"))) / count(lit(1))).as("xent_raw"))
  }

  private def saltedTrigrams(corpus: DataFrame): DataFrame =
    trigramsOf(corpus).withColumn("salt",
      pmod(xxhash64(col("doc_id")), lit(ScoreSaltWidth.toLong)).cast("int"))

  /** Gate query: the reference-trained TRIGRAM KN shape — same
    * md5-coin 5% training split and staging as the bigram variants,
    * so the whole smoothing ladder (add-one / JM / KN / trigram-KN)
    * scores the same corpus under the same oracle discipline. The
    * scoreable population is docs with ≥ 3 tokens (one order
    * stricter), which the oracle mirrors.
    */
  def qualityPerplexityKn3(spark: SparkSession, dir: String,
      refFrac: Double = 0.05,
      discount: Double = DefaultKnDiscount): DataFrame = {
    val fp = DfCache.inputFingerprint(spark, s"$dir/documents.parquet")
    DfCache.getOrCompute(spark, s"pplx_kn3_scored:$dir:$refFrac:$discount") {
      DfCache.stagedFrame(spark, s"pplx_kn3_scored_${refFrac}_$discount", fp) {
        val corpus = Tables.documents(spark, dir)
        val ref = corpus.where(
          md5Long(concat(lit("pplxref:"), col("doc_id").cast("string")), 1, 8)
            .cast("double") / 4294967296.0 < refFrac)
        scoreAgainstKn3(modelOf3(spark, ref), corpus, discount)
      }
    }.orderBy(col("doc_id"))
  }

  private def tokenized5(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), tokens(col("text")).as("toks"))
      .where(size(col("toks")) >= 5)

  /** Consecutive-token 5-grams, one row per position — the
    * sequence + element_at spelling (four nested zip_with levels
    * would bury the field plumbing; the oracle mirrors this index
    * form directly with generate_series).
    */
  private def fivegramsOf(docs: DataFrame): DataFrame =
    tokenized5(docs)
      .select(col("doc_id"), col("toks"),
        explode(sequence(lit(1), size(col("toks")) - 4)).as("i"))
      .select(col("doc_id"),
        element_at(col("toks"), col("i")).as("w1"),
        element_at(col("toks"), col("i") + 1).as("w2"),
        element_at(col("toks"), col("i") + 2).as("w3"),
        element_at(col("toks"), col("i") + 3).as("w4"),
        element_at(col("toks"), col("i") + 4).as("w5"))

  /** 5-gram count model over `corpus`: one row per distinct 5-gram
    * with its count `c12345`, plus the vocabulary size `v` — the
    * single artifact every derived table of [[scoreAgainstKn5]] is a
    * row count of (the [[modelOf]]/[[modelOf3]] one-training-pass
    * contract, two orders up).
    */
  def modelOf5(spark: SparkSession, corpus: DataFrame): DataFrame = {
    val fg = fivegramsOf(corpus)
      .groupBy("w1", "w2", "w3", "w4", "w5").agg(count(lit(1)).as("c12345"))
    val voc = tokenized5(corpus)
      .select(explode(col("toks")).as("tok"))
      .agg(count_distinct(col("tok")).as("v"))
    fg.crossJoin(broadcast(voc))
  }

  /** 5-GRAM interpolated Kneser–Ney scorer — the deployed CCNet/KenLM
    * order (Wenzek et al. §3 train 5-gram models; Chen & Goodman
    * 1998), completing the smoothing family two orders above
    * [[scoreAgainstKn3]]. Four backoff levels, continuation counts at
    * each, every quantity a ROW COUNT of the [[modelOf5]] type table
    * `g` (house convention, the kn3 recipe generalized):
    *
    *   P5(w5|w1..w4) = max(c12345−D,0)/c1234 + D·n1f1234/c1234 · P4
    *   P4(w5|w2w3w4) = max(n1b45−D,0)/nmid4 + D·n1f4/nmid4 · P3
    *   P3(w5|w3w4)   = max(n1b345−D,0)/nmid3 + D·n1f3/nmid3 · P2
    *   P2(w5|w4)     = max(n1b45_2−D,0)/nmid2 + D·n1f2/nmid2 · P1
    *   P1(w5)        = (n1b5 + 1) / (ND + V)
    *
    * where per (w1..w4): `c1234 = Σ c12345`, `n1f1234 = |{w5}|`; the
    * level-k continuation count of a k-suffix is its count of
    * distinct full left contexts in `g` (`n1b45 = |{w1}|` per
    * (w2..w5), `n1b345 = |{(w1,w2)}|` per (w3,w4,w5), `n1b45_2 =
    * |{(w1,w2,w3)}|` per (w4,w5), `n1b5 = |{(w1..w4)}|` per w5 — each
    * is a COUNT(*) of `g` grouped by the suffix, because `g` rows are
    * distinct 5-grams); each level's normalizer `nmid_k = Σ n1b` and
    * fan-out `n1f_k = |{w5}|` come from that level's own table
    * grouped by its context; `ND = |g|`. A novel context at any level
    * backs off one level down, and the unigram floor keeps P > 0 —
    * the left joins never drop a row. Dyadic D; the P4/P3/P2/P1
    * subtrees are SHARED Column instances reused across branches, and
    * the oracle spells the identical subtree in every branch, so the
    * float trees match by construction.
    *
    * Plan shape: the salted 5-gram stream LEFT JOINs nine
    * vocabulary-bounded model tables (each replicated salt-wide) +
    * one broadcast scalar, then one map-side-combined groupBy doc_id
    * — linear, no windows, no self-joins; the same 100 TB shape as
    * the bigram scorers with four more small joins.
    */
  def scoreAgainstKn5(model5: DataFrame, corpus: DataFrame,
      discount: Double = DefaultKnDiscount): DataFrame =
    rounded5(scoreAgainstKn5Raw(model5, corpus, discount))

  private def rounded5(raw: DataFrame): DataFrame =
    raw.select(col("doc_id"), col("n_5grams"),
      Par.round4(col("xent_raw")).as("xent"))

  private[graft] def scoreAgainstKn5Raw(model5: DataFrame, corpus: DataFrame,
      discount: Double = DefaultKnDiscount): DataFrame = {
    require(discount > 0.0 && discount < 1.0,
      s"KN discount must be in (0,1), got $discount")
    val g = model5.select("w1", "w2", "w3", "w4", "w5", "c12345")
    val top = g.groupBy("w1", "w2", "w3", "w4")
      .agg(sum("c12345").as("c1234"), count(lit(1)).as("n1f1234"))
    val t4 = g.groupBy("w2", "w3", "w4", "w5").agg(count(lit(1)).as("n1b45"))
    val t4p = t4.groupBy("w2", "w3", "w4")
      .agg(sum("n1b45").as("nmid4"), count(lit(1)).as("n1f4"))
    val t3 = g.groupBy("w3", "w4", "w5").agg(count(lit(1)).as("n1b345"))
    val t3p = t3.groupBy("w3", "w4")
      .agg(sum("n1b345").as("nmid3"), count(lit(1)).as("n1f3"))
    val t2 = g.groupBy("w4", "w5").agg(count(lit(1)).as("n1b452"))
    val t2p = t2.groupBy("w4")
      .agg(sum("n1b452").as("nmid2"), count(lit(1)).as("n1f2"))
    val t1 = g.groupBy("w5").agg(count(lit(1)).as("n1b5"))
    val scalars = model5
      .agg(first("v").as("vv0"), count(lit(1)).as("nd"))
      .select(when(col("vv0").isNull, raise_error(lit(
          "Perplexity.scoreAgainstKn5: model is empty (no 5-grams) — " +
          "train on a non-empty reference corpus")))
        .otherwise(col("vv0")).as("vv"), col("nd"))
    // shared backoff trees — one Column instance per level
    val p1 = (coalesce(col("n1b5"), lit(0L)) + lit(1.0)) /
      (col("nd") + col("vv"))
    val p2 = when(col("nmid2").isNotNull,
        greatest(coalesce(col("n1b452"), lit(0L)) - lit(discount), lit(0.0))
          / col("nmid2")
        + lit(discount) * col("n1f2") / col("nmid2") * p1)
      .otherwise(p1)
    val p3 = when(col("nmid3").isNotNull,
        greatest(coalesce(col("n1b345"), lit(0L)) - lit(discount), lit(0.0))
          / col("nmid3")
        + lit(discount) * col("n1f3") / col("nmid3") * p2)
      .otherwise(p2)
    val p4 = when(col("nmid4").isNotNull,
        greatest(coalesce(col("n1b45"), lit(0L)) - lit(discount), lit(0.0))
          / col("nmid4")
        + lit(discount) * col("n1f4") / col("nmid4") * p3)
      .otherwise(p3)
    val p5 = when(col("c1234").isNotNull,
        greatest(coalesce(col("c12345"), lit(0L)) - lit(discount), lit(0.0))
          / col("c1234")
        + lit(discount) * col("n1f1234") / col("c1234") * p4)
      .otherwise(p4)
    saltedFivegrams(corpus)
      .join(saltedModel(g), Seq("w1", "w2", "w3", "w4", "w5", "salt"), "left")
      .join(saltedModel(top), Seq("w1", "w2", "w3", "w4", "salt"), "left")
      .join(saltedModel(t4), Seq("w2", "w3", "w4", "w5", "salt"), "left")
      .join(saltedModel(t4p), Seq("w2", "w3", "w4", "salt"), "left")
      .join(saltedModel(t3), Seq("w3", "w4", "w5", "salt"), "left")
      .join(saltedModel(t3p), Seq("w3", "w4", "salt"), "left")
      .join(saltedModel(t2), Seq("w4", "w5", "salt"), "left")
      .join(saltedModel(t2p), Seq("w4", "salt"), "left")
      .join(saltedModel(t1), Seq("w5", "salt"), "left")
      .crossJoin(broadcast(scalars))
      .select(col("doc_id"), log(p5).as("lp"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_5grams"),
        ((-sum(col("lp"))) / count(lit(1))).as("xent_raw"))
  }

  private def saltedFivegrams(corpus: DataFrame): DataFrame =
    fivegramsOf(corpus).withColumn("salt",
      pmod(xxhash64(col("doc_id")), lit(ScoreSaltWidth.toLong)).cast("int"))

  /** Gate query: the reference-trained 5-GRAM KN shape — same
    * md5-coin 5% training split and staging as the rest of the
    * ladder; scoreable population is docs with ≥ 5 tokens, which the
    * oracle mirrors. With this the family spans add-one / JM / KN /
    * KN3 / KN5 — the full deployed-CCNet order under the hash gate.
    */
  def qualityPerplexityKn5(spark: SparkSession, dir: String,
      refFrac: Double = 0.05,
      discount: Double = DefaultKnDiscount): DataFrame = {
    val fp = DfCache.inputFingerprint(spark, s"$dir/documents.parquet")
    DfCache.getOrCompute(spark, s"pplx_kn5_scored:$dir:$refFrac:$discount") {
      DfCache.stagedFrame(spark, s"pplx_kn5_scored_${refFrac}_$discount", fp) {
        val corpus = Tables.documents(spark, dir)
        val ref = corpus.where(
          md5Long(concat(lit("pplxref:"), col("doc_id").cast("string")), 1, 8)
            .cast("double") / 4294967296.0 < refFrac)
        scoreAgainstKn5(modelOf5(spark, ref), corpus, discount)
      }
    }.orderBy(col("doc_id"))
  }

  /** Gate query: the reference-trained shape scored with the
    * KNESER–NEY model ([[scoreAgainstKn]]) — same md5-coin 5%
    * training split and one-artifact staging as the other two
    * reference-trained variants, so all three smoothing families
    * (uniform prior / frequency prior / continuation prior) sit
    * under the hash-exact oracle over the SAME novel
    * bigrams/prefixes/tokens and a caller picks per corpus.
    */
  def qualityPerplexityKn(spark: SparkSession, dir: String,
      refFrac: Double = 0.05,
      discount: Double = DefaultKnDiscount): DataFrame = {
    val fp = DfCache.inputFingerprint(spark, s"$dir/documents.parquet")
    DfCache.getOrCompute(spark, s"pplx_kn_scored:$dir:$refFrac:$discount") {
      DfCache.stagedFrame(spark, s"pplx_kn_scored_${refFrac}_$discount", fp) {
        val corpus = Tables.documents(spark, dir)
        val ref = corpus.where(
          md5Long(concat(lit("pplxref:"), col("doc_id").cast("string")), 1, 8)
            .cast("double") / 4294967296.0 < refFrac)
        scoreAgainstKn(modelOf(spark, ref), corpus, discount)
      }
    }.orderBy(col("doc_id"))
  }

  /** A NAMED scoring family, for seams that stage per-scorer
    * artifacts (Pack.trainPrepScored): the tag travels WITH the
    * function and encodes its parameters, so an artifact key built
    * from it can never serve one family's output to another — the
    * collision a free-floating (function, label) parameter pair
    * invites. The tag is path-safe by construction (no separators).
    *
    * `train` builds the family's model artifact from a reference
    * corpus (round 14): the bigram families share [[modelOf]], the
    * higher orders carry [[modelOf3]]/[[modelOf5]] — so a consumer
    * like trainPrepScored stays one spelling across ALL five
    * smoothing families instead of special-casing artifact types,
    * and a scorer can never be handed another order's model.
    */
  final case class Scorer(tag: String,
      score: (DataFrame, DataFrame) => DataFrame,
      train: (SparkSession, DataFrame) => DataFrame = modelOf _) {
    require(tag.matches("[A-Za-z0-9._-]+"),
      s"scorer tag must be a plain label, got '$tag'")
  }

  object Scorer {
    val AddOne: Scorer = Scorer("addone", scoreAgainst(_, _))
    def interp(lambda: Double = DefaultInterpLambda): Scorer =
      Scorer(s"interp_$lambda", scoreAgainstInterp(_, _, lambda))
    def kn(discount: Double = DefaultKnDiscount): Scorer =
      Scorer(s"kn_$discount", scoreAgainstKn(_, _, discount))
    def kn3(discount: Double = DefaultKnDiscount): Scorer =
      Scorer(s"kn3_$discount", scoreAgainstKn3(_, _, discount), modelOf3 _)
    def kn5(discount: Double = DefaultKnDiscount): Scorer =
      Scorer(s"kn5_$discount", scoreAgainstKn5(_, _, discount), modelOf5 _)
  }

  /** THE bucket spelling — shared by the buckets query, the apply
    * gate, and the streaming scorer (streaming/PplxStream) so the
    * keep/drop boundary can never drift between them.
    */
  private[graft] def bucketOf(xent: Column, c1: Column, c2: Column): Column =
    when(xent <= c1, "head").when(xent <= c2, "middle").otherwise("tail")

  /** The 2-value cutoff artifact: exact interpolated percentiles of
    * the rounded scores, ROUND4-SNAPPED to the score grid (see
    * [[qualityPerplexityBuckets]] for why), optionally calibrated on
    * a deterministic md5-coin subsample.
    */
  private[graft] def cutsOf(sc: DataFrame, calibFrac: Double = 1.0): DataFrame = {
    val calib =
      if (calibFrac >= 1.0) sc
      else sc.where(md5Long(concat(lit("pplx:"), col("doc_id").cast("string")), 1, 8)
        .cast("double") / 4294967296.0 < calibFrac)
    // round4 the cutoffs themselves (the value_percentiles ≡
    // quantile_cont convention): when the tercile falls inside a tie
    // run, both engines interpolate lower*(1-frac) + higher*frac with
    // lower == higher and the two products round a few ulp apart —
    // observed straddling the data value 3.3973 at sf0.1 (Spark above,
    // DuckDB below, shifting 18 tied docs across the boundary).
    // Snapping to the score grid is exact: an interior cutoff sits
    // ≥ 1/3·10⁻⁴ from the grid, ≥ 1.6·10⁻⁵ from the nearest rounding
    // midpoint — far beyond interpolation noise.
    calib.agg(
      Par.round4(expr("percentile(xent, 1.0/3)")).as("c1"),
      Par.round4(expr("percentile(xent, 2.0/3)")).as("c2"))
  }

  /** Gate query: CCNet's head / middle / tail terciles. Cutoffs are
    * exact interpolated percentiles of the rounded scores (the
    * value_percentiles ≡ quantile_cont parity, established for the
    * events table since round 7); each bucket row reports its size
    * and exact score range — constant 3-row output at every ladder
    * rung. `calibFrac` < 1 computes the cutoffs on a deterministic
    * md5-coin subsample (the 100 TB calibration path — the exact
    * percentile's single aggregation buffer holds one double per
    * SAMPLED doc); the bucketing itself stays a full-corpus scalar
    * comparison against the two broadcast cutoffs either way.
    */
  def qualityPerplexityBuckets(spark: SparkSession, dir: String,
      calibFrac: Double = 1.0): DataFrame = {
    val sc = scoredOf(spark, dir)
    sc.crossJoin(broadcast(cutsOf(sc, calibFrac)))
      .select(col("xent"),
        bucketOf(col("xent"), col("c1"), col("c2")).as("bucket"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_docs"),
        min("xent").as("min_xent"), max("xent").as("max_xent"))
      .orderBy("bucket")
  }

  /** Gate query: the CCNet APPLY step — keep head + middle, drop the
    * tail tercile (the highest-perplexity third). The keep decision
    * is the broadcast-scalar comparison against the 2-value cutoff
    * artifact, so applying it to 100 TB is one corpus scan; the
    * surviving (doc_id, n_bigrams, xent) frame is what feeds a
    * downstream mix/pack stage.
    */
  def qualityPerplexityApply(spark: SparkSession, dir: String,
      calibFrac: Double = 1.0, sorted: Boolean = true): DataFrame = {
    val sc = scoredOf(spark, dir)
    Present.presented(
      sc.crossJoin(broadcast(cutsOf(sc, calibFrac)))
        .where(bucketOf(col("xent"), col("c1"), col("c2")) =!= "tail")
        .select(col("doc_id"), col("n_bigrams"), col("xent")),
      sorted, "doc_id")
  }

  // --- DSIR importance scoring ----------------------------------------

  /** Coin fraction of the corpus that plays the TARGET distribution
    * in [[dsirScore]]'s gate query (a stand-in — real deployments
    * pass a curated target corpus through [[dsirScoreOf]]'s seam).
    */
  val DefaultDsirTargetFrac = 0.25

  /** Selection size of [[dsirSelect]]. */
  val DefaultDsirK = 100

  /** DSIR importance score (Xie et al. 2023, "Data Selection for
    * Language Models via Importance Resampling") over ANY
    * target/corpus pair: per-document mean bigram log-likelihood
    * ratio `log p_target − log p_raw` = `xent_raw − xent_target`,
    * length-normalized, positive = more target-like. The raw model
    * is self-trained on the scored corpus; both passes reuse
    * [[scoreAgainst]]'s salted LEFT-join smoothing floors (the
    * target model is the small one, so novel-bigram floors do the
    * real work here).
    *
    * Parity design: the difference is taken over the two ROUNDED
    * [[scoreAgainst]] presentation values on purpose. Each operand
    * is individually hash-gated, so both engines subtract the SAME
    * two doubles — bit-identical by construction, no new ln-parity
    * analysis — and a difference of two 4-decimal values sits
    * ≥ 5e-5 − ulp from every round4 midpoint, so the presented
    * `log_ratio` cannot flip a digit either (DsirSpec measures the
    * actual margin). The ~1e-4 quantization this costs is noise at
    * selection granularity.
    *
    * `target` must have at least one scoreable (≥ 2-token) document:
    * [[scoreAgainst]] fails LOUDLY on an empty model (scalarsOf's
    * raise_error — an empty vocabulary has no smoothing floor to
    * stand on), so an untrainable target kills the job instead of
    * silently scoring everything against nothing. Scale: two model
    * builds (vocab-bounded tables) + two linear scoring scans + one
    * doc_id join of two doc-sized frames.
    */
  private[graft] def dsirScoreOf(spark: SparkSession, target: DataFrame,
      corpus: DataFrame): DataFrame =
    dsirScoreAgainst(modelOf(spark, corpus), modelOf(spark, target), corpus)

  /** The DSIR score over two FROZEN model artifacts — the seam a real
    * deployment uses (both models trained offline at the epoch
    * boundary; CCNet ships its LM the same way) and the one spelling
    * shared with the streaming twin (streaming/DsirStream), so batch
    * and stream ratios cannot drift. Per-doc fold is batch-local:
    * scoring any subset of `corpus` gives that subset's exact rows.
    */
  def dsirScoreAgainst(rawModel: DataFrame, targetModel: DataFrame,
      corpus: DataFrame): DataFrame = {
    val self = scoreAgainst(rawModel, corpus)
    val tgt = scoreAgainst(targetModel, corpus)
      .select(col("doc_id"), col("xent").as("xent_t"))
    self.join(tgt, Seq("doc_id"))
      .select(col("doc_id"), col("n_bigrams"),
        Par.round4(col("xent") - col("xent_t")).as("log_ratio"))
  }

  /** Staged DSIR score table — the detect/apply boundary, keyed on
    * (corpus fingerprint, targetFrac) like the other score tables.
    */
  private def dsirScoredOf(spark: SparkSession, dir: String,
      targetFrac: Double): DataFrame = {
    val fp = DfCache.inputFingerprint(spark, s"$dir/documents.parquet")
    DfCache.getOrCompute(spark, s"dsir_scored:$dir:$targetFrac") {
      DfCache.stagedFrame(spark, s"dsir_scored_$targetFrac", fp) {
        val corpus = Tables.documents(spark, dir)
        val target = corpus.where(
          md5Long(concat(lit("dsir:"), col("doc_id").cast("string")), 1, 8)
            .cast("double") / 4294967296.0 < targetFrac)
        dsirScoreOf(spark, target, corpus)
      }
    }
  }

  /** Gate query: (doc_id, n_bigrams, log_ratio) per scoreable doc. */
  def dsirScore(spark: SparkSession, dir: String,
      targetFrac: Double = DefaultDsirTargetFrac): DataFrame =
    dsirScoredOf(spark, dir, targetFrac).orderBy(col("doc_id"))

  /** Gate query: DSIR's selection step — the k most target-like
    * documents under the deterministic (log_ratio DESC, doc_id)
    * total order. The paper samples with Gumbel noise; the
    * deterministic order is the auditable variant (the same
    * determinism-over-sampling call as Dedup.deterministicSample),
    * and a caller wanting stochastic resampling seeds a coin column
    * upstream of the same sort.
    */
  def dsirSelect(spark: SparkSession, dir: String,
      targetFrac: Double = DefaultDsirTargetFrac,
      k: Int = DefaultDsirK): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    dsirScoredOf(spark, dir, targetFrac)
      .orderBy(col("log_ratio").desc, col("doc_id"))
      .limit(k)
  }
}
