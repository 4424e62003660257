package graft.operators

import graft.functions.HashFunctions.hash60
import graft.functions.TextFunctions._
import org.apache.spark.sql.{Column, DataFrame}
import graft.functions.PortableMath.rnd
import org.apache.spark.sql.functions._

/** Per-document text-analysis columns for training-data curation: token
  * counts, language ID, quality score, fingerprint. No shuffle at all —
  * the operator is two map stages over the corpus, which is exactly what
  * you want when the input is 100 TB of text.
  */
object TextAnalysis {

  /** All metrics at once, with the text tokenized exactly ONCE per row.
    *
    * Plan shape matters: the naive single projection calling each
    * text-based metric embeds its own copy of the tokenization tree —
    * `tokens(text)` was evaluated ~12x per row (guard + numerator +
    * denominator of every ratio; the measured round-2 q20 cost). Here the
    * token array (plus the other shared scalars: char count, unrounded
    * punct ratio) is computed in a FIRST projection, and every metric
    * derives from those columns via the `FromTokens` variants in a
    * SECOND. CollapseProject leaves the two projections separate (a
    * non-cheap alias referenced more than once is not inlined —
    * `collapseProjectAlwaysInline` is off), so each row tokenizes once;
    * no persist barrier is needed, which keeps column pruning alive for
    * callers that use only a few metrics (q26 reads 3 of the 9). The
    * remaining duplication (stopword ratio referenced by 3 outputs) is a
    * filter scan over the already-built array — cheap, not a
    * re-tokenization.
    */
  def analyze(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = Par.ensureMapParallelism(docs).select(
      col(idCol).as("id"),
      length(col(textCol)).as("n_chars"),
      approxBpeTokenCount(col(textCol)).as("n_bpe_tokens"),
      punctRatio(col(textCol)).as("_punct"), // unrounded; rounded at output
      tokens(col(textCol)).as("_toks")
    )
    // middle projection: the stopword ratio feeds 3 outputs — also kept
    // out of the final projection so it is built once per row
    val swr = toks.select(col("id"), col("n_chars"), col("n_bpe_tokens"),
      col("_punct"), col("_toks"),
      stopwordRatioFromTokens(col("_toks")).as("_swr"))
    swr.select(
      col("id"),
      size(col("_toks")).as("n_tokens"),
      col("n_bpe_tokens"),
      col("n_chars"),
      rnd(col("_swr"), 6).as("stopword_ratio"),
      rnd(col("_punct"), 6).as("punct_ratio"),
      rnd(meanTokenLenFromTokens(col("_toks")), 6).as("mean_token_len"),
      langIdFromRatio(col("_swr")).as("lang_pred"),
      rnd(qualityScoreFrom(col("n_chars"), col("_swr"), col("_punct")), 6)
        .as("quality"),
      docFingerprintFromTokens(col("_toks")).as("fingerprint"))
  }

  /** Repetition statistics (Gopher-style curation signal): the share of
    * a document's word n-gram OCCURRENCES taken by its single most
    * repeated n-gram. Boilerplate, keyword-stuffed, and
    * degenerate-generation text scores high; diverse prose scores
    * ~1/n_grams.
    *
    * Relational shape, not a per-row array fold: explode n-grams →
    * count per (doc, gram) → max/sum per doc. Both aggregations combine
    * map-side; the shuffle key (doc, gram) is what bounds skew — a
    * pathological single-document corpus still distributes across its
    * distinct grams. Docs with fewer than n tokens yield no grams and
    * are reported with n_grams = 0 and ratio 0.0 (left join back).
    *
    * @return (id, n_grams, max_gram_count, rep_ratio) */
  def repetitionStats(
      docs: DataFrame, idCol: String, textCol: String, n: Int = 3): DataFrame = {
    val base = Par.ensureMapParallelism(docs)
      .select(col(idCol).as("id"), wordShinglesAll(col(textCol), n).as("grams"))
      .transform(graft.CacheScope.pin) // exploded counts + left-join base
    val perGram = base
      .select(col("id"), explode(col("grams")).as("gram"))
      .groupBy("id", "gram").agg(count(lit(1)).as("c"))
    val stats = perGram.groupBy("id").agg(
      sum("c").as("n_grams"),
      max("c").as("max_gram_count"))
    base.select("id").join(stats, Seq("id"), "left")
      .select(
        col("id"),
        coalesce(col("n_grams"), lit(0L)).as("n_grams"),
        coalesce(col("max_gram_count"), lit(0L)).as("max_gram_count"),
        rnd(
          when(col("n_grams").isNull, 0.0)
            .otherwise(col("max_gram_count").cast("double") /
              col("n_grams").cast("double")), 6).as("rep_ratio"))
  }

  /** Boilerplate patterns for [[cleanText]]. Deliberately within the
    * regex subset Java and RE2 evaluate identically (no backrefs, no
    * lookaround, greedy character classes only) so the cleaning is
    * oracle-mirrorable. */
  val UrlPattern = "https?://[^ \\t\\n]+"
  val TagPattern = "<[^<>]+>"

  /** Text cleaning for training-data pipelines: strip URLs and markup
    * tags (replaced by a single space so token boundaries survive),
    * collapse whitespace runs, trim. Pure map stage — composes with
    * [[analyze]]/[[repetitionStats]] downstream of the same scan. */
  def cleanText(text: Column): Column =
    trim(regexp_replace(
      regexp_replace(regexp_replace(text, UrlPattern, " "), TagPattern, " "),
      "[ \\t\\n]+", " "))

  /** Cleaning report per document: counts of removed artifacts and the
    * before/after sizes. @return (id, n_urls, n_tags, n_chars_raw,
    * n_chars_clean, clean_text) */
  def cleanStats(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    Par.ensureMapParallelism(docs).select(
      col(idCol).as("id"),
      regexp_count(col(textCol), lit(UrlPattern)).cast("long").as("n_urls"),
      regexp_count(col(textCol), lit(TagPattern)).cast("long").as("n_tags"),
      length(col(textCol)).cast("long").as("n_chars_raw"),
      length(cleanText(col(textCol))).cast("long").as("n_chars_clean"),
      cleanText(col(textCol)).as("clean_text"))

  /** Per-document distinctive terms — the TF-IDF shape with INTEGER-ONLY
    * ranking: terms ordered by (tf desc, df asc, term asc), top `k` kept.
    * Float IDF (tf·ln(N/df)) is deliberately avoided: natural-log results
    * can differ in the last ulp across engines, which would flip ranks on
    * near-ties and make the operator non-mirrorable; the lexicographic
    * (tf, df) order is monotone in each TF-IDF argument and exact
    * everywhere. Shuffles: explode → (id, term) partial-agg count,
    * term-keyed df join, id-windowed top-k (WindowGroupLimit prunes
    * map-side). @return (id, term, tf, df, rnk) */
  def distinctiveTerms(
      docs: DataFrame, idCol: String, textCol: String, k: Int): DataFrame = {
    val tf = Par.ensureMapParallelism(docs)
      .select(col(idCol).as("id"), explode(tokens(col(textCol))).as("term"))
      .groupBy("id", "term").agg(count(lit(1)).as("tf"))
      .transform(graft.CacheScope.pin) // df derives from it AND joins back
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("id")
      .orderBy(col("tf").desc, col("df").asc, col("term").asc)
    tf.join(dfreq, Seq("term"))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select("id", "term", "tf", "df", "rnk")
  }

  /** PII patterns, same portable regex subset as the cleaning patterns
    * (no backrefs/lookaround, so Java and RE2 agree). The library is
    * extensible per deployment; these two prove the scrub plumbing. */
  val EmailPattern = "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}"
  val PhonePattern = "\\+[0-9]{1,2} \\([0-9]{3}\\) [0-9]{3}-[0-9]{4}"

  /** Replace every email/phone occurrence with a typed placeholder. */
  def redactPii(text: Column): Column =
    regexp_replace(
      regexp_replace(text, EmailPattern, "<EMAIL>"),
      PhonePattern, "<PHONE>")

  /** PII scrub report per document — the redaction step a training
    * pipeline runs before text ever reaches a tokenizer. Pure map stage
    * (no shuffle): counts of each PII class plus the redacted text.
    * @return (id, n_emails, n_phones, redacted_text) */
  def piiScrub(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    Par.ensureMapParallelism(docs).select(
      col(idCol).as("id"),
      regexp_count(col(textCol), lit(EmailPattern)).cast("long").as("n_emails"),
      regexp_count(col(textCol), lit(PhonePattern)).cast("long").as("n_phones"),
      redactPii(col(textCol)).as("redacted_text"))

  /** Per-document average bigram log-probability under the corpus's OWN
    * bigram model — the KenLM-style fluency/typicality signal without an
    * external LM: text whose word transitions are common in the corpus
    * scores near 0, unusual phrasing scores deeply negative. Used as a
    * quality filter (drop the weird tail) and a boilerplate amplifier
    * (templated text scores anomalously high).
    *
    * Model: P(w2|w1) = c(w1,w2) / c(w1,·) with counts over the whole
    * corpus (self-inclusive, so every observed bigram has mass — no
    * smoothing needed); score = mean ln P over the doc's bigrams; docs
    * with < 2 tokens report (0, 0.0).
    *
    * Scale shape: bigram explode → two partial-agg count tables →
    * (w1, w2)- and (w1)-keyed equi-joins back to the occurrences → one
    * per-doc aggregation. Everything shuffles on token keys (skew =
    * stopword bigrams — AQE handles; or salt the top-k hot keys).
    * Mirrorable under the hash gate by the q71 argument: ln is within
    * 1 ulp across engines and the score is portable-rounded; no
    * ordering is derived from the float.
    *
    * @return (id, n_bigrams, avg_logprob) */
  def bigramLogProb(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toked = Par.ensureMapParallelism(docs)
      .select(col(idCol).as("id"), tokens(col(textCol)).as("toks"))
      .transform(graft.CacheScope.pin) // bigrams AND the all-docs join read it
    val bi = toked
      .select(col("id"), col("toks"), posexplode(col("toks")).as(Seq("pos", "w1")))
      .select(col("id"), col("w1"),
        // try_: ANSI element_at throws past the end; the last token has
        // no successor and must yield NULL → filtered
        try_element_at(col("toks"), col("pos") + 2).as("w2"))
      .filter(col("w2").isNotNull)
      .transform(graft.CacheScope.pin) // the type agg AND the score join read it
    // ONE stream shuffle: the unigram marginal is Σ over bigram types,
    // and the score attaches per TYPE before a single join back
    val big = bi.groupBy("w1", "w2").agg(count(lit(1)).as("cb"))
    val uni = big.groupBy("w1").agg(sum("cb").as("cu"))
    val scored = big.join(uni, Seq("w1"))
      .select(col("w1"), col("w2"),
        log(col("cb").cast("double") / col("cu").cast("double")).as("lp"))
    val perDoc = bi
      .join(scored, Seq("w1", "w2"))
      .groupBy("id")
      .agg(count(lit(1)).as("n_bigrams"),
        graft.functions.PortableMath.rnd(
          sum(col("lp")) / count(lit(1)), 6).as("avg_logprob"))
    toked.select(col("id")).join(perDoc, Seq("id"), "left")
      .select(col("id"),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(col("avg_logprob"), lit(0.0)).as("avg_logprob"))
  }

  /** Trigram LM scoring — [[bigramLogProb]] with one more token of
    * context: per-doc mean ln P(w3 | w1 w2) under the corpus's own
    * trigram/context counts. Longer context sharpens the fluency signal
    * (boilerplate and template text score near 0: their trigrams are
    * deterministic given two tokens; scrambled text scores deeply
    * negative) at the price of sparser counts — on a corpus the size of
    * the doc table most trigrams are singletons, which is itself a
    * useful memorization/duplication signal. Same scale shape as the
    * bigram: explode once, two token-keyed count aggregations, keyed
    * score joins, portable-rounded mean (the q71 float argument).
    *
    * @return (id, n_trigrams, avg_logprob) */
  def trigramLogProb(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toked = Par.ensureMapParallelism(docs)
      .select(col(idCol).as("id"), tokens(col(textCol)).as("toks"))
      .transform(graft.CacheScope.pin) // trigrams AND the all-docs join read it
    val tri = toked
      .select(col("id"), col("toks"), posexplode(col("toks")).as(Seq("pos", "w1")))
      .select(col("id"), col("w1"),
        try_element_at(col("toks"), col("pos") + 2).as("w2"),
        try_element_at(col("toks"), col("pos") + 3).as("w3"))
      .filter(col("w3").isNotNull) // implies w2 non-null
      .transform(graft.CacheScope.pin) // the type agg AND the score join read it
    // ONE stream shuffle: context marginal = Σ over trigram types,
    // score per TYPE, single join back (the bigramLogProb argument)
    val tcnt = tri.groupBy("w1", "w2", "w3").agg(count(lit(1)).as("ct"))
    val ctx = tcnt.groupBy("w1", "w2").agg(sum("ct").as("cc"))
    val scored = tcnt.join(ctx, Seq("w1", "w2"))
      .select(col("w1"), col("w2"), col("w3"),
        log(col("ct").cast("double") / col("cc").cast("double")).as("lp"))
    val perDoc = tri
      .join(scored, Seq("w1", "w2", "w3"))
      .groupBy("id")
      .agg(count(lit(1)).as("n_trigrams"),
        graft.functions.PortableMath.rnd(
          sum(col("lp")) / count(lit(1)), 6).as("avg_logprob"))
    toked.select(col("id")).join(perDoc, Seq("id"), "left")
      .select(col("id"),
        coalesce(col("n_trigrams"), lit(0L)).as("n_trigrams"),
        coalesce(col("avg_logprob"), lit(0.0)).as("avg_logprob"))
  }

  /** Character-trigram LM scoring — the TOKENIZER-FREE fluency signal:
    * per-doc mean ln P(c₃ | c₁c₂) under the corpus's own char-trigram
    * counts. Where [[bigramLogProb]]/[[trigramLogProb]] presuppose a
    * tokenization (and go blind on scripts the tokenizer mangles),
    * char-level statistics catch mojibake, base64/hex blobs, ransom-
    * note casing and wrong-script text in ANY language — the standard
    * first-pass garbage detector for web-scale corpora. Same scale
    * shape: one explode over char positions (O(total chars) rows),
    * two (ctx, next)-keyed count aggregations, keyed score joins,
    * portable-rounded mean (the q71 float argument).
    *
    * @return (id, n_cgrams, avg_logprob) */
  def charTrigramLogProb(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val base = Par.ensureMapParallelism(docs)
      .select(col(idCol).as("id"), col(textCol).as("_t"))
      .transform(graft.CacheScope.pin) // grams AND the all-docs join read it
    // guard BEFORE sequence(): Spark's sequence(0, n) with n < 0 builds
    // a DESCENDING sequence instead of an empty one
    val tri = base
      .filter(length(col("_t")) >= 3)
      .select(col("id"), col("_t"),
        posexplode(sequence(lit(0), length(col("_t")) - 3)))
      .select(col("id"),
        expr("substring(_t, pos + 1, 2)").as("ctx"),
        expr("substring(_t, pos + 3, 1)").as("nxt"))
      .transform(graft.CacheScope.pin) // the type agg AND the score join read it
    // ONE stream shuffle: context marginal = Σ over gram types, score
    // per TYPE, single join back (the bigramLogProb argument)
    val tcnt = tri.groupBy("ctx", "nxt").agg(count(lit(1)).as("ct"))
    val ccnt = tcnt.groupBy("ctx").agg(sum("ct").as("cc"))
    val scored = tcnt.join(ccnt, Seq("ctx"))
      .select(col("ctx"), col("nxt"),
        log(col("ct").cast("double") / col("cc").cast("double")).as("lp"))
    val perDoc = tri
      .join(scored, Seq("ctx", "nxt"))
      .groupBy("id")
      .agg(count(lit(1)).as("n_cgrams"),
        graft.functions.PortableMath.rnd(
          sum(col("lp")) / count(lit(1)), 6).as("avg_logprob"))
    base.select(col("id")).join(perDoc, Seq("id"), "left")
      .select(col("id"),
        coalesce(col("n_cgrams"), lit(0L)).as("n_cgrams"),
        coalesce(col("avg_logprob"), lit(0.0)).as("avg_logprob"))
  }

  /** Jelinek-Mercer interpolated LM — the production form of the
    * [[bigramLogProb]]/[[trigramLogProb]] family: per-doc mean
    * ln(λ₃·P(w₃|w₁w₂) + λ₂·P(w₃|w₂) + λ₁·P(w₃)), blending trigram
    * sharpness with bigram/unigram robustness (a pure trigram LM
    * over-rewards text whose exact trigrams are frequent — template
    * boilerplate — while interpolation keeps rare-but-wellformed text
    * from being under-scored). Standard λ = (0.6, 0.3, 0.1).
    *
    * Exact-mirror argument (q71 family): each component probability is
    * one IEEE division on integer counts; the weighted sum is three
    * correctly-rounded multiplies + two adds on bit-identical operands;
    * ln is within 1 ulp; the per-doc mean is portable-rounded and no
    * rank derives from the float. Scale shape: ONE trigram explode,
    * shuffled once into the trigram-type table; every lower-order count
    * aggregates that compact relation, the blend is scored per TYPE,
    * and one keyed join carries it back to the occurrence stream.
    *
    * @return (id, n_trigrams, avg_logprob) */
  def interpolatedLogProb(
      docs: DataFrame, idCol: String, textCol: String,
      l3: Double = 0.6, l2: Double = 0.3, l1: Double = 0.1): DataFrame = {
    val toked = Par.ensureMapParallelism(docs)
      .select(col(idCol).as("id"), tokens(col(textCol)).as("toks"))
      .transform(graft.CacheScope.pin)
    val tri = toked
      .select(col("id"), col("toks"), posexplode(col("toks")).as(Seq("pos", "w1")))
      .select(col("id"), col("w1"),
        try_element_at(col("toks"), col("pos") + 2).as("w2"),
        try_element_at(col("toks"), col("pos") + 3).as("w3"))
      .filter(col("w3").isNotNull)
      .transform(graft.CacheScope.pin) // trigram-type agg + score join read it
    // ALL lower-order stats are exact sums over the distinct-trigram
    // table (cc(w1,w2) = Σ_{w3} ct, …, ctot = Σ ct): the token stream is
    // shuffled ONCE into tcnt and every marginal aggregates that compact
    // relation. The probability is then scored once per trigram TYPE and
    // joined back to the stream in a single keyed join — at corpus scale
    // this replaces five stream-wide joins + five stream re-scans.
    val tcnt = tri.groupBy("w1", "w2", "w3").agg(count(lit(1)).as("ct"))
      .transform(graft.CacheScope.pin)
    val ctx = tcnt.groupBy("w1", "w2").agg(sum("ct").as("cc"))
    // bigram/unigram stats over the SAME trigram positions (w2, w3):
    // self-consistent support — every scored position contributes to
    // every order's counts exactly once
    val bcnt = tcnt.groupBy("w2", "w3").agg(sum("ct").as("cb"))
    val ucnt2 = tcnt.groupBy("w2").agg(sum("ct").as("cu"))
    val wcnt = tcnt.groupBy("w3").agg(sum("ct").as("cw"))
    val total = tcnt.agg(sum("ct").as("ctot"))
    val p = lit(l3) * (col("ct").cast("double") / col("cc").cast("double")) +
      lit(l2) * (col("cb").cast("double") / col("cu").cast("double")) +
      lit(l1) * (col("cw").cast("double") / col("ctot").cast("double"))
    val scored = tcnt
      .join(ctx, Seq("w1", "w2"))
      .join(bcnt, Seq("w2", "w3"))
      .join(ucnt2, Seq("w2"))
      .join(wcnt, Seq("w3"))
      .crossJoin(broadcast(total)) // 1-row stats join (scale-free BNLJ)
      .select(col("w1"), col("w2"), col("w3"), log(p).as("lp"))
    val perDoc = tri
      .join(scored, Seq("w1", "w2", "w3"))
      .groupBy("id")
      .agg(count(lit(1)).as("n_trigrams"),
        graft.functions.PortableMath.rnd(
          sum(col("lp")) / count(lit(1)), 6).as("avg_logprob"))
    toked.select(col("id")).join(perDoc, Seq("id"), "left")
      .select(col("id"),
        coalesce(col("n_trigrams"), lit(0L)).as("n_trigrams"),
        coalesce(col("avg_logprob"), lit(0.0)).as("avg_logprob"))
  }

  /** Kneser-Ney-style absolutely-discounted bigram LM — the strongest
    * classical n-gram smoother, one rung above [[interpolatedLogProb]]'s
    * Jelinek-Mercer blend: per-doc mean of
    * ln( max(c(w₁w₂)−D, 0)/c(w₁·) + D·N₁₊(w₁·)/c(w₁·) · P_cont(w₂) ),
    * P_cont(w₂) = N₁₊(·w₂)/N₁₊(··) — the CONTINUATION probability
    * (how many distinct contexts a word follows) rather than raw
    * frequency, which is what makes KN resist the "Francisco problem"
    * (frequent-but-bound words like the second half of a collocation
    * stop masquerading as fluent continuations). D = 0.75, the
    * standard discount.
    *
    * Exactness (q71 family argument): every statistic is an integer
    * count (bigram counts, distinct-successor/predecessor counts,
    * distinct bigram types); D = 0.75 is exactly representable, so
    * c − D is exact; the probability is a fixed association of IEEE
    * ops on bit-identical operands; ln within 1 ulp; rounded mean, no
    * rank from the float. Scale shape: one bigram explode, shuffled
    * once into the type table; marginals and distinct-counts aggregate
    * that compact relation, the score attaches per TYPE, and a single
    * keyed join carries it back to the stream; one 1-row type-count
    * broadcast.
    *
    * @return (id, n_bigrams, avg_logprob) */
  def kneserNeyLogProb(
      docs: DataFrame, idCol: String, textCol: String,
      discount: Double = 0.75): DataFrame = {
    val toked = Par.ensureMapParallelism(docs)
      .select(col(idCol).as("id"), tokens(col(textCol)).as("toks"))
      .transform(graft.CacheScope.pin)
    val bi = toked
      .select(col("id"), col("toks"), posexplode(col("toks")).as(Seq("pos", "w1")))
      .select(col("id"), col("w1"),
        try_element_at(col("toks"), col("pos") + 2).as("w2"))
      .filter(col("w2").isNotNull)
      .transform(graft.CacheScope.pin) // type agg + score join read it
    val big = bi.groupBy("w1", "w2").agg(count(lit(1)).as("cb"))
      .transform(graft.CacheScope.pin) // every other stat derives from it
    // token marginal = Σ over types; distinct successor / predecessor /
    // total type counts — over TYPES (the big table), not tokens: the
    // continuation-count definition. The stream is shuffled ONCE (into
    // big); all four stat tables aggregate that compact relation.
    val uni = big.groupBy("w1").agg(sum("cb").as("cu"))
    val n1fw = big.groupBy("w1").agg(count(lit(1)).as("n1f"))
    val n1bw = big.groupBy("w2").agg(count(lit(1)).as("n1b"))
    val nbt = big.agg(count(lit(1)).as("nbt"))
    val d = lit(discount)
    val p = greatest(col("cb").cast("double") - d, lit(0.0)) /
      col("cu").cast("double") +
      (d * col("n1f").cast("double") / col("cu").cast("double")) *
      (col("n1b").cast("double") / col("nbt").cast("double"))
    // score once per bigram TYPE, then ONE keyed join back to the stream
    val scored = big
      .join(uni, Seq("w1"))
      .join(n1fw, Seq("w1"))
      .join(n1bw, Seq("w2"))
      .crossJoin(broadcast(nbt)) // 1-row type-count join (scale-free BNLJ)
      .select(col("w1"), col("w2"), log(p).as("lp"))
    val perDoc = bi
      .join(scored, Seq("w1", "w2"))
      .groupBy("id")
      .agg(count(lit(1)).as("n_bigrams"),
        graft.functions.PortableMath.rnd(
          sum(col("lp")) / count(lit(1)), 6).as("avg_logprob"))
    toked.select(col("id")).join(perDoc, Seq("id"), "left")
      .select(col("id"),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(col("avg_logprob"), lit(0.0)).as("avg_logprob"))
  }

  /** Modified Kneser-Ney bigram LM — Chen & Goodman's refinement of
    * [[kneserNeyLogProb]]: instead of one discount D for every count,
    * three count-bucketed discounts D₁/D₂/D₃₊ estimated FROM the corpus
    * via the count-of-counts (the deleted-estimation closed form):
    *   Y  = n₁ / (n₁ + 2·n₂)
    *   D₁ = 1 − 2·Y·n₂/n₁,  D₂ = 2 − 3·Y·n₃/n₂,  D₃₊ = 3 − 4·Y·n₄/n₃
    * where nₖ = number of bigram TYPES with count exactly k. Each bigram
    * is discounted by D(c) per its own count bucket, and the redistributed
    * mass λ(w₁) = (D₁·N₁(w₁·) + D₂·N₂(w₁·) + D₃₊·N₃₊(w₁·)) / c(w₁·)
    * (Nₖ(w₁·) = successor types of w₁ in bucket k) backs off to the same
    * continuation probability P_cont(w₂) = N₁₊(·w₂)/N₁₊(··) as plain KN:
    *   P(w₂|w₁) = max(c − D(c), 0)/c(w₁·) + λ(w₁)·P_cont(w₂).
    * This is the strongest classical n-gram smoother (consistently beats
    * single-discount KN in held-out perplexity) — singletons, which are
    * mostly noise, get a near-total discount while high-count bigrams
    * keep almost all their mass.
    *
    * Exactness (q71 family argument): every statistic is an integer
    * count; Y and the three discounts are a FIXED association of IEEE
    * ops on those integers (left-assoc `a/(a+2b)`, `1−2·Y·n₂/n₁` etc.,
    * mirrored verbatim in the oracle SQL), so both engines compute
    * bit-identical discounts; the per-bigram probability is then the
    * same fixed association; ln within 1 ulp; portable-rounded mean, no
    * rank from the float. Chen & Goodman assume n₁..n₄ > 0 (true of any
    * natural-language corpus); template-heavy corpora can EMPTY the low
    * buckets (the sf0.1 documents table has n₁ = n₂ = 0), so each
    * discount is guarded (empty bucket → D_k = 0, exactly the mass the
    * λ term loses anyway) and clamped into [0, k], keeping the smoother
    * a proper distribution on any count spectrum — see the inline
    * comment.
    *
    * Scale shape: identical to [[kneserNeyLogProb]] — one bigram explode
    * feeds the type table, per-w₁ bucketed successor counts come from
    * ONE conditional-sum groupBy over types (no extra shuffle vs plain
    * KN), and the count-of-counts is a single 1-row broadcast
    * (scale-free BNLJ).
    *
    * @return (id, n_bigrams, avg_logprob) */
  def modifiedKneserNeyLogProb(
      docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toked = Par.ensureMapParallelism(docs)
      .select(col(idCol).as("id"), tokens(col(textCol)).as("toks"))
      .transform(graft.CacheScope.pin)
    val bi = toked
      .select(col("id"), col("toks"), posexplode(col("toks")).as(Seq("pos", "w1")))
      .select(col("id"), col("w1"),
        try_element_at(col("toks"), col("pos") + 2).as("w2"))
      .filter(col("w2").isNotNull)
      .transform(graft.CacheScope.pin) // type agg + score join read it
    val big = bi.groupBy("w1", "w2").agg(count(lit(1)).as("cb"))
      .transform(graft.CacheScope.pin) // every derived table reads it
    // token marginal as Σ over types — one stream shuffle total (the
    // kneserNeyLogProb argument)
    val uni = big.groupBy("w1").agg(sum("cb").as("cu"))
    // per-w1 successor-type buckets: |{w2 : c(w1,w2) = 1}| etc. — one
    // conditional-sum aggregation over TYPES; every w1 appears (≥1 type)
    val nw = big.groupBy("w1").agg(
      sum(when(col("cb") === 1, 1L).otherwise(0L)).as("n1w"),
      sum(when(col("cb") === 2, 1L).otherwise(0L)).as("n2w"),
      sum(when(col("cb") >= 3, 1L).otherwise(0L)).as("n3w"))
    val n1bw = big.groupBy("w2").agg(count(lit(1)).as("n1b"))
    // 1-row corpus statistics: count-of-counts buckets + total types
    val coc = big.agg(
      sum(when(col("cb") === 1, 1L).otherwise(0L)).as("n1"),
      sum(when(col("cb") === 2, 1L).otherwise(0L)).as("n2"),
      sum(when(col("cb") === 3, 1L).otherwise(0L)).as("n3"),
      sum(when(col("cb") === 4, 1L).otherwise(0L)).as("n4"),
      count(lit(1)).as("nbt"))
    val n1d = col("n1").cast("double"); val n2d = col("n2").cast("double")
    val n3d = col("n3").cast("double"); val n4d = col("n4").cast("double")
    // fixed association, mirrored verbatim in SQL: */ left-assoc.
    // Degenerate-bucket guards (CASE short-circuits in both engines, so
    // the guarded divisions never evaluate): an EMPTY bucket k gets
    // D_k = 0 — it is never applied to a numerator (no bigram has that
    // count) and contributes 0·N_k = 0 to λ, whereas the unguarded
    // closed form is 0/0 = NaN and NaN·0 poisons every score (hit on
    // the sf0.1 corpus: n1 = n2 = 0, a template-heavy count spectrum).
    // Discounts additionally clamp into [0, k]: a pathological spectrum
    // can push the closed form negative (probability > MLE mass) or
    // past k (negative numerator); inside [0, k] the smoother stays a
    // proper distribution (λ ≥ 0, p > 0) on ANY input.
    val yv = when(n1d + lit(2.0) * n2d === 0.0, lit(0.0))
      .otherwise(n1d / (n1d + lit(2.0) * n2d))
    def clamp(raw: Column, k: Double): Column =
      least(greatest(raw, lit(0.0)), lit(k))
    val d1 = when(col("n1") === 0, lit(0.0))
      .otherwise(clamp(lit(1.0) - lit(2.0) * yv * n2d / n1d, 1.0))
    val d2 = when(col("n2") === 0, lit(0.0))
      .otherwise(clamp(lit(2.0) - lit(3.0) * yv * n3d / n2d, 2.0))
    val d3 = when(col("n3") === 0, lit(0.0))
      .otherwise(clamp(lit(3.0) - lit(4.0) * yv * n4d / n3d, 3.0))
    val dc = when(col("cb") === 1, d1).when(col("cb") === 2, d2).otherwise(d3)
    val cud = col("cu").cast("double")
    val lam = (d1 * col("n1w").cast("double") + d2 * col("n2w").cast("double") +
      d3 * col("n3w").cast("double")) / cud
    val p = greatest(col("cb").cast("double") - dc, lit(0.0)) / cud +
      lam * (col("n1b").cast("double") / col("nbt").cast("double"))
    // score once per bigram TYPE, then ONE keyed join back to the stream
    val scored = big
      .join(uni, Seq("w1"))
      .join(nw, Seq("w1"))
      .join(n1bw, Seq("w2"))
      .crossJoin(broadcast(coc)) // 1-row stats join (scale-free BNLJ)
      .select(col("w1"), col("w2"), log(p).as("lp"))
    val perDoc = bi
      .join(scored, Seq("w1", "w2"))
      .groupBy("id")
      .agg(count(lit(1)).as("n_bigrams"),
        graft.functions.PortableMath.rnd(
          sum(col("lp")) / count(lit(1)), 6).as("avg_logprob"))
    toked.select(col("id")).join(perDoc, Seq("id"), "left")
      .select(col("id"),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(col("avg_logprob"), lit(0.0)).as("avg_logprob"))
  }

  /** Interpolated trigram Kneser-Ney — the full two-level KN stack, the
    * canonical strongest classical LM: the highest order discounts RAW
    * trigram counts; every lower order uses CONTINUATION counts (type
    * counts of distinct left-contexts), the defining Kneser-Ney move:
    *   P(w₃|w₁w₂) = max(c(w₁w₂w₃)−D,0)/c(w₁w₂·)
    *                + D·N₁₊(w₁w₂·)/c(w₁w₂·) · P_kn(w₃|w₂)
    *   P_kn(w₃|w₂) = max(N₁₊(·w₂w₃)−D,0)/N₁₊(·w₂·)
    *                + D·N₁₊(w₂·)/N₁₊(·w₂·) · P_kn(w₃)
    *   P_kn(w₃)    = N₁₊(·w₃)/N₁₊(··)
    * with N₁₊(·w₂w₃) = |{w₁ : c(w₁w₂w₃)>0}| (how many distinct contexts
    * the bigram w₂w₃ continues), N₁₊(·w₂·) = Σ_{w₃} N₁₊(·w₂w₃),
    * N₁₊(w₂·) = distinct w₃ following w₂ among continuation types,
    * N₁₊(·w₃) = distinct w₂ preceding w₃ among continuation types, and
    * N₁₊(··) = total (w₂,w₃) continuation types. D = 0.75 at both
    * levels (single-discount interpolated KN).
    *
    * Exactness (q71 family): every statistic is an integer count
    * derived from the trigram-type table; D exactly representable; the
    * probability is ONE fixed association of IEEE ops (the inner P_kn
    * bracket first, then the outer interpolation — mirrored verbatim);
    * ln within 1 ulp; portable-rounded mean; no rank from the float.
    *
    * Scale shape: one trigram explode, shuffled ONCE into the type
    * table tcnt — the hub every other statistic aggregates (ctx/n1fTri
    * group it by (w₁,w₂); the continuation-type table biTypes by
    * (w₂,w₃); midDen/n1fBi/contW group biTypes; one 1-row broadcast
    * for N₁₊(··)). The probability is scored once per trigram TYPE
    * (seven type-keyed joins over compact relations) and joined back
    * to the occurrence stream in a single keyed join — the same
    * shuffle set a production KenLM-style counter runs.
    *
    * @return (id, n_trigrams, avg_logprob) */
  def kneserNeyTrigramLogProb(
      docs: DataFrame, idCol: String, textCol: String,
      discount: Double = 0.75): DataFrame = {
    val toked = Par.ensureMapParallelism(docs)
      .select(col(idCol).as("id"), tokens(col(textCol)).as("toks"))
      .transform(graft.CacheScope.pin)
    val tri = toked
      .select(col("id"), col("toks"), posexplode(col("toks")).as(Seq("pos", "w1")))
      .select(col("id"), col("w1"),
        try_element_at(col("toks"), col("pos") + 2).as("w2"),
        try_element_at(col("toks"), col("pos") + 3).as("w3"))
      .filter(col("w3").isNotNull)
      .transform(graft.CacheScope.pin) // type agg + score join read it
    val tcnt = tri.groupBy("w1", "w2", "w3").agg(count(lit(1)).as("ct"))
      .transform(graft.CacheScope.pin) // every derived table reads it
    // context marginal as Σ over types — one stream shuffle total
    val ctx = tcnt.groupBy("w1", "w2").agg(sum("ct").as("cc"))
    // distinct w3 successors per (w1,w2) — over trigram TYPES
    val n1fTri = tcnt.groupBy("w1", "w2").agg(count(lit(1)).as("nf3"))
    // continuation types: distinct left-contexts per (w2,w3)
    val biTypes = tcnt.groupBy("w2", "w3").agg(count(lit(1)).as("cc2"))
      .transform(graft.CacheScope.pin) // midDen/n1fBi/contW/total derive
    val midDen = biTypes.groupBy("w2").agg(sum(col("cc2")).as("md"))
    val n1fBi = biTypes.groupBy("w2").agg(count(lit(1)).as("nf2"))
    val contW = biTypes.groupBy("w3").agg(count(lit(1)).as("cw"))
    val tot = biTypes.agg(count(lit(1)).as("ntt"))
    val d = lit(discount)
    // inner bracket (P_kn(w3|w2)) first, then the outer interpolation —
    // the association the SQL mirror reproduces token-for-token
    val pInner = greatest(col("cc2").cast("double") - d, lit(0.0)) /
      col("md").cast("double") +
      (d * col("nf2").cast("double") / col("md").cast("double")) *
      (col("cw").cast("double") / col("ntt").cast("double"))
    val p = greatest(col("ct").cast("double") - d, lit(0.0)) /
      col("cc").cast("double") +
      (d * col("nf3").cast("double") / col("cc").cast("double")) * pInner
    // score once per trigram TYPE, then ONE keyed join back to the
    // stream (seven type-keyed joins over compact relations instead of
    // seven stream-wide joins)
    val scored = tcnt
      .join(ctx, Seq("w1", "w2"))
      .join(n1fTri, Seq("w1", "w2"))
      .join(biTypes, Seq("w2", "w3"))
      .join(midDen, Seq("w2"))
      .join(n1fBi, Seq("w2"))
      .join(contW, Seq("w3"))
      .crossJoin(broadcast(tot)) // 1-row type-count join (scale-free BNLJ)
      .select(col("w1"), col("w2"), col("w3"), log(p).as("lp"))
    val perDoc = tri
      .join(scored, Seq("w1", "w2", "w3"))
      .groupBy("id")
      .agg(count(lit(1)).as("n_trigrams"),
        graft.functions.PortableMath.rnd(
          sum(col("lp")) / count(lit(1)), 6).as("avg_logprob"))
    toked.select(col("id")).join(perDoc, Seq("id"), "left")
      .select(col("id"),
        coalesce(col("n_trigrams"), lit(0L)).as("n_trigrams"),
        coalesce(col("avg_logprob"), lit(0.0)).as("avg_logprob"))
  }

  /** Top-k collocations by pointwise mutual information — the corpus's
    * strongest word pairings ("new york", "machine learning"): bigrams
    * whose joint frequency far exceeds what their marginals predict,
    *   PMI(w₁,w₂) = ln( c(w₁w₂)·N / (c₁(w₁)·c₂(w₂)) )
    * with c₁/c₂ the position-marginal counts (occurrences as first /
    * second element of a bigram) and N the total bigram positions — the
    * self-consistent support under which Σ p(w₁,·) = Σ p(·,w₂) = 1.
    * `minCount` suppresses the classic PMI pathology (singleton pairs
    * maximize PMI by definition); the standard audit for tokenizer
    * merge candidates, multi-word entities, and boilerplate phrases.
    *
    * Exactness: integer counts; the ratio is computed in ONE fixed
    * association (c·N)/(c₁·c₂) — products as doubles (no i64 overflow
    * at any corpus size); ln within 1 ulp → ROUND-BEFORE-RANK (the q71
    * device): both engines rank by the portable-ROUNDED score with a
    * (w₁,w₂) tie-break, so the top-k cut is cross-engine identical.
    *
    * Scale shape: the corpus is exploded and shuffled ONCE — the
    * (w1,w2) pair-count aggregation (map-side combined). The marginals
    * and the total are exact sums OVER the pair table (c₁(w) =
    * Σ_{w₂} c(w,w₂), N = Σ c), so they aggregate the compact distinct-
    * bigram relation instead of re-scanning the token stream — at
    * corpus scale that is the difference between one wide shuffle and
    * four (measured 2.9× on this query family at sf0.1). Then two
    * keyed joins + 1-row broadcast → global top-k via orderBy+limit =
    * TakeOrderedAndProject (per-partition heaps, no global sort); the
    * rank window runs over k rows.
    *
    * @return (w1, w2, n_pair, pmi, rnk), rnk 1..k by (pmi desc, w1, w2) */
  def pmiCollocations(
      docs: DataFrame, idCol: String, textCol: String,
      k: Int, minCount: Long = 5L): DataFrame = {
    val pair = Par.ensureMapParallelism(docs)
      .select(tokens(col(textCol)).as("toks"))
      .select(col("toks"), posexplode(col("toks")).as(Seq("pos", "w1")))
      .select(col("w1"),
        try_element_at(col("toks"), col("pos") + 2).as("w2"))
      .filter(col("w2").isNotNull)
      .groupBy("w1", "w2").agg(count(lit(1)).as("n_pair"))
      .transform(graft.CacheScope.pin) // marginals + total derive from it
    val left = pair.groupBy("w1").agg(sum("n_pair").as("c1"))
    val right = pair.groupBy("w2").agg(sum("n_pair").as("c2"))
    val total = pair.agg(sum("n_pair").as("n"))
    val pmi = log((col("n_pair").cast("double") * col("n").cast("double")) /
      (col("c1").cast("double") * col("c2").cast("double")))
    val wRank = org.apache.spark.sql.expressions.Window
      .orderBy(col("pmi").desc, col("w1"), col("w2"))
    pair
      .filter(col("n_pair") >= minCount)
      .join(left, Seq("w1"))
      .join(right, Seq("w2"))
      .crossJoin(broadcast(total)) // 1-row total join (scale-free BNLJ)
      .withColumn("pmi", rnd(pmi, 6)) // round BEFORE rank: the q71 device
      .orderBy(col("pmi").desc, col("w1"), col("w2")).limit(k)
      .withColumn("rnk", row_number().over(wRank).cast("long"))
      .select("w1", "w2", "n_pair", "pmi", "rnk")
  }

  /** Per-document KL divergence from the corpus unigram distribution —
    * the domain-shift / outlier signal: D_KL(P_doc ‖ P_corpus) =
    * Σ_w p_d(w)·ln(p_d(w)/p_c(w)) over the doc's vocabulary, where
    * p_d = tf/|doc| and p_c = cf/N (corpus token frequencies,
    * self-inclusive so p_c > 0 wherever p_d > 0 — no smoothing needed
    * and the sum is always finite). Near-zero = the doc looks like the
    * corpus average; large = off-domain, wrong language, or boilerplate
    * with a skewed vocabulary. The standard curation use: drop or
    * re-weight the high-KL tail, or stratify a mixture by KL bands.
    *
    * Exactness (q71 family): tf/len/cf/N are integer counts; each term
    * is the fixed association (tf/len)·ln((tf/len)/(cf/N)); ln within
    * 1 ulp; the per-doc float sum is portable-rounded (reorder absorbed
    * at 6 dp) and no rank derives from it.
    *
    * Scale shape: one explode → (id,term) tf agg → term-keyed corpus
    * agg + join + 1-row broadcast → per-doc sum. Two token-keyed
    * shuffles, all map-side combined; stopword skew handled by AQE.
    *
    * @return (id, n_tokens, kl) */
  def klFromCorpus(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val base = Par.ensureMapParallelism(docs)
      .select(col(idCol).as("id"), tokens(col(textCol)).as("toks"))
      .transform(graft.CacheScope.pin) // tf AND the all-docs join read it
    val tf = base
      .select(col("id"), explode(col("toks")).as("term"))
      .groupBy("id", "term").agg(count(lit(1)).as("tf"))
      .transform(graft.CacheScope.pin) // doc-len, corpus counts, score read it
    val docLen = tf.groupBy("id").agg(sum(col("tf")).as("len"))
    val cf = tf.groupBy("term").agg(sum(col("tf")).as("cf"))
    val total = cf.agg(sum(col("cf")).as("n"))
    val pd = col("tf").cast("double") / col("len").cast("double")
    val pc = col("cf").cast("double") / col("n").cast("double")
    val perDoc = tf
      .join(docLen, Seq("id"))
      .join(cf, Seq("term"))
      .crossJoin(broadcast(total)) // 1-row total join (scale-free BNLJ)
      .withColumn("term_kl", pd * log(pd / pc))
      .groupBy("id")
      .agg(max(col("len")).as("n_tokens"), // constant within the group
        rnd(sum(col("term_kl")), 6).as("kl"))
    base.select(col("id")).join(perDoc, Seq("id"), "left")
      .select(col("id"),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        coalesce(col("kl"), lit(0.0)).as("kl"))
  }

  /** Per-source type/token statistics — the lexical-diversity panel of
    * a corpus audit: token count, vocabulary size (types), hapax count
    * (terms occurring once — in natural text ~half the vocabulary by
    * Zipf; far less in templated/boilerplate sources), type-token ratio
    * and hapax share. A source whose TTR collapses is template spam; a
    * source whose hapax ratio explodes is OCR noise or mojibake — the
    * two cheapest "is this source worth training on" signals.
    *
    * Exactness: everything is an integer count except the two ratios,
    * each ONE portable-rounded division. Scale shape: explode →
    * (source, term) partial agg → per-source conditional-sum agg — two
    * map-side-combined shuffles, output |sources| rows.
    *
    * @return (source, n_docs, n_tokens, n_types, n_hapax, ttr, hapax_ratio) */
  def typeTokenStats(docs: DataFrame, srcCol: String, textCol: String): DataFrame = {
    val base = Par.ensureMapParallelism(docs)
      .select(col(srcCol).as("source"), tokens(col(textCol)).as("toks"))
      .transform(graft.CacheScope.pin) // doc counts AND term stats read it
    val nd = base.groupBy("source").agg(count(lit(1)).as("n_docs"))
    val tf = base
      .select(col("source"), explode(col("toks")).as("term"))
      .groupBy("source", "term").agg(count(lit(1)).as("tf"))
    val stats = tf.groupBy("source").agg(
      sum(col("tf")).as("n_tokens"),
      count(lit(1)).as("n_types"),
      sum(when(col("tf") === 1, 1L).otherwise(0L)).as("n_hapax"))
    nd.join(stats, Seq("source"), "left")
      .select(col("source"), col("n_docs"),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        coalesce(col("n_types"), lit(0L)).as("n_types"),
        coalesce(col("n_hapax"), lit(0L)).as("n_hapax"),
        coalesce(rnd(col("n_types").cast("double") /
          col("n_tokens").cast("double"), 6), lit(0.0)).as("ttr"),
        coalesce(rnd(col("n_hapax").cast("double") /
          col("n_types").cast("double"), 6), lit(0.0)).as("hapax_ratio"))
  }

  /** Cross-source bigram transfer matrix — for every ordered pair
    * (train_source, eval_source): what fraction of the eval source's
    * bigram occurrences the train source's bigram LM has seen at all
    * (coverage), and the mean ln P(w₂|w₁) under the TRAIN model on the
    * covered part. This is the domain-transfer report a mixture
    * designer reads before weighting sources: high coverage + high
    * avg_lp = redundant with train; low coverage = novel (or noise —
    * cross-check [[typeTokenStats]]); the diagonal is the tautology
    * coverage = 1. Restricting avg_lp to COVERED bigrams sidesteps
    * smoothing: the two numbers together carry what a smoothed
    * cross-entropy would blend (and each is exactly mirrorable).
    *
    * Exactness: integer counts; per-type contribution is the fixed
    * association ce·ln(cb_t/cu_t); both outputs portable-rounded, no
    * rank from floats. Scale shape: one bigram explode → per-source
    * type table (the hub: eval side, train side, AND context counts
    * derive from it) → a (w₁,w₂)-keyed type-level join (occurrence
    * weights ride along — never an occurrence-level blowup) → an
    * S²-row aggregate. The S² output is inherent to a transfer matrix;
    * the shuffles are all token-keyed and map-side combined.
    *
    * @return (train_source, eval_source, n_covered, coverage, avg_logprob) */
  def crossSourceBigramTransfer(
      docs: DataFrame, srcCol: String, textCol: String): DataFrame = {
    val bi = Par.ensureMapParallelism(docs)
      .select(col(srcCol).as("src"), tokens(col(textCol)).as("toks"))
      .select(col("src"), col("toks"), posexplode(col("toks")).as(Seq("pos", "w1")))
      .select(col("src"), col("w1"),
        try_element_at(col("toks"), col("pos") + 2).as("w2"))
      .filter(col("w2").isNotNull)
    val types = bi.groupBy("src", "w1", "w2").agg(count(lit(1)).as("c"))
      .transform(graft.CacheScope.pin) // eval side, train side, contexts
    val totals = types.groupBy("src").agg(sum(col("c")).as("tocc"))
      .withColumnRenamed("src", "eval_source")
      .transform(graft.CacheScope.pin) // the grid AND coverage read it
    val ctx = types.groupBy("src", "w1").agg(sum(col("c")).as("cu"))
      .withColumnRenamed("src", "train_source")
    val ev = types.select(col("src").as("eval_source"),
      col("w1"), col("w2"), col("c").as("ce"))
    val tr = types.select(col("src").as("train_source"),
      col("w1"), col("w2"), col("c").as("cb"))
    val stats = ev
      .join(tr, Seq("w1", "w2")) // type-level: weights ride along
      .join(ctx, Seq("train_source", "w1"))
      .withColumn("lp", col("ce").cast("double") *
        log(col("cb").cast("double") / col("cu").cast("double")))
      .groupBy("train_source", "eval_source")
      .agg(sum(col("ce")).as("n_covered"), sum(col("lp")).as("lp_sum"))
    // S-row aggregate: hint it like every other tiny-side crossJoin in
    // this file — laundered stats must never sort-merge a source grid
    // (SCALE.md; r13 verdict hygiene #3)
    val grid = totals.select(col("eval_source"), col("tocc"))
      .crossJoin(broadcast(totals.select(col("eval_source").as("train_source"))))
    grid.join(stats, Seq("train_source", "eval_source"), "left")
      .select(col("train_source"), col("eval_source"),
        coalesce(col("n_covered"), lit(0L)).as("n_covered"),
        coalesce(rnd(col("n_covered").cast("double") /
          col("tocc").cast("double"), 6), lit(0.0)).as("coverage"),
        coalesce(rnd(col("lp_sum") /
          col("n_covered").cast("double"), 6), lit(0.0)).as("avg_logprob"))
  }

  /** Pairwise Jensen-Shannon divergence between source unigram
    * distributions — the symmetric, bounded (≤ ln 2) domain-distance
    * matrix: 0 = identical vocabularies at identical frequencies, ln 2
    * = disjoint support. The standard corpus-cartography input
    * (cluster sources by JSD, spot the outlier domain, pick mixture
    * anchors). Computed WITHOUT smoothing via the decomposition
    *   JSD = ½[ Σ_shared (p·ln(2p/(p+q)) + q·ln(2q/(p+q)))
    *            + ln 2 · ((1−Σ_shared p) + (1−Σ_shared q)) ]
    * — terms private to one source contribute exactly p·ln 2, so only
    * the SHARED support needs a join (no outer-join row explosion for
    * the disjoint tails).
    *
    * Exactness: p and q are single divisions on integer counts; the
    * shared-term contribution is one fixed association; the float sums
    * feed ONE portable-rounded output, no rank. Scale shape: explode →
    * (source, term) agg → per-source totals → term-keyed self-join of
    * the probability table (shuffle keyed by term; a term in k sources
    * fans out k² — bounded by S²·|vocab|, the matrix's intrinsic cost)
    * → S²/2-row aggregate.
    *
    * @return (s1, s2, n_shared, jsd) for unordered pairs s1 < s2 */
  def sourceJsd(docs: DataFrame, srcCol: String, textCol: String): DataFrame = {
    val tf = Par.ensureMapParallelism(docs)
      .select(col(srcCol).as("src"), explode(tokens(col(textCol))).as("term"))
      .groupBy("src", "term").agg(count(lit(1)).as("tf"))
      .transform(graft.CacheScope.pin) // totals AND the self-join read it
    val tot = tf.groupBy("src").agg(sum(col("tf")).as("nt"))
      .transform(graft.CacheScope.pin) // probability table AND grid read it
    val p = tf.join(tot, Seq("src"))
      .select(col("src"), col("term"),
        (col("tf").cast("double") / col("nt").cast("double")).as("p"))
      .transform(graft.CacheScope.pin) // both sides of the self-join
    val a = p.select(col("src").as("s1"), col("term"), col("p").as("p1"))
    val b = p.select(col("src").as("s2"), col("term"), col("p").as("p2"))
    val shared = a.join(b, Seq("term")).filter(col("s1") < col("s2"))
      .groupBy("s1", "s2")
      .agg(count(lit(1)).as("n_shared"),
        sum(col("p1") * log(lit(2.0) * col("p1") / (col("p1") + col("p2"))) +
          col("p2") * log(lit(2.0) * col("p2") / (col("p1") + col("p2"))))
          .as("ss"),
        sum(col("p1")).as("sp1"), sum(col("p2")).as("sp2"))
    val srcs = tot.select(col("src"))
    // S-row source grid: broadcast-hinted like its siblings (r13 #3)
    val grid = srcs.select(col("src").as("s1"))
      .crossJoin(broadcast(srcs.select(col("src").as("s2"))))
      .filter(col("s1") < col("s2"))
    grid.join(shared, Seq("s1", "s2"), "left")
      .select(col("s1"), col("s2"),
        coalesce(col("n_shared"), lit(0L)).as("n_shared"),
        rnd(lit(0.5) * (coalesce(col("ss"), lit(0.0)) +
          log(lit(2.0)) * (lit(2.0) - coalesce(col("sp1"), lit(0.0)) -
            coalesce(col("sp2"), lit(0.0)))), 6).as("jsd"))
  }

  /** Distinct-n diversity per source — the generation-diversity metric
    * (distinct n-gram types / n-gram occurrences, n = 1..maxN) applied
    * as a corpus audit: sources dominated by templates or degenerate
    * repetition score low at n ≥ 2 long before a human would notice;
    * healthy prose sits near the Zipf expectation. The long format
    * (one row per source × n) is what a monitoring dashboard ingests.
    *
    * Scale shape per n: occurrence-preserving shingle explode →
    * (source, gram) partial agg → per-source agg; the three n-levels
    * union. Ratios are single portable-rounded divisions.
    *
    * @return (source, n, n_grams, n_distinct, distinct_ratio) */
  def distinctNgramDiversity(
      docs: DataFrame, srcCol: String, textCol: String, maxN: Int = 3): DataFrame = {
    val base = Par.ensureMapParallelism(docs)
      .select(col(srcCol).as("source"), col(textCol).as("_t"))
      .transform(graft.CacheScope.pin) // one scan feeds all n levels
    def level(n: Int): DataFrame = {
      val per = base
        .select(col("source"),
          explode(wordShinglesAll(col("_t"), n)).as("g"))
        .groupBy("source", "g").agg(count(lit(1)).as("c"))
      per.groupBy("source").agg(
        sum(col("c")).as("n_grams"),
        count(lit(1)).as("n_distinct"))
        .select(col("source"), lit(n.toLong).as("n"),
          col("n_grams"), col("n_distinct"),
          rnd(col("n_distinct").cast("double") /
            col("n_grams").cast("double"), 6).as("distinct_ratio"))
    }
    (1 to maxN).map(level).reduce(_.unionByName(_))
  }

  /** Per-source out-of-vocabulary rate against the corpus's own top-k
    * vocabulary head — the tokenizer-coverage audit: how much of each
    * source's token mass falls outside the k most frequent corpus
    * terms. A source with an outlier OOV rate is a different language,
    * a different domain, or noise; the same number drives "do we need
    * a bigger vocab" decisions for BPE training.
    *
    * Scale shape: term-frequency agg → global top-k via orderBy+limit
    * (TakeOrderedAndProject) → broadcast-join the k-row vocab back to
    * the per-source term table → conditional per-source sums. The
    * vocab is the ONLY thing crossing stages and it is k rows.
    *
    * @return (source, n_tokens, n_oov, oov_rate) */
  def oovRate(
      docs: DataFrame, srcCol: String, textCol: String, vocabK: Int = 500): DataFrame = {
    val tf = Par.ensureMapParallelism(docs)
      .select(col(srcCol).as("source"), explode(tokens(col(textCol))).as("term"))
      .groupBy("source", "term").agg(count(lit(1)).as("tf"))
      .transform(graft.CacheScope.pin) // vocab head AND the rollup read it
    val vocab = tf.groupBy("term").agg(sum(col("tf")).as("ctf"))
      .orderBy(col("ctf").desc, col("term")).limit(vocabK) // TakeOrderedAndProject
      .select(col("term"), lit(true).as("in_vocab"))
    tf.join(broadcast(vocab), Seq("term"), "left")
      .groupBy("source").agg(
        sum(col("tf")).as("n_tokens"),
        sum(when(col("in_vocab").isNull, col("tf")).otherwise(lit(0L))).as("n_oov"))
      .select(col("source"), col("n_tokens"), col("n_oov"),
        rnd(col("n_oov").cast("double") / col("n_tokens").cast("double"), 6)
          .as("oov_rate"))
  }

  /** Corpus vocabulary head: the top-k terms by total frequency with
    * document frequency and corpus-share — the Zipf-head report every
    * training-data audit starts from (tokenizer coverage, stopword
    * skew, boilerplate detection).
    *
    * Scale shape: explode → (id, term) partial-agg → term-keyed agg —
    * two map-side-combined shuffles keyed by term; the global top-k is
    * `orderBy(...).limit(k)`, which Spark plans as
    * TakeOrderedAndProject (per-partition heaps + a k-row merge on the
    * driver), NOT a single-partition global window — a million-term
    * vocabulary never lands on one task. The rank column is then a
    * window over just k rows. `share` = tf / total-token-count is one
    * portable-rounded division; everything else is integer-exact.
    *
    * @return (term, tf, df, share, rnk), rnk 1..k by (tf desc, term) */
  def vocabStats(
      docs: DataFrame, idCol: String, textCol: String, k: Int): DataFrame = {
    val tf = Par.ensureMapParallelism(docs)
      .select(col(idCol).as("id"), explode(tokens(col(textCol))).as("term"))
      .groupBy("id", "term").agg(count(lit(1)).as("tf"))
      .transform(graft.CacheScope.pin) // term stats AND the total read it
    val terms = tf.groupBy("term")
      .agg(sum("tf").as("tf"), count(lit(1)).as("df"))
      .transform(graft.CacheScope.pin) // top-k AND the total read it
    val total = terms.agg(sum("tf").as("total_tf"))
    val wRank = org.apache.spark.sql.expressions.Window
      .orderBy(col("tf").desc, col("term"))
    terms
      .orderBy(col("tf").desc, col("term")).limit(k) // TakeOrderedAndProject
      .crossJoin(broadcast(total))
      .withColumn("share",
        graft.functions.PortableMath.rnd(
          col("tf").cast("double") / col("total_tf").cast("double"), 6))
      .withColumn("rnk", row_number().over(wRank).cast("long"))
      .select("term", "tf", "df", "share", "rnk")
  }

  /** Perplexity-band quality gate: score every document with the
    * tokenizer-free char-trigram LM ([[charTrigramLogProb]]) and roll
    * the corpus up into per-(source, band) counts — the triage a data
    * pipeline runs before spending GPU-filter budget: `high` keeps,
    * `mid` goes to a stronger (model-based) filter, `low` drops. Bands
    * are fixed avg-logprob thresholds on the ROUNDED per-doc score, so
    * the band decision is bit-deterministic; docs too short to have a
    * trigram land in `low`.
    *
    * Scale shape: inherits [[charTrigramLogProb]]'s (count-table joins,
    * map-side combinable); the rollup adds one shuffle on the bounded
    * (source, band) key.
    *
    * @return (source, band, n_docs, mean_logprob) */
  def perplexityGate(
      docs: DataFrame, idCol: String, textCol: String, srcCol: String,
      loMid: Double, midHi: Double): DataFrame = {
    val scored = charTrigramLogProb(docs, idCol, textCol)
    val src = docs.select(col(idCol).as("id"), col(srcCol).as("source"))
    src.join(scored, Seq("id"))
      .withColumn("band",
        when(col("n_cgrams") === 0, lit("low"))
          .when(col("avg_logprob") >= midHi, lit("high"))
          .when(col("avg_logprob") >= loMid, lit("mid"))
          .otherwise(lit("low")))
      .groupBy("source", "band")
      .agg(count(lit(1)).as("n_docs"),
        // mean via integer micro-units: per-doc scores sit on the 1e-6
        // rounding grid, so floor(x*1e6+0.5) recovers them exactly and
        // the LONG sum is association-free — a double sum here can land
        // a band mean on a rounding boundary and flip the last decimal
        // with summation order (measured at sf0.001)
        rnd(sum(floor(col("avg_logprob") * lit(1e6) + lit(0.5)).cast("long"))
            .cast("double") / (count(lit(1)).cast("double") * lit(1e6)), 6)
          .as("mean_logprob"))
  }

  /** [[perplexityGate]] with DATA-DERIVED thresholds: band boundaries
    * at the corpus's own discrete quantiles of the per-doc LM score
    * instead of frozen literals — the knob a real curation run turns
    * ("drop the worst quartile") without hand-picking cutoffs per
    * corpus. Exactness device: scores sit on the 1e-6 rounding grid,
    * so their micro-unit integers are exact; the threshold is the
    * k-th smallest micro value (k = floor((n−1)·q) + 1, the type-1
    * discrete quantile — NO interpolation, hence no cross-engine float
    * arithmetic to diverge; use binary-exact q like 0.25/0.75). Bands:
    * score < t(qLo) → low, < t(qHi) → mid, else high; no-trigram docs
    * band low (the [[perplexityGate]] convention).
    *
    * Scale shape: the quantile runs on the SUPPORT (distinct micro
    * values, grouped counts + one cumulative window over support rows
    * — the [[ksDrift]] device: the window's single partition holds
    * support points, never documents), and the two 1-row thresholds
    * broadcast back.
    *
    * @return (source, band, n_docs, mean_logprob, thr_lo, thr_hi) */
  def quantileGate(
      docs: DataFrame, idCol: String, textCol: String, srcCol: String,
      qLo: Double = 0.25, qHi: Double = 0.75): DataFrame = {
    require(qLo >= 0 && qHi <= 1 && qLo <= qHi, s"bad quantiles $qLo/$qHi")
    val scored = charTrigramLogProb(docs, idCol, textCol)
      .withColumn("micro",
        floor(col("avg_logprob") * lit(1e6) + lit(0.5)).cast("long"))
      .transform(graft.CacheScope.pin) // thresholds + banding read it
    val valid = scored.filter(col("n_cgrams") > 0)
    val wCum = org.apache.spark.sql.expressions.Window
      .orderBy("micro")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    val cum = valid.groupBy("micro").agg(count(lit(1)).as("c"))
      .withColumn("cum", sum("c").over(wCum))
      .transform(graft.CacheScope.pin) // both threshold probes read it
    val n = valid.agg(count(lit(1)).as("n"))
    def thr(q: Double, as: String) = cum
      .crossJoin(broadcast(n)) // 1-row total (scale-free BNLJ)
      .filter(col("cum") >=
        floor((col("n") - 1).cast("double") * lit(q)).cast("long") + lit(1L))
      .agg(min("micro").as(as))
    val src = docs.select(col(idCol).as("id"), col(srcCol).as("source"))
    src.join(scored, Seq("id"))
      .crossJoin(broadcast(thr(qLo, "t_lo")))
      .crossJoin(broadcast(thr(qHi, "t_hi")))
      .withColumn("band",
        when(col("n_cgrams") === 0, lit("low"))
          .when(col("micro") >= col("t_hi"), lit("high"))
          .when(col("micro") >= col("t_lo"), lit("mid"))
          .otherwise(lit("low")))
      .groupBy("source", "band")
      .agg(count(lit(1)).as("n_docs"),
        rnd(sum(col("micro")).cast("double") /
          (count(lit(1)).cast("double") * lit(1e6)), 6).as("mean_logprob"),
        rnd(first(col("t_lo")).cast("double") / lit(1e6), 6).as("thr_lo"),
        rnd(first(col("t_hi")).cast("double") / lit(1e6), 6).as("thr_hi"))
  }

  /** Two-sample Kolmogorov–Smirnov drift statistic over an integer
    * document measure (length, token count, quality bucket …) between
    * two corpus slices — the distribution-drift monitor a pipeline runs
    * when a new crawl/source lands: a large D means the slices differ
    * somewhere in the distribution body, not just in the mean.
    *
    * D = max over x of |F_a(x) − F_b(x)| with the empirical CDFs
    * evaluated on the UNION support (the exact two-sample statistic,
    * no binning). All inputs to the division are exact integers, the
    * two divisions and the subtraction are identically associated in
    * both engines, and the reported D is rounded at 1e-6 with the max
    * location tie-broken by smallest x — bit-deterministic.
    *
    * Scale shape: one groupBy on the measure value (support-bounded —
    * doc lengths, token counts are small-cardinality domains), then a
    * cumulative window over that SUPPORT (hundreds of rows however big
    * the corpus — the window's single partition holds support points,
    * never documents), then one TakeOrdered row.
    *
    * @return one row: (n_a, n_b, ks_d, x_at_max) */
  def ksDrift(
      docs: DataFrame, groupCol: String, a: String, b: String,
      value: Column): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .orderBy("x").rowsBetween(Long.MinValue, 0)
    val perX = Par.ensureMapParallelism(docs)
      .filter(col(groupCol).isin(a, b))
      .select(col(groupCol).as("g"), value.cast("long").as("x"))
      .groupBy("x")
      .agg(sum(when(col("g") === a, 1L).otherwise(0L)).as("na"),
        sum(when(col("g") === b, 1L).otherwise(0L)).as("nb"))
    val cum = perX
      .withColumn("ca", sum("na").over(w))
      .withColumn("cb", sum("nb").over(w))
      .transform(graft.CacheScope.pin) // totals + the argmax read it
    val tot = cum.agg(max("ca").as("ta"), max("cb").as("tb"))
    cum.crossJoin(broadcast(tot)) // 1-row totals
      .select(col("ta").as("n_a"), col("tb").as("n_b"),
        rnd(abs(col("ca").cast("double") / col("ta").cast("double")
          - col("cb").cast("double") / col("tb").cast("double")), 6).as("d"),
        col("x"))
      .orderBy(col("d").desc, col("x"))
      .limit(1)
      .select(col("n_a"), col("n_b"), col("d").as("ks_d"),
        col("x").as("x_at_max"))
  }

  /** Frozen weights for [[hashedLinearClassifier]] — integer MICRO-units
    * (w·1e6), so per-doc accumulation is exact Int64 and the oracle
    * mirrors bit-for-bit with zero float-summation-order risk. The
    * values are a fixed seeded draw (uniform in ±0.5, seed 20240813) —
    * a stand-in for trained fasttext-style weights, exactly like the
    * frozen IVF/PQ codebook literals: a production run swaps in real
    * training output, changing only the literals. */
  val ClassifierWeightsMicro: Array[Long] = {
    val rng = new scala.util.Random(20240813L)
    Array.fill(64)((rng.nextDouble() - 0.5) * 1e6).map(math.rint(_).toLong)
  }

  /** Hashed-bag-of-words linear text classifier — the fasttext-style
    * quality-filter stand-in (Joulin et al. 2016, arXiv:1607.01759: a
    * linear model over hashed n-gram features is the standard cheap
    * quality/domain gate run over the WHOLE corpus before any
    * model-based filtering; CCNet and the LLaMA data pipeline both use
    * exactly this shape). Each token hashes into one of
    * `weights.length` feature buckets via the portable 60-bit hash;
    * the doc score is the mean bucket weight (mean-pooling, the
    * fasttext default) plus a bias, banded into keep / review / drop.
    *
    * Determinism: weights are integer micro-units summed in Int64
    * (association-free, exact), divided once and rounded at 1e-6 —
    * the band decision happens on the ROUNDED score, the same
    * discipline as [[perplexityGate]]. The sigmoid is deliberately NOT
    * applied: it is monotone, so banding on the linear score is
    * banding on the probability, without exp() portability risk.
    *
    * Scale shape: pure per-row projection (one md5 per token inside a
    * fold over the materialized token array) — zero shuffles; composes
    * with any downstream gate the way [[gopherRules]] does.
    *
    * @return (id, n_toks, score, band) */
  def hashedLinearClassifier(
      docs: DataFrame, idCol: String, textCol: String,
      weightsMicro: Array[Long] = ClassifierWeightsMicro,
      biasMicro: Long = 0L,
      dropBelow: Double = -0.05, keepAbove: Double = 0.05): DataFrame = {
    val nB = weightsMicro.length
    val warr = array(weightsMicro.map(lit(_)): _*)
    val withToks = Par.ensureMapParallelism(docs)
      .select(col(idCol).as("id"), tokens(col(textCol)).as("_toks"))
    val sumMicro = aggregate(col("_toks"), lit(0L),
      (acc, t) => acc + element_at(warr, (hash60(t) % nB).cast("int") + 1))
    withToks
      .select(col("id"), size(col("_toks")).cast("long").as("n_toks"),
        sumMicro.as("_sum"))
      .withColumn("score",
        when(col("n_toks") === 0L, lit(0.0))
          .otherwise(rnd(
            (col("_sum") + lit(biasMicro)).cast("double") /
              (col("n_toks").cast("double") * lit(1e6)), 6)))
      .withColumn("band",
        when(col("n_toks") === 0L, lit("drop"))
          .when(col("score") > keepAbove, lit("keep"))
          .when(col("score") < dropBelow, lit("drop"))
          .otherwise(lit("review")))
      .select("id", "n_toks", "score", "band")
  }

  /** The five stopwords the Gopher-rule check probes for (a deliberately
    * tiny, fixed probe set — the published heuristic checks exactly this
    * kind of closed list, Rae et al. 2021 §A1.1). */
  val GopherStopProbe: Seq[String] = Seq("the", "and", "of", "to", "in")

  /** Gopher-style composite quality rules (Rae et al. 2021,
    * arXiv:2112.11446 §A1.1): the five mechanical document filters a
    * pretraining pipeline applies before any model-based scoring —
    * word-count bounds, mean-word-length bounds, minimum alphabetic-word
    * fraction, symbol-to-word ratio cap, and a closed-list stopword
    * probe. Emits every signal AND every per-rule verdict (a pipeline
    * wants the failure reasons, not just the gate).
    *
    * Words here are WHITESPACE words (`split ' '`), not the lowercase
    * alnum tokens — the published rules are defined on raw words (mean
    * word length counts punctuation; the alphabetic-fraction rule is
    * vacuous on pre-stripped tokens). The stopword probe uses the
    * lowercase tokens, as published.
    *
    * Scale shape: pure per-row projection — zero shuffles; every signal
    * derives from two materialized arrays (words, tokens) built once per
    * row (the q20 projection-collapse discipline).
    *
    * @return (id, n_words, mean_wlen, frac_alpha, sym_ratio, n_stop,
    *         r_words, r_wlen, r_alpha, r_sym, r_stop, n_fail, pass) */
  def gopherRules(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val withArrays = Par.ensureMapParallelism(docs).select(
      col(idCol).as("id"), col(textCol).as("_t"),
      filter(split(col(textCol), " "), w => length(w) > 0).as("_ws"),
      tokens(col(textCol)).as("_toks"))
    val nHash = length(col("_t")) - length(regexp_replace(col("_t"), "#", ""))
    val nEll = (length(col("_t")) -
      length(regexp_replace(col("_t"), "\\.\\.\\.", ""))) / lit(3)
    def perWord(num: Column): Column = // zero-word docs report 0.0, not null
      when(size(col("_ws")) > 0,
        rnd(num.cast("double") / size(col("_ws")).cast("double"), 6))
        .otherwise(lit(0.0))
    val sig = withArrays.select(
      col("id"),
      size(col("_ws")).cast("long").as("n_words"),
      perWord(aggregate(col("_ws"), lit(0L), (acc, w) => acc + length(w)))
        .as("mean_wlen"),
      perWord(size(filter(col("_ws"), w => w.rlike("[A-Za-z]"))))
        .as("frac_alpha"),
      perWord(nHash + nEll).as("sym_ratio"),
      GopherStopProbe.map(w =>
          when(array_contains(col("_toks"), w), 1L).otherwise(0L))
        .reduce(_ + _).as("n_stop"))
    sig
      .withColumn("r_words", col("n_words") >= 50 && col("n_words") <= 100000)
      .withColumn("r_wlen", col("mean_wlen") >= 3.0 && col("mean_wlen") <= 10.0)
      .withColumn("r_alpha", col("frac_alpha") >= 0.8)
      .withColumn("r_sym", col("sym_ratio") <= 0.1)
      .withColumn("r_stop", col("n_stop") >= 2)
      .withColumn("n_fail",
        Seq("r_words", "r_wlen", "r_alpha", "r_sym", "r_stop")
          .map(r => when(col(r), 0L).otherwise(1L)).reduce(_ + _))
      .withColumn("pass", col("n_fail") === 0)
  }

  /** Per-source Zipf-law fit: least-squares slope/intercept of
    * ln(freq) against ln(rank) over each source's `topN` most frequent
    * tokens — the corpus-health scalar that flags a channel whose
    * frequency curve is NOT Zipfian (template/boilerplate-dominated
    * sources flatten the head; OCR noise fattens the tail). Natural
    * text sits near slope −1 (Zipf 1949); machine-generated filler
    * does not.
    *
    * Scale shape: one token-keyed count aggregation (map-side partial),
    * one source-keyed top-N window over the COUNT table (vocabulary
    * grain, not corpus grain), and a per-source closed-form fold —
    * nothing touches the corpus twice. Determinism: ranks tie-break on
    * the token string; the regression sums are doubles rounded to 6 dp
    * only at the end (the klFromCorpus precedent — term magnitudes
    * leave ~1e-13 of headroom under the 1e-6 grid).
    *
    * @return (srcCol, n_terms, slope, intercept) */
  def zipfFit(
      docs: DataFrame, srcCol: String, textCol: String,
      topN: Int = 200): DataFrame = {
    val counts = Par.ensureMapParallelism(docs)
      .select(col(srcCol), explode(tokens(col(textCol))).as("_tok"))
      .groupBy(col(srcCol), col("_tok"))
      .agg(count(lit(1)).as("_cnt"))
    val byFreq = org.apache.spark.sql.expressions.Window
      .partitionBy(srcCol).orderBy(col("_cnt").desc, col("_tok"))
    val xy = counts
      .withColumn("_rank", row_number().over(byFreq))
      .filter(col("_rank") <= topN)
      .select(col(srcCol),
        log(col("_rank").cast("double")).as("_x"),
        log(col("_cnt").cast("double")).as("_y"))
    xy.groupBy(srcCol)
      .agg(count(lit(1)).as("n_terms"),
        sum(col("_x")).as("_sx"), sum(col("_y")).as("_sy"),
        sum(col("_x") * col("_x")).as("_sxx"),
        sum(col("_x") * col("_y")).as("_sxy"))
      .withColumn("_n", col("n_terms").cast("double"))
      .withColumn("_slope",
        (col("_n") * col("_sxy") - col("_sx") * col("_sy")) /
          (col("_n") * col("_sxx") - col("_sx") * col("_sx")))
      .select(col(srcCol), col("n_terms"),
        rnd(col("_slope"), 6).as("slope"),
        rnd((col("_sy") - col("_slope") * col("_sx")) / col("_n"), 6)
          .as("intercept"))
  }
}
