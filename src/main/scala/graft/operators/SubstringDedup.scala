package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact substring-grain contamination — the one dedup grain class the
  * engine lacked (r6 verdict Missing #3): doc-grain (q61), paragraph-
  * grain (q70) and shingle-grain (q73) all detect overlap at a FIXED
  * tokenization, while a training document that embeds a long verbatim
  * character run from an eval document (a quote, a copied answer, a
  * license block) can straddle every shingle boundary. This operator
  * detects any shared substring of length ≥ `minOverlap` CHARACTERS,
  * exactly.
  *
  * Two stages, both scale-shaped:
  *
  *  1. **Candidate generation — winnowing fingerprints** (Schleimer,
  *     Wilkerson, Aiken, "Winnowing: Local Algorithms for Document
  *     Fingerprinting", SIGMOD 2003): hash every character k-gram,
  *     then per sliding window of `w` consecutive k-gram hashes keep
  *     the minimum. The winnowing guarantee: any shared substring of
  *     length ≥ k + w − 1 spans a full window of w k-grams in BOTH
  *     documents, and the min over identical hash sets is identical —
  *     so the pair SHARES a fingerprint and survives the equi-join.
  *     With `minOverlap ≥ k + w − 1` (enforced), candidate generation
  *     has NO false negatives; hash collisions only add false
  *     candidates, which stage 2 prunes exactly. Fingerprint volume is
  *     ~|doc|/w rows per doc (the winnowing density bound), and the
  *     candidate join is a fingerprint-keyed equi-join — never pairs².
  *
  *  2. **Exact extend — suffix automaton**: per candidate (train, eval)
  *     pair, the true longest common substring via a suffix automaton
  *     of the train text streamed with the eval text — O(|t| + |e|)
  *     per pair instead of the O(|t|·|e|) DP. Candidates are grouped
  *     by train doc (`groupByKey`), so one automaton serves ALL of
  *     that doc's candidate evals; per-group state is O(|train doc|)
  *     — executor-memory bounded by the longest single document, never
  *     by corpus size.
  *
  * Why spec-only (no SQL oracle): the correctness gate hashes oracle
  * SQL results, and neither the winnowing min-window selection nor the
  * automaton extend has a faithful DuckDB mirror that is not itself a
  * from-scratch reimplementation (the streaming-ingest precedent:
  * document the gap, gate with planted-fixture specs instead —
  * SubstringDedupSpec plants overlaps at known offsets and asserts
  * pair set, LCS length, and eval-side offset).
  */
object SubstringDedup {

  /** Suffix automaton over `s` (Blumer et al. 1985 construction, the
    * standard online O(|s|·Σ) build): recognizes exactly the substrings
    * of `s`; [[longestCommonSubstring]] streams another string through
    * it tracking the longest current match. */
  private[graft] final class SuffixAutomaton(s: String) {
    private val cap = 2 * math.max(s.length, 1) + 5
    private val len = new Array[Int](cap)
    private val link = new Array[Int](cap)
    private val next =
      Array.fill(cap)(new java.util.HashMap[Character, Integer](4))
    private var last = 0
    private var size = 1
    link(0) = -1
    s.foreach(append)

    private def append(c: Char): Unit = {
      val cur = size; size += 1
      len(cur) = len(last) + 1
      var p = last
      while (p != -1 && !next(p).containsKey(c)) {
        next(p).put(c, cur); p = link(p)
      }
      if (p == -1) link(cur) = 0
      else {
        val q: Int = next(p).get(c)
        if (len(p) + 1 == len(q)) link(cur) = q
        else {
          val clone = size; size += 1
          len(clone) = len(p) + 1
          link(clone) = link(q)
          next(clone).putAll(next(q))
          while (p != -1 && next(p).get(c) == Integer.valueOf(q)) {
            next(p).put(c, clone); p = link(p)
          }
          link(cur) = clone; link(q) = clone
        }
      }
      last = cur
    }

    /** (length, 0-based start offset in `t`) of the longest substring of
      * `t` that is also a substring of the automaton's string; (0, -1)
      * when nothing matches. Ties keep the EARLIEST occurrence in `t`
      * (strict `>` on the running best), making the offset deterministic. */
    def longestCommonSubstring(t: String): (Int, Int) = {
      var v = 0; var l = 0; var best = 0; var bestEnd = -1
      var i = 0
      while (i < t.length) {
        val c = t.charAt(i)
        while (v != 0 && !next(v).containsKey(c)) {
          v = link(v); l = len(v)
        }
        val u = next(v).get(c)
        if (u != null) { v = u; l += 1 }
        else { v = 0; l = 0 }
        if (l > best) { best = l; bestEnd = i }
        i += 1
      }
      (best, if (bestEnd < 0) -1 else bestEnd - best + 1)
    }

    /** Merged 0-based [start, end] intervals of every position of `t`
      * lying inside a substring of length ≥ `minLen` shared with the
      * automaton's string — the union over end positions i of
      * [i − l_i + 1, i] where l_i (the longest match ending at i) is
      * ≥ minLen. Since i advances by 1 and l_i by at most 1, starts are
      * non-decreasing and the union merges in the same single pass that
      * computes the match-length profile — O(|t|) beyond the stream. */
    def coverageIntervals(t: String, minLen: Int): List[(Int, Int)] = {
      val buf = scala.collection.mutable.ListBuffer.empty[(Int, Int)]
      var v = 0; var l = 0
      var curS = -1; var curE = -1
      var i = 0
      while (i < t.length) {
        val c = t.charAt(i)
        while (v != 0 && !next(v).containsKey(c)) {
          v = link(v); l = len(v)
        }
        val u = next(v).get(c)
        if (u != null) { v = u; l += 1 }
        else { v = 0; l = 0 }
        if (l >= minLen) {
          val st = i - l + 1
          if (curS >= 0 && st <= curE + 1) curE = i
          else {
            if (curS >= 0) buf += ((curS, curE))
            curS = st; curE = i
          }
        }
        i += 1
      }
      if (curS >= 0) buf += ((curS, curE))
      buf.toList
    }
  }

  /** Winnowed fingerprint set of each doc: xxhash64 over every char
    * k-gram, min per sliding w-window, deduped. (id, fp) rows, ~len/w
    * per doc. The two expensive columns (k-gram, hash) are materialized
    * before the window fan-out — the projection-collapse rule. */
  private def fingerprints(
      docs: DataFrame, idCol: String, textCol: String,
      k: Int, w: Int): DataFrame = {
    val grams = docs
      .select(col(idCol).as("_id"), col(textCol).as("_text"))
      .filter(length(col("_text")) >= k)
      .select(col("_id"), col("_text"), length(col("_text")).as("_len"),
        posexplode(sequence(lit(0), length(col("_text")) - k)))
      .select(col("_id"), col("pos"), col("_len"),
        xxhash64(expr("substring(_text, pos + 1, " + k + ")")).as("h"))
    val wSpec = Window.partitionBy("_id").orderBy("pos")
      .rowsBetween(Window.currentRow, w - 1)
    grams
      .withColumn("fp", min("h").over(wSpec))
      // only positions that head a FULL w-window (the guarantee's
      // unit): the doc has _len − k + 1 grams, so the last full-window
      // head sits at pos = _len − (k + w − 1) — a plain length
      // expression, which saves the per-doc count window an earlier
      // version paid (one window pass instead of two)
      .filter(col("pos") <= col("_len") - lit(k + w - 1))
      .select(col("_id"), col("fp"))
      .distinct()
  }

  /** Candidate pairs by shared winnowed fingerprint — equi-join on the
    * fingerprint value, distinct (train, eval) pairs. Exposed for the
    * spec's no-false-negative check. */
  private[graft] def candidatePairs(
      train: DataFrame, eval: DataFrame, k: Int, w: Int,
      idCol: String, textCol: String): DataFrame = {
    val tFp = fingerprints(train, idCol, textCol, k, w)
      .withColumnRenamed("_id", "train_id")
    val eFp = fingerprints(eval, idCol, textCol, k, w)
      .withColumnRenamed("_id", "eval_id")
    eFp.join(tFp, Seq("fp")).select("eval_id", "train_id").distinct()
  }

  /** Eval docs sharing an exact substring of ≥ `minOverlap` chars with
    * a train doc, with the TRUE longest-common-substring length and its
    * (earliest) eval-side offset.
    *
    * Default (k=20, w=6) comes from the k↔w trade measured on the real
    * corpus at sf0.1 (`graft.tools.SubstringBench`, fixed guarantee
    * k+w−1 = 25): template-heavy text shares SHORT runs promiscuously,
    * so longer k-grams are the selectivity lever — k=20/w=6 produced
    * 34× fewer candidates than k=12/w=14 (5.5k vs 189k) at ~2.3× the
    * fingerprint density (~len/6 rows per doc), with byte-identical
    * final output (the exactness is parameter-invariant by
    * construction; measured: 779 pairs under all three settings).
    *
    * @param train      (id, text) — the training corpus
    * @param eval       (id, text) — the held-out set to protect
    * @param minOverlap report pairs with LCS ≥ this many characters;
    *                   must be ≥ k + w − 1 (the winnowing guarantee)
    * @param k          fingerprint k-gram length (chars)
    * @param w          winnowing window (k-grams per window)
    * @return (eval_id, train_id, lcs_len, eval_offset) */
  def contamination(
      train: DataFrame, eval: DataFrame, minOverlap: Int,
      k: Int = 20, w: Int = 6,
      idCol: String = "id", textCol: String = "text"): DataFrame = {
    require(k >= 2 && w >= 1, s"degenerate fingerprint params k=$k w=$w")
    require(minOverlap >= k + w - 1,
      s"winnowing guarantees detection only at >= k + w - 1 = ${k + w - 1} " +
        s"chars; got minOverlap=$minOverlap (shrink k or w)")
    val spark = train.sparkSession
    import spark.implicits._
    val cands = candidatePairs(train, eval, k, w, idCol, textCol)
      .join(eval.select(col(idCol).as("eval_id"),
        col(textCol).as("_etext")), Seq("eval_id"))
      .join(train.select(col(idCol).as("train_id"),
        col(textCol).as("_ttext")), Seq("train_id"))
      .select(col("train_id").cast("string"), col("eval_id").cast("string"),
        col("_ttext"), col("_etext"))
      .as[(String, String, String, String)]
    // one automaton per train doc serves all its candidate evals
    val extended: Dataset[(String, String, Int, Int)] = cands
      .groupByKey(_._1)
      .flatMapGroups { (tid, rows) =>
        var sam: SuffixAutomaton = null
        rows.map { case (_, eid, ttext, etext) =>
          if (sam == null) sam = new SuffixAutomaton(ttext)
          val (l, off) = sam.longestCommonSubstring(etext)
          (eid, tid, l, off)
        }
      }
    extended.toDF("eval_id", "train_id", "lcs_len", "eval_offset")
      .filter(col("lcs_len") >= minOverlap)
  }

  /** Per-eval-doc rollup of [[contamination]] — the decision table a
    * curation pipeline consumes (q61's doc-grain report at substring
    * grain): every eval doc with its worst (longest) overlap, the
    * offending train doc, and how many train docs hit it at all.
    * Deterministic keeper rule: ties on max LCS break to the smallest
    * train id. Pure aggregation over the pair table — no extra scans.
    *
    * @return (eval_id, n_train_hits, max_lcs_len, worst_train_id) */
  def contaminationRollup(
      train: DataFrame, eval: DataFrame, minOverlap: Int,
      k: Int = 20, w: Int = 6,
      idCol: String = "id", textCol: String = "text"): DataFrame = {
    val pairs = contamination(train, eval, minOverlap, k, w, idCol, textCol)
    val byWorst = org.apache.spark.sql.expressions.Window
      .partitionBy("eval_id")
      .orderBy(col("lcs_len").desc, col("train_id"))
    pairs
      .withColumn("_rn", row_number().over(byWorst))
      .withColumn("n_train_hits",
        count(lit(1)).over(org.apache.spark.sql.expressions.Window
          .partitionBy("eval_id")))
      .filter(col("_rn") === 1)
      .select(col("eval_id"), col("n_train_hits"),
        col("lcs_len").as("max_lcs_len"), col("train_id").as("worst_train_id"))
  }

  /** Corpus-grain exact substring REMOVAL (Lee et al., "Deduplicating
    * Training Data Makes Language Models Better", ACL 2022 — the
    * ExactSubstr step): emit the CLEANED corpus, cutting from every
    * document each character position that lies inside a substring of
    * length ≥ `minLen` also occurring in an EARLIER document
    * (first-occurrence-wins by id order: the earliest holder keeps its
    * copy untouched; every later doc loses the duplicated span and
    * keeps the remainder, concatenated in order).
    *
    * Composition of the proven [[contamination]] machinery turned on
    * itself: winnowed-fingerprint self-join for candidate (earlier,
    * later) pairs (equi-join on fingerprint value, `<` on id — never
    * pairs²), then ONE suffix automaton per earlier doc streamed with
    * each later partner to produce the exact covered intervals
    * ([[SuffixAutomaton.coverageIntervals]]), unioned per later doc,
    * and a single per-row cut. Per-group state is O(longest single
    * doc); the interval union per doc is bounded by |doc|/minLen
    * entries — both executor-memory safe at any corpus size.
    *
    * A doc that is an exact duplicate of an earlier doc cleans to the
    * empty string (its every position is covered) — the doc-grain
    * q21/q61 semantics recovered as the degenerate case.
    *
    * @return (idCol, textCol, n_cut) — the cleaned text and how many
    *         characters were removed; docs with nothing shared pass
    *         through with n_cut = 0 */
  /** The per-row interval-union cut shared by the removal operators:
    * given the original text and the collected per-pair interval lists
    * (each already merged within its pair), union them with a sorted
    * sweep and emit (remaining text, characters removed). */
  private val cutUdf = udf { (text: String, ivs: Seq[org.apache.spark.sql.Row]) =>
    if (ivs == null || ivs.isEmpty) (text, 0)
    else {
      val sorted = ivs.map(r => (r.getInt(0), r.getInt(1))).sortBy(identity)
      val sb = new StringBuilder
      var cursor = 0
      var cutN = 0
      sorted.foreach { case (st, en) =>
        if (st > cursor) sb.append(text.substring(cursor, st))
        val e = en + 1
        if (e > cursor) { cutN += e - math.max(cursor, st); cursor = e }
      }
      if (cursor < text.length) sb.append(text.substring(cursor))
      (sb.toString, cutN)
    }
  }

  def removeDuplicateSpans(
      docs: DataFrame, minLen: Int,
      k: Int = 20, w: Int = 6,
      idCol: String = "id", textCol: String = "text"): DataFrame =
    removeDuplicateSpansPass(docs, minLen, k, w, idCol, textCol, None,
      needCarry = false).out.drop("_keeper")

  /** One removal pass plus the state a FOLLOWING pass can reuse: the
    * round's output — (id, text, n_cut, _keeper), the flag marking
    * which rows went through the pair machinery as keepers — and the
    * winnowed fingerprint rows of this pass's keepers (valid for any
    * doc this pass did not cut). When `needCarry` was set, `fp` is
    * already materialized (one `localCheckpoint`) and the returned
    * plan reads that checkpoint, so the fingerprinting ran exactly
    * once; otherwise `fp` is the lazy plan (the self-join reuses its
    * exchange, so a single-pass caller never materializes it at all). */
  private[graft] final case class RemovalPass(out: DataFrame, fp: DataFrame)

  /** Carried-forward state for an INCREMENTAL pass (see
    * [[removeDuplicateSpansIterated]]): `fp` — the previous pass's
    * keeper fingerprints (checkpointed); `stableIds` — ids that were
    * keepers in the previous pass AND were not cut by it (their text,
    * keeper status and fingerprints are all unchanged, so
    * stable×stable candidate pairs were already fully resolved and
    * cannot cut again). `stableIds` is a narrow filter over the
    * previous pass's already-checkpointed output — never a separate
    * materialization. */
  private[graft] final case class RemovalCarry(
      fp: DataFrame, stableIds: DataFrame)

  private[graft] def removeDuplicateSpansPass(
      docs: DataFrame, minLen: Int,
      k: Int = 20, w: Int = 6,
      idCol: String = "id", textCol: String = "text",
      carry: Option[RemovalCarry],
      needCarry: Boolean): RemovalPass = {
    require(k >= 2 && w >= 1, s"degenerate fingerprint params k=$k w=$w")
    require(minLen >= k + w - 1,
      s"winnowing guarantees detection only at >= k + w - 1 = ${k + w - 1} " +
        s"chars; got minLen=$minLen (shrink k or w)")
    val spark = docs.sparkSession
    import spark.implicits._
    // Exact-duplicate short-circuit (scale guard): a text duplicated N
    // times would feed N(N-1)/2 pairs through the fingerprint join —
    // and exact duplication is the dominant redundancy of a raw crawl.
    // Copies beyond the first (by id) are fully covered by their keeper
    // whenever the text can host a qualifying span, so they resolve to
    // "" via ONE sha256 hash-aggregation; only DISTINCT texts enter the
    // pairwise machinery. No coverage is lost: any span a later doc
    // shares with a non-keeper it also shares (same text) with the
    // keeper, whose id is the group MINIMUM — strictly earlier.
    val wDup = org.apache.spark.sql.expressions.Window
      .partitionBy("_h").orderBy(col(idCol))
    val ranked = docs
      .select(col(idCol), col(textCol))
      .withColumn("_h", sha2(col(textCol).cast("binary"), 256))
      .withColumn("_rn", row_number().over(wDup))
      .transform(graft.CacheScope.pin) // keepers + dup tails read it
    val keepers = ranked.filter(col("_rn") === 1).drop("_h", "_rn")
    val dupDone = ranked.filter(col("_rn") > 1)
      .select(col(idCol),
        when(length(col(textCol)) >= minLen, lit(""))
          .otherwise(col(textCol)).as(textCol),
        when(length(col(textCol)) >= minLen, length(col(textCol)))
          .otherwise(lit(0)).as("n_cut"))
    // the winnowing stage is the pass's dominant cost (posexplode to
    // one row per character + a per-doc window); an incremental pass
    // (carry != None) recomputes it ONLY for keepers that are not
    // carried stable — the stable keepers' text is unchanged, so their
    // cached fingerprint rows are byte-identical by construction.
    //
    // Materialization policy (r18 regression fix — q146 anti-scaled
    // 0.25 at 32 cores): the fingerprint frame is NEVER cache-pinned.
    // In the single-pass shape the self-join's two sides are the
    // identical subtree, so Spark's ReusedExchange computes the
    // winnowing once regardless — a pin only added a full cache
    // write+read of the fingerprint stream per pass. When a following
    // pass needs the fingerprints (needCarry), ONE localCheckpoint
    // serves the self-join's both sides AND the carry — the pass's
    // single extra materialization, replacing r18's pin + separate
    // carry checkpoint + stable-id double-join checkpoint.
    val fpLazy = carry match {
      case None =>
        fingerprints(keepers, idCol, textCol, k, w)
          .withColumn("_stab", lit(false))
      case Some(c) =>
        val stable = c.stableIds.toDF("_sid")
        c.fp.join(stable, col("_id") === col("_sid"), "left_semi")
          .select(col("_id"), col("fp"), lit(true).as("_stab"))
          .unionByName(fingerprints(
              keepers.join(stable, col(idCol) === col("_sid"), "left_anti"),
              idCol, textCol, k, w)
            .withColumn("_stab", lit(false)))
    }
    // Single-pass path: LAZY, no pin (r18 regression fix). At bench
    // scale the self-join plans as a BroadcastHashJoin whose build side
    // recomputes the winnowing subtree — but the recompute measured
    // EQUAL to the pin's cache write+read (q138 @32c: 3.60 s lazy vs
    // 3.59 s pinned, r19 A/B; a forced sort-merge was worse, 4.46 s).
    // At real scale the size estimates exceed the broadcast threshold,
    // the join is a sort-merge whose two identical fp-keyed Exchanges
    // collapse into one ReusedExchange — the winnowing runs once with
    // no materialization — while a pin of corpus-wide fingerprints
    // would be storage pressure proportional to the corpus.
    val fpFlagged =
      if (needCarry) fpLazy.localCheckpoint()
      else fpLazy
    // ids keep their native type through the `<` order (numeric ids
    // must order numerically) and only flatten to string for the
    // typed groupByKey. Incremental pass: a stable×stable pair was
    // fully resolved by the previous pass (same texts, same
    // fingerprints → same candidate, and the late side was not cut →
    // no qualifying interval exists), so only pairs touching a
    // non-stable doc can cut — the `_st` flags filter them inside the
    // equi-join, no extra shuffle.
    val pairs = fpFlagged.as("a")
      .join(fpFlagged.as("b"),
        col("a.fp") === col("b.fp") && col("a._id") < col("b._id") &&
          !(col("a._stab") && col("b._stab")))
      .select(col("a._id").as("_early"), col("b._id").as("_late"))
      .distinct()
    val cands = pairs
      .join(keepers.select(col(idCol).as("_early"), col(textCol).as("_atext")),
        Seq("_early"))
      .join(keepers.select(col(idCol).as("_late"), col(textCol).as("_btext")),
        Seq("_late"))
      .select(col("_early").cast("string"), col("_late").cast("string"),
        col("_atext"), col("_btext"))
      .as[(String, String, String, String)]
    // one automaton per EARLIER doc serves all its later partners
    val intervals = cands
      .groupByKey(_._1)
      .flatMapGroups { (_, rows) =>
        var sam: SuffixAutomaton = null
        rows.flatMap { case (_, bid, atext, btext) =>
          if (sam == null) sam = new SuffixAutomaton(atext)
          sam.coverageIntervals(btext, minLen)
            .map { case (st, en) => (bid, st, en) }
        }
      }
      .toDF("_sid", "_st", "_en")
      .groupBy("_sid")
      .agg(collect_list(struct(col("_st"), col("_en"))).as("_ivs"))
    // `_keeper` flags the rows that went through the pair machinery:
    // the iterated caller derives the next pass's stable set from it
    // (keeper AND uncut) with a filter over its own checkpoint — no
    // separate keeper-id materialization
    val out = keepers
      .join(intervals, col(idCol).cast("string") === col("_sid"), "left")
      .withColumn("_cut", cutUdf(col(textCol), col("_ivs")))
      .select(col(idCol), col("_cut._1").as(textCol),
        col("_cut._2").as("n_cut"), lit(true).as("_keeper"))
      .unionByName(dupDone.withColumn("_keeper", lit(false)))
    RemovalPass(out, fpFlagged)
  }

  private def freeCheckpoint(df: DataFrame): Unit =
    graft.CacheScope.freeLocalCheckpoint(df)

  /** Cross-corpus decontamination REMOVAL — the *action* the q61/q73/
    * q131 detection surface reports on (GPT-3 appendix C / Lee et al.
    * practice: when a training document shares a long verbatim run with
    * a held-out benchmark, cut the run and keep the remainder rather
    * than dropping the whole document). Cuts from every TRAIN doc each
    * character position lying inside a substring of length ≥ `minLen`
    * that also occurs in ANY eval doc.
    *
    * Same two-stage scale shape as [[removeDuplicateSpans]], with the
    * pair generation crossed: winnowed fingerprints of BOTH corpora,
    * equi-join on fingerprint value for (eval, train) candidates (never
    * |train|×|eval|), then ONE suffix automaton per EVAL doc streamed
    * with each candidate train text ([[SuffixAutomaton
    * .coverageIntervals]] on the train side), per-train-doc interval
    * union, one cut pass. Per-group state is O(longest eval doc); the
    * eval set is the small side by construction (a benchmark, not a
    * corpus), so groups are few and light.
    *
    * A train doc that is an exact copy of an eval doc cleans to the
    * empty string — doc-grain decontamination (q61) recovered as the
    * degenerate case.
    *
    * @param train   (id, text) — the corpus to clean
    * @param eval    (id, text) — the held-out set to protect
    * @param minLen  cut spans of at least this many characters; must be
    *                ≥ k + w − 1 (the winnowing guarantee)
    * @return train as (idCol, textCol, n_cut) — cleaned text and
    *         characters removed; uncontaminated docs pass through with
    *         n_cut = 0 */
  /** The eval-side half of [[removeContaminatedSpans]], precomputable:
    * winnowed fingerprints of the protected corpus as (_eid, fp) rows.
    * A STREAMING decontamination gate builds this once (the benchmark
    * set is fixed) and probes it with every arriving micro-batch
    * instead of re-fingerprinting the eval corpus per batch. */
  def contaminationIndex(
      eval: DataFrame, k: Int = 20, w: Int = 6,
      idCol: String = "id", textCol: String = "text"): DataFrame =
    fingerprints(eval, idCol, textCol, k, w)
      .withColumnRenamed("_id", "_eid")

  def removeContaminatedSpans(
      train: DataFrame, eval: DataFrame, minLen: Int,
      k: Int = 20, w: Int = 6,
      idCol: String = "id", textCol: String = "text",
      evalIndex: Option[DataFrame] = None): DataFrame = {
    require(k >= 2 && w >= 1, s"degenerate fingerprint params k=$k w=$w")
    require(minLen >= k + w - 1,
      s"winnowing guarantees detection only at >= k + w - 1 = ${k + w - 1} " +
        s"chars; got minLen=$minLen (shrink k or w)")
    val spark = train.sparkSession
    import spark.implicits._
    val tDocs = train.select(col(idCol), col(textCol))
    val tFp = fingerprints(tDocs, idCol, textCol, k, w)
      .withColumnRenamed("_id", "_tid")
    val eFp = evalIndex.getOrElse(contaminationIndex(eval, k, w, idCol, textCol))
    val pairs = eFp.join(tFp, Seq("fp")).select("_eid", "_tid").distinct()
    val cands = pairs
      .join(eval.select(col(idCol).as("_eid"), col(textCol).as("_etext")),
        Seq("_eid"))
      .join(tDocs.select(col(idCol).as("_tid"), col(textCol).as("_ttext")),
        Seq("_tid"))
      .select(col("_eid").cast("string"), col("_tid").cast("string"),
        col("_etext"), col("_ttext"))
      .as[(String, String, String, String)]
    // one automaton per EVAL doc serves all its candidate train partners
    val intervals = cands
      .groupByKey(_._1)
      .flatMapGroups { (_, rows) =>
        var sam: SuffixAutomaton = null
        rows.flatMap { case (_, tid, etext, ttext) =>
          if (sam == null) sam = new SuffixAutomaton(etext)
          sam.coverageIntervals(ttext, minLen)
            .map { case (st, en) => (tid, st, en) }
        }
      }
      .toDF("_sid", "_st", "_en")
      .groupBy("_sid")
      .agg(collect_list(struct(col("_st"), col("_en"))).as("_ivs"))
    tDocs
      .join(intervals, col(idCol).cast("string") === col("_sid"), "left")
      .withColumn("_cut", cutUdf(col(textCol), col("_ivs")))
      .select(col(idCol), col("_cut._1").as(textCol),
        col("_cut._2").as("n_cut"))
  }

  /** [[removeDuplicateSpans]] iterated to a FIXPOINT (Lee et al. §4.1
    * run ExactSubstr repeatedly for exactly this reason): cutting a
    * span can create a NEW duplicate at the seam — the text left of the
    * cut concatenated with the text right of it may itself be a ≥minLen
    * run held by an earlier document — so a single pass under-removes.
    * Repeats the removal until a pass cuts nothing (or `maxIter`),
    * accumulating per-doc cut counts.
    *
    * Each pass is materialized via `localCheckpoint` before the next
    * builds on it (the iterative-DataFrame discipline every fixpoint
    * operator in the repo follows — plan nesting is never deeper than
    * one pass), and each pass's operator-internal cache pins are
    * released as soon as its checkpoint lands (`CacheScope
    * .materializeAndRelease`), so driver/storage state is O(one pass)
    * regardless of iteration count. Convergence needs one tiny
    * aggregate action per pass — a driver-side scalar, not a collect.
    *
    * In practice the fixpoint lands in 2–3 passes (each pass strictly
    * shrinks total text, and seam re-matches need the cut flanks to
    * reconstruct an earlier doc's run — rare outside adversarial
    * corpora), so `maxIter` is a backstop, not a tuning knob.
    *
    * Passes after the first are INCREMENTAL (optimization guide §1.2 —
    * don't recompute what cannot have changed): a pass carries forward
    * its keepers' winnowed fingerprints and the set of STABLE docs
    * (keeper last pass, not cut by it). The next pass re-fingerprints
    * only non-stable keepers and skips stable×stable candidate pairs —
    * both exact: a stable doc's text is unchanged (same fingerprints),
    * and a stable×stable pair was already resolved by the previous
    * pass with identical inputs, whose cut left the late side intact,
    * i.e. no qualifying interval exists. Output is byte-identical to
    * re-running the full pass (spec-pinned; q146's oracle gates it
    * end-to-end), while pass n ≥ 2 costs O(changed docs + their
    * collisions) instead of O(corpus).
    *
    * @return (idCol, textCol, n_cut) — n_cut totalled across passes */
  def removeDuplicateSpansIterated(
      docs: DataFrame, minLen: Int, maxIter: Int = 5,
      k: Int = 20, w: Int = 6,
      idCol: String = "id", textCol: String = "text"): DataFrame = {
    require(maxIter >= 1, s"maxIter must be >= 1; got $maxIter")
    var cur = docs
      .select(col(idCol), col(textCol), lit(0L).as("n_cut"))
      .localCheckpoint()
    var carry: Option[RemovalCarry] = None
    var it = 0
    var converged = false
    while (it < maxIter && !converged) {
      val prevCur = cur
      val prevCarry = carry
      // a pass only pays the fingerprint checkpoint when a next pass
      // can exist to consume it
      val wantCarry = it + 1 < maxIter
      // threads the pass's reusable state from the scope body (which
      // must return a DataFrame) to the action; local to this call
      var passRef: RemovalPass = null
      val (ck, roundCut) = graft.CacheScope.materializeAndRelease {
        val pass = removeDuplicateSpansPass(
          cur.select(col(idCol), col(textCol)), minLen, k, w, idCol, textCol,
          carry, needCarry = wantCarry)
        passRef = pass
        pass.out
          .withColumnRenamed("n_cut", "_round_cut")
          .join(cur.select(col(idCol), col("n_cut").as("_prev")), Seq(idCol))
          .select(col(idCol), col(textCol),
            (col("_prev") + col("_round_cut").cast("long")).as("n_cut"),
            col("_round_cut"), col("_keeper"))
      } { df =>
        // the pass's ONE driver-visible materialization: output, round
        // cuts, keeper flags all land in a single checkpoint; the
        // convergence scalar is an in-memory aggregate over it
        val c = df.localCheckpoint()
        (c, c.agg(coalesce(max(col("_round_cut")), lit(0))).head.getInt(0))
      }
      // next pass's carry: the pass's fingerprint checkpoint plus the
      // stable set as a NARROW FILTER over ck (keeper and uncut) — no
      // separate stable-id materialization (r18 paid a double-join +
      // localCheckpoint per pass for the same set)
      carry =
        if (roundCut == 0 || !wantCarry) {
          // a checkpointed fingerprint frame with no next pass to read
          // it is dead on arrival — free it now
          if (wantCarry) freeCheckpoint(passRef.fp)
          None
        } else Some(RemovalCarry(passRef.fp,
          ck.filter(col("_keeper") && col("_round_cut") === 0)
            .select(col(idCol))))
      cur = ck
      // superseded checkpoints are dead as of this point: prevCur was
      // folded into ck, prevCarry.fp into this pass's fingerprint
      // checkpoint (and prevCarry.stableIds filtered the now-dead
      // prev-prev ck). Free their blocks instead of waiting for GC.
      freeCheckpoint(prevCur)
      prevCarry.foreach(c => freeCheckpoint(c.fp))
      converged = roundCut == 0
      it += 1
    }
    cur.select(col(idCol), col(textCol), col("n_cut"))
  }
}
