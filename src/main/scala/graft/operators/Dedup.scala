package graft.operators

import graft.functions.HashFunctions._
import graft.functions.TextFunctions._
import graft.functions.VectorFunctions._
import org.apache.spark.sql.{Column, DataFrame}
import graft.functions.PortableMath.rnd
import org.apache.spark.sql.functions._

/** Deduplication suite for LLM-training-data pipelines: exact, MinHash-LSH,
  * SimHash, n-gram Jaccard, and embedding-cosine near-dup. Generalizes the
  * reference's content-hash dedup guard (reference main.py:78-81: skip
  * store when `doc:<sha256>` already exists) into the full dedup family a
  * 100 TB corpus needs.
  *
  * Scale design:
  *  - exact dedup: hash-groupBy — one shuffle on a 64-char key, partial
  *    map-side aggregation, no data row ever carried past its hash.
  *  - MinHash signatures: computed per-row with higher-order functions
  *    (no explode, no shuffle); only the b band keys are exploded, so the
  *    shuffle volume is O(rows * bands), independent of document length.
  *  - candidate pairs come from band-bucket self-joins (classic LSH): the
  *    join key is (band, signature-slice), which Catalyst executes as a
  *    shuffled hash join on a compact key — never an all-pairs product.
  *  - SimHash: per-row sketch, then pairs within hamming radius via
  *    bucketed join on rotated prefixes (here: exact-match buckets).
  *  - embedding near-dup: brute-force pair scores under a blocking key at
  *    test scale; the ANN path (Ann.scala) is the 100 TB route.
  *
  * CACHE CONTRACT: operators here pin (persist) intermediates that are
  * both (a) reused by several branches of the returned lazy plan and
  * (b) CSE barriers against Catalyst's projection collapse. They cannot
  * unpersist eagerly — the returned DataFrame has not run yet. Pins are
  * routed through [[graft.CacheScope.pin]]: callers wrap build+consume
  * in `CacheScope.materializeAndRelease` (what Bench/Verify do per
  * query) and exactly these pins are dropped after the terminal action;
  * without a scope, pins are plain persists the caller must release.
  */
object Dedup {

  private lazy val log = org.slf4j.LoggerFactory.getLogger(getClass)

  /** Exact duplicate groups by content hash. Returns one row per
    * duplicated content: (content_hash, n_copies, keeper_id) with
    * keeper = min id — the reference's "first writer wins" semantics
    * (main.py:80-81: second submit of same content is a no-op). */
  def exactDupGroups(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs
      .withColumn("content_hash", sha2(col(textCol), 256))
      .groupBy("content_hash")
      .agg(count(lit(1)).as("n_copies"), min(col(idCol)).as("keeper_id"))
      .filter(col("n_copies") >= 2)

  /** Exact dedup keeping the minimum id per content hash (insert-if-absent
    * as a relational op). Output: the kept rows. */
  def dedupExact(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(sha2(col(textCol), 256))
      .orderBy(col(idCol))
    docs.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1)
      .drop("_rn")
  }

  /** MinHash signature as an array column: sig[i] = min over shingles of
    * the i-th affine mix of ONE base md5 hash per shingle. Pure per-row
    * computation (no shuffle). Prefer the explode+agg form (see
    * nearDupMinhashLsh) when the signature feeds further per-element
    * slicing — array slicing duplicates this whole tree per slice. */
  def minhashSignature(shingles: Column, numHashes: Int): Column = {
    val bases = transform(shingles, s => minhashBase(s))
    array((0 until numHashes).map(i =>
      array_min(transform(bases, b => (lit(minhashA(i)) * b + lit(minhashB(i))) % MinhashP))): _*)
  }

  /** LSH band keys: signature split into `bands` bands of `rowsPerBand`
    * hashes; key = band index + joined slice. Docs sharing any band key
    * are candidate near-duplicates. */
  def bandKeys(sig: Column, bands: Int, rowsPerBand: Int): Column =
    array((0 until bands).map { b =>
      val slice = (0 until rowsPerBand)
        .map(r => element_at(sig, b * rowsPerBand + r + 1).cast("string"))
      concat_ws("_", lit(b.toString) +: slice: _*)
    }: _*)

  /** MinHash-LSH near-duplicate candidate pairs with exact Jaccard
    * verification.
    *
    * @return (id_a, id_b, jaccard) with id_a < id_b, jaccard >= threshold
    */
  def nearDupMinhashLsh(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      shingleWidth: Int = 3,
      numHashes: Int = 12,
      bands: Int = 4,
      threshold: Double = 0.5
  ): DataFrame = {
    val rowsPerBand = numHashes / bands
    // Shingle sets are reused twice (banding + jaccard verify via a
    // self-join): persist so the text is shingled once, not 4x. Plan
    // shape matters more than it looks: computing the signature as an
    // array column and then slicing it into band keys DUPLICATES the
    // whole 12-hash expression tree into every element_at — Catalyst
    // collapses projections without CSE, a 12x md5 blowup measured at
    // 400+s on sf0.1. The explode + one-pass partial aggregation below
    // computes every hash exactly once and map-side-combines the mins —
    // also the right plan at 100 TB (shuffle carries only
    // numHashes longs per doc).
    val withSh = docs
      .select(col(idCol).as("id"), wordShingles(col(textCol), shingleWidth).as("sh"))
      .filter(size(col("sh")) > 0)
      .transform(graft.CacheScope.pin)

    // one md5 per shingle (projected ONCE, below the aggregate), then
    // numHashes affine mixes aggregated min in a single pass
    val sigCols = (0 until numHashes)
      .map(i => min(minhashMix(col("h"), i)).as(s"h$i"))
    val sig = withSh
      .select(col("id"), explode(col("sh")).as("s"))
      .select(col("id"), minhashBase(col("s")).as("h"))
      .groupBy("id")
      .agg(sigCols.head, sigCols.tail: _*)

    val bandKeyCols = (0 until bands).map { b =>
      val slice = (0 until rowsPerBand).map(r => col(s"h${b * rowsPerBand + r}").cast("string"))
      concat_ws("_", lit(b.toString) +: slice: _*)
    }
    val banded = sig
      .select(col("id"), explode(array(bandKeyCols: _*)).as("bkey"))

    val cand = banded.as("a")
      .join(banded.as("b"),
        col("a.bkey") === col("b.bkey") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .dropDuplicates("id_a", "id_b")

    cand
      .join(withSh.select(col("id").as("id_a"), col("sh").as("sh_a")), Seq("id_a"))
      .join(withSh.select(col("id").as("id_b"), col("sh").as("sh_b")), Seq("id_b"))
      .withColumn("inter", size(array_intersect(col("sh_a"), col("sh_b"))))
      .withColumn("uni", size(array_union(col("sh_a"), col("sh_b"))))
      .withColumn("jaccard",
        rnd(col("inter").cast("double") / col("uni").cast("double"), 6))
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")
  }

  /** Content-defined chunking (CDC): split text at positions where a
    * rolling hash of the trailing `window` characters hits 0 mod
    * `divisor` — the storage-dedup primitive (LBFS/rsync family)
    * applied to corpus text: chunk boundaries depend only on LOCAL
    * content, so an edit anywhere shifts at most the chunks it touches
    * and boundaries RESYNCHRONIZE right after (fixed-stride chunking
    * misaligns everything downstream of an insertion — the property
    * spec-pinned in DedupSpec). Mean chunk length ≈ divisor chars.
    *
    * The hash is a polynomial over code points,
    * H(i) = Σ_{j<w} code(s[i−j])·b^j mod p — INTEGER math both engines
    * compute bit-identically (max |term| ≈ 1.1e6·1e6, sum of 8 < 2⁶³:
    * exact in Int64, association-free), unlike any md5-per-window
    * device, and unlike engine hash() it is portable. At 100 TB this is
    * a pure map stage: the cut positions come from the one-pass codegen
    * expression [[graft.expressions.CdcCuts]] — O(L·w) per document
    * (ring buffer over the trailing window), no shuffle until the
    * chunk-level aggregation. (The previous HOF formulation —
    * `filter(sequence(w, len), i -> Σ ascii(substr(s, i-j, 1))…)` —
    * was O(L²·w): every `substr(i, 1)` is an O(i) codepoint scan, and
    * it ran per position. Measured: 38.7 s → see q115 bench.
    * [[cdcCutsHof]] preserves that form as the semantics reference the
    * expression must match, spec-pinned in CdcSpec.)
    *
    * @return (id, chunk) — one row per chunk occurrence, in order */
  def cdcChunks(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      window: Int = 8,
      divisor: Int = 64,
      base: Long = 31L,
      prime: Long = 1000003L): DataFrame = {
    val s = col(textCol)
    val cuts = org.apache.spark.sql.graftbridge.Bridge.column(
      graft.expressions.CdcCuts(
        org.apache.spark.sql.graftbridge.Bridge.expression(s),
        window, divisor, base, prime))
    val starts = concat(array(lit(1)), transform(col("_cuts"), c => c + 1))
    val ends = concat(col("_cuts"), array(col("_len")))
    Par.ensureMapParallelism(docs)
      .select(col(idCol).as("id"), s.as("_s"), length(s).as("_len"), cuts.as("_cuts"))
      .select(col("id"), col("_s"),
        zip_with(starts, ends,
          (st, en) => col("_s").substr(st, en - st + 1)).as("_chunks"))
      .select(col("id"), explode(col("_chunks")).as("chunk"))
      .filter(length(col("chunk")) > 0)
  }

  /** The pure-public-API cut-position formulation [[cdcChunks]] used
    * before round 8 — kept ONLY as the semantics reference for
    * [[graft.expressions.CdcCuts]] (CdcSpec pins element-wise equality
    * on prose, edge cases, and randomized strings). Do not put this on
    * a data path: it is O(L²·w) per document (each `substr(i, 1)` scans
    * from the string head). */
  private[graft] def cdcCutsHof(
      s: Column, window: Int, divisor: Int,
      base: Long, prime: Long): Column = {
    val len = length(s)
    val pow = Array.iterate(1L, window)(x => x * base % prime)
    def rollingHash(i: Column): Column =
      (0 until window).map { j =>
        ascii(s.substr(i - lit(j), lit(1))).cast("long") * lit(pow(j))
      }.reduce(_ + _) % prime
    when(len < window, array().cast("array<int>"))
      .otherwise(filter(sequence(lit(window), len),
        i => rollingHash(i) % divisor === 0))
  }

  /** Chunk-grain dedup report over [[cdcChunks]]: per document, how
    * many of its chunks also occur in at least one OTHER document —
    * the sub-document contamination/redundancy signal (boilerplate
    * headers, quoted replies, syndicated passages) that doc-level and
    * paragraph-level dedup both miss when the shared run does not align
    * with their unit. shared_ratio near 1 = the doc is assembled from
    * corpus-common material.
    *
    * Scale shape: CDC map stage → (chunk-hash)-keyed distinct-doc agg →
    * hash-keyed join back → per-doc conditional sum; identity is
    * md5(chunk) so the shuffle carries 32-char keys, never chunk text.
    *
    * @return (id, n_chunks, n_shared, shared_ratio) */
  def cdcDedupStats(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      window: Int = 8,
      divisor: Int = 64): DataFrame = {
    val ch = cdcChunks(docs, idCol, textCol, window, divisor)
      .select(col("id"), md5(col("chunk")).as("h"))
      .transform(graft.CacheScope.pin) // hash-level agg AND per-doc join
    val byHash = ch.groupBy("h")
      .agg(countDistinct(col("id")).as("nd"))
    val perDoc = ch.join(byHash, Seq("h"))
      .groupBy("id")
      .agg(count(lit(1)).as("n_chunks"),
        sum(when(col("nd") >= 2, 1L).otherwise(0L)).as("n_shared"))
    Par.ensureMapParallelism(docs).select(col(idCol).as("id"))
      .join(perDoc, Seq("id"), "left")
      .select(col("id"),
        coalesce(col("n_chunks"), lit(0L)).as("n_chunks"),
        coalesce(col("n_shared"), lit(0L)).as("n_shared"),
        coalesce(rnd(col("n_shared").cast("double") /
          col("n_chunks").cast("double"), 6), lit(0.0)).as("shared_ratio"))
  }

  /** MinHash calibration report: for every LSH candidate pair, the
    * sketch's Jaccard ESTIMATE (matching signature components / k)
    * side by side with the exact shingle Jaccard — the audit that tells
    * you whether the sketch parameters (numHashes, bands) are honest on
    * YOUR corpus before you trust them at 100 TB, where exact
    * verification of every pair is unaffordable and the estimate IS the
    * dedup decision. The expected |err| is ~sqrt(J(1-J)/k); a corpus
    * whose measured errors blow past that has adversarial/degenerate
    * shingle structure and needs a bigger k.
    *
    * Same construction discipline as [[nearDupMinhashLsh]] (one md5 per
    * shingle, explode + single-pass min aggregation, banded self-join);
    * the signature comparison is a fixed 12-term integer sum, the two
    * ratios are portable-rounded divisions — fully oracle-mirrorable.
    *
    * @return (id_a, id_b, n_match, est_jaccard, exact_jaccard, err)
    *         for all candidate pairs (no threshold — the report wants
    *         the misses too), err = est − exact on the rounded values */
  def minhashCalibration(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      shingleWidth: Int = 3,
      numHashes: Int = 12,
      bands: Int = 4): DataFrame = {
    val rowsPerBand = numHashes / bands
    val withSh = docs
      .select(col(idCol).as("id"), wordShingles(col(textCol), shingleWidth).as("sh"))
      .filter(size(col("sh")) > 0)
      .transform(graft.CacheScope.pin)
    val sigCols = (0 until numHashes)
      .map(i => min(minhashMix(col("h"), i)).as(s"h$i"))
    val sig = withSh
      .select(col("id"), explode(col("sh")).as("s"))
      .select(col("id"), minhashBase(col("s")).as("h"))
      .groupBy("id")
      .agg(sigCols.head, sigCols.tail: _*)
      .transform(graft.CacheScope.pin) // banding AND both pair sides read it
    val bandKeyCols = (0 until bands).map { b =>
      val slice = (0 until rowsPerBand).map(r => col(s"h${b * rowsPerBand + r}").cast("string"))
      concat_ws("_", lit(b.toString) +: slice: _*)
    }
    val banded = sig.select(col("id"), explode(array(bandKeyCols: _*)).as("bkey"))
    val cand = banded.as("a")
      .join(banded.as("b"),
        col("a.bkey") === col("b.bkey") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .dropDuplicates("id_a", "id_b")
    val sigA = sig.select(col("id").as("id_a") +:
      (0 until numHashes).map(i => col(s"h$i").as(s"a$i")): _*)
    val sigB = sig.select(col("id").as("id_b") +:
      (0 until numHashes).map(i => col(s"h$i").as(s"b$i")): _*)
    val nMatch = (0 until numHashes)
      .map(i => when(col(s"a$i") === col(s"b$i"), 1L).otherwise(0L))
      .reduce(_ + _)
    cand
      .join(sigA, Seq("id_a"))
      .join(sigB, Seq("id_b"))
      .join(withSh.select(col("id").as("id_a"), col("sh").as("sh_a")), Seq("id_a"))
      .join(withSh.select(col("id").as("id_b"), col("sh").as("sh_b")), Seq("id_b"))
      .withColumn("n_match", nMatch)
      .withColumn("est_jaccard", rnd(col("n_match").cast("double") /
        lit(numHashes.toDouble), 6))
      .withColumn("exact_jaccard",
        rnd(size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          size(array_union(col("sh_a"), col("sh_b"))).cast("double"), 6))
      .withColumn("err", rnd(col("est_jaccard") - col("exact_jaccard"), 6))
      .select("id_a", "id_b", "n_match", "est_jaccard", "exact_jaccard", "err")
  }

  /** SimHash sketch of the token multiset: bit j of the sketch is 1 iff
    * sum over tokens of ±1 (per token-hash bit j) is positive.
    * Integer-only math → bit-identical across engines. `bits` is a plan
    * literal, so the loop unrolls into `bits` independent aggregates over
    * the shared hash array. */
  def simhash(textCol: Column, bits: Int = 32): Column =
    simhashFromHashes(transform(tokens(textCol), t => hash60(t)), bits)
  // NB: when the input expression is expensive (md5 per token), feed a
  // MATERIALIZED hash-array column instead — each of the `bits` vote
  // aggregates embeds its own copy of the input expression tree
  // (projection collapse has no CSE), a `bits`-fold recompute otherwise.

  /** SimHash from a precomputed token-hash array column. */
  def simhashFromHashes(hashes: Column, bits: Int): Column =
    (0 until bits).map { j =>
      val vote = aggregate(hashes, lit(0L),
        (s, h) => s + when(shiftright(h, j) % 2 === 1, 1L).otherwise(-1L))
      when(vote > 0, lit(1L << j)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** Near-dup pairs by identical SimHash sketch (hamming distance 0 at
    * exact-bucket granularity; radius>0 = multi-probe over bit-rotations,
    * kept for a later round). */
  def nearDupSimhash(
      docs: DataFrame, idCol: String, textCol: String, bits: Int = 32): DataFrame = {
    // materialize token hashes (md5 each) before the bit-vote fan-out,
    // and the sketch before the self-join — see simhash() note
    val withHs = docs.select(col(idCol).as("id"),
      transform(tokens(col(textCol)), t => hash60(t)).as("hs")).transform(graft.CacheScope.pin)
    val sk = withHs.select(col("id"),
      simhashFromHashes(col("hs"), bits).as("sk")).transform(graft.CacheScope.pin)
    sk.as("a").join(sk.as("b"),
        col("a.sk") === col("b.sk") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"), col("a.sk").as("sketch"))
  }

  /** Near-dup pairs within hamming radius `radius` of the SimHash sketch
    * — the real near-dup setting ([[nearDupSimhash]] radius 0 only finds
    * near-identical token multisets).
    *
    * Pigeonhole banding: split the `bits`-bit sketch into radius+1
    * blocks; two sketches within hamming distance `radius` differ in at
    * most `radius` blocks, so they AGREE exactly on at least one block.
    * Candidates = pairs sharing any (block index, block value); verify
    * with an exact popcount on the XOR. Same scale shape as MinHash-LSH
    * banding: the join key is a compact (int, long) pair, shuffle volume
    * O(rows × (radius+1)), never all-pairs.
    * @return (id_a, id_b, hamming) with id_a < id_b, hamming <= radius */
  def nearDupSimhashRadius(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      bits: Int = 32,
      radius: Int = 3): DataFrame = {
    require(radius >= 1 && radius < bits, s"radius $radius out of (0, $bits)")
    val nBlocks = radius + 1
    val w = bits / nBlocks
    // materialize hashes then the sketch (projection-collapse CSE hazard,
    // see simhash()), and the sketch before banding + the verify join
    val withHs = docs.select(col(idCol).as("id"),
      transform(tokens(col(textCol)), t => hash60(t)).as("hs")).transform(graft.CacheScope.pin)
    val sk = withHs.select(col("id"),
      simhashFromHashes(col("hs"), bits).as("sk")).transform(graft.CacheScope.pin)
    val blockCols = (0 until nBlocks).map { b =>
      val lo = b * w
      val width = if (b == nBlocks - 1) bits - lo else w
      shiftright(col("sk"), lo).bitwiseAND(lit((1L << width) - 1L))
    }
    val banded = sk.select(col("id"), col("sk"),
      posexplode(array(blockCols: _*)).as(Seq("blk", "bval")))
    banded.as("a")
      .join(banded.as("b"),
        col("a.blk") === col("b.blk") && col("a.bval") === col("b.bval") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        col("a.sk").as("sk_a"), col("b.sk").as("sk_b"))
      .dropDuplicates("id_a", "id_b") // pair can collide in several blocks
      .withColumn("hamming",
        bit_count(col("sk_a").bitwiseXOR(col("sk_b"))).cast("long"))
      .filter(col("hamming") <= radius)
      .select("id_a", "id_b", "hamming")
  }

  /** Exact n-gram Jaccard similarity for candidate pairs under a cheap
    * blocking key (shared rare shingles) with a HARD block-size cap:
    * blocks larger than `maxBlock` never pair all-vs-all — their members
    * are rerouted through a MinHash-banded candidate generator (the q23
    * pipeline shape), so a pathological corpus where thousands of
    * dissimilar docs share their two rarest shingles stays O(rows ×
    * bands) instead of O(block²). Candidates from either route are
    * verified with EXACT Jaccard; rerouting trades a little recall on
    * mid-similarity pairs inside oversized blocks (banding probability
    * 1-(1-j^rows)^bands), never precision. */
  def ngramJaccardPairs(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      n: Int = 3,
      threshold: Double = 0.3,
      maxBlock: Int = 64,
      numHashes: Int = 12,
      bands: Int = 6
  ): DataFrame = {
    // Shingle ONCE into a persisted relation (Par BEFORE the projection:
    // a small parquet scan is one split, and a repartition placed after
    // the select would still evaluate the shingling below the exchange —
    // serially). The block key is then derived from the MATERIALIZED
    // array; deriving it in the same projection as `sh` would re-run the
    // whole charShingles tree inside the blk expression (projection
    // collapse has no CSE).
    // Block key = the TWO smallest shingle hashes (joined): one global
    // min collapses a shared-vocabulary corpus into a single block
    // (measured 78% of docs), the pair cuts the quadratic verify down
    // while still co-blocking any pair sharing its two rarest shingles.
    val withSh = Par.ensureMapParallelism(docs)
      .select(col(idCol).as("id"), charShingles(col(textCol), n).as("sh"))
      .transform(graft.CacheScope.pin)
    // slim (id, blk, bn) relation: the window count rides the same
    // shuffle the small-block self-join needs anyway, and keeping the
    // shingle arrays out of it keeps that shuffle metadata-sized
    val bw = org.apache.spark.sql.expressions.Window.partitionBy("blk")
    val blocked = withSh
      .select(col("id"),
        array_join(
          transform(
            slice(array_sort(transform(col("sh"), s => hash60(s))), 1, 2),
            h => h.cast("string")),
          "_").as("blk"))
      .withColumn("bn", count(lit(1)).over(bw))
      .transform(graft.CacheScope.pin)
    val cand = ngramCandidates(blocked, withSh, maxBlock, numHashes, bands)
    verifyJaccard(cand, withSh, threshold)
  }

  /** Candidate pairs (id_a < id_b) from the two-route blocking:
    * within-block all-pairs when the block is small, MinHash-banded keys
    * for members of oversized blocks. `blocked` = (id, blk, bn);
    * `withSh` = (id, sh) for the banded route's signatures.
    * Package-private so specs can pin the no-quadratic-block guarantee
    * on an adversarial corpus directly. */
  private[graft] def ngramCandidates(
      blocked: DataFrame, withSh: DataFrame,
      maxBlock: Int, numHashes: Int, bands: Int): DataFrame = {
    require(numHashes % bands == 0, s"bands $bands must divide numHashes $numHashes")
    val rowsPerBand = numHashes / bands
    val small = blocked.filter(col("bn") <= maxBlock)
    val smallCand = small.as("a")
      .join(small.as("b"),
        col("a.blk") === col("b.blk") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
    // oversized blocks: q23-shaped banded generation — one md5 per
    // shingle below a one-pass partial aggregation, band keys joined on
    // a compact string key. Shuffle O(members × bands), NEVER block².
    val sigCols = (0 until numHashes)
      .map(i => min(minhashMix(col("h"), i)).as(s"h$i"))
    val sig = blocked.filter(col("bn") > maxBlock).select("id")
      .join(withSh, Seq("id"))
      .select(col("id"), explode(col("sh")).as("s"))
      .select(col("id"), minhashBase(col("s")).as("h"))
      .groupBy("id")
      .agg(sigCols.head, sigCols.tail: _*)
    val bandKeyCols = (0 until bands).map { b =>
      val slice = (0 until rowsPerBand)
        .map(r => col(s"h${b * rowsPerBand + r}").cast("string"))
      concat_ws("_", lit(b.toString) +: slice: _*)
    }
    val banded = sig.select(col("id"), explode(array(bandKeyCols: _*)).as("bkey"))
    val bigCand = banded.as("a")
      .join(banded.as("b"),
        col("a.bkey") === col("b.bkey") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
    smallCand.unionByName(bigCand).dropDuplicates("id_a", "id_b")
  }

  /** Exact-Jaccard verify of id pairs against the shingled relation.
    * Joins BY ID (not inside the block join): candidate verification is
    * then hash-distributed over all partitions instead of skewed onto
    * whichever task owns the biggest block. |a ∪ b| is computed as
    * |a|+|b|-|a ∩ b| — shingle sets are distinct, and array_union would
    * build a throwaway array per pair just to take its size. */
  private def verifyJaccard(
      cand: DataFrame, withSh: DataFrame, threshold: Double): DataFrame =
    cand
      .join(withSh.select(col("id").as("id_a"), col("sh").as("sh_a")), Seq("id_a"))
      .join(withSh.select(col("id").as("id_b"), col("sh").as("sh_b")), Seq("id_b"))
      .withColumn("inter", size(array_intersect(col("sh_a"), col("sh_b"))))
      .withColumn("jaccard",
        rnd(col("inter").cast("double") /
          (size(col("sh_a")) + size(col("sh_b")) - col("inter")).cast("double"), 6))
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")

  /** Cross-corpus decontamination: (train, test) doc pairs sharing at
    * least `minShared` distinct word w-shingles — the training-data
    * hygiene scan that keeps benchmark/eval text out of a training set
    * (the GPT-3-style n-gram collision check, run as a relational join
    * instead of a per-doc probe). Inverted-index join on the shingle:
    * shuffle is O(total shingle occurrences), never train × test. At
    * 100 TB the asymmetry is the design: eval sets are MB-scale, so the
    * exploded test index broadcasts and the train side streams map-side
    * through the join — the full train corpus is scanned once and never
    * shuffled on anything wider than matched shingle rows.
    * @return (train_id, test_id, n_shared, jaccard) */
  def crossCorpusContamination(
      train: DataFrame,
      test: DataFrame,
      idCol: String,
      textCol: String,
      w: Int = 3,
      minShared: Int = 5
  ): DataFrame = {
    def shingled(df: DataFrame, out: String) =
      Par.ensureMapParallelism(df)
        .select(col(idCol).as(out), wordShingles(col(textCol), w).as("sh"))
        .transform(graft.CacheScope.pin) // index + size both read it
    val tr = shingled(train, "train_id")
    val te = shingled(test, "test_id")
    val shared = tr.select(col("train_id"), explode(col("sh")).as("s"))
      .join(te.select(col("test_id"), explode(col("sh")).as("s")), Seq("s"))
      .groupBy("train_id", "test_id")
      .agg(count(lit(1)).as("n_shared")) // distinct by construction:
      // wordShingles is a set, so a pair meets each shared shingle once
      .filter(col("n_shared") >= minShared)
    shared
      .join(tr.select(col("train_id"), size(col("sh")).as("n_train")), Seq("train_id"))
      .join(te.select(col("test_id"), size(col("sh")).as("n_test")), Seq("test_id"))
      .select(col("train_id"), col("test_id"), col("n_shared"),
        (col("n_shared").cast("double") /
          (col("n_train") + col("n_test") - col("n_shared")).cast("double"))
          .as("jaccard"))
  }

  /** Paragraph-level dedup with per-document contamination rollup — the
    * reference's whole-doc content-hash guard (main.py:78-81) taken one
    * granularity down, which is where real training pipelines dedup
    * (boilerplate, licenses, navigation chrome repeat at paragraph
    * grain long before whole documents collide).
    *
    * Pipeline:
    *  1. explode each doc on a LITERAL delimiter into (id, idx, para)
    *     occurrences, dropping empties;
    *  2. exact grain: sha-256 per paragraph; keeper = first occurrence
    *     in (id, idx) order (the corpus-wide seeds-win rule of
    *     [[dedupExact]]); every later occurrence is an exact duplicate;
    *  3. near grain: MinHash-LSH pairs ([[nearDupMinhashLsh]]) over the
    *     DISTINCT paragraph contents — one representative per hash, so
    *     a boilerplate repeated a billion times enters the quadratic-ish
    *     candidate stage ONCE, not a billion times (the 100 TB shape:
    *     distinct-paragraph cardinality, not occurrence cardinality,
    *     drives the LSH join);
    *  4. roll up per doc: paragraph count, exact-duplicate count,
    *     count of paragraphs whose content has a verified near-dup
    *     partner content, and the exact-contamination fraction.
    *
    * Scale design: step 1 is a narrow map; step 2 is one shuffle on the
    * 64-char hash (window, no data rows wider than (id, idx, hash));
    * step 3 inherits nearDupMinhashLsh's O(distinct-paras × bands)
    * shuffle bound; step 4 is a partial-aggregable groupBy on doc id.
    *
    * @return (id, n_paras, n_exact_dup, n_near_dup, contamination) */
  def paragraphContamination(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      delim: String = "\n\n",
      shingleWidth: Int = 3,
      numHashes: Int = 12,
      bands: Int = 6,
      threshold: Double = 0.5
  ): DataFrame = {
    // explode first, hash in a SEPARATE projection (sha2 over the
    // exploded column would otherwise be duplicated into every sibling
    // expression by projection collapse), then pin: the occurrence
    // relation feeds the keeper window, the distinct-rep build, and the
    // final rollup.
    val occ = Par.ensureMapParallelism(docs)
      .select(col(idCol).as("id"),
        posexplode(split(col(textCol), java.util.regex.Pattern.quote(delim), -1))
          .as(Seq("idx", "para")))
      .filter(col("para") =!= "")
      .withColumn("ph", sha2(col("para"), 256))
      .transform(graft.CacheScope.pin)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("ph").orderBy(col("id"), col("idx"))
    // one representative per distinct content (min is exact: all paras
    // under one hash are the same string)
    val reps = occ.groupBy("ph").agg(min(col("para")).as("para"))
    val pairs = nearDupMinhashLsh(reps, "ph", "para",
      shingleWidth, numHashes, bands, threshold)
    val nearh = pairs.select(col("id_a").as("ph"))
      .unionByName(pairs.select(col("id_b").as("ph")))
      .distinct()
      .withColumn("_near", lit(1))
    occ.withColumn("_rn", row_number().over(w))
      .join(nearh, Seq("ph"), "left")
      .groupBy("id")
      .agg(
        count(lit(1)).as("n_paras"),
        sum(when(col("_rn") > 1, 1L).otherwise(0L)).as("n_exact_dup"),
        sum(when(col("_near").isNotNull, 1L).otherwise(0L)).as("n_near_dup"))
      .withColumn("contamination",
        rnd(col("n_exact_dup").cast("double") / col("n_paras").cast("double"), 6))
  }

  /** Embedding-cosine near-duplicate pairs above a similarity threshold.
    * Test-scale exact form: all-pairs within label blocks. At 100 TB the
    * blocking key comes from LSH hyperplane signs (see Ann.lshBuckets). */
  def nearDupEmbedding(
      embs: DataFrame,
      idCol: String,
      vecCol: String,
      blockCol: String,
      threshold: Double
  ): DataFrame = {
    val e = embs.select(
      col(idCol).as("id"), col(vecCol).as("v"), col(blockCol).as("blk"))
    e.as("a").join(e.as("b"),
        col("a.blk") === col("b.blk") && col("a.id") < col("b.id"))
      .withColumn("cos", rnd(dotProduct(col("a.v"), col("b.v")), 6))
      .filter(col("cos") >= threshold)
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"), col("cos"))
  }

  /** Embedding near-dup with multi-table LSH as the BLOCKING key — the
    * 100 TB form of [[nearDupEmbedding]]: candidate pairs are docs
    * sharing a hyperplane-LSH bucket in ANY of `nTables` plane families
    * (the [[Ann.topKMultiTable]] OR-construction, self-joined), scored
    * exactly, thresholded. Approximate by design: a true near-pair
    * landing in no shared bucket is missed with probability
    * (1-p^nPlanes)^nTables, p = 1 - angle/π — near-dup pairs have p ≈ 1,
    * which is exactly where the construction's recall concentrates.
    *
    * Scale shape: the self-join is an equi-join on (table, bucket) —
    * cost Σ_buckets size², sublinear on clustered data (AnnRecallSpec:
    * candidate fraction 0.078 on the clustered corpus) and never the
    * all-pairs product; scoring happens BEFORE the pair dedup so the
    * (id_a, id_b) shuffle carries one double, not two dim-float vectors
    * (same argument as [[Ann.topKMultiTable]]).
    *
    * @return (id_a, id_b, cos) with id_a < id_b, cos rounded, >= threshold */
  def nearDupEmbeddingAnn(
      docs: DataFrame, idCol: String, vecCol: String,
      dim: Int, nPlanes: Int, nTables: Int, threshold: Double): DataFrame = {
    def buckets(vec: Column) = array(
      (0 until nTables).map(t => Ann.lshBucketT(vec, dim, nPlanes, t)): _*)
    val tagged = docs
      .select(col(idCol).as("id"), col(vecCol).as("embedding"),
        posexplode(buckets(col(vecCol))).as(Seq("tbl", "bucket")))
      .transform(graft.CacheScope.pin) // both sides of the self-join
    tagged.as("a").join(tagged.as("b"),
        col("a.tbl") === col("b.tbl") && col("a.bucket") === col("b.bucket") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        rnd(dotProduct(col("a.embedding"), col("b.embedding")), 6).as("cos"))
      .filter(col("cos") >= threshold)
      .dropDuplicates("id_a", "id_b") // same pair from several tables
  }

  /** SemDeDup-style semantic deduplication (Abbas et al. 2023,
    * arXiv:2303.09540): cluster the embedding space coarsely, then
    * within each cluster drop every document whose cosine similarity to
    * an EARLIER (smaller-id) cluster member exceeds `threshold` —
    * "keep the first occurrence of each semantic neighborhood". Catches
    * paraphrases and re-encodings that share no n-grams, the dup class
    * every text-grain pass (exact/MinHash/SimHash) is blind to.
    *
    * The cluster assignment is the IVF coarse quantizer ([[Ann.ivfBucket]]
    * — deterministic centroid literals, so the oracle reproduces it; a
    * production run swaps in [[Ann.trainedCentroids]], changing only the
    * literals). The keep rule is deterministic and idempotent: a kept
    * set re-run through the operator keeps everything (no smaller-id
    * neighbor above threshold survives by construction).
    *
    * Scale shape: the pair generator is a CLUSTER-KEYED self-join —
    * cost Σ_clusters size², never the all-pairs product; nCentroids
    * scales with corpus size (≈√N keeps per-cluster cost flat), and the
    * per-cluster max-to-previous aggregation is map-side combinable on
    * the (cluster, id) key. The id shuffles carry one double (the max),
    * not vectors.
    *
    * SKEW CAP (the [[ngramJaccardPairs]] maxBlock discipline, applied
    * to the embedding space): a degenerate corpus — one dominant
    * semantic cluster, or nCentroids sized badly below √N — would make
    * the within-cluster self-join quadratic in that cluster's size.
    * Clusters larger than `maxCluster` therefore never pair all-vs-all:
    * their members reroute through `subTables` independent LSH
    * hyperplane signatures ([[Ann.lshBucketT]], `subPlanes` bits each),
    * and pairs form only inside (cluster, table, signature) cells —
    * cost Σ_cells size², with 2^subPlanes × subTables cells carving up
    * each oversized cluster. The trade is recall-only, and vanishingly
    * small exactly where SemDeDup acts: two docs at cosine ≥ t agree on
    * one table's signature with prob (1 − arccos(t)/π)^subPlanes, and
    * the OR over tables makes a miss (1−p)^subTables — for t=0.9,
    * subPlanes=4, subTables=3 that is < 2%; a missed pair only means a
    * duplicate survives (keep=true), never a false drop. Exact
    * verification (the dot product) still scores every candidate.
    *
    * Idempotence: exact within the uncapped route (a kept set re-run
    * keeps everything). Across the cap boundary it is one-sided only —
    * re-running a deduped set can shrink a cluster below `maxCluster`,
    * widening candidates from sub-blocked to all-pairs, so a survivor
    * of the capped pass may be dropped on the re-run (never the
    * reverse: removing docs can only lower any max_sim_prev).
    *
    * @return (id, cluster, max_sim_prev, keep) one row per input doc;
    *         docs with no smaller-id candidate peer report max_sim_prev
    *         = -1.0 (below any cosine) and keep = true */
  def semanticDedup(
      embs: DataFrame, idCol: String, vecCol: String,
      dim: Int, nCentroids: Int, threshold: Double,
      maxCluster: Int = 4096, subPlanes: Int = 4, subTables: Int = 3): DataFrame = {
    val assigned = Par.ensureMapParallelism(embs)
      .select(col(idCol).as("id"), col(vecCol).as("v"),
        Ann.ivfBucket(col(vecCol), dim, nCentroids).cast("long").as("cluster"))
      .transform(graft.CacheScope.pin) // both join sides + the final left join
    val scored = semanticScoredPairs(
      assigned, dim, maxCluster, subPlanes, subTables)
    val best = scored
      .groupBy("id")
      .agg(rnd(max(col("sim")), 6).as("max_sim_prev"))
    assigned.select("id", "cluster")
      .join(best, Seq("id"), "left")
      .select(col("id"), col("cluster"),
        coalesce(col("max_sim_prev"), lit(-1.0)).as("max_sim_prev"),
        (coalesce(col("max_sim_prev"), lit(-1.0)) < threshold).as("keep"))
  }

  /** (id, sim) rows for every candidate (later-id, earlier-id) pair of
    * [[semanticDedup]]'s two-route generator — all-pairs inside small
    * clusters, LSH-sub-blocked inside oversized ones. A pair co-blocked
    * in several tables is scored more than once; max() upstream makes
    * the duplicates harmless, which saves the dropDuplicates shuffle.
    * Package-private so SemanticDedupSpec can pin the bounded-candidate
    * guarantee on a planted mega-cluster directly. */
  private[graft] def semanticScoredPairs(
      assigned: DataFrame, dim: Int,
      maxCluster: Int, subPlanes: Int, subTables: Int): DataFrame = {
    // cluster sizes ride the same cluster-keyed shuffle the small-route
    // self-join needs anyway (the ngramJaccardPairs `bn` device)
    val cw = org.apache.spark.sql.expressions.Window.partitionBy("cluster")
    val sized = assigned
      .withColumn("cn", count(lit(1)).over(cw))
      .transform(graft.CacheScope.pin) // small route ×2 + big route ×1
    val small = sized.filter(col("cn") <= maxCluster)
    val smallScored = small.as("a")
      .join(small.as("b"),
        col("a.cluster") === col("b.cluster") && col("b.id") < col("a.id"))
      .select(col("a.id").as("id"),
        dotProduct(col("a.v"), col("b.v")).as("sim"))
    // oversized clusters: explode each member into its subTables
    // signature cells; pairs require cell equality. Vectors stay in the
    // exploded relation (subTables × vector shuffle) — acceptable
    // because this route only ever carries the skew overflow, and it
    // saves the two id-keyed vector join-backs.
    val subKeys = (0 until subTables).map { t =>
      concat_ws("_", lit(t.toString),
        Ann.lshBucketT(col("v"), dim, subPlanes, t).cast("string"))
    }
    val big = sized.filter(col("cn") > maxCluster)
      .select(col("id"), col("v"), col("cluster"),
        explode(array(subKeys: _*)).as("sub"))
    val bigScored = big.as("a")
      .join(big.as("b"),
        col("a.cluster") === col("b.cluster") &&
          col("a.sub") === col("b.sub") && col("b.id") < col("a.id"))
      .select(col("a.id").as("id"),
        dotProduct(col("a.v"), col("b.v")).as("sim"))
    smallScored.unionByName(bigScored)
  }

  /** WITHIN-document repeated-unit removal — the Gopher/CCNet "remove
    * duplicate lines within the page" cleaning step ([[cdcDedupStats]]
    * and [[paragraphContamination]] measure repetition ACROSS docs;
    * this one removes it INSIDE each doc, where boilerplate navigation,
    * repeated headers, and quoted-reply chains live). A unit (split on
    * `delim`) is kept at its FIRST occurrence within its document and
    * dropped at every later one; the cleaned text is the kept units
    * re-joined in original order.
    *
    * Scale shape: explode → one shuffle keyed (id, unit-hash) for the
    * first-occurrence window → one id-keyed re-aggregation. Both keys
    * carry the doc id, so with the corpus pre-partitioned by id the
    * exchange is map-local; nothing is ever corpus-global — this is
    * per-document work however big the corpus.
    *
    * @return (id, n_units, n_removed, cleaned_len, cleaned_hash) —
    *         cleaned_hash = sha256 of the cleaned text, so equality
    *         against an expected cleaning is one string compare */
  def intraDocDedup(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      delim: String = "\n\n"): DataFrame = {
    val occ = Par.ensureMapParallelism(docs)
      .select(col(idCol).as("id"),
        posexplode(split(col(textCol), java.util.regex.Pattern.quote(delim), -1))
          .as(Seq("idx", "unit")))
      .filter(col("unit") =!= "")
      .withColumn("uh", sha2(col("unit"), 256))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("id", "uh").orderBy(col("idx"))
    val marked = occ.withColumn("_rn", row_number().over(w))
    marked
      .groupBy("id")
      .agg(
        count(lit(1)).as("n_units"),
        sum(when(col("_rn") > 1, 1L).otherwise(0L)).as("n_removed"),
        // kept units, original order: sort the (idx, unit) structs and
        // re-join — collect_list order is nondeterministic, the sort fixes it
        array_join(
          transform(
            array_sort(collect_list(
              when(col("_rn") === 1, struct(col("idx"), col("unit"))))),
            s => s.getField("unit")),
          delim).as("_cleaned"))
      .select(col("id"), col("n_units"), col("n_removed"),
        length(col("_cleaned")).cast("long").as("cleaned_len"),
        sha2(col("_cleaned"), 256).as("cleaned_hash"))
  }

  /** Benchmark-contamination measurement at n-gram grain: for every
    * test/eval document, the fraction of its distinct `w`-word shingles
    * that appear ANYWHERE in the training corpus. The per-SHINGLE
    * generalization of [[decontaminate]]'s doc-level hash probe — the
    * measure used to quantify train/test overlap when exact-duplicate
    * checks miss paraphrased or partially-copied leakage.
    *
    * Scale shape: the training side collapses to a DISTINCT shingle set
    * (term-keyed, map-side combined — never doc-pairs); the probe is a
    * shingle-keyed LEFT SEMI join (Bloom-prunable at 100 TB); per-doc
    * rollup is one count. Shuffle volume is O(distinct shingles), and
    * the train side can be pre-bucketed by shingle for an exchange-free
    * probe.
    *
    * @return (id, n_shingles, n_hit, contamination) — one row per test
    *         doc; zero-shingle docs report contamination 0.0 */
  def shingleContamination(
      test: DataFrame, train: DataFrame,
      idCol: String, textCol: String, w: Int = 5): DataFrame = {
    val trainSh = Par.ensureMapParallelism(train)
      .select(explode(wordShingles(col(textCol), w)).as("sh")).distinct()
    val testSh = Par.ensureMapParallelism(test)
      .select(col(idCol).as("id"), wordShingles(col(textCol), w).as("shs"))
      .transform(graft.CacheScope.pin) // totals AND the hit probe read it
    val totals = testSh
      .select(col("id"), size(col("shs")).cast("long").as("n_shingles"))
    val hits = testSh.select(col("id"), explode(col("shs")).as("sh"))
      .join(trainSh, Seq("sh"), "left_semi")
      .groupBy("id").agg(count(lit(1)).as("n_hit"))
    totals.join(hits, Seq("id"), "left")
      .select(col("id"), col("n_shingles"),
        coalesce(col("n_hit"), lit(0L)).as("n_hit"),
        when(col("n_shingles") > 0,
          rnd(coalesce(col("n_hit"), lit(0L)).cast("double") /
            col("n_shingles").cast("double"), 6))
          .otherwise(lit(0.0)).as("contamination"))
  }

  /** MinHash signature index of a keeper corpus: (id, sig
    * ARRAY<BIGINT>[numHashes]) — the PERSISTED artifact an incremental
    * pipeline dedups incoming batches against without ever re-reading
    * corpus text. At ~8·numHashes bytes/doc the index is ~1e-4 of
    * corpus bytes at 100 TB; store it bucketed by band key
    * ([[bandKeys]]) and admission joins become exchange-free on the
    * index side. Same one-pass explode + partial-agg signature shape as
    * [[nearDupMinhashLsh]] (each shingle hashed exactly once,
    * map-side-combined mins; shuffle carries numHashes longs per doc).
    * Docs with no shingles (< shingleWidth tokens) have no signature
    * and never match anything — mirrored by the q172 oracle. */
  def signatureIndex(
      docs: DataFrame, idCol: String, textCol: String,
      shingleWidth: Int = 3, numHashes: Int = 12): DataFrame = {
    val sigCols = (0 until numHashes)
      .map(i => min(minhashMix(col("h"), i)).as(s"h$i"))
    docs
      .select(col(idCol).as("id"), wordShingles(col(textCol), shingleWidth).as("sh"))
      .filter(size(col("sh")) > 0)
      .select(col("id"), explode(col("sh")).as("s"))
      .select(col("id"), minhashBase(col("s")).as("h"))
      .groupBy("id")
      .agg(sigCols.head, sigCols.tail: _*)
      .select(col("id"),
        array((0 until numHashes).map(i => col(s"h$i")): _*).as("sig"))
  }

  /** Band keys from a stored signature ARRAY column (the read-side twin
    * of [[bandKeys]], which builds them from h0..hN agg columns).
    * Package-private so IncrementalAdmissionSpec can plant adversarial
    * band collisions directly at the signature level. */
  private[graft] def bandKeysFromSig(sig: Column, bands: Int, rowsPerBand: Int): Column =
    array((0 until bands).map { b =>
      concat_ws("_", lit(b.toString) +:
        (0 until rowsPerBand)
          .map(r => element_at(sig, b * rowsPerBand + r + 1).cast("string")): _*)
    }: _*)

  /** Band-PAIR keys: one key per unordered pair of bands, each the two
    * single-band keys joined — two docs share a pair key iff they agree
    * on BOTH bands. The hot-band reroute's stricter candidate key. */
  private def bandPairKeys(sig: Column, bands: Int, rowsPerBand: Int): Column = {
    def bandKey(b: Int): Column =
      concat_ws("_", lit(b.toString) +:
        (0 until rowsPerBand)
          .map(r => element_at(sig, b * rowsPerBand + r + 1).cast("string")): _*)
    array((for { i <- 0 until bands; j <- (i + 1) until bands } yield
      concat_ws("|", bandKey(i), bandKey(j))): _*)
  }

  /** Incremental near-dup ADMISSION — the control loop of a
    * continuously-ingesting corpus. A 100 TB pipeline never re-dedups
    * the whole corpus when new data lands; it checks each incoming
    * batch against the standing [[signatureIndex]], then dedups the
    * survivors among themselves:
    *
    *  1. vs EXISTING: incoming and index rows meet on shared LSH band
    *     keys (equi-join, never all-pairs); a candidate is a duplicate
    *     when ≥ `minAgree` of `numHashes` signature components agree —
    *     the standard signature-estimated Jaccard (agreement fraction
    *     is an unbiased estimate of J), integer-exact and decidable
    *     from the index ALONE, no corpus text read. `dup_of` = the
    *     smallest matching existing id (first-wins, the reference's
    *     dedup-guard rule, main.py:78-81).
    *  2. within BATCH: survivors run [[nearDupMinhashLsh]] (exact
    *     Jaccard verify — batch text is in hand) and
    *     [[graft.operators.GraphAlgos.dedupClusters]] (converged
    *     components, min-id keeper); non-keepers are batch duplicates.
    *
    * Scale shape: the index side is the big one — banded it joins on a
    * compact key, and a band-bucketed index layout makes the probe
    * exchange-free; the incoming batch is small (broadcastable). The
    * within-batch stage touches only batch-sized data. Nothing is
    * quadratic anywhere; the corpus itself is never scanned.
    *
    * @param index output of [[signatureIndex]] over the existing corpus
    *              (same shingleWidth/numHashes — caller's contract)
    * @return one row per incoming doc: (id, status ∈ {dup_existing,
    *         dup_batch, admitted}, dup_of) — dup_of is the existing id
    *         it duplicates, the batch keeper it folds into, or itself
    *         when admitted */
  def admitIncremental(
      incoming: DataFrame, idCol: String, textCol: String,
      index: DataFrame,
      shingleWidth: Int = 3, numHashes: Int = 12, bands: Int = 4,
      minAgree: Int = 9, threshold: Double = 0.5,
      maxBand: Int = 1024): DataFrame = {
    require(numHashes % bands == 0, s"bands $bands must divide numHashes $numHashes")
    require(minAgree >= 1 && minAgree <= numHashes,
      s"minAgree must be in [1, $numHashes], got $minAgree")
    val rowsPerBand = numHashes / bands
    val inc = incoming.select(col(idCol).as("id"), col(textCol).as("text"))
      .transform(graft.CacheScope.pin) // read by: sigs, batch stage, final statuses
    val inSig = signatureIndex(inc, "id", "text", shingleWidth, numHashes)
      .transform(graft.CacheScope.pin) // banded probe + agreement count
    val idxBand = index.select(col("id").as("xid"), col("sig").as("xsig"),
      explode(bandKeysFromSig(col("sig"), bands, rowsPerBand)).as("bkey"))
    decideAdmission(inc, inSig, idxBand,
      shingleWidth, numHashes, bands, minAgree, threshold, maxBand)
  }

  /** Candidate (incoming, existing) pairs of the admission decision,
    * with the HOT-BAND CAP the [[ngramJaccardPairs]] `maxBlock`
    * discipline demands (r11 verdict #1): a boilerplate-heavy band key
    * shared by millions of indexed docs must never drive the candidate
    * join quadratic.
    *
    * Two routes, split by the index-side frequency of each band key
    * AMONG THE KEYS THE BATCH ACTUALLY PROBES (a semi-join against the
    * batch's keys first, so the frequency count touches O(matched
    * rows), never the whole index):
    *  - COLD (≤ `maxBand` index rows): the plain single-band equi-join —
    *    identical to the uncapped candidate set, which is why the
    *    DuckDB oracles (stated single-band) stay exact whenever no band
    *    is hot (asserted at every tested SF; the planted-hot spec pins
    *    the reroute itself).
    *  - HOT (> `maxBand`): members pair only via [[bandPairKeys]] —
    *    a candidate must agree on TWO full bands, which splits a
    *    boilerplate bucket by every other band's value. As the final
    *    backstop (an adversarial flood identical in ALL bands), each
    *    pair key keeps only its `maxBand` SMALLEST xids — the
    *    truncation is biased toward the exact rows the decision
    *    reports (`dup_of` = min matching xid). The recall trade (a
    *    pair agreeing on exactly one band inside a hot bucket is
    *    missed) is the documented price of boundedness; precision is
    *    untouched — every surviving candidate still passes the full
    *    signature-agreement test.
    *
    * Candidate-pair bound: ≤ |batchKeys|·maxBand·|incoming collisions|
    * per key on the cold route, ≤ maxBand per (incoming doc, pair key)
    * on the hot route — never O(bucket²). Package-private so the spec
    * can plant a 10⁴-doc hot band and count.
    *
    * @param inSig   (id, sig) — the incoming batch's signatures
    * @param idxBand (xid, xsig, bkey) — the standing index's banded view
    * @return deduped (id, xid, sig, xsig) candidate pairs */
  private[graft] def admissionCandidates(
      inSig: DataFrame, idxBand: DataFrame,
      bands: Int, rowsPerBand: Int, maxBand: Int): DataFrame = {
    require(maxBand >= 1, s"maxBand must be >= 1, got $maxBand")
    val inBand = inSig.select(col("id"), col("sig"),
      explode(bandKeysFromSig(col("sig"), bands, rowsPerBand)).as("bkey"))
    if (maxBand == Int.MaxValue) {
      // UNCAPPED (the calibration default): no band can be "hot", so the
      // frequency count — an EAGER driver collect — and the probe pin it
      // reads would be pure overhead, and outside a CacheScope the pin
      // would leak a cached RDD per call (r13 ADVICE #3). Return the
      // plain fully-lazy single-band join instead: zero jobs until the
      // caller's own action, zero persists.
      return inBand.join(idxBand, Seq("bkey"))
        .select(col("id"), col("xid"), col("sig"), col("xsig"))
        .dropDuplicates("id", "xid")
    }
    // the batch is the SMALL side by the admission contract: its key set
    // broadcasts, and the index side shrinks to matched rows before any
    // counting or joining
    val probe = idxBand
      .join(broadcast(inBand.select("bkey").distinct()), Seq("bkey"), "left_semi")
      .transform(graft.CacheScope.pin) // key-frequency count + both routes
    // hot keys are collected DRIVER-SIDE: each covers > maxBand probe
    // rows and distinct probed keys are ≤ |batch|·bands, so the list is
    // bounded by the SMALL side (the admitIncrementalStored bucket-
    // collect argument). Literal isin filters keep the hot/cold split
    // out of the join graph — a broadcast-join split here tripled q174's
    // wall-clock, because every extra broadcast job re-plans the full
    // (deeply nested, two-round) logical tree on the driver.
    val hotArr: Array[String] = probe
      .groupBy("bkey").agg(count(lit(1)).as("xbn"))
      .filter(col("xbn") > maxBand)
      .select("bkey").collect().map(_.getString(0))
    if (hotArr.isEmpty) {
      // no hot bands (the overwhelmingly common case): exactly the plain
      // single-band candidate join — zero extra plan nodes
      inBand.join(probe, Seq("bkey"))
        .select(col("id"), col("xid"), col("sig"), col("xsig"))
        .dropDuplicates("id", "xid")
    } else {
      // the reroute is a documented RECALL trade (single-band-only
      // matches inside a hot bucket are dropped) — make it observable:
      // a production corpus crossing maxBand must show up in logs, not
      // as a silent recall drop (r12 ADVICE)
      log.warn(s"admission hot-band cap engaged: ${hotArr.length} band " +
        s"key(s) exceed maxBand=$maxBand and reroute to band-PAIR " +
        s"matching (single-band-only matches within those buckets are " +
        s"dropped — the documented boundedness/recall trade). Sample " +
        s"keys: ${hotArr.take(3).mkString(", ")}")
      val isHot = col("bkey").isin(hotArr.toSeq: _*)
      val coldPairs = inBand.join(probe.filter(!isHot), Seq("bkey"))
        .select(col("id"), col("xid"), col("sig"), col("xsig"))
      val hotIn = inBand.filter(isHot)
        .select("id", "sig").dropDuplicates("id")
      val hotIdx = probe.filter(isHot)
        .select("xid", "xsig").dropDuplicates("xid")
      val wPair = org.apache.spark.sql.expressions.Window
        .partitionBy("ckey").orderBy("xid")
      val hotIdxCapped = hotIdx
        .select(col("xid"), col("xsig"),
          explode(bandPairKeys(col("xsig"), bands, rowsPerBand)).as("ckey"))
        .withColumn("_crn", row_number().over(wPair))
        .filter(col("_crn") <= maxBand).drop("_crn")
      val hotPairs = hotIn
        .select(col("id"), col("sig"),
          explode(bandPairKeys(col("sig"), bands, rowsPerBand)).as("ckey"))
        .join(hotIdxCapped, Seq("ckey"))
        .select(col("id"), col("xid"), col("sig"), col("xsig"))
      // dedup (id, xid) AFTER the union so a pair colliding in several
      // bands — or on both routes — is scored once
      coldPairs.unionByName(hotPairs).dropDuplicates("id", "xid")
    }
  }

  /** Shared decision core of [[admitIncremental]] /
    * [[admitIncrementalStored]]: `idxBand` is the (xid, xsig, bkey)
    * view of the existing corpus's signatures, however it was obtained
    * (in-memory explode, or a partition-pruned read of the stored
    * layout). */
  private def decideAdmission(
      inc: DataFrame, inSig: DataFrame, idxBand: DataFrame,
      shingleWidth: Int, numHashes: Int, bands: Int,
      minAgree: Int, threshold: Double, maxBand: Int): DataFrame = {
    val rowsPerBand = numHashes / bands
    // agreement over the full signatures of candidate pairs (hot-band
    // capped, see admissionCandidates)
    val dupExisting =
      admissionCandidates(inSig, idxBand, bands, rowsPerBand, maxBand)
      .withColumn("agree",
        aggregate(zip_with(col("sig"), col("xsig"),
          (a, b) => when(a === b, 1).otherwise(0)), lit(0), (acc, x) => acc + x))
      .filter(col("agree") >= minAgree)
      .groupBy("id").agg(min(col("xid")).as("dup_of_existing"))
      .transform(graft.CacheScope.pin) // survivors anti-join + final statuses
    val survivors = inc.join(dupExisting, Seq("id"), "left_anti")
    val clusters = GraphAlgos.dedupClusters(
        nearDupMinhashLsh(survivors, "id", "text",
          shingleWidth, numHashes, bands, threshold))
      .select(col("id"), col("keeper"), col("is_keeper"))
    inc.select(col("id"))
      .join(dupExisting, Seq("id"), "left")
      .join(clusters, Seq("id"), "left")
      .select(col("id"),
        when(col("dup_of_existing").isNotNull, lit("dup_existing"))
          .when(col("is_keeper") === false, lit("dup_batch"))
          .otherwise(lit("admitted")).as("status"),
        coalesce(col("dup_of_existing"),
          when(col("is_keeper") === false, col("keeper")),
          col("id")).as("dup_of"))
  }

  /** Calibration of the [[admitIncremental]] decision rule — the
    * documented precision trade (signature agreement instead of exact
    * Jaccard, which is what makes the decision index-only) MEASURED:
    * for every band-colliding (incoming, existing) candidate pair,
    * compare the agreement count (the serving-time decision input)
    * with the exact shingle Jaccard (computable here because this is
    * an offline audit with both texts in hand). One row per agreement
    * level: how many pairs land there, how many are true dups at
    * `threshold`, and the exact-Jaccard envelope (min/max — order-free
    * aggregates, so the oracle hash-compares exactly; a mean would be
    * a float sum, association-dependent). Reading the output: rows
    * with agree ≥ minAgree and n_exact_dup < n_pairs are the false
    * drops the trade accepts; rows below minAgree with n_exact_dup > 0
    * are the misses — move minAgree along this table to tune.
    *
    * The candidate join is shared with the serving path
    * ([[admissionCandidates]]) but defaults to UNCAPPED
    * (`maxBand = Int.MaxValue`): an audit wants every band-colliding
    * pair measured, runs offline on a bounded (sampled) corpus, and a
    * hot-band reroute would bias the very table being calibrated. The
    * parameter exists because "offline" does not mean "small": a user
    * pointing the calibration at a boilerplate-heavy corpus hits
    * exactly the quadratic the serving path caps, so the same knob is
    * one argument away — set `maxBand` and the measured table covers
    * the capped candidate set the serving decision would actually see
    * (arguably the MORE faithful audit once the cap is in production).
    *
    * Laziness/caching: with the default (uncapped) `maxBand` the whole
    * audit is one lazy plan — no job, no persist, safe to build ad hoc.
    * A CAPPED calibration shares the serving path's hot-band probe,
    * which pins an intermediate and collects hot keys eagerly
    * ([[admissionCandidates]]); wrap capped calls in
    * `CacheScope.materializeAndRelease` (as the serving callers do) or
    * the pin outlives the call. */
  def admissionCalibration(
      incoming: DataFrame, existing: DataFrame,
      idCol: String, textCol: String,
      shingleWidth: Int = 3, numHashes: Int = 12, bands: Int = 4,
      threshold: Double = 0.5, maxBand: Int = Int.MaxValue): DataFrame = {
    require(numHashes % bands == 0, s"bands $bands must divide numHashes $numHashes")
    val rowsPerBand = numHashes / bands
    val inSh = incoming
      .select(col(idCol).as("id"), wordShingles(col(textCol), shingleWidth).as("sh"))
      .filter(size(col("sh")) > 0)
    val exSh = existing
      .select(col(idCol).as("xid"), wordShingles(col(textCol), shingleWidth).as("xsh"))
      .filter(size(col("xsh")) > 0)
    val inSig = signatureIndex(incoming, idCol, textCol, shingleWidth, numHashes)
    val exSig = signatureIndex(existing, idCol, textCol, shingleWidth, numHashes)
      .select(col("id").as("xid"), col("sig").as("xsig"))
    val idxBand = exSig.select(col("xid"), col("xsig"),
      explode(bandKeysFromSig(col("xsig"), bands, rowsPerBand)).as("bkey"))
    admissionCandidates(inSig, idxBand, bands, rowsPerBand, maxBand)
      .join(inSh, Seq("id")).join(exSh, Seq("xid"))
      .withColumn("agree",
        aggregate(zip_with(col("sig"), col("xsig"),
          (a, b) => when(a === b, 1).otherwise(0)), lit(0), (acc, x) => acc + x)
          .cast("long"))
      .withColumn("j",
        rnd(size(array_intersect(col("sh"), col("xsh"))).cast("double") /
          size(array_union(col("sh"), col("xsh"))).cast("double"), 6))
      .groupBy("agree")
      .agg(count(lit(1)).as("n_pairs"),
        sum(when(col("j") >= threshold, 1L).otherwise(0L)).as("n_exact_dup"),
        min(col("j")).as("jmin"), max(col("j")).as("jmax"))
      .orderBy("agree")
  }

  /** The [[selectMinAgree]] outcome: the chosen agreement threshold and
    * the precision/recall it achieves on the calibrated corpus. */
  final case class MinAgreeChoice(minAgree: Int, precision: Double, recall: Double)

  /** Turn a calibration table ([[admissionCalibration]]) into an
    * operating point (r11 verdict #7): the SMALLEST agreement level —
    * i.e. maximum recall — whose CUMULATIVE precision (true dups /
    * candidate pairs among everything at or above the level) still
    * meets `targetPrecision`. Reading it back into
    * [[admitIncremental]]'s `minAgree` closes the tuning loop: measure
    * once offline (q176), serve index-only with a threshold whose
    * precision cost is KNOWN, not guessed.
    *
    * Driver-side by design: the table has ≤ numHashes+1 rows (one per
    * agreement level), so the collect is k-bounded like the k-means
    * centroid step. Returns None when no level meets the target (or the
    * table is empty) — the caller's signal that the signature budget
    * (numHashes) is too small for the wanted precision. */
  def selectMinAgree(
      calibration: DataFrame, targetPrecision: Double): Option[MinAgreeChoice] = {
    require(targetPrecision > 0.0 && targetPrecision <= 1.0,
      s"targetPrecision must be in (0, 1], got $targetPrecision")
    val rows = calibration
      .select(col("agree").cast("long"), col("n_pairs").cast("long"),
        col("n_exact_dup").cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(-_._1)
    val totalDups = rows.map(_._3).sum
    var pairs = 0L
    var dups = 0L
    var best: Option[MinAgreeChoice] = None
    for ((a, n, d) <- rows) {
      pairs += n; dups += d
      if (pairs > 0 && dups.toDouble / pairs >= targetPrecision)
        best = Some(MinAgreeChoice(a.toInt, dups.toDouble / pairs,
          if (totalDups > 0) dups.toDouble / totalDups else 0.0))
    }
    best
  }

  /** Stable partition id of a band key in the stored index layout:
    * hash60 is non-negative (60-bit), so plain `%` is already a
    * positive bucket. Deterministic and engine-portable (md5-based),
    * so the oracle can state the identical pruning. */
  def bandBucket(bkey: Column, nBuckets: Int): Column =
    hash60(bkey) % nBuckets

  // ---- signature-store parameter manifest ---------------------------------
  // The at-rest signature layouts are only readable at the parameters the
  // files were written with — shingleWidth/numHashes/bands determine the
  // band keys, nBuckets maps keys to partition DIRECTORIES — so a probe at
  // any other parameters computes different keys, prunes to the wrong
  // buckets, silently drops candidate pairs, and silently ADMITS
  // duplicates. That is byte-for-byte the silent-wrongness class the ann
  // store's _GEOMETRY manifest killed in r15 (Ann.readGeometry), applied
  // to dedup: the store therefore carries its own parameters in a
  // `_SIGPARAMS` root file — stamped at write, enforced on every stored
  // probe, preserved through retirement compaction (written into the swap
  // tmp dir BEFORE the publish rename), and adopted by the streaming
  // admission writers at (re)start, so a checkpoint-recovered pipeline
  // restarted under a changed config continues at the STORE's parameters
  // instead of silently mis-probing it.

  /** The manifest contents: everything a probe needs to band and bucket
    * an incoming batch the way the store was laid out. `nBuckets = 0`
    * marks a layout with no band-bucket partitioning (the streaming
    * `batch=` admission index — its layout key is the batch id, but its
    * SIGNATURES are still only comparable at matching
    * shingleWidth/numHashes/bands). */
  case class SigParams(
      shingleWidth: Int, numHashes: Int, bands: Int, nBuckets: Int)

  private val SigParamsFile = "_SIGPARAMS"

  /** Read the store's parameter manifest; None for a pre-manifest store
    * (callers fall back to their configured parameters). */
  def readSigParams(
      spark: org.apache.spark.sql.SparkSession,
      dir: String): Option[SigParams] =
    graft.sources.StoreManifest.readLine(spark, dir, SigParamsFile)
      .map { line =>
        val a = graft.sources.StoreManifest
          .intFields(dir, SigParamsFile, line, 4)
        SigParams(a(0), a(1), a(2), a(3))
      }

  /** Stamp `dir/_SIGPARAMS` — onto a store that lacks one, or into a
    * not-yet-published swap tmp dir (the Ann.writeGeometry shapes). */
  private[graft] def writeSigParams(
      spark: org.apache.spark.sql.SparkSession,
      dir: String, p: SigParams): Unit =
    graft.sources.StoreManifest.writeLine(spark, dir, SigParamsFile,
      s"${p.shingleWidth} ${p.numHashes} ${p.bands} ${p.nBuckets}")

  /** Fail loudly when an operation's parameters disagree with the
    * store's manifest; pre-manifest stores (None) pass through. */
  private[graft] def requireSigParams(
      spark: org.apache.spark.sql.SparkSession, dir: String,
      p: SigParams, op: String): Unit =
    readSigParams(spark, dir).foreach { m =>
      require(m == p,
        s"$op at parameters $p against a signature store whose " +
          s"$SigParamsFile says $m — use the manifest parameters " +
          s"(Dedup.readSigParams / the *Auto probe) or rebuild the " +
          s"store at the new parameters first: $dir")
    }

  /** Write the signature index PARTITIONED BY BAND-BUCKET — the at-rest
    * layout that makes admission probes SCAN-PRUNED (the Ann
    * `writeBucketedCorpus` move applied to dedup): one row per
    * (id, sig, bkey) with partition column `bucket` =
    * [[bandBucket]](bkey). An incoming batch touches at most
    * |batch|·bands distinct band keys, so its bucket set is a small
    * literal list and the probe never opens the other directories —
    * at 100 TB the admission join reads O(matched buckets), not
    * O(index). PlanAuditSpec asserts PartitionFilters is non-empty for
    * the stored probe and that pruning is decision-invariant. */
  def writeSignatureIndexStore(
      docs: DataFrame, idCol: String, textCol: String, dir: String,
      shingleWidth: Int = 3, numHashes: Int = 12, bands: Int = 4,
      nBuckets: Int = 64): Unit = {
    val rowsPerBand = numHashes / bands
    val rows = signatureIndex(docs, idCol, textCol, shingleWidth, numHashes)
      .select(col("id"), col("sig"),
        explode(bandKeysFromSig(col("sig"), bands, rowsPerBand)).as("bkey"))
      .withColumn("bucket", bandBucket(col("bkey"), nBuckets))
    // data + manifest publish in ONE rename (r16 ADVICE #1: an in-place
    // overwrite followed by a post-hoc stamp has a crash window that
    // leaves a store rebuilt at NEW parameters with no manifest, which
    // pre-manifest fallback then probes at the configured old ones)
    val spark = docs.sparkSession
    graft.sources.Sinks.publishDir(spark, dir, tmp => {
      rows.write.mode("overwrite").partitionBy("bucket").parquet(tmp)
      writeSigParams(spark, tmp,
        SigParams(shingleWidth, numHashes, bands, nBuckets))
    })
  }

  /** Append ONE batch of signatures into a [[writeSignatureIndexStore]]
    * layout — the continuous-growth form (the whole-store writer is the
    * one-shot backfill; a 100 TB admission index is never rebuilt per
    * batch). Same discipline as [[graft.operators.Ann
    * .appendMultiTableBatch]]: heal crash windows first, enforce the
    * `_SIGPARAMS` manifest (stamp it on first write), and cluster on the
    * partition column before the partitioned write so a batch adds ~one
    * file per touched bucket instead of one per task per bucket. A
    * replayed append duplicates (id, bkey) rows at rest; decisions are
    * unaffected (the candidate join dedups (id, xid)) and the rows fold
    * away at the next retirement rewrite of their bucket. */
  def appendSignatureIndexStore(
      docs: DataFrame, idCol: String, textCol: String, dir: String,
      shingleWidth: Int = 3, numHashes: Int = 12, bands: Int = 4,
      nBuckets: Int = 64): Unit = {
    val spark = docs.sparkSession
    graft.sources.Sinks.recoverSwap(spark, dir)
    graft.sources.Sinks.recoverPartitionDirSwaps(spark, dir)
    val p = SigParams(shingleWidth, numHashes, bands, nBuckets)
    val manifest = readSigParams(spark, dir)
    manifest.foreach { m =>
      require(m == p,
        s"append at parameters $p against a signature store whose " +
          s"_SIGPARAMS says $m — use the manifest parameters " +
          s"(Dedup.readSigParams) or rebuild the store first: $dir")
    }
    val rowsPerBand = numHashes / bands
    signatureIndex(docs, idCol, textCol, shingleWidth, numHashes)
      .select(col("id"), col("sig"),
        explode(bandKeysFromSig(col("sig"), bands, rowsPerBand)).as("bkey"))
      .withColumn("bucket", bandBucket(col("bkey"), nBuckets))
      .repartition(col("bucket"))
      .write.mode("append").partitionBy("bucket").parquet(dir)
    if (manifest.isEmpty) writeSigParams(spark, dir, p)
  }

  /** [[admitIncremental]] against a [[writeSignatureIndexStore]] layout:
    * the incoming batch's band keys are computed first, their distinct
    * [[bandBucket]] ids collected driver-side (≤ |batch|·bands values —
    * the batch is the SMALL side by the admission contract), and the
    * index read under an `isin` partition filter, so the scan itself
    * prunes to the matched buckets. Decision-identical to the in-memory
    * form by construction: a colliding (incoming, existing) pair shares
    * its band key, hence its bucket, hence survives the pruning. */
  /** @param excludeOwnIds when true, index rows whose id appears in the
    *        INCOMING batch are excluded from the decision — the replay
    *        guard for append-only bucketed layouts (foreachBatch is
    *        at-least-once: a redelivered batch whose own signatures
    *        already landed would otherwise fold every doc onto itself
    *        as dup_existing; the `batch=` layout solves this by
    *        excluding its own partition, which an append-only layout
    *        cannot do). The anti-join key set is the batch's ids — the
    *        SMALL side, broadcast. */
  def admitIncrementalStored(
      incoming: DataFrame, idCol: String, textCol: String,
      spark: org.apache.spark.sql.SparkSession, indexDir: String,
      shingleWidth: Int = 3, numHashes: Int = 12, bands: Int = 4,
      minAgree: Int = 9, threshold: Double = 0.5,
      nBuckets: Int = 64, maxBand: Int = 1024,
      excludeOwnIds: Boolean = false): DataFrame = {
    // self-protect like the ann probe: heal a crash-interrupted
    // retirement swap (whole-dir or per-bucket) BEFORE the manifest
    // read and the pruned scan — cheap existence probes on the happy
    // path — then fail loudly on a parameter mismatch (probing a layout
    // at other parameters prunes to the wrong buckets and silently
    // admits duplicates)
    graft.sources.Sinks.recoverSwap(spark, indexDir)
    graft.sources.Sinks.recoverPartitionDirSwaps(spark, indexDir)
    requireSigParams(spark, indexDir,
      SigParams(shingleWidth, numHashes, bands, nBuckets), "stored probe")
    val rowsPerBand = numHashes / bands
    val inc = incoming.select(col(idCol).as("id"), col(textCol).as("text"))
      .transform(graft.CacheScope.pin)
    val inSig = signatureIndex(inc, "id", "text", shingleWidth, numHashes)
      .transform(graft.CacheScope.pin)
    val buckets = inSig
      .select(explode(bandKeysFromSig(col("sig"), bands, rowsPerBand)).as("bkey"))
      .select(bandBucket(col("bkey"), nBuckets).as("bucket"))
      .distinct().collect().map(_.getLong(0))
    val idxRaw = spark.read.parquet(indexDir)
      .filter(col("bucket").isin(buckets.toSeq: _*))
      .select(col("id").as("xid"), col("sig").as("xsig"), col("bkey"))
    val idxBand =
      if (!excludeOwnIds) idxRaw
      else idxRaw.join(
        broadcast(inc.select(col("id").as("xid")).distinct()),
        Seq("xid"), "left_anti")
    decideAdmission(inc, inSig, idxBand,
      shingleWidth, numHashes, bands, minAgree, threshold, maxBand)
  }

  /** [[admitIncrementalStored]] taking its LAYOUT parameters from the
    * store's own `_SIGPARAMS` manifest instead of the caller — the shape
    * a restarted admission pipeline should use: the store says how it
    * was banded and bucketed; only the DECISION knobs (minAgree,
    * threshold, maxBand) remain configuration. Fails loudly on a
    * pre-manifest store — "auto" against a layout that does not declare
    * its parameters would be a guess, which is the bug class this
    * manifest exists to kill (rebuild via [[writeSignatureIndexStore]],
    * which stamps it). */
  def admitIncrementalStoredAuto(
      incoming: DataFrame, idCol: String, textCol: String,
      spark: org.apache.spark.sql.SparkSession, indexDir: String,
      minAgree: Int = 9, threshold: Double = 0.5,
      maxBand: Int = 1024, excludeOwnIds: Boolean = false): DataFrame = {
    // heal before the manifest read (the crash window would otherwise
    // read "no manifest" while the store sits in the aside slot)
    graft.sources.Sinks.recoverSwap(spark, indexDir)
    graft.sources.Sinks.recoverPartitionDirSwaps(spark, indexDir)
    val p = readSigParams(spark, indexDir).getOrElse(throw
      new IllegalArgumentException(
        s"admitIncrementalStoredAuto: no $SigParamsFile manifest in " +
          s"$indexDir — pre-manifest stores must be probed with explicit " +
          s"parameters (admitIncrementalStored) or rebuilt " +
          s"(writeSignatureIndexStore)"))
    admitIncrementalStored(incoming, idCol, textCol, spark, indexDir,
      p.shingleWidth, p.numHashes, p.bands, minAgree, threshold,
      p.nBuckets, maxBand, excludeOwnIds)
  }

  /** The tombstone frame's id column: a frame carrying an `id` column
    * keeps it (extra columns — e.g. the text the byText form consumes —
    * are ignored, so one tombstonesDir can serve both discovery forms);
    * a single-column frame of any name is taken as ids. */
  private def tombstoneIds(df: DataFrame): DataFrame =
    if (df.columns.contains("id")) df.select("id")
    else {
      require(df.columns.length == 1,
        s"retirement tombstones must carry an 'id' column (or be a " +
          s"single id column of any name); got ${df.columns.toSeq}")
      df.toDF("id")
    }

  /** Retire signatures from a signature-index store (r11 verdict #2):
    * the admission index otherwise only GROWS — docs dropped by later
    * curation (quality gates, substring removal, cluster folding) leave
    * orphan signatures that keep rejecting genuine re-submissions of
    * content the corpus no longer holds. This rewrites the store MINUS
    * the tombstone set, preserving whichever partition layout the store
    * carries (`bucket` for [[writeSignatureIndexStore]], `batch` for the
    * streaming admitBatch layout, flat otherwise), via the crash-safe
    * rename-aside swap ([[graft.sources.Sinks.swapInPlace]] — the
    * GraphBuild.compactEdges discipline).
    *
    * Decision contract (spec-pinned): admission decisions are identical
    * before/after a compaction whose tombstones touch no candidate, and
    * a doc whose signatures are retired is RE-ADMITTED when its content
    * re-arrives. Scale shape: one anti-join on id (tombstones are the
    * small side — broadcast when under the threshold) + a partitioned
    * rewrite; no step is quadratic and the probe layout (and hence
    * partition pruning) survives the rewrite.
    *
    * @param retiredIds the ids to retire: a frame with an `id` column
    *        (extra columns — e.g. the text the byText form consumes —
    *        are ignored) or a single id column of any name */
  def compactSignatureIndexStore(
      spark: org.apache.spark.sql.SparkSession, indexDir: String,
      retiredIds: DataFrame): Unit = {
    // heal BEFORE reading the manifest (the Ann.compactMultiTableCorpus
    // discipline): in the crash window the manifest sits with the data
    // in the aside slot, and carrying "no manifest" through this swap
    // would republish the store without it
    graft.sources.Sinks.recoverSwap(spark, indexDir)
    val params = readSigParams(spark, indexDir) // carried through the swap
    val retire = tombstoneIds(retiredIds).distinct()
    graft.sources.Sinks.swapInPlace(spark, indexDir, (df, tmp) => {
      val keep = df.join(retire, Seq("id"), "left_anti")
      val partCol = Seq("bucket", "batch").find(df.columns.contains)
      // an all-retired store still needs a READABLE empty dir: a
      // partitioned write of zero rows emits no part files (schema
      // inference on the next read would fail), so emit one empty
      // schema-bearing file INSIDE a sentinel partition dir — the
      // key=value layout survives, so later appends of new `batch=N` /
      // `bucket=N` slices don't mix flat files into a partitioned root
      partCol match {
        case None =>
          keep.write.mode("overwrite").parquet(tmp)
        case Some(c) if keep.isEmpty =>
          keep.drop(c).write.mode("overwrite").parquet(s"$tmp/$c=-1")
        case Some(c) =>
          keep.write.mode("overwrite").partitionBy(c).parquet(tmp)
      }
      params.foreach(writeSigParams(spark, tmp, _))
    })
  }

  /** INCREMENTAL signature retirement — the streaming-cadence form of
    * [[compactSignatureIndexStore]] (r15 verdict #3: the full form is a
    * whole-store rewrite per retirement fold, O(index) on the cadence —
    * the same maintenance class r15 killed on the ann/edge stores).
    * Signatures of a retired id live in exactly the partition
    * directories its band keys bucket to, and the store itself knows
    * that mapping: discovery is ONE column-pruned scan of (partition
    * column, id) — two thin columns, never the signature arrays that
    * dominate the store's bytes — semi-joined against the broadcast
    * tombstone set; the REWRITE (the expensive part: read + shuffle +
    * write of full rows) then touches only the matched directories via
    * [[graft.sources.Sinks.compactPartitionDirsExplicit]], one batched
    * job + metadata swaps, with `dropEmptied` so a fully-retired bucket
    * retires its directory too. Cold buckets are byte-untouched
    * (spec-pinned), the `_SIGPARAMS` manifest is a root file no
    * per-directory swap touches, and decisions after the fold are
    * identical to the full form's by construction — both remove exactly
    * the tombstoned ids' rows (oracle-gated by q197).
    *
    * Works on either partitioned layout (`bucket=` stored index,
    * `batch=` streaming admission index); a FLAT layout has no
    * directory grain to prune — use the full form.
    *
    * @return the rewritten partition directory names */
  def compactSignatureIndexStoreIncremental(
      spark: org.apache.spark.sql.SparkSession, indexDir: String,
      retiredIds: DataFrame): Seq[String] = {
    graft.sources.Sinks.recoverSwap(spark, indexDir)
    graft.sources.Sinks.recoverPartitionDirSwaps(spark, indexDir)
    val df = spark.read.parquet(indexDir)
    val partCol = Seq("bucket", "batch").find(df.columns.contains)
      .getOrElse(throw new IllegalArgumentException(
        s"compactSignatureIndexStoreIncremental: $indexDir has no " +
          s"partition grain (bucket/batch) — use " +
          s"compactSignatureIndexStore for flat layouts"))
    val retire = tombstoneIds(retiredIds).distinct()
      .transform(graft.CacheScope.pin) // discovery scan + anti-join fold
    val touched = df.select(col(partCol), col("id"))
      .join(broadcast(retire), Seq("id"), "left_semi")
      .select(partCol).distinct()
      .collect().map(r => s"$partCol=${r.get(0)}")
    if (touched.isEmpty) return Seq.empty
    val compacted = graft.sources.Sinks.compactPartitionDirsExplicit(
      spark, indexDir, partCol + "=", touched.toIndexedSeq,
      _.join(broadcast(retire), Seq("id"), "left_anti"),
      dropEmptied = true)
    ensureRetireSentinel(spark, indexDir, partCol,
      touched.toIndexedSeq, df.schema)
    compacted
  }

  /** O(tombstones) retirement — [[compactSignatureIndexStoreIncremental]]
    * with the DISCOVERY scan removed (r16 verdict #2: the scan form's
    * discovery reads every (partition, id) row in the store per cycle —
    * column-pruned but O(store), the growth term in retire_study's
    * 3.7→6.1 s series). A retired id's signatures live in exactly the
    * band-bucket directories its TEXT hashes to — bucket =
    * [[bandBucket]]([[bandKeysFromSig]]([[signatureIndex]](text))), a
    * pure function of the text and the store's `_SIGPARAMS` — so
    * text-bearing tombstones compute their candidate directories with
    * ZERO store reads. Each candidate is then VERIFIED with a
    * column-pruned (id) read of just those directories before any
    * rewrite, which keeps repeated folds of a CUMULATIVE tombstone set
    * (the [[graft.streaming.StreamingIngest.admissionWriterBucketed]]
    * cadence re-reads the same tombstonesDir every cycle) convergent:
    * once folded, a tombstone's candidate dirs hold none of its rows
    * and the cycle costs O(tombstone-matched dirs) reads, never a
    * rewrite — and never O(store) anything. The rewrite itself is the
    * same touched-dir-only [[graft.sources.Sinks
    * .compactPartitionDirsExplicit]] fold, decision-equivalent to the
    * whole-set subtraction (oracle-gated like q197; spec pins byText ≡
    * scan discovery).
    *
    * Contract: tombstone text must be the content the id was ADMITTED
    * with (curation holds the corpus row it is dropping) — different
    * text computes different buckets and silently misses the stored
    * rows; id-only callers use the scan form.
    *
    * @param tombstones (id, text) — id typed like the store's id column
    * @return the rewritten partition directory names */
  def compactSignatureIndexStoreIncrementalByText(
      spark: org.apache.spark.sql.SparkSession, indexDir: String,
      tombstones: DataFrame): Seq[String] = {
    graft.sources.Sinks.recoverSwap(spark, indexDir)
    graft.sources.Sinks.recoverPartitionDirSwaps(spark, indexDir)
    val p = readSigParams(spark, indexDir).getOrElse(throw
      new IllegalArgumentException(
        s"compactSignatureIndexStoreIncrementalByText: no $SigParamsFile " +
          s"manifest in $indexDir — text-derived discovery must compute " +
          s"buckets at the STORE's parameters; pre-manifest stores use " +
          s"the scan form (compactSignatureIndexStoreIncremental)"))
    require(p.nBuckets > 0,
      s"compactSignatureIndexStoreIncrementalByText: $indexDir is not a " +
        s"band-bucket layout ($SigParamsFile says $p) — text-derived " +
        s"discovery only maps onto bucket= directories; use the scan form")
    val retire = tombstones.select(col("id"), col("text")).distinct()
      .transform(graft.CacheScope.pin) // bucket derivation + verify + fold
    val rowsPerBand = p.numHashes / p.bands
    // candidate buckets: pure function of tombstone text + manifest —
    // O(|tombstones|·bands) values, zero store rows read
    val candBuckets = signatureIndex(retire, "id", "text",
        p.shingleWidth, p.numHashes)
      .select(explode(
        bandKeysFromSig(col("sig"), p.bands, rowsPerBand)).as("bkey"))
      .select(bandBucket(col("bkey"), p.nBuckets).as("bucket"))
      .distinct().collect().map(_.getLong(0))
    val root = new org.apache.hadoop.fs.Path(indexDir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // a dropEmptied prior fold may have retired a candidate's whole dir
    val present = candBuckets.filter(b =>
      fs.exists(new org.apache.hadoop.fs.Path(root, s"bucket=$b")))
    if (present.isEmpty) return Seq.empty
    // verify before rewriting: a column-pruned (id) read of ONLY the
    // candidate directories — already-folded tombstones match nothing
    // here, so cumulative tombstone sets converge to read-only cycles.
    // ONE reader frame serves both the touched-set probe and the
    // sentinel schema (r17 ADVICE #3: a second read of the candidate
    // dirs just for .schema doubled footer/driver IO per cycle)
    val ids = retire.select("id")
    val candidates = spark.read.option("basePath", indexDir)
      .parquet(present.map(b => s"$indexDir/bucket=$b").toIndexedSeq: _*)
    val touched = candidates
      .select(col("bucket"), col("id"))
      .join(broadcast(ids), Seq("id"), "left_semi")
      .select("bucket").distinct()
      .collect().map(r => s"bucket=${r.get(0)}")
    if (touched.isEmpty) return Seq.empty
    val schema = candidates.schema
    val compacted = graft.sources.Sinks.compactPartitionDirsExplicit(
      spark, indexDir, "bucket=", touched.toIndexedSeq,
      _.join(broadcast(ids), Seq("id"), "left_anti"),
      dropEmptied = true)
    ensureRetireSentinel(spark, indexDir, "bucket",
      touched.toIndexedSeq, schema)
    compacted
  }

  /** An all-retired store must stay READABLE (the full form's sentinel
    * discipline): if every partition directory retired, re-emit one
    * empty schema-bearing file inside a sentinel partition dir. The
    * root listing runs ONLY when no touched dir survived its rewrite —
    * if any did, the store certainly still has a readable partition —
    * so the common cycle costs O(touched) existence probes, never
    * O(store dirs). */
  private def ensureRetireSentinel(
      spark: org.apache.spark.sql.SparkSession, indexDir: String,
      partCol: String, touched: Seq[String],
      schema: org.apache.spark.sql.types.StructType): Unit = {
    val root = new org.apache.hadoop.fs.Path(indexDir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val anyTouchedLeft = touched.exists(n =>
      fs.exists(new org.apache.hadoop.fs.Path(root, n)))
    val anyLeft = anyTouchedLeft || fs.listStatus(root).exists(s =>
      s.isDirectory && s.getPath.getName.startsWith(partCol + "="))
    if (!anyLeft)
      // from a FRESH empty frame, not store.limit(0): that scan would
      // list the source files at execution time, just removed
      spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
          org.apache.spark.sql.types.StructType(
            schema.filterNot(_.name == partCol)))
        .write.mode("overwrite").parquet(s"$indexDir/$partCol=-1")
    spark.catalog.refreshByPath(indexDir)
  }

  /** RE-BUCKET the signature-index store to a new directory count (r16
    * verdict #1 — the [[graft.operators.Ann.regeometryMultiTableCorpus]]
    * move on the dedup side): fixed nBuckets means per-decision
    * rows-read grows linearly with the store (bucket occupancy ≈
    * indexRows / nBuckets; admission_study recorded 1,488→11,550 rows
    * per decision over 8× growth at nBuckets=1024 — a constant fraction,
    * not a constant). The stored `bkey` column already determines the
    * new layout — bucket = [[bandBucket]](bkey, newBuckets) — so
    * re-bucketing is ONE repartition of existing rows: no signature
    * recomputation, no source text, one deliberate O(store) background
    * pass behind the crash-safe whole-dir swap. The NEW `_SIGPARAMS`
    * manifest is written into the tmp dir BEFORE the publish rename, so
    * layout and parameters publish atomically — a probe can never pair
    * new directories with the old bucket count — and (id, bkey) replay
    * duplicates from the append-only streaming layout fold away in
    * passing. Probes through [[admitIncrementalStoredAuto]] and writers
    * that adopt the manifest continue seamlessly at the new count;
    * decisions are unchanged by construction (the same (id, sig, bkey)
    * rows, re-laid-out — oracle-gated by q198). [[graft.streaming
    * .StreamingIngest.admissionWriterBucketed]]'s `targetRowsPerBucket`
    * pulls this lever automatically at the occupancy threshold. */
  def rebucketSignatureIndexStore(
      spark: org.apache.spark.sql.SparkSession, indexDir: String,
      newBuckets: Int): Unit = {
    require(newBuckets >= 1, s"newBuckets must be >= 1, got $newBuckets")
    // heal BOTH swap grains before reading the manifest (the
    // compactMultiTableCorpus discipline): in a crash window the
    // manifest sits with the data in the aside slot
    graft.sources.Sinks.recoverSwap(spark, indexDir)
    graft.sources.Sinks.recoverPartitionDirSwaps(spark, indexDir)
    val p = readSigParams(spark, indexDir).getOrElse(throw
      new IllegalArgumentException(
        s"rebucketSignatureIndexStore: no $SigParamsFile manifest in " +
          s"$indexDir — a pre-manifest store's layout is undeclared; " +
          s"rebuild via writeSignatureIndexStore instead"))
    require(p.nBuckets > 0,
      s"rebucketSignatureIndexStore: $indexDir is not a band-bucket " +
        s"layout ($SigParamsFile says $p)")
    graft.sources.Sinks.swapInPlace(spark, indexDir, (df, tmp) => {
      val keep = df.select(col("id"), col("sig"), col("bkey"))
        .dropDuplicates("id", "bkey") // sig is a pure function of the id's text
        .withColumn("bucket", bandBucket(col("bkey"), newBuckets))
      // an all-retired (sentinel-only) store re-buckets to a readable
      // sentinel again — a partitioned write of zero rows emits nothing
      if (keep.isEmpty)
        keep.drop("bucket").write.mode("overwrite").parquet(s"$tmp/bucket=-1")
      else
        keep.repartition(col("bucket"))
          .write.mode("overwrite").partitionBy("bucket").parquet(tmp)
      writeSigParams(spark, tmp, p.copy(nBuckets = newBuckets))
    })
  }
}
