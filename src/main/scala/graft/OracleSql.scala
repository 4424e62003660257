package graft

import graft.functions.PortableMath.sqlRnd
import graft.operators.Embed

/** DuckDB-SQL fragment builders mirroring the Spark operators' exact
  * arithmetic (fold order, Double casts, portable rounding). Shared by
  * SparkEntry.oracleSql. Every builder mirrors one Spark-side function —
  * keep them in lockstep when either side changes.
  */
object OracleSql {

  /** Float-array literal that parses to EXACTLY the intended floats.
    * Bare numeric list literals unify to a common DECIMAL type in
    * DuckDB (`typeof([-0.12938572, …]) = DECIMAL(10,9)[]`) and the
    * DECIMAL→FLOAT conversion is NOT correctly rounded — measured 8 of
    * 64 elements off by 1–2 float ulps per centroid vector, enough to
    * flip a 1e-6-rounded score on a half boundary (q128 caught it; the
    * bucket-grain consumers q18/q47/… never noticed because a 1-ulp
    * centroid shift almost never flips an argmax). VARCHAR elements
    * cast via strtof, which IS correctly rounded, so the shortest-
    * roundtrip `Float.toString` text recovers the exact float. */
  def floatArrayLit(xs: Array[Float]): String =
    xs.map(x => s"'$x'").mkString("CAST([", ", ", "] AS FLOAT[])")

  /** Mirror of VectorFunctions.dotProduct: element-wise Double products,
    * strict left fold from 0.0. */
  def dot(a: String, b: String): String =
    s"list_reduce(list_prepend(CAST(0.0 AS DOUBLE), " +
      s"list_transform(list_zip($a, $b), p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE))), " +
      s"(acc, v) -> acc + v)"

  /** Mirror of Knn.search (§2.3): CTE chain from `<p>docs`(id, mtype,
    * embedding) and `<p>q`(qid, qtype, qvec) to `<p>knn`(qid, qtype, id,
    * mtype, sim, rnk). All intermediate CTE names carry the prefix so two
    * chains can coexist in one statement. */
  def knnChain(p: String, k: Int, overFetch: Int = 6): String = {
    val quota = k / 2
    s"""${p}scored AS MATERIALIZED (
       |  SELECT q.qid, q.qtype, d.id, d.mtype,
       |    CASE WHEN d.id = q.qid THEN 1.0
       |         ELSE ${dot("q.qvec", "d.embedding")} END AS sim,
       |    CASE WHEN q.qtype IS NULL OR d.mtype = q.qtype THEN 'same' ELSE 'cross' END AS bucket
       |  FROM ${p}q q CROSS JOIN ${p}docs d),
       |${p}overfetched AS MATERIALIZED (
       |  SELECT * FROM (
       |    SELECT *, row_number() OVER (PARTITION BY qid
       |                                 ORDER BY sim DESC, id, mtype) AS ofr
       |    FROM ${p}scored) WHERE ofr <= ${k * overFetch}),
       |${p}kept AS (
       |  SELECT * FROM (
       |    SELECT *, row_number() OVER (PARTITION BY qid, bucket
       |                                 ORDER BY sim DESC, id, mtype) AS brank
       |    FROM ${p}overfetched) WHERE brank <= $quota),
       |${p}knn AS MATERIALIZED (
       |  SELECT qid, qtype, id, mtype, sim,
       |    row_number() OVER (PARTITION BY qid ORDER BY sim DESC, id, mtype) AS rnk
       |  FROM ${p}kept)""".stripMargin
  }

  /** Mirror of GraphBuild.edgeDelta over a knn relation: F6 boost +
    * canonical undirected form. */
  def edgeDelta(knnRel: String, simExpr: String, seq: Int, extraWhere: String): String =
    s"""SELECT least(qid, id) AS src, greatest(qid, id) AS dst,
       |    CASE WHEN mtype <> qtype THEN greatest($simExpr, 0.8)
       |         ELSE $simExpr END AS score,
       |    CAST($seq AS BIGINT) AS seq
       |  FROM $knnRel WHERE id <> qid$extraWhere""".stripMargin

  /** Mirror of GraphBuild.upsertEdges' dedup applied to one delta. */
  def edgeDedup(p: String, deltaSql: String): String =
    s"""${p}ed AS MATERIALIZED (
       |  SELECT * FROM (
       |    SELECT *, row_number() OVER (PARTITION BY src, dst ORDER BY seq DESC) AS _rn
       |    FROM ($deltaSql))
       |  WHERE _rn = 1)""".stripMargin

  /** Mirror of GraphBuild.symmetric. */
  def symmetric(p: String): String =
    s"""${p}sym AS MATERIALIZED (
       |  SELECT src AS u, dst AS v, score FROM ${p}ed
       |  UNION ALL SELECT dst, src, score FROM ${p}ed)""".stripMargin

  /** Mirror of GraphExpand.expandFaithful over `<sp>knn` seeds (filtered
    * by seedWhere) and `<ep>sym` edges, ending in `<sp>fin`. */
  def expandFaithful(sp: String, ep: String, seedWhere: String): String =
    s"""${sp}head AS (
       |  SELECT qid AS h_qid, id AS h_id, sim AS h_sim FROM ${sp}knn WHERE rnk = 1$seedWhere),
       |${sp}nb AS (
       |  SELECT h_qid AS qid, v AS id, h_sim * score * 0.9 AS score, 1 AS prio
       |  FROM ${sp}head JOIN ${ep}sym ON h_id = u),
       |${sp}sd AS (SELECT qid, id, sim AS score, 0 AS prio FROM ${sp}knn WHERE 1=1$seedWhere),
       |${sp}ud AS (
       |  SELECT * FROM (
       |    SELECT *, row_number() OVER (PARTITION BY qid, id
       |                                 ORDER BY prio, score DESC) AS _rn
       |    FROM (SELECT * FROM ${sp}sd UNION ALL SELECT * FROM ${sp}nb))
       |  WHERE _rn = 1),
       |${sp}fin AS (
       |  SELECT qid, id, score,
       |    CASE WHEN prio = 0 THEN 'seed' ELSE 'expanded' END AS origin,
       |    row_number() OVER (PARTITION BY qid ORDER BY score DESC, id) AS rnk
       |  FROM ${sp}ud)""".stripMargin

  /** Mirror of GraphExpand.expandFaithfulDepth: unrolled
    * pop-one-per-step over `<sp>knn` seeds (filtered by seedWhere) and
    * `<ep>sym` edges, ending in `<sp>fin`. Step i's parent is the seed
    * with rnk = i; discoveries are first-writer-wins against the
    * accumulator of all earlier steps (NOT EXISTS), exactly the
    * reference's dict guard.
    *
    * Every per-hop CTE is MATERIALIZED (as are the shared knn/edge
    * helpers): each accumulator `a_i` is referenced twice (by `n_{i+1}`'s
    * NOT EXISTS and by `a_{i+1}`), so without materialization DuckDB
    * re-inlines the whole upstream chain 2^depth times — the r11 sf1
    * audit's 78 GB blow-up. Materialization is semantics-free; it closed
    * the q42/q59 sf1 oracle gap. */
  def expandFaithfulDepth(sp: String, ep: String, seedWhere: String, depth: Int): String = {
    val sd =
      s"""${sp}sd AS MATERIALIZED (
         |  SELECT qid, id, sim AS score, rnk, 0 AS prio
         |  FROM ${sp}knn WHERE 1=1$seedWhere),
         |${sp}a0 AS (SELECT qid, id, score, prio FROM ${sp}sd)""".stripMargin
    val steps = (1 to depth).map { i =>
      s"""${sp}n$i AS MATERIALIZED (
         |  SELECT f.qid, e.v AS id, f.score * e.score * 0.9 AS score, $i AS prio
         |  FROM (SELECT qid, id, score FROM ${sp}sd WHERE rnk = $i) f
         |  JOIN ${ep}sym e ON f.id = e.u
         |  WHERE NOT EXISTS (
         |    SELECT 1 FROM ${sp}a${i - 1} a WHERE a.qid = f.qid AND a.id = e.v)),
         |${sp}a$i AS MATERIALIZED (
         |  SELECT * FROM ${sp}a${i - 1} UNION ALL SELECT * FROM ${sp}n$i)""".stripMargin
    }
    val fin =
      s"""${sp}fin AS (
         |  SELECT qid, id, score,
         |    CASE WHEN prio = 0 THEN 'seed' ELSE 'expanded' END AS origin,
         |    row_number() OVER (PARTITION BY qid ORDER BY score DESC, id) AS rnk
         |  FROM ${sp}a$depth)""".stripMargin
    (Seq(sd) ++ steps :+ fin).mkString(",\n")
  }

  /** Mirror of GraphAlgos.connectedComponents as CONVERGED semantics:
    * from `<p>sym`(u, v) to `<p>cc`(id, component), component = min
    * reachable id, via a recursive reachability closure. The engine
    * side runs to convergence and FAILS LOUD otherwise (pointer-doubled
    * min-label propagation), so the oracle states the fixed point
    * directly — no superstep-count coupling between the two sides
    * (the pre-round-11 ccUnrolled mirror pinned a shared iteration
    * budget, which was agreement-on-fragments, not agreement-on-truth).
    *
    * REQUIRES the enclosing statement to open with `WITH RECURSIVE`
    * (DuckDB hoists the keyword for the whole chain; non-recursive CTEs
    * in the same chain are unaffected). Closure size is
    * Σ component_size² rows — fine at oracle scale where near-dup
    * clusters and sim-graph islands are tens of nodes. */
  def ccConverged(p: String): String =
    s"""${p}reach AS (
       |  SELECT DISTINCT u AS id, u AS r FROM ${p}sym
       |  UNION
       |  SELECT e.v AS id, t.r
       |  FROM ${p}reach t JOIN ${p}sym e ON e.u = t.id),
       |${p}cc AS (SELECT id, min(r) AS component FROM ${p}reach GROUP BY id)""".stripMargin

  /** Mirror of KMeansTrain.lloydGrid as UNROLLED Lloyd iterations: from
    * `<p>ue`(id, ue LIST(BIGINT) — 1e-6-grid quantized vectors) to
    * `<p>c<iters>`(cid, uc LIST(BIGINT)). Every decision is exact Int64
    * grid arithmetic (assignment argmin of ‖c‖²−2·u·c, ties to smaller
    * cid; member mean re-snapped via one IEEE double division), so the
    * unroll is bit-identical to the engine's loop — the q81 fixed-point
    * device applied to clustering. Init = deterministic farthest-point:
    * seed 1 is the (hash60('km:'||id), id)-smallest vector, seed m the
    * vector maximizing its min exact-Int64 squared grid distance to the
    * seeds so far (ties to smaller id) — unrolled as k−1 pick CTEs.
    * Empty clusters keep the previous centroid (the LEFT JOIN
    * coalesce).
    *
    * `saltPrefix` mirrors the engine's restart salt (best-of-R model
    * selection trains one chain per salt); `byDot` mirrors
    * assignByDot = true (argmin −u·c, the serve-time bucket rule,
    * instead of argmin ‖c‖²−2·u·c). */
  def kmeansUnrolled(p: String, k: Int, dim: Int, iters: Int,
      saltPrefix: String = "km:", byDot: Boolean = false): String = {
    val sqd =
      s"list_sum(list_transform(range(1, ${dim + 1}), " +
        "j -> (u.ue[j] - c.ue[j]) * (u.ue[j] - c.ue[j])))"
    val dotSum =
      s"list_sum(list_transform(range(1, ${dim + 1}), j -> u.ue[j] * c.uc[j]))"
    val score =
      if (byDot) s"-($dotSum)"
      else s"list_sum(list_transform(c.uc, x -> x * x)) - 2 * ($dotSum)"
    val seed1 =
      s"""${p}ch1 AS MATERIALIZED (
         |  SELECT 1 AS cid, id, ue FROM (
         |    SELECT id, ue,
         |      ${hash60(s"concat('$saltPrefix', CAST(id AS VARCHAR))")} AS h
         |    FROM ${p}ue)
         |  ORDER BY h, id LIMIT 1)""".stripMargin
    val picks = (2 to k).map { m =>
      // the pick is its own CTE: a trailing ORDER BY/LIMIT inside a
      // UNION ALL arm would bind to the whole union
      s"""${p}pk$m AS MATERIALIZED (
         |  SELECT $m AS cid, id, ue FROM (
         |    SELECT u.id, u.ue, min($sqd) AS mind
         |    FROM ${p}ue u CROSS JOIN ${p}ch${m - 1} c
         |    GROUP BY u.id, u.ue)
         |  ORDER BY mind DESC, id LIMIT 1),
         |${p}ch$m AS MATERIALIZED (
         |  SELECT * FROM ${p}ch${m - 1}
         |  UNION ALL
         |  SELECT cid, id, ue FROM ${p}pk$m)""".stripMargin
    }
    val init =
      s"""${p}c0 AS MATERIALIZED (
         |  SELECT cid, ue AS uc FROM ${p}ch$k)""".stripMargin
    val steps = (1 to iters).map { t =>
      s"""${p}a$t AS MATERIALIZED (
         |  SELECT id, ue, cid FROM (
         |    SELECT id, ue, cid,
         |      row_number() OVER (PARTITION BY id ORDER BY score, cid) AS rn
         |    FROM (
         |      SELECT u.id, u.ue, c.cid, $score AS score
         |      FROM ${p}ue u CROSS JOIN ${p}c${t - 1} c))
         |  WHERE rn = 1),
         |${p}n$t AS (
         |  SELECT cid, list(u ORDER BY j) AS uc FROM (
         |    SELECT cid, j,
         |      CAST(floor(CAST(sum(ue[j]) AS DOUBLE)
         |        / CAST(count(*) AS DOUBLE)) AS BIGINT) AS u
         |    FROM ${p}a$t CROSS JOIN
         |      (SELECT unnest(range(1, ${dim + 1})) AS j) r
         |    GROUP BY cid, j)
         |  GROUP BY cid),
         |${p}c$t AS MATERIALIZED (
         |  SELECT p.cid, coalesce(n.uc, p.uc) AS uc
         |  FROM ${p}c${t - 1} p LEFT JOIN ${p}n$t n USING (cid))""".stripMargin
    }
    ((seed1 +: picks) ++ (init +: steps)).mkString(",\n")
  }

  /** Mirror of Embed.embedText as CTE steps: `<p>emb`(…cols…, embedding)
    * from a source relation carrying `textExpr`. */
  def embedCte(p: String, srcRel: String, cols: String, textExpr: String, dim: Int): String =
    s"""${p}emb AS (
       |  SELECT $cols, ${Embed.sqlNormalize("vr", "nrm")} AS embedding
       |  FROM (SELECT *, ${Embed.sqlL2Norm("vr")} AS nrm
       |        FROM (SELECT $cols, ${Embed.sqlEmbedRaw(textExpr, dim)} AS vr
       |              FROM $srcRel) _r) _n)""".stripMargin

  /** Portable rounding, re-exported for assembly convenience. */
  def rnd6(inner: String): String = sqlRnd(inner, 6)

  /** Exact 1e-4-unit lineitem revenue — mirror of Relational.volMicro:
    * prices carry 2 dp and discounts 2 dp, so price·(1−discount) is an
    * exact Int64 in ten-thousandths and the sum is association-free
    * (a double revenue sum can land within an ulp of a .005 cent
    * boundary, where 2 dp rounding stops being engine-portable — the
    * r10 q160 finding). */
  val sqlVolU: String =
    "CAST(round(l_extendedprice * 100.0) AS BIGINT) * " +
      "(100 - CAST(round(l_discount * 100.0) AS BIGINT))"

  /** Derived-partsupp CTE — mirror of Partsupp.derivedPartsupp: keys are
    * the DISTINCT lineitem (partkey, suppkey) pairs (referential by
    * construction), attributes hash-assigned on integer grids
    * (availqty ∈ [1,9999]; supply cost in CENTS ∈ [100,100000] so every
    * downstream sum is association-free Int64 arithmetic). */
  val partsuppCte: String =
    s"""partsupp AS (
       |  SELECT ps_partkey, ps_suppkey,
       |    1 + ${hash60("'aq:' || CAST(ps_partkey AS VARCHAR) || ':' || CAST(ps_suppkey AS VARCHAR)")} % 9999 AS ps_availqty,
       |    100 + ${hash60("'sc:' || CAST(ps_partkey AS VARCHAR) || ':' || CAST(ps_suppkey AS VARCHAR)")} % 99901 AS ps_supplycost_c
       |  FROM (SELECT DISTINCT l_partkey AS ps_partkey,
       |          l_suppkey AS ps_suppkey FROM lineitem))""".stripMargin

  /** Derived-shipping-columns CTE `lis` — mirror of
    * Relational.lineitemShipping: shipmode hash-picked from the TPC-H
    * mode list, commit = ship ± 30 days, receipt = ship + 1..30 days,
    * exact integer micros (epoch_us on the NTZ timestamps = Spark's
    * unix_micros under the UTC session, the q04 precedent). */
  val lineitemShippingCte: String = {
    val key = "CAST(l_orderkey AS VARCHAR) || ':' || CAST(l_linenumber AS VARCHAR)"
    val d = 86400000000L
    s"""lis AS (
       |  SELECT *, epoch_us(l_shipdate) AS ship_us,
       |    ['MAIL','SHIP','AIR','TRUCK','RAIL','FOB','REG AIR']
       |      [CAST(${hash60(s"'sm:' || $key")} % 7 AS INT) + 1] AS l_shipmode,
       |    epoch_us(l_shipdate)
       |      + (${hash60(s"'cd:' || $key")} % 60 - 30) * $d AS commit_us,
       |    epoch_us(l_shipdate)
       |      + (1 + ${hash60(s"'rd:' || $key")} % 30) * $d AS receipt_us
       |  FROM lineitem)""".stripMargin
  }

  // ---- sketch fragments (mirror Dedup.* and TextFunctions.*) ------------

  /** Mirror of HashFunctions.hash60. */
  def hash60(expr: String): String =
    s"CAST(concat('0x', substr(md5($expr), 1, 15)) AS BIGINT)"

  /** Mirror of Dedup.cdcChunks' rolling hash at position `i` of string
    * expr `s`: Σ_{j<w} ord(s[i−j])·bʲ mod p — pure Int64 math, exact in
    * both engines (max sum ≈ 8·1.1e6·1e6 < 2⁶³). The b-powers are
    * precomputed mod p exactly like the Scala side's Array.iterate. */
  def cdcHash(s: String, i: String, window: Int, base: Long, p: Long): String = {
    val pow = Array.iterate(1L, window)(x => x * base % p)
    val terms = (0 until window).map { j =>
      val pos = if (j == 0) i else s"$i - $j"
      s"CAST(ord(substr($s, $pos, 1)) AS BIGINT) * ${pow(j)}"
    }
    s"(${terms.mkString(" + ")}) % $p"
  }

  /** Mirror of Dedup.cdcChunks from a relation with (id, s, len): CTE
    * steps `<pfx>cut` (boundary positions) and `<pfx>ck` (exploded
    * chunk occurrences, empties dropped). */
  def cdcChunksCtes(pfx: String, srcRel: String, window: Int, divisor: Int,
      base: Long = 31L, p: Long = 1000003L): String =
    s"""${pfx}cut AS (
       |  SELECT id, s, len,
       |    CASE WHEN len < $window THEN []
       |         ELSE list_filter(range($window, len + 1),
       |                i -> (${cdcHash("s", "i", window, base, p)}) % $divisor = 0) END AS cuts
       |  FROM $srcRel),
       |${pfx}ck AS (
       |  SELECT id, chunk FROM (
       |    SELECT id, unnest(list_transform(
       |      list_zip(list_prepend(1, list_transform(cuts, c -> c + 1)),
       |               list_append(cuts, len)),
       |      pr -> substr(s, pr[1], pr[2] - pr[1] + 1))) AS chunk
       |    FROM ${pfx}cut)
       |  WHERE length(chunk) > 0)""".stripMargin

  /** Mirror of TextFunctions.tokens over an arbitrary text expression. */
  def toksOf(texpr: String): String =
    s"list_filter(string_split_regex(lower($texpr), '[^a-z0-9]+'), x -> len(x) > 0)"

  /** Mirror of Bpe.learnMerges as a k-step CTE chain over `documents`:
    * `v0` is the collapsed (word, freq, sym) vocabulary; each step i
    * produces `p{i}` (adjacent-pair counts via list_zip with the
    * off-by-one tail pair NULL-filtered), `b{i}` (the 1-row argmax with
    * the (freq DESC, lhs, rhs) tie-break) and `v{i}` (the vocabulary
    * after the greedy left-to-right merge — list_reduce over a
    * chr(31)-joined accumulator string; the "last symbol == lhs" test
    * is the sep-boundary LIKE, safe because symbols are [a-z0-9]+).
    * Appending x (not lhs||rhs) on a merge is exact because the
    * accumulator already ends with the complete symbol lhs. Returns the
    * chain WITHOUT a leading WITH so callers can append their own CTEs. */
  def bpeChain(k: Int, docsRel: String = "documents"): String = {
    val v0 =
      s"""v0 AS MATERIALIZED (
         |  SELECT word, CAST(count(*) AS BIGINT) AS freq,
         |    string_split(word, '') AS sym
         |  FROM (SELECT unnest(${toksOf("text")}) AS word FROM $docsRel)
         |  GROUP BY word)""".stripMargin
    val steps = (1 to k).map { i =>
      s"""p$i AS (
         |  SELECT p[1] AS lhs, p[2] AS rhs, CAST(sum(freq) AS BIGINT) AS freq
         |  FROM (SELECT freq, unnest(list_zip(sym, sym[2:])) AS p FROM v${i - 1})
         |  WHERE p[2] IS NOT NULL GROUP BY 1, 2),
         |b$i AS (SELECT lhs, rhs, freq FROM p$i
         |        ORDER BY freq DESC, lhs, rhs LIMIT 1),
         |v$i AS MATERIALIZED (
         |  SELECT v.word, v.freq,
         |    CASE WHEN b.lhs IS NULL THEN v.sym ELSE
         |    string_split(list_reduce(v.sym, (acc, x) ->
         |      CASE WHEN (acc = b.lhs OR acc LIKE '%' || chr(31) || b.lhs)
         |                AND x = b.rhs
         |           THEN acc || x ELSE acc || chr(31) || x END), chr(31))
         |    END AS sym
         |  FROM v${i - 1} v LEFT JOIN b$i b ON TRUE)""".stripMargin
    }
    (v0 +: steps).mkString(",\n")
  }

  /** Mirror of Bpe.applyMerges: replay the learned merges b1..bk (from
    * a [[bpeChain]] in the same WITH clause) over an arbitrary word
    * relation `wordsRel` (one column `word`, distinct) — the held-out
    * side of a fertility evaluation. Produces w0..w{k}; w{k} is the
    * (word, sym) segmentation under the learned tokenizer. */
  def bpeApplyChain(k: Int, wordsRel: String): String = {
    val w0 =
      s"""w0 AS (
         |  SELECT word, string_split(word, '') AS sym FROM $wordsRel)""".stripMargin
    val steps = (1 to k).map { i =>
      s"""w$i AS (
         |  SELECT w.word,
         |    CASE WHEN b.lhs IS NULL THEN w.sym ELSE
         |    string_split(list_reduce(w.sym, (acc, x) ->
         |      CASE WHEN (acc = b.lhs OR acc LIKE '%' || chr(31) || b.lhs)
         |                AND x = b.rhs
         |           THEN acc || x ELSE acc || chr(31) || x END), chr(31))
         |    END AS sym
         |  FROM w${i - 1} w LEFT JOIN b$i b ON TRUE)""".stripMargin
    }
    (w0 +: steps).mkString(",\n")
  }

  /** Mirror of TextFunctions.wordShingles given a token-list expression
    * (w is unrolled, as in the Spark side). */
  def wordShingles(toks: String, w: Int): String = {
    val joined = (0 until w).map(j => s"$toks[i + ${j + 1}]")
      .mkString("concat(", ", ' ', ", ")")
    s"CASE WHEN len($toks) < $w THEN [] " +
      s"ELSE list_distinct(list_transform(range(0, len($toks) - ${w - 1}), i -> $joined)) END"
  }

  /** Mirror of TextFunctions.charShingles (lowercased input expr). */
  def charShingles(texpr: String, n: Int): String = {
    val s = s"lower($texpr)"
    s"CASE WHEN length($s) < $n THEN [] " +
      s"ELSE list_distinct(list_transform(range(1, length($s) - ${n - 2}), i -> substr($s, i, $n))) END"
  }

  /** Mirror of the MinHash affine family base: one md5 per shingle. */
  def minhashBases(sh: String): String = {
    val p = graft.functions.HashFunctions.MinhashP
    s"list_transform($sh, s -> ${hash60("s")} % $p)"
  }

  /** Mirror of Dedup's signature over a precomputed base-hash list
    * column: i-th element = min of the i-th affine mix. */
  def minhashSigFromBases(hb: String, numHashes: Int): String = {
    import graft.functions.HashFunctions.{minhashA, minhashB, MinhashP}
    (0 until numHashes).map { i =>
      s"list_min(list_transform($hb, b -> (${minhashA(i)} * b + ${minhashB(i)}) % $MinhashP))"
    }.mkString("[", ", ", "]")
  }

  /** Mirror of Dedup.bandKeys over a signature column name. */
  def bandKeys(sig: String, bands: Int, rowsPerBand: Int): String = {
    val keys = (0 until bands).map { b =>
      val slice = (0 until rowsPerBand)
        .map(r => s"CAST($sig[${b * rowsPerBand + r + 1}] AS VARCHAR)")
      (s"'$b'" +: slice).mkString("concat_ws('_', ", ", ", ")")
    }
    keys.mkString("[", ", ", "]")
  }

  /** Mirror of Dedup.simhash over a token-hash-list column name
    * (bits unrolled exactly like the Spark side). */
  def simhashOf(hs: String, bits: Int): String =
    (0 until bits).map { j =>
      s"(CASE WHEN list_sum(list_transform($hs, h -> " +
        s"CASE WHEN ((h >> $j) & 1) = 1 THEN 1 ELSE -1 END)) > 0 " +
        s"THEN CAST(${1L << j} AS BIGINT) ELSE CAST(0 AS BIGINT) END)"
    }.mkString(" + ")

  /** Jaccard of two distinct-element list columns (sizes as Doubles,
    * portable-rounded by the caller). */
  def jaccard(a: String, b: String): String =
    s"CAST(len(list_intersect($a, $b)) AS DOUBLE) / " +
      s"CAST(len(list_distinct(list_concat($a, $b))) AS DOUBLE)"
}
