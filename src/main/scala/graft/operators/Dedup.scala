package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines, from exact to
  * near-duplicate:
  *
  *  - exact: hash-groupBy on the content column;
  *  - MinHash + LSH banding: shingle → k minhashes → band hashes → bucket
  *    join → candidate pairs → exact Jaccard verify;
  *  - SimHash: 64-bit signature, chunk-bucketed hamming candidates;
  *  - n-gram Jaccard: exact verify used on its own for small candidate sets;
  *  - embedding cosine: random-hyperplane LSH buckets → in-bucket cosine.
  *
  * Scale design: every stage is a DataFrame transform whose only wide
  * operations are groupBy/join on bucket keys — the classic "explode by
  * band, shuffle by (band, hash)" MinHash-LSH layout that web-scale dedup
  * pipelines use. Nothing collects to the driver; candidate generation is
  * O(sum of bucket sizes²) not O(n²). All hashing is `xxhash64` inside
  * codegen — no UDFs.
  */
object Dedup {

  // ------------------------------------------------------------------ exact

  /** Exact dedup: group identical `contentCol` values, keep the minimum id
    * as canonical representative.
    */
  def exact(df: DataFrame, contentCol: String, idCol: String): DataFrame =
    df.groupBy(col(contentCol))
      .agg(
        min(col(idCol)).as("canonical_id"),
        count(lit(1)).as("dup_count"))

  /** Exact dedup after text normalization (lowercase, strip
    * non-alphanumerics, collapse whitespace): catches the trivially-edited
    * duplicates — case changes, punctuation noise, reflowed whitespace —
    * that byte-exact dedup misses, without any of MinHash's probabilistic
    * machinery. Same one-shuffle groupBy shape as [[exact]]; the normalized
    * text itself is the group key (at 100 TB swap in its xxhash64 to shrink
    * the shuffle key — [[TextAnalysis.fingerprint]] is that composition).
    */
  def exactNormalized(df: DataFrame, contentCol: String, idCol: String): DataFrame =
    df.groupBy(TextAnalysis.normalize(col(contentCol)).as("norm_text"))
      .agg(
        min(col(idCol)).as("canonical_id"),
        count(lit(1)).as("dup_count"))

  /** Deterministic drop-duplicates on key columns: keep the first row per
    * key group under `orderBy` (the reference's drop-duplicates TODO,
    * src/main.rs:32 — Spark's own `dropDuplicates` keeps an arbitrary row,
    * which would be irreproducible).
    */
  def keepFirst(df: DataFrame, keys: Seq[String], orderBy: Seq[Column]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(keys.map(col): _*).orderBy(orderBy: _*)
    df.withColumn("__graft_rn", row_number().over(w))
      .filter(col("__graft_rn") === 1)
      .drop("__graft_rn")
  }

  /** Dedup OBSERVABILITY: the duplicate-cluster size histogram
    * (members → how many clusters have that many) — the first report a
    * pipeline operator reads after a dedup pass (a fat tail here means a
    * boilerplate template or a crawler loop, not organic duplication).
    * Two map-side-combining aggregations over the component table, which
    * is ∝ the duplicate set — never corpus-scale.
    */
  def componentSizeHistogram(pairs: DataFrame,
      aCol: String = "doc_a", bCol: String = "doc_b"): DataFrame =
    connectedComponents(pairs, aCol, bCol)
      .groupBy("component").agg(count(lit(1)).as("members"))
      .groupBy("members").agg(count(lit(1)).as("n_clusters"))

  /** The COMPOSED dedup pipeline a training-data run actually executes:
    * stage 1 drops byte-exact duplicates (min-id survivor per identical
    * text — one shuffle by content); stage 2 finds near-duplicates among
    * the stage-1 survivors (exact n-gram Jaccard pairs), groups them
    * transitively ([[connectedComponents]] inside [[keepBest]]), and keeps
    * the highest-`scoreCol` member per group. Stage ORDER matters: exact
    * dedup first shrinks the quadratic-ish near-dup candidate space by the
    * duplicate fraction for free. The composition is IDEMPOTENT — after
    * [[keepBest]] each component holds one survivor, and two survivors of
    * distinct components can share no qualifying pair (a pair would have
    * merged their components) — pinned in PipelineDedupSpec. Output =
    * surviving corpus rows.
    */
  def pipelineDedup(corpus: DataFrame, textCol: String, idCol: String,
      scores: DataFrame, scoreCol: String,
      shingleSize: Int = 3, threshold: Double = 0.5): DataFrame = {
    val exactKept = keepFirst(corpus, Seq(textCol), Seq(col(idCol)))
    val pairs = ngramJaccardPairs(exactKept, textCol, idCol, shingleSize, threshold)
    keepBest(exactKept, pairs, scores, idCol, scoreCol)
  }

  // ------------------------------------------------- duplicate-span removal

  /** Exact substring-level dedup: remove every LATER occurrence of any word
    * n-gram span that appears more than once in the corpus, keeping the
    * first occurrence in (doc, position) order — the span-level counterpart
    * of whole-document dedup (the "exact substring deduplication" stage of
    * LLM training-data pipelines: boilerplate sentences, license headers,
    * templated paragraphs repeated across millions of pages survive
    * document-level dedup because the surrounding text differs).
    *
    * Returns one row per input document:
    * `(doc, tokens_total, tokens_removed, clean_text)` where `clean_text`
    * is the whitespace-normalized text with every covered token dropped and
    * the survivors rejoined in original order.
    *
    * Semantics: a position is covered when ANY duplicate n-gram occurrence
    * overlaps it, so a duplicated run of m >= n consecutive tokens is
    * removed wholesale (its m-n+1 overlapping n-grams each recur). The
    * first occurrence of each gram — ordered by (doc, pos) — is never a
    * remover, so exactly one copy of every duplicated span survives.
    * Intra-document repeats count: the second occurrence inside the same
    * document is stripped like any other.
    *
    * Scale shape: no windows, no all-pairs. First-occurrence detection is
    * ONE aggregation on the gram (`min(struct(doc, pos))` + count — a
    * partial-aggregated map-side combine, not a per-gram sort), duplicate
    * marking is one equi-join back on the gram, and only DOCUMENTS THAT
    * LOSE TOKENS pay the token-level regroup — the untouched majority of a
    * clean corpus streams through a single anti-join without re-shuffling
    * its tokens. Pathologically frequent grams (a page of one repeated
    * word) fan out in the gram join; AQE's skew-join split handles the
    * residual imbalance, and at 100 TB the gram string itself would be
    * replaced by its xxhash64 to shrink the shuffle payload (kept as the
    * raw string here so a SQL oracle reproduces the result bit-for-bit).
    */
  def stripDuplicateSpans(
      df: DataFrame, textCol: String, idCol: String, n: Int): DataFrame = {
    require(n >= 2, s"duplicate-span length must be >= 2 words, got $n")
    val ws = split(trim(regexp_replace(col(textCol), "\\s+", " ")), " ")
    val docs = df.select(col(idCol).as("doc"), ws.as("ws"))

    // Positional n-grams; documents shorter than n words cannot contain a
    // duplicated span and skip the gram pass entirely. `grams` feeds both
    // the firsts aggregation and the covered join and is DELIBERATELY not
    // materialized: the explode is a narrow re-derivation of `docs` (its
    // parent is typically a checkpointed batch or a columnar scan), and
    // re-running it twice is cheaper at corpus scale than writing an
    // exploded-corpus-sized intermediate to storage.
    val grams = docs
      .filter(size(col("ws")) >= n)
      .select(col("doc"), posexplode(
        transform(sequence(lit(1), size(col("ws")) - lit(n - 1)),
          i => concat_ws(" ", (0 until n).map(j => element_at(col("ws"), i + j)): _*)))
        .as(Seq("p0", "gram")))
      .select(col("doc"), (col("p0") + 1).as("pos"), col("gram"))

    // First occurrence per recurring gram: one aggregation, lexicographic
    // struct min — no per-gram window sort.
    val firsts = grams.groupBy("gram")
      .agg(min(struct(col("doc"), col("pos"))).as("first"),
        count(lit(1)).as("occ"))
      .filter(col("occ") > 1)

    val covered = grams.join(firsts, "gram")
      .filter(struct(col("doc"), col("pos")) =!= col("first"))
      .select(col("doc"),
        explode(sequence(col("pos"), col("pos") + lit(n - 1))).as("p"))
      .distinct()

    val removedPerDoc = covered.groupBy("doc")
      .agg(count(lit(1)).as("tokens_removed"))

    // Only touched documents re-shuffle their tokens to rebuild the text.
    val touched = docs.join(removedPerDoc, "doc")
    val kept = touched
      .select(col("doc"), posexplode(col("ws")).as(Seq("p0", "word")))
      .select(col("doc"), (col("p0") + 1).as("p"), col("word"))
      .join(covered, Seq("doc", "p"), "left_anti")
    val rebuilt = kept.groupBy("doc")
      .agg(array_join(
        transform(array_sort(collect_list(struct(col("p"), col("word")))),
          s => s.getField("word")), " ").as("clean_text"))

    val touchedOut = touched
      .select(col("doc"), size(col("ws")).cast("long").as("tokens_total"),
        col("tokens_removed"))
      .join(rebuilt, Seq("doc"), "left")
      .select(col("doc"), col("tokens_total"), col("tokens_removed"),
        coalesce(col("clean_text"), lit("")).as("clean_text"))
    val untouchedOut = docs.join(removedPerDoc, Seq("doc"), "left_anti")
      .select(col("doc"), size(col("ws")).cast("long").as("tokens_total"),
        lit(0L).as("tokens_removed"),
        array_join(col("ws"), " ").as("clean_text"))
    touchedOut.unionByName(untouchedOut)
  }

  // --------------------------------------------------------------- shingles

  /** Word n-gram shingles of the text (distinct). Documents shorter than n
    * words yield their whole text as the single shingle.
    *
    * Built from `element_at` + `concat_ws` (null-skipping) rather than
    * `slice` + `array_join` — higher-order array functions run interpreted,
    * so each avoided per-element allocation counts.
    */
  def shingles(text: Column, n: Int): Column = {
    val words = split(trim(regexp_replace(text, "\\s+", " ")), " ")
    val grams = transform(
      sequence(lit(0), greatest(size(words) - n, lit(0))),
      i => concat_ws(" ", (0 until n).map(j => element_at(words, i + j + 1)): _*))
    array_distinct(grams)
  }

  /** Distinct (doc, shingle) pairs — the relational form of [[shingles]]
    * that the signature and verify paths build on.
    *
    * Overlapping n-word windows are extracted in ONE codegen'd pass with a
    * lookahead regex anchored at word starts (`(?<!\S)(?=(\S+ ... \S+))`) —
    * no window function, so no per-doc sort, and no higher-order array
    * lambdas (HOFs run interpreted and contend across many executor threads;
    * an earlier window+lead formulation was correct but paid a partition
    * sort). The explicit repartition by doc means the distinct AND the
    * downstream per-doc signature aggregation both reuse one exchange
    * (hash(doc) co-locates every (doc, s) group).
    *
    * Documents shorter than n words contribute their whole text as the
    * single fallback shingle; whitespace runs are treated as one separator.
    */
  def shingleRows(df: DataFrame, textCol: String, idCol: String, n: Int): DataFrame = {
    // Canonicalize whitespace FIRST (tabs/newlines/runs → one space): the
    // single-space lookahead pattern below would otherwise form no n-gram
    // across a tab or newline, silently dropping those windows.
    val norm = trim(regexp_replace(col(textCol), "\\s+", " "))
    val pat = "(?<!\\S)(?=(" + Seq.fill(n)("\\S+").mkString(" ") + "))"
    val grams = regexp_extract_all(norm, lit(pat), lit(1))
    df.filter(col(textCol).isNotNull)
      .select(col(idCol).as("doc"),
        explode(when(size(grams) > 0, grams)
          .otherwise(array(norm))).as("s"))
      .repartition(col("doc"))
      .distinct()
  }

  // ---------------------------------------------------------------- minhash

  /** k-permutation MinHash signature over the shingle set. The shingle
    * string is hashed ONCE to a 64-bit base hash; permutation i re-hashes
    * the base salted with i (standard one-hash-function trick — permuting
    * the 8-byte hash instead of re-hashing the string k times cuts the
    * dominant cost of signature building k-fold).
    *
    * Shaped as ONE `aggregate` fold over the shingle array — the shingle
    * expression is evaluated once per row. (The naive
    * `transform(0..k, i -> array_min(transform(shingles, ...)))` nesting
    * re-evaluates the whole shingle build k times per row once Catalyst
    * collapses projects — a 30× slowdown measured at sf0.1.)
    */
  def minhashSignature(shingleCol: Column, k: Int): Column =
    aggregate(
      shingleCol,
      array_repeat(lit(Long.MaxValue), k),
      (acc, s) => zip_with(
        acc,
        transform(sequence(lit(0), lit(k - 1)), i => xxhash64(xxhash64(s), i)),
        (a, h) => least(a, h)))

  /** MinHash signatures as a DataFrame op: explode shingles, hash each
    * shingle once per permutation, take k codegen'd `min` aggregates, and
    * reassemble the signature array. The groupBy benefits from map-side
    * partial mins, so the shuffle carries one k-long row per doc — the
    * scalable shape for billion-document corpora. Docs with empty text have
    * no shingles and drop out (they cannot be near-duplicates).
    */
  def minhashSignatures(
      df: DataFrame, textCol: String, idCol: String,
      k: Int, shingleSize: Int): DataFrame = {
    val exploded = shingleRows(df, textCol, idCol, shingleSize)
      .select(col("doc"), xxhash64(col("s")).as("h"))
    val mins = (0 until k).map(i => min(xxhash64(col("h"), lit(i))).as(s"m$i"))
    exploded.groupBy("doc")
      .agg(mins.head, mins.tail: _*)
      .select(col("doc"), array((0 until k).map(i => col(s"m$i")): _*).as("sig"))
  }

  /** LSH banding: split the signature into `bands` bands of `rowsPerBand`
    * and hash each band. Docs sharing ANY band hash become candidates.
    */
  def bandHashes(sigCol: Column, bands: Int, rowsPerBand: Int): Column =
    transform(
      sequence(lit(0), lit(bands - 1)),
      b => struct(
        b.as("band"),
        xxhash64(
          array_join(transform(
            slice(sigCol, b * rowsPerBand + 1, lit(rowsPerBand)),
            x => x.cast("string")), ","),
          b).as("bh")))

  /** (doc, band, bandhash) rows computed straight from the per-permutation
    * min columns — no higher-order functions anywhere in the plan. HOF
    * lambdas run interpreted when codegen falls back, with classloader lock
    * contention across executor threads (observed intermittent 5× stalls);
    * this path is plain function calls + one generator. Band-hash values
    * are identical to [[bandHashes]] over the assembled signature.
    */
  def minhashBands(
      df: DataFrame, textCol: String, idCol: String,
      numHashes: Int, bands: Int, shingleSize: Int): DataFrame =
    bandsFromShingles(shingleRows(df, textCol, idCol, shingleSize), numHashes, bands)

  /** [[minhashBands]] over a precomputed (doc, s) shingle table — lets the
    * end-to-end dedup pipeline shingle ONCE for both the banding and the
    * verify stages.
    */
  private def bandsFromShingles(
      exploded0: DataFrame, numHashes: Int, bands: Int): DataFrame = {
    require(numHashes % bands == 0, "numHashes must divide into bands")
    val r = numHashes / bands
    val exploded = exploded0.select(col("doc"), xxhash64(col("s")).as("h"))
    val mins = (0 until numHashes).map(i => min(xxhash64(col("h"), lit(i))).as(s"m$i"))
    val agg = exploded.groupBy("doc").agg(mins.head, mins.tail: _*)
    val bandStructs = (0 until bands).map { b =>
      val cols = (b * r until (b + 1) * r).map(i => col(s"m$i").cast("string"))
      struct(lit(b).as("band"), xxhash64(concat_ws(",", cols: _*), lit(b)).as("bh"))
    }
    agg.select(col("doc"), explode(array(bandStructs: _*)).as("b"))
      .select(col("doc"), col("b.band").as("band"), col("b.bh").as("bh"))
  }

  /** Candidate near-duplicate pairs (idA < idB) from MinHash-LSH plus their
    * signature-estimated Jaccard. `df` must contain `idCol` and `textCol`.
    *
    * Pipeline: shingle → sign → explode bands → self-join on (band, hash)
    * → distinct pairs → estimate Jaccard from signature agreement.
    */
  def minhashCandidates(
      df: DataFrame, textCol: String, idCol: String,
      numHashes: Int = 32, bands: Int = 8, shingleSize: Int = 3,
      withEstimate: Boolean = true): DataFrame = {
    require(numHashes % bands == 0, "numHashes must divide into bands")
    val r = numHashes / bands
    // The band self-join carries only (band, bh, doc); both sides are the
    // same subplan, so Spark's ReuseExchange computes signatures once.
    val banded = minhashBands(df, textCol, idCol, numHashes, bands, shingleSize)
    val cands = banded.as("x")
      .join(banded.as("y"), col("x.band") === col("y.band") && col("x.bh") === col("y.bh"))
      .filter(col("x.doc") < col("y.doc"))
      .select(col("x.doc").as("doc_a"), col("y.doc").as("doc_b"))
      .distinct()
    if (!withEstimate) cands
    else {
      val signed = minhashSignatures(df, textCol, idCol, numHashes, shingleSize)
      cands
        .join(signed.select(col("doc").as("doc_a"), col("sig").as("sig_a")), "doc_a")
        .join(signed.select(col("doc").as("doc_b"), col("sig").as("sig_b")), "doc_b")
        .withColumn("est_jaccard",
          size(filter(zip_with(col("sig_a"), col("sig_b"), (x, y) => x === y), b => b))
            .cast("double") / lit(numHashes.toDouble))
        .drop("sig_a", "sig_b")
    }
  }

  /** Exact n-gram Jaccard verification of candidate pairs, fully relational:
    * explode shingles, count |A∩B| with a join on (doc_b, shingle), combine
    * with per-doc set sizes for |A∪B| = |A|+|B|-|A∩B|. No array columns
    * cross a shuffle and every step is a codegen'd join/aggregate — the
    * array-intersect formulation runs interpreted and was 5-10× slower.
    * Jaccard is an integer ratio → deterministic double division.
    */
  def jaccardVerify(
      candidates: DataFrame, df: DataFrame, textCol: String, idCol: String,
      shingleSize: Int = 3): DataFrame =
    jaccardVerifyFromShingles(candidates, shingleRows(df, textCol, idCol, shingleSize))

  /** [[jaccardVerify]] over a precomputed (doc, s) shingle table. */
  def jaccardVerifyFromShingles(candidates: DataFrame, shingled: DataFrame): DataFrame = {
    // Join/shuffle on the 8-byte shingle hash, not the shingle string —
    // identical counts modulo a 2^-64 collision, at a fraction of the
    // shuffle volume.
    val expl = shingled
      .select(col("doc"), xxhash64(col("s")).as("s"))
      .cache()
    val sizes = expl.groupBy("doc").agg(count(lit(1)).as("sz"))
    val inter = candidates
      .join(expl.select(col("doc").as("doc_a"), col("s").as("s_a")), "doc_a")
      .join(expl.select(col("doc").as("doc_b"), col("s").as("s_a")), Seq("doc_b", "s_a"))
      .groupBy("doc_a", "doc_b").agg(count(lit(1)).as("inter"))
    candidates
      .join(inter, Seq("doc_a", "doc_b"), "left")
      .na.fill(0L, Seq("inter"))
      .join(sizes.select(col("doc").as("doc_a"), col("sz").as("sz_a")), "doc_a")
      .join(sizes.select(col("doc").as("doc_b"), col("sz").as("sz_b")), "doc_b")
      .withColumn("uni", col("sz_a") + col("sz_b") - col("inter"))
      .withColumn("jaccard",
        when(col("uni") > 0, col("inter").cast("double") / col("uni"))
          .otherwise(lit(1.0)))
      .drop("s_a", "sz_a", "sz_b", "inter", "uni")
  }

  /** ALL-pairs exact n-gram Jaccard above a threshold — no hashing anywhere,
    * so the result is exactly reproducible by a SQL oracle. Pairs are
    * generated by the shingle-equality self-join (pairs sharing no shingle
    * have Jaccard 0 and cannot pass a positive threshold); Jaccard is an
    * integer ratio → deterministic double.
    *
    * Scale note: the shingle self-join is O(Σ bucket²) over shingle groups —
    * fine for a verify/eval corpus, but the production near-dup path at
    * corpus scale is [[minhashDedup]], whose LSH banding bounds candidate
    * generation. This operator is the exact ground truth the LSH path is
    * measured against (OperatorsSpec recall tests do exactly that).
    */
  def ngramJaccardPairs(
      df: DataFrame, textCol: String, idCol: String,
      shingleSize: Int = 3, threshold: Double = 0.5): DataFrame = {
    // Self-join on the 8-byte shingle hash (see jaccardVerify); cached —
    // the plan reads it three times (two join sides + set sizes).
    val expl = shingleRows(df, textCol, idCol, shingleSize)
      .select(col("doc"), xxhash64(col("s")).as("s"))
      .cache()
    val sizes = expl.groupBy("doc").agg(count(lit(1)).as("sz"))
    val inter = expl.select(col("doc").as("doc_a"), col("s"))
      .join(expl.select(col("doc").as("doc_b"), col("s")), "s")
      .filter(col("doc_a") < col("doc_b"))
      .groupBy("doc_a", "doc_b").agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.select(col("doc").as("doc_a"), col("sz").as("sz_a")), "doc_a")
      .join(sizes.select(col("doc").as("doc_b"), col("sz").as("sz_b")), "doc_b")
      .withColumn("jaccard",
        col("inter").cast("double") / (col("sz_a") + col("sz_b") - col("inter")))
      .filter(col("jaccard") >= threshold)
      .select("doc_a", "doc_b", "jaccard")
  }

  /** The threshold a caller hands us as a `Double`, decomposed into the
    * EXACT rational it denotes (num/den, den a power of two, reduced): every
    * finite double IS a dyadic rational, so the decomposition is lossless.
    * The prefix/length bounds must never prune a pair the verify predicate
    * (`jaccard >= t` in doubles — the same comparison the exact all-pairs
    * twin and the SQL oracle run) would accept. Computing `ceil(t * sz)` in
    * floating point violates that: for t = 0.07, sz = 100,
    * fl(0.07 * 100) = 7.000…0001 and ceil of it is 8, so a pair at exactly
    * 7/100 = 0.07 passes the verify (7.0/100 >= 0.07 in doubles) yet is
    * pruned by the bound — a silent false negative in an operator sold on
    * "no false negatives". The bounds below therefore run in integer
    * arithmetic against [[boundRational]].
    */
  private[graft] def exactRational(t: Double): (Long, Long) = {
    require(t > 0.0 && t <= 1.0, s"bad threshold: $t")
    if (t == 1.0) (1L, 1L)
    else {
      val bits  = java.lang.Double.doubleToLongBits(t)
      val exp   = ((bits >> 52) & 0x7ffL).toInt // biased; t in (0,1) is normal
      var num   = (bits & 0xfffffffffffffL) | (1L << 52)
      var shift = 1075 - exp // t == num / 2^shift exactly
      val red   = math.min(java.lang.Long.numberOfTrailingZeros(num), shift)
      num >>= red; shift -= red
      require(shift <= 62, s"threshold too small for exact arithmetic: $t")
      (num, 1L << shift)
    }
  }

  /** The rational the pruning bounds use: the DOUBLE one ulp below the
    * threshold, decomposed exactly. Soundness: a pair the double verify
    * accepts has true ratio J with fl(J) >= t, so J > t − ulp(t)/2 >
    * nextDown(t); the prefix/length theorems instantiated at nextDown(t)
    * therefore keep every verify-accepted pair. Cost: the bounds are one
    * ulp looser than ideal — invisible in candidate volume. (NOT
    * (num−1)/den on the reduced rational: for an exactly-representable
    * t like 1/2 that subtracts 1/den = HALF the threshold, collapsing the
    * bound to 0 and the prefix filter to the full quadratic join — a 2–5×
    * blowup measured on the set-sim gates.) For t = 1.0 the exact value
    * is used (fl(1.0·sz) = sz was never wrong).
    */
  private def boundRational(t: Double): (Long, Long) =
    if (t == 1.0) (1L, 1L) else exactRational(Math.nextDown(t))

  /** `ceil((num/den) * sz) <= m`, exactly: for integer m, that is
    * `num*sz <= m*den` — multiplication only, no division to round. The
    * products run in Decimal(38,0) (num,den < 2^62 are 19 digits; set
    * sizes add ≤ 19 more — exact, and codegen'd like any arithmetic).
    */
  private def ceilLeq(num: Long, den: Long, sz: Column, m: Column): Column = {
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    sz.cast(dec) * lit(num).cast(dec) <= m.cast(dec) * lit(den).cast(dec)
  }

  /** EXACT set-similarity self-join via prefix filtering (AllPairs/PPJoin,
    * Bayardo et al. WWW'07; Xiao et al. WWW'08): every pair with shingle
    * Jaccard >= threshold, with NO false negatives — the exact complement
    * to [[minhashDedup]], whose LSH bands trade a small recall loss for
    * speed. Use this when the dedup decision must be provably complete
    * (eval-set decontamination, legal holds); use MinHash when 1–2% missed
    * pairs are acceptable. The verify predicate is the same double
    * comparison the all-pairs twin and the SQL oracle run; the pruning
    * bounds are evaluated in exact integer arithmetic at [[boundRational]]
    * (one ulp under the threshold), so the no-false-negative theorem holds
    * at the boundary too (J exactly == t — see the float-ceil trap there).
    *
    * Why this beats the naive token self-join at scale: joining docs on ANY
    * shared shingle costs Σ df(s)² over all shingles — stopword-like grams
    * shared by half the corpus make that quadratic. The prefix-filter
    * theorem says two sets x, y with J(x,y) >= t must share a token among
    * the FIRST |x| − ⌈t·|x|⌉ + 1 tokens of each, when both sets are sorted
    * by one global token order (proof: the intersection needs
    * ⌈t·max(|x|,|y|)⌉ tokens, and a pair sharing nothing in either prefix
    * can overlap only in suffixes too short to supply them). Ordering by
    * ASCENDING document frequency puts the rarest tokens in the prefix, so
    * Σ df² is paid only over rare tokens — candidate volume collapses from
    * quadratic to near-linear while completeness is a theorem, not a tuning
    * outcome. A length filter (|x| >= ⌈t·|y|⌉, implied by J >= t) prunes
    * size-mismatched candidates before the verify.
    *
    * Plan: the shingle table is built once and cached (prefix build +
    * verify + sizes reuse it); one aggregate computes global document
    * frequencies; one per-doc window ranks tokens (partitionBy(doc) — the
    * same hash(doc) exchange [[shingleRows]] already materialized); the
    * candidate join keys on the 8-byte shingle hash; the verify is two
    * candidate-bounded equi-joins counting the true overlap, then the exact
    * Jaccard filter. Everything shuffles on doc or shingle keys — no
    * cartesian, no nested loop, no driver state.
    */
  def setSimJoinPrefix(
      df: DataFrame, textCol: String, idCol: String,
      shingleSize: Int = 3, threshold: Double = 0.5): DataFrame = {
    val (num, den) = boundRational(threshold)
    val expl = shingleRows(df, textCol, idCol, shingleSize)
      .select(col("doc"), xxhash64(col("s")).as("s"))
      .cache()
    val sizes = expl.groupBy("doc").agg(count(lit(1)).as("sz"))
    // Global token order: ascending document frequency, ties broken by the
    // hash itself — any consistent TOTAL order is correct; rarest-first is
    // the one that minimizes candidate volume.
    val dfreq = expl.groupBy("s").agg(count(lit(1)).as("dfreq"))
    // Prefix bound rn <= sz - ceil(t*sz) + 1  ⇔  ceil(t*sz) <= sz - rn + 1,
    // evaluated exactly by ceilLeq (same (num, den) as the verify below).
    val prefix = expl.join(dfreq, "s")
      .join(sizes, "doc")
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("doc")).orderBy(col("dfreq"), col("s"))))
      .filter(ceilLeq(num, den, col("sz"), col("sz") - col("rn") + 1L))
      .select(col("doc"), col("s"), col("sz"))
    // Length filter sz_a >= ceil(t*sz_b)  ⇔  ceil(t*sz_b) <= sz_a, exact.
    val cand = prefix.select(col("doc").as("doc_a"), col("s"), col("sz").as("sz_a"))
      .join(prefix.select(col("doc").as("doc_b"), col("s"), col("sz").as("sz_b")), "s")
      .filter(col("doc_a") < col("doc_b"))
      .filter(ceilLeq(num, den, col("sz_b"), col("sz_a")) &&
        ceilLeq(num, den, col("sz_a"), col("sz_b")))
      .select("doc_a", "doc_b")
      .distinct()
    val inter = cand
      .join(expl.select(col("doc").as("doc_a"), col("s")), "doc_a")
      .join(expl.select(col("doc").as("doc_b"), col("s")), Seq("doc_b", "s"))
      .groupBy("doc_a", "doc_b").agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.select(col("doc").as("doc_a"), col("sz").as("sz_a")), "doc_a")
      .join(sizes.select(col("doc").as("doc_b"), col("sz").as("sz_b")), "doc_b")
      .withColumn("jaccard",
        col("inter").cast("double") / (col("sz_a") + col("sz_b") - col("inter")))
      .filter(col("jaccard") >= threshold)
      .select("doc_a", "doc_b", "jaccard")
  }

  /** CROSS-corpus prefix-filter set-similarity join — [[setSimJoinPrefix]]
    * generalized from a self-join to A × B, which is the shape eval-set
    * DECONTAMINATION actually needs: every (training doc, benchmark doc)
    * pair with shingle Jaccard >= threshold, no false negatives. A missed
    * pair here is a contaminated benchmark silently inflating eval
    * numbers, so the complete-by-theorem join is the right tool and the
    * LSH approximation is not.
    *
    * The prefix theorem needs ONE token order consistent across BOTH sets:
    * document frequencies are computed over the UNION of the two shingle
    * tables (a per-side order would let a pair's prefixes rank tokens
    * differently and miss). Everything else is the self-join machinery
    * with a side tag instead of the `a < b` tiebreak: per-doc rarest-first
    * prefixes, A-prefix ⋈ B-prefix on the shingle hash, two-way length
    * pruning, exact verify on the candidate pairs only. Ids may collide
    * across corpora — the side tag, not the id, separates them.
    */
  def setSimJoinPrefixAB(
      dfA: DataFrame, dfB: DataFrame, textCol: String, idCol: String,
      shingleSize: Int = 3, threshold: Double = 0.5): DataFrame = {
    val (num, den) = boundRational(threshold)
    val toks = shingleRows(dfA, textCol, idCol, shingleSize)
      .select(col("doc"), xxhash64(col("s")).as("s"), lit(0).as("side"))
      .unionByName(shingleRows(dfB, textCol, idCol, shingleSize)
        .select(col("doc"), xxhash64(col("s")).as("s"), lit(1).as("side")))
      .cache()
    val sizes = toks.groupBy("side", "doc").agg(count(lit(1)).as("sz"))
    val dfreq = toks.groupBy("s").agg(count(lit(1)).as("dfreq"))
    val prefix = toks.join(dfreq, "s")
      .join(sizes, Seq("side", "doc"))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("side"), col("doc")).orderBy(col("dfreq"), col("s"))))
      .filter(ceilLeq(num, den, col("sz"), col("sz") - col("rn") + 1L))
      .select(col("side"), col("doc"), col("s"), col("sz"))
    val cand = prefix.filter(col("side") === 0)
      .select(col("doc").as("doc_a"), col("s"), col("sz").as("sz_a"))
      .join(prefix.filter(col("side") === 1)
        .select(col("doc").as("doc_b"), col("s"), col("sz").as("sz_b")), "s")
      .filter(ceilLeq(num, den, col("sz_b"), col("sz_a")) &&
        ceilLeq(num, den, col("sz_a"), col("sz_b")))
      .select("doc_a", "doc_b")
      .distinct()
    val inter = cand
      .join(toks.filter(col("side") === 0)
        .select(col("doc").as("doc_a"), col("s")), "doc_a")
      .join(toks.filter(col("side") === 1)
        .select(col("doc").as("doc_b"), col("s")), Seq("doc_b", "s"))
      .groupBy("doc_a", "doc_b").agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.filter(col("side") === 0)
        .select(col("doc").as("doc_a"), col("sz").as("sz_a")), "doc_a")
      .join(sizes.filter(col("side") === 1)
        .select(col("doc").as("doc_b"), col("sz").as("sz_b")), "doc_b")
      .withColumn("jaccard",
        col("inter").cast("double") / (col("sz_a") + col("sz_b") - col("inter")))
      .filter(col("jaccard") >= threshold)
      .select("doc_a", "doc_b", "jaccard")
  }

  /** Connected components over a near-dup PAIR table: the step that turns
    * pairwise matches into duplicate GROUPS so a pipeline can keep one
    * canonical document per group (pairs alone can't — near-duplication is
    * transitive through chains A~B~C that no single pair shows). Returns
    * (doc_id, component) for every endpoint, component = the group's
    * minimum id (deterministic canonical choice, SQL-oracle reproducible
    * via a recursive CTE).
    *
    * Two execution paths, same semantics: a pair table under
    * `spark.graft.dedup.driverEdgeCap` (default 1M edges ≈ 16 MB — pair
    * tables scale with the DUPLICATE set, not the corpus) runs a driver
    * union-find in milliseconds; larger graphs fail open to distributed
    * iterative min-label propagation: each round every vertex takes the
    * minimum label among itself and its neighbors; labels are monotonically
    * non-increasing and bounded, so the label SUM is a convergence witness
    * (unchanged sum == fixed point — no join-based equality check). Rounds
    * needed = graph diameter, and near-dup graphs are shallow (dup clusters
    * are cliques or short chains). Each round is one shuffle join + one
    * aggregation; lineage is cut with a snapshot every few rounds so a
    * 50-round worst case cannot grow an unanalyzable plan. `maxIters`
    * bounds pathological chains; the fixed point reached by then is still
    * a sound OVER-segmentation (labels only ever merge downward).
    */
  def connectedComponents(
      pairs: DataFrame, aCol: String, bCol: String,
      maxIters: Int = 20): DataFrame = {
    val spark = pairs.sparkSession
    val e0 = pairs.select(col(aCol).cast("long").as("a"), col(bCol).cast("long").as("b"))
    // Small-graph fast path: near-dup pair tables are ∝ the DUPLICATE set,
    // not the corpus — usually far below the cap even when the corpus is
    // 100 TB. Under it, a driver union-find (union-by-min + path
    // compression) replaces a multi-job iterative fixpoint with
    // milliseconds of local work and IDENTICAL output (min id per
    // component). Over the cap (~16 MB of edges at the default), fail
    // open to the distributed propagation below.
    val cap = spark.conf.get("spark.graft.dedup.driverEdgeCap", (1 << 20).toString).toInt
    // Drain into two primitive long arrays as rows arrive: a collect() of
    // cap+1 GenericRows would retain ~10× the edges' nominal bytes in Row
    // object headers before the union-find even starts; the iterator frees
    // each Row after its two longs are copied out, so retained driver
    // memory is exactly 16 bytes/edge.
    val (ea, eb, nEdges) = {
      val it = e0.limit(cap + 1).toLocalIterator()
      val ab = new scala.collection.mutable.ArrayBuilder.ofLong
      val bb = new scala.collection.mutable.ArrayBuilder.ofLong
      var n = 0
      while (it.hasNext) { val r = it.next(); ab += r.getLong(0); bb += r.getLong(1); n += 1 }
      (ab.result(), bb.result(), n)
    }
    if (nEdges <= cap) {
      val parent = new java.util.HashMap[Long, Long]()
      def find(x: Long): Long = {
        var r = x
        while (parent.getOrDefault(r, r) != r) r = parent.getOrDefault(r, r)
        var c = x // path compression
        while (parent.getOrDefault(c, c) != c) { val n = parent.get(c); parent.put(c, r); c = n }
        r
      }
      var i = 0
      while (i < nEdges) {
        val (ra, rb) = (find(ea(i)), find(eb(i)))
        if (ra != rb) parent.put(math.max(ra, rb), math.min(ra, rb)) // union by MIN
        i += 1
      }
      val rows = new java.util.ArrayList[org.apache.spark.sql.Row]()
      val seen = new java.util.HashSet[Long]()
      i = 0
      while (i < nEdges) {
        val a = ea(i); val b = eb(i)
        if (seen.add(a)) rows.add(org.apache.spark.sql.Row(a, find(a)))
        if (seen.add(b)) rows.add(org.apache.spark.sql.Row(b, find(b)))
        i += 1
      }
      return spark.createDataFrame(rows, org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("doc_id",
          org.apache.spark.sql.types.LongType, nullable = false),
        org.apache.spark.sql.types.StructField("component",
          org.apache.spark.sql.types.LongType, nullable = false))))
    }
    val edges = e0.unionByName(e0.select(col("b").as("a"), col("a").as("b")))
      .distinct().cache()
    var comp = edges.select(col("a").as("v")).distinct()
      .withColumn("comp", col("v")).cache()
    var prevSum = comp.agg(sum("comp")).head().getLong(0)
    var i = 0
    var converged = false
    while (!converged && i < maxIters) {
      val viaNeighbor = edges
        .join(comp.select(col("v").as("b"), col("comp")), "b")
        .select(col("a").as("v"), col("comp"))
      val next0 = comp.unionByName(viaNeighbor)
        .groupBy("v").agg(min("comp").as("comp"))
      // Snapshot every 3 rounds: each round stacks a join on the lineage,
      // and Catalyst analysis of an unbounded chain would dominate long
      // convergences (same policy as LakePart auto-compaction).
      val next = (if (i % 3 == 2) next0.localCheckpoint(true) else next0).cache()
      val s = next.agg(sum("comp")).head().getLong(0)
      comp.unpersist()
      comp = next
      converged = s == prevSum
      prevSum = s
      i += 1
    }
    edges.unpersist()
    // Pin the result to its own snapshot and release the loop's cache —
    // repeated calls (a per-batch streaming dedup) must not accumulate
    // cached generations in executor storage.
    val result = comp
      .select(col("v").as("doc_id"), col("comp").as("component"))
      .localCheckpoint(true)
    comp.unpersist()
    result
  }

  /** The end of the dedup pipeline: keep ONE canonical document per
    * near-dup group and every untouched document. `pairs` is any pair
    * table ([[ngramJaccardPairs]], [[minhashDedup]], [[simhashDedup]],
    * [[embeddingNearDup]], or an incremental index's output); groups are
    * its transitive closure ([[connectedComponents]]); the keeper is the
    * group's minimum id. Docs in no pair pass through via the left
    * anti-ish join (components is ∝ matched docs — corpus-scale rows never
    * join against more than the duplicate set, which BROADCASTS when the
    * duplicate fraction is small, the common case).
    */
  def keepCanonical(
      corpus: DataFrame, pairs: DataFrame,
      idCol: String, aCol: String = "doc_a", bCol: String = "doc_b"): DataFrame = {
    val comp = connectedComponents(pairs, aCol, bCol)
      .filter(col("doc_id") =!= col("component"))
      .select(col("doc_id").as(idCol))
    corpus.join(comp, Seq(idCol), "left_anti")
  }

  /** Quality-aware survivor selection: keep, per duplicate component, the
    * member with the HIGHEST score (ties break by lowest id) — the
    * curation policy a real pipeline wants (keep the best-quality copy of
    * each near-dup cluster), where [[keepCanonical]] keeps the min-id
    * member regardless of quality. `scores` is an (idCol, scoreCol) frame
    * (a quality-classifier output, a length heuristic, any total order);
    * the (score DESC, id ASC) ranking is total, so the survivor set is a
    * pure function of the inputs and SQL-oracle reproducible whenever the
    * score is. A component member MISSING from `scores` ranks LAST (null
    * score, nulls-last ordering) — it can only survive when its entire
    * component is unscored (lowest id wins), never by silently escaping
    * the ranking the way an inner join would let it.
    *
    * Scale shape mirrors [[keepCanonical]]: components ∝ the DUPLICATE
    * set, one window partitioned by component ranks members, and the
    * corpus anti-joins the losers (broadcastable when the dup fraction is
    * small — the common case).
    */
  def keepBest(
      corpus: DataFrame, pairs: DataFrame, scores: DataFrame,
      idCol: String, scoreCol: String,
      aCol: String = "doc_a", bCol: String = "doc_b"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val comp = connectedComponents(pairs, aCol, bCol)
    // Join shape: `scores` is corpus-sized, `comp` ∝ the duplicate set. A
    // direct left join would stream ALL of scores through a shuffle (the
    // small left side of a left-outer cannot be the broadcast build side);
    // instead the component ids semi-prune scores down to the duplicate
    // set first, and the pruned frame joins into the left join — with the
    // broadcast hints applied ONLY when the component table is COUNTED
    // under `spark.graft.dedup.broadcastIdCap`. The count is one agg over
    // a table that is usually already checkpointed (nearly free), and the
    // guard matters: a web crawl is routinely 30–50% duplicates, so at
    // 100 TB the component set is billions of ids — an unconditional
    // broadcast hint would build that as a single driver-collected hash
    // relation and OOM where plain AQE would have picked a shuffle join.
    // Over the cap, fall open to un-hinted joins (corpus-scale scores then
    // shuffle once — the correct plan when the duplicate set is huge).
    val broadcastIdCap = corpus.sparkSession.conf
      .get("spark.graft.dedup.broadcastIdCap", (1 << 22).toString).toLong
    val compIds = comp.select("doc_id")
    val compSmall = comp.count() <= broadcastIdCap
    def hinted(df: DataFrame): DataFrame = if (compSmall) broadcast(df) else df
    val prunedScores = scores
      .select(col(idCol).as("doc_id"), col(scoreCol).as("__score"))
      .join(hinted(compIds), Seq("doc_id"), "left_semi")
    val ranked = comp.join(hinted(prunedScores), Seq("doc_id"), "left")
      .withColumn("__rk", row_number().over(
        Window.partitionBy("component")
          .orderBy(desc_nulls_last("__score"), col("doc_id"))))
    val losers = ranked.filter(col("__rk") > 1)
      .select(col("doc_id").as(idCol))
    corpus.join(losers, Seq(idCol), "left_anti")
  }

  /** Benchmark DECONTAMINATION: flag every training document sharing at
    * least one word n-gram with a benchmark/eval set — the "did the eval
    * leak into the training set" check every serious training-data pipeline
    * runs before a model sees the corpus. Returns
    * (doc_id, shared_grams, total_grams, contamination) for flagged docs,
    * where contamination = shared/total distinct n-grams (an integer ratio
    * → deterministic double, SQL-oracle reproducible; no hashing anywhere).
    *
    * Scale shape: the benchmark side is an eval suite — thousands of
    * documents against a 100 TB corpus — so its DISTINCT n-gram set
    * BROADCASTS (by contract: the hint is explicit, so the caller owns the
    * bench side staying driver-sized; an eval suite always is) and the
    * corpus grams stream through a broadcast semi-join: no corpus shuffle
    * for the match, and the per-doc count is a map-side partial aggregation
    * on the shingle exchange [[shingleRows]] already pays.
    */
  def decontaminate(
      corpus: DataFrame, bench: DataFrame,
      textCol: String, idCol: String, shingleSize: Int = 3): DataFrame = {
    val corpusGrams = shingleRows(corpus, textCol, idCol, shingleSize)
    val benchGrams = shingleRows(bench, textCol, idCol, shingleSize)
      .select("s").distinct()
    val sizes = corpusGrams.groupBy("doc").agg(count(lit(1)).as("total_grams"))
    corpusGrams
      .join(broadcast(benchGrams), "s")
      .groupBy("doc").agg(count(lit(1)).as("shared_grams"))
      .join(sizes, "doc")
      .withColumn("contamination",
        col("shared_grams").cast("double") / col("total_grams"))
      .select(col("doc").as("doc_id"), col("shared_grams"),
        col("total_grams"), col("contamination"))
  }

  /** End-to-end MinHash-LSH near-dup detection: candidates → verify →
    * threshold. Returns (doc_a, doc_b, jaccard).
    *
    * Leaner than composing [[minhashCandidates]] + [[jaccardVerify]]:
    *  - no signature estimate (the exact verify supersedes it);
    *  - ONE cached (doc, shingle-hash) table feeds signatures AND verify
    *    (8-byte join keys, shingle strings never cross a shuffle);
    *  - the per-doc set size |A| rides the signature aggregation and is
    *    carried THROUGH the band join, so the Jaccard denominator needs no
    *    extra aggregation and no joins back to size tables;
    *  - with a positive threshold, candidate pairs sharing zero shingles
    *    (Jaccard 0) can never pass, so the intersection inner-join replaces
    *    the candidates left-join + fill of the general verify path.
    */
  def minhashDedup(
      df: DataFrame, textCol: String, idCol: String,
      threshold: Double = 0.7, numHashes: Int = 32, bands: Int = 8,
      shingleSize: Int = 3): DataFrame = {
    require(numHashes % bands == 0, "numHashes must divide into bands")
    require(threshold > 0.0, "threshold must be positive (zero-overlap pairs are skipped)")
    val r = numHashes / bands
    val expl = shingleRows(df, textCol, idCol, shingleSize)
      .select(col("doc"), xxhash64(col("s")).as("h"))
      .cache()
    val mins = (0 until numHashes).map(i => min(xxhash64(col("h"), lit(i))).as(s"m$i"))
    val agg = expl.groupBy("doc")
      .agg(count(lit(1)).as("sz"), mins: _*)
    val bandStructs = (0 until bands).map { b =>
      val cols = (b * r until (b + 1) * r).map(i => col(s"m$i").cast("string"))
      struct(lit(b).as("band"), xxhash64(concat_ws(",", cols: _*), lit(b)).as("bh"))
    }
    val banded = agg
      .select(col("doc"), col("sz"), explode(array(bandStructs: _*)).as("b"))
      .select(col("doc"), col("sz"), col("b.band").as("band"), col("b.bh").as("bh"))
    // sz is functionally dependent on doc, so carrying it through the join,
    // the distinct, and the groupBy changes no cardinalities.
    val cands = banded.as("x")
      .join(banded.as("y"), col("x.band") === col("y.band") && col("x.bh") === col("y.bh"))
      .filter(col("x.doc") < col("y.doc"))
      .select(col("x.doc").as("doc_a"), col("y.doc").as("doc_b"),
        col("x.sz").as("sz_a"), col("y.sz").as("sz_b"))
      .distinct()
    cands
      .join(expl.select(col("doc").as("doc_a"), col("h")), "doc_a")
      .join(expl.select(col("doc").as("doc_b"), col("h")), Seq("doc_b", "h"))
      .groupBy("doc_a", "doc_b", "sz_a", "sz_b")
      .agg(count(lit(1)).as("inter"))
      .withColumn("jaccard",
        col("inter").cast("double") / (col("sz_a") + col("sz_b") - col("inter")))
      .filter(col("jaccard") >= threshold)
      .select("doc_a", "doc_b", "jaccard")
  }

  // ---------------------------------------------------------------- simhash

  /** 64-bit SimHash of the word multiset: bit j of the signature is the sign
    * of Σ_words (±1 by bit j of xxhash64(word)).
    *
    * One `aggregate` pass over the words: fold ±1 counts for all 64 bit
    * positions (zip_with on a 64-long accumulator), then collapse the counts
    * to the signature in the aggregate's finish lambda — each input word is
    * hashed exactly once per row.
    */
  def simhash(text: Column): Column =
    aggregate(
      // hash each word once; `h` below is a bound array element, not a
      // re-evaluated expression
      transform(split(trim(text), " "), w => xxhash64(w)),
      array_repeat(lit(0L), 64),
      (acc, h) =>
        zip_with(
          acc,
          transform(sequence(lit(0), lit(63)),
            j => when(call_function("shiftright", h, j).bitwiseAND(1) === 1, 1L)
              .otherwise(-1L)),
          (a, d) => a + d),
      counts => aggregate(
        zip_with(
          counts,
          sequence(lit(0), lit(63)),
          (c, j) => when(c > 0, call_function("shiftleft", lit(1L), j)).otherwise(lit(0L))),
        lit(0L), (acc, b) => acc.bitwiseOR(b)))

  /** SimHash signatures as a DataFrame op: explode words, hash each once,
    * 64 codegen'd conditional-sum aggregates (one per bit), reassemble the
    * long. Same map-side-combine shape as [[minhashSignatures]] — the
    * per-row `aggregate` fold in [[simhash]] allocates a 64-long array per
    * word and is ~30× slower at corpus scale.
    */
  def simhashSignatures(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val words = df.select(
      col(idCol).as("doc"),
      explode(split(trim(col(textCol)), " ")).as("w"))
      .select(col("doc"), xxhash64(col("w")).as("h"))
    val sums = (0 until 64).map(j =>
      sum(when(call_function("shiftright", col("h"), lit(j)).bitwiseAND(1) === 1, 1L)
        .otherwise(-1L)).as(s"b$j"))
    val sig = (0 until 64)
      .map(j => when(col(s"b$j") > 0, lit(1L << j)).otherwise(lit(0L)))
      .reduce((a, b) => a.bitwiseOR(b))
    words.groupBy("doc")
      .agg(sums.head, sums.tail: _*)
      .select(col("doc"), sig.as("sh"))
  }

  /** SimHash near-dup candidates: docs sharing any of the four 16-bit chunks
    * of their signature, verified by hamming distance <= maxHamming
    * (`bit_count` of XOR).
    */
  def simhashDedup(df: DataFrame, textCol: String, idCol: String,
      maxHamming: Int = 6): DataFrame = {
    val signed = simhashSignatures(df, textCol, idCol)
    val chunked = signed.select(col("doc"), col("sh"),
      explode(transform(sequence(lit(0), lit(3)),
        c => struct(c.as("chunk"),
          call_function("shiftright", col("sh"), c * 16).bitwiseAND(0xFFFFL).as("ch")))).as("b"))
      .select(col("doc"), col("sh"), col("b.chunk").as("chunk"), col("b.ch").as("ch"))
    val a = chunked.select(col("chunk"), col("ch"), col("doc").as("doc_a"), col("sh").as("sh_a"))
    val b = chunked.select(col("chunk"), col("ch"), col("doc").as("doc_b"), col("sh").as("sh_b"))
    a.join(b, Seq("chunk", "ch"))
      .filter(col("doc_a") < col("doc_b"))
      // Hamming-filter BEFORE the pair distinct: the filter is a cheap
      // scalar on the joined row, and rejected pairs (the vast majority)
      // then never enter the dedup shuffle.
      .withColumn("hamming", bit_count(col("sh_a").bitwiseXOR(col("sh_b"))))
      .filter(col("hamming") <= maxHamming)
      .select("doc_a", "doc_b", "hamming")
      .dropDuplicates("doc_a", "doc_b")
  }

  /** Exact word-multiset (term-frequency) cosine pairs — the hash-free
    * ground truth for [[simhashDedup]]: SimHash is a random-hyperplane
    * sketch of exactly this tf vector, so hamming distance estimates this
    * cosine's angle (P(bit differs) = angle/π per bit). All arithmetic is
    * integer until the single final division (tf counts, dot products and
    * squared norms are longs), and the cosine is rounded to a 1e-6 grid —
    * the result is bit-reproducible by a plain SQL oracle, unlike anything
    * downstream of xxhash64.
    *
    * Candidate generation joins on shared words, so ubiquitous words make
    * this quadratic in documents-per-word: a VERIFICATION-scale tool (like
    * [[embeddingExactPairs]]), not the scale path — [[simhashDedup]]'s
    * chunk buckets are the 100 TB shape.
    */
  def wordCosinePairs(df: DataFrame, textCol: String, idCol: String,
      threshold: Double = 0.9): DataFrame = {
    val words = df.filter(col(textCol).isNotNull).select(
      col(idCol).as("doc"),
      explode(split(trim(regexp_replace(col(textCol), "\\s+", " ")), " ")).as("w"))
    val tf = words.groupBy("doc", "w").agg(count(lit(1)).as("tf")).cache()
    val norms = tf.groupBy("doc").agg(sum(col("tf") * col("tf")).as("n2"))
    val dots = tf.select(col("doc").as("doc_a"), col("w"), col("tf").as("tf_a"))
      .join(tf.select(col("doc").as("doc_b"), col("w"), col("tf").as("tf_b")), "w")
      .filter(col("doc_a") < col("doc_b"))
      .groupBy("doc_a", "doc_b").agg(sum(col("tf_a") * col("tf_b")).as("dot"))
    dots
      .join(norms.select(col("doc").as("doc_a"), col("n2").as("n2_a")), "doc_a")
      .join(norms.select(col("doc").as("doc_b"), col("n2").as("n2_b")), "doc_b")
      .withColumn("cosine", round(col("dot").cast("double") /
        sqrt((col("n2_a") * col("n2_b")).cast("double")), 6))
      .filter(col("cosine") >= threshold)
      .select("doc_a", "doc_b", "cosine")
  }

  // ----------------------------------------------------- embedding near-dup

  /** ALL-pairs exact embedding near-dup: quantized double cosine over the
    * full pair cross — no LSH, so the result is exactly reproducible by a
    * SQL oracle (the codegen'd cosine accumulates in double; rounding to a
    * 1e-6 grid absorbs engine summation-order differences). O(n²) by
    * construction: this is the ground truth [[embeddingNearDup]]'s LSH
    * buckets are measured against, not the scale path.
    */
  def embeddingExactPairs(
      df: DataFrame, vecCol: String, idCol: String,
      threshold: Double = 0.9): DataFrame = {
    // The streamed side of the nested-loop join inherits the source's split
    // count (often 1-2 parquet splits for a small table) — repartition so
    // the O(n²) cosine work spreads across every core.
    val n = df.sparkSession.sparkContext.defaultParallelism
    val a = df.repartition(n).select(col(idCol).as("doc_a"), col(vecCol).as("v_a"))
    val b = df.select(col(idCol).as("doc_b"), col(vecCol).as("v_b"))
    a.join(b, col("doc_a") < col("doc_b"))
      .withColumn("cos_q",
        round(Similarity.cosine(col("v_a"), col("v_b")) * 1000000).cast("long"))
      .filter(col("cos_q") >= math.round(threshold * 1000000))
      .select("doc_a", "doc_b", "cos_q")
  }

  /** SemDeDup-style semantic dedup (cluster-bucketed embedding near-dup):
    * k-means-assign every vector to its nearest centroid (deterministic
    * farthest-point seeds + bounded-sample Lloyd refinement via
    * [[Similarity.buildIvf]]), then verify exact cosine ONLY within each
    * cluster — the web-scale formulation where candidate generation is
    * O(Σ cluster²) instead of all-pairs, with clusters sized ~n/k.
    *
    * Returns the candidate pair list `(doc_a, doc_b, cosine)` above
    * `threshold`; compose with [[connectedComponents]] +
    * [[keepCanonical]] for the pruned-corpus output. Same contract as
    * [[embeddingNearDup]] with centroid buckets instead of hyperplane
    * buckets: recall misses only pairs that straddle a cluster boundary
    * (the SemDeDup trade by construction), measured against
    * [[embeddingExactPairs]] in OperatorsSpec.
    */
  def semanticDedup(
      df: DataFrame, vecCol: String, idCol: String,
      numClusters: Int, dim: Int, threshold: Double = 0.95): DataFrame = {
    val spark = df.sparkSession
    val (_, assigned0) = Similarity.buildIvf(df, vecCol, idCol, numClusters, dim)
    // Cluster-skew guard (same fail-open discipline as the driver edge cap
    // in connectedComponents): the in-cluster self-join is O(cluster²), so
    // one k-means mega-cluster — skewed embeddings routinely produce one —
    // turns the candidate stage quadratic in the corpus. Membership above
    // `spark.graft.dedup.clusterCap` sub-buckets by a deterministic
    // random-hyperplane signature with just enough planes to bring the
    // EXPECTED sub-bucket size under the cap; clusters under the cap keep
    // the exact in-cluster pass (sub-bucket 0, plan unchanged). The price
    // of the guard is one map-side count over the assignment table (k
    // result rows); the trade above the cap is SemDeDup's own by
    // construction — pairs straddling a sub-bucket boundary are missed,
    // but identical vectors always share a signature, so exact copies are
    // never lost (SemanticCapSpec pins a planted mega-cluster).
    val cap = spark.conf.get("spark.graft.dedup.clusterCap", "100000").toInt
    val sizes = assigned0.groupBy("centroid").agg(count(lit(1)).as("__csz"))
    val maxSz = sizes.agg(max(col("__csz"))).head.getLong(0)
    val (assigned, joinKeys) = if (maxSz <= cap) (assigned0, Seq("centroid"))
    else {
      val planes = math.min(16,
        math.ceil(math.log(maxSz.toDouble / cap) / math.log(2)).toInt)
      val rnd = new scala.util.Random(2026L)
      val planeVecs: Seq[Seq[Double]] =
        Seq.fill(planes)(Seq.fill(dim)(rnd.nextGaussian()))
      val sub = assigned0.join(broadcast(sizes), "centroid")
        .withColumn("__sub", when(col("__csz") <= cap, lit(0L))
          .otherwise(graft.functions.HyperplaneSig(col(vecCol), planeVecs)))
        .drop("__csz")
      (sub, Seq("centroid", "__sub"))
    }
    val keyCols = joinKeys.map(col)
    val a = assigned.select(keyCols :+ col(idCol).as("doc_a") :+ col(vecCol).as("v_a"): _*)
    val b = assigned.select(keyCols :+ col(idCol).as("doc_b") :+ col(vecCol).as("v_b"): _*)
    a.join(b, joinKeys)
      .filter(col("doc_a") < col("doc_b"))
      .withColumn("cosine", Similarity.cosine(col("v_a"), col("v_b")))
      .filter(col("cosine") >= threshold)
      .select("doc_a", "doc_b", "cosine")
  }

  /** Near-duplicate detection on an embedding column via random-hyperplane
    * LSH: `planes` fixed pseudo-random hyperplanes (deterministic seed) give
    * each vector a sign-bit signature; vectors sharing the signature land in
    * one bucket; in-bucket pairs are verified by exact cosine >= threshold.
    *
    * At scale the bucket join is the only shuffle and bucket sizes are
    * ~n/2^planes — tune `planes` to the corpus size.
    */
  def embeddingNearDup(
      df: DataFrame, vecCol: String, idCol: String,
      threshold: Double = 0.95, planes: Int = 8, dim: Int = 64,
      seed: Long = 42L): DataFrame = {
    val rnd = new scala.util.Random(seed)
    val planeVecs: Seq[Seq[Double]] =
      Seq.fill(planes)(Seq.fill(dim)(rnd.nextGaussian()))
    // ONE codegen'd signature expression — the per-plane
    // aggregate(zip_with(...)) HOFs evaluated interpreted on the corpus
    // pass (SCALING.md's measured cross-thread contention pathology);
    // OperatorsSpec pins bit-equality between the two forms.
    val bucketed = df.select(col(idCol).as("doc"), col(vecCol).as("v"),
      graft.functions.HyperplaneSig(col(vecCol), planeVecs).as("bucket"))
    val a = bucketed.select(col("bucket"), col("doc").as("doc_a"), col("v").as("v_a"))
    val b = bucketed.select(col("bucket"), col("doc").as("doc_b"), col("v").as("v_b"))
    a.join(b, Seq("bucket"))
      .filter(col("doc_a") < col("doc_b"))
      .withColumn("cosine", Similarity.cosine(col("v_a"), col("v_b")))
      .filter(col("cosine") >= threshold)
      .select("doc_a", "doc_b", "cosine")
  }
}
