package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text analysis for large-scale training-data pipelines: token counting,
  * quality scoring, language ID, document fingerprinting.
  *
  * Everything is built from codegen'd Catalyst built-ins (string ops +
  * higher-order array functions) — no UDFs — so the operators stay inside
  * whole-stage codegen and scale linearly with input splits.
  *
  * Token/char counts use pure string arithmetic (`length`/`replace`) chosen
  * to be expressible IDENTICALLY in the DuckDB oracle, so the correctness
  * gate can hash-compare them.
  */
object TextAnalysis {

  /** Stopword set used for quality scoring (tiny, English-centric — the
    * ratio is a quality signal, not linguistics).
    */
  val Stopwords: Seq[String] = Seq(
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it",
    "for", "on", "with", "as", "at", "by", "from", "that", "this")

  /** Naive whitespace token count: #spaces + 1 on the trimmed text (0 for
    * empty). Deliberately simple string arithmetic — same formula runs in
    * the oracle.
    */
  def tokenCount(text: Column): Column = {
    val t = trim(text)
    when(length(t) === 0, lit(0L))
      .otherwise((length(t) - length(replace(t, lit(" "), lit(""))) + 1).cast("long"))
  }

  /** BPE-ish token count: alphanumeric runs and individual punctuation
    * marks each count as one token (the usual pre-tokenizer split), via
    * `regexp_count` — closer to an LLM tokenizer's budget than whitespace
    * counting. Pattern avoids lookarounds so RE2-based engines (the DuckDB
    * oracle) agree.
    */
  def regexTokenCount(text: Column): Column =
    regexp_count(lower(text), lit("[a-z0-9]+|[^a-z0-9 ]")).cast("long")

  /** Count of words that are in the stopword list. */
  def stopwordCount(text: Column): Column =
    size(filter(split(trim(text), " "),
      w => array_contains(array(Stopwords.map(lit): _*), w))).cast("long")

  /** Quality score in [0,1]: length signal + stopword-ratio signal + char
    * signal. All arithmetic on integer-derived doubles → deterministic and
    * oracle-reproducible.
    */
  def qualityScore(text: Column): Column = {
    val tokens = tokenCount(text).cast("double")
    val stops = stopwordCount(text).cast("double")
    val chars = length(trim(text)).cast("double")
    val stopRatio = when(tokens > 0, stops / tokens).otherwise(lit(0.0))
    lit(0.4) * least(lit(1.0), tokens / lit(100.0)) +
      lit(0.3) * least(lit(1.0), stopRatio * lit(4.0)) +
      lit(0.3) * least(lit(1.0), chars / lit(500.0))
  }

  /** Per-language marker words for the n-gram-free language-ID heuristic.
    * Real pipelines plug in fastText-style models at this seam; the operator
    * shape (score-per-language, deterministic argmax) is the same.
    */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "is", "that", "it"),
    "de" -> Seq("der", "die", "und", "ist", "das", "nicht", "ein"),
    "fr" -> Seq("le", "la", "et", "est", "les", "des", "une"),
    "es" -> Seq("el", "la", "y", "es", "los", "una", "del"))

  /** Heuristic language ID: count marker-word hits per language, take the
    * argmax (ties broken by language code, deterministically) — "und" when
    * nothing matches.
    */
  def langId(text: Column): Column = {
    val words = split(lower(trim(text)), " ")
    val scored = LangMarkers.map { case (lang, markers) =>
      val hits = size(filter(words, w => array_contains(array(markers.map(lit): _*), w)))
      struct(hits.as("score"), lit(lang).as("lang"))
    }
    val best = array_max(array(scored: _*))
    when(best.getField("score") > 0, best.getField("lang")).otherwise(lit("und"))
  }

  /** Character-trigram profiles per language for [[langIdNgram]]. Tiny,
    * hand-picked high-frequency trigrams (spaces matter); a production
    * system learns these from corpora — the operator shape is identical.
    */
  val TrigramProfiles: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", " th", "he ", "ing", "and", " an", "ion"),
    "de" -> Seq("der", "ich", "sch", "ein", "und", " de", "en "),
    "fr" -> Seq("es ", " de", "le ", "ent", "que", " le", "ais"),
    "es" -> Seq(" de", "os ", "la ", " la", "que", "ado", "ión"))

  /** Character n-gram language ID: count profile-trigram occurrences via
    * pure string arithmetic (`(len - len(replace)) / 3` per trigram — the
    * same formula an oracle can run), argmax with deterministic tie-break.
    */
  def langIdNgram(text: Column): Column = {
    val t = lower(text)
    val scored = TrigramProfiles.map { case (lang, tris) =>
      val score = tris.map { tri =>
        (length(t) - length(replace(t, lit(tri), lit("")))) / lit(3)
      }.reduce(_ + _)
      struct(score.as("score"), lit(lang).as("lang"))
    }
    val best = array_max(array(scored: _*))
    when(best.getField("score") > 0, best.getField("lang")).otherwise(lit("und"))
  }

  /** Normalized-text fingerprint: lower-case, strip non-alphanumerics,
    * collapse whitespace, then xxhash64 — a cheap rolling-hash-style content
    * id for exact-after-normalization dedup.
    */
  def fingerprint(text: Column): Column =
    xxhash64(normalize(text))

  def normalize(text: Column): Column =
    trim(regexp_replace(regexp_replace(lower(text), "[^a-z0-9 ]", ""), " +", " "))

  /** Gopher-style line-repetition quality signals, per document:
    *
    *   - `dup_line_frac`: fraction of non-empty lines that are repeats of
    *     another line in the same document;
    *   - `dup_line_char_frac`: fraction of non-empty-line CHARACTERS that
    *     sit inside repeated lines.
    *
    * Boilerplate-heavy pages (nav bars, cookie banners, scraped templates)
    * score high and get filtered. Two-level aggregation — (doc, line)
    * counts, then per-doc ratios — so map-side partial aggregation does the
    * heavy dedup before the shuffle; cost stays one corpus pass at any
    * scale. Ratios divide exact integers, so the doubles are
    * oracle-reproducible bit-for-bit. Documents with no non-empty lines
    * drop from the output (no lines to judge).
    */
  def lineRepetition(df: DataFrame, textCol: String, idCol: String): DataFrame =
    df.select(col(idCol).as("doc"),
        explode(split(col(textCol), "\n")).as("line"))
      .filter(col("line") =!= "")
      .groupBy("doc", "line")
      .agg(count(lit(1)).as("c"), length(col("line")).as("len"))
      .groupBy("doc")
      .agg(
        (lit(1.0) - count(lit(1)).cast("double") / sum("c")).as("dup_line_frac"),
        (coalesce(sum(when(col("c") > 1, col("c") * col("len"))), lit(0L))
          .cast("double") / sum(col("c") * col("len"))).as("dup_line_char_frac"))

  /** Top-bigram concentration, per document: the fraction of word bigrams
    * taken by the single most frequent one (`top_bigram_frac`), plus the
    * bigram count. Degenerate repetition ("buy now buy now buy now…")
    * concentrates mass on one bigram; natural text stays low. Bigrams pair
    * adjacent lowercased whitespace tokens via slice+zip (no self-join);
    * same two-level aggregation shape as [[lineRepetition]]. Documents
    * with fewer than two tokens have no bigrams and drop from the output.
    */
  def topBigramFrac(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val toks = split(lower(col(textCol)), "\\s+")
    df.select(col(idCol).as("doc"),
        explode(arrays_zip(
          slice(toks, lit(1), size(toks) - 1),
          slice(toks, lit(2), size(toks) - 1))).as("z"))
      .select(col("doc"),
        concat_ws(" ", col("z.0"), col("z.1")).as("bigram"))
      .groupBy("doc", "bigram")
      .agg(count(lit(1)).as("c"))
      .groupBy("doc")
      .agg(
        (max("c").cast("double") / sum("c")).as("top_bigram_frac"),
        sum("c").as("n_bigrams"))
  }

  /** Per-word document frequency over a corpus: (word, df). */
  def documentFrequency(df: DataFrame, textCol: String, idCol: String): DataFrame =
    df.select(col(idCol).as("doc"), explode(split(trim(col(textCol)), " ")).as("w"))
      .distinct()
      .groupBy("w").agg(count(lit(1)).as("df"))

  /** Top-k TF-IDF terms per document: tf(word, doc) × ln(N / df(word)),
    * ranked by score with deterministic tie-break on the word. All
    * joins/aggregations — the corpus-scale shape (df table is reusable and
    * incrementally maintainable).
    */
  def tfIdfTopTerms(df: DataFrame, textCol: String, idCol: String, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val n = df.count()
    val tf = df.select(col(idCol).as("doc"), explode(split(trim(col(textCol)), " ")).as("w"))
      .groupBy("doc", "w").agg(count(lit(1)).as("tf"))
    val idf = documentFrequency(df, textCol, idCol)
      .withColumn("idf", log(lit(n.toDouble) / col("df")))
    val rank = Window.partitionBy("doc").orderBy(desc("score"), asc("w"))
    tf.join(idf, "w")
      .withColumn("score", col("tf") * col("idf"))
      .withColumn("rk", row_number().over(rank))
      .filter(col("rk") <= k)
      .select("doc", "w", "tf", "df", "score", "rk")
  }

  /** TF-IDF ranking with an INTEGER idf surrogate, `idf_int = (1000·N) div
    * df` — monotone in the real idf, and every score/compare is exact
    * integer arithmetic, so the ranking is oracle-reproducible (the ln-based
    * [[tfIdfTopTerms]] ranks by a libm-dependent double). The div-by-df
    * double division cannot misround across an integer boundary: quotients
    * are either exact or at least 1/df away from an integer, far beyond
    * double error.
    */
  def tfIdfTopTermsInt(df: DataFrame, textCol: String, idCol: String, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val n = df.count()
    val tf = df.select(col(idCol).as("doc"), explode(split(trim(col(textCol)), " ")).as("w"))
      .groupBy("doc", "w").agg(count(lit(1)).as("tf"))
    val idf = documentFrequency(df, textCol, idCol)
      .withColumn("idf_int", floor(lit(1000.0 * n) / col("df")).cast("long"))
    val rank = Window.partitionBy("doc").orderBy(desc("score_int"), asc("w"))
    tf.join(idf, "w")
      .withColumn("score_int", col("tf") * col("idf_int"))
      .withColumn("rk", row_number().over(rank).cast("long"))
      .filter(col("rk") <= k)
      .select("doc", "w", "tf", "df", "score_int", "rk")
  }

  // ------------------------------------------------ learned quality lexicon

  /** Train an integer quality lexicon from labeled documents: for each
    * word, `weight = (#positive docs containing it) − (#negative docs
    * containing it)` — the exact-integer surrogate of the per-term
    * log-odds that fastText-style quality classifiers learn (monotone in
    * the log-odds at balanced classes), kept integral so the downstream
    * scores are oracle-reproducible. One distinct-presence explode + one
    * aggregation; the lexicon is vocabulary-sized, no corpus state.
    */
  def trainQualityLexicon(
      df: DataFrame, textCol: String, labelCol: String): DataFrame =
    df.select(col(labelCol).cast("int").as("lab"),
        explode(array_distinct(
          split(trim(regexp_replace(col(textCol), "\\s+", " ")), " "))).as("term"))
      .groupBy("term")
      .agg(sum(when(col("lab") === 1, 1L).otherwise(-1L)).as("weight"))

  /** Model-based quality filtering: score every document against a trained
    * lexicon, `score(doc) = Σ tf(term) · weight(term)` — a linear
    * classifier margin, exact integer end-to-end. The lexicon broadcasts
    * (it is vocabulary-sized no matter the corpus), so the only wide
    * operation over the corpus is the (doc, term) tf aggregation — the
    * same one-shuffle shape as [[documentFrequency]]. Terms outside the
    * lexicon contribute 0; `terms_hit` counts the distinct lexicon terms
    * each document touched (a coverage signal for threshold picking).
    */
  def lexiconScore(
      df: DataFrame, textCol: String, idCol: String,
      lexicon: DataFrame): DataFrame = {
    val tf = df.select(col(idCol).as("doc"),
        explode(
          split(trim(regexp_replace(col(textCol), "\\s+", " ")), " ")).as("term"))
      .groupBy("doc", "term").agg(count(lit(1)).as("tf"))
    tf.join(broadcast(lexicon), Seq("term"), "left")
      .groupBy("doc")
      .agg(
        sum(col("tf") * coalesce(col("weight"), lit(0L))).as("score"),
        sum(when(col("weight").isNotNull, 1L).otherwise(0L)).as("terms_hit"))
  }

  /** Winnowing fingerprints (the rolling-hash document-fingerprint scheme):
    * hash every word k-gram, then keep the minimum hash of each sliding
    * window of `window` consecutive k-grams; the distinct kept hashes are
    * the document's fingerprint set. Guarantees any shared run of
    * `k + window - 1` words between two documents shares a fingerprint.
    * Relational shape: posexplode + window-lead k-gram build + windowed min
    * — one shuffle by doc, no higher-order functions.
    */
  def winnowFingerprints(
      df: DataFrame, textCol: String, idCol: String,
      k: Int = 4, window: Int = 4): DataFrame = {
    import org.apache.spark.sql.expressions.{Window => W}
    val words = df.select(
      col(idCol).as("doc"),
      posexplode(split(trim(col(textCol)), " ")).as(Seq("pos", "w")))
    val byPos = W.partitionBy("doc").orderBy("pos")
    val leadCols = (1 until k).map(j => lead(col("w"), j).over(byPos).as(s"w$j"))
    val grams = words
      .select(Seq(col("doc"), col("pos"), col("w")) ++ leadCols: _*)
      .filter(col(s"w${k - 1}").isNotNull || col("pos") === 0)
      .select(col("doc"), col("pos"),
        xxhash64(concat_ws(" ", col("w") +: (1 until k).map(j => col(s"w$j")): _*)).as("h"))
    grams
      .withColumn("fp",
        min(col("h")).over(byPos.rowsBetween(0, window - 1)))
      .select(col("doc"), col("fp"))
      .distinct()
  }

  /** [[winnowFingerprints]] with an INTEGER rolling hash instead of
    * xxhash64, so the whole scheme — k-gram build, min-of-window selection,
    * distinct fingerprint set — is reproducible in an ANSI-SQL oracle.
    *
    * Words get dense integer ids from a vocabulary table (row_number over
    * the sorted distinct words — a single-partition sort bounded by VOCAB
    * size, not corpus size; this is the documented eval-path trade, the
    * production path is the shuffle-free xxhash64 variant above). Each
    * k-gram hashes by the modular polynomial `h = fold((acc*B + id) % M)`
    * with B=1000003, M=2^31-1: acc < M and B·M < 2^63 keep every
    * intermediate exact in int64 arithmetic for Spark and the oracle alike.
    *
    * Divergence from the xxhash64 variant: only COMPLETE k-grams hash (a
    * document shorter than k words yields no fingerprints) — partial-gram
    * fallback would need null-handling the SQL mirror can't express
    * identically. Same shared-run guarantee for docs ≥ k+window-1 words.
    */
  def winnowFingerprintsInt(
      df: DataFrame, textCol: String, idCol: String,
      k: Int = 4, window: Int = 4): DataFrame = {
    import org.apache.spark.sql.expressions.{Window => W}
    val B = 1000003L
    val M = 2147483647L
    val words = df.select(
      col(idCol).as("doc"),
      posexplode(split(trim(col(textCol)), " ")).as(Seq("pos", "w")))
    val vocab = words.select("w").distinct()
      .withColumn("wid", row_number().over(W.orderBy("w")).cast("long"))
    val byPos = W.partitionBy("doc").orderBy("pos")
    val ids = words.join(vocab, "w").select(col("doc"), col("pos"), col("wid"))
    val idCols = col("wid").as("id0") +:
      (1 until k).map(j => lead(col("wid"), j).over(byPos).as(s"id$j"))
    val h = (1 until k).foldLeft(col("id0") % M) { (acc, j) =>
      (acc * B + col(s"id$j")) % M
    }
    ids.select(Seq(col("doc"), col("pos")) ++ idCols: _*)
      .filter(col(s"id${k - 1}").isNotNull)
      .select(col("doc"), col("pos"), h.as("h"))
      .withColumn("fp", min(col("h")).over(byPos.rowsBetween(0, window - 1)))
      .select(col("doc"), col("fp"))
      .distinct()
  }

  /** Email-address pattern shared by scrub and count — kept RE2-compatible
    * (no lookaround/backrefs) so a SQL oracle and any non-JVM reimplementation
    * match byte-for-byte.
    */
  val EmailPattern: String = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"

  /** US-shaped phone pattern (`555-123-4567` / `555.123.4567`), word-bounded. */
  val PhonePattern: String = "\\b\\d{3}[-.]\\d{3}[-.]\\d{4}\\b"

  /** DSIR-shaped IMPORTANCE WEIGHTS for corpus selection (Xie et al. 2023,
    * "Data Selection for Language Models via Importance Resampling"):
    * score every raw document by how much its unigram distribution looks
    * like a TARGET corpus vs the raw corpus — the standard way to select
    * pretraining data matching a desired domain without labels (the
    * supervised cousin is [[trainQualityLexicon]]).
    *
    * DSIR proper uses hashed-n-gram log-likelihood ratios; this is the
    * EXACT-INTEGER twin: per-term rates scaled to an integer grid
    * (`rate = (count * scale) div N`, integral division — both engines
    * truncate identically on non-negatives) and a per-document
    * tf-weighted LINEAR contrast `Σ tf·(rate_target − rate_raw)` instead
    * of the log ratio — same ordering intuition (terms over-represented in
    * the target pull a document up), bit-reproducible by any engine
    * (`text_dsir_select` has a full DuckDB oracle; no libm ln() in sight).
    *
    * Scale shape: tokenization explodes map-side; the two rate tables are
    * term-keyed aggregates (broadcastable for real vocabularies, shuffle
    * joins otherwise — the same shape as [[documentFrequency]]); the final
    * per-doc sum is one groupBy. The two corpus token totals are O(1)
    * driver scalars inlined as literals. `scale` bounds: `count * scale`
    * must fit a long — 1e6 leaves headroom to ~9e12 occurrences of one
    * term per corpus; raise with care.
    *
    * Returns (doc, weight, n_tokens) for every raw document.
    */
  def importanceContrast(
      raw: DataFrame, target: DataFrame, textCol: String, idCol: String,
      scale: Long = 1000000L): DataFrame = {
    def tokens(d: DataFrame): Column =
      explode(split(trim(regexp_replace(d(textCol), "\\s+", " ")), " "))
    val tTok = target.select(tokens(target).as("term"))
    val rTok = raw.select(tokens(raw).as("term"))
    val nT = tTok.count()
    val nR = rTok.count()
    require(nT > 0 && nR > 0, "importance contrast needs non-empty corpora")
    val tRate = tTok.groupBy("term").agg(count(lit(1)).as("ct"))
      .select(col("term"), expr(s"(ct * $scale) div $nT").as("rate_t"))
    val rRate = rTok.groupBy("term").agg(count(lit(1)).as("cr"))
      .select(col("term"), expr(s"(cr * $scale) div $nR").as("rate_r"))
    val tf = raw.select(col(idCol).as("doc"), tokens(raw).as("term"))
      .groupBy("doc", "term").agg(count(lit(1)).as("tf"))
    tf.join(tRate, Seq("term"), "left")
      .join(rRate, Seq("term"), "left") // never misses: raw terms ⊆ raw
      .groupBy("doc")
      .agg(
        sum(col("tf") *
          (coalesce(col("rate_t"), lit(0L)) - coalesce(col("rate_r"), lit(0L))))
          .as("weight"),
        sum(col("tf")).as("n_tokens"))
  }

  /** Deterministic selection of the `n` highest-importance documents —
    * the resampling step of DSIR made reproducible: rank by
    * (weight desc, doc), which plans as a TakeOrdered over the scored
    * frame (no global sort materialization; k rows per partition, one
    * driver merge). DSIR's Gumbel-noise diversity draw is deliberately
    * NOT the default — an RNG would make selection irreproducible across
    * engines and runs; callers wanting it can add a seeded jitter column
    * before ranking.
    */
  def importanceSelect(scored: DataFrame, n: Int): DataFrame =
    scored.orderBy(desc("weight"), col("doc")).limit(n)

  /** N-GRAM LANGUAGE-MODEL QUALITY SCORING (CCNet-style): train a bigram
    * model on a REFERENCE corpus (the "good" slice — wiki-like sources,
    * a target language), then score every raw document by how well the
    * model predicts its bigrams. CCNet proper trains a KenLM 5-gram and
    * ranks by perplexity; this is the exact-integer formulation of the
    * same signal, chosen so the whole path is bit-reproducible by an
    * ANSI-SQL oracle (no libm `log`): the model stores per-bigram
    * conditional rates on an integer grid — `rate(w1 w2) = (count(w1 w2)
    * * scale) div count(w1 ·)` with both counts over the reference's
    * bigram stream, so rate ∈ [0, scale] — and a document scores
    *   n_bigrams   = Σ tf                  (its bigram volume)
    *   oov_bigrams = Σ tf · [model miss]   (unmodeled-bigram mass — the
    *                                        "not like the reference" signal)
    *   lm_score    = Σ tf · rate           (higher = more reference-like;
    *                                        the monotone stand-in for
    *                                        negative log-perplexity)
    *   lm_avg      = lm_score div n_bigrams (length-normalized, the value
    *                                        a filter thresholds on)
    *
    * Scale shape: bigram construction is a NARROW map (per-row
    * slice+zip_with over the token array — no window, no shuffle); the
    * model is two vocabulary-bounded aggregates (broadcastable for any
    * real corpus: |model| ≤ distinct bigrams of the REFERENCE, not the
    * corpus); scoring is one shuffle on the bigram key + one groupBy(doc).
    * Division only happens model-side (|model| rows) and in the final
    * per-doc select — never per corpus bigram. `scale` bounds: count *
    * scale must fit a long (1e6 leaves headroom to ~9e12 reference
    * occurrences of one bigram).
    *
    * Documents with fewer than two words have no bigrams and are absent
    * from the output (the oracle drops them identically); score them as
    * unconditionally low-quality caller-side if they can occur.
    *
    * Returns (doc, n_bigrams, oov_bigrams, lm_score, lm_avg).
    */
  def bigramLmScore(
      raw: DataFrame, ref: DataFrame, textCol: String, idCol: String,
      scale: Long = 1000000L): DataFrame = {
    def bigrams(d: DataFrame): Column = {
      val t = split(trim(regexp_replace(d(textCol), "\\s+", " ")), " ")
      val n = greatest(size(t) - 1, lit(0))
      explode(zip_with(slice(t, lit(1), n), slice(t, lit(2), n),
        (a, b) => concat(a, lit(" "), b)))
    }
    val refBg = ref.select(bigrams(ref).as("bg"))
    val big = refBg.groupBy("bg").agg(count(lit(1)).as("c2"))
    val uni = refBg.select(substring_index(col("bg"), " ", 1).as("w1"))
      .groupBy("w1").agg(count(lit(1)).as("c1"))
    val model = big.withColumn("w1", substring_index(col("bg"), " ", 1))
      .join(uni, "w1")
      .select(col("bg"), expr(s"(c2 * $scale) div c1").as("rate"))
    val tf = raw.select(col(idCol).as("doc"), bigrams(raw).as("bg"))
      .groupBy("doc", "bg").agg(count(lit(1)).as("tf"))
    tf.join(model, Seq("bg"), "left")
      .groupBy("doc")
      .agg(
        sum(col("tf")).as("n_bigrams"),
        sum(when(col("rate").isNull, col("tf")).otherwise(lit(0L)))
          .as("oov_bigrams"),
        sum(col("tf") * coalesce(col("rate"), lit(0L))).as("lm_score"))
      .withColumn("lm_avg", expr("lm_score div n_bigrams"))
  }

  /** SLIDING-WINDOW CHUNKING for RAG / context-window preparation: split
    * every document into word chunks of `chunkSize`, starting every
    * `stride` words (overlap = chunkSize - stride), the standard shape for
    * embedding-index ingestion and long-document training examples.
    *
    * One codegen'd expression per row — tokenize once, `transform` over a
    * chunk-index `sequence`, then `posexplode` — so the operator is a
    * narrow map with no shuffle and no UDF; output size is the only cost.
    * Chunk starts are `i*stride` for `i ∈ [0, ceil(nWords/stride))`: every
    * word belongs to ≥1 chunk, consecutive chunks share `chunkSize-stride`
    * words, the tail chunk may be short (its true length is `n_words`).
    * Deterministic integer arithmetic end-to-end → DuckDB oracle
    * `text_chunks` reproduces it bit-exact.
    *
    * Returns (doc, chunk_id, chunk, n_words).
    */
  def chunkWords(
      df: DataFrame, textCol: String, idCol: String,
      chunkSize: Int, stride: Int): DataFrame = {
    require(stride > 0 && chunkSize >= stride,
      s"need 0 < stride <= chunkSize, got stride=$stride chunkSize=$chunkSize")
    val toks = split(trim(col(textCol)), " ")
    val nChunks = greatest(
      ceil(size(toks).cast("double") / stride).cast("long"), lit(1L))
    df.select(col(idCol).as("doc"),
        posexplode(transform(sequence(lit(0L), nChunks - 1), i =>
          struct(
            array_join(slice(toks, (i * stride + 1).cast("int"), lit(chunkSize)), " ")
              .as("chunk"),
            least(size(toks).cast("long") - i * stride, lit(chunkSize.toLong))
              .as("n_words")))).as(Seq("chunk_id", "c")))
      .select(col("doc"), col("chunk_id").cast("long").as("chunk_id"),
        col("c.chunk").as("chunk"), col("c.n_words").as("n_words"))
  }

  /** SEQUENCE PACKING for pretraining: assign each document to a
    * fixed-token-budget pack (the "fill each context window" step between
    * a cleaned corpus and a trainer). Documents are packed in deterministic
    * id order WITHIN a shard (`doc_id % nShards`); a document belongs to
    * the pack its running-token-offset starts in, so packs are contiguous
    * id ranges and every row's assignment is pure integer arithmetic —
    * reproducible by the SQL oracle and by any re-run (no RNG, no
    * first-fit heuristics whose output depends on visit order).
    *
    * Returns (doc_id, shard, n_tokens, pack): `pack` is globally unique
    * (shard * 2^32 + in-shard bin).
    *
    * Scale shape: packing is a running sum — a GLOBAL window would funnel
    * 100 TB through one partition. Sharding first makes it a window
    * PARTITIONED BY shard (each executor packs its shard independently),
    * which is also how a real pipeline wants packs laid out: one writer
    * task per shard, packs local to their shard's files.
    */
  def packSequences(
      df: DataFrame, textCol: String, idCol: String,
      budgetTokens: Long, nShards: Int = 32): DataFrame =
    packCounts(df.select(col(idCol), tokenCount(col(textCol)).as("n_tokens")),
      idCol, "n_tokens", budgetTokens, nShards)

  /** [[packSequences]] generalized to a PRECOMPUTED token-count column —
    * the entry point for packing on REAL tokenizer counts (e.g.
    * [[Bpe.tokenIds]]'s n_tokens) instead of the whitespace proxy. Same
    * contract and scale shape: shard-partitioned running sum, never a
    * global window.
    */
  def packCounts(
      counts: DataFrame, idCol: String, tokensCol: String,
      budgetTokens: Long, nShards: Int = 32): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("shard").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    counts.select(col(idCol).as("doc_id"),
        pmod(col(idCol), lit(nShards)).cast("int").as("shard"),
        col(tokensCol).cast("long").as("n_tokens"))
      .withColumn("start_off", sum(col("n_tokens")).over(w) - col("n_tokens"))
      .withColumn("pack",
        col("shard").cast("long") * lit(1L << 32) +
          floor(col("start_off") / lit(budgetTokens)).cast("long"))
      .select("doc_id", "shard", "n_tokens", "pack")
  }

  /** PII scrubbing for a training corpus: redact email addresses and
    * phone-shaped numbers to fixed placeholder tokens and report how many
    * redactions each document took (the audit trail a data-governance
    * pipeline keeps). Pure codegen'd `regexp_replace`/`regexp_count` —
    * embarrassingly parallel, no shuffle, no UDF; patterns are
    * RE2-compatible so the DuckDB oracle runs the identical regexes.
    */
  def piiScrub(df: DataFrame, textCol: String, idCol: String): DataFrame =
    df.select(
      col(idCol).as("doc_id"),
      regexp_replace(
        regexp_replace(col(textCol), lit(EmailPattern), lit("<EMAIL>")),
        lit(PhonePattern), lit("<PHONE>")).as("clean_text"),
      (regexp_count(col(textCol), lit(EmailPattern)) +
        regexp_count(col(textCol), lit(PhonePattern))).cast("long").as("n_redacted"))
}
