package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed BPE (byte-pair-encoding) merge training — the vocabulary-
  * learning step of every modern tokenizer (Sennrich et al. 2016; GPT-2's
  * tokenizer trains exactly this way), over the corpus the engine curates.
  *
  * The scalable formulation: the corpus first reduces to a WORD-COUNT
  * table (one groupBy — at 100 TB the vocabulary is millions of rows where
  * the corpus is trillions of tokens), and every merge round is one
  * explode+groupBy over that vocabulary, never the corpus. Rounds are
  * inherently sequential (round r's pair counts depend on round r-1's
  * merge — that is BPE's definition), so training R merges costs R small
  * Spark jobs; per-round plans stay flat via localCheckpoint.
  *
  * Determinism: pair counts are exact integers; the merge pick orders by
  * (freq DESC, left, right) — a total order, so training is reproducible
  * and the round-1 statistics have a DuckDB oracle (`text_bpe_pairs`).
  */
object Bpe {

  /** A word as its initial symbol sequence: one UTF-8 character each. */
  def charSymbols(w: Column): Column =
    transform(sequence(lit(1), length(w)), i => w.substr(i, lit(1)))

  /** Adjacent-pair statistics of a (cnt, s: array<string>) symbols frame:
    * (left_sym, right_sym, freq) where freq sums word counts over every
    * adjacent occurrence. Single-symbol words contribute nothing (the
    * size guard matters: Spark's `sequence(1, 0)` counts DOWN).
    */
  def pairStats(sym: DataFrame): DataFrame = {
    val s = col("s")
    val prs = when(size(s) > 1,
      transform(sequence(lit(1), size(s) - 1), i =>
        struct(element_at(s, i).as("l"), element_at(s, i + 1).as("r"))))
      .otherwise(array().cast("array<struct<l:string,r:string>>"))
    sym.select(col("cnt"), explode(prs).as("p"))
      .groupBy(col("p.l").as("left_sym"), col("p.r").as("right_sym"))
      .agg(sum(col("cnt")).as("freq"))
  }

  /** One greedy left-to-right merge pass: every adjacent (a, b) in the
    * symbol array becomes the fused symbol a+b. A codegen'd array fold —
    * the merged symbol can seed the NEXT merge's left side (a b a b folds
    * to ab ab), which is BPE's apply semantics.
    */
  def mergePass(sym: Column, a: String, b: String): Column =
    aggregate(sym, array().cast("array<string>"),
      (out, x) => when(
          size(out) > 0 && element_at(out, -1) === lit(a) && x === lit(b),
          concat(slice(out, lit(1), size(out) - 1), array(lit(a + b))))
        .otherwise(concat(out, array(x))))

  /** The corpus word-count table: (word, cnt), whitespace-tokenized the
    * same way as every other text operator here.
    */
  def wordCounts(df: DataFrame, textCol: String): DataFrame =
    df.select(explode(split(trim(col(textCol)), " ")).as("word"))
      .filter(col("word") =!= "")
      .groupBy("word").agg(count(lit(1)).as("cnt"))

  /** ENCODE with a trained merge table: apply the merges to every word of
    * every document in training order (BPE's apply semantics) and return
    * (doc, n_words, n_tokens) — the real token count a context-window
    * budget or a price estimate needs, where [[TextAnalysis.tokenCount]]
    * is the whitespace proxy. One narrow map: the merge folds compose into
    * a single codegen'd expression per row, no shuffle, no dictionary
    * broadcast (the merge table is literals in the plan — it is tokenizer
    * CONFIG, a few hundred entries, not data).
    */
  def encode(df: DataFrame, textCol: String, idCol: String,
      merges: Seq[(Int, String, String, Long)]): DataFrame = {
    val words = split(trim(col(textCol)), " ")
    val perWord = transform(words, w => {
      val sym0 = charSymbols(w)
      val fused = merges.sortBy(_._1).foldLeft(sym0) { case (s, (_, a, b, _)) =>
        mergePass(s, a, b)
      }
      size(fused)
    })
    df.select(col(idCol).as("doc"),
      size(words).cast("long").as("n_words"),
      aggregate(perWord, lit(0L), (acc, x) => acc + x).as("n_tokens"))
  }

  /** Apply a merge table (in training order) to one word's char symbols —
    * the fold every encode entry point shares.
    */
  private def applyMerges(w: Column, merges: Seq[(String, String)]): Column =
    merges.foldLeft(charSymbols(w)) { case (s, (a, b)) => mergePass(s, a, b) }

  /** SYMBOLIZE: each document's final symbol stream after applying a merge
    * table in training order — (doc, syms: array&lt;string&gt;), word symbol
    * runs concatenated in word order. Split artifacts (empty words from
    * repeated whitespace) drop, so every symbol is non-empty. One narrow
    * codegen'd map, no shuffle; the merge table is tokenizer CONFIG
    * (literals in the plan), not data.
    */
  def symbolize(df: DataFrame, textCol: String, idCol: String,
      merges: Seq[(String, String)]): DataFrame =
    df.select(col(idCol).as("doc"),
      graft.functions.BpeSymbols(col(textCol), merges).as("syms"))

  /** The composed higher-order-function spelling of [[symbolize]] — kept
    * as the equivalence witness for the native [[graft.functions.BpeSymbols]]
    * expression (BpeSpec pins element-equality): HOF lambdas evaluate
    * interpreted and the fold copies its accumulator per symbol, which
    * measured 23 s on the sf0.1 corpus vs sub-second for the native form.
    */
  private[graft] def symbolizeHof(df: DataFrame, textCol: String, idCol: String,
      merges: Seq[(String, String)]): DataFrame = {
    val words = filter(split(trim(col(textCol)), " "), w => w =!= "")
    df.select(col(idCol).as("doc"),
      flatten(transform(words, w => applyMerges(w, merges))).as("syms"))
  }

  /** Marked symbolize: each word's symbol run ends with `marker`
    * (Sennrich's `&lt;/w&gt;` terminal), which makes the stream LOSSLESSLY
    * decodable by [[decode]] — the classic BPE framing where word
    * boundaries are part of the alphabet. Merges never touch the marker
    * (it is appended after the fold), so segmentation equals the unmarked
    * [[symbolize]] plus terminals.
    */
  def symbolizeMarked(df: DataFrame, textCol: String, idCol: String,
      merges: Seq[(String, String)], marker: String = "</w>"): DataFrame =
    df.select(col(idCol).as("doc"),
      graft.functions.BpeSymbols.marked(col(textCol), merges, marker).as("syms"))

  /** DECODE a marked symbol stream back to text: concatenate the symbols
    * (merges change segmentation, never content, so the symbols spell the
    * original words exactly) and turn each terminal marker into a space.
    * Output equals the whitespace-normalized input — the lossless
    * tokenize→detokenize round trip `text_bpe_roundtrip` oracle-checks.
    */
  def decode(symbolized: DataFrame, marker: String = "</w>"): DataFrame =
    symbolized.select(col("doc"),
      rtrim(replace(concat_ws("", col("syms")), lit(marker), lit(" ")))
        .as("rebuilt_text"))

  /** The deterministic vocabulary of a symbolized corpus: DISTINCT final
    * symbols in lexicographic (binary) order, dense `token_id`s from 0 —
    * (token_id: int, symbol). Bounded by |charset| + |merges| by
    * construction (a final symbol is a base character or a fused merge
    * output), so the driver-side materialization is config-sized; `cap`
    * turns a violated assumption into a loud failure, not a silent
    * truncation.
    */
  def vocab(symbolized: DataFrame, cap: Int = 1 << 16): DataFrame = {
    val spark = symbolized.sparkSession
    import spark.implicits._
    val syms = symbolized.select(explode(col("syms")).as("s"))
      .distinct().orderBy("s").limit(cap + 1).as[String].collect()
    require(syms.length <= cap,
      s"BPE vocabulary exceeded $cap symbols — not a char+merge vocabulary")
    syms.toSeq.zipWithIndex.map { case (s, i) => (i, s) }
      .toDF("token_id", "symbol")
  }

  /** Token-ID encoding: (doc, token_ids: array&lt;int&gt;, n_tokens) — the
    * sequence a trainer's packing/shuffling stages consume. One native
    * codegen'd pass over the TEXT (tokenize + merge fold + vocabulary
    * lookup fused — [[graft.functions.BpeIds]]); the symbol→id map rides
    * the plan as a constant (the vocabulary is config-sized per [[vocab]]
    * — no broadcast join, no shuffle); a symbol missing from the
    * vocabulary raises instead of silently yielding null ids.
    */
  def tokenIds(df: DataFrame, textCol: String, idCol: String,
      merges: Seq[(String, String)], vocab: DataFrame): DataFrame = {
    val entries = vocab.select("symbol", "token_id").collect()
      .map(r => (r.getString(0), r.getInt(1))).toMap
    df.select(col(idCol).as("doc"),
        graft.functions.BpeIds(col(textCol), merges, entries).as("token_ids"))
      .withColumn("n_tokens", size(col("token_ids")).cast("long"))
  }

  /** Persist a tokenizer — the ORDERED merge table and the vocabulary —
    * as two tiny parquet tables under `root` (`merges/`, `vocab/`): the
    * artifact a training run ships so every downstream consumer (packing,
    * decontamination, serving) encodes with byte-identical ids. Both are
    * config-sized (hundreds of rows), written single-file.
    */
  def saveTokenizer(spark: org.apache.spark.sql.SparkSession, root: String,
      merges: Seq[(String, String)], vocab: DataFrame): Unit = {
    import spark.implicits._
    merges.zipWithIndex.map { case ((a, b), i) => (i + 1, a, b) }
      .toDF("rank", "left_sym", "right_sym")
      .coalesce(1).write.mode("overwrite").parquet(s"$root/merges")
    vocab.coalesce(1).write.mode("overwrite").parquet(s"$root/vocab")
  }

  /** Load a persisted tokenizer: (merges in training order, vocab frame).
    * BpeSpec pins the round trip — reloaded config encodes identically.
    */
  def loadTokenizer(spark: org.apache.spark.sql.SparkSession,
      root: String): (Seq[(String, String)], DataFrame) = {
    val m = spark.read.parquet(s"$root/merges").orderBy("rank")
      .select("left_sym", "right_sym")
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq
    (m, spark.read.parquet(s"$root/vocab"))
  }

  /** Train `rounds` BPE merges: returns (rank, left_sym, right_sym, freq)
    * in training order. Ties in a round break by (left, right) — a total
    * order, so the learned merge table is a pure function of the corpus.
    * Stops early if no pair remains (every word fused to one symbol).
    */
  def train(words: DataFrame, rounds: Int): Seq[(Int, String, String, Long)] = {
    val spark = words.sparkSession
    var sym = words.select(col("cnt"), charSymbols(col("word")).as("s"))
      .localCheckpoint(true)
    val merges = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    var r = 1
    var done = false
    while (r <= rounds && !done) {
      val top = pairStats(sym)
        .orderBy(desc("freq"), col("left_sym"), col("right_sym"))
        .limit(1).collect()
      if (top.isEmpty) done = true
      else {
        val (a, b, f) = (top.head.getString(0), top.head.getString(1),
          top.head.getLong(2))
        merges += ((r, a, b, f))
        val prev = sym
        sym = sym.select(col("cnt"), mergePass(col("s"), a, b).as("s"))
          .localCheckpoint(true)
        prev.unpersist()
        r += 1
      }
    }
    sym.unpersist()
    merges.toSeq
  }
}
