package graft

import org.apache.spark.sql.functions._

import graft.operators.Bpe

/** BPE merge training: the classic planted corpus learns the textbook
  * merges in the textbook order; the merge pass applies greedily
  * left-to-right; round 1 agrees with the oracle-checked pair stats.
  */
class BpeSpec extends SparkSpec {

  import spark.implicits._

  test("planted corpus learns ug, un, hug in order (the textbook example)") {
    // hug×10, pug×5, pun×12, bun×4, hugs×5 — round-1 pairs: ug=20, pu=17,
    // un=16, hu=15 → merge (u,g). Round 2: un=16 wins. Round 3: h+ug=15.
    val words = Seq(("hug", 10L), ("pug", 5L), ("pun", 12L), ("bun", 4L),
      ("hugs", 5L)).toDF("word", "cnt")
    val merges = Bpe.train(words, 3)
    assert(merges == Seq(
      (1, "u", "g", 20L), (2, "u", "n", 16L), (3, "h", "ug", 15L)), merges)
  }

  test("merge pass is greedy left-to-right; fused symbols seed later merges") {
    val df = Seq(Seq("a", "b", "a", "b", "c")).toDF("s")
    val out = df.select(Bpe.mergePass(col("s"), "a", "b")).head().getSeq[String](0)
    assert(out == Seq("ab", "ab", "c"))
    // the fused symbol participates as the LEFT of a later round's merge
    val df2 = Seq(Seq("ab", "c", "ab", "c")).toDF("s")
    val out2 = df2.select(Bpe.mergePass(col("s"), "ab", "c")).head().getSeq[String](0)
    assert(out2 == Seq("abc", "abc"))
    // overlapping occurrences never double-consume: a a a -> aa a
    val df3 = Seq(Seq("a", "a", "a")).toDF("s")
    val out3 = df3.select(Bpe.mergePass(col("s"), "a", "a")).head().getSeq[String](0)
    assert(out3 == Seq("aa", "a"))
  }

  test("encode applies the merge table in training order, per word") {
    val words = Seq(("hug", 10L), ("pug", 5L), ("pun", 12L), ("bun", 4L),
      ("hugs", 5L)).toDF("word", "cnt")
    val merges = Bpe.train(words, 3) // (u,g), (u,n), (h,ug)
    // "hug pun hugs" -> hug=[hug](1), pun=[p,un](2), hugs=[hug,s](2) -> 5
    val docs = Seq((1L, "hug pun hugs"), (2L, "bun")).toDF("doc_id", "text")
    val out = Bpe.encode(docs, "text", "doc_id", merges)
      .orderBy("doc").as[(Long, Long, Long)].collect().toSeq
    assert(out == Seq((1L, 3L, 5L), (2L, 1L, 2L)), out.toString)
    // zero merges degrade to character count
    val none = Bpe.encode(docs, "text", "doc_id", Nil)
      .orderBy("doc").as[(Long, Long, Long)].collect().toSeq
    assert(none.head._3 == 10L) // h u g p u n h u g s
  }

  test("symbolize + vocab + tokenIds: dense ids, loud on unknown symbols") {
    val merges = Seq(("t", "a"), ("ta", "b"), ("l", "e"), ("tab", "le"))
    val docs = Seq((1L, "table tale"), (2L, "bat")).toDF("doc_id", "text")
    val symd = Bpe.symbolize(docs, "text", "doc_id", merges)
    val syms = symd.orderBy("doc").as[(Long, Seq[String])].collect().toSeq
    // table -> [t,a,b,l,e] -> [ta,b,l,e] -> [tab,l,e] -> [tab,le] -> [table]
    // tale  -> [ta,le]; bat -> [b,a,t] (no adjacent merge fires)
    assert(syms == Seq((1L, Seq("table", "ta", "le")), (2L, Seq("b", "a", "t"))), syms)
    val voc = Bpe.vocab(symd)
    val entries = voc.orderBy("token_id").as[(Int, String)].collect().toSeq
    // lexicographic: a, b, le, t, ta, table
    assert(entries == Seq((0, "a"), (1, "b"), (2, "le"), (3, "t"),
      (4, "ta"), (5, "table")), entries)
    val ids = Bpe.tokenIds(docs, "text", "doc_id", merges, voc).orderBy("doc")
      .select("doc", "token_ids", "n_tokens")
      .as[(Long, Seq[Int], Long)].collect().toSeq
    assert(ids == Seq((1L, Seq(5, 4, 2), 3L), (2L, Seq(1, 0, 3), 3L)), ids)
    // a vocabulary that does not cover the corpus fails loudly, never null
    val tinyVoc = Seq((0, "a")).toDF("token_id", "symbol")
    val err = intercept[Exception] {
      Bpe.tokenIds(docs, "text", "doc_id", merges, tinyVoc).collect()
    }
    assert(err.getMessage.contains("not in vocabulary"), err.getMessage)
    // the native expression equals the composed HOF spelling on the corpus
    val d = spark.read.parquet(s"${sf()}/documents.parquet")
    val fast = Bpe.symbolize(d, "text", "doc_id", merges)
    val hof = Bpe.symbolizeHof(d, "text", "doc_id", merges)
      .withColumnRenamed("syms", "syms2")
    val ne = fast.join(hof, "doc").filter(col("syms") =!= col("syms2")).count()
    assert(ne == 0, "native BpeSymbols diverges from the HOF form")
    // empty/whitespace-only text encodes to an empty sequence, not a crash
    val empty = Bpe.symbolize(Seq((9L, "  ")).toDF("doc_id", "text"),
      "text", "doc_id", merges).as[(Long, Seq[String])].head()
    assert(empty == ((9L, Seq.empty[String])))
  }

  test("tokenizer save/load round trip encodes identically") {
    val merges = Seq(("t", "a"), ("ta", "b"), ("l", "e"), ("tab", "le"))
    val docs = Seq((1L, "table tale"), (2L, "bat")).toDF("doc_id", "text")
    val voc = Bpe.vocab(Bpe.symbolize(docs, "text", "doc_id", merges))
    val root = java.nio.file.Files.createTempDirectory("graft_bpe_tok").toString
    Bpe.saveTokenizer(spark, root, merges, voc)
    val (m2, v2) = Bpe.loadTokenizer(spark, root)
    assert(m2 == merges)
    val a = Bpe.tokenIds(docs, "text", "doc_id", merges, voc)
      .orderBy("doc").select("token_ids").as[Seq[Int]].collect().toSeq
    val b = Bpe.tokenIds(docs, "text", "doc_id", m2, v2)
      .orderBy("doc").select("token_ids").as[Seq[Int]].collect().toSeq
    assert(a == b)
  }

  test("packCounts on BPE n_tokens agrees with packSequences on the proxy") {
    val d = spark.read.parquet(s"${sf()}/documents.parquet")
    // whitespace proxy through packCounts == packSequences (same engine)
    val proxy = graft.operators.TextAnalysis.packSequences(
      d, "text", "doc_id", budgetTokens = 512, nShards = 4)
    val viaCounts = graft.operators.TextAnalysis.packCounts(
      d.select(col("doc_id"),
        graft.operators.TextAnalysis.tokenCount(col("text")).as("n")),
      "doc_id", "n", budgetTokens = 512, nShards = 4)
    assert(proxy.exceptAll(viaCounts).isEmpty && viaCounts.exceptAll(proxy).isEmpty)
    // BPE counts: merges only ever SHRINK a word's symbol count, and pack
    // assignments stay a pure function of the counts
    val merges = Seq(("t", "a"), ("ta", "b"), ("l", "e"), ("tab", "le"), ("e", "r"))
    val symd = Bpe.symbolize(d, "text", "doc_id", merges)
    val ids = Bpe.tokenIds(d, "text", "doc_id", merges, Bpe.vocab(symd))
    val chars = Bpe.symbolize(d, "text", "doc_id", Nil)
      .select(col("doc"), size(col("syms")).cast("long").as("n_chars"))
    val grew = ids.join(chars, "doc").filter(col("n_tokens") > col("n_chars")).count()
    assert(grew == 0)
  }

  test("round 1 on the corpus equals the oracle-checked pair-stat argmax") {
    val d = spark.read.parquet(s"${sf()}/documents.parquet")
    val words = Bpe.wordCounts(d, "text")
    val top = Bpe.pairStats(words.withColumn("s", Bpe.charSymbols(col("word"))))
      .orderBy(desc("freq"), col("left_sym"), col("right_sym"))
      .limit(1).head()
    val merges = Bpe.train(words, 1)
    assert(merges.head == ((1, top.getString(0), top.getString(1), top.getLong(2))))
    // training exhausts cleanly when every word fuses to one symbol
    val tiny = Seq(("ab", 3L)).toDF("word", "cnt")
    assert(Bpe.train(tiny, 5) == Seq((1, "a", "b", 3L)))
  }
}
