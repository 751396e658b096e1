package graft

import graft.operators.Joins

/** [[Joins.fuzzyJoin]] / [[Joins.fuzzySelfPairs]] — deletion-neighborhood
  * (SymSpell) edit-distance join. The `fuzzy_join_names` gate checks the
  * k=1 self-join against DuckDB's INDEPENDENT all-pairs levenshtein at
  * sf0.01; this suite pins completeness against a driver-computed naive
  * ground truth (including k=2), the edit-type cases, and the edge cases.
  */
class FuzzyJoinSpec extends SparkSpec {
  import spark.implicits._

  /** Naive O(n²) Levenshtein on the driver — ground truth for tiny sets. */
  private def lev(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  private def naivePairs(ss: Seq[String], k: Int): Set[(String, String, Int)] =
    (for {
      a <- ss; b <- ss
      if a < b
      d = lev(a, b)
      if d <= k
    } yield (a, b, d)).toSet

  private val words = Seq(
    "kitten", "sitten", "siting", "sitting", "mitten", "mittens",
    "cat", "cats", "bat", "at", "a", "", "hello", "hallo", "hell",
    "world", "word", "work", "fork")

  test("k=1 self-pairs equal the naive all-pairs ground truth") {
    val df = words.toDF("w")
    val got = Joins.fuzzySelfPairs(df, "w", maxDist = 1)
      .as[(String, String, Int)].collect().toSet
    assert(got == naivePairs(words, 1))
  }

  test("k=2 self-pairs equal the naive all-pairs ground truth") {
    val df = words.toDF("w")
    val got = Joins.fuzzySelfPairs(df, "w", maxDist = 2)
      .as[(String, String, Int)].collect().toSet
    assert(got == naivePairs(words, 2))
  }

  test("substitution, insertion and deletion all candidate through deletes") {
    val l = Seq("abc").toDF("s")
    val r = Seq("xbc", "abxc", "ab", "abc", "zzz").toDF("s")
    val got = Joins.fuzzyJoin(l, "s", r, "s", maxDist = 1)
      .as[(String, String, Int)].collect().toSet
    assert(got == Set(("abc", "xbc", 1), ("abc", "abxc", 1),
      ("abc", "ab", 1), ("abc", "abc", 0)))
  }

  test("two-frame join: no same-string requirement, nulls dropped") {
    val l = Seq(Some("mail"), None).toDF("a")
    val r = Seq("mall", "mailx", "nope").toDF("b")
    val got = Joins.fuzzyJoin(l, "a", r, "b", maxDist = 1)
      .as[(String, String, Int)].collect().toSet
    assert(got == Set(("mail", "mall", 1), ("mail", "mailx", 1)))
  }

  test("empty string pairs only with length-<=k strings") {
    val df = Seq("", "a", "ab", "abc").toDF("w")
    val got1 = Joins.fuzzySelfPairs(df, "w", maxDist = 1)
      .as[(String, String, Int)].collect().toSet
    assert(got1 == naivePairs(Seq("", "a", "ab", "abc"), 1))
    val got2 = Joins.fuzzySelfPairs(df, "w", maxDist = 2)
      .as[(String, String, Int)].collect().toSet
    assert(got2 == naivePairs(Seq("", "a", "ab", "abc"), 2))
  }

  test("maxDist outside 1..2 is rejected loudly") {
    val df = Seq("x").toDF("w")
    intercept[IllegalArgumentException] {
      Joins.fuzzySelfPairs(df, "w", maxDist = 3)
    }
    intercept[IllegalArgumentException] {
      Joins.fuzzySelfPairs(df, "w", maxDist = 0)
    }
  }

  test("no cartesian/nested-loop join in the plan") {
    val df = words.toDF("w")
    val plan = Joins.fuzzySelfPairs(df, "w", maxDist = 1)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
  }
}
