package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.operators.StringCache

/** Global string cache semantics (reference enable_string_cache): one
  * persisted dictionary, deterministic dense ids, consistent across every
  * table encoded against it, surviving reopen.
  */
class CategoricalSpec extends SparkSpec {
  import spark.implicits._

  test("ids are dense ranks over sorted distinct values; encode/decode round-trips") {
    val cache = StringCache.open(spark,
      Files.createTempDirectory("graft_cat1").toString)
    val nation = spark.read.parquet(s"${sf()}/nation.parquet")
    val enc = cache.encode(nation, "n_name")
    // dictionary: sorted names get ids 1..25
    val names = nation.select("n_name").as[String].collect().sorted
    val d = cache.dict.as[(String, Long)].collect().sortBy(_._2)
    assert(d.map(_._1).toSeq == names.toSeq)
    assert(d.map(_._2).toSeq == (1L to names.length.toLong).toSeq)
    // decode restores the exact original pairs
    val back = cache.decode(enc, "n_name")
      .select("n_nationkey", "n_name").as[(Long, String)].collect().toSet
    val orig = nation.select("n_nationkey", "n_name").as[(Long, String)].collect().toSet
    assert(back == orig)
  }

  test("encode/decode ids are unchanged when the dictionary cannot broadcast") {
    val nation = spark.read.parquet(s"${sf()}/nation.parquet")
    val rootA = Files.createTempDirectory("graft_cat_bc").toString
    val baseline = StringCache.open(spark, rootA).encode(nation, "n_name")
      .select("n_nationkey", "n_name").as[(Long, Long)].collect().toSet

    // Kill BOTH broadcast routes: the planner's (autoBroadcastJoinThreshold)
    // and the cache's own hint (broadcastMaxRows=0). The encode join must
    // degrade to a shuffle join and produce the identical ids.
    val saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.graft.cat.broadcastMaxRows", "0")
    try {
      val rootB = Files.createTempDirectory("graft_cat_bc2").toString
      val cache = StringCache.open(spark, rootB)
      val enc = cache.encode(nation, "n_name")
      // The pre-AQE physical plan must NOT contain a broadcast join — this
      // pins that a dictionary past the hint threshold degrades instead of
      // forcing a driver-sized build.
      assert(!enc.queryExecution.sparkPlan.toString.contains("BroadcastHashJoin"),
        enc.queryExecution.sparkPlan.toString)
      val got = enc.select("n_nationkey", "n_name").as[(Long, Long)].collect().toSet
      assert(got == baseline)
      // decode round-trips through the same shuffle-join path
      val back = cache.decode(enc, "n_name")
        .select("n_nationkey", "n_name").as[(Long, String)].collect().toSet
      val orig = nation.select("n_nationkey", "n_name").as[(Long, String)].collect().toSet
      assert(back == orig)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)
      spark.conf.unset("spark.graft.cat.broadcastMaxRows")
    }
  }

  test("cross-table consistency and deterministic extension; cache persists across reopen") {
    val root = Files.createTempDirectory("graft_cat2").toString
    val c1 = StringCache.open(spark, root)
    val a = Seq("cherry", "apple", "banana").toDF("fruit")
    val encA = c1.encode(a, "fruit")
    assert(c1.size == 3)
    // sorted: apple=1, banana=2, cherry=3
    val idsA = encA.select("fruit").as[Long].collect().toSet
    assert(idsA == Set(3L, 1L, 2L))

    // reopened handle sees the same dictionary; overlapping values keep
    // their ids, unseen values continue after the max
    val c2 = StringCache.open(spark, root)
    assert(c2.size == 3)
    val b = Seq("banana", "apple", "elderberry", "date").toDF("fruit")
    val added = c2.extend(b, "fruit")
    assert(added == 2) // date, elderberry
    val d = c2.dict.as[(String, Long)].collect().toMap
    assert(d == Map("apple" -> 1L, "banana" -> 2L, "cherry" -> 3L,
      "date" -> 4L, "elderberry" -> 5L))
    // two frames encoded against the same cache agree on ids (joinable)
    val encB = c2.encode(b, "fruit")
    val common = encA.select(col("fruit").as("id"))
      .intersect(encB.select(col("fruit").as("id")))
      .as[Long].collect().toSet
    assert(common == Set(1L, 2L)) // apple, banana shared
    // nulls stay null
    val withNull = Seq(Some("apple"), None).toDF("fruit")
    val encN = c2.encode(withNull, "fruit")
    assert(encN.select("fruit").as[Option[Long]].collect().toSet == Set(Some(1L), None))
  }
}
