package graft

import org.apache.spark.sql.functions._

import graft.lake.LakeServer
import graft.model.TableName

/** End-to-end service flow mirroring the reference's client drivers
  * (reference: call.py:27-79, taxi.py:36-61 — create, chunked
  * insert/upsert, materialize, info, select).
  */
class ServerSpec extends SparkSpec {
  import spark.implicits._

  test("create -> info -> chunked upsert -> materialize -> select round-trip") {
    val srv = new LakeServer(spark)
    val o = spark.read.parquet(s"${sf()}/orders.parquet")
    val t = TableName("test", "srv_orders")

    srv.createTable(t, Iterator(o), partitions = Seq("o_orderstatus"))
    val info0 = srv.getTableInfo(t)
    assert(info0.rows == o.count())
    assert(info0.parts == 3)
    assert(info0.columns.exists(_ == ("o_totalprice", "double")))

    val delta = o.filter(col("o_orderkey") % 4 === 0)
      .withColumn("o_totalprice", col("o_totalprice") + 1)
    srv.upsertTable(t, Seq("o_orderkey"),
      Iterator(delta.limit(100), delta.filter(col("o_orderkey") > 400)))
    srv.materializeTable(t)

    val n = srv.select("SELECT COUNT(*) AS n FROM srv_orders").head().getLong(0)
    assert(n == o.count(), "upsert of existing keys must not change row count")

    val res = srv.selectMany(Seq(
      "SELECT COUNT(*) AS n FROM srv_orders",
      "SELECT COUNT(*) AS n FROM srv_orders"))
    assert(res.size == 1, "identical SQL deduped")
  }

  test("ingestStream verb upserts micro-batches and refreshes the SQL view") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val srv = new LakeServer(spark)
    val o = spark.read.parquet(s"${sf()}/orders.parquet")
    val t = TableName("test", "stream_orders")
    srv.createTable(t, Iterator(o), partitions = Seq("o_orderstatus"))

    val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Long]
    // Stream-static join: the stream carries keys, the static table the rows.
    val deltas = mem.toDF().toDF("delta_key")
      .join(o, col("delta_key") === col("o_orderkey"))
      .drop("delta_key")
      .withColumn("o_totalprice", col("o_totalprice") + 1000000000d)
    val q = srv.ingestStream(t, deltas, keys = Some(Seq("o_orderkey")))
    val keys = o.select("o_orderkey").as[Long].take(5)
    try {
      mem.addData(keys.toSeq)
      q.processAllAvailable()
    } finally q.stop()
    val bumped = srv.select(
      s"SELECT COUNT(*) AS n FROM ${t.handle} WHERE o_totalprice > 500000000").head().getLong(0)
    assert(bumped == keys.length)
    assert(srv.select(s"SELECT COUNT(*) AS n FROM ${t.handle}").head().getLong(0) == o.count())
  }

  test("ingest into unknown table fails cleanly") {
    val srv = new LakeServer(spark)
    intercept[NoSuchElementException] {
      srv.insertTable(TableName("test", "nope"), Iterator(Seq(1).toDF("x")))
    }
  }

  test("HLL sketch union estimate within 5% of exact (q28 contract)") {
    val li = spark.read.parquet(s"${sf()}/lineitem.parquet")
    val est = li.groupBy("l_returnflag")
      .agg(expr("hll_sketch_agg(l_partkey)").as("sk"))
      .agg(expr("hll_sketch_estimate(hll_union_agg(sk))")).head().getLong(0).toDouble
    val exact = li.agg(countDistinct(col("l_partkey"))).head().getLong(0).toDouble
    assert(math.abs(est - exact) / exact < 0.05, s"est=$est exact=$exact")
  }

  test("approx_count_distinct within 5% of exact (q24 contract)") {
    val li = spark.read.parquet(s"${sf()}/lineitem.parquet")
    val r = li.agg(
      approx_count_distinct("l_partkey").as("approx"),
      countDistinct(col("l_partkey")).as("exact")).head()
    val (approx, exact) = (r.getLong(0).toDouble, r.getLong(1).toDouble)
    assert(math.abs(approx - exact) / exact < 0.05, s"approx=$approx exact=$exact")
  }
}
