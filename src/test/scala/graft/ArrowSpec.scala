package graft

import org.apache.spark.sql.functions._

import graft.lake.LakeServer
import graft.model.TableName
import graft.sources.ArrowInterchange

class ArrowSpec extends SparkSpec {
  import spark.implicits._

  test("IPC round-trip preserves schema, values, and nulls") {
    val df = Seq(
      (1L, Some(1.5), Some("a"), Some(true)),
      (2L, None, None, None))
      .toDF("k", "d", "s", "b")
      .withColumn("ts", lit("2024-03-01 12:34:56.789").cast("timestamp"))
      .withColumn("bin", col("s").cast("binary"))
    val bytes = ArrowInterchange.toIpcBytes(df)
    assert(bytes.length > 0)
    val back = ArrowInterchange.fromIpcBytes(spark, bytes)
    assert(back.schema.map(f => (f.name, f.dataType)) ==
      df.schema.map(f => (f.name, f.dataType)))
    assert(back.orderBy("k").collect().toSeq == df.orderBy("k").collect().toSeq)
  }

  test("IPC round-trip on a real table slice") {
    val o = spark.read.parquet(s"${sf()}/orders.parquet").limit(200)
    val back = ArrowInterchange.fromIpcBytes(spark, ArrowInterchange.toIpcBytes(o))
    assert(back.count() == 200)
    val a = o.agg(sum(col("o_totalprice").cast("decimal(38,2)"))).head().getDecimal(0)
    val b = back.agg(sum(col("o_totalprice").cast("decimal(38,2)"))).head().getDecimal(0)
    assert(a == b)
  }

  test("compressed IPC (zstd/lz4) round-trips and compresses real data") {
    val o = spark.read.parquet(s"${sf()}/orders.parquet").limit(500)
    val plain = ArrowInterchange.toIpcBytes(o)
    Seq("zstd", "lz4").foreach { c =>
      val packed = ArrowInterchange.toIpcBytes(o, Some(c))
      // Real text-bearing rows compress; the codec rides in batch metadata.
      assert(packed.length < plain.length, s"$c did not shrink the stream")
      val back = ArrowInterchange.fromIpcBytes(spark, packed)
      assert(back.orderBy("o_orderkey").collect().toSeq ==
        o.orderBy("o_orderkey").collect().toSeq)
    }
    intercept[IllegalArgumentException](ArrowInterchange.toIpcBytes(o, Some("gzip")))
  }

  test("server ingests IPC chunks and serves IPC results") {
    val srv = new LakeServer(spark)
    val o = spark.read.parquet(s"${sf()}/orders.parquet")
    srv.createTable(TableName("test", "ipc_orders"), Iterator(o))
    val delta = o.filter(col("o_orderkey") % 5 === 0)
      .withColumn("o_totalprice", col("o_totalprice") + 10)
    srv.upsertTableIpc(TableName("test", "ipc_orders"), Seq("o_orderkey"),
      Iterator(ArrowInterchange.toIpcBytes(delta)))
    val resultBytes = srv.selectIpc("SELECT COUNT(*) AS n FROM ipc_orders")
    val n = ArrowInterchange.fromIpcBytes(spark, resultBytes).head().getLong(0)
    assert(n == o.count())
  }

  test("raw-TCP Arrow IPC ingest upserts over a socket (reference main.rs path)") {
    import graft.lake.TcpIngestServer
    val srv = new LakeServer(spark)
    val base = Seq((1L, 10.0), (2L, 20.0), (3L, 30.0)).toDF("k", "v")
    val t = TableName("test", "tcp_t")
    srv.createTable(t, Iterator(base))
    val tcp = new TcpIngestServer(srv, t, Seq("k"))
    try {
      val delta = Seq((2L, 222.0), (9L, 90.0)).toDF("k", "v")
      val conn = new java.net.Socket("127.0.0.1", tcp.boundPort)
      try {
        conn.getOutputStream.write(ArrowInterchange.toIpcBytes(delta))
        conn.getOutputStream.flush()
      } finally conn.close()
      // the handler applies the upsert asynchronously after producer close
      val deadline = System.nanoTime() + 30_000_000_000L
      def merged: Seq[(Long, Double)] = {
        srv.db.refresh(t.handle)
        srv.select(s"SELECT k, v FROM ${t.handle} ORDER BY k")
          .as[(Long, Double)].collect().toSeq
      }
      while (merged != Seq((1L, 10.0), (2L, 222.0), (3L, 30.0), (9L, 90.0)) &&
          System.nanoTime() < deadline) Thread.sleep(100)
      assert(merged == Seq((1L, 10.0), (2L, 222.0), (3L, 30.0), (9L, 90.0)))
    } finally tcp.close()
  }

  test("multi-batch streamed encode: bounded batches, exact round-trip, count") {
    // 3× BatchRows + a remainder → 4 record batches through toLocalIterator;
    // the driver only ever holds one batch of vectors.
    val n = ArrowInterchange.BatchRows * 3 + 17
    val df = spark.range(n.toLong).select(
      col("id").as("k"), (col("id") % 1000).cast("double").as("v"),
      concat(lit("s"), col("id")).as("s"))
    val (bytes, rows) = ArrowInterchange.toIpcBytesWithCount(df, Some("zstd"))
    assert(rows == n.toLong)
    // Batch count is visible to any IPC reader — pin it to prove the stream
    // really is multiple batches, not one giant allocation.
    val reader = new org.apache.arrow.vector.ipc.ArrowStreamReader(
      new java.io.ByteArrayInputStream(bytes), new org.apache.arrow.memory.RootAllocator(),
      org.apache.arrow.compression.CommonsCompressionFactory.INSTANCE)
    var batches = 0
    while (reader.loadNextBatch()) batches += 1
    reader.close()
    assert(batches == 4, s"expected 4 record batches, got $batches")
    val (back, backRows) = ArrowInterchange.fromIpcBytesWithCount(spark, bytes)
    assert(backRows == n.toLong)
    assert(back.agg(sum(col("k"))).head().getLong(0) == (n.toLong - 1) * n.toLong / 2)
    assert(back.filter(col("s") === s"s${n - 1}").count() == 1)
  }

  test("executor-parallel encode: partitions serialize their own batches, exact round-trip") {
    val n = 40000L
    val df = spark.range(n).repartition(6).select(
      col("id").as("k"), (col("id") % 7).cast("double").as("v"),
      concat(lit("p"), col("id")).as("s"))
    val (bytes, rows) =
      org.apache.spark.sql.graftbridge.ArrowParallel.toIpcBytesDistributed(df, batchRows = 4096)
    assert(rows == n)
    // executors compress their own batches — the stream must be smaller
    // than the uncompressed form of the same data
    val (plain, _) = org.apache.spark.sql.graftbridge.ArrowParallel
      .toIpcBytesDistributed(df, batchRows = 4096, codec = None)
    assert(bytes.length < plain.length,
      s"zstd stream ${bytes.length} not smaller than plain ${plain.length}")
    // every partition contributed at least one framed batch
    val reader = new org.apache.arrow.vector.ipc.ArrowStreamReader(
      new java.io.ByteArrayInputStream(bytes), new org.apache.arrow.memory.RootAllocator(),
      org.apache.arrow.compression.CommonsCompressionFactory.INSTANCE)
    var batches = 0
    var seen = 0L
    while (reader.loadNextBatch()) {
      batches += 1
      seen += reader.getVectorSchemaRoot.getRowCount
    }
    reader.close()
    assert(seen == n)
    assert(batches >= 6, s"expected >=6 batches (one per partition), got $batches")
    // our own reader decodes the concatenated stream like any other
    val (back, backRows) = ArrowInterchange.fromIpcBytesWithCount(spark, bytes)
    assert(backRows == n)
    assert(back.agg(sum(col("k"))).head().getLong(0) == (n - 1) * n / 2)
  }

  test("selectIpc switches to the parallel encoder above the row threshold") {
    import graft.lake.LakeServer
    import graft.model.TableName
    val srv = new LakeServer(spark)
    val t = TableName("public", "graft_wire_big")
    srv.createTable(t, Iterator(spark.range(5000).selectExpr("id AS k", "id * 2 AS v")))
    spark.conf.set("spark.graft.wire.parallelEncodeRows", "1000")
    try {
      val bytes = srv.selectIpc("SELECT k, v FROM graft_wire_big")
      val (back, rows) = ArrowInterchange.fromIpcBytesWithCount(spark, bytes)
      assert(rows == 5000L)
      assert(back.agg(sum(col("v"))).head().getLong(0) == 4999L * 5000L)
    } finally spark.conf.unset("spark.graft.wire.parallelEncodeRows")
  }

  test("unsupported nested type rejected cleanly") {
    val df = Seq(Tuple1(Seq(1, 2))).toDF("arr")
    intercept[IllegalArgumentException] { ArrowInterchange.toIpcBytes(df) }
  }
}
