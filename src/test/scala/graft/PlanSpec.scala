package graft

/** Physical-plan assertions for headline queries — the ".explain and iterate"
  * contract: broadcasts where a side is small, pushdown/pruning reaching the
  * scans, no exchange where none is needed.
  */
class PlanSpec extends SparkSpec {

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sf()).queryExecution.executedPlan.toString

  /** Columns of the (single) parquet ReadSchema in the plan. */
  private def readSchemaCols(p: String): Set[String] = {
    val re = "ReadSchema: struct<([^>]*)>".r
    re.findFirstMatchIn(p).map(_.group(1)).getOrElse("")
      .split(",").map(_.trim.takeWhile(_ != ':')).filter(_.nonEmpty).toSet
  }

  test("q03: dimension side broadcast joined") {
    val p = plan("q03_top_orders")
    assert(p.contains("BroadcastHashJoin"), s"expected broadcast join:\n$p")
  }

  test("q05: supplier and nation broadcast joined") {
    val p = plan("q05_revenue_by_nation")
    assert(p.split("BroadcastHashJoin").length >= 3,
      s"expected >=2 broadcast joins:\n$p")
  }

  test("q02: filter pushed to parquet, projection pruned, no exchange") {
    val p = plan("q02_filter_pushdown")
    assert(p.contains("PushedFilters: [IsNotNull(l_quantity)"), s"no pushdown:\n$p")
    assert(!p.contains("Exchange"), s"filter+project must not shuffle:\n$p")
    assert(readSchemaCols(p) ==
      Set("l_orderkey", "l_linenumber", "l_partkey", "l_quantity", "l_returnflag"),
      s"scan must read only projected+filter columns, got ${readSchemaCols(p)}")
  }

  test("q06: scan reads only the filter/agg columns") {
    val p = plan("q06_forecast_revenue")
    // plan toString truncates long filter lists — match the stable prefix
    assert(p.contains("GreaterThanOrEqual(l_shipda"), s"shipdate filter not pushed:\n$p")
    assert(readSchemaCols(p) ==
      Set("l_quantity", "l_extendedprice", "l_discount", "l_shipdate"),
      s"column pruning failed, got ${readSchemaCols(p)}")
  }

  test("q01: partial+final hash aggregate, single data shuffle (plus sort)") {
    val p = plan("q01_pricing_summary")
    assert(p.split("HashAggregate").length >= 3, s"expected partial+final agg:\n$p")
    // one shuffle for the aggregate, one range exchange for the orderBy — no more
    val exchanges = "Exchange (hashpartitioning|rangepartitioning)".r.findAllIn(p).size
    assert(exchanges <= 2, s"expected <=2 exchanges, got $exchanges:\n$p")
  }

  test("whole-stage codegen covers the scan-filter-project pipeline") {
    val p = plan("q02_filter_pushdown")
    assert(p.contains("*(1)"), s"no whole-stage codegen span:\n$p")
  }

  test("curate_domain_cap: blocklist broadcasts as anti-join; cap rides WindowGroupLimit") {
    val p = plan("curate_domain_cap")
    assert(p.contains("BroadcastHashJoin") && p.contains("LeftAnti"),
      s"blocklist should broadcast anti-join:\n$p")
    assert(p.contains("WindowGroupLimit"),
      s"per-domain cap should push the rank limit into map tasks:\n$p")
  }

  test("asof_join: one data shuffle (the window), no join operator at all") {
    val p = plan("asof_join")
    val dataExchanges = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(dataExchanges == 1, s"expected exactly 1 hash exchange, got $dataExchanges:\n$p")
    assert(!p.contains("Join"), s"union+running-last formulation must not plan a join:\n$p")
  }

  test("range_join: equi-join on the grid bin, never an inequality plan") {
    val p = plan("range_join")
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin") ||
      p.contains("BroadcastHashJoin"), s"expected an equi-join operator:\n$p")
  }

  test("lake_sql_zone_pruning: the SQL plan unions only zone-overlapping parts") {
    // sf0.01: orderkeys 0-14999 → 3 o_batch cells; the queried range
    // 1000-2000 lives in batch 0 alone. sf0.001 has a single cell, so the
    // assertion only bites at this scale.
    val dir = sf("sf0.01")
    val ds = graft.Fixtures.ordersZoneLake(spark, dir)
    val q = SparkEntry.queries("lake_sql_zone_pruning")(spark, dir)
    val leaves = q.queryExecution.optimizedPlan.collectLeaves().size
    assert(leaves == 1 && ds.numParts == 3,
      s"SQL zone pruning planned $leaves of ${ds.numParts} parts:\n" +
        q.queryExecution.optimizedPlan.treeString)
  }

  test("lake_sql_in_pruning: per-value IN prune skips the parts BETWEEN the values") {
    // sf0.01: 4 o_batch cells (0-3); IN (0, 3) must skip cells 1 and 2 — a
    // covering-interval prune would keep all four.
    val dir = sf("sf0.01")
    val ds = graft.Fixtures.ordersZoneLake4(spark, dir)
    val q = SparkEntry.queries("lake_sql_in_pruning")(spark, dir)
    val leaves = q.queryExecution.optimizedPlan.collectLeaves().size
    assert(leaves == 2 && ds.numParts == 4,
      s"SQL IN pruning planned $leaves of ${ds.numParts} parts:\n" +
        q.queryExecution.optimizedPlan.treeString)
  }

  test("lake_sql_part_pruning: partition+bucket equality keeps one cell") {
    val q = SparkEntry.queries("lake_sql_part_pruning")(spark, sf())
    val leaves = q.queryExecution.optimizedPlan.collectLeaves().size
    val total = graft.Fixtures.lineitemLake(spark, sf()).numParts
    assert(leaves == 1 && total > 1,
      s"SQL part pruning planned $leaves of $total parts:\n" +
        q.queryExecution.optimizedPlan.treeString)
  }

  test("persisted IVF probe plans exactly nprobe inverted-list directories") {
    val index = graft.Fixtures.ivfLake(spark, sf())
    val e = spark.read.parquet(s"${sf()}/embeddings.parquet")
    val q = e.filter(org.apache.spark.sql.functions.col("vec_id") === 0)
      .head().getSeq[Float](1).toSeq
    val probe = graft.operators.Similarity.ivfTopKLake(index, "embedding", "vec_id", q, 10, 4)
    val leaves = probe.queryExecution.optimizedPlan.collectLeaves().size
    assert(leaves == 4 && index.assigned.numParts == 16,
      s"probe planned $leaves of ${index.assigned.numParts} lists")
  }

  test("disk-resident pruned probe plans ONE multi-path scan, not a union of parts") {
    import org.apache.spark.sql.execution.datasources.LogicalRelation
    val root = java.nio.file.Files.createTempDirectory("graft_mp_plan").toString
    val ds = graft.lake.LakeDataset.fromDataFrame(spark,
      spark.range(1000).selectExpr("id AS k", "id % 10 AS part", "id * 2 AS v"),
      partitionCols = Seq("part"),
      storage = Some(graft.model.StorageSpec(root)))
    ds.toStorage()
    val loaded = graft.lake.LakeDataset.fromStorage(spark, root)
    // A 3-value IN probe keeps 3 of 10 disk-resident cells: the plan must
    // be ONE file-scan relation over exactly those directories — at
    // batches × buckets cells a union of per-part views costs more driver
    // analysis than the read (the incremental-index probe profile).
    val probe = loaded.prunedByConstraints(Map.empty, Map.empty,
      Map("part" -> Seq(1L, 4L, 7L)))
    val plan = probe.queryExecution.optimizedPlan
    assert(plan.collectLeaves().size == 1,
      s"expected one multi-path leaf:\n${plan.treeString}")
    val files = plan.collect { case lr: LogicalRelation => lr }
      .flatMap(_.relation.asInstanceOf[org.apache.spark.sql.execution.datasources.HadoopFsRelation]
        .location.inputFiles)
    val dirs = files.map(f => f.split('/').init.last).toSet
    assert(dirs == Set("part=1", "part=4", "part=7"),
      s"scan must cover exactly the kept cells, got $dirs")
    assert(probe.agg(org.apache.spark.sql.functions.sum("v")).head().getLong(0) ==
      (0L until 1000L).filter(i => Set(1L, 4L, 7L)(i % 10)).map(_ * 2).sum)
  }

  test("decontaminate broadcasts the benchmark gram set; packing windows per shard") {
    import org.apache.spark.sql.functions.col
    val docs = Fixtures.table(spark, sf(), "documents")
    val deconPlan = graft.operators.Dedup.decontaminate(
      docs, docs.filter(col("doc_id") % 50 === 0), "text", "doc_id")
      .queryExecution.executedPlan.toString
    assert(deconPlan.contains("BroadcastHashJoin"),
      s"benchmark grams must broadcast (corpus side never reshuffles for the match):\n$deconPlan")
    val packPlan = graft.operators.TextAnalysis.packSequences(
      docs, "text", "doc_id", budgetTokens = 2048, nShards = 8)
      .queryExecution.executedPlan.toString
    assert(packPlan.contains("windowspecdefinition(shard#"),
      s"packing must window PER SHARD, never globally:\n$packPlan")
  }

  test("string-cache encode broadcasts the dictionary; data side does not shuffle") {
    val root = java.nio.file.Files.createTempDirectory("graft_cat_plan").toString
    val cache = graft.operators.StringCache.open(spark, root)
    val enc = cache.encode(
      spark.read.parquet(s"${sf()}/orders.parquet"), "o_orderpriority")
    val p = enc.queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"), s"expected broadcast encode join:\n$p")
    val dataExchanges = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(dataExchanges == 0, s"encode must not shuffle the data side:\n$p")
  }

  test("events ts predicates reach the parquet scan as pushed filters") {
    import org.apache.spark.sql.functions.col
    // The fixture must normalize the µs generation AT THE SCAN (conf-level
    // NTZ→LTZ), not via a derived column — a post-scan cast silences every
    // time predicate's pushdown (the r7 5× regression on session windows).
    val ev = Fixtures.table(spark, sf(), "events")
    assert(ev.schema("ts").dataType ==
      org.apache.spark.sql.types.TimestampType, "ts must be session-zone timestamp")
    val p = ev.filter(col("ts") >= java.sql.Timestamp.valueOf("2024-01-02 00:00:00"))
      .select("event_id").queryExecution.executedPlan.toString
    assert(p.contains("PushedFilters: [IsNotNull(ts), GreaterThanOrEqual(ts"),
      s"ts range predicate not pushed to the events scan:\n$p")
  }

  test("no query plans a cartesian product or nested-loop join") {
    // dedup_embedding_exact and ann_batch_exact are all-pairs BY CONTRACT
    // (the exact ground truths the LSH/IVF paths are measured against) —
    // their nested-loop joins are the point, not an accident; the IVF
    // recall gate embeds that same exact ground truth as its truth side.
    // Everything else must stay out of quadratic plans.
    val quadraticByDesign =
      Set("dedup_embedding_exact", "ann_batch_exact", "ann_recall_ivf")
    val offenders = SparkEntry.queries.keys.toList.sorted
      .filterNot(quadraticByDesign)
      .flatMap { name =>
        val p = plan(name)
        if (p.contains("CartesianProduct") || p.contains("BroadcastNestedLoopJoin"))
          Some(name)
        else None
      }
    assert(offenders.isEmpty, s"quadratic join in: $offenders")
  }
}
