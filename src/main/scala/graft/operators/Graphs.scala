package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Graph operators for corpus/web-graph curation: bipartite projection
  * (co-occurrence graphs), degrees, and triangle counting — the signals a
  * web-scale data pipeline derives from link or interaction structure
  * (site authority, community density, spam-farm detection).
  *
  * Everything is DataFrame equi-joins and aggregates — no vertex-program
  * framework, no driver-side adjacency, no iteration: these are the
  * single-pass structural measures. Connected components (iterative) lives
  * in [[Dedup.connectedComponents]]; these compose with it.
  *
  * Beyond-reference superset: the reference engine has no graph surface.
  */
object Graphs {

  /** Project a bipartite (left, right) relation onto its LEFT side: a
    * weighted co-occurrence graph where `(ua, ub, w)` means ua and ub
    * share `w` distinct right-values (users co-purchasing items, docs
    * sharing hosts, authors sharing papers). Pairs are canonical
    * (`ua < ub`), inputs dedup to DISTINCT (left, right) memberships
    * first, so `w` is a set-intersection size, not an event count.
    *
    * Scale shape: one self equi-join on the right key — cost is
    * Σ degree(right)² over right-values, never |left|². That sum is the
    * graph's true output size EXCEPT under hub right-values (an item
    * everyone bought contributes degree² pairs while telling you nothing
    * about affinity): `maxRightDegree` drops right-values above the cap
    * BEFORE the join — the standard stop-word treatment for projection
    * hubs. The cap changes semantics (documented, explicit), not silently.
    *
    * The UNCAPPED call does not silently pay the blowup either: the pair
    * volume Σ deg·(deg-1)/2 is predicted by ONE aggregate over the
    * membership table (trivially cheaper than materializing the pairs)
    * and the call fails LOUDLY above
    * `spark.graft.graph.projectionVolumeCap` (default 2^31) naming the
    * worst hub, so "forgot the cap on a crawl-scale graph" is an
    * actionable error message, not a 709M-row surprise shuffle. Passing
    * an explicit `maxRightDegree` skips the probe — the caller has
    * already bounded per-hub volume by construction.
    */
  def projectBipartite(
      df: DataFrame, leftCol: String, rightCol: String,
      maxRightDegree: Int = Int.MaxValue): DataFrame = {
    val b = df.select(col(leftCol).as("u"), col(rightCol).as("item"))
      .na.drop().distinct()
    val bounded =
      if (maxRightDegree == Int.MaxValue) {
        val volumeCap = df.sparkSession.conf
          .get("spark.graft.graph.projectionVolumeCap", (1L << 31).toString).toLong
        // The prediction runs in Decimal(38,0): deg·(deg−1) wraps a LONG
        // once one hub's degree passes ~4.3e9 and the Σ wraps far earlier
        // — i.e. the guard itself would overflow exactly on the
        // crawl-scale graph it exists to refuse, and a wrapped (negative
        // or small) volume silently PASSES the cap check.
        val dec = org.apache.spark.sql.types.DecimalType(38, 0)
        val probe = b.groupBy("item").agg(count(lit(1)).as("__deg"))
          .agg(sum(col("__deg").cast(dec) * (col("__deg") - 1L).cast(dec))
            .as("vol2"), max(col("__deg")).as("maxDeg"))
          .head()
        // Null vol2 with a non-null maxDeg is a decimal-sum OVERFLOW
        // (> 10^38 candidate pairs), not an empty input — refuse loudly
        // rather than reading null as zero.
        require(probe.isNullAt(1) || !probe.isNullAt(0),
          "bipartite projection volume exceeds 10^38 candidate pairs — " +
            "pass maxRightDegree")
        val vol = if (probe.isNullAt(0)) BigInt(0)
          else BigInt(probe.getDecimal(0).toBigInteger) / 2
        require(vol <= volumeCap,
          s"uncapped bipartite projection would emit ~$vol candidate pairs " +
            s"(> spark.graft.graph.projectionVolumeCap=$volumeCap); the worst " +
            s"hub has degree ${probe.get(1)} — pass maxRightDegree to drop " +
            "projection hubs, or raise the cap if the volume is intended")
        b
      } else b.join(
        b.groupBy("item").agg(count(lit(1)).as("__deg"))
          .filter(col("__deg") <= maxRightDegree).select("item"),
        "item")
    val l = bounded.select(col("u").as("ua"), col("item"))
    val r = bounded.select(col("u").as("ub"), col("item"))
    l.join(r, "item")
      .filter(col("ua") < col("ub"))
      .groupBy("ua", "ub").agg(count(lit(1)).as("w"))
  }

  /** Undirected degree per vertex of an edge list (each edge contributes
    * to both endpoints; self-loops would double-count — feed canonical
    * `a < b` edges).
    */
  def degrees(edges: DataFrame, srcCol: String, dstCol: String): DataFrame =
    edges.select(col(srcCol).as("v"))
      .unionAll(edges.select(col(dstCol).as("v")))
      .groupBy("v").agg(count(lit(1)).as("degree"))

  /** Local clustering coefficient per vertex: `2t / (d(d-1))` for a vertex
    * in `t` triangles with degree `d` — how close each vertex's
    * neighborhood is to a clique (spam rings and scraped-content farms
    * cluster abnormally; organic link neighborhoods don't). Degree-1
    * vertices have no possible wedge and emit coefficient 0. Both inputs
    * are exact integers from [[triangleCounts]]/[[degrees]], and the one
    * double division computes identically in any IEEE engine — so the
    * coefficient is fully oracle-checkable despite being fractional.
    */
  def clusteringCoefficients(edges: DataFrame, srcCol: String, dstCol: String): DataFrame = {
    val und = edges.select(
        least(col(srcCol), col(dstCol)).as("a"),
        greatest(col(srcCol), col(dstCol)).as("b"))
      .filter(col("a") =!= col("b")).na.drop().distinct()
    val deg = degrees(und, "a", "b")
    val tri = triangleCounts(und, "a", "b")
    // Left join: a triangle-free vertex is a coefficient-0 ROW, not a gap —
    // the "no clustering" signal is exactly what the filter reads.
    deg.join(tri, Seq("v"), "left")
      .select(col("v"), col("degree"),
        coalesce(col("triangles"), lit(0L)).as("triangles"))
      .select(col("v"), col("degree"), col("triangles"),
        // Denominator in DOUBLE: deg·(deg−1) as a long product wraps past
        // deg ~3e9 (the coefficient is a double ratio anyway, so the
        // 2^53 mantissa is the only precision that ever mattered here).
        when(col("degree") > 1,
          col("triangles") * 2.0 /
            (col("degree").cast("double") * (col("degree") - 1).cast("double")))
          .otherwise(lit(0.0)).as("coeff"))
  }

  /** k-core decomposition by parallel peeling: repeatedly drop every
    * vertex with fewer than `k` neighbors until none remains, and return
    * the surviving vertices with their IN-CORE degree. The k-core is the
    * classic "dense backbone" filter — spam farms and template rings
    * survive high k while organically-linked pages do not, and it is the
    * standard pre-filter before triangle/community analysis because it
    * shrinks the graph without touching any vertex of the answer.
    *
    * Edges canonicalize like [[triangleCounts]] (undirected, self-loops
    * dropped, deduped). Each peeling round is ONE degree aggregate + one
    * anti-join against the round's DEAD frontier (the vertices that just
    * fell below k) — after round one the frontier is the cascade's edge,
    * typically tiny, so it broadcasts (counted guard; a mass-extinction
    * round falls open to a shuffled anti-join). No vertex programs, no
    * driver adjacency; the edge table only ever shrinks, so round cost
    * is monotone non-increasing. Lineage snapshots every 3 rounds (the
    * [[Dedup.connectedComponents]] policy) keep Catalyst analysis flat on
    * deep peels. Round COUNT is the graph's peeling depth: small (tens)
    * on real web/co-occurrence graphs, but linear in pathological chains —
    * `maxIters` fails loudly rather than returning a half-peeled set,
    * because a non-fixed-point "core" silently breaks the invariant
    * downstream filters rely on (every returned vertex has ≥ k in-core
    * neighbors).
    *
    * The fixed point is a pure function of the edge set (no tie-breaks:
    * all sub-k vertices drop together), so a DuckDB oracle unrolling the
    * same rounds reproduces it bit-for-bit.
    */
  def kCore(edges: DataFrame, srcCol: String, dstCol: String, k: Int,
      maxIters: Int = 100): DataFrame = {
    require(k >= 1, "k-core needs k >= 1")
    val spark = edges.sparkSession
    var und = edges.select(
        least(col(srcCol), col(dstCol)).as("a"),
        greatest(col(srcCol), col(dstCol)).as("b"))
      .filter(col("a") =!= col("b")).na.drop().distinct()
      .cache()
    // Peel by ANTI-joining the round's DEAD frontier (vertices that just
    // fell below k) instead of semi-joining the whole survivor set: after
    // the first round the frontier is the cascade's edge — typically tiny —
    // so it BROADCASTS (under the usual counted guard; a mass-extinction
    // first round falls open to a shuffled anti-join), and convergence is
    // "the frontier is empty", with no edge-count job per round.
    val bcast = spark.conf
      .get("spark.graft.graph.broadcastFrontierCap", (1 << 22).toString).toLong
    var i = 0
    var converged = false
    while (!converged && i < maxIters) {
      val dead = degrees(und, "a", "b").filter(col("degree") < k)
        .select("v").localCheckpoint(true)
      val nDead = dead.count()
      if (nDead == 0L) converged = true
      else {
        val d = if (nDead <= bcast) broadcast(dead) else dead
        val next0 = und
          .join(d.withColumnRenamed("v", "a"), Seq("a"), "left_anti")
          .join(d.withColumnRenamed("v", "b"), Seq("b"), "left_anti")
        val next = (if (i % 3 == 2) next0.localCheckpoint(true) else next0)
          .cache()
        und.unpersist()
        und = next
      }
      i += 1
    }
    require(converged, s"k-core did not reach a fixed point in $maxIters " +
      "peeling rounds — raise maxIters (pathological chain-shaped graph)")
    // At the fixed point every remaining endpoint has in-core degree >= k.
    val result = degrees(und, "a", "b")
      .select(col("v"), col("degree").as("core_deg"))
      .localCheckpoint(true)
    und.unpersist()
    result
  }

  /** PageRank on an exact-integer grid — the site-authority signal web
    * curation ranks by (the ancestor of CommonCrawl's harmonic-centrality
    * ordering), made bit-reproducible: scores live on a `scale` grid,
    * damping is the exact rational `dampNum / scale`, and every division
    * is integral (both engines truncate identically on non-negatives), so
    * a fixed iteration count is a pure function of the edge set — the
    * `graph_pagerank_int` gate unrolls the same iterations in DuckDB.
    *
    * Semantics: undirected (each edge walks both ways — canonicalized and
    * deduped like [[triangleCounts]]); uniform teleport `scale - dampNum`;
    * per-iteration update `s'(v) = (scale-dampNum) + dampNum·Σ_{u~v}
    * (s(u) div deg(u)) div scale`. Isolated vertices (no edges) are not in
    * the output — they'd hold the teleport constant.
    *
    * Scale shape: one degree aggregate, then per iteration ONE equi-join
    * shuffle (contribs to neighbors) + ONE groupBy(v) — the canonical
    * distributed PageRank plan. Iterations chain lazily; pass
    * `checkpointEach = true` on a real cluster run so lineage doesn't grow
    * with `iters` (the gate's 3 iterations don't need it).
    */
  def pageRankInt(
      edges: DataFrame, srcCol: String, dstCol: String,
      iters: Int = 3, scale: Long = 1000000L, dampNum: Long = 850000L,
      checkpointEach: Boolean = false): DataFrame = {
    require(iters >= 1, s"need at least one iteration, got $iters")
    require(dampNum >= 0 && dampNum <= scale,
      s"damping numerator must sit in [0, scale]: $dampNum vs $scale")
    val und = edges.select(
        least(col(srcCol), col(dstCol)).as("x"),
        greatest(col(srcCol), col(dstCol)).as("y"))
      .filter(col("x") =!= col("y")).na.drop().distinct()
    val dir = und.select(col("x").as("u"), col("y").as("v"))
      .unionAll(und.select(col("y").as("u"), col("x").as("v")))
    val deg = dir.groupBy("u").agg(count(lit(1)).as("d"))
    var score = deg.select(col("u"), lit(scale).as("s"))
    for (_ <- 1 to iters) {
      val contrib = score.join(deg, "u").select(col("u"), expr("s div d").as("c"))
      val incoming = dir.join(contrib, "u")
        .groupBy("v").agg(sum("c").as("m"))
        .withColumnRenamed("v", "u")
      val next = deg.select(col("u")).join(incoming, Seq("u"), "left")
        .select(col("u"),
          (lit(scale - dampNum) +
            expr(s"($dampNum * coalesce(m, 0)) div $scale")).as("s"))
      score = if (checkpointEach) next.localCheckpoint(true) else next
    }
    score.select(col("u").as("v"), col("s").as("pr"))
  }

  /** DIRECTED PageRank on the same exact-integer grid as [[pageRankInt]] —
    * the real link-graph shape: authority ≠ hub, a page voted FOR by many
    * ranks high even when it links to nothing. [[pageRankInt]]
    * canonicalizes to an undirected walk (right for co-occurrence graphs);
    * this variant keeps edge direction, which changes two things:
    *
    *  - mass flows along out-edges only: `u` spreads `s(u) div outdeg(u)`
    *    to each out-neighbor;
    *  - DANGLING vertices (out-degree 0 — every crawl frontier has them)
    *    would leak their mass out of the system; instead each round their
    *    total mass redistributes uniformly, `D div n` per vertex, on the
    *    SAME integer grid (exact rational: integral division, remainder
    *    dropped identically by any engine that truncates non-negatives —
    *    the `graph_pagerank_directed` oracle unrolls the identical rounds
    *    in DuckDB with `//`).
    *
    * Update: `s'(v) = (scale-dampNum) + dampNum·(Σ_{u→v} s(u) div d(u) +
    * D div n) div scale` over the full endpoint vertex set (sources AND
    * sinks — a pure sink must accumulate authority).
    *
    * Scale shape per iteration: ONE equi-join shuffle (contribs along
    * out-edges) + ONE groupBy(v) + one scalar aggregate for the dangling
    * mass (a tree-reduce — noise next to the join; it does make each
    * round eager, which `checkpointEach` wants anyway on a real cluster).
    * `n` is one count up front.
    */
  def pageRankDirectedInt(
      edges: DataFrame, srcCol: String, dstCol: String,
      iters: Int = 3, scale: Long = 1000000L, dampNum: Long = 850000L,
      checkpointEach: Boolean = false): DataFrame = {
    require(iters >= 1, s"need at least one iteration, got $iters")
    require(dampNum >= 0 && dampNum <= scale,
      s"damping numerator must sit in [0, scale]: $dampNum vs $scale")
    val dir = edges.select(col(srcCol).as("u"), col(dstCol).as("v"))
      .filter(col("u") =!= col("v")).na.drop().distinct()
      .localCheckpoint(true)
    val verts = dir.select("u")
      .unionAll(dir.select(col("v").as("u"))).distinct()
      .localCheckpoint(true)
    val n = verts.count()
    val outDeg = dir.groupBy("u").agg(count(lit(1)).as("d"))
    var score = verts.withColumn("s", lit(scale))
    for (i <- 1 to iters) {
      // dangling mass: total score sitting on vertices with no out-edges
      val dangling = score.join(outDeg, Seq("u"), "left_anti")
        .agg(coalesce(sum("s"), lit(0L))).head().getLong(0)
      val perVertex = dangling / n // integral: exact-grid redistribution
      val contrib = dir
        .join(score.join(outDeg, "u").select(col("u"), expr("s div d").as("c")), "u")
        .groupBy("v").agg(sum("c").as("m"))
        .withColumnRenamed("v", "u")
      val next = verts.join(contrib, Seq("u"), "left")
        .select(col("u"),
          (lit(scale - dampNum) +
            expr(s"($dampNum * (coalesce(m, 0) + $perVertex)) div $scale")).as("s"))
      score = if (checkpointEach || i < iters) next.localCheckpoint(true) else next
    }
    score.select(col("u").as("v"), col("s").as("pr"))
  }

  /** Personalized, edge-weighted PageRank on the same exact-integer grid
    * as [[pageRankInt]] — trust propagation from a SEED set, the working
    * shape of web-corpus quality curation (TrustRank/Harmonic-seed
    * ranking: hand-verified good hosts up-rank what they link to;
    * spam farms that only cite each other receive nothing).
    *
    * Differences from the uniform walk:
    *  - teleport mass `scale - dampNum` lands ONLY on seed vertices —
    *    non-seeds hold exactly what the walk carries to them, so a vertex
    *    unreachable from every seed scores 0;
    *  - edges carry weights: u spreads `s(u)·w(u,v) div W(u)` to each
    *    neighbor (`W(u)` = u's total incident weight), so a 10×-shared
    *    co-occurrence edge carries 10× the trust.
    *
    * Same bit-reproducibility contract (integral divisions, fixed
    * iterations — the `graph_ppr_weighted` oracle unrolls the identical
    * rounds) and the same per-iteration plan: one equi-join + one groupBy.
    * Scores start at `scale` on seeds, 0 elsewhere.
    */
  def personalizedPageRankInt(
      edges: DataFrame, srcCol: String, dstCol: String, weightCol: String,
      seeds: DataFrame, seedCol: String,
      iters: Int = 3, scale: Long = 1000000L, dampNum: Long = 850000L,
      checkpointEach: Boolean = false): DataFrame = {
    require(iters >= 1, s"need at least one iteration, got $iters")
    require(dampNum >= 0 && dampNum <= scale,
      s"damping numerator must sit in [0, scale]: $dampNum vs $scale")
    val und = edges.select(
        least(col(srcCol), col(dstCol)).as("x"),
        greatest(col(srcCol), col(dstCol)).as("y"),
        col(weightCol).cast("long").as("w"))
      .filter(col("x") =!= col("y") && col("w") > 0).na.drop()
      .groupBy("x", "y").agg(max(col("w")).as("w"))
    val dir = und.select(col("x").as("u"), col("y").as("v"), col("w"))
      .unionAll(und.select(col("y").as("u"), col("x").as("v"), col("w")))
    val wTot = dir.groupBy("u").agg(sum(col("w")).as("wt"))
    val seedSet = seeds.select(col(seedCol).as("u")).na.drop().distinct()
      .withColumn("tele", lit(scale - dampNum))
    def teleported(mass: DataFrame): DataFrame =
      wTot.select(col("u"))
        .join(seedSet, Seq("u"), "left")
        .join(mass, Seq("u"), "left")
        .select(col("u"),
          (coalesce(col("tele"), lit(0L)) +
            expr(s"($dampNum * coalesce(m, 0)) div $scale")).as("s"))
    var score = wTot.select(col("u"))
      .join(seedSet, Seq("u"), "left")
      .select(col("u"), coalesce(
        when(col("tele").isNotNull, lit(scale)), lit(0L)).as("s"))
    for (_ <- 1 to iters) {
      val contrib = dir.join(score, "u").join(wTot, "u")
        .select(col("v"), expr("(s * w) div wt").as("c"))
      val incoming = contrib.groupBy("v").agg(sum("c").as("m"))
        .withColumnRenamed("v", "u")
      val next = teleported(incoming)
      score = if (checkpointEach) next.localCheckpoint(true) else next
    }
    score.select(col("u").as("v"), col("s").as("pr"))
  }

  /** DIRECTED, edge-weighted, PERSONALIZED PageRank — the full TrustRank
    * shape on real link graphs, completing the 2×2 with [[pageRankInt]]
    * (undirected uniform), [[pageRankDirectedInt]] (directed uniform) and
    * [[personalizedPageRankInt]] (undirected weighted seeded): trust
    * flows along OUT-edges only, proportional to edge weight
    * (`s(u)·w(u,v) div W(u)`, `W(u)` = u's total out-weight), teleport
    * mass `scale - dampNum` lands only on seed vertices — and DANGLING
    * mass returns to the seeds (`D div |seeds|` each, damped like every
    * other inbound unit), the personalized counterpart of
    * [[pageRankDirectedInt]]'s uniform redistribution: trust that walks
    * off a page with no outlinks restarts at the trusted set, it does not
    * leak to arbitrary vertices. Same exact-integer grid and
    * bit-reproducibility contract (the `graph_ppr_directed` oracle
    * unrolls identical rounds); vertices unreachable from every seed
    * score exactly 0. Seeds restrict to graph vertices (a seed outside
    * the edge set holds no mass to spread). Per iteration: ONE equi-join
    * shuffle + ONE groupBy + one scalar dangling aggregate.
    */
  def personalizedPageRankDirectedInt(
      edges: DataFrame, srcCol: String, dstCol: String, weightCol: String,
      seeds: DataFrame, seedCol: String,
      iters: Int = 3, scale: Long = 1000000L, dampNum: Long = 850000L,
      checkpointEach: Boolean = false): DataFrame = {
    require(iters >= 1, s"need at least one iteration, got $iters")
    require(dampNum >= 0 && dampNum <= scale,
      s"damping numerator must sit in [0, scale]: $dampNum vs $scale")
    val dir = edges.select(col(srcCol).cast("long").as("u"),
        col(dstCol).cast("long").as("v"), col(weightCol).cast("long").as("w"))
      .filter(col("u") =!= col("v") && col("w") > 0).na.drop()
      .groupBy("u", "v").agg(max(col("w")).as("w"))
      .localCheckpoint(true)
    val verts = dir.select("u")
      .unionAll(dir.select(col("v").as("u"))).distinct()
      .localCheckpoint(true)
    val wTot = dir.groupBy("u").agg(sum(col("w")).as("wt"))
    val seedSet = seeds.select(col(seedCol).cast("long").as("u")).na.drop()
      .distinct().join(verts, Seq("u"), "left_semi")
      .withColumn("t", lit(1)).localCheckpoint(true)
    val nSeeds = seedSet.count()
    require(nSeeds > 0, "no seed is a vertex of the edge set")
    var score = verts.join(seedSet, Seq("u"), "left")
      .select(col("u"),
        when(col("t").isNotNull, lit(scale)).otherwise(lit(0L)).as("s"))
    for (i <- 1 to iters) {
      val dangling = score.join(wTot, Seq("u"), "left_anti")
        .agg(coalesce(sum("s"), lit(0L))).head().getLong(0)
      val perSeed = dangling / nSeeds
      val contrib = dir.join(score, "u").join(wTot, "u")
        .select(col("v"), expr("(s * w) div wt").as("c"))
      val incoming = contrib.groupBy("v").agg(sum("c").as("m"))
        .withColumnRenamed("v", "u")
      val next = verts.join(seedSet, Seq("u"), "left")
        .join(incoming, Seq("u"), "left")
        .select(col("u"),
          (when(col("t").isNotNull, lit(scale - dampNum)).otherwise(lit(0L)) +
            expr(s"($dampNum * (coalesce(m, 0) + " +
              s"(CASE WHEN t IS NOT NULL THEN $perSeed ELSE 0 END))) div $scale"))
            .as("s"))
      score = if (checkpointEach || i < iters) next.localCheckpoint(true) else next
    }
    score.select(col("u").as("v"), col("s").as("pr"))
  }

  /** Per-vertex triangle participation counts — the local clustering /
    * community-density signal (a vertex in `t` triangles with degree `d`
    * has clustering coefficient `2t/(d(d-1))`).
    *
    * Degree-ordered orientation (the MapReduce "node-iterator++"
    * algorithm): orient every undirected edge from its lower-(degree, id)
    * endpoint to the higher one; every triangle then has EXACTLY ONE
    * vertex with out-edges to the other two, so wedges built from shared
    * out-neighbors count each triangle once — no post-hoc division by 3,
    * no duplicate elimination. The orientation is also what makes the
    * plan survive skew: hubs RECEIVE their edges (low-degree neighbors
    * out-rank into them) and can point only at the ≤O(√m) vertices of
    * equal-or-higher degree, so every vertex's out-degree is O(√m) and
    * wedge volume meets the optimal O(m^1.5) bound instead of Σ d² — THE
    * difference between a web graph finishing and not.
    *
    * Three equi-join shuffles total (degree attach, wedge build, wedge
    * close); no nested loop, no driver state.
    */
  def triangleCounts(edges: DataFrame, srcCol: String, dstCol: String): DataFrame = {
    val und = edges.select(
        least(col(srcCol), col(dstCol)).as("a"),
        greatest(col(srcCol), col(dstCol)).as("b"))
      .filter(col("a") =!= col("b")).na.drop().distinct()
    val deg = degrees(und, "a", "b")
    val ranked = und
      .join(deg.select(col("v").as("a"), col("degree").as("da")), "a")
      .join(deg.select(col("v").as("b"), col("degree").as("db")), "b")
    val oriented = ranked.select(
      when(col("da") < col("db") ||
          (col("da") === col("db") && col("a") < col("b")),
        struct(col("a").as("s"), col("b").as("t")))
        .otherwise(struct(col("b").as("s"), col("a").as("t"))).as("e"))
      .select(col("e.s").as("s"), col("e.t").as("t"))
    val wedges = oriented.select(col("s"), col("t").as("v1"))
      .join(oriented.select(col("s"), col("t").as("v2")), "s")
      .filter(col("v1") < col("v2"))
    val closing = und.select(col("a").as("v1"), col("b").as("v2"))
    wedges.join(closing, Seq("v1", "v2"))
      .select(explode(array(col("s"), col("v1"), col("v2"))).as("v"))
      .groupBy("v").agg(count(lit(1)).as("triangles"))
  }
}
