package graft

import graft.operators.Graphs

/** [[Graphs]] — bipartite projection, degrees, triangle counts. The
  * `graph_copurchase_edges` / `graph_triangles` gates check the corpus
  * path against DuckDB (the triangle oracle is an independent naive
  * three-way join); this suite pins hand-computable structures and the
  * exactly-once counting property.
  */
class GraphsSpec extends SparkSpec {
  import spark.implicits._

  test("bipartite projection: weights are shared-item set sizes, pairs canonical") {
    // u1,u2 share {a,b}; u1,u3 share {a}; u2,u3 share {a}. Duplicate
    // memberships must not inflate weights.
    val bip = Seq(
      (1L, "a"), (1L, "b"), (1L, "b"),
      (2L, "a"), (2L, "b"),
      (3L, "a")).toDF("user", "item")
    val got = Graphs.projectBipartite(bip, "user", "item")
      .as[(Long, Long, Long)].collect().toSet
    assert(got == Set((1L, 2L, 2L), (1L, 3L, 1L), (2L, 3L, 1L)))
  }

  test("maxRightDegree drops hub items before the join") {
    // "hub" is shared by all three users; cap 2 keeps only "x" (degree 2).
    val bip = Seq(
      (1L, "hub"), (2L, "hub"), (3L, "hub"),
      (1L, "x"), (2L, "x")).toDF("user", "item")
    val got = Graphs.projectBipartite(bip, "user", "item", maxRightDegree = 2)
      .as[(Long, Long, Long)].collect().toSet
    assert(got == Set((1L, 2L, 1L)))
  }

  test("degrees count both endpoints") {
    val e = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 4L)).toDF("a", "b")
    val got = Graphs.degrees(e, "a", "b").as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 2L, 2L -> 2L, 3L -> 3L, 4L -> 1L))
  }

  test("K4: every vertex sits in 3 of the 4 triangles") {
    val e = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L))
      .toDF("a", "b")
    val got = Graphs.triangleCounts(e, "a", "b").as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
  }

  test("a 4-cycle has no triangles; adding one diagonal makes two") {
    val square = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L)).toDF("a", "b")
    assert(Graphs.triangleCounts(square, "a", "b").count() == 0)
    val withDiag = square.unionAll(Seq((1L, 3L)).toDF("a", "b"))
    val got = Graphs.triangleCounts(withDiag, "a", "b")
      .as[(Long, Long)].collect().toMap
    // triangles {1,2,3} and {1,3,4}: 1 and 3 in both, 2 and 4 in one.
    assert(got == Map(1L -> 2L, 2L -> 1L, 3L -> 2L, 4L -> 1L))
  }

  test("duplicate, reversed and self-loop edges do not change the counts") {
    val noisy = Seq(
      (1L, 2L), (2L, 1L), (1L, 2L), (2L, 3L), (1L, 3L), (3L, 3L))
      .toDF("a", "b")
    val got = Graphs.triangleCounts(noisy, "a", "b")
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("clustering coefficients: clique = 1, path interior = 0, mixed by hand") {
    // K3 plus pendant 4-3: vertices 1,2 have coeff 1 (their whole
    // neighborhood is the triangle); 3 has degree 3, 1 triangle -> 1/3;
    // 4 has degree 1 -> 0 (no possible wedge), still a ROW.
    val e = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L)).toDF("a", "b")
    val got = Graphs.clusteringCoefficients(e, "a", "b")
      .as[(Long, Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got(1L) == ((2L, 1L, 1.0)))
    assert(got(2L) == ((2L, 1L, 1.0)))
    assert(got(3L) == ((3L, 1L, 1.0 * 2 / 6)))
    assert(got(4L) == ((1L, 0L, 0.0)))
  }

  test("pageRankInt: hand-computed path graph, two iterations") {
    // Path a-b-c (deg 1,2,1). s0 = 1e6 everywhere.
    // iter1: contribs a=1e6, b=5e5, c=1e6 -> s1 = (575000, 1850000, 575000)
    // iter2: contribs a=575000, b=925000, c=575000
    //        -> s2 = (936250, 1127500, 936250)
    val e = Seq((1L, 2L), (2L, 3L)).toDF("a", "b")
    val pr = Graphs.pageRankInt(e, "a", "b", iters = 2)
      .as[(Long, Long)].collect().toMap
    assert(pr == Map(1L -> 936250L, 2L -> 1127500L, 3L -> 936250L))
  }

  test("pageRankInt: regular graphs are a fixed point at the scale value") {
    // Triangle: every vertex degree 2 -> scores never move off 1e6.
    val tri = Seq((1L, 2L), (2L, 3L), (1L, 3L)).toDF("a", "b")
    val pr = Graphs.pageRankInt(tri, "a", "b", iters = 5)
      .as[(Long, Long)].collect().toMap
    assert(pr.values.toSet == Set(1000000L))
  }

  test("pageRankInt: reversed/duplicate edges don't change scores; checkpointEach agrees") {
    val clean = Seq((1L, 2L), (2L, 3L), (3L, 4L), (1L, 4L), (1L, 3L)).toDF("a", "b")
    val noisy = clean.unionAll(Seq((2L, 1L), (1L, 2L), (4L, 3L)).toDF("a", "b"))
    val a = Graphs.pageRankInt(clean, "a", "b").as[(Long, Long)].collect().toMap
    val b = Graphs.pageRankInt(noisy, "a", "b").as[(Long, Long)].collect().toMap
    val c = Graphs.pageRankInt(clean, "a", "b", checkpointEach = true)
      .as[(Long, Long)].collect().toMap
    assert(a == b)
    assert(a == c)
    // higher-degree vertices outrank lower-degree ones on this graph
    assert(a(1L) > a(2L))
  }

  test("pageRankDirectedInt: hand-computed dangling redistribution") {
    // 1->2, 1->3, 2->3. Vertex 3 is DANGLING (pure sink); n=3.
    // iter1: D=1e6, pv=333333; contribs 2<-500000, 3<-1500000
    //   -> s1 = (433333, 858333, 1708333)
    // iter2: D=1708333, pv=569444; contribs 2<-216666, 3<-1074999
    //   -> s2 = (634027, 818193, 1547776)
    val e = Seq((1L, 2L), (1L, 3L), (2L, 3L)).toDF("s", "t")
    val pr = Graphs.pageRankDirectedInt(e, "s", "t", iters = 2)
      .as[(Long, Long)].collect().toMap
    assert(pr == Map(1L -> 634027L, 2L -> 818193L, 3L -> 1547776L))
  }

  test("pageRankDirectedInt: a cycle is a fixed point; direction matters") {
    // 3-cycle: every vertex out-degree 1 and in-degree 1, no dangling ->
    // scores hold at scale forever.
    val cyc = Seq((1L, 2L), (2L, 3L), (3L, 1L)).toDF("s", "t")
    val pr = Graphs.pageRankDirectedInt(cyc, "s", "t", iters = 4)
      .as[(Long, Long)].collect().toMap
    assert(pr.values.toSet == Set(1000000L))
    // star IN vs OUT: authority accrues to the vote target, not the voter
    val in = Seq((2L, 1L), (3L, 1L), (4L, 1L)).toDF("s", "t") // all vote FOR 1
    val out = Seq((1L, 2L), (1L, 3L), (1L, 4L)).toDF("s", "t") // 1 votes for all
    val prIn = Graphs.pageRankDirectedInt(in, "s", "t").as[(Long, Long)].collect().toMap
    val prOut = Graphs.pageRankDirectedInt(out, "s", "t").as[(Long, Long)].collect().toMap
    assert(prIn(1L) > prIn(2L), s"in-star center must outrank leaves: $prIn")
    assert(prOut(1L) < prOut(2L), s"out-star center must NOT collect authority: $prOut")
    // checkpointEach is plan-only
    val c = Graphs.pageRankDirectedInt(in, "s", "t", checkpointEach = true)
      .as[(Long, Long)].collect().toMap
    assert(c == prIn)
  }

  test("uncapped projection over a hub fails loudly; capped passes") {
    // hub item shared by 12 users -> 66 candidate pairs; cap at 50.
    val bip = ((1L to 12L).map(u => (u, "hub")) ++ Seq((1L, "x"), (2L, "x")))
      .toDF("user", "item")
    spark.conf.set("spark.graft.graph.projectionVolumeCap", "50")
    try {
      val ex = intercept[IllegalArgumentException] {
        Graphs.projectBipartite(bip, "user", "item")
      }
      assert(ex.getMessage.contains("projectionVolumeCap"), ex.getMessage)
      assert(ex.getMessage.contains("degree 12"), ex.getMessage)
      // explicit cap bounds per-hub volume by construction: no probe, no error
      val got = Graphs.projectBipartite(bip, "user", "item", maxRightDegree = 5)
        .as[(Long, Long, Long)].collect().toSet
      assert(got == Set((1L, 2L, 1L)))
    } finally spark.conf.unset("spark.graft.graph.projectionVolumeCap")
  }

  test("personalizedPageRankDirectedInt: hand-computed dangling-to-seeds") {
    // 1->2 (w=1), 2->3 (w=3); seed {1}; 3 is DANGLING — its mass restarts
    // at the seed (damped). W(1)=1, W(2)=3, nSeeds=1.
    // s0=(1e6,0,0)
    // i1: D=0; 1 sends 1e6 -> 2.          s1=(150000, 850000, 0)
    // i2: D=0; 1->2: 150000; 2->3: 850000. s2=(150000, 127500, 722500)
    // i3: D=722500 -> seed; 1->2: 150000; 2->3: 127500.
    //     v1 = 150000 + 850000*722500 div 1e6 = 764125
    //     v2 = 850000*150000 div 1e6 = 127500
    //     v3 = 850000*127500 div 1e6 = 108375
    val e = Seq((1L, 2L, 1L), (2L, 3L, 3L)).toDF("s", "t", "w")
    val seeds = Seq(1L).toDF("id")
    val pr = Graphs.personalizedPageRankDirectedInt(e, "s", "t", "w",
        seeds, "id", iters = 3)
      .as[(Long, Long)].collect().toMap
    assert(pr == Map(1L -> 764125L, 2L -> 127500L, 3L -> 108375L))
    // vertices unreachable from every seed score exactly 0; non-vertex
    // seeds are ignored and an all-outside seed set is refused loudly
    val e2 = Seq((1L, 2L, 1L), (3L, 4L, 1L)).toDF("s", "t", "w")
    val pr2 = Graphs.personalizedPageRankDirectedInt(e2, "s", "t", "w",
        Seq(1L, 99L).toDF("id"), "id", iters = 3)
      .as[(Long, Long)].collect().toMap
    assert(pr2(3L) == 0L && pr2(4L) == 0L, s"unreachable must score 0: $pr2")
    assert(pr2(1L) > 0L && pr2(2L) > 0L)
    intercept[IllegalArgumentException] {
      Graphs.personalizedPageRankDirectedInt(e2, "s", "t", "w",
        Seq(99L).toDF("id"), "id")
    }
  }

  test("personalizedPageRankInt: hand-computed weighted trust spread") {
    // Graph 1-2 (w=1), 2-3 (w=3); seed {1}. Totals: W(1)=1, W(2)=4, W(3)=3.
    // s0 = (1e6, 0, 0)
    // iter1: 1 sends 1e6 to 2 -> s1 = (150000, 850000, 0)
    // iter2: 2 splits 850000 as 212500->1, 637500->3; 1 sends 150000->2
    //        -> s2 = (330625, 127500, 541875)
    val e = Seq((1L, 2L, 1L), (2L, 3L, 3L)).toDF("a", "b", "w")
    val seeds = Seq(1L).toDF("id")
    val pr = Graphs.personalizedPageRankInt(e, "a", "b", "w", seeds, "id",
        iters = 2, scale = 1000000L, dampNum = 850000L)
      .as[(Long, Long)].collect().toMap
    assert(pr == Map(1L -> 330625L, 2L -> 127500L, 3L -> 541875L))
  }

  test("personalizedPageRankInt: vertices unreachable from every seed score 0") {
    val e = Seq((1L, 2L, 1L), (3L, 4L, 5L)).toDF("a", "b", "w")
    val seeds = Seq(1L).toDF("id")
    val pr = Graphs.personalizedPageRankInt(e, "a", "b", "w", seeds, "id",
        iters = 4).as[(Long, Long)].collect().toMap
    assert(pr(3L) == 0L && pr(4L) == 0L)
    assert(pr(1L) > 0L && pr(2L) > 0L)
  }

  test("personalizedPageRankInt: heavier edges carry proportionally more trust") {
    // Star: seed 1 linked to 2 (w=9) and 3 (w=1) — after one hop the
    // heavy neighbor holds 9x the light one.
    val e = Seq((1L, 2L, 9L), (1L, 3L, 1L)).toDF("a", "b", "w")
    val seeds = Seq(1L).toDF("id")
    val pr = Graphs.personalizedPageRankInt(e, "a", "b", "w", seeds, "id",
        iters = 1).as[(Long, Long)].collect().toMap
    assert(pr(2L) == 9L * pr(3L))
  }

  test("pageRankInt rejects bad iteration/damping arguments") {
    val e = Seq((1L, 2L)).toDF("a", "b")
    intercept[IllegalArgumentException] {
      Graphs.pageRankInt(e, "a", "b", iters = 0)
    }
    intercept[IllegalArgumentException] {
      Graphs.pageRankInt(e, "a", "b", dampNum = 2000000L)
    }
  }

  test("exactly-once counting on a deterministic pseudo-random graph") {
    // Edges (i, j) where (i*7 + j*13) % 5 == 0 over 20 vertices — dense
    // enough for hundreds of triangles. Ground truth: driver-side naive
    // enumeration over all vertex triples.
    val vs = 0L until 20L
    val edges = (for {
      i <- vs; j <- vs if i < j && (i * 7 + j * 13) % 5 == 0
    } yield (i, j)).toSeq
    val adj = edges.toSet
    def conn(x: Long, y: Long) = adj((math.min(x, y), math.max(x, y)))
    val naive = (for {
      x <- vs; y <- vs if x < y; z <- vs if y < z
      if conn(x, y) && conn(y, z) && conn(x, z)
    } yield Seq(x, y, z)).flatten
      .groupBy(identity).map { case (v, l) => v -> l.size.toLong }
    val got = Graphs.triangleCounts(edges.toDF("a", "b"), "a", "b")
      .as[(Long, Long)].collect().toMap
    assert(got == naive)
    assert(got.values.sum % 3 == 0) // each triangle contributes 3 rows
  }

  test("kCore: pendant chain peels away, the clique core survives with in-core degrees") {
    // 4-clique {1,2,3,4} plus a chain 4-5-6 hanging off it. The 2-core is
    // the clique ONLY: 6 peels first (degree 1), which drops 5 to degree 1,
    // which peels next round — a genuinely multi-round peel. In-core
    // degrees are the clique's 3, not the original degrees (4 had 4).
    val clique = for { i <- 1L to 4L; j <- 1L to 4L if i < j } yield (i, j)
    val e = (clique ++ Seq((4L, 5L), (5L, 6L))).toDF("a", "b")
    val got2 = Graphs.kCore(e, "a", "b", k = 2)
      .as[(Long, Long)].collect().toMap
    assert(got2 == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
    // k=1 keeps everything (no isolated vertices in an edge list); k=4
    // peels the whole graph — empty result, not an error.
    assert(Graphs.kCore(e, "a", "b", k = 1).count() == 6)
    assert(Graphs.kCore(e, "a", "b", k = 4).count() == 0)
  }

  test("kCore: non-convergence within maxIters fails loudly, not half-peeled") {
    // A 12-chain under k=2 peels two endpoints per round — needs ~6 rounds.
    val chain = (1L to 11L).map(i => (i, i + 1))
    val e = chain.toDF("a", "b")
    val err = intercept[IllegalArgumentException] {
      Graphs.kCore(e, "a", "b", k = 2, maxIters = 2).count()
    }
    assert(err.getMessage.contains("fixed point"))
    // With room to converge the chain's 2-core is empty.
    assert(Graphs.kCore(e, "a", "b", k = 2).count() == 0)
  }
}
