package graft.operators

import graft.SparkSpec

class ConnectedComponentsSpec extends SparkSpec {

  /** Runs BOTH execution paths — the driver union-find (default
    * threshold) and the distributed star-contraction loop (threshold
    * 0) — and asserts they agree before returning the labels. */
  private def labelsOf(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val sp = spark
    import sp.implicits._
    val df = edges.toDF("a", "b")
    val viaDriver = ConnectedComponents.label(df, "a", "b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val viaLoop = ConnectedComponents.label(df, "a", "b",
        driverThreshold = 0L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaLoop === viaDriver, "hybrid paths disagree")
    viaDriver
  }

  test("chains, cliques, pairs, self-loops and duplicate edges") {
    val out = labelsOf(Seq(
      (1L, 2L), (2L, 3L), (3L, 4L), // chain (diameter > 1)
      (2L, 1L),                     // reversed duplicate
      (10L, 11L), (10L, 12L), (11L, 12L), // clique
      (20L, 21L),                   // isolated pair
      (30L, 30L)))                  // self-loop only → singleton
    assert(out === Map(
      1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L,
      20L -> 20L, 21L -> 20L,
      30L -> 30L))
  }

  test("long path converges (logarithmic rounds, not diameter rounds)") {
    // a 200-node path has diameter 199 — naive min propagation at one
    // hop per round would need 199 rounds; star-contraction must land
    // well inside the 25-round cap
    val edges = (0L until 199L).map(i => (i, i + 1))
    val out = labelsOf(edges)
    assert(out.size === 200)
    assert(out.values.toSet === Set(0L))
  }

  test("non-long id columns fall through to the distributed loop") {
    // string ids under the driver threshold would previously hit the
    // Long-typed union-find and throw ClassCastException; the type
    // gate must route them to the type-generic star-contraction loop
    val sp = spark
    import sp.implicits._
    val edges = Seq(("d_b", "d_a"), ("d_b", "d_c"), ("x", "y"))
      .toDF("a", "b")
    val out = ConnectedComponents.label(edges, "a", "b")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(out === Map("d_a" -> "d_a", "d_b" -> "d_a", "d_c" -> "d_a",
      "x" -> "x", "y" -> "x"))
  }

  test("matches a driver-side union-find on a pseudo-random graph") {
    // deterministic LCG edge generator — no RNG seeds to drift
    var s = 987654321L
    def next(mod: Int): Int = {
      s = (s * 6364136223846793005L + 1442695040888963407L)
      (((s >>> 33) % mod) + mod).toInt % mod
    }
    val n = 80
    val edges = Seq.fill(110)((next(n).toLong, next(n).toLong))

    // driver union-find oracle
    val parent = Array.tabulate(n)(identity)
    def find(x: Int): Int = { var r = x; while (parent(r) != r) r = parent(r); r }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a.toInt), find(b.toInt))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val expected = edges.flatMap(e => Seq(e._1, e._2)).distinct
      .map(id => id -> id.toLong).toMap.map { case (id, _) =>
        // component = min node id reachable: find gives the root, but
        // path compression order can leave root ≠ min only if union
        // didn't track mins — it does (always attach larger under
        // smaller), so find(x) IS the component minimum
        id -> find(id.toInt).toLong
      }
    assert(labelsOf(edges) === expected)
  }
}
