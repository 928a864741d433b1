package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Graph analytics over relations (SURVEY.md §2-C): PageRank as iterated
  * joins — the Pregel-style "superstep = shuffle" formulation that runs
  * unchanged on 1000 executors (d6/d8's label propagation covers the
  * connected-components family; this adds weighted centrality).
  *
  * Graph: the q58 co-purchase relation (parts co-ordered with support >=
  * 2), symmetrized — every node therefore has degree >= 1 and the
  * dangling-mass term vanishes. Ranks live in EXACT integer arithmetic
  * (scale 10^12; damping 0.85 applied as (85 * x) div 100 with the
  * teleport term the literal 15 * 10^12 div 100) so three unrolled
  * iterations land on bit-identical BIGINTs in both engines — the
  * suite's float-determinism discipline applied to an iterative
  * algorithm.
  *
  * Scale shapes: each iteration is one join keyed by src (ranks are
  * node-sized — broadcastable when the node set is small; keyed shuffle
  * co-partitioned with the edge list when it is not) plus one agg keyed
  * by dst. Iteration count is a constant 3 — the plan is a fixed DAG, no
  * driver loop over data.
  */
object Graph {
  /** Rank scale (10^12) — integer "fixed point" for PageRank mass. */
  val PrScale = 1000000000000L

  def pagerank(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val pairs = Aggregates.basketPairs(s, d)
    // The edge list feeds all three supersteps — persist it (KMeans
    // discipline: MEMORY_AND_DISK, unpersisted by the next action's GC)
    // or every iteration re-runs the basket self-join from the scan.
    val edges = pairs.select($"pa".as("src"), $"pb".as("dst"))
      .unionByName(pairs.select($"pb".as("src"), $"pa".as("dst")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val deg = edges.groupBy($"src").agg(count(lit(1)).as("deg"))
    def step(ranks: DataFrame): DataFrame =
      edges
        .join(ranks.join(deg, Seq("src"))
          .select($"src", expr("pr div deg").as("share")), Seq("src"))
        .groupBy($"dst").agg(sum($"share").as("insum"))
        .select($"dst".as("src"),
          expr("150000000000L + (85L * insum) div 100L").as("pr"))
    val r0 = deg.select($"src", lit(PrScale).as("pr"))
    val r3 = step(step(step(r0)))
    r3.join(deg, Seq("src"))
      .select($"src".as("node"), $"deg", $"pr".as("pr3"))
      .orderBy($"pr3".desc, $"node")
  }

  val pagerankSql: String =
    """WITH __PAIRS__,
      |edges AS (
      |  SELECT pa AS src, pb AS dst FROM pairs
      |  UNION ALL SELECT pb, pa FROM pairs),
      |deg AS (SELECT src, COUNT(*) AS deg FROM edges GROUP BY 1),
      |r0 AS (SELECT src, CAST(1000000000000 AS BIGINT) AS pr FROM deg),
      |r1 AS (
      |  SELECT e.dst AS src,
      |    150000000000 + (85 * SUM(r.pr // g.deg)) // 100 AS pr
      |  FROM edges e JOIN r0 r ON e.src = r.src JOIN deg g ON e.src = g.src
      |  GROUP BY 1),
      |r2 AS (
      |  SELECT e.dst AS src,
      |    150000000000 + (85 * SUM(r.pr // g.deg)) // 100 AS pr
      |  FROM edges e JOIN r1 r ON e.src = r.src JOIN deg g ON e.src = g.src
      |  GROUP BY 1),
      |r3 AS (
      |  SELECT e.dst AS src,
      |    150000000000 + (85 * SUM(r.pr // g.deg)) // 100 AS pr
      |  FROM edges e JOIN r2 r ON e.src = r.src JOIN deg g ON e.src = g.src
      |  GROUP BY 1)
      |SELECT r3.src AS node, deg.deg, CAST(r3.pr AS BIGINT) AS pr3
      |FROM r3 JOIN deg ON r3.src = deg.src
      |ORDER BY pr3 DESC, node""".stripMargin
      .replace("__PAIRS__", Aggregates.basketPairsCte)

  /** Exact per-node triangle counts on the co-purchase graph.
    *
    * Uses the oriented-edge formulation: basketPairs already emits each
    * undirected edge once as (pa < pb), so a triangle a<b<c is found by
    * exactly one wedge join (e1=(a,b)) ⋈_{b=a'} (e2=(b,c)) closed by the
    * edge (a,c) — no triangle is ever produced twice and no
    * symmetrization blow-up. Both joins are keyed equi-joins (shuffle by
    * node id) — the MapReduce node-iterator that scales to billions of
    * edges; at 100 TB the orientation switches from id-order to
    * degree-order ([[trianglesOriented]] with `degreeOrder = true`) to
    * bound wedge fan-out on hubs, which changes no output — triangle
    * sets are orientation-invariant under ANY consistent total order,
    * and ScaleSpec asserts the two variants row-identical at sf0.1.
    */
  def triangles(s: SparkSession, d: String): DataFrame =
    trianglesOriented(s, d, degreeOrder = false)

  /** The wedge-join triangle count under a chosen edge orientation:
    * id-order (the declared q63 — deterministic, zero extra passes) or
    * degree-order (orient each edge from its lower-(degree, id) endpoint
    * — the hub-bounding variant: a node's wedge fan-out is then capped by
    * its position in the degree order, O(m^1.5) work on skewed graphs
    * instead of O(Σ deg²)). Degree-ordering costs one extra degree
    * aggregate + two broadcast-sized joins on the edge list; the triangle
    * SET is identical because a triangle a≺b≺c is found exactly once by
    * the (a→b, b→c) wedge closed by a→c under ANY total order ≺.
    */
  private[graft] def trianglesOriented(
      s: SparkSession, d: String, degreeOrder: Boolean): DataFrame = {
    import s.implicits._
    val und = Aggregates.basketPairs(s, d).select($"pa".as("a"), $"pb".as("b"))
    val oriented = if (!degreeOrder) und else {
      val deg = und.select($"a".as("node"))
        .unionByName(und.select($"b".as("node")))
        .groupBy($"node").agg(count(lit(1)).as("dg"))
      val fwd = $"da" < $"db" || ($"da" === $"db" && $"a" < $"b")
      und
        .join(deg.select($"node".as("a"), $"dg".as("da")), Seq("a"))
        .join(deg.select($"node".as("b"), $"dg".as("db")), Seq("b"))
        .select(when(fwd, $"a").otherwise($"b").as("oa"),
          when(fwd, $"b").otherwise($"a").as("ob"))
        .select($"oa".as("a"), $"ob".as("b"))
    }
    val e = oriented
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val tri = e.as("e1")
      .join(e.as("e2"), $"e1.b" === $"e2.a")
      .select($"e1.a".as("a"), $"e1.b".as("b"), $"e2.b".as("c"))
      .join(e.select($"a".as("ca"), $"b".as("cb")),
        $"a" === $"ca" && $"c" === $"cb", "left_semi")
    val nodes = tri.select($"a".as("node"))
      .unionByName(tri.select($"b".as("node")))
      .unionByName(tri.select($"c".as("node")))
    nodes.groupBy($"node").agg(count(lit(1)).as("tri_cnt"))
      .orderBy($"tri_cnt".desc, $"node")
  }

  val trianglesSql: String =
    """WITH __PAIRS__,
      |e AS (SELECT pa AS a, pb AS b FROM pairs),
      |tri AS (
      |  SELECT e1.a AS a, e1.b AS b, e2.b AS c
      |  FROM e e1
      |  JOIN e e2 ON e1.b = e2.a
      |  WHERE EXISTS (SELECT 1 FROM e e3 WHERE e3.a = e1.a AND e3.b = e2.b)),
      |nodes AS (
      |  SELECT a AS node FROM tri
      |  UNION ALL SELECT b FROM tri
      |  UNION ALL SELECT c FROM tri)
      |SELECT node, COUNT(*) AS tri_cnt FROM nodes
      |GROUP BY 1 ORDER BY tri_cnt DESC, node""".stripMargin
      .replace("__PAIRS__", Aggregates.basketPairsCte)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q61_pagerank" -> (pagerank _),
    "q63_triangles" -> (triangles _))

  val oracle: Map[String, String] = Map(
    "q61_pagerank" -> pagerankSql,
    "q63_triangles" -> trianglesSql)
}
