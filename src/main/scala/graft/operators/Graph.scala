package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Graph analytics over co-occurrence graphs derived from relational data
  * (co-purchased parts, co-engaged users): edge extraction, degree stats,
  * exact triangle counting, and BFS hop distance. The reference delegates
  * this family to Greenplum SQL over its CDC-synced tables (reference:
  * README.md:9,15); here each step is a declarative Spark plan with the
  * classic distributed-graph shapes.
  *
  * Scale notes (100 TB contract):
  *   - Edge extraction bounds its quadratic step by `maxGroupSize`: a
  *     group of s nodes emits C(s,2) pairs, so the cap makes the explode
  *     ≤ cap²/2 per group and drops (and counts) pathological groups —
  *     the same skew-guard pattern as the dedup family's `bucketCap`.
  *   - Triangle counting uses the degree-ordered orientation (Suri &
  *     Vassilvitskii, WWW'11): every edge points from lower (degree, id)
  *     rank to higher, so a node's out-degree is O(√m) amortized and the
  *     wedge join never enumerates a hub's full neighborhood square.
  *   - BFS is a driver loop of frontier joins — O(diameter) jobs, each a
  *     hash join + distinct + anti-join keyed on the node id; per-level
  *     state is one (node, hop) row per vertex, never a path explosion
  *     (the recursive-CTE UNION ALL form would enumerate walks).
  */
object Graph {

  /** Undirected co-occurrence edges: distinct unordered pairs of `nodeCol`
    * values sharing a `groupCol` value, weighted by the number of distinct
    * groups the pair shares. Output: (a, b, w) with a < b, w ≥ `minWeight`.
    * Null groups/nodes are dropped by contract. Groups with more than
    * `maxGroupSize` distinct nodes are excluded entirely (a group that
    * large is a degenerate hub — a viral order, a crawler session — and
    * would contribute C(s,2) near-meaningless edges). The drop is silent
    * in-plan (the operator stays declarative — no eager audit job);
    * callers auditing coverage should count
    * `df.groupBy(group).agg(countDistinct(node)).filter(_ > cap)`
    * themselves, the same external-audit contract as the dedup family's
    * df caps.
    */
  def cooccurrenceEdges(df: DataFrame, groupCol: String, nodeCol: String,
      minWeight: Long = 1L, maxGroupSize: Int = 1000,
      scope: CacheScope = CacheScope.unmanaged): DataFrame = {
    require(minWeight >= 1, s"minWeight must be >= 1, got $minWeight")
    require(maxGroupSize >= 2, s"maxGroupSize must be >= 2, got $maxGroupSize")
    import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}
    val base = df
      .select(col(groupCol).as("g"), col(nodeCol).as("n"))
      .where(col("g").isNotNull && col("n").isNotNull)
    val nodeType = base.schema("n").dataType
    val integral = nodeType match {
      case LongType | IntegerType | ShortType | ByteType => true
      case _ => false
    }
    if (integral) {
      // TWO-shuffle path for integral nodes: ONE group-key shuffle whose
      // partial aggregates dedupe AND cap each group's distinct set in a
      // bounded buffer ([[graft.functions.BoundedDistinctAggregator]] —
      // degenerate groups surface as empty arrays without any task ever
      // holding more than cap+1 values), then map-side pair generation
      // from the sorted array, then the weight aggregate. The generic
      // path below pays four shuffles for the same answer.
      val bounded = org.apache.spark.sql.functions.udaf(
        new graft.functions.BoundedDistinctAggregator(maxGroupSize),
        org.apache.spark.sql.Encoders.scalaLong)
      val grouped = base.select(col("g"), col("n").cast("long").as("n"))
        .groupBy("g").agg(bounded(col("n")).as("ns"))
        .filter(size(col("ns")) >= 2)
      // pair (a, b) = (ns[i], ns[j]) for i < j: ascending array order
      // guarantees a < b, matching the generic path's x.n < y.n convention
      val pairs = grouped
        .select(col("ns"), posexplode(col("ns")).as(Seq("i", "a")))
        .select(col("a"),
          explode(slice(col("ns"), col("i") + lit(2), size(col("ns")))).as("b"))
      pairs.groupBy("a", "b").agg(count(lit(1)).as("w"))
        .filter(col("w") >= minWeight)
        .select(col("a").cast(nodeType).as("a"),
          col("b").cast(nodeType).as("b"), col("w"))
    } else {
      // cached: referenced by the size aggregate, the size join, and both
      // sides of the pair self-join — uncached, every reference re-embeds
      // the full upstream scan in the plan
      val nodes = scope.own(base.distinct()
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
      val sizes = nodes.groupBy("g").agg(count(lit(1)).as("sz"))
      val ok = nodes.join(sizes.filter(col("sz") <= maxGroupSize), Seq("g"))
        .select("g", "n")
      // self-join on the group key: both sides share the hash partitioning
      // on g, so Catalyst plans one exchange per side and the pair explode
      // stays inside the joined partitions
      val pairs = ok.as("x").join(ok.as("y"),
        col("x.g") === col("y.g") && col("x.n") < col("y.n"))
        .select(col("x.n").as("a"), col("y.n").as("b"))
      pairs.groupBy("a", "b").agg(count(lit(1)).as("w"))
        .filter(col("w") >= minWeight)
    }
  }

  /** The (a, b) projection of `edges`, persisted under `scope` UNLESS the
    * caller already persisted the incoming frame (re-caching a cached edge
    * list would double its block-manager footprint). Every iterative
    * operator references the edge list several times (degree projections,
    * adjacency directions, loop joins) — uncached, an expensive upstream
    * build (e.g. the co-occurrence pair aggregate) re-executes per
    * reference: measured 5× the build cost on the q122 bench.
    */
  private def ownedEdges(edges: DataFrame, scope: CacheScope): DataFrame = {
    val e = edges.select(col("a"), col("b"))
    if (edges.storageLevel != org.apache.spark.storage.StorageLevel.NONE) e
    else scope.own(e.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
  }

  /** Per-node degree over an (a, b) edge list with a < b and no duplicate
    * edges: one union of the two endpoint projections + one aggregate.
    */
  def degrees(edges: DataFrame): DataFrame =
    edges.select(col("a").as("node"))
      .unionByName(edges.select(col("b").as("node")))
      .groupBy("node").agg(count(lit(1)).as("degree"))

  /** Exact per-node triangle counts via degree-ordered adjacency
    * intersection. Input: (a, b) with a < b, distinct. Output:
    * (node, degree, n_tri) for every node, n_tri = triangles through the
    * node (0 for none).
    *
    * Orientation rank is the (degree, node) tuple — every edge points
    * rank-upward, so a node's out-degree is bounded at O(√(2m)) even when
    * the raw degree distribution is heavy-tailed (its out-neighbors all
    * have rank ≥ its own), and each triangle u→v, u→w, v→w is found
    * exactly once: at its lowest-rank edge (u,v), as w ∈ N⁺(u) ∩ N⁺(v).
    *
    * The intersection runs on collected out-neighbor LISTS (one bounded
    * array per node — ≤ √(2m) elements by the orientation bound), so the
    * only intermediate rows are the m edges carrying two arrays and the
    * actual triangles out of the explode. The earlier wedge-join
    * formulation materialized the Σ outdeg² wedge stream — 10-100× the
    * edge list — as a join input; the intersection does the same
    * Σ outdeg² element probes INSIDE a codegen'd expression without ever
    * shaping them into rows (measured ~3× on the q118 bench).
    *
    * `broadcastEdges = true` broadcasts the adjacency table into both
    * attach joins (it is one row per non-sink node — far smaller than the
    * edge list); the edge stream then never crosses an exchange. Leave it
    * false when nodes × out-degree exceeds broadcast budget and Catalyst
    * plans shuffle joins on src/dst instead.
    */
  def triangles(edges: DataFrame,
      scope: CacheScope = CacheScope.unmanaged,
      broadcastEdges: Boolean = false): DataFrame = {
    // edges feeds both degree projections plus the orientation join; deg
    // is read three times; oriented anchors the adjacency aggregate and
    // the edge stream — cache each so the plan references one
    // materialization instead of re-embedding the upstream subtree per leg
    val e0 = ownedEdges(edges, scope)
    val deg = scope.own(degrees(e0)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val e = e0
      .join(deg.withColumnRenamed("node", "a").withColumnRenamed("degree", "da"), Seq("a"))
      .join(deg.withColumnRenamed("node", "b").withColumnRenamed("degree", "db"), Seq("b"))
    // orient rank-upward: src = lower (degree, id) endpoint
    val aLower = col("da") < col("db") || (col("da") === col("db") && col("a") < col("b"))
    val oriented = scope.own(e.select(
      when(aLower, col("a")).otherwise(col("b")).as("src"),
      when(aLower, col("b")).otherwise(col("a")).as("dst"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    // persisted: adj anchors BOTH attach joins — without the cache the
    // collect_list aggregate executes once per leg
    val adj = scope.own(oriented.groupBy(col("src"))
      .agg(collect_list(col("dst")).as("nbrs"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val (adjU, adjV) =
      if (broadcastEdges) (broadcast(adj), broadcast(adj)) else (adj, adj)
    // attach N⁺(u) and N⁺(v) to each edge (u,v); sink dst nodes have no
    // adjacency row and can close no triangle — the inner join drops them
    val tri = oriented
      .join(adjU.select(col("src").as("_u"), col("nbrs").as("nu")),
        col("src") === col("_u"))
      .join(adjV.select(col("src").as("_v"), col("nbrs").as("nv")),
        col("dst") === col("_v"))
      .select(col("src").as("apex"), col("dst").as("v1"),
        explode(array_intersect(col("nu"), col("nv"))).as("v2"))
    val perNode = tri.select(col("apex").as("node"))
      .unionByName(tri.select(col("v1").as("node")))
      .unionByName(tri.select(col("v2").as("node")))
      .groupBy("node").agg(count(lit(1)).as("n_tri"))
    deg.join(perNode, Seq("node"), "left")
      .select(col("node"), col("degree"),
        coalesce(col("n_tri"), lit(0L)).as("n_tri"))
  }

  /** Integer-arithmetic PageRank over an undirected (a, b) edge list —
    * `iterations` damped rounds with every quantity a scaled long and
    * every division an integer floor, so the fixpoint replays bit-for-bit
    * in any engine (the standard double-arithmetic PageRank pins the
    * verifier to accumulation order). Per round:
    *
    *   r'(v) = (scale·15) div 100 + (85 · Σ_{u~v} (r(u) div deg(u))) div 100
    *
    * Scale contract: 85 · N · scale must stay under 2^63 — at the default
    * scale 10^12 that is N < 10^8 nodes; drop `scale` a decade per decade
    * of N beyond that. Floor-division mass loss is deterministic and
    * bounded by deg(u) per contribution — this is a RANKING signal, not a
    * probability (use the float form when you need the distribution; use
    * this when two engines must agree on every last digit).
    *
    * Shape: degrees and the degree-annotated adjacency are cached once
    * under `scope`; each round is one shuffle on the destination key plus
    * a broadcast-friendly left join back onto the node list (isolated
    * nodes hold the base term). The rank vector is one row per node —
    * the plan chain grows linearly in `iterations` (each round references
    * the previous once), no checkpoint needed for single-digit rounds.
    *
    * `broadcastRanks = true` is the bounded-node-count fast path: the
    * adjacency is hash-partitioned ON THE DESTINATION once at build time
    * and the rank vector (whose checkpointed stats Catalyst can't see)
    * is broadcast into each round's join — the loop body then plans ZERO
    * exchanges per round (pay one shuffle once, not one per iteration;
    * the bucketed-join argument). Opt-in only: it asserts the PER-NODE
    * rank vector fits a broadcast, which holds for a bounded entity graph
    * (q122's part co-purchase graph — nodes ≤ part count) but not for a
    * 10⁸-node web graph — leave it false there and each round runs the
    * fully-distributed one-shuffle plan.
    *
    * Output: (node, rank) for every node of the edge list.
    */
  def pagerankInt(edges: DataFrame, iterations: Int,
      scale: Long = 1000000000000L,
      scope: CacheScope = CacheScope.unmanaged,
      broadcastRanks: Boolean = false): DataFrame = {
    require(iterations >= 1 && iterations <= 20,
      s"iterations must be in [1, 20], got $iterations")
    require(scale >= 100, s"scale must be >= 100, got $scale")
    val e0 = ownedEdges(edges, scope)
    val deg = scope.own(degrees(e0)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    // adjacency with the SOURCE endpoint's degree attached, both directions
    val undBase = e0.unionByName(e0.select(col("b").as("a"), col("a").as("b")))
      .join(deg.withColumnRenamed("node", "a").withColumnRenamed("degree", "dega"), Seq("a"))
    val und = scope.own(
      (if (broadcastRanks) undBase.repartition(col("b")) else undBase)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val base = scale * 15L / 100L
    var rank = deg.select(col("node"), lit(scale).as("rank"))
    for (i <- 1 to iterations) {
      val rs = if (broadcastRanks) broadcast(rank) else rank
      val contrib = und.join(rs, und("a") === rs("node"))
        .select(und("b"), expr("rank div dega").as("c"))
        .groupBy("b").agg(sum(col("c")).as("x"))
      val cs = if (broadcastRanks) broadcast(contrib) else contrib
      rank = deg.select(col("node"))
        .join(cs, col("node") === col("b"), "left")
        .select(col("node"),
          (lit(base) + expr("(85 * coalesce(x, 0L)) div 100")).as("rank"))
      // materialize each round: the rank vector is the BROADCAST side of
      // the next round's join, and a broadcast build re-executes its full
      // plan — uncut, round k would replay rounds 1..k-1 (quadratic work)
      if (i < iterations) rank = rank.localCheckpoint()
    }
    rank
  }

  /** Min-hop BFS distances from `source` over an undirected (a, b) edge
    * list, bounded at `maxDepth`. Output: (node, hops) for every node
    * reached within the bound (the source itself at hops = 0).
    *
    * Driver loop of frontier expansions: each level is frontier ⋈ edges →
    * distinct → anti-join visited. Per-level state is one row per vertex —
    * never a path enumeration, so the loop is walk-explosion-free on dense
    * graphs where a recursive UNION ALL would enumerate d^depth walks.
    * Unreached-within-bound nodes are absent by contract (mirror the bound
    * in any oracle).
    *
    * Plan-growth control: each level's frontier is `localCheckpoint`ed
    * (one job per level — the same lineage cut as `connectedComponents`);
    * `visited` is NOT checkpointed but kept as a flat union of the already-
    * checkpointed frontiers, so its plan is O(levels) deep and costs no
    * extra job — without the frontier cut the level-k plan would embed
    * level k-1 twice (once per join) and grow 2^k: the plan, not the data,
    * is what explodes in an iterative dataflow.
    *
    * `broadcastState = true` broadcasts the frontier into the expansion
    * join and the visited set into the anti-join, so the (persisted)
    * adjacency never crosses an exchange — one tiny shuffle (the distinct)
    * per level instead of three. Opt-in only: it asserts the REACHABLE
    * COMPONENT fits in one executor's memory, which holds for filtered
    * signal graphs (q121's weight≥2 co-purchase graph) but not for a
    * 100 TB social graph — leave it false there and the loop stays fully
    * distributed. The edge list is cached under `scope` for the loop's
    * lifetime.
    */
  def bfsHops(edges: DataFrame, source: Long, maxDepth: Int,
      scope: CacheScope = CacheScope.unmanaged,
      broadcastState: Boolean = false): DataFrame = {
    require(maxDepth >= 0, s"maxDepth must be >= 0, got $maxDepth")
    val spark = edges.sparkSession
    import spark.implicits._
    // edges cached BEFORE the two-direction union: an expensive upstream
    // build would otherwise execute once per union leg
    val e0 = ownedEdges(edges, scope)
    val und = scope.own(
      e0.unionByName(e0.select(col("b").as("a"), col("a").as("b")))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    var visited = Seq((source, 0)).toDF("node", "hops").localCheckpoint()
    var frontier = visited
    var level = 0
    var done = maxDepth == 0
    while (!done) {
      level += 1
      val f = if (broadcastState) broadcast(frontier) else frontier
      val seen = if (broadcastState) broadcast(visited) else visited
      // anti-join BEFORE distinct: already-visited neighbors (the bulk on
      // an expanding frontier) never enter the distinct's exchange
      val next = f.as("f").join(und.as("u"), col("f.node") === col("u.a"))
        .select(col("u.b").as("node"))
        .join(seen, Seq("node"), "left_anti")
        .distinct()
        .withColumn("hops", lit(level))
        .localCheckpoint()
      if (next.isEmpty) done = true
      else {
        visited = visited.unionByName(next)
        frontier = next
        if (level >= maxDepth) done = true
      }
    }
    visited
  }

  /** Connected components via alternating large-star / small-star rounds
    * (Kiveris et al., "Connected Components in MapReduce and Beyond",
    * SoCC'14). Input: (a, b) edge list (any orientation, duplicates fine);
    * output: (node, component) for every endpoint, component = the MIN
    * node id of its component — the same labeling as
    * [[Dedup.connectedComponents]].
    *
    * Why a second CC operator: the label-propagation loop converges in
    * O(diameter) rounds — right for near-duplicate clusters (tiny stars)
    * but wrong for a 100 TB graph with a long path in it. Star contraction
    * converges in O(log² n) rounds REGARDLESS of diameter, each round two
    * node-keyed aggregates + a distinct — the shape that survives a
    * 1000-executor graph. Per round:
    *   - large-star: every neighbor LARGER than u re-attaches to
    *     m = min(Γ(u) ∪ u) — hub fan-out collapses toward minima without
    *     ever growing a node's neighborhood;
    *   - small-star: orient edges large→small, then u and its (all
    *     smaller) neighbors attach to their min — flattening chains.
    * Both emit strictly-smaller-total-order edge sets, so the fixpoint
    * (star forests: every node points directly at its component min) is
    * reached monotonically; we require convergence within `maxIterations`
    * like the propagation loop, never returning a half-contracted forest.
    *
    * Convergence test: count + two order-insensitive exact sums
    * (Σ xxhash64(u,v), Σ u+v) — one tiny aggregate per round instead of an
    * except() anti-join shuffle. A collision would need two DIFFERENT edge
    * multisets with equal count and equal 128 bits of sums in adjacent
    * rounds of a monotone contraction — not a realistic failure mode; the
    * alternative exact check costs a full shuffle per round at 100 TB.
    *
    * Each round `localCheckpoint`s the edge set — the same lineage cut as
    * [[bfsHops]]: round k's plan would otherwise embed round k−1 several
    * times (two aggregates + the union read it) and grow geometrically.
    */
  def ccLargeSmallStar(edges: DataFrame, maxIterations: Int = 30,
      scope: CacheScope = CacheScope.unmanaged): DataFrame = {
    require(maxIterations >= 1, s"maxIterations must be >= 1, got $maxIterations")
    val e0 = ownedEdges(edges, scope)
    var e = e0.select(col("a").cast("long").as("u"), col("b").cast("long").as("v"))
      .where(col("u").isNotNull && col("v").isNotNull && col("u") =!= col("v"))
      .select(greatest(col("u"), col("v")).as("u"), least(col("u"), col("v")).as("v"))
      .distinct()
      .localCheckpoint()

    // decimal sums: a long sum of 2^63-range hashes overflows under ANSI
    def checksum(df: DataFrame): (Long, String, String) = {
      val r = df.agg(count(lit(1)),
        sum(xxhash64(col("u"), col("v")).cast("decimal(38,0)")),
        sum(col("u").cast("decimal(38,0)") + col("v"))).head()
      (r.getLong(0), String.valueOf(r.get(1)), String.valueOf(r.get(2)))
    }

    def largeStar(cur: DataFrame): DataFrame = {
      val und = cur.unionByName(cur.select(col("v").as("u"), col("u").as("v")))
      val mins = und.groupBy("u").agg(min(col("v")).as("mn"))
        .select(col("u"), least(col("u"), col("mn")).as("m"))
      und.join(mins, "u").where(col("v") > col("u"))
        .select(col("v").as("u"), col("m").as("v"))
        .where(col("u") =!= col("v")).distinct()
    }

    def smallStar(cur: DataFrame): DataFrame = {
      // edges already oriented u > v (kept canonical each round)
      val mins = cur.groupBy("u").agg(min(col("v")).as("m"))
      cur.join(mins, "u")
        .select(col("v").as("u"), col("m").as("v"))
        .unionByName(mins.select(col("u"), col("m").as("v")))
        .where(col("u") =!= col("v")).distinct()
    }

    var sig = checksum(e)
    var converged = false
    var iter = 0
    while (!converged && iter < maxIterations) {
      iter += 1
      val next = smallStar(largeStar(e))
        // re-canonicalize: large-star can emit (smaller, larger) pairs
        .select(greatest(col("u"), col("v")).as("u"), least(col("u"), col("v")).as("v"))
        .distinct()
        .localCheckpoint()
      val nextSig = checksum(next)
      converged = nextSig == sig
      sig = nextSig
      e = next
    }
    require(converged, s"ccLargeSmallStar did not converge in $maxIterations rounds")
    // fixpoint is a star forest: every non-min node points directly at its
    // component min, so the direct neighbor min IS the component label
    val und = e.unionByName(e.select(col("v").as("u"), col("u").as("v")))
    und.groupBy("u").agg(min(col("v")).as("mn"))
      .select(col("u").as("node"), least(col("u"), col("mn")).as("component"))
  }

  /** k-core: the maximal subgraph in which every node has degree ≥ k —
    * the standard graph-density filter (core nodes of a co-purchase /
    * citation / social graph survive; tendrils and leaves peel away).
    * Input: (a, b) edge list (any orientation, duplicates fine); output:
    * (node, core_degree) for every node of the k-core, core_degree = the
    * node's degree WITHIN the core (≥ k by definition).
    *
    * Algorithm: synchronous peeling — drop every node with current degree
    * < k, delete its edges, repeat to fixpoint. Each round is one degree
    * aggregate + two semi-joins over the surviving edge list; the result
    * is the same for any peeling order (the k-core is unique), so the
    * synchronous rounds need no ordering coordination across executors —
    * the property that makes peeling embarrassingly distributable.
    *
    * Scale shape: the edge list only ever SHRINKS, so round cost is
    * monotonically decreasing; each round is node-keyed aggregate +
    * semi-joins (AQE broadcasts the alive set once it fits). One action
    * per round — the convergence test reuses the checkpointed edge count:
    * `next ⊆ cur`, so equal COUNT implies equal SET, no except() shuffle.
    * Rounds are O(peel depth) ≤ O(max degeneracy ordering length); dense
    * cores converge in a handful of rounds. Each round `localCheckpoint`s
    * the survivor set — the same lineage cut as [[bfsHops]].
    */
  def kCore(edges: DataFrame, k: Int, maxIterations: Int = 60,
      scope: CacheScope = CacheScope.unmanaged): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(maxIterations >= 1, s"maxIterations must be >= 1, got $maxIterations")
    val e0 = ownedEdges(edges, scope)
    var cur = e0.select(col("a").cast("long").as("a"), col("b").cast("long").as("b"))
      .where(col("a").isNotNull && col("b").isNotNull && col("a") =!= col("b"))
      .select(least(col("a"), col("b")).as("a"), greatest(col("a"), col("b")).as("b"))
      .distinct()
      .localCheckpoint()
    var m = cur.count()
    var converged = m == 0L
    var iter = 0
    while (!converged && iter < maxIterations) {
      iter += 1
      val alive = degrees(cur).where(col("degree") >= k).select(col("node"))
      val next = cur
        .join(alive.select(col("node").as("a")), Seq("a"), "left_semi")
        .join(alive.select(col("node").as("b")), Seq("b"), "left_semi")
        .select(col("a"), col("b"))
        .localCheckpoint()
      val m2 = next.count()
      converged = m2 == m // next ⊆ cur: equal count ⇔ no node peeled
      m = m2
      cur = next
    }
    require(converged, s"kCore did not converge in $maxIterations rounds")
    degrees(cur).withColumnRenamed("degree", "core_degree")
  }
}
