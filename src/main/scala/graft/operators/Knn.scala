package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.Tables
import graft.functions.VectorFunctions._

/** Exact k-NN operators — the relational re-expression of zvdb's
  * `search` (`src/hnsw.zig:194-236`) and of the index build
  * (`insert`/`connect`/`shrinkConnections`, `src/hnsw.zig:73-170`).
  *
  * Semantics carried over from the reference (SURVEY §2.2):
  *   - distance is squared L2 (`src/hnsw.zig:191`), ascending;
  *   - up to k results, k > n returns n (`src/test_hnsw.zig:121-125`);
  *   - duplicates are retrievable (`src/test_hnsw.zig:104-126`);
  *   - empty corpus → empty result (`src/hnsw.zig:198-201`).
  * Plus one strengthening: ties broken on id, so results are fully
  * deterministic (the reference's ordering is unstable under ties).
  *
  * Scale design:
  *   - single-query top-k is `ORDER BY dist LIMIT k` → Spark plans
  *     `TakeOrderedAndProject`: each partition keeps a bounded k-heap,
  *     the driver merges P×k rows. No global sort, no full shuffle —
  *     at 100 TB this is scan + map + tiny reduce.
  *   - batch k-NN broadcasts the (small) query set against the
  *     (arbitrarily large) corpus, then takes per-query top-k with a
  *     window. The corpus side never shuffles its vectors for the
  *     join; only (query_id, vec_id, dist) tuples — k·Q rows after
  *     partial filtering — move.
  *   - the k-NN graph is the one genuinely quadratic operator; it is
  *     kept exact here (n is small at test SFs) and the scale path is
  *     the LSH-bucketed variant in [[Ann]], which turns O(n²) into a
  *     banded equi-join.
  */
object Knn {

  /** Corpus with id, label, DOUBLE-cast embedding. */
  private def corpus(s: SparkSession, d: String): DataFrame =
    Tables.embeddings(s, d)

  /** Top-k nearest to the embedding of `vec_id = qid` (flagship).
    * The k-row result is broadcast back against the corpus to recover
    * `label` — the big side is never shuffled. */
  def knnTopK(s: SparkSession, d: String, qid: Long = 0L, k: Int = 10): DataFrame = {
    val e = corpus(s, d)
    val q = e.filter(col("vec_id") === qid)
    val topk = BroadcastKnnJoin(s, e, q, k)
      .select(col("vec_id"), col("dist"))
    broadcast(topk)
      .join(e.select(col("vec_id"), col("label")), Seq("vec_id"))
      .select(col("vec_id"), col("label"), col("dist"))
      .orderBy(col("dist"), col("vec_id"))
  }

  /** [[knnTopK]] returning the STORED vectors alongside ids and
    * distances — the reference's `search` result carries the point
    * itself (`src/hnsw.zig:214`, asserted `src/test_hnsw.zig:55-68`).
    * Same broadcast shape: the k-row result is joined back against the
    * corpus; the big side never shuffles. */
  def knnTopKWithVectors(s: SparkSession, d: String, qid: Long = 0L, k: Int = 10): DataFrame = {
    val e = corpus(s, d)
    val q = e.filter(col("vec_id") === qid)
    val topk = BroadcastKnnJoin(s, e, q, k)
      .select(col("vec_id"), col("dist"))
    broadcast(topk)
      .join(e.select(col("vec_id"), col("label"), col("embedding")), Seq("vec_id"))
      .select(col("vec_id"), col("label"), col("embedding"), col("dist"))
      .orderBy(col("dist"), col("vec_id"))
  }

  /** Gate form of [[knnTopKWithVectors]]: the stored vector is exploded
    * to (pos, val) rows so every declared column is scalar — the
    * correctness harness compares rows via pandas sorting, which cannot
    * order array cells. Same result content: k·dim rows instead of k
    * array rows. The typed-array API above remains the programmatic
    * surface. */
  def knnTopKWithVectorsExploded(s: SparkSession, d: String, qid: Long = 0L, k: Int = 10): DataFrame =
    knnTopKWithVectors(s, d, qid, k)
      .select(col("vec_id"), col("label"), col("dist"),
        posexplode(col("embedding")).as(Seq("pos", "val")))
      .orderBy(col("dist"), col("vec_id"), col("pos"))

  /** Batch k-NN: for every query vector (vec_id < nq), its k nearest
    * corpus vectors — batch form of zvdb `search`. Routes through the
    * first-class Catalyst operator ([[graft.plans.KnnJoinPlan]] →
    * `KnnJoinExec`): same algorithm and bit-identical results as
    * [[BroadcastKnnJoin]] (KnnSpec pins the parity; the gate proves it
    * against DuckDB), planned as a custom physical node. */
  def knnBatch(s: SparkSession, d: String, nq: Int = 10, k: Int = 10): DataFrame = {
    val e = corpus(s, d)
    val q = e.filter(col("vec_id") < nq)
    graft.plans.KnnJoin.exact(e, q, k)
      .select(col("query_id"), col("vec_id"), col("dist"), col("rnk"))
      .orderBy(col("query_id"), col("rnk"))
  }

  /** FILTERED batch k-NN — metadata-constrained vector search, the
    * production vector-DB feature every store advertises (and graph
    * indexes struggle with: an HNSW walk under a filter must
    * over-expand or detour around excluded nodes, degrading recall
    * unpredictably — the reference has no filtering at all). In the
    * relational formulation it is EXACT and free: the predicate
    * evaluates inside the scan's codegen stage (and pushes into the
    * parquet reader whenever it is a pushable comparison), the k-NN
    * join streams only qualifying rows, and results are the true
    * top-k of the filtered corpus by construction. Queries keep vec_id < nq
    * (unfiltered); the corpus keeps only rows with even `label` — a
    * stand-in for any metadata predicate. */
  def knnFiltered(s: SparkSession, d: String, nq: Int = 10, k: Int = 10): DataFrame = {
    val e = corpus(s, d)
    val q = e.filter(col("vec_id") < nq)
    graft.plans.KnnJoin.exact(e.filter(col("label") % 2 === 0), q, k)
      .select(col("query_id"), col("vec_id"), col("dist"), col("rnk"))
      .orderBy(col("query_id"), col("rnk"))
  }

  /** Range search — the ε-ball query of the vector-DB category: every
    * corpus vector within squared-L2 `eps` of the query point, nearest
    * first. Same physics as [[knnTopK]] minus the limit: 1-row
    * broadcast + map-only distance filter, so the predicate runs
    * inside the scan's codegen stage and only matches move. The
    * corpus×corpus form is [[BlockKnnJoin.epsilonJoin]]
    * (`neardup_pairs`). */
  def rangeSearch(s: SparkSession, d: String, qid: Long = 0L, eps: Double = 1.5): DataFrame = {
    val e = corpus(s, d)
    val q = e.filter(col("vec_id") === qid).select(col("embedding").as("qv"))
    e.crossJoin(broadcast(q))
      .select(col("vec_id"), col("label"),
        squaredL2(col("embedding"), col("qv")).as("dist"))
      .filter(col("dist") < eps)
      .orderBy(col("dist"), col("vec_id"))
  }

  /** m-nearest-neighbor graph over the corpus — the relational
    * materialization of the HNSW adjacency after `shrinkConnections`
    * pruning to m (`src/hnsw.zig:143-170`), m=16 as in every reference
    * config. Excludes self-edges. Both sides are the corpus, so this
    * uses the block-partitioned self-join ([[BlockKnnJoin]]) — nothing
    * is collected to the driver. */
  def knnGraph(s: SparkSession, d: String, m: Int = 16): DataFrame = {
    val e = corpus(s, d)
    BlockKnnJoin.knnGraph(s, e, m)
      .select(
        col("query_id").as("src"), col("vec_id").as("dst"),
        col("dist"), col("rnk"))
      .orderBy(col("src"), col("rnk"))
  }

  /** PageRank over the m-NN graph — graph CENTRALITY for data
    * selection: items central in the neighborhood graph are
    * representative (keep for coresets), low-rank items are outliers
    * (candidates for quality review). The m-NN graph is the index
    * adjacency the engine already materializes ([[knnGraph]] here;
    * [[Ann]]'s `hnsw_edges_approx` is the same-schema scale path, so
    * the operator composes with the approximate build unchanged).
    *
    * All arithmetic is SCALED-INTEGER (pr values are multiples of
    * 1e-12 held in BIGINT, floor division throughout), so every
    * iteration is bit-exact in any execution order and in DuckDB —
    * the [[graft.operators.Similarity.kmeansIter]] treatment applied
    * to an iterative graph algorithm. Contributions divide by each
    * node's ACTUAL out-degree (one O(E) count + equi-join): on the
    * exact m-NN graph that equals the structural min(m, n−1) and the
    * oracle keeps its constant divisor, while the approximate arm's
    * short lists keep their full rank mass. Nodes with in-degree 0
    * (outliers nobody lists as a neighbor) keep the teleport term via
    * the left join — exactly the low-rank detection the operator is
    * for.
    *
    * Scale shape: the edge table materializes ONCE (localCheckpoint —
    * n·m rows); each of the `iters` rounds is one equi-join of edges
    * against the n-row rank table plus a map-side-combined sum — O(E)
    * per round, no corpus-sized window, no driver-side state beyond
    * the two scalars (n, and the checkpoint handles). */
  /** The full (vec_id, pr) rank table of [[knnPagerank]]'s
    * recurrence — shared by the top-k view and [[coresetSelect]]. */
  /** The recurrence itself over an ARBITRARY (src, dst) edge table —
    * shared by the exact arm ([[pagerankRanks]], gate-oracled) and
    * the approximate scale arm ([[knnPagerankApprox]]): the adjacency
    * is pluggable because both tables share the m-NN schema, which is
    * the composition the operator docs promise. */
  private def pagerankRanksFrom(edges0: DataFrame, ids: DataFrame,
                                n: Long, iters: Int,
                                odConst: Option[Long] = None): DataFrame = {
    val Scale = 1000000000000L
    val tele = 15L * Scale / (100L * n)
    // Each node's contribution divides by its out-degree. On the EXACT
    // m-NN graph that degree is STRUCTURALLY min(m, n−1) — every node
    // has exactly that many out-edges by construction, which is also
    // the constant the oracle divides by — so the gate-oracled arm
    // passes `odConst` and skips the O(E) degree count + equi-join +
    // its eager checkpoint entirely (r14: one E-sized exchange and one
    // materialization removed per centrality call, value-identical).
    // The approximate adjacency can ship short lists (sampled recall
    // ~0.90 after a capture-floor escalation), where a constant
    // divisor silently drops rank mass — that arm keeps the measured
    // out-degree join.
    val base = edges0.localCheckpoint()
    val edges = odConst match {
      case Some(od) => base.withColumn("od", lit(od))
      case None =>
        val j = base
          .join(base.groupBy(col("src")).agg(count(lit(1)).as("od")), "src")
          .localCheckpoint()
        // base is dead once the od-joined table materializes (the line
        // above is an EAGER checkpoint) — free its blocks instead of
        // leaking an E-sized table per centrality call. The same
        // discipline holds THROUGH the loop: each round's rank
        // checkpoint only needs `edges` and its predecessor, so the
        // predecessor frees as soon as its successor materializes, and
        // the E-sized edge table frees after the last round — a call
        // leaves ONE n-row rank table (the deliverable the caller
        // reads) instead of the od-join plus `iters` intermediates.
        // Failure path frees everything.
        Ann.freeBuildState(base)
        j
    }
    // the E-sized checkpoint this call owns and must free at the end:
    // `edges` itself when the od-join re-checkpointed, the raw `base`
    // when odConst made edges a mere projection of it
    val edgesOwned = if (odConst.isDefined) base else edges
    var pr = ids.select(col("id"), lit(Scale / n).as("pr"))
    var prevCkpt: DataFrame = null
    try {
      (1 to iters).foreach { _ =>
        val contrib = edges.join(pr, edges("src") === pr("id"))
          .select(col("dst"), expr(s"(85 * pr) div (100 * od)").as("c"))
          .groupBy(col("dst")).agg(sum(col("c")).as("c"))
        val next = ids.join(contrib, col("id") === col("dst"), "left")
          .select(col("id"), (lit(tele) + coalesce(col("c"), lit(0L))).as("pr"))
          .localCheckpoint()
        if (prevCkpt != null) Ann.freeBuildState(prevCkpt)
        prevCkpt = next
        pr = next
      }
    } catch {
      case t: Throwable =>
        if (prevCkpt != null) Ann.freeBuildState(prevCkpt)
        Ann.freeBuildState(edgesOwned)
        throw t
    }
    Ann.freeBuildState(edgesOwned)
    pr.select(col("id").as("vec_id"), col("pr"))
  }

  private def pagerankRanks(s: SparkSession, d: String,
                            m: Int, iters: Int): DataFrame = {
    val e = corpus(s, d)
    val n = e.count()
    val edges = BlockKnnJoin.knnGraph(s, e, m)
      .select(col("query_id").as("src"), col("vec_id").as("dst"))
    // exact arm: out-degree is structurally min(m, n−1) — pass the
    // constant, skip the O(E) degree join (see pagerankRanksFrom)
    pagerankRanksFrom(edges, e.select(col("vec_id").as("id")), n, iters,
      odConst = Some(math.min(m.toLong, n - 1)))
  }

  /** The composed SCALE-PATH centrality: the identical scaled-integer
    * recurrence over the APPROXIMATE index adjacency —
    * [[graft.operators.Ann.hnswEdgesApprox]]'s level-0 slice, the
    * same (src, dst) schema as [[knnGraph]] — so the full lifecycle
    * (build → centrality → coreset) has no O(n²) stage anywhere.
    * [[pagerankRanksFrom]] divides by each node's ACTUAL out-degree,
    * so a short neighbor list (possible after a capture-floor
    * escalation that lands at ~0.90 sampled recall) keeps its full
    * rank mass instead of leaking it — on the exact arm every node
    * has exactly min(m, n−1) out-edges and the division is
    * value-identical. Top-k rank overlap vs the exact-graph arm is pinned in
    * KnnSpec (not gate-declared: the gate's exact arm stays the
    * oracle surface; this arm exists for corpora where the exact
    * graph is unaffordable). */
  def knnPagerankApprox(s: SparkSession, d: String, m: Int = 16,
                        iters: Int = 3, k: Int = 20): DataFrame = {
    val e = corpus(s, d)
    val n = e.count()
    // the PLAIN top-m slice of the approximate build's wide state —
    // centrality is a k-NN-graph measure, so it reads the k-NN view,
    // not the diversity-pruned SERVING adjacency (see
    // [[graft.operators.Ann.hnswEdgesApproxTopM]])
    val edges = Ann.hnswEdgesApproxTopM(s, d, m)
      .filter(col("level") === 0)
      .select(col("src"), col("dst"))
    pagerankRanksFrom(edges, e.select(col("vec_id").as("id")), n, iters)
      .orderBy(col("pr").desc, col("vec_id"))
      .limit(k)
  }

  def knnPagerank(s: SparkSession, d: String, m: Int = 16,
                  iters: Int = 3, k: Int = 20): DataFrame =
    pagerankRanks(s, d, m, iters)
      .orderBy(col("pr").desc, col("vec_id"))
      .limit(k)

  /** CORESET selection — the data-selection step [[knnPagerank]]'s
    * centrality exists for: per label (stratum), keep the `perLabel`
    * most central vectors of the m-NN graph — a balanced,
    * representative subset (central items summarize their
    * neighborhood; the stratification keeps rare labels represented,
    * the [[graft.operators.TextOps]] `stratified_sample` policy with
    * centrality replacing the seeded hash as the keep-order).
    *
    * Shape: the rank table joins labels (corpus-keyed equi-join) and
    * a per-label top-`perLabel` window runs over label partitions —
    * one shuffle of (id, label, pr) triples, WindowGroupLimit prunes
    * map-side, never the vectors themselves. */
  def coresetSelect(s: SparkSession, d: String, m: Int = 16,
                    iters: Int = 3, perLabel: Int = 5): DataFrame = {
    val w = Window.partitionBy("label").orderBy(col("pr").desc, col("vec_id"))
    pagerankRanks(s, d, m, iters)
      .join(corpus(s, d).select(col("vec_id"), col("label")), "vec_id")
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= perLabel)
      .select(col("label"), col("rnk"), col("vec_id"), col("pr"))
      .orderBy(col("label"), col("rnk"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "knn_topk"              -> ((s, d) => knnTopK(s, d)),
    "knn_pagerank"          -> ((s, d) => knnPagerank(s, d)),
    "coreset_select"        -> ((s, d) => coresetSelect(s, d)),
    "knn_topk_with_vectors" -> ((s, d) => knnTopKWithVectorsExploded(s, d)),
    "knn_batch"             -> ((s, d) => knnBatch(s, d)),
    "knn_filtered"          -> ((s, d) => knnFiltered(s, d)),
    "knn_graph"             -> ((s, d) => knnGraph(s, d)),
    "range_search"          -> ((s, d) => rangeSearch(s, d))
  )

  private val distExpr =
    "list_sum(list_transform(list_zip(%s, %s), p -> (p[1]-p[2])*(p[1]-p[2])))"

  val oracles: Map[String, String] = Map(
    "knn_topk" ->
      s"""WITH e AS (SELECT vec_id, label, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
         |q AS (SELECT v AS qv FROM e WHERE vec_id = 0)
         |SELECT e.vec_id, e.label, ${distExpr.format("e.v", "q.qv")} AS dist
         |FROM e, q ORDER BY dist, vec_id LIMIT 10""".stripMargin,
    "knn_topk_with_vectors" ->
      s"""WITH e AS (SELECT vec_id, label, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
         |q AS (SELECT v AS qv FROM e WHERE vec_id = 0),
         |topk AS (SELECT e.vec_id, e.label, e.v, ${distExpr.format("e.v", "q.qv")} AS dist
         |         FROM e, q ORDER BY dist, vec_id LIMIT 10)
         |SELECT t.vec_id, t.label, t.dist, CAST(j.j AS INT) AS pos,
         |       list_extract(t.v, j.j + 1) AS val
         |FROM topk t CROSS JOIN (SELECT unnest(generate_series(0, 63)) AS j) j
         |ORDER BY t.dist, t.vec_id, pos""".stripMargin,
    "knn_batch" ->
      s"""WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
         |q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 10),
         |d AS (SELECT q.query_id, e.vec_id, ${distExpr.format("e.v", "q.qv")} AS dist FROM e, q),
         |r AS (SELECT query_id, vec_id, dist,
         |        row_number() OVER (PARTITION BY query_id ORDER BY dist, vec_id) AS rnk FROM d)
         |SELECT query_id, vec_id, dist, rnk FROM r WHERE rnk <= 10
         |ORDER BY query_id, rnk""".stripMargin,
    "knn_filtered" ->
      s"""WITH e AS (SELECT vec_id, label, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
         |q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 10),
         |d AS (SELECT q.query_id, e.vec_id, ${distExpr.format("e.v", "q.qv")} AS dist
         |      FROM e, q WHERE e.label % 2 = 0),
         |r AS (SELECT query_id, vec_id, dist,
         |        row_number() OVER (PARTITION BY query_id ORDER BY dist, vec_id) AS rnk FROM d)
         |SELECT query_id, vec_id, dist, rnk FROM r WHERE rnk <= 10
         |ORDER BY query_id, rnk""".stripMargin,
    "knn_graph" ->
      s"""WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
         |d AS (SELECT l.vec_id AS src, r.vec_id AS dst, ${distExpr.format("l.v", "r.v")} AS dist
         |      FROM e l, e r WHERE l.vec_id <> r.vec_id),
         |g AS (SELECT src, dst, dist,
         |        row_number() OVER (PARTITION BY src ORDER BY dist, dst) AS rnk FROM d)
         |SELECT src, dst, dist, rnk FROM g WHERE rnk <= 16
         |ORDER BY src, rnk""".stripMargin,
    "range_search" ->
      s"""WITH e AS (SELECT vec_id, label, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
         |q AS (SELECT v AS qv FROM e WHERE vec_id = 0)
         |SELECT e.vec_id, e.label, ${distExpr.format("e.v", "q.qv")} AS dist
         |FROM e, q WHERE ${distExpr.format("e.v", "q.qv")} < 1.5
         |ORDER BY dist, vec_id""".stripMargin,
    "knn_pagerank" -> knnPagerankOracle(3),
    "coreset_select" ->
      s"""${pagerankCtes(3)},
         |lab AS (SELECT p.id, e2.label, p.pr FROM pr3 p
         |        JOIN embeddings e2 ON e2.vec_id = p.id),
         |r AS (SELECT label, id, pr,
         |        row_number() OVER (PARTITION BY label ORDER BY pr DESC, id) AS rnk
         |      FROM lab)
         |SELECT label, CAST(rnk AS INT) AS rnk, id AS vec_id, pr
         |FROM r WHERE rnk <= 5 ORDER BY label, rnk""".stripMargin
  )

  /** [[knnPagerank]]'s oracle: the knn_graph CTE + `iters` unrolled
    * scaled-integer rounds (teleport + floor-divided contributions via
    * LEFT JOIN, the engine's exact arithmetic restated). Out-degree is
    * the m-NN structural constant least(16, n−1). */
  private def knnPagerankOracle(iters: Int): String =
    s"${pagerankCtes(iters)}\n" +
      s"SELECT id AS vec_id, pr FROM pr$iters ORDER BY pr DESC, id LIMIT 20"

  /** The shared CTE chain ending with `pr$iters` — reused by the
    * coreset_select oracle.
    *
    * Every round's contribution sum and rank projection are CAST to
    * BIGINT: DuckDB widens `sum(BIGINT)` to HUGEINT, which its pandas
    * bridge then narrows to float64 — dtype-distinct from Spark's
    * int64 even though every value is bit-identical (max pr ≈ 3.5e9
    * ≪ 2^53), so the driver's dtype-sensitive hash rejects it. The
    * casts keep the oracle in BIGINT end to end. */
  private def pagerankCtes(iters: Int): String = {
    val header =
      s"""WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
         |dd AS (SELECT l.vec_id AS src, r.vec_id AS dst, ${distExpr.format("l.v", "r.v")} AS dist
         |      FROM e l, e r WHERE l.vec_id <> r.vec_id),
         |g AS (SELECT src, dst FROM (SELECT src, dst,
         |        row_number() OVER (PARTITION BY src ORDER BY dist, dst) AS rnk FROM dd)
         |      WHERE rnk <= 16),
         |nn AS (SELECT count(*) AS n FROM e),
         |pr0 AS (SELECT vec_id AS id, 1000000000000 // nn.n AS pr FROM e, nn)""".stripMargin
    val rounds = (1 to iters).map { i =>
      s"""c$i AS (SELECT g.dst, CAST(sum((85 * p.pr) // (100 * least(16, nn.n - 1))) AS BIGINT) AS c
         |      FROM g JOIN pr${i - 1} p ON p.id = g.src, nn GROUP BY g.dst),
         |pr$i AS (SELECT e.vec_id AS id,
         |          CAST((15 * 1000000000000) // (100 * nn.n) + coalesce(c$i.c, 0) AS BIGINT) AS pr
         |        FROM e CROSS JOIN nn LEFT JOIN c$i ON c$i.dst = e.vec_id)""".stripMargin
    }
    s"$header,\n${rounds.mkString(",\n")}"
  }
}
