package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** The r14-lead decision experiment, run tool-side so no declared
  * surface moves: §7.5 measured the hierarchical walk's recall
  * collapsing on clustered corpora (0.39 at sf10, bimodal per-query —
  * clique trapping under plain top-m pruning). TWO candidate fixes
  * exist and this tool separates them on the same ground truth:
  *
  *  A. SEARCH-side: replace the fixed-rounds pruned-beam walk with
  *     the reference's actual layer-0 semantics — best-first
  *     expansion with a VISITED set and an ef-sized result bound
  *     (hnsw.zig:194-236 pops candidates until none can improve the
  *     worst result). If the plain top-m graph is connected ENOUGH
  *     and only the walk's fixpoint is the problem, this alone
  *     recovers recall.
  *  B. GRAPH-side: Malkov's diversity heuristic at prune time (keep
  *     candidate c only while |kept| < m and d(src,c) < d(c,k_i) for
  *     every kept k_i) — keeps long-range edges that plain
  *     top-m-by-distance discards, opening cliques structurally.
  *
  * Method: one approximate build at widened m (top-C candidate lists
  * per node, C = 4·16), then per node both prunes produce a 16-edge
  * level-0 graph from the SAME candidates; both graphs are searched
  * with the SAME ef-search from the same global entry (and, as a
  * control, the plain graph is also searched at the walk's fixed-
  * rounds semantics is already measured in §7.5). Exact ground truth
  * is the tool-shared broadcast scan. Everything is deterministic:
  * (dist, id) orders throughout.
  *
  * Usage: runMain graft.tools.DiversePruneRecall [sfDir] [nq] [k] [ef]
  */
object DiversePruneRecall {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/repo/fixtures/sf1")
    val nq = args.lift(1).map(_.toInt).getOrElse(100)
    val k = args.lift(2).map(_.toInt).getOrElse(10)
    val ef = args.lift(3).map(_.toInt).getOrElse(32)
    val m = 16
    val C = 4 * m
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .appName("graft-diverse-prune-recall")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.operators.{Ann, HnswLevel}

    val e = graft.Tables.embeddings(spark, d)
      .select(col("vec_id"), col("embedding"))
    val vecs: Map[Long, Array[Double]] =
      e.collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    println(s"[diverse-prune] d=$d n=${vecs.size} nq=$nq k=$k ef=$ef m=$m C=$C")

    def sq(a: Array[Double], b: Array[Double]): Double = {
      var s0 = 0.0; var i = 0
      while (i < a.length) { val t = a(i) - b(i); s0 += t * t; i += 1 }
      s0
    }

    // exact ground truth, same convention as ServingRecall
    val exact = graft.plans.KnnJoin.exact(e, e.filter(col("vec_id") < nq), k)
      .select(col("query_id"), col("vec_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    // ONE widened build yields both graphs' candidates: level-0
    // top-C lists per src, ascending (dist, id). refine=0 (seed-only,
    // no NND rounds): NND candidate volume scales with m² — at 200k
    // the m=64 refined build ground a 24 GB driver into heartbeat
    // stalls — and the experiment's question is the CONNECTIVITY of
    // two prunes of the SAME candidate pool, which seed candidates
    // answer as well as polished ones (both arms share whatever pool
    // quality refine=0 gives). Typed collect keeps the driver copy at
    // primitives, not Row objects.
    val t0 = System.nanoTime()
    import spark.implicits._
    val cand: Map[Long, Array[(Double, Long)]] =
      Ann.hnswEdgesApprox(spark, d, m = C, refine = 0)
        .filter(col("level") === 0)
        .select(col("src"), col("dst"), col("dist"))
        .as[(Long, Long, Double)]
        .collect()
        .groupBy(_._1)
        .map { case (s0, rows) =>
          s0 -> rows.map(r => (r._3, r._2)).sorted
        }
    println(f"[diverse-prune] top-$C seed build+collect ${(System.nanoTime() - t0) / 1e9}%.1f s")

    // plain prune: first m by (dist, id) — the shipped semantics
    val plain: Map[Long, Array[Long]] =
      cand.map { case (s0, cs) => s0 -> cs.take(m).map(_._2) }
    // diversity prune (Malkov NSW/HNSW heuristic): scan ascending,
    // keep c only if closer to src than to every kept neighbor
    val diverse: Map[Long, Array[Long]] = cand.map { case (s0, cs) =>
      val kept = scala.collection.mutable.ArrayBuffer.empty[Long]
      var i = 0
      while (i < cs.length && kept.size < m) {
        val (dc, c) = cs(i)
        val cv = vecs(c)
        var ok = true
        var j = 0
        while (ok && j < kept.size) {
          if (sq(cv, vecs(kept(j))) <= dc) ok = false
          j += 1
        }
        if (ok) kept += c
        i += 1
      }
      // backfill with the nearest skipped candidates so degree stays m
      // (standard keepPrunedConnections): connectivity experiment, not
      // a sparsity one
      i = 0
      while (kept.size < m && i < cs.length) {
        if (!kept.contains(cs(i)._2)) kept += cs(i)._2
        i += 1
      }
      s0 -> kept.toArray
    }

    val entry = vecs.keys.minBy(id => (-HnswLevel.levelOf(id), id))

    // reference-semantics layer-0 ef-search: best-first with a visited
    // set; stop when the nearest open candidate cannot improve the
    // worst of the ef-bounded result set (hnsw.zig:194-236)
    def efSearch(adj: Map[Long, Array[Long]], qv: Array[Double]): Seq[Long] = {
      implicit val ord: Ordering[(Double, Long)] = Ordering.Tuple2
      val open = scala.collection.mutable.PriorityQueue.empty[(Double, Long)](ord.reverse)
      var res = scala.collection.immutable.SortedSet.empty[(Double, Long)]
      val seen = scala.collection.mutable.HashSet.empty[Long]
      val d0 = sq(vecs(entry), qv)
      open += ((d0, entry)); seen += entry; res += ((d0, entry))
      while (open.nonEmpty) {
        val (cd, cid) = open.dequeue()
        if (cd > res.last._1 && res.size >= ef) open.clear()
        else adj.getOrElse(cid, Array.empty[Long]).foreach { nb =>
          if (seen.add(nb)) {
            val nd = sq(vecs(nb), qv)
            if (res.size < ef || nd < res.last._1) {
              open += ((nd, nb)); res += ((nd, nb))
              if (res.size > ef) res = res.init
            }
          }
        }
      }
      res.toSeq.take(k).map(_._2)
    }

    def grade(label: String, adj: Map[Long, Array[Long]]): Unit = {
      val got = (0L until nq.toLong).flatMap(q =>
        efSearch(adj, vecs(q)).map(v => (q, v))).toSet
      val rec = got.intersect(exact).size.toDouble / exact.size
      val perQ = exact.groupBy(_._1).map { case (q, ps) =>
        ps.count(got.contains).toDouble / ps.size }
      val zero = perQ.count(_ == 0.0); val one = perQ.count(_ == 1.0)
      println(f"[diverse-prune] arm=$label ef=$ef recall_at_k=$rec%.4f " +
        s"per_query{zero:$zero one:$one mid:${perQ.size - zero - one}}")
    }
    grade("plain_topm_efsearch", plain)     // fix A alone
    grade("diverse_prune_efsearch", diverse) // fix A + B
    spark.stop()
  }
}
