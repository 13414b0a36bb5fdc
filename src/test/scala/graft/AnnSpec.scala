package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Ann, Knn}

/** Recall and structure tests for the approximate operators — the
  * engine's analogue of the reference's "Large Dataset" behavioral
  * check (`src/test_hnsw.zig:70-102`), strengthened into measured
  * recall@k against the exact operator (SURVEY §5 test plan). */
class AnnSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[8]")
    .appName("ann-spec")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  val d = "/root/testdata/sf0.001"

  private def recallAtK(approx: Array[(Long, Long)], exact: Array[(Long, Long)]): Double = {
    val e = exact.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val a = approx.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val per = e.map { case (q, es) =>
      a.get(q).map(as => as.intersect(es).size.toDouble / es.size).getOrElse(0.0)
    }
    per.sum / per.size
  }

  lazy val exact: Array[(Long, Long)] =
    Knn.knnBatch(spark, d).select("query_id", "vec_id")
      .collect().map(r => (r.getLong(0), r.getLong(1)))

  test("ann_lsh recall@10 vs exact k-NN is substantial") {
    val approx = Ann.annLsh(spark, d).select("query_id", "vec_id")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val rec = recallAtK(approx, exact)
    info(f"LSH recall@10 = $rec%.3f")
    assert(rec >= 0.5, f"LSH recall too low: $rec%.3f")
  }

  test("ann_ivf recall@10 vs exact k-NN is substantial; self always found") {
    val approx = Ann.annIvf(spark, d).select("query_id", "vec_id")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val rec = recallAtK(approx, exact)
    info(f"IVF recall@10 (nprobe=3/10 cells) = $rec%.3f")
    assert(rec >= 0.3, f"IVF recall too low: $rec%.3f")
    // every query retrieves itself at rank 1 (distance 0)
    val r1 = Ann.annIvf(spark, d).filter(col("rnk") === 1)
      .select("query_id", "vec_id").collect()
    assert(r1.forall(r => r.getLong(0) == r.getLong(1)))
  }

  test("ann_graph_search recall@10 vs exact, beam search over the graph") {
    val approx = Ann.annGraphSearch(spark, d).select("query_id", "vec_id")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val rec = recallAtK(approx, exact)
    info(f"graph-search recall@10 (beam=16, 4 rounds) = $rec%.3f")
    assert(rec >= 0.3, f"graph search recall too low: $rec%.3f")
  }

  test("hnsw levels are geometric-ish and edges bounded by m") {
    val lv = Ann.hnswLevels(spark, d).collect().map(_.getInt(1))
    assert(lv.length == 500)
    val l0 = lv.count(_ == 0).toDouble / lv.length
    assert(l0 > 0.35 && l0 < 0.65, s"level-0 fraction $l0 not ~0.5")
    val edges = Ann.hnswEdges(spark, d, m = 8)
    val perSrc = edges.groupBy("level", "src").count().agg(max("count")).head().getLong(0)
    assert(perSrc <= 8)
  }
}
