package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.SqlBridge
import org.apache.spark.sql.types.{ArrayType, DoubleType, LongType}

import graft.operators.BoundedTopK

/** The exact k-NN join as a FIRST-CLASS Catalyst operator — the
  * (c)-level integration of the build ladder: a custom `LogicalPlan`
  * node, a planner `SparkStrategy`, and a physical `SparkPlan`, wired
  * through `SparkSessionExtensions` ([[graft.GraftExtensions]]) or
  * per-session via [[SqlBridge.addStrategy]].
  *
  * Same algorithm and same results as
  * [[graft.operators.BroadcastKnnJoin]] (the function-shaped form —
  * parity is pinned in KnnSpec and by the gate, since `knn_batch`
  * routes through this operator): the query side is collected and
  * broadcast (the BroadcastExchange contract — small side only), the
  * corpus side streams once per partition through bounded (dist, id)
  * heaps, and only P×Q×k candidate rows are emitted for the global
  * window merge. What the operator form adds over the function:
  *
  *   - the node participates in Catalyst — EXPLAIN shows `KnnJoinExec`
  *     with both children's plans (scan pruning/pushdown visible below
  *     it), and downstream relational work composes over its output
  *     like over any other operator;
  *   - the physical contract (corpus never shuffles, never collects;
  *     query side collected exactly once at execution) is stated by
  *     the node itself, not by convention inside a helper function.
  */
case class KnnJoinPlan(
    corpus: LogicalPlan,
    queries: LogicalPlan,
    k: Int,
    excludeSelf: Boolean,
    // constructor parameter, NOT a computed member: Catalyst copies
    // the node during analysis/optimization (withNewChildrenInternal →
    // copy), and output exprIds must survive every copy or downstream
    // operators bind to attributes that no longer exist
    output: Seq[Attribute] = KnnJoinPlan.freshOutput()) extends BinaryNode {
  require(k > 0, s"k must be positive, got $k")
  override def left: LogicalPlan = corpus
  override def right: LogicalPlan = queries
  // the output attrs are PRODUCED here, not references to the children
  // (without this, analysis sees them as unresolvable inputs)
  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(output)
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): KnnJoinPlan =
    copy(corpus = newLeft, queries = newRight)
}

object KnnJoinPlan {
  def freshOutput(): Seq[Attribute] = Seq(
    AttributeReference("query_id", LongType, nullable = false)(),
    AttributeReference("vec_id", LongType, nullable = false)(),
    AttributeReference("dist", DoubleType, nullable = false)())
}

/** Plans [[KnnJoinPlan]] → [[KnnJoinExec]]; a no-op on every other node. */
object KnnJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case p: KnnJoinPlan =>
      KnnJoinExec(planLater(p.corpus), planLater(p.queries), p.k, p.excludeSelf, p.output) :: Nil
    case _ => Nil
  }
}

/** Physical exact k-NN join: broadcast the collected query side, stream
  * the corpus side once with one bounded heap per query, emit partial
  * top-k rows. Children must produce exactly (LONG id, ARRAY<DOUBLE>
  * vec) — the [[KnnJoin]] API shapes them. */
case class KnnJoinExec(
    corpus: SparkPlan,
    queries: SparkPlan,
    k: Int,
    excludeSelf: Boolean,
    output: Seq[Attribute]) extends BinaryExecNode {
  override def left: SparkPlan = corpus
  override def right: SparkPlan = queries
  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(output)
  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): KnnJoinExec =
    copy(corpus = newLeft, queries = newRight)

  protected override def doExecute(): RDD[InternalRow] = {
    // the query side is the build side of a broadcast join: collected
    // once here, never the corpus
    val qs: Array[(Long, Array[Double])] = queries.executeCollect()
      .map(r => (r.getLong(0), r.getArray(1).toDoubleArray))
      .sortBy(_._1)
    val bq = sparkContext.broadcast(qs)
    val kk = k
    val skipSelf = excludeSelf
    val types = output.map(_.dataType).toArray
    corpus.execute().mapPartitions { iter =>
      val queries = bq.value
      val nq = queries.length
      val heaps = Array.fill(nq)(new BoundedTopK(kk))
      while (iter.hasNext) {
        val r = iter.next()
        val id = r.getLong(0)
        val vec = r.getArray(1).toDoubleArray
        var qi = 0
        while (qi < nq) {
          val (qid, qv) = queries(qi)
          if (!(skipSelf && qid == id)) {
            // the ONE shared plain fold (no heap-bound abandon — a
            // measured pessimization, see BlockKnnJoin.knnGraph);
            // offer() arbitrates, admitting NaN NaN-last like SQL
            heaps(qi).offer(
              graft.operators.BlockKnnJoin.sqDist(vec, qv), id)
          }
          qi += 1
        }
      }
      val proj = UnsafeProjection.create(types)
      heaps.iterator.zipWithIndex.flatMap { case (h, qi) =>
        val qid = queries(qi)._1
        h.drain().iterator.map { case (dist, id) =>
          proj(InternalRow(qid, id, dist))
        }
      }
    }
  }
}

/** DataFrame-level API over the operator. */
object KnnJoin {

  /** Exact squared-L2 top-k of `corpus` for each row of `queries`,
    * planned through [[KnnJoinExec]]; output
    * (query_id, vec_id, dist, rnk), rnk 1..k ascending (dist, id). */
  def exact(
      corpus: DataFrame,
      queries: DataFrame,
      k: Int,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      excludeSelf: Boolean = false): DataFrame = {
    val spark: SparkSession = corpus.sparkSession
    SqlBridge.addStrategy(spark, KnnJoinStrategy)
    val shape = (df: DataFrame) => df.select(
      col(idCol).cast(LongType).as("id"),
      col(vecCol).cast(ArrayType(DoubleType)).as("vec"))
    // single-split local fixtures plan as ONE partition; spread the
    // probe side so every core scans a slice (no-op on real multi-
    // split tables — same guard as BroadcastKnnJoin)
    val p = spark.conf.get("spark.sql.shuffle.partitions", "32").toInt
    val c0 = shape(corpus)
    // queryExecution.toRdd, not .rdd: the partition-count probe must
    // not build a per-call row-deserializer lineage (the documented
    // BroadcastKnnJoin guard, kept consistent here)
    val c = if (c0.queryExecution.toRdd.getNumPartitions < p)
      c0.repartition(p) else c0
    val partial = SqlBridge.ofRows(spark,
      KnnJoinPlan(SqlBridge.analyzed(c), SqlBridge.analyzed(shape(queries)), k, excludeSelf))
    val w = Window.partitionBy("query_id").orderBy(col("dist"), col("vec_id"))
    partial.withColumn("rnk", row_number().over(w)).filter(col("rnk") <= k)
  }
}
