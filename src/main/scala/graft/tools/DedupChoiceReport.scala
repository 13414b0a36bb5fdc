package graft.tools

import org.apache.spark.sql.SparkSession

/** Prints [[graft.operators.Similarity.semanticDedupMeasured]]'s
  * chooser outcome — the measured capture curve, exact candidate
  * masses, the chosen probe width, and whether the floor was met —
  * plus the verdict row count at the chosen width.
  *
  * Usage: runMain graft.tools.DedupChoiceReport
  *   [sfDir] [eps] [stride] [massPerRow] [cellSize]
  * (stride 0 = the engine's measured-bounded auto stride, n/2048;
  * massPerRow and cellSize default to the declared-query knobs 512/64
  * — raise massPerRow to measure the recall-vs-ceiling escalation the
  * ANN chooser documents in SCALING_SF10.md §6.6, or cellSize to
  * trade per-cell join width for boundary capture)
  */
object DedupChoiceReport {
  def main(args: Array[String]): Unit = {
    import graft.operators.Similarity.{DefaultEps, DefaultStride,
      DefaultMassPerRow, DefaultCellSize}
    val d = args.headOption.getOrElse("/root/testdata/sf0.01")
    val eps = args.lift(1).map(_.toDouble).getOrElse(DefaultEps)
    val stride = args.lift(2).map(_.toLong).getOrElse(DefaultStride)
    val massPerRow = args.lift(3).map(_.toLong).getOrElse(DefaultMassPerRow)
    val cellSize = args.lift(4).map(_.toInt).getOrElse(DefaultCellSize)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .appName("graft-dedup-choice")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // at the declared-query defaults the REPORT path may serve the
    // persisted (version-stamped, invariant-validated) outcome —
    // build-once/report-many; any other knob set measures live.
    // Compared against the NAMED constants, never re-hardcoded
    // literals — a future default change must move this test with it
    val defaults = eps == DefaultEps && stride == DefaultStride &&
      massPerRow == DefaultMassPerRow && cellSize == DefaultCellSize
    val rows =
      if (defaults) {
        val stats = graft.operators.Similarity.dedupStatsStored(spark, d)
          .collect()
        println(s"[dedup-choice] stats rows (stored-or-measured):")
        stats.foreach(r => println(s"[dedup-choice]   $r"))
        stats.head.getLong(7) // dropped
      } else graft.operators.Similarity
        .semanticDedupMeasured(spark, d, eps = eps, stride = stride,
          massPerRow = massPerRow, cellSize = cellSize).count()
    val c = graft.operators.Similarity.lastDedupChoice.get
    println(s"[dedup-choice] d=$d eps=$eps stride=$stride " +
      s"massPerRow=$massPerRow cellSize=$cellSize chosen_p=${c.p} " +
      s"floor_met=${c.floorMet} true_pairs=${c.truePairs} " +
      s"captured=${c.capturedAtP.toSeq.sortBy(_._1)} " +
      s"mass=${c.massAtP.toSeq.sortBy(_._1)} verdict_rows=$rows")
    spark.stop()
  }
}
