package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}

/** Throwaway profiling main (not part of the library surface). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val m = si.taskMetrics
        println(f"STAGE ${si.stageId}%3d tasks=${si.numTasks}%3d " +
          f"wall=${(si.completionTime.get - si.submissionTime.get) / 1e3}%6.2f s " +
          f"cpu=${m.executorCpuTime / 1e9}%7.2f s run=${m.executorRunTime / 1e3}%7.2f s " +
          f"ser=${m.resultSerializationTime / 1e3}%5.2f gc=${m.jvmGCTime / 1e3}%5.2f " +
          f"shW=${m.shuffleWriteMetrics.bytesWritten / 1e6}%8.1f MB shR=${m.shuffleReadMetrics.totalBytesRead / 1e6}%8.1f MB")
      }
    })
    for (i <- 1 to 3) {
      val (b, s) = BaselineWorkload.run(spark)
      println(f"RUN $i build=$b%.2f s search=$s%.2f s")
    }
    spark.stop()
  }
}
