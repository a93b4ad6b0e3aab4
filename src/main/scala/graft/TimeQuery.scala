package graft
import org.apache.spark.sql.SparkSession

/** Dev tool: time one registered query (repeats included) without
  * running the whole bench list. Args: <query> [repeats=2] [sfDir].
  * Prints one line per repeat plus the min — memo-building queries pay
  * their build on repeat 1 only, mirroring Bench's accounting.
  */
object TimeQuery {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val repeats = if (args.length > 1) args(1).toInt else 2
    val sfDir =
      if (args.length > 2) args(2)
      else sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val fn = (SparkEntry.queries ++ SparkEntry.benchExtras ++
      SparkEntry.benchUntimed)(name)
    if (sys.env.contains("SPARK_GRAFT_EXPLAIN"))
      println(fn(spark, sfDir).queryExecution.optimizedPlan.toString)
    // per-repeat Spark job count (same async-drain read as Bench): a
    // banded wall with a flat job count is harness/host noise; a banded
    // job count is real plan/branch nondeterminism
    val jobCounter = new java.util.concurrent.atomic.AtomicLong(0L)
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
          jobCounter.incrementAndGet()
      })
    def stableJobCount(): Long = {
      var prev = jobCounter.get(); var tries = 0
      while (tries < 20) {
        Thread.sleep(10)
        val cur = jobCounter.get()
        if (cur == prev) return cur
        prev = cur; tries += 1
      }
      prev
    }
    val times = (1 to repeats).map { i =>
      val j0 = stableJobCount()
      val t0 = System.nanoTime()
      val n = fn(spark, sfDir).count()
      val s = (System.nanoTime() - t0) / 1e9
      val jobs = stableJobCount() - j0
      println(f"$name run $i: $s%.2f s ($n rows, $jobs jobs)")
      s
    }
    println(f"$name min: ${times.min}%.2f s")
    spark.stop()
  }
}
