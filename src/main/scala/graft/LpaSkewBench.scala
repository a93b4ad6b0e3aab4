package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.GraphAlgorithms

/** Hub-skew LPA layout bench (VERDICT r5 #5): times the single-exchange
  * vs combine-friendly label-count layouts on a uniform random graph and
  * on the same graph with one hub holding ~10% of all edges. Prints one
  * JSON line; the recorded series lives in BASELINE.
  *
  * Run: sbt -batch "runMain graft.LpaSkewBench [nodes] [edges]"
  */
object LpaSkewBench {
  def main(args: Array[String]): Unit = {
    val n = if (args.length > 0) args(0).toLong else 200000L
    val m = if (args.length > 1) args(1).toLong else 1000000L
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // deterministic pseudo-random endpoints (Knuth multiplicative hash —
    // Date.now/rand are unavailable by design and unwanted in a bench)
    def edges(hub: Boolean): DataFrame = {
      val base = spark.range(0L, m, 1, 32)
        .select(
          pmod(col("id") * 2654435761L, lit(n)).as("src"),
          pmod((col("id") + 7L) * 40503L + col("id") % 97L, lit(n)).as("dst"))
      (if (hub) base.select(col("src"),
        when(pmod(col("src") + col("dst"), lit(10L)) === 0L, lit(0L))
          .otherwise(col("dst")).as("dst"))
      else base).localCheckpoint()
    }

    def time(f: => DataFrame): Double = {
      val t0 = System.nanoTime()
      f.count()
      (System.nanoTime() - t0) / 1e9
    }

    val results = for {
      (gname, g) <- Seq("uniform" -> edges(hub = false), "hub10" -> edges(hub = true))
      (lname, combine) <- Seq("single_exchange" -> false, "combine" -> true)
    } yield {
      // the first run pays codegen/JIT; report min of 2
      val a = time(GraphAlgorithms.labelPropagation(g, rounds = 5,
        combineAggregation = combine))
      val b = time(GraphAlgorithms.labelPropagation(g, rounds = 5,
        combineAggregation = combine))
      s""""${gname}_$lname":${math.min(a, b)}"""
    }
    println(s"""{"metric":"lpa_skew","nodes":$n,"edges":$m,${results.mkString(",")}}""")
    spark.stop()
  }
}
