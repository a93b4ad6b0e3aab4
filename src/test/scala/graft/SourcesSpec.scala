package graft

import org.apache.spark.sql.functions._

import graft.sources.BucketedTables

/** Bucketed-table layout: the write-once / join-free-forever contract.
  */
class SourcesSpec extends SparkSuite {

  import spark.implicits._

  private def withNoBroadcast[A](body: => A): A = {
    val key = "spark.sql.autoBroadcastJoinThreshold"
    val old = spark.conf.get(key)
    spark.conf.set(key, "-1")
    try body finally spark.conf.set(key, old)
  }

  test("bucketed co-located join: zero ShuffleExchange, same rows as the plain join; unbucketed pays the shuffle") {
    val base = java.nio.file.Files.createTempDirectory("graft_bspec").toString
    val left = (1L to 400L).map(k => (k, s"l$k")).toDF("k", "lv")
    val right = (1L to 400L).filter(_ % 2 == 0).map(k => (k, s"r$k")).toDF("k", "rv")
    BucketedTables.writeBucketed(left, "bspec_left", s"$base/l", Seq("k"), 4)
    BucketedTables.writeBucketed(right, "bspec_right", s"$base/r", Seq("k"), 4)
    withNoBroadcast {
      val j = BucketedTables.colocatedJoin(spark, "bspec_left", "bspec_right", Seq("k"))
      assert(BucketedTables.isShuffleFree(j), j.queryExecution.executedPlan.toString)
      val got = j.select("k", "lv", "rv").collect().map(_.toString).sorted.toSeq
      val plain = left.join(right, Seq("k")).collect().map(_.toString).sorted.toSeq
      assert(got == plain && got.size == 200)
      // contrast: the same join over bare parquet paths shuffles
      val bare = spark.read.parquet(s"$base/l").hint("merge")
        .join(spark.read.parquet(s"$base/r").hint("merge"), Seq("k"))
      assert(!BucketedTables.isShuffleFree(bare))
    }
  }

  test("aggregation on the bucket key is exchange-free too") {
    val base = java.nio.file.Files.createTempDirectory("graft_bspec2").toString
    val df = (1L to 300L).map(k => (k % 50, k)).toDF("k", "v")
    BucketedTables.writeBucketed(df, "bspec_agg", s"$base/a", Seq("k"), 4)
    val agg = spark.table("bspec_agg").groupBy("k").agg(sum("v").as("s"))
    assert(BucketedTables.isShuffleFree(agg),
      agg.queryExecution.executedPlan.toString)
    assert(agg.count() == 50)
  }
}
