package graft

import graft.functions.GraftFunctions

/** The SQL face of the native kernels: registry wiring, literal-arg
  * extraction, agreement with the Column API, codegen'd plan.
  */
class SqlFunctionsSpec extends SparkSuite {

  import spark.implicits._

  test("graft_* SQL functions: registered, correct, same kernel as the Column API") {
    GraftFunctions.register(spark)
    val cos = spark.sql(
      "SELECT graft_cosine(array(1.0D, 0.0D), array(1.0D, 0.0D)) AS c")
      .head().getDouble(0)
    assert(math.abs(cos - 1.0) < 1e-12)
    val toks = spark.sql("SELECT graft_tokens('Hello, World! 42') AS t")
      .head().getSeq[String](0)
    assert(toks == Seq("hello", "world", "42"))
    // NFC: decomposed e + combining acute composes to one code point
    val dec = "Café"
    val n = spark.sql(s"SELECT length(graft_nfc('$dec')) AS l, length('$dec') AS l0")
      .head()
    assert(n.getInt(0) == 4 && n.getInt(1) == 5)
    // literal int args reach the expression constructor
    val sh = spark.sql("SELECT graft_simhash('the quick brown fox', 32) AS h")
      .head().getLong(0)
    val viaCol = Seq("the quick brown fox").toDF("s")
      .select(graft.functions.HashFunctions.simhash(
        org.apache.spark.sql.functions.col("s"), 32))
      .head().getLong(0)
    assert(sh == viaCol)
    // plan stays native (the kernel name appears, no UDF wrapper)
    val plan = spark.sql("SELECT graft_cosine(array(1.0D), array(1.0D))")
      .queryExecution.executedPlan.toString
    assert(plan.contains("graft_cosine"), plan.take(400))
    // non-literal model-size arg is rejected with a clear error
    val err = intercept[Exception] {
      spark.sql("SELECT graft_simhash('x', length('yy'))").collect()
    }
    assert(err.getMessage.contains("integer literal"), err.getMessage)
  }

  test("GraftSparkExtensions injects the same builders (config-based deploy path)") {
    // the extensions hook wires the identical builder list; applying it
    // to a fresh SparkSessionExtensions must not throw and must accept
    // every builder (smoke of the injection shape — the behavior itself
    // is covered above via the shared registry path)
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new graft.functions.GraftSparkExtensions().apply(ext)
  }
}
