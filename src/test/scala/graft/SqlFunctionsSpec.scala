package graft

import graft.functions.GraftFunctions

/** Round-11 additions to the SQL function surface (the base registry is
  * covered by OpsSpec's "native kernels are SQL-callable" test):
  * graft_nfc / graft_entropy, plan nativeness, literal-arg rejection,
  * and the extensions-hook wiring.
  */
class SqlFunctionsSpec extends SparkSuite {

  import spark.implicits._

  test("graft_nfc / graft_entropy SQL additions: correct, same kernel as the Column API, codegen'd plan") {
    GraftFunctions.register(spark)
    // NFC: decomposed e + combining acute composes to one code point
    val dec = "Cafe" + "\u0301"
    val n = spark.sql(s"SELECT length(graft_nfc('$dec')) AS l, length('$dec') AS l0")
      .head()
    assert(n.getInt(0) == 4 && n.getInt(1) == 5)
    // entropy fields agree with the Column API kernel
    val viaSql = spark.sql(
      "SELECT graft_entropy('aabb ccdd aabb').char_entropy AS ce, " +
        "graft_entropy('aabb ccdd aabb').token_entropy AS te").head()
    val viaCol = Seq("aabb ccdd aabb").toDF("s")
      .select(
        graft.functions.TextFunctions.charEntropy(
          org.apache.spark.sql.functions.col("s")).as("ce"),
        graft.functions.TextFunctions.tokenEntropy(
          org.apache.spark.sql.functions.col("s")).as("te"))
      .head()
    assert(viaSql.getDouble(0) == viaCol.getDouble(0))
    assert(viaSql.getDouble(1) == viaCol.getDouble(1))
    // plan stays native (kernel name present, no UDF wrapper)
    val plan = spark.sql("SELECT graft_nfc('x')")
      .queryExecution.executedPlan.toString
    assert(plan.contains("graft_nfc"), plan.take(400))
    // non-literal model-size arg is rejected with a clear error
    val err = intercept[Exception] {
      spark.sql("SELECT graft_minhash_sig(array(1L), length('yy'))").collect()
    }
    assert(err.getMessage.contains("integer literal"), err.getMessage)
  }

  test("GraftSparkExtensions injects the full builder list (config-based deploy path)") {
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new graft.functions.GraftSparkExtensions().apply(ext)
    assert(GraftFunctions.functions.map(_._1).distinct.size ==
      GraftFunctions.functions.size)
    assert(GraftFunctions.functions.exists(_._1 == "graft_nfc"))
  }
}
