package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over ArrayType(Float|Double) columns, built from Spark's
  * codegen'd higher-order functions (zip_with / aggregate) so the hot path
  * stays inside whole-stage codegen — no UDF boxing on embedding arrays.
  *
  * Semantics match the reference's cosine (search/graph.py:24-31):
  * dot/(‖a‖·‖b‖), 0.0 if either norm is 0.
  */
object VectorFunctions {

  private def asDouble(a: Column): Column = transform(a, x => x.cast("double"))

  /** Sum of elementwise products, computed in double. */
  def dotProduct(a: Column, b: Column): Column =
    aggregate(
      zip_with(asDouble(a), asDouble(b), (x, y) => x * y),
      lit(0.0),
      (acc, x) => acc + x
    )

  /** L2 norm. */
  def l2Norm(a: Column): Column =
    sqrt(aggregate(asDouble(a), lit(0.0), (acc, x) => acc + x * x))

  /** Cosine similarity; 0.0 when either vector has zero norm. */
  def cosineSimilarity(a: Column, b: Column): Column = {
    val na = l2Norm(a)
    val nb = l2Norm(b)
    when(na === 0.0 || nb === 0.0, lit(0.0))
      .otherwise(dotProduct(a, b) / (na * nb))
  }

  /** Cosine against a constant query vector (the common search shape).
    * The query is embedded as an array literal so Catalyst folds its norm.
    */
  def cosineToQuery(emb: Column, query: Array[Float]): Column = {
    val q = query.map(_.toDouble)
    val qNorm = math.sqrt(q.map(x => x * x).sum)
    if (qNorm == 0.0) lit(0.0)
    else {
      val qCol = array(q.map(lit): _*)
      val dot = dotProduct(emb, qCol)
      val n = l2Norm(emb)
      when(n === 0.0, lit(0.0)).otherwise(dot / (n * lit(qNorm)))
    }
  }

  /** Squared L2 distance (for LSH bucketing / diagnostics). */
  def l2DistanceSq(a: Column, b: Column): Column =
    aggregate(
      zip_with(asDouble(a), asDouble(b), (x, y) => (x - y) * (x - y)),
      lit(0.0),
      (acc, x) => acc + x
    )
}
