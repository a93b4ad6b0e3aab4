package graft.catalog

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ext.MockEmbedder
import graft.ops.SearchOps
import Tables._

/** BM25 / RRF / hybrid retrieval queries over `documents` (+`embeddings`
  * joined by id for the vector leg) — V3/V5 and the hybrid re-rank
  * semantics (SURVEY §2.4).
  */
object SearchQueries {

  private val QueryText = "spark join window query"
  private val Dims = 64
  /** Deterministic query vector (SHA-256 embedder, FIXTURES.md §1). */
  private lazy val QueryVec: Array[Float] =
    new MockEmbedder(Dims).embedOne(QueryText)

  /** documents with the vector leg: docs 0-399 carry an embedding,
    * 400+ have NULL (exercises the fused-score fallback).
    */
  private def corpus(s: SparkSession, dir: String): DataFrame = {
    val docs = load(s, dir, "documents")
    val emb = load(s, dir, "embeddings")
      .filter(col("vec_id") < 400)
      .select(col("vec_id").as("doc_id"), col("embedding"))
    docs.join(emb, Seq("doc_id"), "left")
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_bm25" -> { (s, dir) =>
      // V5 — BM25 scoring against a fixed term bag
      val docs = load(s, dir, "documents")
      SearchOps.bm25(docs, "doc_id", "text", QueryText.split(" ").toSeq)
        .select(col("doc_id"), round(col("bm25"), 6).as("bm25"))
        .orderBy(col("doc_id"))
    },
    "q_rrf" -> { (s, dir) =>
      // V3 (fusion stage) — RRF of the BM25 ranking and a length ranking
      val docs = load(s, dir, "documents")
      val bm = SearchOps.bm25(docs, "doc_id", "text", QueryText.split(" ").toSeq)
        .orderBy(col("bm25").desc, col("doc_id").asc)
        .limit(50)
      val ln = docs.select(col("doc_id"), col("n_chars").cast("double").as("len_score"))
        .orderBy(col("len_score").desc, col("doc_id").asc)
        .limit(50)
      SearchOps.rrfFuse(Seq((bm, "bm25"), (ln, "len_score")), "doc_id", rrfK = 1.0)
        .select(col("doc_id"), round(col("rrf_score"), 6).as("rrf_score"))
        .orderBy(col("doc_id"))
    },
    "q_hybrid" -> { (s, dir) =>
      // V3 — full hybrid: BM25 ∪ cosine candidates, RRF-fused, cosine
      // re-rank with the reference's no-embedding fallback
      SearchOps.hybridSearch(corpus(s, dir), "doc_id", "text", "embedding",
          QueryText, QueryVec, k = 30, rrfK = 1.0, fetchK = 50)
        .select(col("doc_id"), round(col("rrf_score"), 6).as("rrf_score"),
          round(col("score"), 6).as("score"))
        .orderBy(col("doc_id"))
    }
  )

  def oracle: Map[String, String] = {
    val toks = sqlTokens("text")
    val terms = QueryText.split(" ").distinct.map(t => s"'$t'").mkString(", ")

    // classic BM25 (k1=1.2, b=0.75) as CTEs — mirror of SearchOps.bm25
    def bm25Cte(alias: String): String =
      s"""dt AS (SELECT doc_id, $toks AS toks FROM documents),
         |dl AS (SELECT doc_id, len(toks)::INT AS dl FROM dt),
         |corpus AS (SELECT count(*)::BIGINT AS n_docs, avg(dl::DOUBLE) AS avgdl FROM dl),
         |tf AS (SELECT t.doc_id, dl.dl, u.term, count(*)::BIGINT AS tf
         |  FROM dt t JOIN dl ON t.doc_id = dl.doc_id, unnest(t.toks) AS u(term)
         |  WHERE u.term IN ($terms) GROUP BY t.doc_id, dl.dl, u.term),
         |dfq AS (SELECT term, count(DISTINCT doc_id)::BIGINT AS df FROM tf GROUP BY term),
         |$alias AS (SELECT tf.doc_id,
         |  sum(ln((corpus.n_docs - dfq.df + 0.5) / (dfq.df + 0.5) + 1.0)
         |      * (tf.tf * (1.2 + 1)) / (tf.tf + 1.2 * ((1 - 0.75) + 0.75 * tf.dl / corpus.avgdl))) AS bm25
         |  FROM tf JOIN dfq ON tf.term = dfq.term CROSS JOIN corpus
         |  GROUP BY tf.doc_id)""".stripMargin

    val bm25Sql =
      s"""WITH ${bm25Cte("bm")}
         |SELECT doc_id, round(bm25, 6) AS bm25 FROM bm ORDER BY doc_id""".stripMargin

    val rrfSql =
      s"""WITH ${bm25Cte("bm")},
         |bmtop AS (SELECT doc_id, bm25,
         |  row_number() OVER (ORDER BY bm25 DESC, doc_id ASC) AS rnk
         |  FROM (SELECT * FROM bm ORDER BY bm25 DESC, doc_id ASC LIMIT 50)),
         |lntop AS (SELECT doc_id, n_chars::DOUBLE AS len_score,
         |  row_number() OVER (ORDER BY n_chars::DOUBLE DESC, doc_id ASC) AS rnk
         |  FROM (SELECT * FROM documents ORDER BY n_chars::DOUBLE DESC, doc_id ASC LIMIT 50)),
         |parts AS (
         |  SELECT doc_id, 1.0 / (1.0 + rnk)::DOUBLE AS rrf_part FROM bmtop
         |  UNION ALL
         |  SELECT doc_id, 1.0 / (1.0 + rnk)::DOUBLE AS rrf_part FROM lntop)
         |SELECT doc_id, round(sum(rrf_part), 6) AS rrf_score FROM parts
         |GROUP BY doc_id ORDER BY doc_id""".stripMargin

    val qv = QueryVec.map(_.toDouble)
    val qvLit = qv.mkString("[", ",", "]")
    val qNorm = math.sqrt(qv.map(x => x * x).sum)
    // mirror of VectorFunctions.cosineToQuery: dot/(norm(emb) * qNormLit)
    val cosQ =
      s"""CASE WHEN sqrt(list_dot_product(v, v)) = 0 THEN 0.0
         | ELSE list_dot_product(v, $qvLit::DOUBLE[]) / (sqrt(list_dot_product(v, v)) * $qNorm)
         | END""".stripMargin.replaceAll("\n", " ")

    val hybridSql =
      s"""WITH ${bm25Cte("bm")},
         |emb AS (SELECT vec_id AS doc_id, embedding::DOUBLE[] AS v FROM embeddings WHERE vec_id < 400),
         |c AS (SELECT d.doc_id, emb.v FROM documents d LEFT JOIN emb ON d.doc_id = emb.doc_id),
         |bmtop AS (SELECT doc_id, row_number() OVER (ORDER BY bm25 DESC, doc_id ASC) AS rnk
         |  FROM (SELECT * FROM bm ORDER BY bm25 DESC, doc_id ASC LIMIT 50)),
         |cosed AS (SELECT doc_id, CASE WHEN v IS NULL THEN NULL ELSE $cosQ END AS cos FROM c),
         |vectop AS (SELECT doc_id, row_number() OVER (ORDER BY cos DESC NULLS LAST, doc_id ASC) AS rnk
         |  FROM (SELECT * FROM cosed ORDER BY cos DESC NULLS LAST, doc_id ASC LIMIT 50)),
         |parts AS (
         |  SELECT doc_id, 1.0 / (1.0 + rnk)::DOUBLE AS rrf_part FROM bmtop
         |  UNION ALL
         |  SELECT doc_id, 1.0 / (1.0 + rnk)::DOUBLE AS rrf_part FROM vectop),
         |fused AS (SELECT doc_id, sum(rrf_part) AS rrf_score FROM parts GROUP BY doc_id),
         |scored AS (SELECT f.doc_id, f.rrf_score,
         |  CASE WHEN c.v IS NULL THEN
         |    CASE WHEN f.rrf_score < 1.0 THEN greatest(0.0, 1.0 - f.rrf_score) ELSE 0.5 END
         |  ELSE greatest(0.0, $cosQ) END AS score
         |  FROM fused f JOIN c ON f.doc_id = c.doc_id)
         |SELECT doc_id, round(rrf_score, 6) AS rrf_score, round(score, 6) AS score
         |FROM (SELECT * FROM scored ORDER BY score DESC, doc_id ASC LIMIT 30)
         |ORDER BY doc_id""".stripMargin

    Map(
      "q_bm25" -> bm25Sql,
      "q_rrf" -> rrfSql,
      "q_hybrid" -> hybridSql
    )
  }
}
