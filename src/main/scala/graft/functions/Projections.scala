package graft.functions

/** Deterministic sign-random-projection hyperplanes for cosine LSH.
  *
  * Weights are ±1 derived from md5("band|plane|coord") parity — fully
  * deterministic, engine-independent, and precomputed driver-side so the
  * per-row work is a plain literal-array dot product (codegen'd, no
  * hashing in the hot path). The DuckDB oracle embeds the SAME literals,
  * making the LSH bucketing itself oracle-checkable.
  */
object Projections {

  /** weights(b)(p)(i) ∈ {-1.0, +1.0} for band b, plane p, coordinate i. */
  def signWeights(bands: Int, rowsPerBand: Int, dims: Int): Array[Array[Array[Double]]] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    Array.tabulate(bands, rowsPerBand, dims) { (b, p, i) =>
      val h = md.digest(s"$b|$p|$i".getBytes("UTF-8"))
      if ((h(0) & 1) == 0) 1.0 else -1.0
    }
  }
}
