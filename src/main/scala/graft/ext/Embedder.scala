package graft.ext

import java.nio.{ByteBuffer, ByteOrder}
import java.security.MessageDigest

/** Pluggable embedding client (reference: embedding.py:8-19). */
trait Embedder extends Serializable {
  def embed(texts: Seq[String]): Seq[Array[Float]]
  def dimensions: Int
  def embedOne(text: String): Array[Float] = embed(Seq(text)).head
}

/** Deterministic SHA-256 embedder, a faithful port of the reference test
  * fixture (tests/mock_llm.py:12-43, FIXTURES.md §1): hash the text,
  * extend the digest by re-hashing until >= dims*4 bytes, read
  * little-endian floats, squash f -> f/(|f|+1), then L2-normalize.
  * Same text always yields the same unit vector, for any dimension.
  *
  * Deliberate deviation from the Python fixture: NaN/Infinite float32
  * reads are zeroed here, while the Python version propagates NaN
  * (nan/(abs(nan)+1) = nan, and `norm > 0` is False so the vector stays
  * unnormalized). We need well-defined unit vectors for oracle-checkable
  * cosine math, so the ~1/256-per-float NaN case is squashed to 0.0.
  */
final class MockEmbedder(val dimensions: Int = 16) extends Embedder {
  override def embed(texts: Seq[String]): Seq[Array[Float]] =
    texts.map(embedText)

  private def embedText(text: String): Array[Float] = {
    val need = dimensions * 4
    var bytes = sha256(text.getBytes("UTF-8"))
    while (bytes.length < need) bytes = bytes ++ sha256(bytes)
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val raw = Array.fill(dimensions) {
      val f = buf.getFloat()
      val d = f.toDouble
      val squashed =
        if (d.isNaN || d.isInfinite) 0.0 else d / (math.abs(d) + 1.0)
      squashed
    }
    val norm = math.sqrt(raw.map(x => x * x).sum)
    if (norm == 0.0) raw.map(_.toFloat)
    else raw.map(x => (x / norm).toFloat)
  }

  private def sha256(b: Array[Byte]): Array[Byte] =
    MessageDigest.getInstance("SHA-256").digest(b)
}
