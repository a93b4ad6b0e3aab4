package graft.functions

import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.unsafe.types.UTF8String

/** Row-level kernel behind [[NativeExprs.HashedWordShingles]]: lowercase
  * → regex-tokenize → word n-gram shingles → md5-prefix 31-bit hash →
  * first-occurrence distinct, in ONE pass with a per-thread digest. A
  * plain object with static forwarders so generated code can call it as
  * `graft.functions.GraftHash.hashedWordShingles(s, n)`.
  *
  * Bit-for-bit equivalent to the Column formulation it replaces
  * (NativeExprPropertySpec generates the equivalence check):
  * `array_distinct(transform(wordShingles(text, n),
  *    s -> conv(substring(md5(s),1,8),16,10) & 0x7fffffff))`
  * — so the DuckDB oracles need no change. Equivalence notes:
  *   - lowercase via UTF8String.toLowerCase (what Spark's `lower` does);
  *   - tokens via Java regex split with limit -1 + drop-empties (what
  *     `filter(split(lower(text), "[^a-z0-9]+"), _ =!= "")` does);
  *   - `count < n` → ONE shingle of all tokens space-joined (possibly
  *     the empty string), mirroring wordShingles' fallback arm;
  *   - distinct-on-hash == distinct-on-string-then-hash up to md5-prefix
  *     collisions, exactly like the replaced form (which re-distincts
  *     after hashing).
  */
object GraftHash {

  private val TokenPattern = java.util.regex.Pattern.compile("[^a-z0-9]+")

  private val tlMd5 = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** First 8 hex chars of md5(bytes) as an unsigned int, masked to 31
    * bits — `conv(substring(md5(s), 1, 8), 16, 10) & 0x7fffffff`.
    */
  def md5Prefix31(bytes: Array[Byte]): Long = {
    val md = tlMd5.get()
    md.reset()
    val d = md.digest(bytes)
    val v = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
      ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
    v & 0x7fffffffL
  }

  def hashedWordShingles(text: UTF8String, n: Int): ArrayData = {
    if (text == null) return null
    val lower = text.toLowerCase.toString
    val raw = TokenPattern.split(lower, -1)
    var count = 0
    var i = 0
    while (i < raw.length) { if (raw(i).nonEmpty) count += 1; i += 1 }
    val toks = new Array[String](count)
    i = 0; var j = 0
    while (i < raw.length) {
      if (raw(i).nonEmpty) { toks(j) = raw(i); j += 1 }
      i += 1
    }
    val utf8 = java.nio.charset.StandardCharsets.UTF_8
    val out = new java.util.LinkedHashSet[java.lang.Long]()
    if (count < n) {
      out.add(md5Prefix31(toks.mkString(" ").getBytes(utf8)))
    } else {
      val sb = new java.lang.StringBuilder()
      var s = 0
      while (s <= count - n) {
        sb.setLength(0)
        var k = 0
        while (k < n) {
          if (k > 0) sb.append(' ')
          sb.append(toks(s + k))
          k += 1
        }
        out.add(md5Prefix31(sb.toString.getBytes(utf8)))
        s += 1
      }
    }
    val arr = new Array[Long](out.size)
    val it = out.iterator()
    i = 0
    while (it.hasNext) { arr(i) = it.next(); i += 1 }
    new GenericArrayData(arr)
  }
}
