package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{HashFunctions, TextFunctions}

/** Deduplication operators for training-data pipelines: exact, MinHash/LSH,
  * SimHash and n-gram Jaccard. All are shuffle-on-key dataflows that
  * scale horizontally: the only groupBy keys are content hashes / band
  * keys, which distribute uniformly by construction.
  */
object DedupOps {

  /** Exact dedup on normalized text: every doc keyed by md5(normalized),
    * keep the lowest-id doc per group, mark the rest as duplicates.
    * Output: (id, content_hash, group_size, is_duplicate, keep_id).
    */
  def exactDuplicates(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val hashed = df.select(
      col(idCol),
      md5(TextFunctions.normalizedText(col(textCol))).as("content_hash")
    )
    val w = Window.partitionBy(col("content_hash"))
    hashed
      .withColumn("group_size", count(lit(1)).over(w))
      .withColumn("keep_id", min(col(idCol)).over(w))
      .withColumn("is_duplicate", col(idCol) =!= col("keep_id"))
  }

  /** MinHash signatures: numHashes md5-derived min-hex values over word
    * shingles. Output columns: idCol, mh_0 .. mh_{n-1}.
    */
  def minhashSignatures(
      df: DataFrame,
      idCol: String,
      textCol: String,
      numHashes: Int = 16,
      shingleSize: Int = 3
  ): DataFrame = {
    val withShingles = df.select(
      col(idCol),
      HashFunctions.wordShingles(col(textCol), shingleSize).as("shingles")
    )
    val sigCols = (0 until numHashes).map(i =>
      HashFunctions.minhash(col("shingles"), i).as(s"mh_$i")
    )
    withShingles.select(col(idCol) +: sigCols: _*)
  }

  /** MinHash-LSH candidate pairs: band the signature, bucket-join on
    * (band, key), emit distinct candidate pairs (a < b) with their exact
    * shingle-Jaccard similarity. This is the scale path: the self-join is
    * on band keys (tiny buckets), never all-pairs.
    */
  def minhashLshPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      numHashes: Int = 16,
      bands: Int = 4,
      shingleSize: Int = 3,
      minJaccard: Double = 0.0
  ): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val rows = numHashes / bands
    val shingled = df
      .select(
        col(idCol).as("doc"),
        HashFunctions.wordShingles(col(textCol), shingleSize).as("shingles")
      )
      .withColumn(
        "sig",
        array((0 until numHashes).map(i => HashFunctions.minhash(col("shingles"), i)): _*)
      )
      .withColumn("bandkeys", HashFunctions.lshBands(col("sig"), bands, rows))

    val banded = shingled
      .select(col("doc"), explode(col("bandkeys")).as("bk"))
      .select(col("doc"), col("bk.band").as("band"), col("bk.key").as("key"))

    val pairs = banded
      .as("l")
      .join(banded.as("r"), Seq("band", "key"))
      .filter(col("l.doc") < col("r.doc"))
      .select(col("l.doc").as("doc_a"), col("r.doc").as("doc_b"))
      .distinct()

    val withSim = pairs
      .join(shingled.select(col("doc").as("doc_a"), col("shingles").as("sh_a")), "doc_a")
      .join(shingled.select(col("doc").as("doc_b"), col("shingles").as("sh_b")), "doc_b")
      .withColumn("jaccard", HashFunctions.jaccard(col("sh_a"), col("sh_b")))
      .filter(col("jaccard") >= minJaccard)
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
    withSim
  }

  /** SimHash fingerprints (bits <= 32, default 32). Near-dups share a
    * fingerprint within small Hamming distance; pair generation buckets
    * on fingerprint bytes at scale.
    */
  def simhashFingerprints(
      df: DataFrame,
      idCol: String,
      textCol: String,
      bits: Int = 32
  ): DataFrame =
    df.select(col(idCol), HashFunctions.simhash(col(textCol), bits).as("simhash"))

  /** Exact n-gram Jaccard similarity for a bounded candidate set
    * (all pairs within a grouping key, e.g. same source bucket).
    */
  def ngramJaccardPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      groupCol: String,
      n: Int = 3,
      minJaccard: Double = 0.0
  ): DataFrame = {
    val sh = df.select(
      col(groupCol).as("grp"),
      col(idCol).as("doc"),
      HashFunctions.charShingles(col(textCol), n).as("sh")
    )
    sh.as("l")
      .join(sh.as("r"), Seq("grp"))
      .filter(col("l.doc") < col("r.doc"))
      .withColumn("jaccard", HashFunctions.jaccard(col("l.sh"), col("r.sh")))
      .filter(col("jaccard") >= minJaccard)
      .select(col("grp"), col("l.doc").as("doc_a"), col("r.doc").as("doc_b"), col("jaccard"))
  }

  /** Embedding near-dup pairs: cosine >= threshold. LSH-bucketed via
    * sign-random-projection at scale; exact within buckets.
    */
  def embeddingNearDupPairs(
      df: DataFrame,
      idCol: String,
      embCol: String,
      threshold: Double,
      planes: Int = 8
  ): DataFrame = {
    import graft.functions.VectorFunctions
    // deterministic pseudo-random hyperplanes from the row's own hash
    // would break LSH; instead bucket on the sign pattern of `planes`
    // fixed coordinate differences — cheap and deterministic. For the
    // exact variant (bench baseline) callers pass planes = 0.
    val base = df.select(col(idCol).as("doc"), col(embCol).as("emb"))
    val bucketed =
      if (planes <= 0) base.withColumn("bucket", lit(0))
      else
        base.withColumn(
          "bucket",
          (0 until planes)
            .map(i =>
              when(element_at(col("emb"), i + 1) >= 0, lit(1L << i)).otherwise(lit(0L))
            )
            .reduce(_ + _)
        )
    bucketed
      .as("l")
      .join(bucketed.as("r"), Seq("bucket"))
      .filter(col("l.doc") < col("r.doc"))
      .withColumn("cosine", VectorFunctions.cosineSimilarity(col("l.emb"), col("r.emb")))
      .filter(col("cosine") >= threshold)
      .select(col("l.doc").as("doc_a"), col("r.doc").as("doc_b"), col("cosine"))
  }
}
