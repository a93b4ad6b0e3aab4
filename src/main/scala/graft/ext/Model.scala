package graft.ext

/** LLM-shaped extension points (SURVEY §2.13). The reference hides all
  * model calls behind pydantic-ai agents (extraction/facts.py:23-52,
  * reconciliation/memories.py:28-108, reranker.py:43-47, ...); its tests
  * replace them with scripted outputs (tests/mock_llm.py:46-91). We do the
  * same: traits with deterministic scripted implementations, so everything
  * the engine itself computes is exactly reproducible.
  */
final case class ExtractedEntity(name: String, entityType: String)
final case class ExtractedRelation(
    source: String,
    target: String,
    relationType: String
)
final case class Extraction(
    facts: Seq[String],
    entities: Seq[ExtractedEntity],
    relations: Seq[ExtractedRelation]
)
final case class TemporalAnnotation(
    factIndex: Int,
    validAt: Option[Long],
    invalidAt: Option[Long]
)

sealed trait DecisionAction
object DecisionAction {
  case object Add extends DecisionAction
  case object Update extends DecisionAction
  case object Delete extends DecisionAction
  case object None extends DecisionAction
}
final case class Decision(
    action: DecisionAction,
    text: String,
    targetMemoryId: Option[Long]
)

trait Extractor extends Serializable {
  /** Combined extraction: facts + entities + relations from input text.
    * May throw — callers fall back to the separate legs below, mirroring
    * the reference's combined→separate ladder
    * (extraction/entities.py:96-132).
    */
  def extract(text: String): Extraction
  /** Fallback leg 1: facts only. */
  def extractFactsOnly(text: String): Seq[String] = Seq(text)
  /** Fallback leg 2: entities + relations only. */
  def extractEntitiesOnly(
      text: String): (Seq[ExtractedEntity], Seq[ExtractedRelation]) = (Nil, Nil)
  /** Entity extraction for a search query. */
  def extractQueryEntities(query: String): Seq[ExtractedEntity] =
    extract(query).entities
  /** Bitemporal annotation of extracted facts (optional stage). */
  def annotateTemporal(facts: Seq[String]): Seq[TemporalAnnotation] = Nil
}

/** Failure-injection extractor: `extract` throws for the first
  * `failures` calls (the scripted-error pattern of tests/mock_llm.py:
  * 66-91), then delegates; the separate-leg fallbacks always succeed.
  */
final class FailingThenScriptedExtractor(
    failures: Int,
    outputs: Seq[Extraction]
) extends Extractor {
  private var remaining = failures
  private val queue = scala.collection.mutable.Queue(outputs: _*)
  override def extract(text: String): Extraction = {
    if (remaining > 0) {
      remaining -= 1
      throw new RuntimeException("scripted combined-extraction failure")
    }
    if (queue.nonEmpty) queue.dequeue() else Extraction(Seq(text), Nil, Nil)
  }
  override def extractFactsOnly(text: String): Seq[String] =
    if (queue.nonEmpty) queue.front.facts else Seq(text)
  override def extractEntitiesOnly(
      text: String): (Seq[ExtractedEntity], Seq[ExtractedRelation]) =
    if (queue.nonEmpty) { val e = queue.dequeue(); (e.entities, e.relations) }
    else (Nil, Nil)
}

trait Reconciler extends Serializable {
  /** Given new facts and candidate existing memories (id, text), decide
    * ADD / UPDATE / DELETE / NONE per fact
    * (reference reconciliation/memories.py:28-108).
    */
  def reconcile(
      facts: Seq[String],
      candidates: Seq[(Long, String)]
  ): Seq[Decision]

  /** W10 — relation reconciliation: given newly-extracted relations and
    * existing (source, target, relation_type) triples around the touched
    * entities, return the existing triples to delete
    * (reference reconciliation/relations.py:26-62). Default: keep all.
    */
  def reconcileRelations(
      newRelations: Seq[ExtractedRelation],
      existing: Seq[ExtractedRelation]
  ): Seq[ExtractedRelation] = Nil
}

trait Reranker extends Serializable {
  /** Relevance score in [0,1] per (query, text); fallback to the original
    * score happens in the pipeline (reference reranker.py:65-124). */
  def score(query: String, texts: Seq[String]): Seq[Double]
}

trait Summarizer extends Serializable {
  /** Consolidate a batch of memory texts into summary texts (W7). */
  def summarize(texts: Seq[String]): Seq[String]
  /** Community naming/summary (G4). */
  def describeCommunity(
      memberNames: Seq[String],
      relations: Seq[String]
  ): (String, String) = (memberNames.sorted.mkString(", "), "community")
}

trait Vision extends Serializable {
  /** Describe images as text; failures fall back to the placeholder
    * "[image: undescribed]" (reference vision.py:24-55). */
  def describe(images: Seq[graft.sources.ImageContent]): Seq[String]
}

/** Deterministic vision stub: "describes" an image by a digest of its
  * url/bytes — same image, same description. */
final class HashVision extends Vision {
  override def describe(images: Seq[graft.sources.ImageContent]): Seq[String] =
    images.map { img =>
      img.url.orElse(img.data.map(d => java.util.Base64.getEncoder.encodeToString(d))) match {
        case Some(key) =>
          val h = java.security.MessageDigest.getInstance("SHA-256")
            .digest(key.getBytes("UTF-8"))
          f"image ${h.take(4).map(b => f"${b & 0xff}%02x").mkString}"
        case None => "[image: undescribed]"
      }
    }
}

/** Deterministic rule-based extractor for LLM-free deployments (the CLI
  * default): sentences become facts; capitalized multi-word spans become
  * entities (snake_cased, like the reference's entity normalization,
  * extraction/entities.py name handling); "A <verb phrase> B" between
  * two entities in one sentence becomes a relation with the lowercased
  * connecting words as relation_type.
  */
final class HeuristicExtractor extends Extractor {
  private val Sentence = "[.!?]+\\s+|[.!?]+$".r
  private val EntitySpan = "\\b([A-Z][a-zA-Z0-9]*(?:\\s+[A-Z][a-zA-Z0-9]*)*)\\b".r
  private def norm(s: String): String = s.trim.toLowerCase.replaceAll("\\s+", "_")

  override def extract(text: String): Extraction = {
    val sentences = Sentence.split(text).map(_.trim).filter(_.nonEmpty).toSeq
    val facts = if (sentences.nonEmpty) sentences else Seq(text.trim).filter(_.nonEmpty)
    val entities = scala.collection.mutable.LinkedHashMap.empty[String, ExtractedEntity]
    val relations = scala.collection.mutable.ArrayBuffer.empty[ExtractedRelation]
    sentences.foreach { s =>
      val spans = EntitySpan.findAllMatchIn(s).map(_.group(1)).toSeq
        .filterNot(sp => sp.length < 2)
      spans.foreach(sp =>
        entities.getOrElseUpdate(norm(sp), ExtractedEntity(norm(sp), "entity")))
      // relation: two entity spans with 1-4 connecting words
      spans.sliding(2).foreach {
        case Seq(a, b) =>
          val i = s.indexOf(a); val j = s.indexOf(b, i + a.length)
          if (i >= 0 && j > i) {
            val between = s.substring(i + a.length, j).trim
              .replaceAll("[^a-zA-Z\\s]", "").trim
            val words = between.split("\\s+").filter(_.nonEmpty)
            if (words.nonEmpty && words.length <= 4)
              relations += ExtractedRelation(norm(a), norm(b),
                words.map(_.toLowerCase).mkString("_"))
          }
        case _ => ()
      }
    }
    Extraction(facts, entities.values.toSeq, relations.toSeq)
  }
}

/** Scripted implementations for tests — deterministic, no model calls. */
final class ScriptedExtractor(outputs: Seq[Extraction]) extends Extractor {
  private val queue = scala.collection.mutable.Queue(outputs: _*)
  override def extract(text: String): Extraction =
    if (queue.nonEmpty) queue.dequeue()
    else Extraction(Seq(text), Nil, Nil)
}

/** Default no-LLM reconciler: every fact is an ADD (matches the reference
  * fast path when no candidates exist, reconciliation/memories.py:88-90).
  */
final class AddAllReconciler extends Reconciler {
  override def reconcile(
      facts: Seq[String],
      candidates: Seq[(Long, String)]
  ): Seq[Decision] =
    facts.map(f => Decision(DecisionAction.Add, f, None))
}

final class ScriptedReconciler(outputs: Seq[Seq[Decision]])
    extends Reconciler {
  private val queue = scala.collection.mutable.Queue(outputs: _*)
  override def reconcile(
      facts: Seq[String],
      candidates: Seq[(Long, String)]
  ): Seq[Decision] =
    if (queue.nonEmpty) queue.dequeue()
    else facts.map(f => Decision(DecisionAction.Add, f, None))
}

/** Deterministic reranker: hash-based pseudo-score, stable across runs. */
final class HashReranker extends Reranker {
  override def score(query: String, texts: Seq[String]): Seq[Double] =
    texts.map { t =>
      val h = java.security.MessageDigest
        .getInstance("SHA-256")
        .digest((query + "|" + t).getBytes("UTF-8"))
      ((h(0) & 0xff).toDouble * 256 + (h(1) & 0xff)) / 65535.0
    }
}

final class ConcatSummarizer extends Summarizer {
  override def summarize(texts: Seq[String]): Seq[String] =
    Seq(texts.mkString("; "))
}
