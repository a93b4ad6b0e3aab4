package graft.api

/** Public API result types — ports of the reference's dataclasses
  * (types.py:174-347). Ids are stringified at this boundary exactly like
  * the reference (manager.py:1091 str(node_id)).
  */
/** One {source, relation, target} triple attached to a search result
  * (types.py:188-209 `relations`; search/vector.py:384-409).
  */
final case class RelationTriple(source: String, relation: String, target: String)

final case class SearchResult(
    memoryId: String,
    text: String,
    score: Double,
    userId: String,
    metadata: Option[String],
    actorId: Option[String],
    role: Option[String],
    memoryType: String,
    source: String, // vector | graph | both
    createdAt: Option[Long],
    learnedAt: Option[Long],
    sessionId: Option[String],
    expiredAt: Option[Long],
    validAt: Option[Long],
    invalidAt: Option[Long],
    relations: Seq[RelationTriple] = Nil
)

/** One add()-pipeline event (types.py:330-337). */
final case class MemoryEvent(
    event: String, // ADD | UPDATE | DELETE | NONE
    memoryId: Option[String],
    text: String,
    previousText: Option[String] = None
)

final case class AddResult(events: Seq[MemoryEvent])

final case class HistoryEntry(
    event: String, // ADD | UPDATE | DELETE
    memoryId: String,
    timestamp: Long,
    oldText: Option[String],
    newText: Option[String],
    actorId: Option[String],
    role: Option[String]
)

final case class MemoryStats(
    totalMemories: Long,
    semanticCount: Long,
    proceduralCount: Long,
    episodicCount: Long,
    entityCount: Long,
    relationCount: Long,
    episodeCount: Long,
    communityCount: Long,
    expiredCount: Long
)

/** One hop of a temporal LEADS_TO chain (manager.py:1490 "List of dicts
  * with memory_id, text, created_at, session_id").
  */
final case class ChainEntry(
    memoryId: String,
    text: String,
    createdAt: Option[Long],
    sessionId: Option[String]
)

/** A raw episode with provenance information (types.py:304-316). */
final case class EpisodeResult(
    episodeId: String,
    content: String,
    source: String,
    userId: String,
    sessionId: Option[String],
    runId: Option[String],
    createdAt: Option[Long],
    producedMemories: Seq[String] = Nil,
    mentionedEntities: Seq[String] = Nil
)

/** One community a queried entity belongs to (types.py:320-328,
  * communities.py:241-283).
  */
final case class CommunityInfo(
    communityId: String,
    name: String,
    summary: String,
    memberCount: Long,
    memberEntities: Seq[String]
)

/** R9 — one explain-pipeline stage observation (types.py:271-284). */
final case class ExplainStep(name: String, detail: String, count: Long)

final case class ExplainResult(
    steps: Seq[ExplainStep],
    results: Seq[SearchResult]
)
