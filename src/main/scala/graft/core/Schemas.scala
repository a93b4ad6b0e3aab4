package graft.core

/** Core data model — a labeled property graph of memories, entities,
  * episodes, communities and history events, stored as one Dataset per
  * label plus a single typed edge table.
  *
  * Mirrors the reference schema (see SURVEY.md §1; reference
  * /root/reference/protocol.py:17-27 for nodes,
  * /root/reference/protocol.py:80-88 for edges,
  * /root/reference/manager.py:1053-1080 for Memory properties).
  *
  * Timestamps are epoch-milliseconds Longs everywhere (the reference has
  * no native timestamp type); `Option[Long]` for nullable ones. Embeddings
  * are float arrays of configurable dimension.
  */
final case class MemoryRow(
    id: Long,
    text: String,
    user_id: String,
    created_at: Long,
    updated_at: Long,
    learned_at: Long,
    memory_type: String, // semantic | procedural | episodic
    valid_at: Option[Long],
    invalid_at: Option[Long],
    expired_at: Option[Long],
    session_id: Option[String],
    agent_id: Option[String],
    run_id: Option[String],
    graph_name: Option[String],
    metadata: Option[String], // JSON-encoded string, as in the reference
    actor_id: Option[String],
    role: Option[String],
    importance: Option[Double],
    access_count: Option[Long],
    last_accessed: Option[Long],
    embedding: Array[Float],
    source: Option[String],
    // cached whole-graph metric columns (reference `_pagerank`,
    // `_betweenness`, `_community` props, manager.py:1620,1629,1639)
    pagerank: Option[Double] = None,
    betweenness: Option[Double] = None,
    community: Option[Long] = None
)

final case class EntityRow(
    id: Long,
    name: String,
    entity_type: String,
    user_id: String,
    graph_name: Option[String]
)

final case class EpisodeRow(
    id: Long,
    content: String,
    source: String,
    user_id: String,
    created_at: Long,
    session_id: Option[String],
    run_id: Option[String]
)

final case class CommunityRow(
    id: Long,
    name: String,
    summary: String,
    community_id: Long,
    member_count: Long,
    user_id: String,
    created_at: Long,
    updated_at: Long
)

final case class HistoryRow(
    id: Long,
    memory_id: Long,
    event: String, // ADD | UPDATE | DELETE
    timestamp: Long,
    old_text: Option[String],
    new_text: Option[String],
    actor_id: Option[String],
    role: Option[String]
)

/** One edge table for all edge types (SURVEY §1.3). */
final case class EdgeRow(
    edge_id: Long,
    src: Long,
    dst: Long,
    edge_type: String,
    props: Map[String, String]
)

object EdgeTypes {
  val HasEntity = "HAS_ENTITY" // Memory -> Entity
  val Relation = "RELATION" // Entity -> Entity (+relation_type prop)
  val Supersedes = "SUPERSEDES" // new Memory -> old Memory
  val DerivedFrom = "DERIVED_FROM" // summary Memory -> original Memory
  val LeadsTo = "LEADS_TO" // Memory -> Memory (+sequence prop)
  val Produced = "PRODUCED" // Episode -> Memory
  val Mentions = "MENTIONS" // Episode -> Entity
  val NextEpisode = "NEXT_EPISODE" // Episode -> Episode
  val HasMember = "HAS_MEMBER" // Community -> Entity
  val HasHistory = "HAS_HISTORY" // Memory -> History
}

object MemoryTypes {
  val Semantic = "semantic"
  val Procedural = "procedural"
  val Episodic = "episodic"
  val Default = Semantic // missing memory_type reads as semantic
}
