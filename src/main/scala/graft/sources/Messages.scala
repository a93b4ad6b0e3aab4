package graft.sources

/** S10 — message-source parsing: normalize `str | dict | list[dict]`
  * input to (extraction text, parsed messages, images) — a faithful
  * Scala port of reference messages.py:30-90, with the OpenAI-style
  * multimodal content-part lists (`{"type":"text"|"image_url",...}`).
  */
final case class Message(
    role: String,
    content: String,
    name: Option[String] = None
)

/** Either `url` or `data` is populated, never both (messages.py:18-27). */
final case class ImageContent(
    url: Option[String] = None,
    data: Option[Array[Byte]] = None,
    mediaType: String = "image/png"
)

/** A content part of a multimodal message. */
sealed trait ContentPart
final case class TextPart(text: String) extends ContentPart
final case class ImageUrlPart(url: String) extends ContentPart

/** Input forms accepted by add() (messages.py:30-37). */
sealed trait MessageInput
final case class TextInput(text: String) extends MessageInput
final case class MessageDict(
    role: String = "user",
    content: Either[String, Seq[ContentPart]] = Left(""),
    name: Option[String] = None
) extends MessageInput
final case class MessageList(messages: Seq[MessageDict]) extends MessageInput

object Messages {

  /** parse_messages (messages.py:30-90): returns
    * (concatenated text for extraction, parsed messages, images).
    */
  def parse(input: MessageInput): (String, Seq[Message], Seq[ImageContent]) =
    input match {
      case TextInput(t) =>
        (t, Seq(Message("user", t)), Nil)
      case m: MessageDict => parseList(Seq(m))
      case MessageList(ms) =>
        if (ms.isEmpty) ("", Nil, Nil) else parseList(ms)
    }

  private def parseList(msgs: Seq[MessageDict]): (String, Seq[Message], Seq[ImageContent]) = {
    val parts = Seq.newBuilder[String]
    val parsed = Seq.newBuilder[Message]
    val images = Seq.newBuilder[ImageContent]
    msgs.foreach { msg =>
      val content = msg.content match {
        case Left(s) => s
        case Right(cparts) =>
          // multimodal: concatenate text parts, collect image_url parts
          val texts = cparts.collect { case TextPart(t) => t }
          cparts.collect { case ImageUrlPart(u) if u.nonEmpty =>
            images += ImageContent(url = Some(u))
          }
          texts.mkString(" ")
      }
      val prefix = msg.name match {
        case Some(n) => s"$n (${msg.role})"
        case None => msg.role
      }
      parts += s"$prefix: $content"
      parsed += Message(msg.role, content, msg.name)
    }
    (parts.result().mkString("\n"), parsed.result(), images.result())
  }

  /** _extract_actor (manager.py:2043-2054): actor_id/role from the LAST
    * message with a name; else role of the last message.
    */
  def extractActor(parsed: Seq[Message]): (Option[String], Option[String]) =
    parsed.reverse.find(_.name.isDefined) match {
      case Some(m) => (m.name, Some(m.role))
      case None => (None, parsed.lastOption.map(_.role))
    }
}
