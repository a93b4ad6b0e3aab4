package graft.ops

import scala.util.matching.Regex

/** Temporal keyword detection — a rule-based "optimizer" that rewrites
  * the search plan (expired inclusion, chronological sort, 2k candidate
  * expansion). Faithful port of the five regex classes at reference
  * temporal.py:9-37 and the hint derivation at temporal.py:52-88.
  */
final case class TemporalHints(
    includeExpired: Boolean = false,
    sortChronologically: Boolean = false,
    isTemporal: Boolean = false,
    expandLimit: Boolean = false,
    pointInTimeHint: Boolean = false,
    signals: Seq[String] = Nil
)

object TemporalOps {

  private def ci(p: String): Regex = ("(?i)" + p).r

  private val Expired = ci(
    """\b(used to|previously|formerly|no longer|changed|before .+ switched|was .+ but now)\b"""
  )
  private val Chrono = ci(
    """\b(when did|first|earliest|latest|last time|most recent|in what order|timeline|chronolog)\b"""
  )
  private val TimeDiff = ci(
    """\b(how many days|how long|how much time|duration|elapsed)\b"""
  )
  private val PointInTime = ci(
    """\b(as of|at that time|back then|at the time|in \d{4})\b"""
  )
  private val AnyTemporal = ci(
    """\b(when|before|after|during|since|until|first|last|earliest|latest|used to|previously|changed|how many days|how long|timeline|recent)\b"""
  )

  def detectTemporalHints(query: String): TemporalHints = {
    var h = TemporalHints()
    if (Expired.findFirstIn(query).isDefined)
      h = h.copy(
        includeExpired = true,
        isTemporal = true,
        signals = h.signals :+ "expired"
      )
    if (Chrono.findFirstIn(query).isDefined)
      h = h.copy(
        sortChronologically = true,
        isTemporal = true,
        expandLimit = true,
        signals = h.signals :+ "chronological"
      )
    if (TimeDiff.findFirstIn(query).isDefined)
      h = h.copy(
        includeExpired = true,
        isTemporal = true,
        expandLimit = true,
        signals = h.signals :+ "timediff"
      )
    if (PointInTime.findFirstIn(query).isDefined)
      h = h.copy(
        pointInTimeHint = true,
        isTemporal = true,
        expandLimit = true,
        includeExpired = true,
        signals = h.signals :+ "point_in_time"
      )
    if (!h.isTemporal && AnyTemporal.findFirstIn(query).isDefined)
      h = h.copy(
        isTemporal = true,
        expandLimit = true,
        signals = h.signals :+ "general"
      )
    h
  }

  /** ISO-8601 or year-only date string → epoch ms (reference
    * extraction/temporal.py:26-62; year regex handled first).
    */
  private val YearOnly = """^\d{4}$""".r

  def parseDateToEpochMs(s: String): Option[Long] = {
    val t = s.trim
    if (t.isEmpty) None
    else if (YearOnly.matches(t))
      Some(
        java.time.LocalDate
          .of(t.toInt, 1, 1)
          .atStartOfDay(java.time.ZoneOffset.UTC)
          .toInstant
          .toEpochMilli
      )
    else
      try {
        val inst =
          try java.time.Instant.parse(t)
          catch {
            case _: Exception =>
              try
                java.time.LocalDateTime
                  .parse(t)
                  .atZone(java.time.ZoneOffset.UTC)
                  .toInstant
              catch {
                case _: Exception =>
                  java.time.LocalDate
                    .parse(t)
                    .atStartOfDay(java.time.ZoneOffset.UTC)
                    .toInstant
              }
          }
        Some(inst.toEpochMilli)
      } catch { case _: Exception => None }
  }
}
