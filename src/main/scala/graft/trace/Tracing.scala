package graft.trace

/** Lightweight span instrumentation (reference _tracing.py +
  * test_instrumentation.py): every public engine operation opens a span,
  * nested stages attach to the active parent via a thread-local stack.
  * The trait is deliberately OTel-shaped (name, attributes, duration,
  * parent) so a real OpenTelemetry bridge is a ~20-line adapter — the
  * engine itself carries no tracing dependency (build.sbt is frozen).
  */
trait Tracer extends Serializable {
  /** Run `f` inside a span; must record even when `f` throws. */
  def span[T](name: String, attrs: Map[String, String] = Map.empty)(f: => T): T
}

/** Default: zero overhead, no recording. */
object NoopTracer extends Tracer {
  override def span[T](name: String, attrs: Map[String, String])(f: => T): T = f
}

/** One finished span. Durations are wall-clock nanos; parent is the
  * enclosing span's name ("" at root). `error` carries the exception
  * class when the traced body threw.
  */
final case class SpanRecord(
    name: String,
    parent: String,
    attrs: Map[String, String],
    durationNanos: Long,
    error: Option[String]
)

/** In-memory recorder — the deterministic test/trace backend, and the
  * shape an exporter would consume.
  */
final class RecordingTracer extends Tracer {
  private val records = new java.util.concurrent.ConcurrentLinkedQueue[SpanRecord]()
  private val stack = new ThreadLocal[List[String]] {
    override def initialValue(): List[String] = Nil
  }

  override def span[T](name: String, attrs: Map[String, String])(f: => T): T = {
    val parent = stack.get().headOption.getOrElse("")
    stack.set(name :: stack.get())
    val t0 = System.nanoTime()
    var err: Option[String] = None
    try f
    catch {
      case e: Throwable => err = Some(e.getClass.getSimpleName); throw e
    } finally {
      stack.set(stack.get().tail)
      records.add(SpanRecord(name, parent, attrs, System.nanoTime() - t0, err))
    }
  }

  def spans: Seq[SpanRecord] = {
    import scala.jdk.CollectionConverters._
    records.asScala.toSeq
  }
  def clear(): Unit = records.clear()
}
