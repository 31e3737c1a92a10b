package graft.core

import java.nio.file.{Files, Paths, StandardCopyOption}
import org.json4s._
import org.json4s.jackson.JsonMethods

/** Per-node key-value State + run control
  * (/root/reference/patterns/node/node.py:417-505).
  *
  * Values are JSON scalars/structures persisted per node at
  * `<warehouse>/_state/<node>.json`. `shouldContinue` implements the
  * cooperative-deadline contract: stop at max(80% of the time limit,
  * 120 s before it) — node.py:469-480.
  */
final class State(root: String, node: String) {
  private val dir = Paths.get(root, "_state")
  private val path = dir.resolve(s"$node.json")
  private val startedAtMs: Long = System.currentTimeMillis()

  /** In-memory view; persisted on every set (cheap: one small file). */
  private var kv: Map[String, JValue] = load()
  private var newRunRequested: Option[(Boolean, Long)] = None

  private def load(): Map[String, JValue] =
    if (!Files.exists(path)) Map.empty
    else JsonMethods.parse(Files.readString(path)) match {
      case JObject(fields) => fields.toMap
      case _ => Map.empty
    }

  private def persist(): Unit = {
    Files.createDirectories(dir)
    val tmp = dir.resolve(s"$node.json.tmp-${Thread.currentThread.getId}")
    Files.writeString(tmp, JsonMethods.compact(JsonMethods.render(JObject(kv.toList: _*))))
    Files.move(tmp, path, StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
  }

  def setRaw(key: String, value: JValue): Unit = { kv = kv + (key -> value); persist() }
  def getRaw(key: String): Option[JValue] = kv.get(key)

  def set(key: String, value: Any): Unit = setRaw(key, State.toJ(value))

  /** getValue with optional default (node.py:446-456). */
  def get(key: String): Option[Any] = getRaw(key).map(State.fromJ)
  def getOrElse(key: String, default: Any): Any = get(key).getOrElse(default)

  def delete(key: String): Unit = { kv = kv - key; persist() }
  def reset(): Unit = { kv = Map.empty; persist() }

  /** node.py:465-480: false once the execution nears its time limit. */
  def shouldContinue(
      limitMs: Long = 10 * 60 * 1000L,
      pctOfLimit: Double = 0.8,
      msTillLimit: Long = 120 * 1000L): Boolean = {
    val elapsed = System.currentTimeMillis() - startedAtMs
    val cutoff = math.max(pctOfLimit * limitMs, limitMs - msTillLimit)
    elapsed < cutoff
  }

  /** node.py:483-500: ask the scheduler for a follow-up run. */
  def requestNewRun(triggerDownstream: Boolean = true, waitAtleastSeconds: Long = 0): Unit =
    newRunRequested = Some((triggerDownstream, waitAtleastSeconds))
  def pendingNewRun: Option[(Boolean, Long)] = newRunRequested
  def clearNewRun(): Unit = newRunRequested = None
}

object State {
  def toJ(v: Any): JValue = v match {
    case null => JNull
    case j: JValue => j
    case s: String => JString(s)
    case b: Boolean => JBool(b)
    case i: Int => JInt(BigInt(i))
    case l: Long => JInt(BigInt(l))
    case d: Double => JDouble(d)
    case f: Float => JDouble(f.toDouble)
    case bd: BigDecimal => JDecimal(bd)
    case m: Map[_, _] =>
      JObject(m.toList.map { case (k, x) => k.toString -> toJ(x) })
    case xs: Iterable[_] => JArray(xs.toList.map(toJ))
    case other => JString(other.toString)
  }

  def fromJ(j: JValue): Any = j match {
    case JNull | JNothing => null
    case JString(s) => s
    case JBool(b) => b
    case JInt(i) => if (i.isValidLong) i.toLong else i
    case JLong(l) => l
    case JDouble(d) => d
    case JDecimal(d) => d
    case JObject(fs) => fs.map { case (k, v) => k -> fromJ(v) }.toMap
    case JArray(xs) => xs.map(fromJ)
    case JSet(xs) => xs.map(fromJ)
  }
}
