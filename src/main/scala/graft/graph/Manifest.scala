package graft.graph

import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._
import org.yaml.snakeyaml.Yaml

/** graph.yml vocabulary (/root/reference/patterns/cli/configuration/edit.py:84-232):
  * a DAG of function nodes (sql / scala / webhook / subgraph / component)
  * wired to stores through named ports, with cron triggers and
  * parameters; subgraphs surface ports via `exposes:`.
  */
final case class FunctionNode(
    id: Option[String],
    title: Option[String],
    nodeFile: Option[String],
    webhook: Option[String],
    uses: Option[String],
    trigger: Option[String],
    inputs: Map[String, String],
    outputs: Map[String, String],
    parameters: Map[String, Any]) {
  def kind: String =
    if (webhook.isDefined) "webhook"
    else if (uses.isDefined) "component"
    else nodeFile match {
      case Some(f) if f.endsWith(".sql") => "sql"
      case Some(f) if f.endsWith("graph.yml") => "subgraph"
      case Some(_) => "code"
      case None => "invalid"
    }
  def displayName: String =
    id.orElse(title).orElse(nodeFile).orElse(webhook).orElse(uses).getOrElse("?")
}

final case class StoreDef(name: String, kind: String, schema: Option[String])

final case class GraphManifest(
    title: Option[String],
    slug: Option[String],
    functions: List[FunctionNode],
    stores: List[StoreDef],
    exposesInputs: List[String],
    exposesOutputs: List[String],
    dir: Path)

object GraphManifest {

  def load(path: String): GraphManifest = {
    val p = Paths.get(path)
    val file = if (Files.isDirectory(p)) p.resolve("graph.yml") else p
    parse(Files.readString(file), file.getParent)
  }

  def parse(yamlText: String, dir: Path): GraphManifest = {
    val root = Option(new Yaml().load[java.util.Map[String, Any]](yamlText))
      .map(_.asScala.toMap).getOrElse(Map.empty[String, Any])

    def str(v: Any): String = String.valueOf(v)
    def strMap(v: Any): Map[String, String] = v match {
      case m: java.util.Map[_, _] =>
        m.asScala.map { case (k, x) => str(k) -> str(x) }.toMap
      case null => Map.empty
      case _ => Map.empty
    }
    def anyMap(v: Any): Map[String, Any] = v match {
      case m: java.util.Map[_, _] =>
        m.asScala.map { case (k, x) => str(k) -> (x: Any) }.toMap
      case null => Map.empty
      case _ => Map.empty
    }

    val functions = root.get("functions").toList.flatMap {
      case l: java.util.List[_] => l.asScala.toList.collect {
        case m: java.util.Map[_, _] =>
          val f = m.asScala.map { case (k, v) => str(k) -> (v: Any) }.toMap
          FunctionNode(
            id = f.get("id").map(str),
            title = f.get("title").map(str),
            nodeFile = f.get("node_file").map(str),
            webhook = f.get("webhook").map(str),
            uses = f.get("uses").map(str),
            trigger = f.get("trigger").map(str),
            inputs = f.get("inputs").map(strMap).getOrElse(Map.empty),
            outputs = f.get("outputs").map(strMap).getOrElse(Map.empty),
            parameters = f.get("parameters").map(anyMap).getOrElse(Map.empty))
      }
      case _ => Nil
    }

    val stores = root.get("stores").toList.flatMap {
      case l: java.util.List[_] => l.asScala.toList.collect {
        case m: java.util.Map[_, _] =>
          val f = m.asScala.map { case (k, v) => str(k) -> (v: Any) }.toMap
          val (name, kind) =
            if (f.contains("table")) (str(f("table")), "table")
            else (str(f("stream")), "stream")
          StoreDef(name, kind, f.get("schema").map(str))
      }
      case _ => Nil
    }

    val exposes = root.get("exposes").map(anyMap).getOrElse(Map.empty)
    def strList(v: Any): List[String] = v match {
      case l: java.util.List[_] => l.asScala.toList.map(str)
      case null => Nil
      case _ => Nil
    }

    GraphManifest(
      title = root.get("title").map(str),
      slug = root.get("slug").map(str),
      functions = functions,
      stores = stores,
      exposesInputs = exposes.get("inputs").map(strList).getOrElse(Nil),
      exposesOutputs = exposes.get("outputs").map(strList).getOrElse(Nil),
      dir = dir)
  }

  /** 8-char random node id, alphabet [0-9a-z]
    * (/root/reference/patterns/cli/helpers.py:128-132).
    */
  def newNodeId(rng: scala.util.Random = new scala.util.Random()): String =
    (1 to 8).map(_ => "0123456789abcdefghijklmnopqrstuvwxyz"(rng.nextInt(36))).mkString
}
