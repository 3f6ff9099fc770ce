package graft.project

import org.yaml.snakeyaml.{LoaderOptions, Yaml => SnakeYaml}
import org.yaml.snakeyaml.constructor.SafeConstructor
import scala.jdk.CollectionConverters._

/** snakeyaml → plain Scala values (Map[String,Any] / Vector / scalars).
  * The reference uses serde_yaml into typed schemas
  * (crates/dbt-schemas/src/schemas/); we parse to dynamic maps and let the
  * node builders pick fields, which keeps unknown keys available in
  * `config.extra`. */
object Yaml {
  def parse(text: String): Any =
    toScala(new SnakeYaml(new SafeConstructor(new LoaderOptions)).load[Any](text))

  def parseMap(text: String): Map[String, Any] = parse(text) match {
    case m: Map[_, _] => m.asInstanceOf[Map[String, Any]]
    case null => Map.empty
    case other => throw new IllegalArgumentException(s"expected mapping, got $other")
  }

  private def toScala(v: Any): Any = v match {
    case m: java.util.Map[_, _] =>
      m.asScala.map { case (k, x) => String.valueOf(k) -> toScala(x) }.toMap
    case l: java.util.List[_] => l.asScala.map(toScala).toVector
    case i: java.lang.Integer => i.longValue()
    case other => other
  }

  /** Navigate nested maps: get(m, "models", "my_project"). */
  def dig(m: Any, path: String*): Option[Any] =
    path.foldLeft(Option(m)) {
      case (Some(mm: Map[_, _]), k) =>
        mm.asInstanceOf[Map[String, Any]].get(k)
      case _ => None
    }

  def str(v: Any): String = String.valueOf(v)
  def strSeq(v: Any): Seq[String] = v match {
    case s: Seq[_] => s.map(String.valueOf(_))
    case null => Nil
    case one => Seq(String.valueOf(one))
  }
}
