package graft.dftly

import java.nio.file.{Files, Path}

import scala.jdk.CollectionConverters._

import org.yaml.snakeyaml.{LoaderOptions, Yaml => SnakeYaml}
import org.yaml.snakeyaml.constructor.SafeConstructor

/** YAML loading for the dict/"base" form (reference: src/dftly/parser.py:326-344:
  * `yaml.load(..., Loader=SafeLoader)` over a raw string or file path).
  *
  * snakeyaml's SafeConstructor matches PyYAML's SafeLoader: plain scalars
  * resolve to String/Int/Long/Double/Boolean/null/java.util.Date, mappings to
  * LinkedHashMap (insertion-ordered — output column order is preserved), and
  * no arbitrary object construction is possible.
  */
object Yaml {

  private def loader: SnakeYaml = new SnakeYaml(new SafeConstructor(new LoaderOptions))

  /** Load YAML text into Scala collections (Map/Seq/scalars). */
  def load(text: String): Any = toScala(loader.load[Any](text))

  def loadPath(path: Path): Any = load(Files.readString(path))

  /** The top-level value must be a mapping of output name → expression
    * (reference: parser.py:346-349).
    */
  def loadExprMap(text: String): Seq[(String, Any)] = asExprMap(load(text))

  def asExprMap(v: Any): Seq[(String, Any)] = v match {
    case m: scala.collection.SeqMap[_, _] =>
      m.toSeq.map { case (k, value) => (k.toString, value) }
    case m: scala.collection.Map[_, _] =>
      m.toSeq.map { case (k, value) => (k.toString, value) }
    case other =>
      throw new IllegalArgumentException(
        s"Top-level YAML value must be a mapping of output column name to expression; got $other"
      )
  }

  /** java.util collections → immutable Scala, preserving mapping order. */
  private def toScala(v: Any): Any = v match {
    case m: java.util.Map[_, _] =>
      val b = scala.collection.immutable.VectorMap.newBuilder[String, Any]
      m.asScala.foreach { case (k, value) => b += (String.valueOf(k) -> toScala(value)) }
      b.result()
    case l: java.util.List[_] => l.asScala.toVector.map(toScala)
    case s: java.util.Set[_]  => s.asScala.toSet[Any].map(toScala)
    case other                => other
  }
}
