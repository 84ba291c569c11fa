package graft.util

import graft.schema.Gdelt
import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

/** YAML pipeline configuration, mirroring the reference's single-file
  * config contract (reference: utils/config.py:6-14,
  * config/settings.example.yaml) — schema column list, per-stage paths,
  * filter check-columns, partitioning rules, and sampling defaults, with
  * the same "missing file/section → fail fast" behavior.
  *
  * Parsed with SnakeYAML (ships with Spark). Absent sections fall back to
  * the Gdelt schema defaults, matching how the reference's example config
  * mirrors its built-ins.
  */
final case class GraftConfig(
    columns: Seq[String],
    numericColumns: Set[String],
    filterColumns: Seq[String],
    partitionRules: Map[String, Seq[String]],
    paths: Map[String, String],
    defaultSeed: Long,
    defaultN: Int,
    defaultPerDay: Int)

object Config {

  val Default: GraftConfig = GraftConfig(
    columns = Gdelt.columns,
    numericColumns = Gdelt.numericColumns,
    filterColumns = Gdelt.defaultFilterColumns,
    partitionRules = Gdelt.partitionRules,
    paths = Map.empty,
    defaultSeed = 42L, defaultN = 1000, defaultPerDay = 10)

  /** Load config from a YAML file; missing file raises (config.py:8-12). */
  def load(path: String): GraftConfig = {
    val p = Paths.get(path)
    if (!Files.exists(p))
      throw new IllegalArgumentException(s"Config file not found: $path")
    parse(Files.readString(p))
  }

  /** Parse YAML text into a config, defaulting absent sections. */
  def parse(yamlText: String): GraftConfig = {
    val yaml = new org.yaml.snakeyaml.Yaml()
    val root = Option(yaml.load[java.util.Map[String, Object]](yamlText))
      .map(_.asScala.toMap).getOrElse(Map.empty[String, Object])

    def strList(v: Object): Seq[String] =
      v.asInstanceOf[java.util.List[Object]].asScala.toSeq.map(_.toString)
    def section(name: String): Map[String, Object] =
      root.get(name).map(_.asInstanceOf[java.util.Map[String, Object]]
        .asScala.toMap).getOrElse(Map.empty)

    val schema = section("schema")
    val filter = section("filter")
    val converter = section("converter")
    val sampling = section("sampling")

    val rules = converter.get("partitioning") match {
      case Some(p) =>
        val rulesList = p.asInstanceOf[java.util.Map[String, Object]].asScala
          .get("rules").map(_.asInstanceOf[java.util.List[Object]].asScala.toSeq)
          .getOrElse(Seq.empty)
        rulesList.map { r =>
          val m = r.asInstanceOf[java.util.Map[String, Object]].asScala
          m("file_type").toString -> strList(m("by"))
        }.toMap
      case None => Default.partitionRules
    }

    GraftConfig(
      columns = schema.get("columns").map(strList).getOrElse(Default.columns),
      numericColumns = schema.get("numeric_columns").map(strList(_).toSet)
        .getOrElse(Default.numericColumns),
      filterColumns = filter.get("columns_to_check").map(strList)
        .getOrElse(Default.filterColumns),
      partitionRules = rules,
      paths = section("paths").map { case (k, v) => k -> v.toString },
      defaultSeed = sampling.get("seed").map(_.toString.toLong)
        .getOrElse(Default.defaultSeed),
      defaultN = sampling.get("n").map(_.toString.toInt).getOrElse(Default.defaultN),
      defaultPerDay = sampling.get("per_day").map(_.toString.toInt)
        .getOrElse(Default.defaultPerDay))
  }
}
