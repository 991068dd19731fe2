package graft.enrich

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import graft.cdc.RetryPolicy
import graft.enrich.Classifiers.RegexRule
import graft.enrich.Validation.RangeRule

/** Config-as-data rule loading: classification rule tables, override maps,
  * lookups and defaults are parsed from an external JSON config file into
  * the structures [[Classifiers.classify]] folds into its when/rlike
  * chain — so a user changes a classification rule by EDITING CONFIG, not
  * by recompiling (reference: rules live in Config/config.yaml:26-93 and
  * are parsed at Scripts/python/enhanced_main_etl.py:220-295).
  *
  * JSON instead of YAML keeps the dependency surface at zero: Jackson
  * ships with Spark (the same mapper the lake manifests use). The format
  * mirrors the reference config section-for-section:
  *
  * {{{
  * {
  *   "illness_rules": [
  *     {"priority": 10, "pattern": "septic[ _-]?shock", "label": "SEPTIC_SHOCK"}
  *   ],
  *   "overrides": {"conv-000042": "SEPSIS"},
  *   "default_label": "UNKNOWN",
  *   "manufacturers": [{"match": "illumina", "name": "Illumina"}]
  * }
  * }}}
  *
  * The rule DATA changes per deployment; the PLAN SHAPE does not — any
  * config folds into the same codegen'd expression chain, so config edits
  * cannot deoptimize the pipeline.
  */
object RulesConfig {

  /** @param validation range-bound rules feeding [[Validation.rangeFlags]]
    *                    (reference: Config/config.yaml:82)
    * @param retry      engine-level epoch retry/backoff consumed by
    *                    [[graft.cdc.CdcStream]] (reference:
    *                    Config/config.yaml:149-152)
    */
  final case class Rules(
      illnessRules: Seq[RegexRule],
      overrides: Map[String, String],
      defaultLabel: String,
      manufacturers: Seq[(String, String)],
      validation: Seq[RangeRule] = Nil,
      retry: RetryPolicy = RetryPolicy.default)

  /** The shipped default config — the SAME rule data the reference ships
    * in its config.yaml, embedded as config text and run through the same
    * parser as a user-provided file (so the default path exercises
    * config-as-data too, not a parallel in-code table).
    */
  val defaultJson: String =
    """{
      |  "illness_rules": [
      |    {"priority": 10, "pattern": "septic[ _-]?shock", "label": "SEPTIC_SHOCK"},
      |    {"priority": 20, "pattern": "no[ _-]?sepsis|non[ _-]?septic", "label": "NO_SEPSIS"},
      |    {"priority": 30, "pattern": "sepsis|septic", "label": "SEPSIS"},
      |    {"priority": 40, "pattern": "control|healthy|normal", "label": "CONTROL"}
      |  ],
      |  "overrides": {},
      |  "default_label": "UNKNOWN",
      |  "manufacturers": [
      |    {"match": "illumina", "name": "Illumina"},
      |    {"match": "affymetrix", "name": "Affymetrix"},
      |    {"match": "agilent", "name": "Agilent"},
      |    {"match": "nanostring", "name": "NanoString"}
      |  ],
      |  "validation": [
      |    {"column": "l_discount", "max": 0.05, "flag": "bad_disc"},
      |    {"column": "l_tax", "max": 0.05, "flag": "bad_tax"}
      |  ],
      |  "retry": {"max_attempts": 3, "backoff_ms": 1000, "backoff_factor": 2.0}
      |}""".stripMargin

  lazy val default: Rules = parse(defaultJson)

  def parse(json: String): Rules = {
    import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
    val n = new ObjectMapper().readTree(json)
    // Config errors must name the offending field, not surface as a bare
    // NPE three frames deep; and JSON null must mean ABSENT for optional
    // fields ("min": null is a user spelling "no lower bound" — NullNode
    // .asDouble() would silently read it as 0.0 and flag every negative).
    def req(node: JsonNode, field: String, ctx: String): JsonNode = {
      val f = node.get(field)
      if (f == null || f.isNull)
        throw new IllegalArgumentException(
          s"rules config: required field '$field' missing or null in $ctx")
      f
    }
    def optDouble(node: JsonNode, field: String): Option[Double] = {
      val f = node.get(field)
      if (f == null || f.isNull) None else Some(f.asDouble())
    }
    // A present-but-wrong-SHAPE section must fail naming the field, not
    // degrade: a scalar where an array belongs has size()==0, so e.g.
    // "illness_rules": "rules.json" would otherwise parse as ZERO rules
    // and silently classify an entire deployment as the default label
    // (and an object shape would NPE bare from req(null, ...)).
    def reqArray(field: String): Unit =
      if (n.has(field) && !n.get(field).isNull && !n.get(field).isArray)
        throw new IllegalArgumentException(
          s"rules config: field '$field' must be a JSON array, got " +
            n.get(field).getNodeType.toString.toLowerCase)
    Seq("illness_rules", "manufacturers", "validation").foreach(reqArray)
    if (n.has("overrides") && !n.get("overrides").isNull && !n.get("overrides").isObject)
      throw new IllegalArgumentException(
        "rules config: field 'overrides' must be a JSON object, got " +
          n.get("overrides").getNodeType.toString.toLowerCase)
    val rules =
      if (!n.has("illness_rules")) Nil
      else (0 until n.get("illness_rules").size()).map { i =>
        val r = n.get("illness_rules").get(i)
        RegexRule(req(r, "priority", s"illness_rules[$i]").asInt(),
          req(r, "pattern", s"illness_rules[$i]").asText(),
          req(r, "label", s"illness_rules[$i]").asText())
      }
    val overrides: Map[String, String] =
      if (!n.has("overrides")) Map.empty
      else {
        val o = n.get("overrides")
        val it = o.fieldNames()
        val b = Map.newBuilder[String, String]
        while (it.hasNext) {
          val k = it.next()
          b += k -> req(o, k, s"overrides['$k']").asText()
        }
        b.result()
      }
    val defaultLabel = if (n.has("default_label")) n.get("default_label").asText() else "UNKNOWN"
    val manufacturers =
      if (!n.has("manufacturers")) Nil
      else (0 until n.get("manufacturers").size()).map { i =>
        val m = n.get("manufacturers").get(i)
        req(m, "match", s"manufacturers[$i]").asText() ->
          req(m, "name", s"manufacturers[$i]").asText()
      }
    val validation: Seq[RangeRule] =
      if (!n.has("validation")) Nil
      else (0 until n.get("validation").size()).map { i =>
        val v = n.get("validation").get(i)
        RangeRule(req(v, "column", s"validation[$i]").asText(),
          optDouble(v, "min"), optDouble(v, "max"),
          req(v, "flag", s"validation[$i]").asText())
      }
    val retry =
      if (!n.has("retry")) RetryPolicy.default
      else {
        val r = n.get("retry")
        RetryPolicy(
          maxAttempts = if (r.has("max_attempts")) r.get("max_attempts").asInt() else 3,
          backoffMs = if (r.has("backoff_ms")) r.get("backoff_ms").asLong() else 1000L,
          backoffFactor = if (r.has("backoff_factor")) r.get("backoff_factor").asDouble() else 2.0)
      }
    Rules(rules, overrides, defaultLabel, manufacturers, validation, retry)
  }

  /** Load a rule config from a file path (any local/posix path; HDFS-form
    * deployments would route through the Hadoop FileSystem the way the
    * lake manifests do).
    */
  def load(path: String): Rules =
    parse(new String(Files.readAllBytes(Paths.get(path)), StandardCharsets.UTF_8))
}
