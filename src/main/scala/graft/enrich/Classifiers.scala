package graft.enrich

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Config-driven classification / enrichment expressions (reference:
  * IllnessInferenceEngine + platform normalization,
  * Scripts/python/enhanced_main_etl.py:442-515; rules are config data,
  * Config/config.yaml:26-93).
  *
  * The rules are DATA and the plan is BUILT at runtime: each rule set is
  * folded into a when/rlike chain — pure Catalyst expressions, fully
  * codegen'd, no UDFs. Override maps are small and become literal maps /
  * chained equality checks (broadcast semantics without a join).
  */
object Classifiers {

  /** One classification rule: regex pattern (case-insensitive) → label,
    * ordered by ascending priority (reference:
    * Scripts/python/enhanced_main_etl.py:190-216).
    */
  final case class RegexRule(priority: Int, pattern: String, label: String)

  /** The reference's illness rule set (Config/config.yaml:26-53 semantics).
    * Sourced through [[RulesConfig]] — rules are CONFIG DATA parsed from
    * JSON, not code, so a deployment edits the rule file and the identical
    * when/rlike chain is rebuilt at plan time (config-as-data; see
    * [[RulesConfig.load]] for user-provided files).
    */
  lazy val illnessRules: Seq[RegexRule] = RulesConfig.default.illnessRules

  /** Priority-ordered classifier with override-beats-rule precedence:
    * returns (label, method) where method ∈ {override, rule, default}
    * (reference: infer_illness returns the same tuple,
    * Scripts/python/enhanced_main_etl.py:442-470; override precedence
    * Docs/etl_requirements_reviewed_by_sr.md:133).
    */
  def classify(
      keyCol: Column,
      textCol: Column,
      rules: Seq[RegexRule],
      overrides: Map[String, String],
      default: String = "UNKNOWN"): (Column, Column) = {
    val overrideLabel = overrides.foldLeft(lit(null).cast("string")) {
      case (acc, (k, v)) => when(keyCol === k, lit(v)).otherwise(acc)
    }
    // Case-insensitivity via the (?iu) embedded flags, NEVER by lowercasing
    // the pattern: lower() on a regex corrupts uppercase metacharacters —
    // \S (non-space) silently inverts to \s, \B to \b, and \p{Upper}
    // becomes the invalid \p{upper}, a runtime PatternSyntaxException.
    // The u flag matters: Java CASE_INSENSITIVE alone folds ASCII only,
    // so a rule with non-ASCII letters ("sévère") would silently stop
    // matching its uppercase form ("SÉVÈRE") — UNICODE_CASE restores the
    // Unicode folding the old lower()-both-sides approach had.
    val ruleLabel = rules.sortBy(_.priority).foldRight(lit(null).cast("string")) {
      case (r, acc) => when(textCol.rlike("(?iu)" + r.pattern), lit(r.label)).otherwise(acc)
    }
    val label = coalesce(overrideLabel, ruleLabel, lit(default))
    val method = when(overrideLabel.isNotNull, lit("override"))
      .when(ruleLabel.isNotNull, lit("rule"))
      .otherwise(lit("default"))
    (label, method)
  }

  /** Platform split "Name (Accession)" → (accession, name); a bare token
    * duplicates into both fields (reference:
    * Scripts/python/enhanced_main_etl.py:484-498).
    */
  def platformParts(platformCol: Column): (Column, Column) = {
    val name = trim(regexp_extract(platformCol, "^(.*)\\(([^)]+)\\)\\s*$", 1))
    val acc = regexp_extract(platformCol, "^(.*)\\(([^)]+)\\)\\s*$", 2)
    (coalesce(nullif(acc, lit("")), trim(platformCol)).as("platform_accession"),
      coalesce(nullif(name, lit("")), trim(platformCol)).as("platform_name"))
  }

  /** Case-insensitive substring manufacturer lookup (reference:
    * Scripts/python/enhanced_main_etl.py:476-482; lookup table
    * Config/config.yaml:54-61). Config-as-data via [[RulesConfig]].
    */
  lazy val manufacturerLookup: Seq[(String, String)] = RulesConfig.default.manufacturers

  def manufacturer(platformCol: Column): Column =
    manufacturer(platformCol, manufacturerLookup)

  def manufacturer(platformCol: Column, lookup: Seq[(String, String)]): Column =
    lookup.foldRight(lit("Unknown")) { case ((k, v), acc) =>
      // lowercase BOTH sides — a mixed-case config key could otherwise
      // never match the lowered column and silently yield 'Unknown'
      when(lower(platformCol).contains(k.toLowerCase), lit(v)).otherwise(acc)
    }

  /** [[classify]] driven entirely by a parsed rule config — the
    * config-as-data entry point (reference: config.yaml rules applied by
    * enhanced_main_etl.py:220-295).
    */
  def classifyWith(keyCol: Column, textCol: Column, rules: RulesConfig.Rules): (Column, Column) =
    classify(keyCol, textCol, rules.illnessRules, rules.overrides, rules.defaultLabel)

  /** Measurement-technology inference over the normalized descriptor
    * (reference: _infer_measurement_technology,
    * Scripts/python/enhanced_main_etl.py:46-80).
    */
  def technology(studyTechCol: Column, platformCol: Column): Column = {
    val d = normalizeDescriptor(coalesce(nullif(trim(studyTechCol), lit("")), platformCol))
    when(d.rlike("rna ?seq|sequencing"), "RNA-SEQ")
      .when(d.rlike("array|microarray|genechip|beadchip"), "MICROARRAY")
      .otherwise("OTHER")
  }

  /** trim → collapse [-_]+ → collapse whitespace → lowercase (reference:
    * _normalise_descriptor, Scripts/python/enhanced_main_etl.py:37-44).
    */
  def normalizeDescriptor(c: Column): Column =
    lower(regexp_replace(regexp_replace(trim(c), "[-_]+", " "), "\\s+", " "))
}
