package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Φ (standard normal CDF) — the one scalar the reference's meta-analysis
  * needs that Spark lacks a builtin for (reference: z/p columns of the
  * pooled view, Docs/etl_requirements_reviewed_by_sr.md:616).
  *
  * Composed from builtin expressions (exp/abs/when) via the
  * Abramowitz–Stegun 7.1.26 erf polynomial (|error| < 1.5e-7 — far below
  * the 1e-6 rounding the catalog applies), so the whole thing stays inside
  * WholeStageCodegen. A custom Catalyst `Expression` with `doGenCode` is
  * NOT warranted here: builtins express the semantics exactly, and the
  * identical formula is emitted as the DuckDB oracle SQL, making the
  * operator hash-checkable across engines.
  */
object StatFunctions {

  private val P = 0.3275911
  private val A1 = 0.254829592
  private val A2 = -0.284496736
  private val A3 = 1.421413741
  private val A4 = -1.453152027
  private val A5 = 1.061405429

  /** erf via A-S 7.1.26 (x ≥ 0); odd-extended for negative x. */
  def erf(x: Column): Column = {
    val ax = abs(x)
    val t = lit(1.0) / (lit(1.0) + lit(P) * ax)
    val poly = t * (lit(A1) + t * (lit(A2) + t * (lit(A3) + t * (lit(A4) + t * lit(A5)))))
    val pos = lit(1.0) - poly * exp(-ax * ax)
    when(x >= 0, pos).otherwise(-pos)
  }

  /** Φ(z) = 0.5 (1 + erf(z/√2)). */
  def phi(z: Column): Column = lit(0.5) * (lit(1.0) + erf(z / lit(math.sqrt(2.0))))

  /** Two-sided p-value of a z-score: 2 (1 − Φ(|z|)). */
  def pValue(z: Column): Column = lit(2.0) * (lit(1.0) - phi(abs(z)))

  /** The same A-S erf as DuckDB SQL over expression `x` (emitted into
    * oracle queries so both engines run the identical formula).
    */
  def erfSql(x: String): String = {
    val t = s"(1.0 / (1.0 + $P * abs($x)))"
    val poly = s"($t * ($A1 + $t * ($A2 + $t * ($A3 + $t * ($A4 + $t * $A5)))))"
    s"(CASE WHEN $x >= 0 THEN 1 ELSE -1 END * (1.0 - $poly * exp(-abs($x)*abs($x))))"
  }

  def phiSql(z: String): String = s"(0.5 * (1.0 + ${erfSql(s"($z / sqrt(2.0))")}))"

  def pValueSql(z: String): String = s"(2.0 * (1.0 - ${phiSql(s"abs($z)")}))"
}
