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

  /** DerSimonian–Laird pooled-meta columns over sufficient statistics
    * (k, s1=Σw, s2=Σw², st=Σwθ, st2=Σwθ²): pooled effect, Cochran Q,
    * τ² (DL), I² — each rounded to 6 (reference: pooled-view math,
    * Docs/etl_requirements_reviewed_by_sr.md:608-621). ONE definition,
    * shared by the one-shot aggregate (a9) and the incremental-state
    * derive (t5): incremental-equals-one-shot is a spec'd invariant
    * (IncrementalStatsSpec), so the closed form must not exist twice —
    * a fix applied to one copy would silently break the other's parity.
    */
  def dlPooledCols: Seq[Column] = {
    val q = col("st2") - col("st") * col("st") / col("s1")
    Seq(
      round(col("st") / col("s1"), 6).as("pooled"),
      round(q, 6).as("q_stat"),
      round(greatest(lit(0.0),
        (q - (col("k") - 1)) / (col("s1") - col("s2") / col("s1"))), 6).as("tau2"),
      round(greatest(lit(0.0), (q - (col("k") - 1)) / q) * 100, 6).as("i2"))
  }

  /** The same DL select list as DuckDB SQL (k, s1, s2, st, st2 in scope). */
  val dlPooledSql: String =
    """round(st/s1, 6) AS pooled,
                   round(st2 - st*st/s1, 6) AS q_stat,
                   round(greatest(0.0, (st2 - st*st/s1 - (k-1)) / (s1 - s2/s1)), 6) AS tau2,
                   round(greatest(0.0, (st2 - st*st/s1 - (k-1)) / (st2 - st*st/s1)) * 100, 6) AS i2"""
}
