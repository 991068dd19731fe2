package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.cdc.{Retry, RetryPolicy}
import graft.enrich.{RulesConfig, Validation}

/** The config surface the reference exposes but the engine hardcoded until
  * now: validation range bounds (Config/config.yaml:82) and per-step
  * retry/backoff with no-retry on deterministic failures
  * (Config/config.yaml:149-152; Docs/etl_requirements_reviewed_by_sr.md:244).
  * Both are data in the rules JSON — edits change behavior with no
  * recompile.
  */
class ConfigSurfaceSpec extends AnyFunSuite {

  lazy val spark: SparkSession = Sessions.local(8, appName = "config-spec")

  test("validation + retry sections parse from config JSON") {
    val r = RulesConfig.parse(
      """{
        |  "validation": [
        |    {"column": "v", "min": 0.0, "max": 1000000.0, "flag": "bad_v"},
        |    {"column": "w", "max": 10.0, "flag": "bad_w"}
        |  ],
        |  "retry": {"max_attempts": 5, "backoff_ms": 250, "backoff_factor": 3.0}
        |}""".stripMargin)
    assert(r.validation == Seq(
      Validation.RangeRule("v", Some(0.0), Some(1000000.0), "bad_v"),
      Validation.RangeRule("w", None, Some(10.0), "bad_w")))
    assert(r.retry == RetryPolicy(5, 250L, 3.0))
    // absent sections fall back to defaults (shipped config has both)
    assert(RulesConfig.parse("{}").retry == RetryPolicy.default)
    assert(RulesConfig.default.validation.map(_.flag) == Seq("bad_disc", "bad_tax"))
  }

  test("editing a validation threshold changes the flags with no recompile") {
    import spark.implicits._
    val df = Seq(("a", 0.04), ("b", 0.06), ("c", 0.08)).toDF("k", "l_discount")
    def flagged(json: String): Seq[String] = {
      val rules = RulesConfig.parse(json).validation
      df.filter(Validation.anyViolation(rules)).select("k")
        .as[String].collect().toSeq.sorted
    }
    val loose = """{"validation": [{"column": "l_discount", "max": 0.05, "flag": "bad"}]}"""
    val tight = """{"validation": [{"column": "l_discount", "max": 0.07, "flag": "bad"}]}"""
    assert(flagged(loose) == Seq("b", "c"))
    assert(flagged(tight) == Seq("c")) // same code, different config, different flags
    // and bounds compose: a min catches the low side
    val banded =
      """{"validation": [{"column": "l_discount", "min": 0.05, "max": 0.07, "flag": "bad"}]}"""
    assert(flagged(banded) == Seq("a", "c"))
  }

  test("validation flags load from a config FILE (the deployment path)") {
    import spark.implicits._
    val p = Files.createTempDirectory("graft-val-").resolve("rules.json")
    Files.writeString(p,
      """{"validation": [{"column": "x", "max": 2.0, "flag": "too_big"}]}""")
    val rules = RulesConfig.load(p.toString).validation
    val out = Seq(1.0, 3.0).toDF("x")
      .select(Validation.rangeFlags(rules).map { case (n, c) => c.as(n) }: _*)
      .as[Boolean].collect().toSeq
    assert(out == Seq(false, true))
  }

  test("retry: transient failures back off and succeed; budget exhaustion rethrows") {
    var calls = 0
    val got = Retry.run(RetryPolicy(maxAttempts = 3, backoffMs = 1L), "t") {
      calls += 1
      if (calls < 3) throw new java.io.IOException(s"transient $calls")
      "ok"
    }
    assert(got == "ok" && calls == 3)

    var exhausted = 0
    val e = intercept[java.io.IOException] {
      Retry.run(RetryPolicy(maxAttempts = 2, backoffMs = 1L), "t") {
        exhausted += 1; throw new java.io.IOException("always")
      }
    }
    assert(e.getMessage == "always" && exhausted == 2)
  }

  test("retry: deterministic failures surface immediately, never retried") {
    var calls = 0
    intercept[IllegalArgumentException] {
      Retry.run(RetryPolicy(maxAttempts = 5, backoffMs = 1L), "t") {
        calls += 1; throw new IllegalArgumentException("bad input")
      }
    }
    assert(calls == 1, s"deterministic failure was retried ($calls attempts)")
  }
}
