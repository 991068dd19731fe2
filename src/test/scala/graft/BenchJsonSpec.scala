package graft

import org.scalatest.funsuite.AnyFunSuite

/** The driver captures only the final ~2000 chars of bench stdout and
  * parses the last complete JSON line in that window (round 3 shipped a
  * ~2.4k-char line and the driver recorded `parsed: null`). These tests
  * pin the contract of [[Bench.fitJson]]: the last emitted line always
  * fits the window, always parses, and keeps the headline + the heavy
  * per-query tail.
  */
class BenchJsonSpec extends AnyFunSuite {

  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()

  /** A realistic oversized bench line: 62 catalog queries + the full
    * diagnostic cdc block with per-epoch arrays.
    */
  private def bigLine(): String = {
    val qs = (1 to 62).map { i =>
      val name = f"q${i}%02d_some_operator_name_$i"
      val v = if (i <= 5) 10.0 + i else 0.1 * i
      f""""$name":$v%.3f"""
    }.mkString("{", ",", "}")
    val epochArr = (1 to 8).map(i => f"${i * 3.17}%.2f").mkString("[", ",", "]")
    s"""{"metric":"total","value":69.712,"unit":"sec","queries":$qs,"sf":"/root/testdata/sf0.1",""" +
      s""""cdc":{"events":48960000,"batches":4,"epoch_secs_n":$epochArr,""" +
      s""""epoch_sec_mean_n":12.68,"epoch_sec_stddev_n":0.42,"epoch_secs_4n":$epochArr,""" +
      s""""epoch_sec_mean_4n":3.31,"epoch_sec_stddev_4n":0.12,"epoch_gc_secs_n":$epochArr,""" +
      s""""epoch_gc_secs_4n":$epochArr,"scaling_efficiency_epoch_min":0.901,""" +
      s""""sec_n_median":50.7,"sec_4n_median":14.4,"scaling_efficiency_epoch_median":0.884,""" +
      s""""epoch_stall_factor":2.5,"stalled_rounds_n":0,"stalled_rounds_4n":0,"sync_rounds":1,""" +
      s""""epochs_run_n":8,"epochs_run_4n":8,"pair_ratio_epochs":$epochArr,""" +
      s""""sync_pair_sec_n":50.66,"sync_pair_sec_4n":14.35,"scaling_efficiency_sync_pair":0.882,""" +
      s""""cores_n":2,"sec_n":50.66,"events_per_sec_n":501234,""" +
      s""""cores_4n":8,"sec_4n":14.35,"events_per_sec_4n":1861042,""" +
      s""""sec_n_best":50.66,"sec_4n_best":14.35,"scaling_efficiency_best":0.882,""" +
      s""""sec_n_floor":50.10,"sec_4n_floor":14.35,"scaling_efficiency_floor":0.873,""" +
      s""""scaling_efficiency_pair":0.882,"pair_round":0,"speedup":3.53,""" +
      s""""scaling_efficiency":0.882,"headline_source":"sync_pair_median",""" +
      s""""headline_events":48960000,"cores_peak":32,"events_per_sec_peak":4160000,""" +
      s""""rounds_run":1,"clean_rounds_n":1,"membw_gbs_n":11.9,"membw_gbs_4n":11.3,""" +
      s""""clean_rounds_4n":1,"steal_clean_core_sec":15,"final_rows":179855}}"""
  }

  test("fitJson returns short lines unchanged (reference-equal)") {
    val j = """{"metric":"total","value":1.0,"unit":"sec","queries":{"q1":0.5}}"""
    assert(Bench.fitJson(j) eq j)
  }

  test("fitJson compacts an oversized line under the budget and it still parses") {
    val big = bigLine()
    assert(big.length > Bench.fitBudget, "fixture must exceed the budget to exercise the cut")
    val fit = Bench.fitJson(big)
    assert(fit.length <= Bench.fitBudget)
    val n = mapper.readTree(fit) // throws on malformed output
    assert(n.get("metric").asText() == "total")
    assert(math.abs(n.get("value").asDouble() - 69.712) < 1e-9)
    assert(n.get("sf").asText() == "/root/testdata/sf0.1")
    val c = n.get("cdc")
    assert(c.get("scaling_efficiency").asDouble() == 0.882)
    assert(c.get("events_per_sec_n").asLong() == 501234L)
    assert(c.get("events_per_sec_4n").asLong() == 1861042L)
    assert(c.get("cores_n").asInt() == 2 && c.get("cores_4n").asInt() == 8)
    assert(c.get("events_per_sec_peak").asLong() == 4160000L)
    // the per-epoch diagnostic arrays are exactly what gets shed
    assert(!c.has("epoch_secs_n") && !c.has("epoch_gc_secs_4n"))
  }

  test("fitJson keeps the heaviest queries and counts omissions") {
    val fit = Bench.fitJson(bigLine())
    val n = mapper.readTree(fit)
    val q = n.get("queries")
    // the 5 slowest (11-15 s) fixtures must survive any cut
    (1 to 5).foreach { i =>
      val name = f"q${i}%02d_some_operator_name_$i"
      assert(q.has(name), s"heavy query $name must survive compaction")
    }
    if (n.has("queries_omitted")) {
      import scala.jdk.CollectionConverters._
      val kept = q.properties().asScala.size
      assert(kept + n.get("queries_omitted").asInt() == 62)
    }
  }

  test("fitJson on a line with no queries/cdc still emits a parseable floor") {
    val junk = "{" + "\"x\":1," * 2000 + "\"y\":2}"
    val fit = Bench.fitJson(junk)
    assert(fit.length <= Bench.fitBudget)
    mapper.readTree(fit)
  }
}
