package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.gen.ChangeGen
import graft.gen.ChangeGen.GenConfig

/** Asserts the generator actually produces the stream shape FIXTURES.md
  * claims — in particular that the bounded out-of-order perturbation
  * creates real LSN inversions in emission order (a perturbation narrower
  * than the emission stride would keep the stream sorted and make every
  * "out-of-order replay" test vacuous).
  */
class ChangeGenSpec extends AnyFunSuite {

  lazy val spark = Sessions.local(8, appName = "changegen-spec")

  test("emitted stream contains LSN inversions, bounded by the window") {
    val cfg = GenConfig(numConvs = 50, maxTurns = 20, numEvents = 5000)
    val lsns = ChangeGen.emittedEvents(spark, cfg).collect().map(_.lsn)
    val adjacentInversions = lsns.sliding(2).count { case Array(a, b) => a > b }
    // real out-of-order arrival: a nontrivial fraction of adjacent pairs invert
    assert(adjacentInversions > lsns.length / 100,
      s"only $adjacentInversions adjacent inversions in ${lsns.length} events")
    // boundedness: no event is displaced further than the window allows.
    // emit key = lsn + offset (offset < oooWindow), so if event with lsn L
    // appears after one with lsn M then L > M - oooWindow.
    var runningMax = 0L // lsns start at 1
    lsns.foreach { l =>
      assert(l > runningMax - cfg.oooWindow,
        s"lsn $l displaced beyond the $runningMax-${cfg.oooWindow} bound")
      if (l > runningMax) runningMax = l
    }
  }

  test("duplicate re-emissions exist and replicate an earlier event exactly") {
    val cfg = GenConfig(numConvs = 20, maxTurns = 10, numEvents = 2000)
    val dups = (cfg.numEvents until cfg.totalRows).map(i => ChangeGen.rowAt(cfg, i))
    assert(dups.nonEmpty)
    val byLsn = (0L until cfg.numEvents).map(i => ChangeGen.eventAt(cfg, i))
      .map(e => e.lsn -> e).toMap
    dups.foreach(d => assert(byLsn(d.lsn) == d))
  }
}
