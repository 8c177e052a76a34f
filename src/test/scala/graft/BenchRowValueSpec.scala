package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench gate's per-row value: a 2-sample row must not let the
  * JIT-cold pass-1 sample poison the reported number (the r17 driver
  * artifact's 1.5-2.5× inflation class). Samples are stored
  * most-recent-first, so the LAST element is pass 1.
  */
class BenchRowValueSpec extends AnyFunSuite {

  test("2 samples with a >2x cold pass-1 report the warm sample alone") {
    // pass 1 = 67.4 (cold), pass 2 = 5.4 (warm): the r17 rouge shape
    assert(Bench.rowValue(List(5.4, 67.4)) == 5.4)
  }

  test("2 samples inside the 2x band keep the plain median (mean)") {
    assert(Bench.rowValue(List(5.0, 7.0)) == 6.0)
    // a SLOW second sample (stall on pass 2) is not pass-1 inflation
    assert(Bench.rowValue(List(30.0, 5.0)) == 17.5)
  }

  test("3+ samples keep the plain median — cold pass 1 discarded by it") {
    assert(Bench.rowValue(List(5.2, 5.0, 67.4)) == 5.2)
    assert(Bench.rowValue(List(4.0, 5.0, 6.0, 70.0)) == 5.5)
  }

  test("empty and single-sample rows are unchanged") {
    assert(Bench.rowValue(Nil) == -1.0)
    assert(Bench.rowValue(List(3.25)) == 3.25)
  }
}
