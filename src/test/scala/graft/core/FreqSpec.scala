package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** Mirrors the reference's frequency grammar (`chunker.py:32-59`). */
class FreqSpec extends AnyFunSuite {
  test("standard units") {
    assert(Freq.seconds("1s") == 1L)
    assert(Freq.seconds("5m") == 300L)
    assert(Freq.seconds("15m") == 900L)
    assert(Freq.seconds("1h") == 3600L)
    assert(Freq.seconds("1D") == 86400L)
    assert(Freq.seconds("1d") == 86400L)
  }

  test("deprecated aliases (T/c/b/min)") {
    assert(Freq.seconds("15T") == 900L)
    assert(Freq.seconds("1c") == 86400L)
    assert(Freq.seconds("1b") == 86400L)
    assert(Freq.seconds("30min") == 1800L)
  }

  test("implicit count of 1") {
    assert(Freq.seconds("s") == 1L)
    assert(Freq.seconds("h") == 3600L)
  }

  test("invalid input raises") {
    intercept[IllegalArgumentException](Freq.seconds("1x"))
    intercept[IllegalArgumentException](Freq.seconds(""))
    intercept[IllegalArgumentException](Freq.seconds("xy5"))
  }

  test("chunk duration = tick * 2^14") {
    assert(Freq.chunkSeconds("1s") == 16384L)
    assert(Freq.chunkSeconds("1h") == 3600L * 16384L)
  }
}
