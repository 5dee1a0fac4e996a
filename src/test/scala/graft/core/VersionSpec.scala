package graft.core

import org.scalatest.funsuite.AnyFunSuite

import graft.ingest.Influx

/** Version-compare truth table (reference `tests/test_versions.py:9-22`)
  * and fill-value parsing (C-5, `server.py:296-301`).
  */
class VersionSpec extends AnyFunSuite {
  test("version compare truth table") {
    assert(Version.compare("0.9.3", "0.9.3") == 0)
    assert(Version.compare("0.10.0", "0.9.3") > 0)
    assert(Version.compare("0.9", "0.9.0") == 0)
    assert(Version.compare("1.0.0", "0.99.99") > 0)
    assert(Version.compare("0.9.3+local", "0.9.3") == 0)
    assert(Version.compare("0.9.3-rc1", "0.9.3") == 0)
    assert(Version.atLeast("0.9.4", "0.9.3"))
    assert(!Version.atLeast("0.9.2", "0.9.3"))
  }

  test("fill value parse: numeric, nan, junk → 0") {
    assert(Influx.parseFillValue("3.5") == 3.5)
    assert(Influx.parseFillValue("-1") == -1.0)
    assert(Influx.parseFillValue("NaN").isNaN)
    assert(Influx.parseFillValue("nan").isNaN)
    assert(Influx.parseFillValue("bogus") == 0.0)
  }
}
