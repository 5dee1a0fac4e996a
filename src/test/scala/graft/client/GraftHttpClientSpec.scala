package graft.client

import java.nio.file.Files

import graft.SparkSpec
import graft.server.GraftServer

/** The reference workflow over REAL HTTP — `tests/test_client.py`'s
  * create → write → read shape driven through GraftHttpClient against
  * GraftServer, with frame equality against the in-process client
  * (`test_client.py:84-120`'s exact-equality discipline) and the
  * token-upgrade rule of `test_remote_server.py:28-47`.
  */
class GraftHttpClientSpec extends SparkSpec {

  private val Admin = "adm"

  private lazy val (server, base, dir) = {
    val d = Files.createTempDirectory("graft-httpclient").toString
    val s = new GraftServer(spark, d, Admin)
    s.start()
    (s, s"http://127.0.0.1:${s.boundPort}", d)
  }

  test("end-to-end reference workflow: create db + sensor, write " +
    "influx lines, read back — equal to the in-process client frame") {
    val admin = new GraftHttpClient(spark, base, Admin)
    assert(!admin.existDb("plant"))
    assert(admin.createDb("plant"))
    assert(admin.existDb("plant"))
    assert(admin.createSensor("plant", "m1", "1s",
      Seq("active", "reactive"), readKey = "r", writeKey = "w",
      metadata = Map("site" -> "x")))
    assert(admin.existSensor("plant", "m1"))

    val writer = admin.updateToken("w")
    val t0 = 1704067200L
    assert(writer.write(Seq(
      s"plant,circuit=m1 active=9,reactive=10 ${t0}000000000",
      s"plant,circuit=m1 active=11 ${t0 + 5}000000000")))

    val reader = admin.updateToken("r")
    assert(reader.lastTimestamp("plant", "m1").contains((t0 + 5).toDouble))
    assert(reader.metrics("plant", "m1") == Seq("active", "reactive"))
    assert(reader.metadata("plant", "m1") == Map("site" -> "x"))

    val viaHttp = reader.read("plant", "m1", t0, Some(t0 + 10)).get
      .collect().map(_.toString)
    val viaLib = new GraftClient(spark, dir, "r")
      .read("plant", "m1", Some(t0), Some(t0 + 10))
      .collect().map(_.toString)
    assert(viaHttp.sameElements(viaLib),
      s"HTTP read diverged from the library read:\n" +
        s"${viaHttp.mkString("\n")}\nvs\n${viaLib.mkString("\n")}")

    assert(reader.read("plant", "m1", t0 + 100000).isEmpty,
      "no-data window must map the 404 to None")
  }

  test("createSensor JSON body survives hostile metadata values — " +
    "backslashes, newlines, tabs, quotes, non-ASCII round-trip " +
    "(ADVICE r12: q() escaped only double quotes)") {
    val admin = new GraftHttpClient(spark, base, Admin)
    if (!admin.existDb("plant")) assert(admin.createDb("plant"))
    val hostile = Map(
      "path" -> """C:\temp\new""",
      "note" -> "line1\nline2\ttabbed \"quoted\"",
      "site" -> "μ-grid ☂")
    assert(admin.createSensor("plant", "esc1", "1s", Seq("a"),
      readKey = "r", writeKey = "w", metadata = hostile))
    assert(admin.updateToken("r").metadata("plant", "esc1") == hostile)
  }

  test("token rules over the wire: read token cannot create " +
    "(test_remote_server.py:28); upgrading to admin can, then cleanup") {
    val reader = new GraftHttpClient(spark, base, "r")
    intercept[graft.core.NotAuthorizedException] {
      reader.createDb("fake_db_for_tests")
    }
    val admin = reader.updateToken(Admin)
    assert(admin.createDb("fake_db_for_tests"))
    assert(admin.deleteDb("fake_db_for_tests"))
    assert(!admin.existDb("fake_db_for_tests"))
  }
}
