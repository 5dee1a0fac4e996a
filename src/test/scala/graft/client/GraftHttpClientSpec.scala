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

  test("four-frequency write→read matrix over live HTTP: 1s/15m/1h/1d " +
    "sensors (incl. mid-stream schema evolution) each equal the " +
    "in-process client frame; a MultiIndex sensor rides the same wire " +
    "(test_client.py:32,84-120,172-190 — r12 ask #6)") {
    val admin = new GraftHttpClient(spark, base, Admin)
    if (!admin.existDb("freqdb")) assert(admin.createDb("freqdb"))
    val lib = new GraftClient(spark, dir, "r")
    // the reference's 6-line rotating write sequence, incl. the new
    // metric 'nueva' appearing mid-stream (test_client.py:66-72)
    val seq6 = Seq(
      "active=9,reactive=10", "active=11", "reactive=12",
      "reactive=13,active=14", "reactive=15,active=16,nueva=17",
      "reactive=18,nueva=19")
    for (freq <- Seq("1s", "15m", "1h", "1d")) {
      val name = s"m_$freq"
      assert(admin.createSensor("freqdb", name, freq,
        Seq("active", "reactive"), readKey = "r", writeKey = "w"))
      val fs = graft.core.Freq.seconds(freq)
      val t0 = 1704067200L - 1704067200L % fs
      val lines = (0 until 10).map(i =>
        s"freqdb,circuit=$name ${seq6(i % 6)} ${t0 + i * fs}000000000")
      assert(admin.updateToken("w").write(lines))
      val reader = admin.updateToken("r")
      assert(reader.lastTimestamp("freqdb", name)
        .contains((t0 + 9 * fs).toDouble), s"$freq: wrong last ts")
      assert(reader.metrics("freqdb", name) ==
        Seq("active", "reactive", "nueva"), s"$freq: evolution lost")
      val viaHttp = reader.read("freqdb", name, t0, Some(t0 + 10 * fs))
        .get.collect().map(_.toString)
      val viaLib = lib.read("freqdb", name, Some(t0), Some(t0 + 10 * fs))
        .collect().map(_.toString)
      assert(viaHttp.length == 10 && viaHttp.sameElements(viaLib),
        s"$freq: HTTP read diverged from the library read:\n" +
          s"${viaHttp.mkString("\n")}\nvs\n${viaLib.mkString("\n")}")
    }
    // MultiIndex sensor: level tuples + level_names through the wire
    assert(admin.createSensorMulti("freqdb", "mi", "1d",
      Seq(Seq("A", "B"), Seq("C", "D")), readKey = "r", writeKey = "w",
      levelNames = Seq("one", "two")))
    assert(lib.levelNames("freqdb", "mi") == Seq("one", "two"),
      "level_names did not survive the create wire")
    val tm = 1704067200L - 1704067200L % 86400L
    assert(admin.updateToken("w").write(
      Seq(s"freqdb,circuit=mi A.B=1,C.D=2 ${tm}000000000")))
    val miHttp = admin.updateToken("r").read("freqdb", "mi", tm, Some(tm))
      .get.collect().map(_.toString)
    val miLib = lib.read("freqdb", "mi", Some(tm), Some(tm))
      .collect().map(_.toString)
    assert(miHttp.length == 1 && miHttp.sameElements(miLib),
      s"MultiIndex HTTP read diverged: ${miHttp.toSeq} vs ${miLib.toSeq}")
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
