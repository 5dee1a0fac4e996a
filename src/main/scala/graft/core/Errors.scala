package graft.core

/** Exception hierarchy mirroring the reference
  * (`/root/reference/src/ong_tsdb/exceptions.py`): one root type so
  * callers can catch engine errors as a family, with the same
  * distinctions the reference draws (missing db/sensor, bad writes,
  * auth).
  */
class GraftException(msg: String) extends RuntimeException(msg)

class DbNotFoundException(db: String)
  extends GraftException(s"Database '$db' does not exist")

class SensorNotFoundException(db: String, sensor: String)
  extends GraftException(s"Sensor '$db/$sensor' does not exist")

/** Reference `InvalidDataWriteException` (col-count guard,
  * `database.py:444-445`): a batch whose shape cannot map onto the
  * sensor's schema.
  */
class InvalidDataWriteException(msg: String) extends GraftException(msg)

/** Reference `NotAuthorizedException`: token mismatch for a keyed
  * sensor.
  */
class NotAuthorizedException(what: String)
  extends GraftException(s"Not authorized: $what")

/** Reference `InfluxParseException` (`server_utils.py`): malformed
  * protocol line.
  */
class InfluxParseException(line: String)
  extends GraftException(s"Cannot parse influx line: '$line'")

/** Writer-lock acquisition timed out — another job holds the sensor's
  * write lock (the cross-process analog of the reference's per-sensor
  * process lock, `database.py:154-168`).
  */
class WriteLockTimeoutException(label: String, timeoutMs: Long)
  extends GraftException(
    s"Writer lock on $label not acquired within ${timeoutMs}ms") {
  def this(db: String, sensor: String, timeoutMs: Long) =
    this(s"$db/$sensor", timeoutMs)
}
