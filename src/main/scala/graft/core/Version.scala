package graft.core

/** Dotted-version comparison (reference C-4,
  * `/root/reference/src/ong_tsdb/check_versions.py:5-16`): strip any
  * `+local` / `-rc` suffix, split on '.', compare numeric components
  * left-to-right; missing components count as 0.
  */
object Version {

  def parse(v: String): Seq[Long] =
    v.split("[+-]")(0).split("\\.").toSeq
      .map(s => s.filter(_.isDigit))
      .map(s => if (s.isEmpty) 0L else s.toLong)

  /** negative if a < b, 0 if equal, positive if a > b. */
  def compare(a: String, b: String): Int = {
    val (pa, pb) = (parse(a), parse(b))
    val n = math.max(pa.length, pb.length)
    var i = 0
    while (i < n) {
      val x = pa.applyOrElse(i, (_: Int) => 0L)
      val y = pb.applyOrElse(i, (_: Int) => 0L)
      if (x != y) return java.lang.Long.compare(x, y)
      i += 1
    }
    0
  }

  def atLeast(client: String, server: String): Boolean =
    compare(client, server) >= 0
}
