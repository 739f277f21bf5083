package graft.ext

import org.apache.spark.sql.Row
import graft.SparkSpec

class ProfileSpec extends SparkSpec {

  private def d = df("a BIGINT, b STRING, c DOUBLE", Seq(
    Row(1L, "x", 1.5), Row(2L, "x", null), Row(3L, null, 2.5), Row(3L, "y", 2.5)))

  test("profile: exact row/non-null/distinct counts per column") {
    val out = Profile.profile(d, Seq("a", "b", "c")).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(out("a") == ((4L, 4L, 3L)))
    assert(out("b") == ((4L, 3L, 2L)))
    assert(out("c") == ((4L, 3L, 2L)))
  }

  test("profile: unknown column and empty list are rejected") {
    intercept[IllegalArgumentException] { Profile.profile(d, Seq("nope")) }
    intercept[IllegalArgumentException] { Profile.profile(d, Seq.empty) }
  }
}
