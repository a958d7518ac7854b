package graft

/** The spark.sql.extensions surface: graft's native expressions as
  * plain SQL functions. `install` registers into an isolated
  * `newSession()` (per-session FunctionRegistry), proving the shared
  * suite session is untouched; the extensions class itself reuses the
  * identical triples, so the builder-time path is the same code.
  */
class ExtensionsSpec extends SparkSpec {

  test("graft SQL functions evaluate through spark.sql after install") {
    val s = spark.newSession()
    GraftExtensions.install(s)
    val r = s.sql(
      "SELECT graft_normalize('e" + "\u0301" + "', 'NFC') AS n, " +
        "graft_edit_distance('kitten', 'sitting', 5) AS d, " +
        "graft_edit_distance('kitten', 'sitting', 1) AS capped, " +
        "graft_edit_distance_le1('abc', 'abd') AS le1, " +
        "graft_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS dp" +
      "").head()
    assert(r.getString(0) == "\u00e9")   // e + combining acute composes
    assert(r.getInt(1) == 3)
    assert(r.getInt(2) == 2)                // cap + 1 when exceeded
    assert(r.getInt(3) == 1)
    assert(r.getDouble(4) == 11.0)
  }

  test("literal-argument validation is loud; shared session is untouched") {
    val s = spark.newSession()
    GraftExtensions.install(s)
    val e = intercept[Exception](
      s.sql("SELECT graft_normalize('x', lower('NFC'))").head())
    assert(e.getMessage.contains("literal") ||
      e.getCause != null && e.getCause.getMessage.contains("literal"))
    // the base suite session never had the functions registered
    intercept[Exception](
      spark.sql("SELECT graft_dot(array(1.0d), array(1.0d))").head())
  }
}
