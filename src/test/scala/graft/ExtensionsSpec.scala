package graft

/** The SQL-surface registration path: graft_dot must be callable from
  * spark.sql when GraftExtensions is configured (it is a STATIC conf,
  * bound when the SparkContext is created — set on the shared test
  * session in SparkSpec; Verify/Bench reach the same expression through
  * the Column API, which needs no registration). */
class ExtensionsSpec extends SparkSpec {

  test("graft_dot is callable from SQL via GraftExtensions") {
    val r = spark.sql(
      """SELECT graft_dot(
        |  CAST(array(1.0, 2.0, 3.0) AS ARRAY<FLOAT>),
        |  CAST(array(4.0, 5.0, 6.0) AS ARRAY<FLOAT>)) AS d""".stripMargin)
      .collect().head.getDouble(0)
    assert(r == 32.0)
  }
}
