package graft

import org.scalatest.funsuite.AnyFunSuite

/** The extensions hook must make the native functions visible in every
  * session derived from the context — no ensureRegistered call — which
  * is what Thrift-served JDBC sessions rely on.
  */
class GraftExtensionsSpec extends AnyFunSuite {
  lazy val spark = GraftSession.local(4)

  test("a fresh derived session resolves the native functions via SQL") {
    val s2 = spark.newSession() // fresh sessionState: temp functions gone
    val row = s2.sql(
      s"""SELECT
         |  ${graft.functions.GraftFunctions.Md5PrefixName}('abc', 8) AS h,
         |  ${graft.functions.GraftFunctions.DotName}(
         |    array(CAST(1.0 AS FLOAT)), array(CAST(2.0 AS FLOAT))) AS d,
         |  size(${graft.functions.GraftFunctions.WinnowName}('abcdefghij', 5, 4)) AS w
         |""".stripMargin).first()
    // md5('abc') = 900150983cd24fb0... → first 8 hex digits as a long
    assert(row.getLong(0) == java.lang.Long.parseLong("90015098", 16))
    assert(row.getLong(1) == 2000000000000L) // 1*2 quantized at 1e12
    assert(row.getInt(2) > 0)
  }
}
