package graft

import org.apache.spark.sql.SparkSession

class GraftExtensionsSpec extends SparkTestBase {

  test("custom expressions register as SQL functions") {
    GraftExtensions.register(spark)
    val r = spark.sql(
      """SELECT vec_dot(array(cast(1.0 as float), cast(2.0 as float)),
        |               array(cast(3.0 as float), cast(4.0 as float))) AS d,
        |       intersect_count(array(1L, 5L, 9L), array(5L, 9L, 11L)) AS c""".stripMargin)
      .collect()(0)
    assert(r.getDouble(0) == 11.0)
    assert(r.getInt(1) == 2)
  }
}
