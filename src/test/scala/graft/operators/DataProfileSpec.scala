package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DataProfileSpec extends SparkSpec {
  import spark.implicits._

  test("profile counts rows, nulls, exact distincts, and string min/max") {
    val df = Seq(
      (1L, Option("a")), (2L, Option("b")), (3L, Option.empty[String]), (4L, Option("a"))
    ).toDF("id", "s")
    val out = DataProfile.profile(Seq("id" -> col("id"), "s" -> col("s")), df)
      .collect().map(r => r.getString(0) -> r).toMap
    val idR = out("id")
    assert(idR.getLong(1) === 4L && idR.getLong(2) === 0L && idR.getLong(3) === 4L)
    assert(idR.getString(4) === "1" && idR.getString(5) === "4")
    val sR = out("s")
    assert(sR.getLong(1) === 4L && sR.getLong(2) === 1L && sR.getLong(3) === 2L)
    assert(sR.getString(4) === "a" && sR.getString(5) === "b")
  }

  test("all-null column profiles to zero distincts and null min/max") {
    val df = Seq(1L, 2L).toDF("id").withColumn("n", lit(null).cast("string"))
    val r = DataProfile.profile(Seq("n" -> col("n")), df).collect().head
    assert(r.getLong(1) === 2L && r.getLong(2) === 2L && r.getLong(3) === 0L)
    assert(r.isNullAt(4) && r.isNullAt(5))
  }
}
