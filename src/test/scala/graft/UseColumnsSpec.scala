package graft

import graft.schema.UseColumns
import org.apache.spark.sql.types._

class UseColumnsSpec extends org.scalatest.funsuite.AnyFunSuite {

  test("names only") {
    val s = UseColumns.parse("a,b,c")
    assert(s.names == Seq("a", "b", "c") && s.dtypes.isEmpty)
  }

  test("typed entries (csvplayback.py:607-613 type map)") {
    val s = UseColumns.parse("id:int,temperature:float,status:str,ok:bool,ts:timestamp")
    assert(s.names == Seq("id", "temperature", "status", "ok", "ts"))
    assert(s.dtypes == Map(
      "id" -> LongType, "temperature" -> DoubleType, "status" -> StringType,
      "ok" -> BooleanType, "ts" -> TimestampType))
  }

  test("blank entries mark dropped positions (csvplayback.py:619-620)") {
    val s = UseColumns.parse("id:int,,status:str")
    assert(s.names == Seq("id", "", "status"))
    assert(s.selected == Seq("id", "status"))
  }

  test("unknown type raises (csvplayback.py:626-628)") {
    intercept[IllegalArgumentException](UseColumns.parse("id:uuid"))
  }

  test("a:b:c raises (csvplayback.py:631-633)") {
    intercept[IllegalArgumentException](UseColumns.parse("a:int:extra"))
  }

  test("mixed typed and untyped") {
    val s = UseColumns.parse("id:int,value")
    assert(s.names == Seq("id", "value") && s.dtypes == Map("id" -> LongType))
  }
}
