package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.TimestampType

/** Round-trip guard for the `events.ts` physical types the driver has
  * shipped so far. The testdata is regenerated between rounds and the
  * timestamp physical type has already changed once (parquet
  * TIMESTAMP(NANOS) → plain `timestamp[us]`/NTZ, which silently broke
  * every `unix_micros(ts)` query); this spec pins that [[Tables]]
  * normalizes ALL observed variants to Spark's instant TimestampType
  * with identical microsecond values, so the next silent regeneration
  * fails here instead of zeroing out a correctness round.
  */
class TablesSpec extends SparkSpec {

  // one known instant, expressed as epoch micros (2024-03-05 06:07:08.123456 UTC)
  private val micros = Seq(1709618828123456L, 1709618828123457L, 1709705228000000L)

  private def eventsDir(write: String => Unit): String = {
    val dir = Files.createTempDirectory("graft-tables").toFile
    dir.deleteOnExit()
    write(s"${dir.getAbsolutePath}/events.parquet")
    dir.getAbsolutePath
  }

  private def loadedMicros(dir: String): Seq[Long] = {
    val df = Tables(spark, dir, "events")
    assert(df.schema("ts").dataType == TimestampType,
      s"Tables must normalize ts to the instant type, got ${df.schema("ts").dataType}")
    df.select(unix_micros(col("ts"))).collect().map(_.getLong(0)).toSeq.sorted
  }

  test("LTZ (timestamp[us] UTC-adjusted) passes through unchanged") {
    import spark.implicits._
    val dir = eventsDir { path =>
      micros.toDF("us").select(timestamp_micros(col("us")).as("ts"))
        .coalesce(1).write.parquet(path)
    }
    assert(loadedMicros(dir) == micros.sorted)
  }

  test("NTZ (plain timestamp[us], no timezone) is cast micros-identically") {
    import spark.implicits._
    // Spark writes TimestampNTZType as parquet timestamp[us] with
    // isAdjustedToUTC=false — byte-identical to what the driver's
    // pyarrow generator ships since round 8's regeneration.
    val dir = eventsDir { path =>
      micros.toDF("us")
        .select(timestamp_micros(col("us")).cast("timestamp_ntz").as("ts"))
        .coalesce(1).write.parquet(path)
    }
    assert(spark.read.parquet(s"$dir/events.parquet").schema("ts").dataType
      == org.apache.spark.sql.types.TimestampNTZType, "fixture must round-trip as NTZ")
    // session tz is pinned UTC, so LTZ<->NTZ casts are micros-identical
    assert(loadedMicros(dir) == micros.sorted)
  }

  test("schema canary: every driver table loads with the column types queries assume") {
    // The driver regenerates /root/testdata between rounds and has
    // already changed a physical type once (events.ts, round 8). This
    // canary pins every column the query surface depends on, so the
    // next silent regeneration fails ONE focused unit test instead of
    // an opaque swath of the correctness gate.
    import org.apache.spark.sql.types._
    val sf = "/root/testdata/sf0.001"
    val expected: Map[String, Map[String, DataType]] = Map(
      "events" -> Map("event_id" -> LongType, "ts" -> TimestampType,
        "user_id" -> LongType, "event_type" -> StringType,
        "value" -> DoubleType, "props" -> StringType),
      "documents" -> Map("doc_id" -> LongType, "text" -> StringType,
        "lang" -> StringType, "source" -> StringType, "n_chars" -> LongType),
      "embeddings" -> Map("vec_id" -> LongType,
        "embedding" -> ArrayType(FloatType), "label" -> IntegerType),
      // the date-ish columns ship as plain timestamp[us] (NTZ) and the
      // whole query surface + oracles were written against that — the
      // canary pins the status quo, whatever it is, so DRIFT is what
      // fails, not any particular choice
      "lineitem" -> Map("l_orderkey" -> LongType, "l_quantity" -> DoubleType,
        "l_extendedprice" -> DoubleType, "l_discount" -> DoubleType,
        "l_shipdate" -> TimestampNTZType, "l_returnflag" -> StringType),
      "orders" -> Map("o_orderkey" -> LongType, "o_custkey" -> LongType,
        "o_totalprice" -> DoubleType, "o_orderdate" -> TimestampNTZType),
      "customer" -> Map("c_custkey" -> LongType, "c_nationkey" -> IntegerType,
        "c_acctbal" -> DoubleType, "c_mktsegment" -> StringType),
      "supplier" -> Map("s_suppkey" -> LongType, "s_nationkey" -> IntegerType),
      "part" -> Map("p_partkey" -> LongType, "p_brand" -> StringType,
        "p_size" -> IntegerType),
      "nation" -> Map("n_nationkey" -> IntegerType, "n_regionkey" -> IntegerType),
      "region" -> Map("r_regionkey" -> IntegerType))
    expected.foreach { case (table, cols) =>
      val schema = Tables(spark, sf, table).schema
      cols.foreach { case (name, tpe) =>
        assert(schema.fieldNames.contains(name), s"$table.$name missing")
        assert(schema(name).dataType == tpe,
          s"$table.$name drifted: expected $tpe, got ${schema(name).dataType} " +
            "— the driver regenerated testdata with a new physical type; " +
            "normalize it in Tables (see the events.ts precedent)")
      }
    }
  }

  test("non-UTC session timeZone is rejected, not silently shifted") {
    import spark.implicits._
    // The NTZ->instant cast in Tables is micros-identical ONLY under
    // UTC; a non-UTC session would shift every events.ts value with no
    // error. Tables enforces the invariant instead of assuming it.
    val dir = eventsDir { path =>
      micros.toDF("us")
        .select(timestamp_micros(col("us")).cast("timestamp_ntz").as("ts"))
        .coalesce(1).write.parquet(path)
    }
    val saved = spark.conf.get("spark.sql.session.timeZone")
    try {
      spark.conf.set("spark.sql.session.timeZone", "America/New_York")
      val e = intercept[IllegalArgumentException] {
        Tables(spark, dir, "events")
      }
      assert(e.getMessage.contains("timeZone"), e.getMessage)
    } finally spark.conf.set("spark.sql.session.timeZone", saved)
    assert(loadedMicros(dir) == micros.sorted) // restored session works
  }

  test("nanos-as-long (TIMESTAMP(NANOS) under the legacy read conf) truncates ns->us") {
    import spark.implicits._
    // Spark cannot WRITE parquet TIMESTAMP(NANOS); under the
    // `nanosAsLong` conf Tables sets, a NANOS column arrives as plain
    // LongType — exactly what a raw int64 ns column reads as, so the
    // fixture exercises the identical Tables branch. The +999 ns
    // tail pins the truncation (DuckDB truncates the same way reading
    // TIMESTAMP_NS into its us-precision type).
    val dir = eventsDir { path =>
      micros.toDF("us").select((col("us") * 1000L + 999L).as("ts"))
        .coalesce(1).write.parquet(path)
    }
    assert(loadedMicros(dir) == micros.sorted)
  }
}
