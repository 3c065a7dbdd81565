package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types.TimestampType
import org.scalatest.funsuite.AnyFunSuite

/** Pins the LOADED schema of every testdata table. The driver
  * regenerates `/root/testdata` between rounds and has already changed
  * an encoding once (round 6: `events.ts` nanos → micros-NTZ), which
  * broke 9 queries loudly and corrupted 8 silently. This spec turns
  * any future re-encode into ONE failing test that names the table and
  * column, instead of a scatter of deep query failures — on a type
  * change here, extend the loader's type dispatch (the
  * `Tables.normalizeEventTs` pattern) rather than editing call sites.
  */
class TestdataSchemaSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sf = SparkTestSession.Sf

  private def types(df: DataFrame): Map[String, String] =
    df.schema.fields.map(f => f.name -> f.dataType.simpleString).toMap

  private val expected: Map[String, Map[String, String]] = Map(
    "region" -> Map("r_regionkey" -> "int", "r_name" -> "string"),
    "nation" -> Map("n_nationkey" -> "int", "n_name" -> "string",
      "n_regionkey" -> "int"),
    "customer" -> Map("c_custkey" -> "bigint", "c_name" -> "string",
      "c_nationkey" -> "int", "c_acctbal" -> "double", "c_mktsegment" -> "string"),
    "supplier" -> Map("s_suppkey" -> "bigint", "s_name" -> "string",
      "s_nationkey" -> "int", "s_acctbal" -> "double"),
    "part" -> Map("p_partkey" -> "bigint", "p_name" -> "string",
      "p_brand" -> "string", "p_type" -> "string", "p_size" -> "int",
      "p_retailprice" -> "double"),
    "orders" -> Map("o_orderkey" -> "bigint", "o_custkey" -> "bigint",
      "o_orderstatus" -> "string", "o_totalprice" -> "double",
      "o_orderdate" -> "timestamp_ntz", "o_orderpriority" -> "string"),
    "lineitem" -> Map("l_orderkey" -> "bigint", "l_partkey" -> "bigint",
      "l_suppkey" -> "bigint", "l_linenumber" -> "int", "l_quantity" -> "double",
      "l_extendedprice" -> "double", "l_discount" -> "double", "l_tax" -> "double",
      "l_returnflag" -> "string", "l_linestatus" -> "string",
      "l_shipdate" -> "timestamp_ntz"),
    "documents" -> Map("doc_id" -> "bigint", "text" -> "string",
      "lang" -> "string", "source" -> "string", "n_chars" -> "bigint"),
    "embeddings" -> Map("vec_id" -> "bigint", "embedding" -> "array<float>",
      "label" -> "int"))

  for ((name, want) <- expected.toSeq.sortBy(_._1)) {
    test(s"$name: loaded schema matches the pinned contract") {
      val got = types(Tables.table(spark, sf, name))
      assert(got == want,
        s"testdata '$name' schema drifted (driver regenerated the parquet?): " +
          s"got $got, expected $want — extend the loader's type dispatch, " +
          "do not patch call sites (see Tables.normalizeEventTs)")
    }
  }

  test("events: loader normalizes ts to TIMESTAMP whatever the file encoding") {
    val ev = Tables.events(spark, sf)
    assert(ev.schema("ts").dataType == TimestampType,
      s"events.ts must canonicalize to TIMESTAMP, got ${ev.schema("ts").dataType} " +
        "— a new file encoding needs a new normalizeEventTs branch " +
        "(EventsEncodingSpec covers nanos-long / micros-NTZ / micros-LTZ)")
    val others = types(ev) - "ts"
    assert(others == Map("event_id" -> "bigint", "user_id" -> "bigint",
      "event_type" -> "string", "value" -> "double", "props" -> "string"))
  }
}
