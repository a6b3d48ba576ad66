package graft.cdc

import org.scalatest.funsuite.AnyFunSuite

/** DDL-fragment parser tests (the add_tabschema path, ec:1722-1804),
  * against the exact column list of sql/informixcdc_test.sql:7-28 —
  * including `default` clauses with string literals and the multi-word
  * `datetime year to fraction` type. */
class DdlParserSuite extends AnyFunSuite {

  test("parses the reference's type-coverage DDL with default clauses") {
    val ddl =
      """cdc_serial8 serial8,
        |cdc_int8_low int8 default -9223372036854775807,
        |cdc_char char(16) default "I heart CDC",
        |cdc_date date default today,
        |cdc_datetime datetime year to fraction default current,
        |cdc_decimal_low decimal(32,16) default -1234567890123456.1234567890123456,
        |cdc_float_low float default -99.99999999999999,
        |cdc_integer_low integer default -2147483647,
        |cdc_smallfloat_low smallfloat default -99.99999999999999,
        |cdc_smallint_low smallint default -32767,
        |cdc_varchar varchar(255, 16) default "I still love CDC",
        |cdc_lvarchar lvarchar(256) default "Almost as much as waffles"""".stripMargin
    val sch = DdlParser.parse(1, "informixcdc_test", ddl)
    assert(sch.cols.map(_.colType) == IndexedSeq(
      ColType.Int8, ColType.Int8, ColType.Char(16), ColType.DateDay,
      ColType.DTime, ColType.Dec(32, 16), ColType.Float8, ColType.Int4,
      ColType.Float4, ColType.Int2, ColType.Varchar, ColType.Lvarchar))
    assert(sch.cols.map(_.name) == IndexedSeq(
      "cdc_serial8", "cdc_int8_low", "cdc_char", "cdc_date", "cdc_datetime",
      "cdc_decimal_low", "cdc_float_low", "cdc_integer_low",
      "cdc_smallfloat_low", "cdc_smallint_low", "cdc_varchar", "cdc_lvarchar"))
    assert(sch.numVarCols == 2) // varchar + lvarchar drive the row walk
  }

  test("commas inside type args don't split declarations") {
    val sch = DdlParser.parse(1, "t", "a decimal(20, 4), b varchar(255, 16), c int")
    assert(sch.cols == IndexedSeq(
      ColSpec("a", ColType.Dec(20, 4)), ColSpec("b", ColType.Varchar),
      ColSpec("c", ColType.Int4)))
  }

  test("spark schema mirrors the wire types") {
    import org.apache.spark.sql.types._
    val sch = DdlParser.parse(1, "t",
      "k bigint, s char(8), d decimal(32,16), t datetime year to fraction, b boolean")
    assert(sch.sparkSchema == StructType(Seq(
      StructField("k", LongType), StructField("s", StringType),
      StructField("d", DecimalType(32, 16)), StructField("t", TimestampType),
      StructField("b", BooleanType))))
  }

  test("unknown types raise instead of being silently skipped (ec:1128-1132)") {
    intercept[IllegalArgumentException](DdlParser.parse(1, "t", "x blob"))
  }

  test("the registry requires pre-declared table names (enable(), ec:2061-2062)") {
    val reg = SchemaRegistry(Map(3 -> "db@server:informix.orders"))
    assert(reg.tabname(3) == "db@server:informix.orders")
    assert(reg.tabname(4) == "tab_4") // unregistered id gets a placeholder
  }
}
