package graft

/** Pin the Spark-visible schema of every fixture table.
  *
  * The round driver regenerates /root/testdata between rounds and has
  * already changed a physical encoding once (events.ts
  * TIMESTAMP(NANOS) → TIMESTAMP_MICROS NTZ), which surfaced as five
  * unrelated query crashes instead of one named failure. This spec
  * makes the next drift loud and specific: if any column's
  * Spark-inferred type changes, the failing assertion names the table
  * and the exact diff. Update the pinned list ONLY after confirming
  * every consumer of the changed column (and `Tables`' normalization,
  * for timestamps) handles the new type.
  *
  * Note orders/lineitem date columns are physically TIMESTAMP_NTZ in
  * the current fixtures — consumers always go through `.cast("date")`,
  * so NTZ is fine THERE; events.ts is the one column normalized in the
  * reader (TsEncodingSpec covers its three historical encodings).
  */
class FixtureSchemaSpec extends SparkSpec {

  private def shape(df: org.apache.spark.sql.DataFrame): Seq[(String, String)] =
    df.schema.fields.toSeq.map(f => f.name -> f.dataType.simpleString)

  private val expected: Seq[(String, Seq[(String, String)])] = Seq(
    "region" -> Seq("r_regionkey" -> "int", "r_name" -> "string"),
    "nation" -> Seq("n_nationkey" -> "int", "n_name" -> "string",
      "n_regionkey" -> "int"),
    "customer" -> Seq("c_custkey" -> "bigint", "c_name" -> "string",
      "c_nationkey" -> "int", "c_acctbal" -> "double",
      "c_mktsegment" -> "string"),
    "supplier" -> Seq("s_suppkey" -> "bigint", "s_name" -> "string",
      "s_nationkey" -> "int", "s_acctbal" -> "double"),
    "part" -> Seq("p_partkey" -> "bigint", "p_name" -> "string",
      "p_brand" -> "string", "p_type" -> "string", "p_size" -> "int",
      "p_retailprice" -> "double"),
    "orders" -> Seq("o_orderkey" -> "bigint", "o_custkey" -> "bigint",
      "o_orderstatus" -> "string", "o_totalprice" -> "double",
      "o_orderdate" -> "timestamp_ntz", "o_orderpriority" -> "string"),
    "lineitem" -> Seq("l_orderkey" -> "bigint", "l_partkey" -> "bigint",
      "l_suppkey" -> "bigint", "l_linenumber" -> "int",
      "l_quantity" -> "double", "l_extendedprice" -> "double",
      "l_discount" -> "double", "l_tax" -> "double",
      "l_returnflag" -> "string", "l_linestatus" -> "string",
      "l_shipdate" -> "timestamp_ntz"),
    // events through the production reader: ts NORMALIZED to TimestampType
    "events" -> Seq("event_id" -> "bigint", "ts" -> "timestamp",
      "user_id" -> "bigint", "event_type" -> "string",
      "value" -> "double", "props" -> "string"),
    "documents" -> Seq("doc_id" -> "bigint", "text" -> "string",
      "lang" -> "string", "source" -> "string", "n_chars" -> "bigint"),
    "embeddings" -> Seq("vec_id" -> "bigint",
      "embedding" -> "array<float>", "label" -> "int"))

  private def load(name: String) = name match {
    case "region"     => Tables.region(spark, sf0001)
    case "nation"     => Tables.nation(spark, sf0001)
    case "customer"   => Tables.customer(spark, sf0001)
    case "supplier"   => Tables.supplier(spark, sf0001)
    case "part"       => Tables.part(spark, sf0001)
    case "orders"     => Tables.orders(spark, sf0001)
    case "lineitem"   => Tables.lineitem(spark, sf0001)
    case "events"     => Tables.events(spark, sf0001)
    case "documents"  => Tables.documents(spark, sf0001)
    case "embeddings" => Tables.embeddings(spark, sf0001)
  }

  for ((table, exp) <- expected)
    test(s"fixture schema pinned: $table") {
      val got = shape(load(table))
      assert(got == exp,
        s"FIXTURE DRIFT in $table — driver regenerated with a changed " +
          s"schema.\n  got:      $got\n  expected: $exp\n" +
          "Audit every consumer of the changed column before repinning.")
    }
}
