package graft

import graft.ops.{Functions, SetOps}
import org.apache.spark.sql.functions._

class SetOpsFunctionsSpec extends SparkSpec {

  test("intersect ⊆ both sides; except ∩ right = ∅") {
    val inter = SetOps.qIntersect(spark, sf)
    val rich = Tables.customer(spark, sf).filter(col("c_acctbal") > 5000)
      .select(col("c_custkey").as("custkey"))
    assert(inter.except(rich).count() == 0)
    val exc = SetOps.qExcept(spark, sf)
    val recent = Tables.orders(spark, sf)
      .filter(col("o_orderdate") >= lit("1997-01-01").cast("timestamp"))
      .select(col("o_custkey").as("custkey"))
    assert(exc.intersect(recent).count() == 0)
  }

  test("union batch counts match the two filters") {
    val rows = SetOps.qUnion(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val o = Tables.orders(spark, sf)
    assert(rows("batch_f") == o.filter(col("o_orderstatus") === "F").count())
    assert(rows("batch_big") == o.filter(col("o_totalprice") > 50000).count())
  }

  test("regexp digits parse back to the custkey") {
    val bad = Functions.qFnString(spark, sf)
      .filter(col("digits").cast("long") =!= col("c_custkey")).count()
    assert(bad == 0)
  }

  test("json path and typed parse agree") {
    assert(Functions.qFnJson(spark, sf)
      .filter(col("k_path") =!= col("k_typed")).count() == 0)
  }

  test("flatten produces dot-named columns like json_normalize") {
    val cols = Functions.qFlatten(spark, sf).columns
    assert(cols.contains("municipio.sub.detalhe.valor"))
  }

  test("hash60 stays in [0, 2^60) and md5 matches a reference digest") {
    import spark.implicits._
    val h = graft.ops.Functions.qFnHash(spark, sf)
    assert(h.filter(col("hash60") < 0 || col("hash60") >= (1L << 60)).count() == 0)
    // known-answer check against java.security on one row
    val row = h.limit(1).collect().head
    val text = Tables.documents(spark, sf)
      .filter(col("doc_id") === row.getLong(0)).select("text").collect().head.getString(0)
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest(text.getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(row.getString(1) == md)
  }

  test("array norm_sq >= 0 and dim constant 64") {
    val df = Functions.qFnArray(spark, sf)
    assert(df.filter(col("norm_sq") < 0).count() == 0)
    assert(df.select("dim").distinct().collect().map(_.getInt(0)).sameElements(Array(64)))
  }

  test("union by name aligns drifted schemas and null-fills the gaps") {
    val df = SetOps.qUnionByName(spark, sf).cache()
    try {
      assert(df.columns.toSeq == Seq("id", "name", "acctbal", "kind", "nationkey"))
      // each side's exclusive column is null exactly on the other side's rows
      assert(df.filter(col("kind") === "supplier" && col("acctbal").isNotNull).count() == 0)
      assert(df.filter(col("kind") === "customer" && col("nationkey").isNotNull).count() == 0)
      val nCust = Tables.customer(spark, sf).filter(col("c_acctbal") > 9000).count()
      val nSupp = Tables.supplier(spark, sf).filter(col("s_acctbal") > 9000).count()
      assert(df.count() == nCust + nSupp)
    } finally df.unpersist()
  }

  test("struct json round-trips and the struct field matches its source column") {
    val df = Functions.qFnStruct(spark, sf)
    val reparsed = df.select(col("c_custkey"), col("seg_from_struct"),
      get_json_object(col("meta_json"), "$.custkey").cast("long").as("jk"),
      get_json_object(col("meta_json"), "$.seg").as("js"))
    assert(reparsed.filter(col("jk") =!= col("c_custkey")).count() == 0)
    assert(reparsed.filter(col("js") =!= col("seg_from_struct")).count() == 0)
  }

  test("variant extraction is typed, try_ NULLs on type mismatch, missing paths NULL") {
    val df = Functions.qFnVariant(spark, sf)
    // the source round-trip: every extracted field equals its origin column
    val ev = Tables.events(spark, sf).select(col("event_id"),
      col("event_type").as("src_et"), col("user_id"))
    val joined = df.join(ev, "event_id")
    assert(joined.filter(col("et") =!= col("src_et")).count() == 0)
    assert(joined.filter(col("id2") =!= col("user_id") * 2).count() == 0)
    // event_type strings never parse as int under try_variant_get
    assert(df.filter(col("et_as_int").isNotNull).count() == 0)
    // a path absent from the document extracts as NULL, not an error
    assert(df.filter(col("absent").isNotNull).count() == 0)
    assert(df.count() > 0)
  }
}
