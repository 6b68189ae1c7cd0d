package graft

class GraftExtensionsSpec extends SparkSpec {

  test("registerAll exposes every graft function to SQL") {
    GraftFunctions.registerAll(spark)
    assert(spark.sql("SELECT topic_matches('a.b', 'a.*')").head().getBoolean(0))
    assert(spark.sql(
      "SELECT topic_parts_matches(array('a', 'b'), false, 'a.*')")
      .head().getBoolean(0))
    assert(spark.sql("SELECT dot_product(array(1.0d, 2.0d), array(3.0d, 4.0d))")
      .head().getDouble(0) == 11.0)
    assert(spark.sql("SELECT size(minhash_sig(array(1L, 2L, 3L), 16))")
      .head().getInt(0) == 16)
    assert(spark.sql("SELECT simhash_fp(array('a', 'b'))").head().getLong(0) ==
      spark.sql("SELECT simhash_fp(array('b', 'a'))").head().getLong(0),
      "simhash is order-insensitive")
    assert(spark.sql("SELECT size(trigram_hashes(array('a','b','c','d')))")
      .head().getInt(0) == 2)
    assert(spark.sql("SELECT nfc_normalize('cafe\u0301') = 'caf\u00e9'")
      .head().getBoolean(0), "NFC must compose e + combining acute")
  }

  test("GraftExtensions injects the functions into a fresh session") {
    // a new session on the same context, with the extension applied the way
    // spark.sql.extensions would at startup
    org.apache.spark.sql.SparkSession.clearActiveSession()
    val s2 = org.apache.spark.sql.SparkSession.builder()
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .getOrCreate()
    try {
      assert(s2.sql("SELECT topic_matches('x.y', 'x...')").head().getBoolean(0))
      assert(s2.sql("SELECT dot_product(array(2.0d), array(8.0d))")
        .head().getDouble(0) == 16.0)
    } finally {
      org.apache.spark.sql.SparkSession.setActiveSession(spark)
    }
  }
}
