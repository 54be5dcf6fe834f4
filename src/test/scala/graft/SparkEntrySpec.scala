package graft

/** Driver-contract invariants: the flagship entry must smoke (rows > 0),
  * and the queries/oracleSql registries must stay consistent — the
  * driver hash-compares by column NAME, so a query whose oracle key
  * vanished or whose name collides would fail silently out-of-band.
  */
class SparkEntrySpec extends SparkSpec {

  test("flagship entry returns alert rows on sf0.001") {
    val df = SparkEntry.entry(spark)
    assert(df.columns.toSeq ==
      Seq("p_brand", "l_orderkey", "l_extendedprice", "warning_level", "alert"))
    assert(df.count() > 0)
  }

  test("registry names are unique, q-numbered, and every oracle key resolves") {
    val names = SparkEntry.registry.map(_.name)
    assert(names.distinct.size == names.size, "duplicate query names")
    assert(names.forall(_.matches("q\\d{2,3}_[a-z0-9_]+")), "name convention")
    val qs = SparkEntry.queries.keySet
    assert(SparkEntry.oracleSql.keySet.subsetOf(qs),
      "oracle keys without a query")
    // every query is oracle-checked — the round-5 contract (no rows-only
    // residue); a new query without an oracle regresses the gate. An
    // oracle is either static SQL or a dynamic renderer (data-dependent
    // literals, e.g. q89's trained centroids) — exactly one of the two.
    val withOracle = SparkEntry.registry
      .filter(q => q.oracle.isDefined != q.oracleDyn.isDefined)
      .map(_.name).toSet
    assert(qs == withOracle,
      s"queries missing (or double-declaring) oracles: ${qs -- withOracle}")
  }
}
