package graft

class GraftSessionSpec extends SparkSpec {
  test("getOrCreate installs graft SQL functions on an existing session") {
    val s = GraftSession.getOrCreate()
    val km = s.sql("SELECT haversine_km(0.0, 0.0, 0.0, 1.0) AS km")
      .collect().head.getDouble(0)
    assert(math.abs(km - 111.19) < 0.5) // one degree of longitude at equator
  }
}
