package graft

class EntrySpec extends SparkSpec {
  test("entry returns rows (driver smoke contract)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracleSql key has a queries entry") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracle without query: $missing")
  }

  test("all queries run and return rows at sf0.001") {
    val empties = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      val n = fn(spark, sf0001).count()
      // q09 exact dups may legitimately be empty at tiny scale
      if (n == 0 && name != "q09_exact_dups") Some(name) else None
    }
    assert(empties.isEmpty, s"empty results: $empties")
  }
}
