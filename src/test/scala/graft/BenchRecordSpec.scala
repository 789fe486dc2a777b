package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench record's self-adjudication arithmetic (VERDICT r17 #5):
  * `vs_prev_median` must be the median per-entry ratio over entries
  * present and healthy in BOTH records — so one noisy entry cannot
  * move it, errored entries cannot poison it, and a record with no
  * overlap reports null instead of a fabricated number. Pure-function
  * tests; no Spark session.
  */
class BenchRecordSpec extends AnyFunSuite {

  test("median ratio: odd and even counts, insensitive to one outlier") {
    val prev = Map("a" -> 1.0, "b" -> 2.0, "c" -> 4.0)
    assert(Bench.vsPrevMedian(prev,
      Map("a" -> 1.0, "b" -> 2.0, "c" -> 4.0)) === Some(1.0))
    // one 10× outlier among three entries does not move the median
    assert(Bench.vsPrevMedian(prev,
      Map("a" -> 1.0, "b" -> 2.0, "c" -> 40.0)) === Some(1.0))
    // a uniform 2× tax moves it to exactly 2
    assert(Bench.vsPrevMedian(prev,
      Map("a" -> 2.0, "b" -> 4.0, "c" -> 8.0)) === Some(2.0))
    // even count: mean of the two central ratios
    assert(Bench.vsPrevMedian(Map("a" -> 1.0, "b" -> 1.0),
      Map("a" -> 1.0, "b" -> 3.0)) === Some(2.0))
  }

  test("errored and unmatched entries are excluded; no overlap -> None") {
    val prev = Map("a" -> 1.0, "b" -> 0.0, "gone" -> 5.0)
    // b has prev 0 (unusable denominator), d errored (-1), e is new
    val cur = Map("a" -> 3.0, "b" -> 1.0, "d" -> -1.0, "e" -> 7.0)
    assert(Bench.vsPrevMedian(prev, cur) === Some(3.0))
    assert(Bench.vsPrevMedian(Map.empty, cur) === None)
    assert(Bench.vsPrevMedian(prev, Map("d" -> -1.0)) === None)
  }

  test("parseQueries reads this file's own output format") {
    val line = """{"metric":"total","value":12.5,"unit":"sec","queries":{"q1_agg":0.25,"j1":1.5E-1,"bad":-1.0},"sf":"/x","canary":[0.1,0.2]}"""
    val q = Bench.parseQueries(line)
    assert(q === Map("q1_agg" -> 0.25, "j1" -> 0.15, "bad" -> -1.0))
    assert(Bench.parseQueries("{}") === Map.empty)
    assert(Bench.parseQueries("""{"queries":{}}""") === Map.empty)
  }

  test("sf field parses; a cross-SF previous record must be suppressed by the caller") {
    val line = """{"metric":"total","value":1.0,"queries":{"a":1.0},"sf":"/root/testdata/sf0.1","failed":0}"""
    assert(Bench.parseSf(line) === Some("/root/testdata/sf0.1"))
    assert(Bench.parseSf("""{"queries":{"a":1.0}}""") === None)
    // the caller's rule: prev sf != current sf -> empty prev map -> null
    assert(!Bench.parseSf(line).contains("/root/testdata/sf0.01"))
  }

  test("end to end: previous record line -> median vs a 1.0-ratio rerun") {
    val prevLine = """{"queries":{"a":1.0,"b":2.0,"c":3.0},"failed":0}"""
    val cur = Map("a" -> 1.1, "b" -> 2.2, "c" -> 3.3)
    val got = Bench.vsPrevMedian(Bench.parseQueries(prevLine), cur).get
    assert(math.abs(got - 1.1) < 1e-12)
  }
}
