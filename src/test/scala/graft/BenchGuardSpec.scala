package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the bench artifact-integrity guard: only a full-suite run may
  * write `bench_detail.json`; any name-filtered spot-check is routed to
  * the scratch path. This is the mechanical fix for the r09 clobber,
  * where a 3-query partial run overwrote the committed 198-query detail
  * at HEAD (VERDICT r09, "What's wrong" #1). */
class BenchGuardSpec extends AnyFunSuite {
  test("full runs own bench_detail.json") {
    assert(Bench.detailPathFor(Set.empty) == "bench_detail.json")
  }
  test("name-filtered runs are routed to the scratch path") {
    assert(Bench.detailPathFor(Set("q01_pricing_summary")) == "bench_detail_partial.json")
    assert(Bench.detailPathFor(Set("a", "b", "c")) == "bench_detail_partial.json")
  }
}
