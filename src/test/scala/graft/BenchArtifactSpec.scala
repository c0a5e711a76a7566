package graft

import org.scalatest.funsuite.AnyFunSuite
import com.fasterxml.jackson.databind.ObjectMapper

/** Pins the bench-artifact quarantine contract (r12 verdict #1).
  *
  * The r12 postmortem: `bench_baseline.json` was guarded against
  * degraded-host overwrite, but `bench_detail.json`/`bench_wire.json`
  * were not — the driver's degraded end-of-round re-run (canary 1.41,
  * steal 3.7 %) overwrote the clean committed close in the working
  * tree and was snapshot-committed. Two invariants close that hole:
  *
  *  1. [[Bench.detailPathFor]]/[[Bench.wirePathFor]] route any
  *     host_degraded-or-failing run to `*_degraded.json` side files.
  *  2. The COMMITTED close files, when present, must say
  *     `host_degraded: false` with an empty `failed` list — so a
  *     degraded run sneaking into the clean files (by any path) turns
  *     the test board red before it can be committed as a close.
  */
class BenchArtifactSpec extends AnyFunSuite {

  test("degraded or failing runs are routed to quarantine side files") {
    assert(Bench.detailPathFor(quarantined = true) === "bench_detail_degraded.json")
    assert(Bench.wirePathFor(quarantined = true) === "bench_wire_degraded.json")
    assert(Bench.detailPathFor(quarantined = false) === "bench_detail.json")
    assert(Bench.wirePathFor(quarantined = false) === "bench_wire.json")
  }

  private def assertCleanClose(path: String): Unit = {
    val f = new java.io.File(path)
    if (f.exists()) { // absent is fine (fresh checkout pre-close)
      val node = new ObjectMapper().readTree(f)
      assert(!node.get("host_degraded").asBoolean(true),
        s"$path is a host_degraded run — degraded closes must live in " +
          "*_degraded.json quarantine files, never replace the clean close")
      val failed = node.get("failed")
      assert(failed != null && failed.size() === 0,
        s"$path records failed queries — not a committable clean close")
    }
  }

  test("the committed close files hold a clean quiet-host run") {
    assertCleanClose("bench_detail.json")
    assertCleanClose("bench_wire.json")
  }

  test("the committed baseline is run_id-stamped or r12-legacy") {
    val f = new java.io.File("bench_baseline.json")
    if (f.exists()) {
      val node = new ObjectMapper().readTree(f)
      // the pre-r13 baseline predates run_id stamping; anything newer
      // (a different ref) must carry one (r12 verdict #5)
      val legacyRef = "bc099b386ca1"
      val ref = Option(node.get("ref")).map(_.asText()).getOrElse("")
      if (ref != legacyRef)
        assert(node.hasNonNull("run_id"),
          "bench_baseline.json seeded without a run_id — two clean runs " +
            "at the same sha would be indistinguishable in the provenance chain")
    }
  }
}
