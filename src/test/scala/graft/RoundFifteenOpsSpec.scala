package graft

/** Round-15 laws. First family: the end-of-run final requeue (VERDICT
  * r14 item 3) — waves 1-3 drained ONE MaxWaitMs budget opened at the
  * first trip, so a foreign load that outlasted that window shipped
  * `contaminated: true` even when the box was quiet again by run end
  * (BENCH_r14: 5 unhealed rows at load1_end 1.95). Round 15 gives the
  * leftovers one fresh bounded window whose acceptance is the
  * CONJUNCTION of both committed-baseline levers, so a requeue can never
  * launder a reading that any per-wave heal would have rejected. */
class RoundFifteenOpsSpec extends SparkSpec {

  private val cpuBase = Map("q_hot" -> (10.0, 20L), "q_cool" -> (0.5, 5L))
  private val wallBase = Map("q_hot" -> (2.0, 20L), "q_cool" -> (0.4, 5L))

  test("final requeue: a reading clean on BOTH levers is accepted") {
    assert(BenchRetimer.requeueAccepted(cpuBase, wallBase,
      "q_hot", wall = 2.5, cpu = 12.0, cg = 20L))
  }

  test("final requeue: cpu still inflated vs baseline rejects even at clean wall") {
    // 3x the 10 cpu-s baseline at unchanged codegen — the wave-2 class
    assert(!BenchRetimer.requeueAccepted(cpuBase, wallBase,
      "q_hot", wall = 2.0, cpu = 31.0, cg = 20L))
  }

  test("final requeue: wall still inflated vs baseline rejects even at clean cpu") {
    // the g23 class: wall 3x the committed clean wall, cpu fine
    assert(!BenchRetimer.requeueAccepted(cpuBase, wallBase,
      "q_hot", wall = 6.1, cpu = 10.0, cg = 20L))
  }

  test("final requeue: a codegen recompile burst is a legitimate adder on both levers") {
    assert(BenchRetimer.requeueAccepted(cpuBase, wallBase,
      "q_hot", wall = 6.1, cpu = 31.0, cg = 20L + BenchSentinel.CpuCodegenSlack + 1))
  }

  test("final requeue: rows absent from the baselines are accepted (levers disarmed, as in the final verdict)") {
    assert(BenchRetimer.requeueAccepted(cpuBase, wallBase,
      "q_unknown", wall = 9.9, cpu = 99.0, cg = 0L))
    assert(BenchRetimer.requeueAccepted(Map.empty, Map.empty,
      "q_hot", wall = 9.9, cpu = 99.0, cg = 20L))
  }

  test("final requeue: sub-floor rows stay under each lever's own floor rules") {
    // cpu lever floors at 1.0 baseline cpu; wall lever floors at 1.0 run wall
    assert(BenchRetimer.requeueAccepted(cpuBase, wallBase,
      "q_cool", wall = 0.9, cpu = 49.0, cg = 5L))
  }

  test("final requeue budget is bounded and positive") {
    assert(BenchRetimer.FinalRequeueWaitMs > 0 &&
      BenchRetimer.FinalRequeueWaitMs <= BenchRetimer.MaxWaitMs)
  }
}
