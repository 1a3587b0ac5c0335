package graft.stats

import org.scalatest.funsuite.AnyFunSuite

/** Not a correctness test — prints single-thread kernel throughput so
  * regressions in the hot loop are visible in test logs.
  */
class KernelThroughput extends AnyFunSuite {
  test("moran kernel single-thread throughput (informational)") {
    val n = 200000
    val z = Array.tabulate(n)(i => math.sin(i * 0.1))
    val nbrs = Array.tabulate(10)(i => (i * 77 + 13) % n)
    val s = new LisaKernels.Scratch(n, 16)
    // warmup
    var i = 0
    while (i < 2000) { LisaKernels.moran(i % n, nbrs, z, 99, 42, 0.05, s); i += 1 }
    val rows = 20000
    val t0 = System.nanoTime()
    i = 0
    while (i < rows) { LisaKernels.moran(i % n, nbrs, z, 999, 42, 0.05, s); i += 1 }
    val sec = (System.nanoTime() - t0) / 1e9
    val drawsPerSec = rows.toLong * 999 * 10 / sec
    info(f"single-thread: ${rows / sec}%.0f rows/s, ${drawsPerSec / 1e6}%.1f M draws/s")
    assert(rows / sec > 100)
  }
}
