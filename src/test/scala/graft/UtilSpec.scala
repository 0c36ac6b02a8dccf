package graft

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

import graft.util.RotatingTempDir

/** RotatingTempDir retention contract: fresh dir per call, newest two
  * generations survive, older ones are pruned. */
class UtilSpec extends AnyFunSuite {

  test("fresh dir per call; two newest generations retained, older pruned") {
    val tag = s"graft_rot_test_${System.nanoTime()}_"
    val d1 = RotatingTempDir.next(tag)
    Files.createDirectories(Paths.get(d1))
    Files.writeString(Paths.get(d1, "marker"), "one")
    val d2 = RotatingTempDir.next(tag)
    Files.createDirectories(Paths.get(d2))
    assert(d1 !== d2, "each invocation must get a fresh dir")
    assert(Files.exists(Paths.get(d1, "marker")),
      "the previous generation stays valid for held lazy frames")
    val d3 = RotatingTempDir.next(tag)
    Files.createDirectories(Paths.get(d3))
    assert(!Files.exists(Paths.get(d1)), "generation n-2 is pruned recursively")
    assert(Files.exists(Paths.get(d2)) && Files.exists(Paths.get(d3)))
  }
}
