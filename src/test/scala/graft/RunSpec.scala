package graft

import org.scalatest.funsuite.AnyFunSuite

/** CLI flag parsing must be argparse-strict: a valueless flag or stray
  * positional must fail loudly, never silently shift later pairs.
  */
class RunSpec extends AnyFunSuite {

  test("parseFlags reads aligned --flag value pairs") {
    val f = Run.parseFlags(Seq("--data", "x.txt", "--seed", "7"))
    assert(f == Map("data" -> "x.txt", "seed" -> "7"))
  }

  test("parseFlags rejects a valueless flag instead of shifting pairs") {
    val e = intercept[RuntimeException] {
      Run.parseFlags(Seq("--data", "x", "--verbose", "--seed", "7"))
    }
    assert(e.getMessage.contains("--verbose"))
  }

  test("parseFlags rejects stray positional arguments") {
    val e = intercept[RuntimeException] {
      Run.parseFlags(Seq("x.txt", "--seed", "7"))
    }
    assert(e.getMessage.contains("x.txt"))
  }

  test("parseFlags rejects a trailing flag with no value") {
    assertThrows[RuntimeException](Run.parseFlags(Seq("--data")))
  }
}
