package graft.queries

import graft.SparkSpec

/** The per-(session, sfDir) memo that backs every shared derived table
  * (cc fixpoints, oriented adjacency, labeled edges). Two properties
  * matter: a key is built exactly once per (session, dir), and distinct
  * dirs never share a value — a collision here would silently serve one
  * scale factor's table to another and the gate would read it as an
  * engine bug.
  */
class MemoSpec extends SparkSpec {

  test("builds once per key and isolates by sfDir") {
    val m = new Memo[String]
    var builds = 0
    def build(dir: String): String =
      m(spark, dir) { (_, d) => builds += 1; s"built:$d" }
    assert(build("/a") === "built:/a")
    assert(build("/a") === "built:/a")
    assert(builds === 1, "same key rebuilt")
    assert(build("/b") === "built:/b")
    assert(builds === 2)
    assert(build("/a") === "built:/a" && builds === 2,
      "existing key evicted by an unrelated insert")
  }

  test("bounded: exceeding the cap clears rather than growing forever") {
    val m = new Memo[Int]
    var builds = 0
    (1 to 10).foreach { i => m(spark, s"/d$i") { (_, _) => builds += 1; i } }
    // Every insert beyond the cap triggered a clear-then-rebuild; the
    // exact count is an implementation detail, but a rebuild of an
    // early key proves the map was bounded, not monotone.
    val before = builds
    m(spark, "/d1") { (_, _) => builds += 1; 1 }
    assert(builds === before + 1, "cache grew unboundedly (cap never fired)")
  }
}
