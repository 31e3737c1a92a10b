package graft.core

import graft.SparkSpec

class StateSpec extends SparkSpec {

  test("kv roundtrip incl. reopen") {
    val root = tmpDir("state")
    val s = new State(root, "n1")
    s.set("a", 42L)
    s.set("b", "hello")
    s.set("c", Map("x" -> 1L, "y" -> List(1L, 2L)))
    assert(s.get("a").contains(42L))
    val s2 = new State(root, "n1")
    assert(s2.get("a").contains(42L))
    assert(s2.get("b").contains("hello"))
    assert(s2.getOrElse("missing", "dflt") == "dflt")
    s2.delete("a")
    assert(new State(root, "n1").get("a").isEmpty)
  }

  test("states are per-node") {
    val root = tmpDir("state")
    new State(root, "n1").set("k", 1L)
    assert(new State(root, "n2").get("k").isEmpty)
  }

  test("shouldContinue deadline semantics (node.py:465-480)") {
    val s = new State(tmpDir("state"), "n1")
    assert(s.shouldContinue())                       // fresh run, 10-min limit
    assert(!s.shouldContinue(limitMs = 0L))          // limit exhausted
    s.requestNewRun(triggerDownstream = false, waitAtleastSeconds = 5)
    assert(s.pendingNewRun.contains((false, 5L)))
  }
}
