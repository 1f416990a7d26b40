package graft.routing

import org.scalatest.funsuite.AnyFunSuite

import graft.model._

/** Table tests of the pure routing core, one per fixture in FIXTURES.md §A
  * (semantics mirrored from IngressRouter.java:36-100 /
  * EgressRouter.java:32-63).
  */
class RoutingSpec extends AnyFunSuite {

  private val addr = FunctionAddress(FunctionType("global", "Account", stateful = true), "k1")
  private val noKey = addr.copy(key = "")

  test("ping → EGRESS Pong keyed by event id") {
    val r = Routing.ingress(Event.request("e1", noKey, Request.Ping))
    assert(r.direction == RouteDirection.EGRESS)
    assert(r.key == "e1")
    assert(r.eventValue.reply.contains(Reply.Pong))
    assert(r.eventValue.request.isEmpty)
  }

  test("keyed request → INTERNAL ns/name with fun key") {
    val r = Routing.ingress(Event.request("e2", addr, Request.InvokeStateful))
    assert(r.direction == RouteDirection.INTERNAL)
    assert(r.routeName == "global/Account")
    assert(r.key == "k1")
  }

  test("empty key → INTERNAL ns/name-create with empty key") {
    val r = Routing.ingress(Event.request("e3", noKey, Request.InitClass))
    assert(r.direction == RouteDirection.INTERNAL)
    assert(r.routeName == "global/Account-create")
    assert(r.key == "")
  }

  test("EventFlow mid-flow → INTERNAL to current_fun") {
    val cur = EventFlowNode(addr, "INVOKE_SPLIT")
    val r = Routing.ingress(Event.request("e4", noKey, Request.EventFlow, current = Some(cur)))
    assert(r.direction == RouteDirection.INTERNAL)
    assert(r.routeName == "global/Account")
    assert(r.key == "k1")
    assert(r.eventValue.request.contains(Request.EventFlow))
  }

  test("EventFlow RETURN → EGRESS SuccessfulInvocation") {
    val cur = EventFlowNode(addr, "RETURN")
    val r = Routing.ingress(Event.request("e5", noKey, Request.EventFlow, current = Some(cur)))
    assert(r.direction == RouteDirection.EGRESS)
    assert(r.key == "e5")
    assert(r.eventValue.reply.contains(Reply.SuccessfulInvocation))
  }

  test("reply at ingress throws") {
    val e = Event("e6", addr, None, Some(Reply.SuccessfulInvocation), Array.emptyByteArray, None)
    assertThrows[IllegalArgumentException](Routing.ingress(e))
  }

  test("egress: reply → CLIENT keyed by event id") {
    val e = Event("e7", addr, None, Some(Reply.SuccessfulInvocation), Array.emptyByteArray, None)
    val r = Routing.egress(e)
    assert(r.direction == RouteDirection.CLIENT)
    assert(r.key == "e7")
  }

  test("egress: in-flight EventFlow → INTERNAL loop") {
    val cur = EventFlowNode(addr, "INVOKE")
    val e = Event.request("e8", noKey, Request.EventFlow, current = Some(cur))
    val r = Routing.egress(e)
    assert(r.direction == RouteDirection.INTERNAL)
    assert(r.key == "e8")
  }

  test("egress: non-flow request throws") {
    val e = Event.request("e9", addr, Request.InvokeStateful)
    assertThrows[IllegalArgumentException](Routing.egress(e))
  }

  test("rekey after create uses newly assigned key") {
    val created = Event("e10", addr.copy(key = "k-new"), None,
      Some(Reply.SuccessfulCreateClass), Array.emptyByteArray, None)
    val r = Routing.rekeyCreated(created)
    assert(r.direction == RouteDirection.INTERNAL)
    assert(r.routeName == "global/Account")
    assert(r.key == "k-new")
  }
}
