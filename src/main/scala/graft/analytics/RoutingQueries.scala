package graft.analytics

import org.apache.spark.sql.functions._

import graft.api.GraftQuery
import graft.model._
import graft.routing.Routing

/** Oracle-checked batch exercises of the event-plane operators: the
  * `events` table is deterministically lifted into stateflow `Event`s, run
  * through the REAL routing code (`Routing.ingress`, the same function the
  * streaming pipeline maps over executors), and compared against an
  * independent SQL restatement of the reference's router semantics
  * (IngressRouter.java:36-100). Also the keyBy→state-fold shape (P1) as a
  * batch aggregation.
  */
object RoutingQueries {

  /** Deterministic event_type → stateflow request mapping. */
  private def liftRequest(eventType: String): Int = eventType match {
    case "click" => Request.InvokeStateful
    case "view" => Request.GetState
    case "error" => Request.Ping
    case "purchase" => Request.EventFlow
    case _ => Request.InitClass // signup
  }

  private val qIngress = GraftQuery(
    "qr_ingress_route",
    (s, dir) => {
      import s.implicits._
      val lifted = Tables.events(s, dir)
        .select(col("event_id"), col("event_type"), col("user_id"))
        .as[(Long, String, Long)]
        .map { case (eid, etype, uid) =>
          val req = liftRequest(etype)
          // InitClass events model fresh instances (empty key); EventFlow
          // events carry a flow node, RETURN on every third event.
          val key = if (req == Request.InitClass) "" else s"u$uid"
          val addr = FunctionAddress(FunctionType("app", "Session", stateful = true), key)
          val nodeType = if (eid % 3 == 0) "RETURN" else "INVOKE"
          val cur =
            if (req == Request.EventFlow) Some(EventFlowNode(addr, nodeType)) else None
          (eid, Routing.ingress(Event.request(s"e$eid", addr, req, current = cur)))
        }
      lifted
        .select(col("_1").as("event_id"),
          col("_2.direction").as("direction"),
          col("_2.routeName").as("route_name"),
          col("_2.key").as("key"))
        .orderBy(col("event_id"))
    },
    Some("""SELECT event_id,
      CASE WHEN event_type = 'error' THEN 0
           WHEN event_type = 'purchase' AND event_id % 3 = 0 THEN 0
           ELSE 1 END AS direction,
      CASE WHEN event_type = 'error' THEN ''
           WHEN event_type = 'signup' THEN 'app/Session-create'
           ELSE 'app/Session' END AS route_name,
      CASE WHEN event_type = 'error' THEN 'e' || event_id
           WHEN event_type = 'purchase' AND event_id % 3 = 0 THEN 'e' || event_id
           WHEN event_type = 'signup' THEN ''
           ELSE 'u' || user_id END AS key
    FROM events ORDER BY event_id"""))

  // R6 egress routing through the REAL Routing.egress: replies → CLIENT,
  // in-flight EventFlow requests → INTERNAL loop (EgressRouter.java:32-63),
  // against an independent SQL restatement.
  private def liftReply(eventType: String): Int = eventType match {
    case "click" => Reply.SuccessfulInvocation
    case "view" => Reply.SuccessfulStateRequest
    case "error" => Reply.Pong
    case "signup" => Reply.SuccessfulCreateClass
    case _ => Reply.SuccessfulInvocation
  }

  private val qEgress = GraftQuery(
    "qr_egress_route",
    (s, dir) => {
      import s.implicits._
      val lifted = Tables.events(s, dir)
        .select(col("event_id"), col("event_type"), col("user_id"))
        .as[(Long, String, Long)]
        .map { case (eid, etype, uid) =>
          val addr = FunctionAddress(FunctionType("app", "Session", stateful = true), s"u$uid")
          val e =
            if (etype == "purchase")
              Event.request(s"e$eid", addr, Request.EventFlow,
                current = Some(EventFlowNode(addr, "INVOKE")))
            else
              Event(s"e$eid", addr, None, Some(liftReply(etype)),
                Array.emptyByteArray, None)
          (eid, Routing.egress(e))
        }
      lifted
        .select(col("_1").as("event_id"),
          col("_2.direction").as("direction"),
          col("_2.routeName").as("route_name"),
          col("_2.key").as("key"),
          col("_2.eventValue.reply").as("reply"))
        .orderBy(col("event_id"))
    },
    Some("""SELECT event_id,
      CASE WHEN event_type = 'purchase' THEN 1 ELSE 2 END AS direction,
      '' AS route_name,
      'e' || event_id AS key,
      CASE WHEN event_type = 'click' THEN 0
           WHEN event_type = 'view' THEN 4
           WHEN event_type = 'error' THEN 6
           WHEN event_type = 'signup' THEN 1
           ELSE NULL END AS reply
    FROM events ORDER BY event_id"""))

  // P1 shape as batch: per-key opaque-state fold — the counter entity's
  // final state per key, computed as a distributed aggregation.
  private val qStateFold = GraftQuery(
    "qr_state_fold",
    (s, dir) => {
      Tables.events(s, dir)
        .filter(col("event_type") === "click")
        .groupBy(concat(lit("u"), col("user_id")).as("key"))
        .agg(count(lit(1)).as("invocations"))
        .orderBy(col("key"))
    },
    Some("""SELECT 'u' || user_id AS key, COUNT(*) AS invocations
    FROM events WHERE event_type = 'click'
    GROUP BY user_id ORDER BY key"""))

  val queries: Seq[GraftQuery] = Seq(qIngress, qEgress, qStateFold)
}
