package graft.exec

import java.net.InetSocketAddress
import java.nio.ByteBuffer
import java.util.concurrent.atomic.AtomicReference

import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.model._

/** The Lambda-Invoke-API adapter against an in-JVM Lambda-shaped stub
  * server (the Runtime-Interface-Emulator shape): asserts the public REST
  * contract — path, method, invocation-type header, envelope round-trip —
  * and the Invoke API's error surface (X-Amz-Function-Error, non-2xx).
  */
class LambdaInvokeSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var server: HttpServer = _
  private var port: Int = _
  // captured per-request so tests can assert the wire contract
  private val lastPath = new AtomicReference[String]("")
  private val lastMethod = new AtomicReference[String]("")
  private val lastInvocationType = new AtomicReference[String]("")
  @volatile private var failMode: String = "" // "", "fn-error", "http-500"

  override def beforeAll(): Unit = {
    server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    val entity = new LocalCounterExecutor
    server.createContext("/", new HttpHandler {
      override def handle(ex: HttpExchange): Unit = {
        lastPath.set(ex.getRequestURI.toString)
        lastMethod.set(ex.getRequestMethod)
        lastInvocationType.set(
          Option(ex.getRequestHeaders.getFirst("X-Amz-Invocation-Type")).getOrElse(""))
        val body = new String(ex.getRequestBody.readAllBytes(), "UTF-8")
        failMode match {
          case "http-500" =>
            val msg = """{"message": "boom"}""".getBytes("UTF-8")
            ex.sendResponseHeaders(500, msg.length.toLong)
            ex.getResponseBody.write(msg)
          case "fn-error" =>
            // 200 + X-Amz-Function-Error is how the Invoke API reports a
            // function-side exception
            val msg = """{"errorMessage": "entity crashed"}""".getBytes("UTF-8")
            ex.getResponseHeaders.add("X-Amz-Function-Error", "Unhandled")
            ex.sendResponseHeaders(200, msg.length.toLong)
            ex.getResponseBody.write(msg)
          case _ =>
            val reply = LambdaEnvelope.encodeReply(
              entity.invoke(LambdaEnvelope.decode(body))).getBytes("UTF-8")
            ex.getResponseHeaders.add("Content-Type", "application/json")
            ex.sendResponseHeaders(200, reply.length.toLong)
            ex.getResponseBody.write(reply)
        }
        ex.close()
      }
    })
    server.start()
    port = server.getAddress.getPort
  }

  override def afterAll(): Unit = server.stop(0)

  private def executor(name: String = "counter", qualifier: Option[String] = None) =
    new LambdaInvokeExecutor(s"http://127.0.0.1:$port", name, qualifier)

  private def delta(v: Long) = ByteBuffer.allocate(8).putLong(v).array()

  test("invoke path, method, and headers match the public Lambda Invoke API") {
    failMode = ""
    val acct = FunctionAddress(FunctionType("global", "Account", stateful = true), "k1")
    val rr = EventRequestReply(
      Event.request("l1", acct, Request.InvokeStateful, delta(3)), Array.emptyByteArray, "op")
    executor().invoke(rr)
    assert(lastPath.get == "/2015-03-31/functions/counter/invocations", lastPath.get)
    assert(lastMethod.get == "POST")
    assert(lastInvocationType.get == "RequestResponse")
  }

  test("qualifier surfaces as the Qualifier query parameter") {
    failMode = ""
    val acct = FunctionAddress(FunctionType("global", "Account", stateful = true), "k1")
    val rr = EventRequestReply(
      Event.request("l2", acct, Request.GetState), Array.emptyByteArray, "op")
    executor(qualifier = Some("prod")).invoke(rr)
    assert(lastPath.get == "/2015-03-31/functions/counter/invocations?Qualifier=prod",
      lastPath.get)
  }

  test("stateful entity round-trip through the Lambda wire shape") {
    failMode = ""
    val ex = executor()
    val acct = FunctionAddress(FunctionType("global", "Account", stateful = true), "k9")
    val r1 = ex.invoke(EventRequestReply(
      Event.request("l3", acct, Request.InvokeStateful, delta(4)),
      Array.emptyByteArray, "op"))
    assert(r1.event.reply.contains(Reply.SuccessfulInvocation))
    // feed returned state back in — the engine's wholesale-overwrite contract
    val r2 = ex.invoke(EventRequestReply(
      Event.request("l4", acct, Request.InvokeStateful, delta(5)), r1.state, "op"))
    assert(ByteBuffer.wrap(r2.state).getLong == 9L,
      "state did not accumulate across Lambda invocations")
  }

  test("X-Amz-Function-Error on a 200 fails the call") {
    failMode = "fn-error"
    val acct = FunctionAddress(FunctionType("global", "Account", stateful = true), "k1")
    val rr = EventRequestReply(
      Event.request("l5", acct, Request.GetState), Array.emptyByteArray, "op")
    val err = intercept[RuntimeException](executor().invoke(rr))
    assert(err.getMessage.contains("Unhandled"), err.getMessage)
  }

  test("non-2xx status fails the call") {
    failMode = "http-500"
    val acct = FunctionAddress(FunctionType("global", "Account", stateful = true), "k1")
    val rr = EventRequestReply(
      Event.request("l6", acct, Request.GetState), Array.emptyByteArray, "op")
    val err = intercept[RuntimeException](executor().invoke(rr))
    assert(err.getMessage.contains("500"), err.getMessage)
  }
}
