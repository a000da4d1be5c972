package graft.sources

import org.scalatest.funsuite.AnyFunSuite
import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
import graft.TestSpark

/** End-to-end S5: a JDK-built-in HTTP server serves a JSON array; the
  * fetch adapter must turn it into rows and honor/flag auth.
  */
class IngestHttpSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def withServer(test: (String, () => Option[String]) => Unit): Unit = {
    val server = HttpServer.create(new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    @volatile var lastAuth: Option[String] = None
    server.createContext("/rows", new HttpHandler {
      override def handle(x: HttpExchange): Unit = {
        lastAuth = Option(x.getRequestHeaders.getFirst("Authorization"))
        val body =
          """[{"sale_id": 1, "amount": 10.5}, {"sale_id": 2, "amount": 7.25}]"""
            .getBytes("UTF-8")
        x.sendResponseHeaders(200, body.length)
        x.getResponseBody.write(body); x.close()
      }
    })
    server.createContext("/boom", new HttpHandler {
      override def handle(x: HttpExchange): Unit = {
        x.sendResponseHeaders(500, -1); x.close()
      }
    })
    server.start()
    try test(s"http://127.0.0.1:${server.getAddress.getPort}", () => lastAuth)
    finally server.stop(0)
  }

  test("fetchJson turns a REST array payload into rows") {
    withServer { (base, _) =>
      val df = Ingest.fetchJson(spark, s"$base/rows")
      assert(df.count() == 2)
      assert(df.columns.sorted.toSeq == Seq("amount", "sale_id"))
      val amounts = df.collect().map(_.getAs[Double]("amount")).sorted
      assert(amounts.toSeq == Seq(7.25, 10.5))
    }
  }

  test("fetchJson sends the bearer token when given one") {
    withServer { (base, lastAuth) =>
      Ingest.fetchJson(spark, s"$base/rows", bearerToken = Some("tok123"))
        .count()
      assert(lastAuth() == Some("Bearer tok123"))
      Ingest.fetchJson(spark, s"$base/rows").count()
      assert(lastAuth().isEmpty, "no header without a token")
    }
  }

  test("non-2xx responses fail fast") {
    withServer { (base, _) =>
      assertThrows[IllegalArgumentException] {
        Ingest.fetchJson(spark, s"$base/boom")
      }
    }
  }
}
