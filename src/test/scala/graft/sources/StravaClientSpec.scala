package graft.sources

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.sources.StravaClient._

/** The REST/OAuth fetch layer against a FAKE transport: token
  * exchange/refresh (incl. the C4 explicit-failure deviation from the
  * reference's silent empty strings), the C3 expiry-margin decision,
  * the paged incremental activity fetch with the `after` watermark
  * pushed into the request, and the per-key stream assembly quirks
  * (null-padding to original_size, time_key/original synthesis, the
  * latlng endpoint trim) — strava_sdk.py:21-181 behaviors, no network.
  */
class StravaClientSpec extends AnyFunSuite {

  /** Canned-response transport that records every request. */
  class FakeTransport(routes: PartialFunction[(String, String, Map[String, String]), HttpResponse])
      extends HttpTransport {
    val calls = scala.collection.mutable.ListBuffer
      .empty[(String, String, Map[String, String], Map[String, String])]
    def execute(method: String, url: String, params: Map[String, String],
                headers: Map[String, String]): HttpResponse = {
      calls += ((method, url, params, headers))
      routes.lift((method, url, params))
        .getOrElse(HttpResponse(404, """{"message":"not found"}"""))
    }
  }

  private def client(t: HttpTransport) =
    new StravaClient(t, "cid", "csec", baseUrl = "http://api.test/v3",
      oauthUrl = "http://api.test/oauth")

  test("authorization-code exchange parses the token triple") {
    val t = new FakeTransport({
      case ("POST", "http://api.test/oauth/token", p)
          if p.get("grant_type").contains("authorization_code")
            && p.get("code").contains("abc")
            && p.get("client_id").contains("cid")
            && p.get("client_secret").contains("csec") =>
        HttpResponse(200,
          """{"token_type":"Bearer","access_token":"at1",
            |"refresh_token":"rt1","expires_at":1700003600}""".stripMargin)
    })
    assert(client(t).tokensWithCode("abc")
      .contains(TokenSet("at1", "rt1", 1700003600L)))
  }

  test("refresh failure is None, not silent empty tokens (C4 deviation)") {
    val t = new FakeTransport({
      case ("POST", "http://api.test/oauth/token", p)
          if p.get("refresh_token").contains("good") =>
        HttpResponse(200,
          """{"access_token":"at2","refresh_token":"rt2","expires_at":99}""")
      case ("POST", "http://api.test/oauth/token", _) =>
        HttpResponse(400, """{"message":"Bad Request"}""")
    })
    val c = client(t)
    assert(c.tokensWithRefresh("good").contains(TokenSet("at2", "rt2", 99L)))
    assert(c.tokensWithRefresh("revoked").isEmpty)
    // reference behavior at strava_sdk.py:44-50 would be ('', '', 0)
  }

  test("withFreshTokens refreshes only inside the expiry margin (C3)") {
    val t = new FakeTransport({
      case ("POST", "http://api.test/oauth/token", p)
          if p.get("grant_type").contains("refresh_token") =>
        HttpResponse(200,
          """{"access_token":"new","refresh_token":"newr","expires_at":2000000}""")
    })
    val c = client(t)
    val fresh = TokenSet("a", "r", 1000000L)
    // 2h from expiry at default 1h margin: kept, NO network call
    assert(c.withFreshTokens(fresh, nowEpoch = 1000000L - 7200)
      .contains(fresh))
    assert(t.calls.isEmpty)
    // 30min from expiry: refreshed through the transport
    assert(c.withFreshTokens(fresh, nowEpoch = 1000000L - 1800)
      .contains(TokenSet("new", "newr", 2000000L)))
    assert(t.calls.size == 1)
  }

  test("paged activity fetch pushes the after-watermark and stops on a short page") {
    def act(id: Long) = s"""{"id":$id,"name":"ride $id"}"""
    val t = new FakeTransport({
      case ("GET", "http://api.test/v3/athlete/activities", p)
          if p.get("page").contains("1") =>
        HttpResponse(200, s"[${act(1)},${act(2)}]")
      case ("GET", "http://api.test/v3/athlete/activities", p)
          if p.get("page").contains("2") =>
        HttpResponse(200, s"[${act(3)}]") // short page -> stop
    })
    val docs = client(t).activitiesAfter("tok", after = 1696000000L, perPage = 2)
    assert(docs == Seq("""{"id":1,"name":"ride 1"}""",
      """{"id":2,"name":"ride 2"}""", """{"id":3,"name":"ride 3"}"""))
    assert(t.calls.size == 2)
    // every request carried the watermark + bearer token
    assert(t.calls.forall(_._3.get("after").contains("1696000000")))
    assert(t.calls.forall(_._4.get("Authorization").contains("Bearer tok")))
  }

  test("stream assembly: null-padding, time_key/original, latlng endpoint trim") {
    def streamResp(key: String, data: String, size: Int) =
      s"""[{"type":"$key","data":$data,"series_type":"time",
         |"original_size":$size,"resolution":"high"}]""".stripMargin
    val t = new FakeTransport({
      case ("GET", "http://api.test/v3/activities/7/streams", p)
          if p.get("keys").contains("time") =>
        HttpResponse(200, streamResp("time", "[0,1,2,3]", 4))
      case ("GET", "http://api.test/v3/activities/7/streams", p)
          if p.get("keys").contains("latlng") =>
        HttpResponse(200,
          streamResp("latlng", "[[1.0,2.0],[3.0,4.0],[5.0,6.0],[7.0,8.0]]", 4))
      case ("GET", "http://api.test/v3/activities/7/streams", p)
          if p.get("keys").contains("heartrate") =>
        HttpResponse(200, streamResp("heartrate", "[90,95,100,105]", 4))
      case ("GET", "http://api.test/v3/activities/7/streams", p)
          if p.get("keys").contains("watts") =>
        // the missing-channel shape: the API answers with a DIFFERENT
        // stream type only (strava_sdk.py:150-156 null-pads from
        // original_size)
        HttpResponse(200, streamResp("distance", "[0.0,5.0,10.0,15.0]", 4))
      case ("GET", "http://api.test/v3/activities/7/streams", _) =>
        HttpResponse(404, """{"message":"no such stream"}""")
    })
    val doc = client(t).activityStreamsDoc("tok", 7L).get
    assert(doc.contains(""""activity_id":7"""))
    assert(doc.contains(""""time":[0,1,2,3]"""))
    assert(doc.contains(""""time_key":[0,1,2,3]"""))
    assert(doc.contains(""""original":[true,true,true,true]"""))
    assert(doc.contains(""""heartrate":[90,95,100,105]"""))
    // watts was absent from its response -> null-padded to size 4
    assert(doc.contains(""""watts":[null,null,null,null]"""))
    // privacy trim: first/last latlng nulled, interior kept
    assert(doc.contains(""""latlng":[null,[3.0,4.0],[5.0,6.0],null]"""))

    // and the document round-trips through the SAME pivot the
    // file-backed source uses
    val spark = TestSpark.spark
    import spark.implicits._
    val frame = StravaJsonSource.pivotStreams(
      spark.read.schema(graft.etl.StravaSchemas.streamDictSchema)
        .json(Seq(doc).toDS()))
    val rows = frame.orderBy("time").collect()
    assert(rows.length == 4)
    assert(rows.map(_.getAs[Double]("heartrate")).toSeq == Seq(90.0, 95.0, 100.0, 105.0))
    assert(rows.forall(_.isNullAt(rows.head.fieldIndex("watts"))))
    assert(rows.head.isNullAt(rows.head.fieldIndex("latlng"))
      && rows.last.isNullAt(rows.head.fieldIndex("latlng")))
    assert(rows(1).getAs[scala.collection.Seq[Double]]("latlng").toSeq == Seq(3.0, 4.0))
  }

  test("polyline lookup reads map.polyline per activity") {
    val t = new FakeTransport({
      case ("GET", "http://api.test/v3/activities/5", _) =>
        HttpResponse(200,
          """{"id":5,"map":{"id":"a5","polyline":"abc_~def","summary_polyline":"x"}}""")
      case ("GET", "http://api.test/v3/activities/6", _) =>
        HttpResponse(404, "{}")
    })
    assert(client(t).activityPolylines("tok", Seq(5L, 6L)) == Seq(5L -> "abc_~def"))
  }
}
