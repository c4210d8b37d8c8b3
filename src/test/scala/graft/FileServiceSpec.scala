package graft

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.lake.LakeFs
import graft.serving.FileService

/** REST file-management e2e: upload, list, delete over HTTP against a
  * real LakeFs, plus the traversal guard.
  */
class FileServiceSpec extends AnyFunSuite {

  private def withService(f: (FileService, LakeFs, String) => Unit): Unit = {
    val root = Files.createTempDirectory("graft-filesvc").toString
    val fs = LakeFs.local()
    val svc = FileService.start(fs, root)
    try f(svc, fs, root) finally svc.close()
  }

  private val client = HttpClient.newHttpClient()
  private def send(req: HttpRequest): HttpResponse[String] =
    client.send(req, HttpResponse.BodyHandlers.ofString())

  test("upload, list, delete round-trip") {
    withService { (svc, fs, root) =>
      val put = send(HttpRequest.newBuilder(
        URI.create(s"${svc.baseUrl}/files?path=raw/year%3D2024/a.csv"))
        .PUT(HttpRequest.BodyPublishers.ofString("date,total\n2024-01,5"))
        .build())
      assert(put.statusCode() == 201)
      assert(fs.readString(s"$root/raw/year=2024/a.csv").startsWith("date,total"))

      val list = send(HttpRequest.newBuilder(
        URI.create(s"${svc.baseUrl}/files?path=raw")).GET().build())
      assert(list.statusCode() == 200)
      assert(list.body().contains("year=2024/a.csv"))

      val del = send(HttpRequest.newBuilder(
        URI.create(s"${svc.baseUrl}/files?path=raw/year%3D2024/a.csv"))
        .DELETE().build())
      assert(del.statusCode() == 200)
      assert(!fs.exists(s"$root/raw/year=2024/a.csv"))

      val delAgain = send(HttpRequest.newBuilder(
        URI.create(s"${svc.baseUrl}/files?path=raw/year%3D2024/a.csv"))
        .DELETE().build())
      assert(delAgain.statusCode() == 404)
    }
  }

  test("listing an empty or missing dir returns an empty array") {
    withService { (svc, _, _) =>
      val list = send(HttpRequest.newBuilder(
        URI.create(s"${svc.baseUrl}/files?path=nothing/here")).GET().build())
      assert(list.statusCode() == 200)
      assert(list.body() == "[]")
    }
  }

  test("a literal '+' in a file name is addressable (no form-decoding)") {
    withService { (svc, fs, root) =>
      val put = send(HttpRequest.newBuilder(
        URI.create(s"${svc.baseUrl}/files?path=raw/a+b.csv"))
        .PUT(HttpRequest.BodyPublishers.ofString("x")).build())
      assert(put.statusCode() == 201)
      // must land at 'a+b.csv', not 'a b.csv'
      assert(fs.exists(s"$root/raw/a+b.csv"))
      assert(!fs.exists(s"$root/raw/a b.csv"))
      val del = send(HttpRequest.newBuilder(
        URI.create(s"${svc.baseUrl}/files?path=raw/a+b.csv"))
        .DELETE().build())
      assert(del.statusCode() == 200)
      assert(!fs.exists(s"$root/raw/a+b.csv"))
    }
  }

  test("path traversal and absolute paths are rejected") {
    withService { (svc, fs, root) =>
      fs.writeString(s"$root/inside.txt", "in")
      for (bad <- Seq("..%2Fescape.txt", "a%2F..%2F..%2Fescape.txt", "%2Fetc%2Fpasswd", "")) {
        val r = send(HttpRequest.newBuilder(
          URI.create(s"${svc.baseUrl}/files?path=$bad"))
          .PUT(HttpRequest.BodyPublishers.ofString("x")).build())
        assert(r.statusCode() == 400, s"path '$bad' must be rejected")
      }
    }
  }
}
