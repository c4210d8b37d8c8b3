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

  test("https round-trip with a generated self-signed cert") {
    // keytool is the JDK twin of the reference's generate_cert.sh:
    // self-signed RSA key pair for CN=localhost in a PKCS12 keystore
    val dir = Files.createTempDirectory("graft-tls").toString
    val ks = s"$dir/server.p12"
    val pass = "graft-test-pass"
    val keytool = new ProcessBuilder(
      s"${System.getProperty("java.home")}/bin/keytool",
      "-genkeypair", "-alias", "server", "-keyalg", "RSA", "-keysize", "2048",
      "-storetype", "PKCS12", "-keystore", ks, "-storepass", pass,
      "-dname", "CN=localhost", "-validity", "365",
      "-ext", "SAN=dns:localhost,ip:127.0.0.1")
      .redirectErrorStream(true).start()
    assert(keytool.waitFor() == 0, "keytool keystore generation failed")

    val root = Files.createTempDirectory("graft-filesvc-tls").toString
    val fs = LakeFs.local()
    val svc = FileService.startTls(fs, root, ks, pass)
    try {
      assert(svc.baseUrl.startsWith("https://"))
      // client trusts exactly the generated cert (the keystore doubles
      // as the truststore — self-signed)
      val trust = javax.net.ssl.TrustManagerFactory.getInstance(
        javax.net.ssl.TrustManagerFactory.getDefaultAlgorithm)
      val store = java.security.KeyStore.getInstance("PKCS12")
      val in = new java.io.FileInputStream(ks)
      try store.load(in, pass.toCharArray) finally in.close()
      trust.init(store)
      val ctx = javax.net.ssl.SSLContext.getInstance("TLS")
      ctx.init(null, trust.getTrustManagers, null)
      val tlsClient = HttpClient.newBuilder().sslContext(ctx).build()
      def tsend(req: HttpRequest) =
        tlsClient.send(req, HttpResponse.BodyHandlers.ofString())

      val put = tsend(HttpRequest.newBuilder(
        URI.create(s"${svc.baseUrl}/files?path=raw/secure.csv"))
        .PUT(HttpRequest.BodyPublishers.ofString("k,v\n1,2")).build())
      assert(put.statusCode() == 201)
      assert(fs.readString(s"$root/raw/secure.csv") == "k,v\n1,2")
      val list = tsend(HttpRequest.newBuilder(
        URI.create(s"${svc.baseUrl}/files?path=raw")).GET().build())
      assert(list.statusCode() == 200 && list.body().contains("secure.csv"))
      val del = tsend(HttpRequest.newBuilder(
        URI.create(s"${svc.baseUrl}/files?path=raw/secure.csv"))
        .DELETE().build())
      assert(del.statusCode() == 200 && !fs.exists(s"$root/raw/secure.csv"))

      // an untrusting client must fail the handshake — the cert is real
      intercept[javax.net.ssl.SSLHandshakeException] {
        client.send(HttpRequest.newBuilder(
          URI.create(s"${svc.baseUrl}/files?path=raw")).GET().build(),
          HttpResponse.BodyHandlers.ofString())
      }
    } finally svc.close()
  }

  test("startTls without a keystore is refused up front") {
    val fs = LakeFs.local()
    val root = Files.createTempDirectory("graft-filesvc-nok").toString
    intercept[IllegalArgumentException] {
      FileService.startTls(fs, root, keystorePath = "", keystorePassword = "")
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
