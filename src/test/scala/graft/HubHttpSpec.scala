package graft

import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
import graft.project.ProjectLoader
import org.scalatest.funsuite.AnyFunSuite

import java.net.InetSocketAddress
import java.nio.file.{Files, Path}
import scala.sys.process._

/** HTTP hub registry resolution (reference: hub_client.rs — `GET
  * {base}/api/v1/{org}/{name}.json`, versions map with
  * `downloads.tarball`, one redirectnamespace/redirectname hop). Backed
  * by a local stub server; `GRAFT_HUB_URL`/`-Dgraft.hub.url` stays off by
  * default in this zero-egress sandbox. */
class HubHttpSpec extends AnyFunSuite {

  private def write(dir: Path, rel: String, content: String): Unit = {
    val p = dir.resolve(rel)
    Files.createDirectories(p.getParent)
    Files.writeString(p, content)
  }

  private def tarballFor(name: String, v: String): Array[Byte] = {
    val src = Files.createTempDirectory("graft_hubhttp_src")
    val top = src.resolve(s"$name-$v")
    write(top, "dbt_project.yml", s"name: $name\nmodel-paths: [\"models\"]\n")
    write(top, "models/${name}_version.sql".replace("${name}", name),
      s"select '$v' as v\n")
    val out = src.resolve("pkg.tar.gz")
    assert(Process(Seq("tar", "czf", out.toString, "-C", src.toString,
      s"$name-$v")).! == 0)
    Files.readAllBytes(out)
  }

  /** Stub hub: /api/v1/acme/widgets.json (1.0.0, 1.4.0, 2.0.0-rc.1),
    * /api/v1/acme/oldname.json redirecting to acme/widgets, and tarball
    * downloads under /dl/. Counts downloads to assert caching. */
  private lazy val (server, baseUrl, downloadCount) = {
    val srv = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    val counter = new java.util.concurrent.atomic.AtomicInteger(0)
    val versions = Seq("1.0.0", "1.4.0", "2.0.0-rc.1")
    val tarballs = versions.map(v => v -> tarballFor("widgets", v)).toMap
    val base = s"http://127.0.0.1:${srv.getAddress.getPort}"
    def respond(ex: HttpExchange, code: Int, body: Array[Byte]): Unit = {
      ex.sendResponseHeaders(code, body.length)
      ex.getResponseBody.write(body)
      ex.close()
    }
    srv.createContext("/api/v1/acme/widgets.json", new HttpHandler {
      override def handle(ex: HttpExchange): Unit = {
        val vs = versions.map(v =>
          s""""$v": {"name": "widgets", "downloads": {"tarball": "$base/dl/$v.tar.gz"}}""")
          .mkString(",")
        respond(ex, 200,
          s"""{"name": "widgets", "versions": {$vs}}""".getBytes("UTF-8"))
      }
    })
    srv.createContext("/api/v1/acme/oldname.json", new HttpHandler {
      override def handle(ex: HttpExchange): Unit = respond(ex, 200,
        """{"name": "oldname", "versions": {},
          | "redirectnamespace": "acme", "redirectname": "widgets"}"""
          .stripMargin.getBytes("UTF-8"))
    })
    srv.createContext("/api/v1/acme/renamed.json", new HttpHandler {
      // same-org rename: the hub emits redirectnamespace as JSON null
      override def handle(ex: HttpExchange): Unit = respond(ex, 200,
        """{"name": "renamed", "versions": {},
          | "redirectnamespace": null, "redirectname": "widgets"}"""
          .stripMargin.getBytes("UTF-8"))
    })
    srv.createContext("/dl/", new HttpHandler {
      override def handle(ex: HttpExchange): Unit = {
        counter.incrementAndGet()
        val v = ex.getRequestURI.getPath.stripPrefix("/dl/").stripSuffix(".tar.gz")
        tarballs.get(v) match {
          case Some(bytes) => respond(ex, 200, bytes)
          case None => respond(ex, 404, "not found".getBytes)
        }
      }
    })
    srv.start()
    (srv, base, counter)
  }

  private def withHub[T](f: => T): T = {
    sys.props("graft.hub.url") = baseUrl
    try f finally sys.props.remove("graft.hub.url")
  }

  test("registry resolution picks the newest non-prerelease and extracts the tarball") {
    withHub {
      val (root, chosen) = ProjectLoader.resolveHubPackage("acme/widgets", None)
      assert(chosen == "1.4.0")
      assert(Files.exists(root.resolve("dbt_project.yml")))
      assert(Files.readString(root.resolve("models/widgets_version.sql"))
        .contains("1.4.0"))
    }
  }

  test("comparator specs and install-prerelease apply over registry versions") {
    withHub {
      assert(ProjectLoader.resolveHubPackage("acme/widgets",
        Some(Seq(">=1.0.0", "<1.1.0")))._2 == "1.0.0")
      assert(ProjectLoader.resolveHubPackage("acme/widgets", Some(">=1.0.0"),
        installPrerelease = true)._2 == "2.0.0-rc.1")
      val e = intercept[IllegalArgumentException](
        ProjectLoader.resolveHubPackage("acme/widgets", Some(">=9.0.0")))
      assert(e.getMessage.contains("no version in registry"), e.getMessage)
    }
  }

  test("one redirectnamespace/redirectname hop is followed") {
    withHub {
      val (_, chosen) = ProjectLoader.resolveHubPackage("acme/oldname", None)
      assert(chosen == "1.4.0")
      // same-org rename: redirectnamespace arrives as JSON null
      assert(ProjectLoader.resolveHubPackage("acme/renamed", None)._2 == "1.4.0")
    }
  }

  test("downloads cache per (base, pkg, version); URL wins over mirror") {
    withHub {
      ProjectLoader.resolveHubPackage("acme/widgets", Some("1.0.0"))
      val afterFirst = downloadCount.get()
      ProjectLoader.resolveHubPackage("acme/widgets", Some("1.0.0"))
      assert(downloadCount.get() == afterFirst) // second resolve hits the cache
      // a configured mirror dir is ignored while the URL is set: this pkg
      // does not exist in the (empty) mirror yet still resolves over HTTP
      val emptyMirror = Files.createTempDirectory("graft_empty_mirror")
      sys.props("graft.hub.dir") = emptyMirror.toString
      try assert(ProjectLoader.resolveHubPackage("acme/widgets", None)._2 == "1.4.0")
      finally sys.props.remove("graft.hub.dir")
    }
  }

  test("missing package and server errors fail loudly") {
    withHub {
      val e = intercept[IllegalArgumentException](
        ProjectLoader.resolveHubPackage("acme/nope", None))
      assert(e.getMessage.contains("HTTP 404"), e.getMessage)
    }
  }

  test("a hub-kind packages.yml entry resolves through the registry end-to-end") {
    withHub {
      val proj = Files.createTempDirectory("graft_hubhttp_root")
      write(proj, "dbt_project.yml", "name: webroot\nmodel-paths: [\"models\"]\n")
      write(proj, "packages.yml",
        """packages:
          |  - package: acme/widgets
          |    version: ">=1.0.0"
          |""".stripMargin)
      val loaded = ProjectLoader.load(proj.toString)
      assert(loaded.packages.map(_.name) == Seq("widgets"))
      assert(loaded.packages.head.models("widgets_version").contains("1.4.0"))
    }
  }
}
