package graft.graph

import java.nio.file.{Files, Path, Paths}

import graft.SparkSpec
import graft.cli.Cli

/** The CLI command vocabulary end-to-end against a temp registry
  * (reference: the command modules under patterns/cli/commands/):
  * create app/node →
  * upload → list → download round-trip (conflict previews included) →
  * trigger a SQL node on the shared session → update/delete/config.
  */
class CliSpec extends SparkSpec {

  private def withSandbox[T](f: (Path, Path) => T): T = {
    val homeDir = Files.createTempDirectory("graft-cli-home")
    val work = Files.createTempDirectory("graft-cli-work")
    val prevHome = sys.props.get("graft.home")
    sys.props("graft.home") = homeDir.toString
    try f(homeDir, work)
    finally prevHome match {
      case Some(v) => sys.props("graft.home") = v
      case None => sys.props.remove("graft.home")
    }
  }

  private def run(args: String*): Int = Cli.run(args.toArray)

  test("create app + create node write a loadable graph.yml") {
    withSandbox { (_, work) =>
      val app = work.resolve("my-app").toString
      assert(run("create", "app", "--name", "My App", app) == 0)
      assert(run("create", "node", "--app", app, "--type", "table", "docs") == 0)
      assert(run("create", "node", "--app", app,
        s"$app/clean.sql") == 0)
      assert(run("create", "node", "--app", app, "--type", "webhook",
        "events_in") == 0)
      assert(Files.exists(Paths.get(app, "clean.sql")))
      val m = GraphManifest.load(app)
      assert(m.title.contains("My App"))
      assert(m.slug.contains("my-app"))
      assert(m.stores.map(_.name).toSet == Set("docs", "events_in"))
      assert(m.functions.exists(f => f.kind == "sql" &&
        f.nodeFile.contains("clean.sql") && f.id.exists(_.length == 8)))
      assert(m.functions.exists(f => f.kind == "webhook" &&
        f.webhook.contains("events_in")))
      // duplicate node file refuses
      assert(run("create", "node", "--app", app, s"$app/clean.sql") == 1)
      // unknown extension refuses
      assert(run("create", "node", "--app", app, s"$app/bad.py") == 1)
    }
  }

  test("upload / list / download round-trip with conflict previews") {
    withSandbox { (_, work) =>
      val app = work.resolve("rt-app").toString
      run("create", "app", "--name", "rt-app", app)
      run("create", "node", "--app", app, "--type", "table", "t1")
      assert(run("upload", app) == 0)
      // registry has v1 and the app lists
      val reg = Files.walk(Paths.get(sys.props("graft.home"), "registry"))
      val entries = try {
        import scala.jdk.CollectionConverters._
        reg.iterator().asScala.map(_.getFileName.toString).toSet
      } finally reg.close()
      assert(entries.contains("v1.zip") && entries.contains("meta.json"))
      // unchanged re-upload is clean (no diff) and bumps the version
      assert(run("upload", app) == 0)
      // a local edit makes the NEXT upload preview a conflict...
      Files.writeString(Paths.get(app, "notes.txt"), "hello\n")
      assert(run("upload", app) == 1)
      // ...which --force overrides
      assert(run("upload", "--force", app) == 0)

      // download into a fresh dir reproduces the files
      val clone = work.resolve("clone").toString
      assert(run("download", "rt-app", clone) == 0)
      assert(Files.readString(Paths.get(clone, "notes.txt")) == "hello\n")
      assert(GraphManifest.load(clone).stores.exists(_.name == "t1"))
      // a locally-changed clone refuses a plain download, takes --force
      Files.writeString(Paths.get(clone, "notes.txt"), "local edit\n")
      assert(run("download", "rt-app", clone) == 1)
      assert(run("download", "--force", "rt-app", clone) == 0)
      assert(Files.readString(Paths.get(clone, "notes.txt")) == "hello\n")
    }
  }

  test("trigger runs a SQL node end-to-end on the shared session") {
    withSandbox { (_, work) =>
      val app = work.resolve("sqlapp")
      run("create", "app", "--name", "sqlapp", app.toString)
      Files.writeString(app.resolve("gen.sql"),
        "select 7 as answer\n")
      GraphConfigEditor(app.resolve("graph.yml"))
        .addTable("out_t")
        .addNode("gen.sql", outputs = Seq("result" -> "out_t"), id = "gennode01")
        .write()
      assert(run("trigger", "--app", app.toString,
        "--node-id", "gennode01") == 0)
      // the node's output landed in the app warehouse
      val runner = new GraphRunner(spark, GraphManifest.load(app.toString),
        app.resolve(".graft-warehouse").toString)
      val out = runner.tableHandle("out_t").read.collect()
      assert(out.map(_.getInt(0)).toSeq == Seq(7))
      // trigger by node PATH resolves through the manifest too
      assert(run("trigger", "--app", app.toString,
        app.resolve("gen.sql").toString) == 0)
      // bad arguments abort
      assert(run("trigger", "--app", app.toString) == 1)
    }
  }

  test("update app --public, list --json, delete, config") {
    withSandbox { (home, work) =>
      val app = work.resolve("meta-app").toString
      run("create", "app", "--name", "meta-app", app)
      run("upload", app)
      assert(run("update", "app", "--public", "meta-app") == 0)
      assert(Files.readString(
        Paths.get(home.toString, "registry", "local", "meta-app", "meta.json"))
        .contains(""""public": true"""))
      assert(run("list", "apps") == 0)
      assert(run("list", "apps", "--json") == 0)
      // delete requires --force, then removes the registry entry
      assert(run("delete", "meta-app") == 1)
      assert(run("delete", "--force", "meta-app") == 0)
      assert(!Files.exists(
        Paths.get(home.toString, "registry", "local", "meta-app")))
      // config set + read round-trips the default organization
      assert(run("config", "--organization", "acme") == 0)
      assert(Files.readString(home.resolve("config.json"))
        .contains(""""organization": "acme""""))
      // unknown command is an error
      assert(run("frobnicate") == 1)
    }
  }

  test("edge cases: slug fallback, re-download to nested dir, org scoping") {
    withSandbox { (_, work) =>
      // an app whose graph.yml has NO slug/title falls back to the
      // directory name as its slug
      val bare = work.resolve("bare-dir")
      Files.createDirectories(bare)
      Files.writeString(bare.resolve("graph.yml"), "functions: []\n")
      assert(run("upload", bare.toString) == 0)
      assert(Files.exists(Paths.get(sys.props("graft.home"),
        "registry", "local", "bare-dir", "v1.zip")))
      // a different organization is a disjoint namespace
      assert(run("upload", "-o", "acme", bare.toString) == 0)
      assert(Files.exists(Paths.get(sys.props("graft.home"),
        "registry", "acme", "bare-dir", "v1.zip")))
      assert(run("download", "-o", "acme", "bare-dir",
        work.resolve("a/b/clone").toString) == 0)
      assert(Files.exists(work.resolve("a/b/clone/graph.yml")))
      // downloading an app that only exists in another org fails
      assert(run("download", "-o", "nosuch", "bare-dir",
        work.resolve("x").toString) == 1)
    }
  }

  test("uploaded versions serve as components: uses: resolves from the registry") {
    withSandbox { (home, work) =>
      // publish a tiny component app: one SQL node writing its output
      val comp = work.resolve("comp-app")
      run("create", "app", "--name", "comp-app", comp.toString)
      Files.writeString(comp.resolve("gen.sql"), "select 1 as one\n")
      GraphConfigEditor(comp.resolve("graph.yml"))
        .addTable("c_out")
        .addNode("gen.sql", outputs = Seq("result" -> "c_out"))
        .write()
      assert(run("upload", "--publish-component", comp.toString) == 0)
      // the version zip is resolvable through the component resolver
      // under the SAME org/slug@version key upload printed
      val resolver = Packaging.componentResolverFromZips(
        home.resolve("registry").toString)
      val resolved = resolver("local/comp-app@v1")
      assert(resolved.isDefined)
      assert(resolved.get.functions.exists(_.nodeFile.contains("gen.sql")))
    }
  }
}
