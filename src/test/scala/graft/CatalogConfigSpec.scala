package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.catalog.{CatalogConfig, SqlCatalog}

/** Named-catalog config resolution (reference config/config.go ParseConfig:
  * explicit name → default-catalog → "default").
  */
class CatalogConfigSpec extends AnyFunSuite {

  private val sample =
    """# fleet catalogs
      |default-catalog: prod
      |max-workers: 5            # accepted, ignored
      |catalog:
      |  prod:
      |    uri: "sql:jdbc:derby:memory:cfgp;create=true|/tmp/prod-wh"
      |    warehouse: /tmp/prod-wh
      |  scratch:
      |    type: hadoop
      |    warehouse: /tmp/scratch-wh
      |""".stripMargin

  test("parse: sections, comments, quotes, per-catalog props") {
    val cfg = CatalogConfig.parse(sample)
    assert(cfg.defaultCatalog === Some("prod"))
    assert(cfg.catalogs.keySet === Set("prod", "scratch"))
    assert(cfg.catalogs("prod").uri.startsWith("sql:jdbc:derby:"))
    assert(cfg.catalogs("prod").props("warehouse") === "/tmp/prod-wh")
    // no uri: falls back to type+warehouse
    assert(cfg.catalogs("scratch").uri === "hadoop:/tmp/scratch-wh")
  }

  test("resolution chain: explicit name, then default-catalog, then 'default'") {
    val cfg = CatalogConfig.parse(sample)
    assert(cfg.resolve(Some("scratch")).map(_.name) === Some("scratch"))
    assert(cfg.resolve(None).map(_.name) === Some("prod")) // default-catalog
    val noDefault = CatalogConfig.parse(
      "catalog:\n  default:\n    uri: hadoop:/tmp/d\n  other:\n    uri: hadoop:/tmp/o\n")
    assert(noDefault.resolve(None).map(_.name) === Some("default"))
    assert(cfg.resolve(Some("nope")) === None)
  }

  test("open() feeds the URI registry; bad shapes fail loudly") {
    val wh = Files.createTempDirectory("cfg-open").toString
    val cfg = CatalogConfig.parse(
      s"catalog:\n  c:\n    uri: sql:jdbc:derby:memory:cfg_open;create=true|$wh\n")
    assert(cfg.resolve(Some("c")).get.open().isInstanceOf[SqlCatalog])
    intercept[IllegalArgumentException](
      CatalogConfig.parse("catalog:\n  c:\n    uri: hadoop:/x\n").catalogs("c").copy(props = Map.empty).uri)
    intercept[IllegalArgumentException](CatalogConfig.parse("catalog:\n  broken\n"))
    intercept[IllegalArgumentException](
      CatalogConfig.load(Some("/no/such/config.yaml")))
  }

  test("missing implicit config is empty, explicit file loads") {
    val f = Files.createTempFile("graft-cfg", ".yaml")
    Files.writeString(f, sample)
    assert(CatalogConfig.load(Some(f.toString)).defaultCatalog === Some("prod"))
  }
}
