package graft.nvd

import java.nio.file.{Files, NoSuchFileException, Path}

import com.fasterxml.jackson.databind.ObjectMapper

/** Reference-parity database configuration. The reference reads its
  * MySQL credentials from a JSON config file and, when that file is
  * missing, falls back to a sibling `config.json.template`
  * (nvd2mysqlloader.py:138-148, config.json.template:1-7). Shape:
  *
  * {{{
  * { "about":   "...optional banner...",
  *   "dbname":  "nvd",
  *   "dba":     "user",
  *   "password":"secret",
  *   "host":    "localhost" }
  * }}}
  *
  * One documented extension: an optional `"url"` key overrides the
  * derived `jdbc:mysql://host/dbname` URL so non-MySQL JDBC targets
  * (the tests drive embedded Derby) reuse the same config path; the
  * reference is MySQL-only so the key is simply absent in its files.
  */
object NvdConfig {

  final case class Db(
      dbname: String,
      dba: String,
      password: String,
      host: String,
      url: Option[String] = None) {

    /** The sink configuration this config resolves to. The dialect
      * follows the URL scheme (the reference's single dialect is
      * MySQL; Derby is the embeddable stand-in the specs use). */
    def jdbcConf: MySqlSink.Conf = {
      val resolved = url.getOrElse(
        s"jdbc:mysql://$host/$dbname?characterEncoding=utf8mb4&rewriteBatchedStatements=true")
      MySqlSink.Conf(
        url = resolved,
        user = dba,
        password = password,
        driverClass =
          if (resolved.startsWith("jdbc:derby")) "org.apache.derby.jdbc.EmbeddedDriver"
          else "com.mysql.cj.jdbc.Driver",
        dialect =
          if (resolved.startsWith("jdbc:derby")) MySqlSink.DerbyDialect
          else MySqlSink.MySqlDialect)
    }
  }

  /** Read `path`; when it does not exist, fall back to
    * `config.json.template` in the same directory — the reference's
    * exact FileNotFoundError fallback. A file that exists but fails to
    * parse is a loud error on BOTH paths (silently falling back from a
    * malformed real config to placeholder credentials would be worse
    * than failing). */
  def load(path: Path): Db = {
    val text =
      try Files.readString(path)
      catch {
        case _: NoSuchFileException =>
          val fallback = Option(path.getParent) match {
            case Some(dir) => dir.resolve("config.json.template")
            case None      => Path.of("config.json.template")
          }
          Files.readString(fallback)
      }
    parse(text)
  }

  /** Parse the config JSON body (exposed for specs). */
  def parse(text: String): Db = {
    val root = new ObjectMapper().readTree(text)
    def req(k: String): String = {
      val n = root.get(k)
      require(n != null && !n.isNull, s"config.json missing required key '$k'")
      n.asText()
    }
    Db(
      dbname = req("dbname"),
      dba = req("dba"),
      password = req("password"),
      host = req("host"),
      url = Option(root.get("url")).filterNot(_.isNull).map(_.asText()))
  }
}
