package graft.streaming

/** The reference's in-dev credentials roadmap (`README.md:64`:
  * "Reading credentials from AWS Secrets Manager, AWS Parameters
  * Store or other configuration managers for better security"), as a
  * provider seam: config VALUES may reference secrets as
  * `${secret:NAME}` instead of carrying credentials inline; references
  * are resolved once at config load through a provider chain. The
  * in-tree providers are the ones a sandboxed/local deployment has —
  * a flat-JSON secrets file (`secrets.file` config key) and process
  * env vars; a cloud manager (Secrets Manager, Parameter Store,
  * Vault) drops in as one more [[Secrets.SecretProvider]] with no
  * config-grammar change.
  *
  * Fail-fast: an unresolvable reference aborts the load naming the
  * config key and the secret NAME — never any secret value. Resolved
  * values live only in the in-memory config map.
  */
object Secrets {

  trait SecretProvider {
    def get(name: String): Option[String]
  }

  /** Process environment (injectable for tests). */
  final case class EnvProvider(
      env: String => Option[String] = sys.env.get) extends SecretProvider {
    def get(name: String): Option[String] = env(name)
  }

  /** Flat JSON `{name: value}` file — the same dependency-free
    * grammar as the config itself.
    */
  final case class FileProvider(path: String) extends SecretProvider {
    private lazy val entries: Map[String, String] =
      JobConfig.parse(new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(path)), "UTF-8"))
    def get(name: String): Option[String] = entries.get(name)
  }

  private val Ref = """\$\{secret:([^}]+)\}""".r

  /** The declared secrets file (when configured) first — an explicit
    * source beats ambient env.
    */
  def defaultProviders(cfg: Map[String, String]): Seq[SecretProvider] =
    cfg.get("secrets.file").map(FileProvider(_)).toSeq :+ EnvProvider()

  /** Substitute every `${secret:NAME}` occurrence in every config
    * value (keys and the `secrets.file` value itself are never
    * substituted — the file location can't depend on its own
    * contents). Values without references pass through untouched.
    */
  def resolve(cfg: Map[String, String],
      providers: Seq[SecretProvider]): Map[String, String] =
    cfg.map { case (k, v) =>
      if (k == "secrets.file") k -> v
      else k -> Ref.replaceAllIn(v, m => {
        val name = m.group(1)
        val value = providers.view.flatMap(_.get(name)).headOption
          .getOrElse(throw new IllegalArgumentException(
            s"UNRESOLVABLE SECRET '$name' IN CONFIG KEY '$k' " +
              "(checked secrets.file, env)"))
        scala.util.matching.Regex.quoteReplacement(value)
      })
    }

  def resolveDefault(cfg: Map[String, String]): Map[String, String] =
    resolve(cfg, defaultProviders(cfg))
}
