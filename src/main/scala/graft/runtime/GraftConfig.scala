package graft.runtime

/** Config/CLI overlay (reference `_load_args`,
  * `src/catenae/catenae.py:169-249`): constructor defaults overridden by
  * CLI flags; comma-separated list values; unknown args preserved.
  *
  * Flag mapping mirrors the reference's short options
  * (`catenae.py:201-208`): -i input streams, -o default output stream,
  * -g receiver group (= link name), -u uid, plus free-form `--key value`.
  */
final case class GraftConfig(
    inputs: Seq[String] = Seq.empty,
    output: Option[String] = None,
    group: Option[String] = None,
    uid: Option[String] = None,
    extra: Map[String, String] = Map.empty,
    unknown: Seq[String] = Seq.empty) {

  /** Overlay CLI args on this config (CLI wins, like the reference). */
  def withArgs(args: Array[String]): GraftConfig = {
    var c = this
    var i = 0
    while (i < args.length) {
      args(i) match {
        case "-i" | "--input-streams" if i + 1 < args.length =>
          c = c.copy(inputs = args(i + 1).split(",").toSeq.filter(_.nonEmpty)); i += 2
        case "-o" | "--default-output-stream" if i + 1 < args.length =>
          c = c.copy(output = Some(args(i + 1))); i += 2
        case "-g" | "--consumer-group" if i + 1 < args.length =>
          c = c.copy(group = Some(args(i + 1))); i += 2
        case "-u" | "--uid" if i + 1 < args.length =>
          c = c.copy(uid = Some(args(i + 1))); i += 2
        // value must not itself be a flag: "--verbose --input-streams a,b"
        // would otherwise swallow --input-streams as verbose's VALUE and
        // silently drop the real option
        case k if k.startsWith("--") && i + 1 < args.length &&
            !args(i + 1).startsWith("--") =>
          c = c.copy(extra = c.extra + (k.stripPrefix("--") -> args(i + 1))); i += 2
        case k if k.startsWith("--") => // value-less flag: present ⇒ "true"
          c = c.copy(extra = c.extra + (k.stripPrefix("--") -> "true")); i += 1
        case other =>
          c = c.copy(unknown = c.unknown :+ other); i += 1
      }
    }
    c
  }
}
