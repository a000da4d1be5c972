package graft.core

/** Shared parsing for numeric environment knobs (`GRAFT_DRIVER_CAP`
  * etc.). The knobs gate driver-kernel size caps, so a malformed value
  * must not crash object initialization (a bare `toInt` at `val` init
  * surfaces as `ExceptionInInitializerError` at first touch of the
  * owning object — far from the actual mistake), and the readers must
  * agree on semantics: non-numeric or out-of-range input falls back to
  * the default; valid input is clamped to `[0, max]` (0 = "force the
  * distributed path", the bench's kernels-off leg).
  */
object EnvKnobs {

  /** `env(name)` parsed as a Long clamped to `[0, max]`; `default` when
    * unset or malformed (never throws).
    */
  def boundedLong(name: String, default: Long, max: Long): Long =
    parse(sys.env.get(name), default, max)

  /** The parsing core, separated from the env read so the semantics are
    * unit-testable (sys.env can't be injected in-process).
    */
  private[core] def parse(raw: Option[String], default: Long,
                          max: Long): Long =
    raw.flatMap(v => scala.util.Try(v.trim.toLong).toOption)
      .map(v => v.max(0L).min(max))
      .getOrElse(default)

  def boundedInt(name: String, default: Int, max: Int): Int =
    boundedLong(name, default.toLong, max.toLong).toInt
}
