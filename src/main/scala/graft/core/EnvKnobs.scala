package graft.core

/** Shared parsing for numeric environment knobs (`GRAFT_DRIVER_CAP`
  * etc.). The knobs gate driver-kernel size caps, so a malformed value
  * must not crash object initialization (a bare `toInt` at `val` init
  * surfaces as `ExceptionInInitializerError` at first touch of the
  * owning object — far from the actual mistake), and the readers must
  * agree on semantics: non-numeric or out-of-range input falls back to
  * the default; valid input is clamped to `[0, max]` (0 = "force the
  * distributed path", the bench's kernels-off leg).
  *
  * A malformed or clamped value additionally emits ONE stderr line:
  * a typo in a bench leg (`GRAFT_DRIVER_CAP=1e0` instead of `0`) used
  * to silently bench the driver-kernel path instead of the distributed
  * one, and a raise past the hard ceiling used to be silently ignored —
  * both now leave a visible signal in the log. Callers pass `max` as a
  * hard SAFETY ceiling well above the default (not equal to it), so
  * operators can deliberately raise a cap for a bigger driver.
  */
object EnvKnobs {

  /** `env(name)` parsed as a Long clamped to `[0, max]`; `default` when
    * unset or malformed (never throws). Malformed/clamped values warn
    * on stderr, naming the knob.
    */
  def boundedLong(name: String, default: Long, max: Long): Long =
    parse(sys.env.get(name), default, max, name)

  /** The parsing core, separated from the env read so the semantics are
    * unit-testable (sys.env can't be injected in-process).
    */
  private[core] def parse(raw: Option[String], default: Long,
                          max: Long, name: String = "<knob>"): Long =
    raw match {
      case None => default
      case Some(v) =>
        scala.util.Try(v.trim.toLong).toOption match {
          case None =>
            System.err.println(
              s"[EnvKnobs] WARN: $name='$v' is not a number; " +
                s"using default $default")
            default
          case Some(n) =>
            val clamped = n.max(0L).min(max)
            if (clamped != n)
              System.err.println(
                s"[EnvKnobs] WARN: $name=$n clamped to $clamped " +
                  s"(allowed range [0, $max])")
            clamped
        }
    }

  def boundedInt(name: String, default: Int, max: Int): Int =
    boundedLong(name, default.toLong, max.toLong).toInt
}
