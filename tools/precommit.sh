#!/usr/bin/env bash
# Pre-commit guard (VERDICT r8 "Next round" #2): the round-8 snapshot
# shipped a test file that did not compile because the end-of-round
# commit takes whatever is on disk after the last full test run. This
# hook makes that impossible: any commit that stages a .scala file must
# pass `sbt -batch Test/compile` first.
#
# Installed as .git/hooks/pre-commit by tools/install-hooks.sh (run once
# per clone; round.sh installs it too). Bypass for emergencies with
# `git commit --no-verify` — but then the break is on you, explicitly.
#
# Environmental failures (no sbt, sbt lock held by a running gate) are
# NOT treated as compile failures: the hook warns and allows the commit
# rather than wedging it on infrastructure.
set -uo pipefail
cd "$(git rev-parse --show-toplevel)"

# Only guard commits that touch Scala sources or the build definition.
if ! git diff --cached --name-only | grep -qE '\.(scala|sbt)$'; then
  exit 0
fi

if ! command -v sbt >/dev/null 2>&1; then
  echo "[precommit] sbt not on PATH - skipping Test/compile guard" >&2
  exit 0
fi

# If another sbt holds the project lock (e.g. a localverify gate or a
# background `sbt test` is mid-flight), do not deadlock the commit
# behind it: that run compiled the same tree anyway.
if pgrep -f 'xsbt.boot.Boot|sbt-launch' >/dev/null 2>&1; then
  echo "[precommit] another sbt is running - skipping guard (that run compiles the same tree)" >&2
  exit 0
fi

echo "[precommit] staged .scala/.sbt changes -> sbt -batch Test/compile" >&2
# Compile the WORKING TREE. For a snapshot commit (git add -A) the
# working tree IS the staged tree; for partial stages this is a
# conservative over-check, which is fine.
if sbt -batch Test/compile >/tmp/precommit_compile.log 2>&1; then
  echo "[precommit] Test/compile green" >&2
  exit 0
fi

echo "[precommit] BLOCKED: sbt -batch Test/compile FAILED." >&2
echo "[precommit] See /tmp/precommit_compile.log (tail follows):" >&2
tail -20 /tmp/precommit_compile.log >&2
exit 1
