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

# Tree-hash sentinel: a prior successful guard run records the hash of
# every working-tree .scala/.sbt file. If the tree is unchanged since
# the last green compile, pass without re-compiling — this is also what
# makes the hook safe when another sbt is mid-flight: "some sbt is
# running" used to skip the guard entirely, but that sbt may be
# compiling a DIFFERENT tree than the commit (ADVICE r9). Now only an
# identical-tree sentinel skips; otherwise we wait (bounded) for the
# lock and compile ourselves.
SENTINEL=.git/precommit-green
tree_hash() {
  { git diff --cached --name-only; git ls-files; } | sort -u \
    | grep -E '\.(scala|sbt)$' \
    | xargs -r sha1sum 2>/dev/null | sha1sum | cut -d' ' -f1
}
H="$(tree_hash)"
if [ -f "$SENTINEL" ] && [ "$(cat "$SENTINEL")" = "$H" ]; then
  echo "[precommit] tree unchanged since last green Test/compile - ok" >&2
  exit 0
fi

waited=0
while pgrep -f 'xsbt.boot.Boot|sbt-launch' >/dev/null 2>&1; do
  if [ "$waited" -ge 900 ]; then
    echo "[precommit] BLOCKED: another sbt has held the lock for 15m and" >&2
    echo "[precommit] the tree does not match the last green compile." >&2
    echo "[precommit] Wait for it, or 'git commit --no-verify' to bypass." >&2
    exit 1
  fi
  [ "$waited" -eq 0 ] && \
    echo "[precommit] another sbt is running - waiting for the lock (max 15m)" >&2
  sleep 15; waited=$((waited + 15))
done

echo "[precommit] staged .scala/.sbt changes -> sbt -batch Test/compile" >&2
# Compile the WORKING TREE. For a snapshot commit (git add -A) the
# working tree IS the staged tree; for partial stages this is a
# conservative over-check, which is fine.
if sbt -batch Test/compile >/tmp/precommit_compile.log 2>&1; then
  echo "[precommit] Test/compile green" >&2
  tree_hash > "$SENTINEL"
  exit 0
fi

echo "[precommit] BLOCKED: sbt -batch Test/compile FAILED." >&2
echo "[precommit] See /tmp/precommit_compile.log (tail follows):" >&2
tail -20 /tmp/precommit_compile.log >&2
exit 1
