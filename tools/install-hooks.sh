#!/usr/bin/env bash
# Install the repo's git hooks (idempotent). Run once per clone;
# tools/round.sh also invokes this so the guard exists before any
# end-of-round snapshot commit.
set -euo pipefail
cd "$(dirname "$0")/.."
mkdir -p .git/hooks
cp tools/precommit.sh .git/hooks/pre-commit
chmod +x .git/hooks/pre-commit tools/precommit.sh
echo "installed .git/hooks/pre-commit (Test/compile guard)"
