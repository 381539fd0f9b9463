#!/usr/bin/env bash
# Compile gate: refuse to commit a tree whose Scala sources do not
# compile (main + test). Round 8 shipped an end-of-round snapshot that
# failed `sbt compile`, which blanked the entire driver signal for the
# round — this hook makes that impossible. Bypass (emergencies only):
# git commit --no-verify.
set -euo pipefail
cd "$(git rev-parse --show-toplevel)"

# Only pay the compile when Scala/sbt sources are part of the commit.
if git diff --cached --name-only | grep -qE '\.(scala|sbt)$'; then
  echo "[precommit] Scala sources staged - running sbt Test/compile" >&2
  if ! sbt -batch Test/compile >/tmp/precommit-compile.log 2>&1; then
    echo "[precommit] COMPILE FAILED - commit refused. Tail of log:" >&2
    tail -30 /tmp/precommit-compile.log >&2
    exit 1
  fi
  echo "[precommit] compile green" >&2
fi
