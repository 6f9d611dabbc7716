#!/usr/bin/env bash
# One-command full-suite runner.  A long XLA-CPU pytest process hits a
# nondeterministic segfault deep in executable (de)serialization on
# single-core hosts (tests/conftest.py documents it; every test passes in
# a fresh process).  Deterministic strategy: one pytest PROCESS PER FILE,
# and retry a file up to twice if the process dies on a SIGNAL (bash
# rc >= 128) rather than a test failure — genuine test failures (rc 1)
# never retry.  Usage:  bash scripts/run_tests.sh [extra pytest args]
set -u
cd "$(dirname "$0")/.."

FILES=(tests/test_*.py)
rc=0
for f in "${FILES[@]}"; do
  for attempt in 1 2 3; do
    echo "=== $f (attempt $attempt)" >&2
    python -m pytest "$f" -q "$@"
    frc=$?
    if [ "$frc" -eq 0 ]; then
      break
    elif [ "$frc" -ge 128 ] && [ "$attempt" -lt 3 ]; then
      echo "--- $f died on signal $((frc - 128)); retrying" >&2
      continue
    else
      rc=1
      break
    fi
  done
done
exit $rc
