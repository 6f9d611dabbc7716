#!/usr/bin/env bash
# One-command full-suite runner.  A long XLA-CPU pytest process hits a
# nondeterministic segfault deep in executable (de)serialization on
# single-core hosts (tests/conftest.py documents it; every test passes in
# a fresh process).  Deterministic strategy: one pytest PROCESS PER FILE,
# and retry a file up to twice if the process dies on a SIGNAL (bash
# rc >= 128) rather than a test failure — genuine test failures (rc 1)
# never retry.  test_serving has grown past what one XLA-CPU process
# survives (the LLVM-JIT map-count segfault now reliably hits ~70% into
# the file), so it runs as two half-processes split by class.
# Usage:  bash scripts/run_tests.sh [extra pytest args]
set -u
cd "$(dirname "$0")/.."

EXTRA=("$@")
rc=0

run_with_retry() {
  # $1 = file; $2 = -k expression or empty
  local f="$1" kexpr="$2" attempt frc
  for attempt in 1 2 3; do
    echo "=== $f ${kexpr:+-k \"$kexpr\"} (attempt $attempt)" >&2
    if [ -n "$kexpr" ]; then
      python -m pytest "$f" -q -k "$kexpr" ${EXTRA[@]+"${EXTRA[@]}"}
    else
      python -m pytest "$f" -q ${EXTRA[@]+"${EXTRA[@]}"}
    fi
    frc=$?
    if [ "$frc" -eq 0 ]; then
      return 0
    elif [ "$frc" -ge 128 ] && [ "$attempt" -lt 3 ]; then
      echo "--- $f died on signal $((frc - 128)); retrying" >&2
    else
      return 1
    fi
  done
  return 1
}

for f in tests/test_*.py; do
  if [ "$f" = "tests/test_serving.py" ]; then
    run_with_retry "$f" "TestPackedModel or TestEngine" || rc=1
    run_with_retry "$f" "not TestPackedModel and not TestEngine" || rc=1
  else
    run_with_retry "$f" "" || rc=1
  fi
done
exit $rc
