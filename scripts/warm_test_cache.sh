#!/bin/bash
# Per-module pytest with the opt-in persistent compilation cache
# (GPTQ_TEST_XLA_CACHE=1) — fast dev iteration on one module.  The FULL
# suite must run without the cache: XLA-CPU executable (de)serialization
# segfaults in long processes on this host (see tests/conftest.py).
set -u
cd "$(dirname "$0")/.."
for f in "${@:-tests/test_*.py}"; do
  echo "=== $f"
  GPTQ_TEST_XLA_CACHE=1 timeout 2400 python -m pytest $f -q 2>&1 | tail -1
done
