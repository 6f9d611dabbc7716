#!/usr/bin/env bash
# One-command full-suite runner: the ~300-test suite in ONE process hits a
# nondeterministic XLA-CPU segfault deep in executable (de)serialization on
# single-core hosts (observed only >200 tests into a run; every test passes
# in isolation — see tests/conftest.py).  Run the suite as four sequential
# pytest processes instead, grouped to balance wall time; exit non-zero if
# any chunk fails.  Usage:  bash scripts/run_tests.sh [extra pytest args]
set -u
cd "$(dirname "$0")/.."

CHUNKS=(
  "tests/test_quantizer.py tests/test_gptq.py tests/test_gptq_pallas.py tests/test_data.py tests/test_w4a16.py tests/test_native.py"
  "tests/test_model.py tests/test_pipeline.py tests/test_cli.py tests/test_composed_parity.py tests/test_contiguous_attention.py"
  "tests/test_serving.py"
  "tests/test_speculative.py tests/test_parallel.py tests/test_multihost.py"
)

rc=0
for i in "${!CHUNKS[@]}"; do
  echo "=== chunk $((i + 1))/${#CHUNKS[@]}: ${CHUNKS[$i]}" >&2
  # shellcheck disable=SC2086
  python -m pytest ${CHUNKS[$i]} -q "$@" || rc=1
done
exit $rc
