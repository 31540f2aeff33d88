#!/bin/bash
# Run the test suite in a few fresh interpreter processes.
#
# XLA CPU compile times degrade severely late in a long-lived single-CPU
# process (a compile that takes seconds in a fresh process can take tens of
# minutes after ~200 tests' worth of jitted executables accumulate), which
# can blow CI timeouts.  The persistent compilation cache configured in
# tests/conftest.py makes the per-chunk interpreter restarts cheap: each
# chunk re-imports in seconds and compiles only genuinely new programs.
set -e
cd "$(dirname "$0")/.."
CHUNK=${CHUNK:-6}
batch=()
status=0
run_batch() {
  if [ ${#batch[@]} -gt 0 ]; then
    python -m pytest "${batch[@]}" -q "$@" || status=1
    batch=()
  fi
}
for f in tests/test_*.py; do
  batch+=("$f")
  if [ ${#batch[@]} -ge "$CHUNK" ]; then
    run_batch "$@"
  fi
done
run_batch "$@"
exit $status
