#!/usr/bin/env bash
# Pre-snapshot guard: refuse to commit an uncompiled tree.
#
# Rounds 4 and 7 were both voided by an end-of-round snapshot commit that
# did not compile (BENCH_NOTES.md "Round-4 gate void", "Round-7 gate void").
# Run this before ANY end-of-round or milestone commit:
#
#   tools/presnapshot.sh && git commit ...
#
# Exit 0  = tree compiles (main + test), safe to commit.
# Exit !0 = DO NOT COMMIT; compile errors printed above.
set -euo pipefail
cd "$(dirname "$0")/.."
sbt -batch "compile; Test/compile" 2>&1 | tail -20
exit "${PIPESTATUS[0]}"
