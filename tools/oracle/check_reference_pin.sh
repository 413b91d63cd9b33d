#!/bin/bash
# Verify the cloned reference tree matches the fingerprint the golden
# corpus was generated against (tests/golden/* and the parity suite are
# only meaningful against this exact source).  An unpinned `git clone`
# at upstream HEAD would otherwise let any upstream change silently alter
# or break the oracle-parity CI.
#
# Fingerprint = sha256 over the sorted sha256sums of every first-party
# source/param file (src/**, params/*.par, CMakeLists.txt).  Recorded from
# the /root/reference snapshot used to generate tests/golden (reference
# release 1.0.1 era, 2026-08).
set -euo pipefail
REF="${REFERENCE_DIR:-/root/reference}"
EXPECTED="9d60998efb59e28fe1eeca86157cf1e699fd818c2dc8a128efdd1113802c1752"
cd "$REF"
ACTUAL=$(find src params CMakeLists.txt -type f \
    \( -name '*.cc' -o -name '*.hh' -o -name '*.h' -o -name '*.c' \
       -o -name '*.par' -o -name 'CMakeLists.txt' \) \
  | LC_ALL=C sort | xargs sha256sum | sha256sum | cut -d' ' -f1)
if [ "$ACTUAL" != "$EXPECTED" ]; then
  echo "reference tree fingerprint mismatch:" >&2
  echo "  expected $EXPECTED" >&2
  echo "  actual   $ACTUAL" >&2
  echo "Upstream drifted (or the clone is incomplete); regenerate" >&2
  echo "tests/golden against the new tree or pin the old commit." >&2
  exit 1
fi
echo "reference pin ok: $ACTUAL"
