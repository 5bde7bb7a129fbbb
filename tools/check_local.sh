#!/bin/bash
# CHECK_LOCAL_r{N} runner — round-7 judge #7: the recorded hash must
# be the CODE HEAD the check actually ran at (round 6 hand-wrote the
# header and lagged one commit).  Usage:
#   tools/check_local.sh 7 > CHECK_LOCAL_r7.txt
# Run it AFTER the final code commit; commit the output as its own
# artifact-only commit quoting the same hash.
#
# The dirty check EXCLUDES the CHECK_LOCAL_r*.txt artifacts themselves:
# `> CHECK_LOCAL_rN.txt` truncates the tracked output file before the
# script runs, which used to self-mark every run `-dirty` (the round-8
# trap; rounds 8-10 each worked around it with a /tmp redirect + mv).
set -euo pipefail
cd "$(dirname "$0")/.."
N="${1:?round number required}"
HEAD="$(git rev-parse --short HEAD)"
DIRTY=""
git diff --quiet -- . ':(exclude)CHECK_LOCAL_r*.txt' \
  && git diff --cached --quiet -- . ':(exclude)CHECK_LOCAL_r*.txt' \
  || DIRTY="-dirty"
NQ="$(python -c "import __spark_entry__ as e; print(len(e.queries()))")"
echo "CHECK_LOCAL_r${N} — full strict oracle gate (+count-shaped probe) at code HEAD ${HEAD}${DIRTY} (${NQ} queries)"
for sf in 0.001 0.01 0.1; do
  echo "== sf${sf}"
  out="$(python tools/check.py "/root/testdata/sf${sf}" --strict 2>/dev/null)" || {
    echo "${out}" | grep "^FAIL"
    echo "${out}" | tail -1
    exit 1
  }
  echo "${out}" | tail -1
done
