#!/bin/sh
# Per-entry wrapper around check.py with a wall-clock cap per entry, so a
# single oracle whose cost explodes at a big SF (documented-quadratic class)
# cannot stall a full-board gate. Usage:
#   tools/check_all.sh <sfDir> <verifyOutDir> [timeout_s] > log
# Prints check.py's own ok/FAIL lines, plus TIMEOUT (exit 124 from
# timeout(1)) or ERROR markers. A check.py crash (traceback, missing file,
# import error) is labeled ERROR with its exit code, never TIMEOUT — the
# exit status is captured before any pipe so it can't be discarded.
SF="$1"; OUT="$2"; T="${3:-900}"
TMP=$(mktemp)
trap 'rm -f "$TMP"' EXIT
for d in "$OUT"/*/; do
  n=$(basename "$d")
  timeout "$T" python3 tools/check.py "$SF" "$OUT" "$n" >"$TMP" 2>&1
  rc=$?
  # rc first: a check that prints an ok line but then times out (rc=124)
  # or crashes must surface as TIMEOUT/ERROR — partial ok output must
  # never mask it. check.py exits 1 when it PRINTS FAIL lines, so a
  # nonzero rc is only a crash when no FAIL line explains it; FAIL output
  # stays authoritative.
  if [ "$rc" -eq 124 ]; then
    echo "TIMEOUT $n (> ${T}s)"
    grep -E "^(ok|FAIL)" "$TMP" | sed 's/^/  # partial: /'
  elif [ "$rc" -ne 0 ] && ! grep -qE "^FAIL" "$TMP"; then
    echo "ERROR $n (exit $rc)"
    sed 's/^/  # /' "$TMP" | tail -5
  elif grep -E "^(ok|FAIL)" "$TMP"; then
    :
  else
    echo "ERROR $n (exit $rc, no ok/FAIL line)"
    sed 's/^/  # /' "$TMP" | tail -5
  fi
done
