#!/bin/sh
# Per-entry wrapper around check.py with a wall-clock cap per entry, so a
# single oracle whose cost explodes at a big SF (documented-quadratic class)
# cannot stall a full-board gate. Usage:
#   tools/check_all.sh <sfDir> <verifyOutDir> [timeout_s] > log
# Prints check.py's own ok/FAIL lines plus TIMEOUT markers.
SF="$1"; OUT="$2"; T="${3:-900}"
for d in "$OUT"/*/; do
  n=$(basename "$d")
  timeout "$T" python3 tools/check.py "$SF" "$OUT" "$n" 2>&1 | grep -E "^(ok|FAIL)" \
    || echo "TIMEOUT $n (> ${T}s)"
done
