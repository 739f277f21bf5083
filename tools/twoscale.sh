#!/usr/bin/env bash
# Two-scale correctness gate: run graft.Verify + the DuckDB oracle at
# sf0.01 AND sf0.1, and record both scales in one JSON
# (CORRECTNESS_TWOSCALE.json — per-query sections keyed by scale).
# Catches parameterizations that only hold at one data size (e.g. caps or
# fractions that bind differently as the corpus grows).
set -euo pipefail
cd "$(dirname "$0")/.."
out_json="${1:-CORRECTNESS_TWOSCALE.json}"
tmp=$(mktemp -d)
trap 'rm -rf "$tmp"' EXIT

for sf in 0.01 0.1; do
  echo "=== sf$sf ==="
  rm -rf "$tmp/verify_$sf"
  SPARK_GRAFT_CPUS="${SPARK_GRAFT_CPUS:-8}" \
    sbt -batch "runMain graft.Verify /root/testdata/sf$sf $tmp/verify_$sf" >/dev/null
  # selfcheck exits nonzero on any failure; still record the run — an
  # aborted merge loses the whole round's gate evidence over one flaky
  # oracle child (failures stay visible in the per-query JSON rows)
  python3 tools/selfcheck.py "/root/testdata/sf$sf" "$tmp/verify_$sf" \
    --json="$tmp/report_$sf.json" || echo "sf$sf: selfcheck reported failures (recorded)"
done

python3 - "$tmp" "$out_json" <<'EOF'
import json, sys
tmp, out = sys.argv[1], sys.argv[2]
merged = {f"sf{sf}": json.load(open(f"{tmp}/report_{sf}.json")) for sf in ("0.01", "0.1")}
json.dump(merged, open(out, "w"), indent=1)
print(f"wrote {out}")
EOF
