#!/usr/bin/env bash
# promote_artifact.sh <expected_sf_substring> <dest.json> [src=bench_out.json]
#
# Guarded promotion of a bench artifact (r14 VERDICT task 1b): refuses
# to cp when the source is missing/empty, carries a refusal/error
# record, or was struck against a different corpus than intended —
# the r14 chain's unconditional `cp bench_out.json BENCH_*.json`
# silently promoted a stale x10 strike as the sf0.1 artifact.
set -u
expected_sf="$1"
dest="$2"
src="${3:-bench_out.json}"

if [ ! -s "$src" ]; then
  echo "[promote] REFUSED: $src missing or empty — $dest left untouched" >&2
  exit 1
fi
if grep -q '"error"' "$src"; then
  echo "[promote] REFUSED: $src carries an error/refusal record — $dest left untouched:" >&2
  head -c 400 "$src" >&2; echo >&2
  exit 1
fi
actual_sf="$(python3 - "$src" <<'EOF'
import json, sys
print(json.load(open(sys.argv[1])).get("sf", ""))
EOF
)"
case "$actual_sf" in
  *"$expected_sf"*) ;;
  *)
    echo "[promote] REFUSED: $src sf='$actual_sf' does not match expected '$expected_sf' — $dest left untouched" >&2
    exit 1
    ;;
esac
cp "$src" "$dest"
[ -f "$src.short" ] && cp "$src.short" "$dest.short"
echo "[promote] $src (sf=$actual_sf) -> $dest" >&2
