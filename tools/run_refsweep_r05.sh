#!/bin/bash
# Round-5 reference-side sweep driver (REFPARITY_r05 denominator).
#
# Runs the ACTUAL reference binary (tools/baseline/uno_baseline built against
# /root/reference libuno) over the emitted .nl corpus:
#   - ipopt: full corpus, 120 s/problem cap (round-4 protocol), then re-runs
#     any time-limited n=1000 rows at an 1800 s cap (round-4 verdict item 8)
#     if REFSWEEP_RETRY_1800=1.
#   - filtersqp/funnelsqp/byrd: the n+m<=600 tier (round-4 verdict item 2 —
#     the extended tier uno_tpu now sweeps), 120 s cap.
#   - filterslp: the n+m<=150 tier (SLP's 2000-iteration tail makes the
#     extended tier a multi-hour run on both sides; the exclusion is
#     documented per-problem in REFPARITY_r05).
#
# Usage: tools/run_refsweep_r05.sh <corpus_dir> <outdir>
set -euo pipefail
CORPUS=$1
OUT=$2
BIN=${UNO_BASELINE:-/tmp/uno_baseline}
mkdir -p "$OUT"

# tier subdirectories by n+m (read from the manifest)
python - "$CORPUS" "$OUT" <<'EOF'
import json, os, sys
corpus, out = sys.argv[1], sys.argv[2]
man = json.load(open(os.path.join(corpus, "manifest.json")))["problems"]
for tier, cap in (("tier600", 600), ("tier150", 150)):
    d = os.path.join(out, tier)
    os.makedirs(d, exist_ok=True)
    for name, m in man.items():
        if m.get("status") != "ok":
            continue
        if (m.get("n", 0) + m.get("m", 0)) <= cap:
            src = os.path.join(corpus, name + ".nl")
            dst = os.path.join(d, name + ".nl")
            if os.path.exists(src) and not os.path.exists(dst):
                os.symlink(src, dst)
    print(tier, len(os.listdir(d)))
EOF

run() {  # run <preset> <dir> <tag> [extra options...]
  local preset=$1 dir=$2 tag=$3; shift 3
  echo "== refsweep $preset ($tag) $(date -u +%H:%M:%S)"
  "$BIN" nlsweep "$dir" preset="$preset" time_limit=120 "$@" \
      > "$OUT/ref_${preset}_${tag}.jsonl"
}

run ipopt "$CORPUS" full
run filtersqp "$OUT/tier600" t600
run funnelsqp "$OUT/tier600" t600
run byrd "$OUT/tier600" t600
run filterslp "$OUT/tier150" t150

if [ "${REFSWEEP_RETRY_1800:-0}" = "1" ]; then
  # re-run ipopt time-limited rows (status 2) at the 1800 s cap
  python - "$OUT" "$CORPUS" <<'EOF'
import json, os, sys
out, corpus = sys.argv[1], sys.argv[2]
retry = os.path.join(out, "retry1800"); os.makedirs(retry, exist_ok=True)
for line in open(os.path.join(out, "ref_ipopt_full.jsonl")):
    line = line.strip()
    if not line.startswith("{"):
        continue
    row = json.loads(line)
    if row.get("status") == 2:
        src = os.path.join(corpus, row["name"] + ".nl")
        dst = os.path.join(retry, row["name"] + ".nl")
        if not os.path.exists(dst):
            os.symlink(src, dst)
print("retry rows:", os.listdir(retry))
EOF
  if [ -n "$(ls "$OUT/retry1800" 2>/dev/null)" ]; then
    "$BIN" nlsweep "$OUT/retry1800" preset=ipopt time_limit=1800 \
        > "$OUT/ref_ipopt_retry1800.jsonl"
  fi
fi
echo "refsweep done $(date -u +%H:%M:%S)"
