#!/bin/bash
# Bench regression bisector (round-13): turns an attributed bench
# regression into a NAMED COMMIT in minutes instead of a round of `weak`
# marks. Drives `git bisect run` with a probe that builds the tree,
# measures ONE entry in isolation (SPARK_GRAFT_BENCH_ONLY, 3 base runs),
# and judges min-of-runs against the band:
#   exit 0  (good)  min <= band
#   exit 1  (bad)   min >  band
#   exit 125 (skip) commit doesn't build / entry not measurable there
#
#   usage: tools/benchbisect.sh <entry> <band_seconds> <good_sha> [bad_sha]
#   e.g.:  tools/benchbisect.sh t35_chunk_documents 0.38 8181796
#
# Run it on a QUIET machine: the probe measures wall time. Check the
# artifact's per-run `ocpu` evidence (other-process machine CPU) first —
# if the regression only reproduces with ocpu >> 0, it's co-tenant load,
# and bisecting will correctly find every commit "good" (that outcome IS
# the answer: re-band or exonerate, nothing to bisect). The probe parses
# the bench JSON line from stdout, so it works across rounds that predate
# target/bench.json.
set -u
ENTRY="${1:?usage: benchbisect.sh <entry> <band_seconds> <good_sha> [bad_sha]}"
BAND="${2:?band seconds}"
GOOD="${3:?good sha}"
BAD="${4:-HEAD}"
cd "$(dirname "$0")/.."
mkdir -p target
PROBE=target/bisect_probe.sh
cat > "$PROBE" <<'EOF'
#!/bin/bash
set -u
OUT=target/bisect_run.log
# Skip (125) ONLY when the tree doesn't build — a commit where the bench
# itself crashes/OOMs is BAD (the regression may manifest as a crash;
# classifying it as skip would make git bisect skip every bad commit and
# never name the culprit).
sbt -batch compile > "$OUT" 2>&1 || exit 125
SPARK_GRAFT_SF_DIR="${SPARK_GRAFT_SF_DIR:-/root/testdata/sf0.1}" \
SPARK_GRAFT_BENCH_ONLY="$SPARK_GRAFT_BISECT_ENTRY" \
SPARK_GRAFT_BENCH_RUNS=3 \
  sbt -batch "runMain graft.Bench" > "$OUT" 2>&1 || exit 1
grep -o '{"metric".*' "$OUT" | head -1 > target/bisect_line.json
python3 - "$SPARK_GRAFT_BISECT_ENTRY" "$SPARK_GRAFT_BISECT_BAND" <<'PY'
import json, sys
try:
    d = json.load(open('target/bisect_line.json'))
except Exception:
    sys.exit(1)  # ran but emitted no artifact line: treat as bad, not skip
v = d.get('queries', {}).get(sys.argv[1])
if v is None:
    # entry not registered at this commit (predates it): genuinely untestable
    sys.exit(125)
print(f"bisect probe: {sys.argv[1]} min={v} band={sys.argv[2]}")
sys.exit(0 if v <= float(sys.argv[2]) else 1)
PY
EOF
chmod +x "$PROBE"
export SPARK_GRAFT_BISECT_ENTRY="$ENTRY" SPARK_GRAFT_BISECT_BAND="$BAND"
git bisect start "$BAD" "$GOOD"
git bisect run "$PROBE"
STATUS=$?
git bisect log | tail -5
git bisect reset
exit $STATUS
