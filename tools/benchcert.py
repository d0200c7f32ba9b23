#!/usr/bin/env python3
"""Render the bench certification FROM a closing artifact (round-13).

The only trustworthy in-band claim is one DERIVED from the artifact it
certifies: round 12 shipped a hand-written "54/54 in band" sentence from
an earlier run while the official closing artifact was 50/54. This script
reads the artifact's own band_status / bands / ratios / evidence fields
(emitted by graft.Bench since round 13) and prints the certification
text that BENCH_NOTES embeds verbatim.

usage: tools/benchcert.py [artifact.json]   (default target/bench.json)
"""
import json
import sys


def main() -> int:
    path = sys.argv[1] if len(sys.argv) > 1 else "target/bench.json"
    d = json.load(open(path))
    q = d.get("queries", {})
    status = d.get("band_status", {})
    bands = d.get("bands", {})
    runs = d.get("runs", {})
    ev = d.get("evidence", {})
    if not status:
        print(f"UNCERTIFIABLE: {path} carries no band_status field "
              "(pre-round-13 artifact?)")
        return 2

    banded = [k for k, s in status.items() if s != "none"]
    n_in = sum(1 for k in banded if status[k] == "in")
    overs = [k for k in banded if status[k] == "over"]
    unbanded = [k for k, s in status.items() if s == "none"]

    print(f"CERTIFICATION (derived from {path}, sf={d.get('sf')}):")
    print(f"  {len(q)} entries measured; {n_in}/{len(banded)} banded "
          f"entries inside their quiet-machine bands"
          + ("." if not overs else f"; {len(overs)} over:"))
    for k in overs:
        line = f"    {k}: min={q[k]:.3f} band={bands.get(k)}"
        if k in runs:
            line += f" runs={runs[k]}"
        # self-attribution: evidence of the minimum run, if carried
        if k in ev and k in runs and ev[k]:
            i = min(range(len(runs[k])), key=lambda j: runs[k][j])
            if i < len(ev[k]):
                e = ev[k][i]
                line += (f" [min-run evidence: gc={e.get('gc')} "
                         f"cpu={e.get('cpu')} ocpu={e.get('ocpu', '?')}"
                         f" iow={e.get('iow', '?')} cal={e.get('cal', '?')}]")
                if isinstance(e.get("ocpu"), (int, float)) and e["ocpu"] > 2.0:
                    line += " — co-tenant CPU present; rerun quiet before trusting"
                # elevated machine iowait: the only witness for task wall
                # inflated with cpu flat, ocpu ~0 and a quiet cal (CPU
                # spins never see a saturated disk). NOT self-attributing —
                # iow includes the bench's OWN I/O, so for write-heavy
                # entries compare the entry's quiet-session iow baseline
                # before exonerating (a real plan regression that writes
                # more also waits more).
                if isinstance(e.get("iow"), (int, float)) and e["iow"] > 2.0:
                    line += (f" — machine iowait {e['iow']:.1f}s during the run"
                             " (includes the bench's own I/O; vs this entry's"
                             " quiet baseline, disk contention is the suspect"
                             " — rerun quiet before trusting either way)")
                # host-level contention: fixed-work calibration inflated vs
                # the artifact-wide median (invisible to gc/ocpu — no PV
                # steal accounting in this guest)
                cals = [x.get("cal") for vs in ev.values() for x in vs
                        if isinstance(x.get("cal"), (int, float))]
                if cals and isinstance(e.get("cal"), (int, float)):
                    med = sorted(cals)[len(cals) // 2]
                    if med > 0 and e["cal"] > 1.5 * med:
                        line += (f" — host contention (cal {e['cal']:.0f}ms vs"
                                 f" median {med:.0f}ms); rerun quiet")
        print(line)
    if unbanded:
        print(f"  unbanded (first measurement, band seeds next round): "
              f"{', '.join(sorted(unbanded))}")
    for name, r in d.get("ratios", {}).items():
        trust = "trusted" if r.get("floor_in_band") else \
            "UNTRUSTED (floor over band — do not grade on this number)"
        print(f"  ratio {name}: {r.get('x')}x [{trust}]")
    # round-14: banded scale-curve ratios (dimensionless, load-resistant) —
    # an "over" here means the plan bent superlinear, not that the host was
    # busy, so it fails the certification like an absolute band breach.
    scale_overs = []
    for name, r in d.get("scale_ratios", {}).items():
        st = r.get("status", "?")
        # round-15: denominators are floored at a recorded quiet-range
        # constant (den_floor) so a lucky-fast 1x sample can't inflate x
        fl = f", den_floor {r['den_floor']}" if "den_floor" in r else ""
        print(f"  scale-ratio {name}: {r.get('x')}x (band {r.get('band')}{fl}) [{st}]")
        if st == "over":
            scale_overs.append(name)
    # round-16: floor-normalized per-entry bands (entry / same-run raw-
    # Spark floor, denominator floored at its quiet constant) — uniform
    # host drift cancels in the quotient, so an "over" here is a PLAN
    # change even when every absolute band moved with the host. Motivating
    # case: the r15 closing artifacts drifted +5.7% uniformly (floor
    # included) and the absolute bands absorbed it silently.
    fn_overs = []
    for name, r in d.get("floor_norm", {}).items():
        st = r.get("status", "?")
        print(f"  floor-norm {name}: {r.get('x')}x (band {r.get('band')}) [{st}]")
        if st == "over":
            fn_overs.append(name)
    if d.get("errors"):
        print(f"  errors: {sorted(d['errors'])}")
        return 1
    return 0 if not overs and not scale_overs and not fn_overs else 1


if __name__ == "__main__":
    sys.exit(main())
