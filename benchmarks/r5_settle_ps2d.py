"""Settle the ps2d default from the round-5 on-chip A/B (VERDICT r4 #1).

Parses the bench outputs banked by ``benchmarks/r5_onchip.sh`` in
``benchmarks/r5_logs/`` and writes ``benchmarks/ps2d_decision.json``,
which ``bench.py`` consults when ``--ps2d/--no_ps2d`` is not given.
This closes the "flagship kernel is not in the flagship path" loop
without a human in it: if the flat-resident region wins on the real
chip (and the on-chip exactness artifact passed), the driver's
end-of-round ``python bench.py`` automatically runs the winning
configuration; if it loses, the decision file records
measured-and-closed — same discipline as zsum/int8/s2d
(benchmarks/RESULTS.md).

Decision rule: best ps2d variant must beat the best base pass by >2%
(repeatability noise on the chained-scan timing is ~1%), AND the
``--check_ps2d`` exactness line must have ``ok: true``.
"""

import json
import os
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
LOGS = os.path.join(HERE, "r5_logs")
DECISION = os.path.join(HERE, "ps2d_decision.json")
RESULTS_MD = os.path.join(HERE, "RESULTS.md")
MARGIN = 1.02

# candidate ps2d configurations, in the order r5_onchip.sh measures them
CANDIDATES = [
    ("ps2d2", {"ps2d_levels": 1, "env": {}}),
    ("ps2d", {"ps2d_levels": 1, "env": {}}),
    ("ps2d_l2", {"ps2d_levels": 2, "env": {}}),
    ("ps2d_l2_pool", {"ps2d_levels": 2, "env": {"SEG3D_POOL_FUSED": "1"}}),
    ("ps2d_l2_full", {"ps2d_levels": 2,
                      "env": {"SEG3D_POOL_FUSED": "1",
                              "SEG3D_PS2D_RELAXED": "1"}}),
]
BASES = ["base2", "base_check"]


def json_lines(path):
    out = []
    try:
        with open(path) as f:
            for line in f:
                line = line.strip()
                if line.startswith("{"):
                    try:
                        out.append(json.loads(line))
                    except ValueError:
                        pass
    except OSError:
        pass
    return out


def headline(step):
    """vol/s from a bench step's stdout, or None if absent/errored."""
    best = None
    for d in json_lines(os.path.join(LOGS, step + ".out")):
        if (str(d.get("metric", "")).startswith("volumes/sec/chip")
                and "error" not in d):
            v = float(d.get("value", 0.0))
            if v > 0 and (best is None or v > best):
                best = v
    return best


def exactness_ok(levels=1):
    """Exactness verdict for the flat region at the GIVEN depth.

    bench.py --check_ps2d emits one margin-envelope line per level
    ("ps2d exactness levels=N ..."); older logs carry a single
    untagged line, which covered levels=1 only.
    """
    lines = json_lines(os.path.join(LOGS, "base_check.out"))
    tagged = "ps2d exactness levels=%d" % levels
    for d in lines:
        if str(d.get("metric", "")).startswith(tagged):
            return bool(d.get("ok", False)), d
    if levels == 1:
        for d in lines:
            if str(d.get("metric", "")).startswith("ps2d exactness ("):
                return bool(d.get("ok", False)), d
    return False, None


def main():
    base = None
    for s in BASES:
        v = headline(s)
        if v is not None and (base is None or v > base):
            base = v
    measured = {}
    for name, cfg in CANDIDATES:
        v = headline(name)
        if v is not None:
            measured[name] = v

    if base is None or not measured:
        print(json.dumps({"settled": False,
                          "reason": "missing base or ps2d measurement",
                          "base": base, "measured": measured}))
        return 1

    # fastest candidate whose OWN flat-region depth passes the
    # margin-envelope exactness gate; a faster-but-drifting levels=2
    # must not block a passing levels=1 win
    best_name, best_v, ok, exact = None, None, False, None
    for name, _ in sorted(CANDIDATES,
                          key=lambda nc: -measured.get(nc[0], -1.0)):
        if name not in measured:
            continue
        lv = dict(CANDIDATES)[name]["ps2d_levels"]
        lv_ok, lv_exact = exactness_ok(lv)
        if best_name is None:       # remember the raw fastest for logs
            best_name, best_v, ok, exact = (name, measured[name],
                                            lv_ok, lv_exact)
        if lv_ok:
            best_name, best_v, ok, exact = (name, measured[name],
                                            True, lv_exact)
            break

    win = ok and best_v > base * MARGIN
    cfg = dict(CANDIDATES)[best_name]
    decision = {
        "default_ps2d": bool(win),
        "ps2d_levels": cfg["ps2d_levels"] if win else 1,
        "env": cfg["env"] if win else {},
        "evidence": {
            "base_vol_s": round(base, 4),
            "best_ps2d_step": best_name,
            "best_ps2d_vol_s": round(best_v, 4),
            "all_ps2d_vol_s": {k: round(v, 4) for k, v in measured.items()},
            "margin_required": MARGIN,
            "exactness_ok": ok,
            "exactness": exact,
        },
    }
    with open(DECISION, "w") as f:
        json.dump(decision, f, indent=2)
        f.write("\n")

    verdict = ("DEFAULT ON (%s, %.2fx)" % (best_name, best_v / base)
               if win else
               "measured-and-closed: ps2d %s (best %.4f vs base %.4f%s)"
               % ("loses" if ok else "exactness gate failed",
                  best_v, base, "" if ok else "; exactness not ok"))
    with open(RESULTS_MD, "a") as f:
        f.write("\n### ps2d settle (round 5, on-chip A/B — automated)\n\n"
                "| step | vol/s |\n|---|---|\n")
        f.write("| base (best of %s) | %.4f |\n" % ("/".join(BASES), base))
        for k, v in measured.items():
            f.write("| %s | %.4f |\n" % (k, v))
        f.write("\nDecision: **%s** — `benchmarks/ps2d_decision.json` "
                "now drives `bench.py`'s default.\n" % verdict)

    print(json.dumps({"settled": True, "win": win, "decision": decision}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
