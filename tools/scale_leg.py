#!/usr/bin/env python3
"""Standing scale-leg harness (dev tool): run a gate set at sf0.1 AND
sf1 and emit the round's byte/wall telemetry files, with the gate set
chosen by a STABLE rule instead of by hand — the top-N gates by
shuffle bytes in the committed full-suite snapshot, plus any
explicitly named gates (typically the round's touched ones). Exchange
regressions are then caught by diffing io_r{N} files round over
round, not by choosing to look.

Usage: python3 tools/scale_leg.py <round> [gate ...] [--top 15]
         [--repeat 3] [--select-from BENCH_LOCAL.json]

Writes io_r{round}_sf01.json / io_r{round}_sf1.json (full Bench rows:
walls, gc, cpu, jit, shuffle_mb, input_mb) and prints the wall-alpha
and shuffle-growth table. Convention: warmed take-min of repeat 3,
32 g driver heap, 32 cores; shuffle bytes are deterministic so the
byte columns are comparable regardless of box noise.

sf1 lives at <repo>/testdata/sf1 (gitignored); regenerated via
graft.cli.ScaleUp from /root/testdata/sf0.1 when missing.
"""
import json
import math
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
SF01 = "/root/testdata/sf0.1"
SF1 = str(REPO / "testdata" / "sf1")


def sbt(cmd: str, env: dict) -> None:
    full = {"SPARK_DRIVER_MEM": "32g", "SPARK_GRAFT_CPUS": "32", **env}
    import os
    r = subprocess.run(["sbt", "-batch", cmd], cwd=REPO,
                       env={**os.environ, **full},
                       capture_output=True, text=True)
    if r.returncode != 0:
        sys.stderr.write(r.stdout[-4000:] + r.stderr[-2000:])
        sys.exit(f"sbt failed: {cmd}")


def select_gates(snapshot: Path, top: int, extra: list) -> list:
    snap = json.loads(snapshot.read_text())
    shuf = snap.get("shuffle_mb", {})
    walls = snap.get("queries", {})
    # stable rule: top-N by shuffle bytes (descending, name tiebreak),
    # failed gates (-1 wall) excluded
    ranked = sorted((g for g in shuf if walls.get(g, -1) >= 0),
                    key=lambda g: (-shuf[g], g))
    return sorted(set(ranked[:top]) | set(extra))


def main() -> None:
    args = [a for a in sys.argv[1:]]
    def opt(name, default):
        if name in args:
            i = args.index(name)
            v = args[i + 1]
            del args[i:i + 2]
            return v
        return default
    top = int(opt("--top", "15"))
    repeat = opt("--repeat", "3")
    select_from = Path(opt("--select-from", str(REPO / "BENCH_LOCAL.json")))
    if not args:
        sys.exit("usage: scale_leg.py <round> [gate ...]")
    rnd = args[0]
    gates = select_gates(select_from, top, args[1:])
    print(f"[scale_leg] {len(gates)} gates: {' '.join(gates)}")

    if not Path(SF1).exists():
        print("[scale_leg] generating sf1 testdata via graft.cli.ScaleUp")
        sbt(f"runMain graft.cli.ScaleUp {SF01} {SF1} 10", {})

    outs = {}
    for label, sfdir in (("sf01", SF01), ("sf1", SF1)):
        out = REPO / f"io_r{rnd}_{label}.json"
        print(f"[scale_leg] bench {label} -> {out.name}")
        sbt("runMain graft.Bench " + " ".join(gates), {
            "SPARK_GRAFT_SF_DIR": sfdir,
            "SPARK_GRAFT_BENCH_REPEAT": repeat,
            "SPARK_GRAFT_BENCH_OUT": str(out),
        })
        outs[label] = json.loads(out.read_text())

    q0, q1 = outs["sf01"]["queries"], outs["sf1"]["queries"]
    s0, s1 = outs["sf01"]["shuffle_mb"], outs["sf1"]["shuffle_mb"]
    print(f"\n{'gate':42s} {'w0.1':>7s} {'w1':>8s} {'ratio':>6s} "
          f"{'alpha':>6s} {'shuf0.1':>9s} {'shuf1':>9s} {'growth':>7s}")
    for g in gates:
        w0, w1 = q0.get(g, -1), q1.get(g, -1)
        ratio = w1 / w0 if w0 > 0 and w1 > 0 else float("nan")
        alpha = math.log10(ratio) if ratio == ratio and ratio > 0 else float("nan")
        b0, b1 = s0.get(g, 0.0), s1.get(g, 0.0)
        growth = b1 / b0 if b0 > 0.005 else float("nan")
        print(f"{g:42s} {w0:7.2f} {w1:8.2f} {ratio:6.2f} {alpha:6.2f} "
              f"{b0:9.1f} {b1:9.1f} {growth:7.1f}")


if __name__ == "__main__":
    main()
