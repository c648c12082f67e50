#!/usr/bin/env python3
"""Housekeeping helper (round 14): given a dress-rehearsal bench log,
print updated Bench.scala lastRoundSec / priorIsolatedMinSec map
literals.

Rules (the established r13 discipline):
  - lastRoundSec' = elementwise min(old, rehearsal observation) — the
    map drives heaviest-first scheduling and the suspicious() threshold;
    min keeps expectations conservative on a degraded-window rehearsal
    while banking real reductions.
  - priorIsolatedMinSec' = elementwise min(old, rehearsal observation)
    — any real observation is an upper bound on the isolated minimum,
    so the floor only ever ratchets DOWN.

Usage: refresh_floors.py <bench_log> [roundto=1]
Prints the two map bodies in the existing source format.
"""
import json
import re
import sys


def parse_scala_map(src: str, name: str) -> dict:
    m = re.search(
        rf"val {name}: Map\[String, Double\] =\s*Map\((.*?)\)\n", src, re.S)
    body = m.group(1)
    return {k: float(v) for k, v in
            re.findall(r'"([^"]+)" -> ([0-9.]+)', body)}


def fmt_map(d: dict) -> str:
    items = [f'"{k}" -> {round(v, 2)}' for k, v in sorted(d.items())]
    lines, cur = [], "      "
    for i, it in enumerate(items):
        piece = it + ("," if i < len(items) - 1 else ")")
        if len(cur) + len(piece) + 1 > 78:
            lines.append(cur.rstrip())
            cur = "      "
        cur += piece + " "
    lines.append(cur.rstrip())
    return "\n".join(lines)


def main() -> None:
    log = open(sys.argv[1]).read()
    full = [l for l in log.splitlines()
            if '"metric":"total"' in l and '"queries"' in l and '"wall"' in l][-1]
    j = json.loads(full[full.index("{"):])
    obs = j["queries"]
    src = open("src/main/scala/graft/Bench.scala").read()
    for name in ("lastRoundSec", "priorIsolatedMinSec"):
        old = parse_scala_map(src, name)
        new = dict(old)
        for q, v in obs.items():
            key = q.split("_")[0] if q.split("_")[0] in old else q
            if key in new:
                new[key] = min(new[key], round(v, 2))
        changed = {k: (old[k], new[k]) for k in old if old[k] != new[k]}
        print(f"== {name}: {len(changed)} entries ratcheted down ==")
        print(fmt_map(new))
        print()


if __name__ == "__main__":
    main()
