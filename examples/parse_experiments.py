"""Tabulate experiment-sweep results — the reference
`run_utils/parse_data.py` equivalent.

Parses the "Experiment result, …" lines emitted by
`examples/run_experiments.py` (format parity with the reference's
`paper_experiments.cpp:643-649`) plus our extra columns (certified,
sdp cost, suboptimality, ATE, t_cert), and prints per-dataset pivot
tables over the {formulation} × {init} × {init_rank_jump} grid as
GitHub-flavored markdown (ready to paste into EXPERIMENTS.md).

Usage:
    python examples/parse_experiments.py /tmp/cora_tpu_experiments/experiments.txt
"""

from __future__ import annotations

import sys
from collections import defaultdict

NAME_MAP = {
    "plaza1": "Plaza 1",
    "plaza2": "Plaza 2",
    "single_drone": "Single Drone",
    "tiers": "TIERS",
    "mrclam3b": "MR.CLAM 3b",
    "mrclam5a": "MR.CLAM 5a",
    "mrclam6": "MR.CLAM 6",
}


def parse_line(line: str) -> dict | None:
    if not line.startswith("Experiment result,"):
        return None
    rec = {}
    for field in line.split(",")[1:]:
        if ":" not in field:
            continue
        k, v = field.split(":", 1)
        rec[k.strip()] = v.strip()
    out = {"name": rec.get("name", "?")}
    for k_src, k_dst, cast in [
        ("time", "time", float),
        ("cost", "cost", float),
        ("marginalized", "marginalized", int),
        ("init rank jump", "jump", int),
        ("init random", "random", int),
        ("certified", "certified", int),
        ("sdp cost", "sdp_cost", float),
        ("suboptimality", "subopt", float),
        ("ate", "ate", float),
        ("t_cert", "t_cert", float),
    ]:
        if k_src in rec:
            try:
                out[k_dst] = cast(rec[k_src].split()[0])
            except ValueError:
                out[k_dst] = float("nan")
    return out


def load(path: str) -> list[dict]:
    rows = []
    with open(path) as f:
        for line in f:
            rec = parse_line(line)
            if rec is not None:
                rows.append(rec)
    return rows


def dedupe(rows: list[dict]) -> list[dict]:
    """Keep the LAST run of each (dataset, config) cell (re-runs override)."""
    seen = {}
    for r in rows:
        key = (r["name"], r.get("marginalized"), r.get("random"), r.get("jump"))
        seen[key] = r
    return list(seen.values())


def fmt(v, spec=".3f"):
    if v is None:
        return "—"
    if isinstance(v, float) and v != v:  # NaN
        return "—"
    return format(v, spec)


def tabulate(rows: list[dict]) -> str:
    by_ds = defaultdict(list)
    for r in rows:
        by_ds[r["name"]].append(r)

    out = []
    for ds in sorted(by_ds, key=lambda n: list(NAME_MAP).index(n) if n in NAME_MAP else 99):
        out.append(f"\n### {NAME_MAP.get(ds, ds)}\n")
        out.append(
            "| form | init | jump | cert | cost | sdp cost | subopt | "
            "ATE (m) | t_cert (s) | total (s) |"
        )
        out.append("|---|---|---|---|---|---|---|---|---|---|")
        cells = sorted(
            by_ds[ds],
            key=lambda r: (r.get("marginalized", 0), 1 - r.get("random", 0),
                           r.get("jump", 0)),
        )
        for r in cells:
            form = "implicit" if r.get("marginalized") else "explicit"
            init = "random" if r.get("random") else "odom"
            out.append(
                f"| {form} | {init} | {r.get('jump', '—')} "
                f"| {'✓' if r.get('certified') else '✗'} "
                f"| {fmt(r.get('cost'))} | {fmt(r.get('sdp_cost'))} "
                f"| {fmt(r.get('subopt'))} | {fmt(r.get('ate'))} "
                f"| {fmt(r.get('t_cert'), '.2f')} | {fmt(r.get('time'), '.2f')} |"
            )
        n_cert = sum(r.get("certified", 0) for r in cells)
        out.append(f"\n{n_cert}/{len(cells)} configurations certified.")
    return "\n".join(out)


def main():
    path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/cora_tpu_experiments/experiments.txt"
    rows = dedupe(load(path))
    if not rows:
        print(f"no experiment lines in {path}")
        return
    print(tabulate(rows))


if __name__ == "__main__":
    main()
