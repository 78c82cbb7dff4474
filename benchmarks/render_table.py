"""Render benchmarks/baseline_results.json (+ scaling_results.json if
present) as the Markdown tables embedded in README.md.

Usage: ``python benchmarks/render_table.py`` prints Markdown to stdout.
"""

from __future__ import annotations

import json
import os


def _fmt(v, nd=1):
    if isinstance(v, float):
        return f"{v:,.{nd}f}"
    return f"{v:,}" if isinstance(v, int) else str(v)


def baseline_table(rows):
    out = [
        "| config | chains | events/chain | events/s | B=1 anchor (ev/s) | speedup | ESS/s (worst coord) | R-hat ok | acceptance |",
        "|---|---|---|---|---|---|---|---|---|",
    ]
    for r in rows:
        out.append(
            "| {config} | {B} | {ne} | **{eps}** | {single} | {spd}x | {ess} | {rh} | {acc} |".format(
                config=r["config"].replace("_", r"\_"),
                B=_fmt(r["chains"]),
                ne=_fmt(r["events_per_chain"]),
                eps=_fmt(r["events_per_sec"], 0),
                single=_fmt(r["single_chain_events_per_sec"], 0),
                spd=_fmt(r["parallel_speedup"], 0),
                ess=_fmt(r["ess_per_sec_worst_coord"], 0),
                rh=("yes (%.3f)" % r["rhat_max"]) if r["rhat_ok"]
                else ("n/a*" if "note" in r else "no (%.3f)" % r["rhat_max"]),
                acc=_fmt(r["mean_acceptance"], 3),
            )
        )
    return "\n".join(out)


def scaling_table(rows):
    batch = [r for r in rows if r["axis"] == "chain_batch"]
    mesh = [r for r in rows if r["axis"] == "device_mesh"]
    out = []
    if batch:
        out += [
            "| chains B | events/s | speedup vs B=1 |",
            "|---|---|---|",
        ]
        out += [
            f"| {_fmt(r['B'])} | {_fmt(r['events_per_sec'], 0)} | {_fmt(r['speedup_vs_B1'], 1)}x |"
            for r in batch
        ]
    if mesh:
        out += [
            "",
            f"Device-mesh weak scaling ({mesh[0]['platform']}, "
            f"{mesh[0]['chains_per_device']} chains/device):",
            "",
            "| devices | events/s | weak-scaling efficiency |",
            "|---|---|---|",
        ]
        out += [
            f"| {r['n_devices']} | {_fmt(r['events_per_sec'], 0)} | {_fmt(r['weak_scaling_efficiency'], 2)} |"
            for r in mesh
        ]
    return "\n".join(out)


def main():
    here = os.path.dirname(os.path.abspath(__file__))
    with open(os.path.join(here, "baseline_results.json")) as f:
        rows = json.load(f)
    print(baseline_table(rows))
    sc = os.path.join(here, "scaling_results.json")
    if os.path.exists(sc):
        with open(sc) as f:
            print()
            print(scaling_table(json.load(f)))


if __name__ == "__main__":
    main()
