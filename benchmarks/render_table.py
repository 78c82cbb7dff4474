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
        single = r.get("single_chain_events_per_sec")
        spd = r.get("parallel_speedup")
        acc = r.get("mean_acceptance")
        out.append(
            "| {config} | {B} | {ne} | **{eps}** | {single} | {spd} | {ess} | {rh} | {acc} |".format(
                config=r["config"].replace("_", r"\_"),
                B=_fmt(r["chains"]),
                ne=_fmt(r["events_per_chain"]),
                eps=_fmt(r["events_per_sec"], 0),
                single=_fmt(single, 0) if single is not None else "—",
                spd=(_fmt(spd, 0) + "x") if spd is not None else "—",
                ess=_fmt(r["ess_per_sec_worst_coord"], 0),
                rh=("yes (%.3f)" % r["rhat_max"]) if r["rhat_ok"]
                else ("n/a*" if "note" in r else "no (%.3f)" % r["rhat_max"]),
                acc=_fmt(acc, 3) if acc is not None else "—",
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
    for platform in ("tpu", "cpu"):
        pm = [r for r in mesh if r["platform"] == platform]
        if not pm:
            continue
        label = ("Device-mesh, real TPU ({} chains/device; a 1-chip mesh "
                 "runs at the unsharded per-chip rate — scale-out adds no "
                 "per-device overhead)" if platform == "tpu" else
                 "Device-mesh, 8-VIRTUAL-device CPU host ({} chains/device; "
                 "virtual devices share one physical CPU, so wall-clock "
                 "'efficiency' here measures host-core contention, not ICI "
                 "scaling — the multi-chip linear-scaling claim is the "
                 "compile-checked absence of collectives in the fill, "
                 "tests/test_parallel.py)").format(
                     pm[0]["chains_per_device"])
        out += [
            "",
            label + ":",
            "",
            "| devices | events/s | weak-scaling efficiency |",
            "|---|---|---|",
        ]
        out += [
            f"| {r['n_devices']} | {_fmt(r['events_per_sec'], 0)} | {_fmt(r['weak_scaling_efficiency'], 2)} |"
            for r in pm
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
