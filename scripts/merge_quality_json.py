"""Merge separately-run halves of a quality_same_data comparison.

The two halves (torch v1.2 on CPU, nerf_tpu via --skip-torch [--chip])
run as independent processes on this single-core box; this stitches
their JSONs into one artifact and prints the equal-step comparison.

Usage: python scripts/merge_quality_json.py jax.json torch.json out.json
"""

from __future__ import annotations

import json
import sys


def main() -> None:
    jax_path, torch_path, out_path = sys.argv[1:4]
    jj = json.load(open(jax_path))
    tt = json.load(open(torch_path))
    merged = {"config": jj["config"], "nerf_tpu": jj["nerf_tpu"]}
    if "torch_v12" in tt:
        merged["torch_v12"] = tt["torch_v12"]
        merged["torch_config"] = tt.get("config", {})
    notes = jj.get("notes", [])
    merged["notes"] = notes
    with open(out_path, "w") as f:
        json.dump(merged, f, indent=2)
    tcurve = dict(merged.get("torch_v12", {}).get("curve", []))
    jcurve = dict(merged["nerf_tpu"]["curve"])
    print(f"{'step':>6} {'torch_v12':>10} {'nerf_tpu':>10}")
    for s in sorted(jcurve):
        t = tcurve.get(s)
        print(f"{s:>6} {t if t is None else f'{t:10.2f}'} "
              f"{jcurve[s]:10.2f}")


if __name__ == "__main__":
    main()
