"""Summarize an xplane trace: top HLO ops by self time.

Usage:
    SSDT_BENCH_PROFILE=/tmp/prof SSDT_BENCH_ITERS=5 python bench.py
    python lab/xplane_ops.py /tmp/prof [N]

Parses the .xplane.pb with xprof's framework_op_stats converter (the same
backend the TensorBoard profile plugin uses) and prints the top-N ops by
total self time plus a category rollup — the round-2 "where the time goes"
table was hand-assembled; this makes it reproducible.
"""

from __future__ import annotations

import csv
import glob
import io
import sys


def load_op_stats(profile_dir: str, tool: str = "framework_op_stats"):
    """Returns list-of-dicts from xprof's gviz-JSON table output."""
    import json

    from xprof.convert import raw_to_tool_data

    paths = sorted(glob.glob(f"{profile_dir}/**/*.xplane.pb", recursive=True))
    if not paths:
        raise SystemExit(f"no .xplane.pb under {profile_dir}")
    data, _ = raw_to_tool_data.xspace_to_tool_data([paths[-1]], tool, {})
    if isinstance(data, bytes):
        data = data.decode()
    tables = json.loads(data)
    if isinstance(tables, dict):
        tables = [tables]
    rows = []
    for table in tables:
        cols = [c["id"] for c in table.get("cols", [])]
        for r in table.get("rows", []):
            vals = [c.get("v") if isinstance(c, dict) else c for c in r["c"]]
            rows.append(dict(zip(cols, vals)))
    return rows


def main():
    profile_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/prof"
    top_n = int(sys.argv[2]) if len(sys.argv) > 2 else 40

    rows = load_op_stats(profile_dir)
    # Device-side ops only; host rows have host_or_device == 'Host'
    dev = [r for r in rows
           if str(r.get("host_or_device", "")).lower() != "host"]

    def f(r, key):
        try:
            return float(r.get(key) or 0)
        except (TypeError, ValueError):
            return 0.0

    total = sum(f(r, "total_self_time") for r in dev)
    dev.sort(key=lambda r: -f(r, "total_self_time"))

    print(f"device total self time: {total/1e3:.1f} ms "
          f"(over the whole traced window, all steps)")
    print(f"{'self_ms':>9} {'%':>5} {'occ':>6}  {'type':<18} op")
    for r in dev[:top_n]:
        ms = f(r, "total_self_time") / 1e3
        print(f"{ms:9.2f} {100*f(r, 'total_self_time')/max(total,1e-9):5.1f} "
              f"{int(f(r, 'occurrences')):6d}  {str(r.get('type','')):<18} "
              f"{str(r.get('operation',''))[:90]}")

    cats: dict[str, float] = {}
    for r in dev:
        c = str(r.get("type", "?"))
        cats[c] = cats.get(c, 0.0) + f(r, "total_self_time")
    print("\noperation-type rollup:")
    for c, us in sorted(cats.items(), key=lambda kv: -kv[1]):
        print(f"{us/1e3:9.2f} ms {100*us/max(total,1e-9):5.1f}%  {c}")


if __name__ == "__main__":
    main()
