"""Summarize a jax.profiler perfetto trace by source line.

    python scripts/analyze_trace.py /tmp/st_trace_pallas
"""

import collections
import glob
import gzip
import json
import sys


def main(root):
    path = sorted(glob.glob(f"{root}/plugins/profile/*/perfetto_trace.json.gz"))[-1]
    data = json.loads(gzip.open(path).read())
    events = data["traceEvents"] if isinstance(data, dict) else data
    names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            names[(e["pid"], e["tid"])] = e["args"]["name"]
    ops = [e for e in events if e.get("ph") == "X"
           and names.get((e.get("pid"), e.get("tid"))) == "XLA Ops"]
    mods = [e for e in events if e.get("ph") == "X"
            and names.get((e.get("pid"), e.get("tid"))) == "XLA Modules"]
    steps = [e["dur"] / 1e3 for e in mods if e["name"].startswith("jit_step")]
    n = max(len(steps), 1)
    print("module executions (ms):", [round(d, 1) for d in steps])

    by_src = collections.Counter()
    flops = collections.Counter()
    nbytes = collections.Counter()
    for e in ops:
        src = e["args"].get("source", "?")
        if "custom" in e["name"]:
            src = "PALLAS " + src
        by_src[src] += e["dur"] / n
        flops[src] += int(e["args"].get("model_flops", 0) or 0) / n
        nbytes[src] += int(e["args"].get("raw_bytes_accessed", 0) or 0) / n
    total = sum(by_src.values())
    print(f"per-execution op total: {total/1e3:.1f} ms")
    print(f"{'source':58s} {'ms':>8s} {'%':>5s} {'TF/s':>5s} {'GB/s':>5s}")
    for src, dur in by_src.most_common(20):
        tfs = flops[src] / (dur * 1e-6) / 1e12 if dur else 0
        gbs = nbytes[src] / (dur * 1e-6) / 1e9 if dur else 0
        print(f"{src[-58:]:58s} {dur/1e3:8.2f} {100*dur/total:5.1f} {tfs:5.0f} {gbs:5.0f}")

    # break the heaviest source line down by individual fusion/op name —
    # separates e.g. square attention projections from wide GEGLU GEMMs
    if by_src:
        top_src = by_src.most_common(1)[0][0]
        by_name = collections.Counter()
        nflops = collections.Counter()
        count = collections.Counter()
        for e in ops:
            src = e["args"].get("source", "?")
            if "custom" in e["name"]:
                src = "PALLAS " + src
            if src != top_src:
                continue
            name = e["args"].get("long_name") or e["name"]
            # strip unique fusion ids: "fusion.123" -> shape signature
            key = name.split(" = ")[-1][:110] if " = " in name else name
            by_name[key] += e["dur"] / n
            nflops[key] += int(e["args"].get("model_flops", 0) or 0) / n
            count[key] += 1 / n
        print(f"\ntop line breakdown ({top_src.split('/')[-1]}):")
        for key, dur in by_name.most_common(15):
            tfs = nflops[key] / (dur * 1e-6) / 1e12 if dur else 0
            print(f"  {dur/1e3:7.2f}ms x{count[key]:5.1f} {tfs:5.0f}TF/s  {key[:95]}")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/tmp/st_trace_pallas")
