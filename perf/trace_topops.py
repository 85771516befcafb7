"""Aggregate device-op durations from a jax.profiler perfetto trace.

Usage: python perf/trace_topops.py <trace_dir_or_json.gz> [top_n]

Sums wall duration per op name across TPU device tracks (pid/tid whose
track name mentions TPU/device XLA ops) and prints the top-N. Useful to
see which HLOs dominate a step without opening perfetto.
"""
import collections
import glob
import gzip
import json
import sys


def load(path: str) -> dict:
    if not path.endswith(".json.gz"):
        hits = sorted(glob.glob(path + "/**/*.trace.json.gz", recursive=True))
        assert hits, f"no trace.json.gz under {path}"
        path = hits[-1]
    print(f"# {path}")
    with gzip.open(path, "rt") as f:
        return json.load(f)


def main() -> None:
    data = load(sys.argv[1])
    top_n = int(sys.argv[2]) if len(sys.argv) > 2 else 30
    events = data.get("traceEvents", [])
    # name the process/thread tracks
    proc_names: dict = {}
    thread_names: dict = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            proc_names[e["pid"]] = e["args"]["name"]
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            thread_names[(e["pid"], e.get("tid"))] = e["args"]["name"]

    device_pids = {pid for pid, n in proc_names.items()
                   if "TPU" in n or "Device" in n or "/device" in n.lower()}
    print("# tracks:", {pid: proc_names[pid] for pid in sorted(proc_names)})

    per_op = collections.Counter()
    per_track: dict = collections.defaultdict(collections.Counter)
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in device_pids:
            continue
        tname = thread_names.get((e["pid"], e.get("tid")), "?")
        if "step" in tname.lower():  # steptrace summary track, not ops
            continue
        dur = e.get("dur", 0)
        per_op[e["name"]] += dur
        per_track[tname][e["name"]] += dur

    total = sum(per_op.values())
    print(f"# total device-op time: {total / 1e3:.2f} ms "
          f"(all events, {len(per_op)} distinct ops)")
    for name, dur in per_op.most_common(top_n):
        print(f"{dur / 1e3:10.2f} ms  {100 * dur / max(total, 1):5.1f}%  {name}")


if __name__ == "__main__":
    main()
