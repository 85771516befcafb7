"""Map the traced device ops to source metadata: which HLO fusions are
the DPT resizes, and what do they cost (VERDICT r4 #2 evidence).

Reads perf/trace_dpt_resize's perfetto trace for per-op device time and
the SAME program's compiled HLO text (cached compile) for fusion ->
op_name metadata, then buckets time into resize / conv / attention /
everything-else.

Run: PYTHONPATH=/root/repo:/root/.axon_site python perf/dpt_resize_attrib.py
"""
import collections
import glob
import gzip
import json
import os
import re
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BS, SIZE = 8, 518


def load_trace(root: str) -> dict:
    hits = sorted(glob.glob(root + "/**/*.trace.json.gz", recursive=True))
    assert hits, f"no trace under {root}"
    with gzip.open(hits[-1], "rt") as f:
        return json.load(f)


def per_op_times(data: dict) -> collections.Counter:
    proc, thread = {}, {}
    for e in data.get("traceEvents", []):
        if e.get("ph") == "M" and e.get("name") == "process_name":
            proc[e["pid"]] = e["args"]["name"]
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            thread[(e["pid"], e.get("tid"))] = e["args"]["name"]
    dev = {p for p, n in proc.items()
           if "TPU" in n or "Device" in n or "/device" in n.lower()}
    out = collections.Counter()
    for e in data.get("traceEvents", []):
        if e.get("ph") != "X" or e.get("pid") not in dev:
            continue
        if "step" in thread.get((e["pid"], e.get("tid")), "").lower():
            continue
        out[e["name"]] += e.get("dur", 0)
    return out


def compiled_hlo_text() -> str:
    from enhanced_3d_reconstruction_in_colonoscopy_using_monocular_depth_and_pose_estimation_tpu.models import (  # noqa: E501
        build_depth_model,
    )

    model = build_depth_model("vitl", max_depth=20.0, dtype=jnp.bfloat16)
    shapes = jax.eval_shape(
        lambda r: model.init(r, jnp.zeros((1, SIZE, SIZE, 3)))["params"],
        jax.random.PRNGKey(0))
    params = jax.tree.map(lambda s: jnp.full(s.shape, 0.01, s.dtype),
                          shapes)
    x = jnp.zeros((BS, SIZE, SIZE, 3), jnp.float32)

    def many(p, img):
        def body(_, acc):
            return jnp.mean(model.apply({"params": p}, img + acc * 1e-9))
        return jax.lax.fori_loop(0, 20, body, jnp.float32(0))

    return jax.jit(many).lower(params, x).compile().as_text()


def fusion_metadata(hlo: str) -> dict[str, str]:
    """fusion name -> the most informative op_name metadata inside it."""
    meta: dict[str, list[str]] = collections.defaultdict(list)
    cur = None
    for line in hlo.splitlines():
        m = re.match(r"\s*%?([\w.\-]+)\s*=.*(?:fusion|custom-call)", line)
        if "fused_computation" in line or line.startswith("%fused"):
            m2 = re.match(r"%([\w.\-]+)", line.strip())
            cur = m2.group(1) if m2 else None
        names = re.findall(r'op_name="([^"]+)"', line)
        if cur and names:
            meta[cur].extend(names)
    return {k: v for k, v in meta.items()}


def main() -> None:
    trace_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "trace_dpt_resize")
    times = per_op_times(load_trace(trace_dir))
    total = sum(times.values())
    print(f"total device time: {total/1e3:.2f} ms over "
          f"{len(times)} distinct ops")

    hlo = compiled_hlo_text()
    # Direct per-instruction metadata: name -> op_name for top ops.
    inst_meta = {}
    for line in hlo.splitlines():
        m = re.match(r"\s*(?:ROOT\s+)?%?([\w.\-]+)\s*=", line)
        names = re.findall(r'op_name="([^"]+)"', line)
        if m and names:
            inst_meta.setdefault(m.group(1), names[0])

    # Container spans (the jit program + the fori while) overlap every
    # per-op event — drop them so buckets sum to real device-op time.
    times = collections.Counter({
        op: d for op, d in times.items()
        if not op.startswith("jit_") and not op.startswith("while")})
    total = sum(times.values())
    print(f"per-op device time (containers excluded): {total/1e3:.2f} ms")

    # resize_align_corners lowers to einsums tagged with their equation
    # (ow,bhwc->bhoc / oh,bhwc->bowc); the DPT tap-resize stack is the
    # resize_N module scope; antialias input resize has its own scope.
    RESIZE = ("ow,bhwc", "oh,bhwc", "bhoc", "bowc", "resize")
    buckets = collections.Counter()
    unknown = collections.Counter()
    resize_ops = []
    for op, dur in times.items():
        tag = inst_meta.get(op, "")
        low = tag.lower()
        if any(p in low for p in RESIZE):
            buckets["resize(+taps)"] += dur
            resize_ops.append((dur, op, tag))
        elif "flash" in low or "attn" in low:
            buckets["attention"] += dur
        elif "conv" in low or op.startswith("convolution"):
            buckets["conv"] += dur
        elif "einsum" in low or "dot" in low or op.startswith("dot"):
            buckets["matmul-other"] += dur
        else:
            buckets["other"] += dur
            unknown[f"{op} [{tag[:90]}]"] += dur
    iters = 20
    print(f"(trace covers {iters} forwards — divide by {iters} for "
          f"per-forward ms)")
    for k, v in buckets.most_common():
        print(f"{v/1e3:10.2f} ms total  {v/1e3/iters:7.2f} ms/fwd "
              f"{100*v/max(total,1):5.1f}%  {k}")
    print("\n# top unattributed/other ops:")
    for name, dur in unknown.most_common(15):
        print(f"{dur/1e3:10.2f} ms  {name}")
    print("\n# top resize ops (total over 20 fwd):")
    for dur, op, tag in sorted(resize_ops, reverse=True)[:20]:
        print(f"{dur/1e3:10.2f} ms  {op}  [{tag[:110]}]")


if __name__ == "__main__":
    main()
