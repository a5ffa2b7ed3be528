"""Trace-attribute the f32 headline's roofline gap (VERDICT r4 next #4).

The headline ENS f32 chunk128 step measures 473 ms against a 286 ms HBM
bound (PERF_PROBE.json roofline_ens16_f32_chunk128 / exec_ens16_f32_
chunk128) — ~60% of roofline. This tool captures a jax.profiler device
trace of the EXACT shipped program (3-step variant — per-step work is
identical per scan iteration) and reports where the step time actually
goes, grouped by op category, into PERF_PROBE.json trace_ens16_f32_
chunk128.

The xplane.pb trace is decoded with `protoc --decode_raw` (no tensorboard
profile plugin in this image): XPlane tag map (tsl/profiler xplane.proto)
  plane: name(2), lines(3), event_metadata(4: key(1), value: id(1) name(2))
  line:  events(8? varies) — events carry metadata_id(1), offset(2),
         duration_ps(3)
Durations are summed per metadata name over the TPU device plane only.

Modes:
  python tools/trace_probe.py capture   # trace + decode + record
  python tools/trace_probe.py decode /tmp/i2v_trace  # re-decode only
"""

import glob
import json
import os
import re
import subprocess
import sys
import time
from collections import defaultdict

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from i2v_tpu.utils.paths import compile_cache_dir  # noqa: E402

jax.config.update("jax_compilation_cache_dir", compile_cache_dir())

TRACE_DIR = "/tmp/i2v_trace"


def _decode_raw(path: str) -> str:
    out = subprocess.run(["protoc", "--decode_raw"], stdin=open(path, "rb"),
                         capture_output=True, text=True)
    if out.returncode != 0:
        raise RuntimeError(f"protoc --decode_raw failed: {out.stderr[:200]}")
    return out.stdout


class _Node:
    __slots__ = ("fields",)

    def __init__(self):
        self.fields = defaultdict(list)


def _parse_raw(text: str):
    """Parse protoc --decode_raw output into a nested field-number tree."""
    root = _Node()
    stack = [root]
    for line in text.splitlines():
        line = line.strip()
        if not line:
            continue
        if line == "}":
            stack.pop()
            continue
        m = re.match(r"^(\d+)\s*{$", line)
        if m:
            child = _Node()
            stack[-1].fields[int(m.group(1))].append(child)
            stack.append(child)
            continue
        m = re.match(r"^(\d+):\s*(.*)$", line)
        if m:
            tag, val = int(m.group(1)), m.group(2)
            if val.startswith('"'):
                val = val[1:-1]
            stack[-1].fields[tag].append(val)
    return root


def _planes(space):
    return space.fields.get(1, [])


def attribute(trace_dir: str) -> dict:
    """Sum event durations per op-metadata name on the device plane(s)."""
    pbs = glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"),
                    recursive=True)
    if not pbs:
        raise FileNotFoundError(f"no *.xplane.pb under {trace_dir!r}")
    per_name = defaultdict(float)
    plane_names = []
    for pb in pbs:
        space = _parse_raw(_decode_raw(pb))
        for plane in _planes(space):
            if not isinstance(plane, _Node):
                continue
            pname = next((v for v in plane.fields.get(2, [])
                          if isinstance(v, str)), "")
            plane_names.append(pname)
            # device planes are named like "/device:TPU:0" (host plane is
            # "/host:CPU"); keep TPU planes only
            if "TPU" not in pname.upper():
                continue
            # event metadata: field 4 entries are map pairs key(1)→value(2)
            meta = {}
            for ent in plane.fields.get(4, []):
                if not isinstance(ent, _Node):
                    continue
                key = ent.fields.get(1, [None])[0]
                val = ent.fields.get(2, [None])[0]
                if isinstance(val, _Node):
                    name = next((v for v in val.fields.get(2, [])
                                 if isinstance(v, str)), str(key))
                    meta[str(key)] = name
            for ln in plane.fields.get(3, []):
                if not isinstance(ln, _Node):
                    continue
                # keep only the FLAT per-op line: module/step lines nest
                # the whole program (while-loops contain their children),
                # so summing across all lines double-counts ~3×
                lname = next((v for v in ln.fields.get(2, [])
                              if isinstance(v, str)), "")
                if lname != "XLA Ops":
                    continue
                for tag, items in ln.fields.items():
                    for ev in items:
                        if not isinstance(ev, _Node):
                            continue
                        mid = ev.fields.get(1, [None])[0]
                        dur = ev.fields.get(3, [None])[0]
                        if mid is None or dur is None or \
                                isinstance(dur, _Node):
                            continue
                        try:
                            per_name[meta.get(str(mid), str(mid))] += \
                                float(dur)
                        except (TypeError, ValueError):
                            pass
    return {"per_name_ps": dict(per_name), "planes": plane_names}


CATEGORIES = [
    ("convolution", r"%convolution|%conv"),
    ("select-and-scatter (maxpool bwd)", r"select.and.scatter"),
    ("copy/transpose", r"%copy|transpose"),
    ("all-reduce/collectives", r"all-reduce|collective|reduce-scatter"),
    ("dynamic-slice/update (chunk loop)", r"dynamic.?(update.?)?slice"),
    ("reduce", r"%reduce"),
    ("dot", r"%dot|matmul"),
    ("infeed/outfeed/host", r"infeed|outfeed|host"),
    ("fusion (conv+elementwise mixes)", r"fusion"),
]

# control-flow/bookkeeping wrappers whose durations are INCLUSIVE of their
# children on the XLA Ops line — summing them double-counts the program
_WRAPPERS = re.compile(
    r"^%?(while|call|conditional|tuple|parameter|get-tuple-element"
    r"|bitcast[^-]|jit_|\d+$)")


def _leaves(per_name_ps: dict) -> dict:
    return {k: v for k, v in per_name_ps.items()
            if not _WRAPPERS.match(k.strip("%").lower())
            and not k.startswith("%while")}


def categorize(per_name_ps: dict) -> list:
    cat = defaultdict(float)
    for name, ps in _leaves(per_name_ps).items():
        low = name.lower()
        for label, pat in CATEGORIES:
            if re.search(pat, low):
                cat[label] += ps
                break
        else:
            cat["other"] += ps
    total = sum(cat.values()) or 1.0
    rows = sorted(cat.items(), key=lambda kv: -kv[1])
    return [{"category": k, "ms": round(v / 1e9, 2),
             "pct": round(100 * v / total, 1)} for k, v in rows]


_SHAPE = re.compile(r"\[([\d,]+)\]")


def by_resolution(per_name_ps: dict) -> list:
    """Bucket leaf-op time by the spatial resolution of the op's RESULT
    shape (parsed from the HLO text) — maps the time directly onto network
    depth: 224² ops are the surrogate stems (VGG/AlexNet early convs +
    pixel-domain rebuild), 112²/56² the mid-trunk, etc."""
    buckets = defaultdict(float)
    for name, ps in _leaves(per_name_ps).items():
        m = _SHAPE.search(name)
        label = "no-shape"
        if m:
            dims = [int(d) for d in m.group(1).split(",") if d]
            spatial = [d for d in dims if d in (224, 112, 56, 28, 14, 7)]
            if len(spatial) >= 2:
                label = f"{spatial[0]}x{spatial[1]}"
            elif dims and max(dims) <= 512 and len(dims) <= 2:
                label = "scalar/small"
            else:
                label = "other-shape"
        buckets[label] += ps
    total = sum(buckets.values()) or 1.0
    rows = sorted(buckets.items(), key=lambda kv: -kv[1])
    return [{"resolution": k, "ms": round(v / 1e9, 2),
             "pct": round(100 * v / total, 1)} for k, v in rows]


def top_ops(per_name_ps: dict, n: int = 15) -> list:
    rows = sorted(_leaves(per_name_ps).items(), key=lambda kv: -kv[1])[:n]
    return [{"op": k[:120], "ms": round(v / 1e9, 2)} for k, v in rows]


def capture() -> None:
    import numpy as np

    from i2v_tpu.models import get_image_models
    from i2v_tpu.parallel import attack_mesh, shard_clips
    from i2v_tpu.parallel.sharded import make_sharded_i2v_runner
    from tools.perf_probe import record

    ENS_NAMES = ["resnet", "vgg", "squeezenet", "alexnet"]
    ENS_DEPTHS = {"resnet": 2, "vgg": 3, "squeezenet": 2, "alexnet": 3}
    steps = 3
    mesh = attack_mesh(jax.devices()[:1])
    models = get_image_models(ENS_NAMES, ENS_DEPTHS, input_hw=224,
                              dtype=jnp.float32)
    runner = make_sharded_i2v_runner(models, mesh, steps=steps,
                                     step_size=0.005, frame_chunk=128)
    clean = shard_clips(jnp.full((16, 3, 32, 224, 224), 0.5, jnp.float32),
                        mesh)
    print("[trace] compiling + warm run...", flush=True)
    t0 = time.time()
    _, costs = runner(clean)
    float(np.asarray(costs)[-1])
    print(f"[trace] warm {time.time() - t0:.1f}s; tracing...", flush=True)
    os.makedirs(TRACE_DIR, exist_ok=True)
    jax.profiler.start_trace(TRACE_DIR)
    t0 = time.time()
    _, costs = runner(clean)
    final = float(np.asarray(costs)[-1])
    dt = time.time() - t0
    jax.profiler.stop_trace()
    print(f"[trace] traced run {dt:.1f}s final={final:.1f}", flush=True)
    summarize(dt, steps)


def summarize(wall_s: float, steps: int) -> None:
    from tools.perf_probe import record

    attr = attribute(TRACE_DIR)
    cats = categorize(attr["per_name_ps"])
    tops = top_ops(attr["per_name_ps"])
    res = by_resolution(attr["per_name_ps"])
    device_total_ms = sum(r["ms"] for r in cats)
    payload = {
        "steps_traced": steps,
        "traced_wall_s": round(wall_s, 2),
        "device_leaf_total_ms": round(device_total_ms, 1),
        "per_step_device_ms": round(device_total_ms / steps, 1),
        "categories": cats,
        "by_resolution": res,
        "top_ops": tops,
        "planes": attr["planes"][:8],
        "note": "jax.profiler xplane decoded via protoc --decode_raw; "
                "LEAF op durations (control-flow wrappers excluded — their "
                "XLA-Ops-line times are inclusive) summed per op on the "
                "TPU plane; 3-step variant of the exact headline chunk128 "
                "program (per-step scan body identical to the shipped "
                "60-step run; totals also include the one-time clean-tap "
                "collection, so per_step is a mild overestimate)",
    }
    record("trace_ens16_f32_chunk128", payload)
    print(json.dumps({"categories": cats, "top_ops": tops[:8]}, indent=1))


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "capture"
    if mode == "capture":
        capture()
    elif mode == "decode":
        trace_dir = sys.argv[2] if len(sys.argv) > 2 else TRACE_DIR
        globals()["TRACE_DIR"] = trace_dir
        summarize(float("nan"), 3)
    else:
        print("usage: trace_probe.py [capture|decode [dir]]")


if __name__ == "__main__":
    main()
