"""Capture an XLA profiler trace of the Stage-I train step and summarise op costs.

Writes a trace with jax.profiler, then parses the .trace.json.gz event file
and prints the top-k XLA ops by total self time, grouped by fusion name.
This is the ground truth for deciding what to hand-fuse (Pallas) next.

Usage: python tools/trace_stage1.py [--bf16] [--out /tmp/nero_trace]

CAVEAT: under the axon TPU tunnel jax.profiler.start_trace has been observed
to hang before writing any trace; the targeted component timers
(tools/profile_stage1.py, tools/profile_core_parts.py) are the reliable
decomposition path in this environment. Kept for environments with a local
TPU runtime.
"""
import argparse
import glob
import gzip
import json
import os
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def capture(out_dir, bf16):
    import jax
    import jax.numpy as jnp
    import optax
    from nero_tpu.models.shape import NeROShapeModel

    cfg = {
        "name": "trace_stage1", "network": "shape",
        "database_name": "proc/sphere/128_16",
        "train_ray_num": 512, "occ_loss_step": 20000,
        "loss": ["nerf_render", "eikonal", "std", "init_sdf_reg", "occ"],
        "key_metric_name": "psnr", "bf16_hidden": bf16,
    }
    model = NeROShapeModel(cfg, training=True)
    opt = optax.adam(1e-3)
    step_fn = model.make_train_step(opt, donate=False)
    params, opt_state = model.params, opt.init(model.params)
    data = model.train_data
    key = jax.random.PRNGKey(0)
    step_idx = jnp.asarray(25000)

    for i in range(10):
        params, opt_state, log = step_fn(params, opt_state,
                                         jax.random.fold_in(key, i), step_idx, data)
    float(log["loss_total"])

    jax.profiler.start_trace(out_dir)
    for i in range(5):
        params, opt_state, log = step_fn(params, opt_state,
                                         jax.random.fold_in(key, 100 + i), step_idx, data)
    float(log["loss_total"])
    jax.profiler.stop_trace()


def summarise(out_dir, top_k=40):
    paths = glob.glob(f"{out_dir}/**/*.trace.json.gz", recursive=True)
    if not paths:
        print("no trace file found under", out_dir)
        return
    path = max(paths, key=os.path.getmtime)
    with gzip.open(path, "rt") as f:
        trace = json.load(f)
    events = trace.get("traceEvents", [])
    # keep only complete events on device lanes (TensorFlow op / XLA op rows)
    pid_names = {e["pid"]: e["args"].get("name", "") for e in events
                 if e.get("ph") == "M" and e.get("name") == "process_name"}
    totals = defaultdict(float)
    counts = defaultdict(int)
    for e in events:
        if e.get("ph") != "X":
            continue
        pname = pid_names.get(e.get("pid"), "")
        if "TPU" not in pname and "tpu" not in pname and "/device" not in pname:
            continue
        name = e.get("name", "")
        totals[name] += e.get("dur", 0.0)
        counts[name] += 1
    total_all = sum(totals.values())
    print(f"trace: {path}")
    print(f"total device-op time: {total_all/1e3:.2f} ms over 5 steps "
          f"({total_all/5e3:.2f} ms/step)")
    for name, dur in sorted(totals.items(), key=lambda kv: -kv[1])[:top_k]:
        print(f"{dur/5e3:8.3f} ms/step  x{counts[name]//5:<4d} {name[:110]}")


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--bf16", action="store_true")
    parser.add_argument("--out", type=str, default="/tmp/nero_trace")
    parser.add_argument("--parse_only", action="store_true")
    flags = parser.parse_args()
    if not flags.parse_only:
        capture(flags.out, flags.bf16)
    summarise(flags.out)


if __name__ == "__main__":
    main()
