"""Capture a jax.profiler device trace of the flagship x4 train step and
print the top ops by self time.

Round-4 motivation: rounds 2-3 located time via marginal ablations only
(scripts/profile_step.py) because isolated micro-benchmarks over-read
through the device relay (~3 ms dispatch floor, CLAUDE.md).  A device
trace, if the axon runtime exports one, gives op-level attribution for the
~84 ms step without ablation arithmetic.

Parses the TensorBoard-format ``*.trace.json.gz`` (chrome trace events)
that jax.profiler writes — no tensorflow / tensorboard_plugin_profile
needed.

Run: PYTHONPATH=/root/.axon_site:/root/repo timeout 900 \
        python scripts/trace_step.py /tmp/sradsgan_trace
"""

import collections
import glob
import gzip
import json
import sys
import time

import numpy as np


def capture(logdir: str, model: str = "sradsgan:4"):
    import jax
    from sradsgan_tpu.core.cache import enable_compilation_cache
    enable_compilation_cache()
    from sradsgan_tpu.core.config import config_for_model
    from sradsgan_tpu.parallel.mesh import shard_batch
    from sradsgan_tpu.train.trainer import Trainer

    name, _, scale = model.partition(":")
    scale = int(scale or 4)
    cfg = config_for_model(name, scale)
    cfg.data.synthetic = True
    cfg.data.crop_size = 216
    cfg.data.batch_size = 16
    cfg.save_dir = "/tmp/sradsgan_trace_run"
    trainer = Trainer(cfg)
    rng = np.random.default_rng(0)
    lr = 216 // scale
    batch = shard_batch({
        "lr": rng.random((16, lr, lr, 3)).astype(np.float32),
        "hr": rng.random((16, 216, 216, 3)).astype(np.float32),
        "bc": rng.random((16, 216, 216, 3)).astype(np.float32),
    }, trainer.mesh)
    key = jax.random.PRNGKey(0)

    state = trainer.state
    for _ in range(3):  # compile + settle
        state, out = trainer._jit_step(state, batch, key)
    float(out["loss_G"])  # hard sync (CLAUDE.md timing rule)

    with jax.profiler.trace(logdir):
        for _ in range(5):
            state, out = trainer._jit_step(state, batch, key)
        float(out["loss_G"])
    print("trace captured", flush=True)


def analyze(logdir: str, top: int = 40):
    paths = sorted(glob.glob(f"{logdir}/**/*.trace.json.gz", recursive=True),
                   key=lambda p: -len(p))
    if not paths:
        print("NO trace.json.gz found under", logdir)
        for p in glob.glob(f"{logdir}/**/*", recursive=True):
            print("  ", p)
        return
    path = paths[0]
    with gzip.open(path, "rt") as f:
        data = json.load(f)
    events = data.get("traceEvents", [])
    # keep complete events from device lanes (pid names containing TPU / device)
    pid_names = {}
    tid_names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_names[e["pid"]] = e["args"].get("name", "")
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            tid_names[(e["pid"], e["tid"])] = e["args"].get("name", "")
    per_op = collections.Counter()
    per_op_n = collections.Counter()
    total = 0.0
    device_pids = {p for p, n in pid_names.items()
                   if any(s in n.lower() for s in ("tpu", "device", "xla",
                                                   "axon"))}
    for e in events:
        if e.get("ph") != "X":
            continue
        pid = e.get("pid")
        if device_pids and pid not in device_pids:
            continue
        dur = e.get("dur", 0)
        name = e.get("name", "?")
        per_op[name] += dur
        per_op_n[name] += 1
        total += dur
    print(f"# trace {path}")
    print(f"# pids: {pid_names}")
    print(f"# total device-event time {total/1e3:.1f} ms over 5 steps")
    for name, dur in per_op.most_common(top):
        print(f"{dur/1e3:9.2f} ms  x{per_op_n[name]:<5d} {name[:140]}")


if __name__ == "__main__":
    logdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sradsgan_trace"
    model = next((a.split("=", 1)[1] for a in sys.argv
                  if a.startswith("--model=")), "sradsgan:4")
    if "--analyze-only" not in sys.argv:
        t0 = time.time()
        capture(logdir, model)
        print(f"# capture wall {time.time()-t0:.0f}s")
    analyze(logdir)
