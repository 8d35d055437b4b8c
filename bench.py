"""Benchmark: full s2ag GAN train-step throughput + MFU on the available device.

Runs the complete adversarial step (D update + G update with Huber/KLD/
diversity/ns-GAN, 3 generator forwards + 3 discriminator forwards + 2
backwards — exactly the work of reference forward_pass_s2ag,
processor_v2.py:776-957) at the paper's full configuration (hidden 300,
4-layer bi-GRUs) across batch sizes, and prints ONE JSON line carrying
steps/s at the paper batch (128), the best samples/s configuration, and
MFU from XLA's compiled cost analysis.

vs_baseline: the reference publishes no numbers (BASELINE.md); the recorded
comparator is the same full GAN step implemented with the reference's own
torch modules on CPU (1 core) in this container, measured by
tools/bench_torch_baseline.py — recorded for provenance, NOT a GPU-parity
claim. The key is named vs_torch_cpu_1core in the payload to prevent
misreading; vs_baseline mirrors it because the driver requires that key.
"""

import json
import os
import time

import numpy as np

import jax

from speech2affective_gestures_tpu.config import ModelConfig
from speech2affective_gestures_tpu.train import builder

# steps/sec of the reference's own modules running the same step on
# torch-CPU in this container (1 CPU thread) — tools/bench_torch_baseline.py
TORCH_CPU_BASELINE_STEPS_PER_SEC = float(
    os.environ.get("S2AG_BASELINE_STEPS_PER_SEC", "0.132")
)

HEADLINE_BATCH = int(os.environ.get("S2AG_BENCH_BATCH", "128"))
SWEEP_BATCHES = tuple(
    int(b) for b in os.environ.get("S2AG_BENCH_SWEEP", "128,256").split(",")
)
WARMUP = 3
ITERS = 20

# peak dense-matmul throughput per chip (bf16 FLOP/s) for MFU accounting;
# jax.devices()[0].device_kind -> peak. Sources: public TPU spec sheets.
PEAK_FLOPS = {
    "TPU v5 lite": 197e12,   # v5e: 197 bf16 TFLOP/s
    "TPU v5e": 197e12,
    "TPU v5": 459e12,        # v5p
    "TPU v4": 275e12,
    "TPU v6 lite": 918e12,   # v6e (Trillium)
}


def _cost_flops(train_step, state, batch, key):
    """FLOPs of one compiled train step from XLA cost analysis."""
    try:
        lowered = train_step.lower(state, batch, key, gan_on=True)
        cost = lowered.compile().cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        return float(cost.get("flops", 0.0)) or None
    except Exception:
        return None


def _measure(train_step, state, batch, key):
    for _ in range(WARMUP):
        key, sub = jax.random.split(key)
        state, _ = train_step(state, batch, sub, gan_on=True)
    jax.block_until_ready(state)
    # the TPU tunnel's latency varies between runs; report the best of
    # several timing windows to measure the hardware, not the interference
    best_dt = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(ITERS):
            key, sub = jax.random.split(key)
            state, _ = train_step(state, batch, sub, gan_on=True)
        jax.block_until_ready(state)
        best_dt = min(best_dt, time.perf_counter() - t0)
    return ITERS / best_dt, key


def main():
    cfg = ModelConfig()  # full paper config
    setup = builder.init_training(
        cfg, jax.random.key(0), n_words=1000, n_speakers=100
    )
    state = setup["state"]
    train_step = setup["train_step"]
    key = jax.random.key(1)

    device_kind = jax.devices()[0].device_kind
    peak = PEAK_FLOPS.get(device_kind)

    results = {}
    flops_128 = None
    for bs in sorted(set(SWEEP_BATCHES) | {HEADLINE_BATCH}):
        batch = jax.device_put(builder.synthetic_batch(
            np.random.default_rng(0), bs, cfg, 1000, 100
        ))
        steps_per_sec, key = _measure(train_step, state, batch, key)
        flops = _cost_flops(train_step, state, batch, key)
        results[bs] = {
            "steps_per_sec": steps_per_sec,
            "samples_per_sec": steps_per_sec * bs,
            "flops_per_step": flops,
            "mfu": (flops * steps_per_sec / peak) if (flops and peak) else None,
        }
        if bs == HEADLINE_BATCH:
            flops_128 = flops

    head = results[HEADLINE_BATCH]
    best_bs = max(results, key=lambda b: results[b]["samples_per_sec"])
    best = results[best_bs]
    steps_per_sec = head["steps_per_sec"]
    payload = {
        "metric": f"gan_train_steps_per_sec_bs{HEADLINE_BATCH}",
        "value": round(steps_per_sec, 3),
        "unit": "steps/s",
        "vs_baseline": round(
            steps_per_sec / TORCH_CPU_BASELINE_STEPS_PER_SEC, 2
        ),
        "baseline_kind": "torch_cpu_1core_same_step",
        "vs_torch_cpu_1core": round(
            steps_per_sec / TORCH_CPU_BASELINE_STEPS_PER_SEC, 2
        ),
        "device_kind": device_kind,
        "samples_per_sec": round(head["samples_per_sec"], 1),
        "mfu": round(head["mfu"], 4) if head["mfu"] else None,
        "flops_per_step": flops_128,
        "best_config": {
            "batch_size": best_bs,
            "steps_per_sec": round(best["steps_per_sec"], 3),
            "samples_per_sec": round(best["samples_per_sec"], 1),
            "mfu": round(best["mfu"], 4) if best["mfu"] else None,
        },
    }
    print(json.dumps(payload))


if __name__ == "__main__":
    main()
