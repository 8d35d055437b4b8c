"""Benchmark: full s2ag GAN train-step throughput on the available device.

Runs the complete adversarial step (D update + G update with Huber/KLD/
diversity/ns-GAN, 3 generator forwards + 3 discriminator forwards + 2
backwards — exactly the work of reference forward_pass_s2ag,
processor_v2.py:776-957) at the paper's full configuration (batch 128,
hidden 300, 4-layer bi-GRUs) and prints ONE JSON line.

vs_baseline: the reference publishes no numbers (BASELINE.md); the recorded
comparator is the same full GAN step implemented with torch-CPU modules of
identical architecture, measured in this container via
tools/bench_torch_baseline.py. Re-run that tool to refresh the constant.
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

BATCH_SIZE = int(os.environ.get("S2AG_BENCH_BATCH", "128"))
WARMUP = 3
ITERS = 20


def main():
    cfg = ModelConfig()  # full paper config
    setup = builder.init_training(
        cfg, jax.random.key(0), n_words=1000, n_speakers=100
    )
    state = setup["state"]
    train_step = setup["train_step"]
    batch = builder.synthetic_batch(
        np.random.default_rng(0), BATCH_SIZE, cfg, 1000, 100
    )
    batch = jax.device_put(batch)

    key = jax.random.key(1)
    for i in range(WARMUP):
        key, sub = jax.random.split(key)
        state, metrics = train_step(state, batch, sub, gan_on=True)
    jax.block_until_ready(state)

    # the TPU tunnel's latency varies between runs; report the best of
    # several timing windows to measure the hardware, not the interference
    best_dt = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for i in range(ITERS):
            key, sub = jax.random.split(key)
            state, metrics = train_step(state, batch, sub, gan_on=True)
        jax.block_until_ready(state)
        best_dt = min(best_dt, time.perf_counter() - t0)

    steps_per_sec = ITERS / best_dt
    print(json.dumps({
        "metric": "gan_train_steps_per_sec_bs128",
        "value": round(steps_per_sec, 3),
        "unit": "steps/s",
        "vs_baseline": round(steps_per_sec / TORCH_CPU_BASELINE_STEPS_PER_SEC, 2),
    }))


if __name__ == "__main__":
    main()
