"""Training/evaluation driver.

Capability parity with reference `processor_v2.py` class Processor: epoch
loop with warmup-gated GAN updates, periodic validation, best-model
checkpointing with reference-style names `epoch_{:06d}_loss_{:.4f}_model`,
resume-by-filename, batch evaluation with FGD/MAE/accel.

TPU-first: the hot loop is one jitted step (train/gan_step.py); the packed
dataset lives on device and per-step batches are gathered there by
host-sampled indices; under a Mesh the same loop runs data-parallel.

Checkpoints are orbax directories holding the full TrainState (G, D, both
Adam states, step) — unlike the reference, which drops optimizer state
(SURVEY §5.4); the "best" selection takes the true minimum positive loss
(the reference's argpartition quirk selects the *second* smallest,
processor_v2.py:58-71 — divergence documented here on purpose).
"""

from __future__ import annotations

import logging
import os
import re
import time
from collections import deque
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
import orbax.checkpoint as ocp
from functools import partial
from jax.sharding import NamedSharding, PartitionSpec as P

from ..config import ModelConfig
from ..data.ted_db import BatchSampler, DeviceBatchSampler, DeviceDataset, PackedDataset
from ..parallel import mesh as pmesh
from . import builder
from .evaluator import EmbeddingSpaceEvaluator, push_sample_metrics
from .logger import TrainLogger
from .losses import AverageMeter

_CKPT_RE = re.compile(r"epoch_(\d+)_loss_(-?[\d.]+)_model$")


def _start_host_copies(metrics) -> None:
    """Kick off the device->host copy of each metric at dispatch time:
    the transfer starts the moment the program finishes on device (fully
    overlapped with the next program's compute), so the lagged drain's
    device_get finds the bytes already en route instead of paying the
    tunnel RTT synchronously."""
    for v in metrics.values():
        try:
            v.copy_to_host_async()
        except (AttributeError, RuntimeError):  # non-jax value / backend quirk
            pass


def parse_checkpoint_name(name: str):
    m = _CKPT_RE.match(name)
    if not m:
        return None
    return int(m.group(1)), float(m.group(2))


def find_checkpoint(work_dir: str, epoch: int | str = "best"):
    """Reference-style resume by directory listing (processor_v2.py:53-83);
    'best' = minimum positive loss (see module docstring on the quirk)."""
    if not os.path.isdir(work_dir):
        return None
    entries = []
    for name in os.listdir(work_dir):
        parsed = parse_checkpoint_name(name)
        if parsed:
            entries.append((name, *parsed))
    if not entries:
        return None
    if epoch == "best":
        positive = [e for e in entries if e[2] > 0]
        pool = positive or entries
        return min(pool, key=lambda e: e[2])
    for e in entries:
        if e[1] == int(epoch):
            return e
    return None


class Trainer:
    """Orchestrates GAN training on packed datasets."""

    def __init__(
        self,
        cfg: ModelConfig,
        work_dir: str,
        train_data: PackedDataset | None = None,
        val_data: PackedDataset | None = None,
        test_data: PackedDataset | None = None,
        use_mesh: bool = False,
        min_train_epochs: int = 20,
        val_interval: int = 1,
        save_interval: int = 10,
        seed: int = 1234,
        evaluator: EmbeddingSpaceEvaluator | None = None,
        variant: str = "s2ag",
        check_finite: bool = True,
        gradient_clip: float = 0.0,
        lr_decay: float = 1.0,
        loader: str = "device",
        trimodal_metric_interval: int = 1,
        mixed_precision: bool = False,
        divreg_draw: str = "permutation",
        fused_pass: bool = False,
        remat: str = "none",
        metrics_lag: int = 8,
        steps_per_program: int = 1,
    ):
        self.cfg = cfg
        self.work_dir = work_dir
        self.logger = TrainLogger(work_dir)
        self.train_data, self.val_data, self.test_data = train_data, val_data, test_data
        self.min_train_epochs = min_train_epochs
        # numeric sanitizer (the TPU-side analog of the reference's
        # torch.autograd.detect_anomaly, processor.py:618): halt on a
        # non-finite loss instead of silently training on garbage
        self.check_finite = check_finite
        self.val_interval = val_interval
        self.save_interval = save_interval
        self.evaluator = evaluator
        # frozen-trimodal comparison metric every K-th train step (1 =
        # every step = reference parity, processor_v2.py:821; the forward
        # is metric-only and costs ~8% of the step, tools/profile_step.py)
        self.trimodal_metric_interval = max(1, trimodal_metric_interval)
        # how many steps of device metrics may stay un-fetched: each
        # float(metrics[...]) is a device->host sync, and over the tunnel
        # the RTT (~30 ms) can exceed the step itself — fetching every
        # step serializes host dispatch against device compute. A small
        # lag lets dispatch run ahead; 0 restores fully synchronous
        # behavior. The drain always leaves the newest dispatched
        # step/program pending so the fetch never blocks on in-flight
        # work (the device keeps its queue non-empty). Pure host
        # scheduling: the numbers logged/accumulated are identical, and
        # check_finite still halts (up to `lag` + one dispatch window
        # after the offending iteration, which the error names).
        self.metrics_lag = max(0, metrics_lag)
        # run K train steps as ONE device program (lax.scan over host-
        # presampled batch indices, the batch gather inlined in-program):
        # one dispatch + one metrics fetch per K steps instead of per step.
        # Same index/speaker/rng draw sequence and same step formulas as
        # the per-step loop, equal to float rounding (XLA compiles the scan
        # body with different fusion choices — see _get_multi_step);
        # check_finite granularity coarsens to the program (the error still
        # names the exact iter). Opt-in; default 1 = bit-level parity.
        # Requires the single-device device-resident loader (falls back
        # with a warning otherwise — see __init__ tail).
        self.steps_per_program = max(1, steps_per_program)

        ref = train_data or val_data or test_data
        n_words = ref.lang_model.n_words if ref and ref.lang_model else 1000
        n_speakers = (
            ref.speaker_model.n_words if ref and ref.speaker_model else 100
        )
        word_embeddings = (
            ref.lang_model.word_embedding_weights if ref and ref.lang_model else None
        )
        steps_per_epoch = 0
        if train_data is not None and train_data.n_samples >= cfg.batch_size:
            steps_per_epoch = train_data.n_samples // cfg.batch_size
        if lr_decay != 1.0 and train_data is not None and steps_per_epoch == 0:
            # tiny datasets (< one batch) would otherwise silently disable a
            # decay the user explicitly asked for
            logging.warning(
                "--apply-lr-decay requested but the train split (%d samples) "
                "is smaller than the batch size (%d); treating each batch as "
                "one epoch for the decay schedule",
                train_data.n_samples, cfg.batch_size,
            )
            steps_per_epoch = 1
        setup = builder.init_training(
            cfg, jax.random.key(max(seed, 0)), n_words=n_words,
            n_speakers=n_speakers, word_embeddings=word_embeddings,
            variant=variant,
            gradient_clip=gradient_clip, lr_decay=lr_decay,
            decay_steps_per_epoch=steps_per_epoch if lr_decay != 1.0 else 0,
            mixed_precision=mixed_precision,
            divreg_draw=divreg_draw,
            fused_pass=fused_pass,
            remat=remat,
        )
        self.variant = variant
        self.gen, self.dis, self.tri = setup["gen"], setup["dis"], setup["tri"]
        self.state = setup["state"]
        self.train_step = setup["train_step"]
        # the UNWRAPPED step: the scanned epoch inlines it inside its own
        # program (under a mesh, input shardings — replicated state +
        # 'data'-sharded batch — drive the partitioning there, so the
        # host-side device_put wrapper below must not be traced into it)
        self._raw_train_step = setup["train_step"]
        self.eval_step = setup["eval_step"]
        self.gan_cfg = setup["gan_cfg"]

        self.mesh = None
        if use_mesh and len(jax.devices()) > 1:
            self.mesh = pmesh.make_mesh()
            self.state = pmesh.replicate_state(self.state, self.mesh)
            self.train_step = pmesh.data_parallel_step(self.train_step, self.mesh)
            self.eval_step = pmesh.data_parallel_step(self.eval_step, self.mesh)

        # keep the packed train split resident in HBM and gather batches
        # there (no per-step H2D). Under a mesh the arrays are replicated
        # across the devices so the scanned epoch's in-program gather can
        # run data-parallel (see DeviceDataset); the per-step loop under a
        # mesh keeps the host sampler + sharded device_put path.
        self._device_train = None
        if train_data is not None:
            try:
                self._device_train = DeviceDataset(train_data, mesh=self.mesh)
            except Exception:
                self._device_train = None

        self.rng = jax.random.key(seed if seed >= 0 else int(time.time()))
        self.best_loss = np.inf
        self.best_loss_epoch = 0
        self.epoch = 0
        self._ckptr = ocp.StandardCheckpointer()

        # optional grain input pipeline (multiprocess prefetch + mid-epoch
        # checkpointable iterator state; data/grain_loader.py). The iterator
        # is persistent across epochs so its get_state() captures the exact
        # position in the shuffled stream.
        self.loader_kind = loader
        self._seed = seed
        self._grain_iter = None
        self._iter_in_epoch = 0
        if loader == "grain" and train_data is not None:
            from ..data import grain_loader

            self._grain_loader = grain_loader.make_data_loader(
                train_data, cfg.batch_size, seed=max(seed, 0), num_epochs=None,
            )
            self._grain_iter = iter(self._grain_loader)
        elif loader not in ("device", "grain"):
            raise ValueError(f"unknown loader {loader!r} (device|grain)")

        # surfaced fallback (round-4 verdict item 6): when the scanned
        # epoch is requested but ineligible, the reason is kept on the
        # trainer, stamped into every epoch log line, and exported by
        # artifact emitters (bench.py composed block, dress_rehearsal) —
        # a silent engine downgrade invalidates perf claims
        self.epoch_engine_fallback: str | None = None
        if (self.steps_per_program > 1 and train_data is not None
                and not self._use_scanned_epoch()):
            self.epoch_engine_fallback = (
                f"steps_per_program={self.steps_per_program} requested but "
                "the scanned epoch needs the 'device' loader, "
                "trimodal_metric_interval=1, and (on a mesh) batch_size "
                "divisible by the data axis; fell back to the per-step loop"
            )
            logging.warning("%s", self.epoch_engine_fallback)
            self.steps_per_program = 1

    # ------------------------------------------------------------- epochs
    @property
    def epoch_engine(self) -> str:
        """Which epoch driver actually runs: 'scanned' (K steps per device
        program via lax.scan) or 'per_step'. Artifact emitters record this
        so a requested-but-ineligible steps_per_program never silently
        downgrades a perf claim (see epoch_engine_fallback for the why)."""
        return "scanned" if self._use_scanned_epoch() else "per_step"

    def _next_rng(self):
        self.rng, sub = jax.random.split(self.rng)
        return sub

    def _put(self, batch: dict):
        if self.mesh is not None:
            return pmesh.shard_batch(batch, self.mesh)
        return jax.device_put(batch)

    def _epoch_batches(self, max_iters: int | None = None):
        """(iteration, batch) stream for one epoch under the active loader.

        grain: pulls from the persistent checkpointable iterator, resuming
        at `self._iter_in_epoch` after a mid-epoch restore; device/host:
        a fresh per-epoch sampler (epoch-granular resume, like the
        reference's)."""
        if self.loader_kind == "grain" and self._grain_iter is not None:
            steps = max(1, self.train_data.n_samples // self.cfg.batch_size)
            stop = steps if max_iters is None else min(
                steps, self._iter_in_epoch + max_iters
            )
            for i in range(self._iter_in_epoch, stop):
                yield i, next(self._grain_iter)
                self._iter_in_epoch = i + 1
            if self._iter_in_epoch >= steps:
                self._iter_in_epoch = 0
            return
        if self._device_train is not None and self.mesh is None:
            # (under a mesh the per-step loop keeps the host decode +
            # sharded device_put path — decode_rows rescales audio through
            # a float64 intermediate, the device gather through f32, so
            # switching the source would perturb the established per-step
            # mesh numerics; the scanned epoch uses the device arrays)
            sampler = DeviceBatchSampler(
                self.train_data, self.cfg.batch_size,
                seed=self.epoch * 7919 + 1, device_dataset=self._device_train,
            )
        else:
            sampler = BatchSampler(
                self.train_data, self.cfg.batch_size,
                seed=self.epoch * 7919 + 1,
            )
        for i, batch in enumerate(sampler):
            if max_iters is not None and i >= max_iters:
                return
            yield i, batch

    # ------------------------------------- K-steps-per-program epoch scan
    def _use_scanned_epoch(self) -> bool:
        """The scanned epoch needs the device-resident loader (the program
        gathers batches from HBM by index) and a per-program-constant
        trimodal gate (tri_metric is static inside the scan body; interval
        1 = reference parity = the default). It composes with the data
        mesh: the dataset is replicated, the index vectors are sharded
        over 'data', so the in-program gather comes out batch-sharded —
        the batch size just has to divide the data axis."""
        if (self.steps_per_program <= 1
                or self.loader_kind != "device"
                or self._device_train is None
                or self.trimodal_metric_interval != 1):
            return False
        if self.mesh is not None:
            n_data = self.mesh.shape.get("data", 1)
            if self.cfg.batch_size % max(n_data, 1) != 0:
                return False
        return True

    def _get_multi_step(self):
        """One jitted program running K train steps: lax.scan over host-
        presampled (batch-index, adversarial-speaker) pairs, with the
        per-step rng chain carried inside the scan (see the inline comment
        in multi_step) and the device gather inlined in the body. Dispatch
        and the metrics fetch amortize over K. The body inlines the exact per-step train_step on
        the exact per-step draw streams, but XLA compiles a while-loop body
        with different fusion/scheduling choices than the standalone step
        program, so values agree only to float rounding (measured ~1e-7
        relative on step-1 losses; verified NOT fixable by
        optimization_barrier at the gather/step boundaries — the rounding
        moves inside the step's own ops). GAN dynamics amplify any epsilon
        chaotically downstream, hence opt-in with default 1 = bit-level
        parity with the per-step loop, the same policy as --fused-pass /
        --mixed-precision. tests/test_steps_per_program.py pins the draw
        streams and the rounding-level agreement."""
        if getattr(self, "_multi_step", None) is not None:
            return self._multi_step
        gather = self._device_train.gather_fn
        # the RAW step: under a mesh the wrapped step's host-side
        # device_puts must not be traced into the program — sharding
        # propagates from the inputs (replicated state/arrays, idx/adv
        # sharded over 'data') instead
        step = self._raw_train_step
        mesh = self.mesh
        batch_shard = (
            NamedSharding(mesh, P("data")) if mesh is not None else None
        )

        @partial(jax.jit, static_argnames=("gan_on",), donate_argnums=(0,))
        def multi_step(state, arrays, idx, adv, rng, gan_on):
            # the per-step rng chain (`self.rng, sub = split(self.rng)`)
            # runs INSIDE the program: the same split ops in the same
            # order produce bit-identical sub keys, while the host stops
            # paying K tiny split dispatches + a jnp.stack of K keys per
            # program (the stack alone measured ~10 ms on this host —
            # more than half the scanned epoch's host residual)
            def body(carry, xs):
                s, r = carry
                i, a = xs
                r, sub = jax.random.split(r)
                batch = gather(arrays, i, a)
                if batch_shard is not None:
                    # pin the gather output to the data-parallel layout
                    # (replicated operand + 'data'-sharded indices already
                    # propagate this, the constraint makes it load-bearing)
                    batch = jax.tree.map(
                        lambda x: jax.lax.with_sharding_constraint(
                            x, batch_shard), batch)
                s, m = step(s, batch, sub, gan_on=gan_on, tri_metric=True)
                return (s, r), m

            (state, rng), metrics = jax.lax.scan(
                body, (state, rng), (idx, adv))
            return state, rng, metrics

        self._multi_step = multi_step
        return multi_step

    def _run_scanned_epoch(self, gan_on: bool, consume, max_iters):
        """Epoch driver for steps_per_program > 1. Host draws follow the
        exact per-step order (index draw, then adversarial-speaker draw —
        per step), so the sampled stream matches the per-step loop element
        for element; the rng split chain runs inside the device program
        (same split ops, same order → bit-identical sub keys)."""
        bs = self.cfg.batch_size
        sampler = BatchSampler(self.train_data, bs,
                               seed=self.epoch * 7919 + 1)
        steps = sampler.pseudo_passes()
        if max_iters is not None:
            steps = min(steps, max_iters)
        arrays = self._device_train.arrays
        multi_step = self._get_multi_step()
        idx_shard = None
        if self.mesh is not None:
            # index/adv vectors sharded over 'data' (axis 1 = the batch);
            # each device gathers its own batch rows from its replica
            idx_shard = NamedSharding(self.mesh, P(None, "data"))
            self.rng = jax.device_put(self.rng, pmesh.replicated(self.mesh))
        pending: deque = deque()  # (first_iter, k, stacked metrics)
        pend_steps = 0

        def drain(keep: int = 0):
            # fetch all pending programs EXCEPT the newest `keep`: a
            # device_get on the just-dispatched program blocks the host
            # until the device finishes it, leaving the device with an
            # empty queue (idle) during the next host sample+dispatch.
            # Keeping the newest program pending means the block (if any)
            # lands on already-finished work and the device always has the
            # next program enqueued behind it.
            nonlocal pend_steps
            items = [pending.popleft() for _ in range(len(pending) - keep)]
            pend_steps = sum(k for _, k, _ in pending)
            fetched = jax.device_get([m for *_, m in items])
            for (start, k, _), m in zip(items, fetched):
                for j in range(k):
                    consume(start + j, {key: v[j] for key, v in m.items()})

        done = 0
        while done < steps:
            k = min(self.steps_per_program, steps - done)
            idx = np.empty((k, bs), np.int32)
            adv = np.empty((k, bs), np.int32)
            for j in range(k):
                row = sampler.sample_indices()
                idx[j] = row
                adv[j] = sampler.adversarial_speakers(
                    self.train_data.vid_indices[row]
                )
            if idx_shard is not None:
                idx_d = jax.device_put(idx, idx_shard)
                adv_d = jax.device_put(adv, idx_shard)
            else:
                idx_d, adv_d = jnp.asarray(idx), jnp.asarray(adv)
            self.state, self.rng, metrics = multi_step(
                self.state, arrays, idx_d, adv_d, self.rng, gan_on=gan_on,
            )
            _start_host_copies(metrics)
            pending.append((done, k, metrics))
            pend_steps += k
            done += k
            if self.metrics_lag == 0:
                drain()  # fully synchronous, as documented
            elif len(pending) > 1 and pend_steps - k > self.metrics_lag:
                drain(keep=1)
        if pending:
            drain()
        return done

    def per_train_epoch(self, log_interval: int = 50,
                        max_iters: int | None = None) -> float:
        gan_on = self.epoch > self.gan_cfg.loss_warmup
        total, n = 0.0, 0
        start = time.time()
        tri_every = self.trimodal_metric_interval
        total_l1, n_l1 = 0.0, 0

        def consume(i, metrics):
            # first touch of the step's metrics = the device->host sync
            nonlocal total, n, total_l1, n_l1
            if self.check_finite and not np.isfinite(float(metrics["s2ag_l1"])):
                bad = {k: float(v) for k, v in metrics.items()}
                raise FloatingPointError(
                    f"non-finite training loss at epoch {self.epoch} iter {i}: {bad}"
                )
            # the epoch mean must be ONE metric: with an interval-gated
            # trimodal comparison only the steps that computed it contribute
            # (blending the differential with absolute s2ag_l1 on gated
            # steps would make the mean depend on the interval); the s2ag_l1
            # mean is the fallback when no comparator exists at all
            if "s2ag_vs_trimodal_l1" in metrics:
                total, n = total + float(metrics["s2ag_vs_trimodal_l1"]), n + 1
            total_l1, n_l1 = total_l1 + float(metrics["s2ag_l1"]), n_l1 + 1
            if i % log_interval == 0:
                line = " | ".join(
                    f"{k}: {float(v):.4f}" for k, v in metrics.items()
                )
                self.logger.print_log(f"\tIter {i} Done. | {line}")

        pending: deque = deque()

        def drain(keep: int = 0):
            # every pending step's metrics in ONE device->host transfer:
            # a float() on a device scalar pays a full tunnel RTT (~30 ms
            # here — 2x the step itself), and consume() reads several
            # keys, so per-key fetches made the user-level epoch rate
            # 4-8x slower than the jitted step rate. jax.device_get
            # issues all copies before blocking, so a drain costs one
            # RTT per metrics_lag steps (measured: tools/bench_epoch.py).
            # `keep` leaves the newest steps pending so the fetch never
            # blocks on the just-dispatched step — the device keeps work
            # enqueued behind the one the host is waiting on.
            # Values, order, and per-step check_finite/logging semantics
            # are unchanged — only fetch granularity moves.
            items = [pending.popleft() for _ in range(len(pending) - keep)]
            fetched = jax.device_get([m for _, m in items])
            for (i, _), m in zip(items, fetched):
                consume(i, m)

        if self._use_scanned_epoch():
            self._run_scanned_epoch(gan_on, consume, max_iters)
        else:
            for i, batch in self._epoch_batches(max_iters):
                self.state, metrics = self.train_step(
                    self.state, self._put(batch), self._next_rng(),
                    gan_on=gan_on,
                    tri_metric=(tri_every == 1 or i % tri_every == 0),
                )
                _start_host_copies(metrics)
                pending.append((i, metrics))
                if self.metrics_lag == 0:
                    drain()  # fully synchronous, as documented
                elif len(pending) > self.metrics_lag:
                    drain(keep=1)
            if pending:
                drain()
        if n == 0:  # no trimodal comparator anywhere this epoch
            total, n = total_l1, n_l1
        self.logger.print_log(
            f"epoch {self.epoch} train: mean_s2ag_loss {total / max(n,1):.4f} "
            f"({time.time() - start:.1f}s, {n_l1} iters, "
            f"engine {self.epoch_engine})"
        )
        return total / max(n, 1)

    def per_val_epoch(self) -> float:
        sampler = BatchSampler(self.val_data, self.cfg.batch_size, seed=999)
        gan_on = self.epoch > self.gan_cfg.loss_warmup
        total, n = 0.0, 0
        collected = []
        for batch in sampler:
            _, metrics = self.eval_step(
                self.state, self._put(batch), self._next_rng(), gan_on=gan_on
            )
            # defer the device->host sync: one drain for the whole val
            # epoch instead of one ~30 ms tunnel RTT per batch (same
            # values, same mean — pure fetch granularity)
            collected.append(metrics)
        for metrics in jax.device_get(collected):
            total += float(metrics.get("s2ag_vs_trimodal_l1", metrics["s2ag_l1"]))
            n += 1
        mean = total / max(n, 1)
        self.logger.print_log(f"epoch {self.epoch} val: mean_s2ag_loss {mean:.4f}")
        return mean

    def train(self, epochs: int | None = None):
        epochs = epochs or self.cfg.epochs
        for self.epoch in range(self.epoch, epochs):
            train_loss = self.per_train_epoch()
            save = (self.epoch % self.save_interval == 0)
            epoch_loss = train_loss
            if self.val_data is not None and self.epoch % self.val_interval == 0:
                val_loss = self.per_val_epoch()
                epoch_loss = val_loss
                if val_loss < self.best_loss and self.epoch > self.min_train_epochs:
                    self.best_loss = val_loss
                    self.best_loss_epoch = self.epoch
                    save = True
            if save:
                # stamp THIS epoch's loss (the reference stamps the epoch's
                # mean loss, processor_v2.py:1066-1069) so best-checkpoint
                # selection by filename stays meaningful
                self.save_checkpoint(epoch_loss)

    # -------------------------------------------------------- checkpoints
    def _ckpt_name(self, loss: float) -> str:
        return f"epoch_{self.epoch:06d}_loss_{loss:.4f}_model"

    def save_checkpoint(self, loss: float):
        path = os.path.join(os.path.abspath(self.work_dir), self._ckpt_name(loss))
        state = jax.device_get(self.state)
        self._ckptr.save(path, state, force=True)
        self._ckptr.wait_until_finished()
        self._save_sidecar(path)
        self.logger.print_log(f"saved checkpoint {path}")

    def _save_sidecar(self, ckpt_path: str):
        """Data-pipeline + RNG state next to the orbax dir: makes the resume
        bit-exact mid-epoch with the grain loader (a capability the
        reference lacks — its resume is epoch-granular filename parsing,
        processor_v2.py:53-83)."""
        import base64
        import json

        sidecar = {
            "iter_in_epoch": self._iter_in_epoch,
            "rng_key_data": np.asarray(
                jax.random.key_data(self.rng)
            ).tolist(),
        }
        if self._grain_iter is not None:
            sidecar["grain_state"] = base64.b64encode(
                self._grain_iter.get_state()
            ).decode("ascii")
            # grain validates repr(sampler) (incl. its seed) on set_state;
            # record the seed so restore can rebuild an identical loader
            # even when the resuming Trainer was constructed differently
            sidecar["grain_seed"] = max(self._seed, 0)
        with open(ckpt_path + "_datastate.json", "w") as f:
            json.dump(sidecar, f)

    def _restore_sidecar(self, ckpt_path: str) -> bool:
        import base64
        import json

        path = ckpt_path + "_datastate.json"
        if not os.path.exists(path):
            return False
        with open(path) as f:
            sidecar = json.load(f)
        self._iter_in_epoch = int(sidecar.get("iter_in_epoch", 0))
        key_data = sidecar.get("rng_key_data")
        if key_data is not None:
            self.rng = jax.random.wrap_key_data(
                np.asarray(key_data, np.uint32)
            )
        if self._grain_iter is not None and "grain_state" in sidecar:
            saved_seed = int(sidecar.get("grain_seed", max(self._seed, 0)))
            if saved_seed != max(self._seed, 0):
                from ..data import grain_loader

                self._grain_loader = grain_loader.make_data_loader(
                    self.train_data, self.cfg.batch_size, seed=saved_seed,
                    num_epochs=None,
                )
                self._grain_iter = iter(self._grain_loader)
                self._seed = saved_seed
            self._grain_iter.set_state(
                base64.b64decode(sidecar["grain_state"])
            )
        return True

    def load_checkpoint(self, epoch: int | str = "best") -> bool:
        found = find_checkpoint(self.work_dir, epoch)
        if not found:
            self.logger.print_log("Warning! No saved model found.")
            return False
        name, ckpt_epoch, loss = found
        path = os.path.join(os.path.abspath(self.work_dir), name)
        restored = self._ckptr.restore(path, target=jax.device_get(self.state))
        self.state = jax.device_put(restored)
        if self.mesh is not None:
            self.state = pmesh.replicate_state(self.state, self.mesh)
        self.epoch = ckpt_epoch
        self.best_loss, self.best_loss_epoch = loss, ckpt_epoch
        self._restore_sidecar(path)
        self.logger.print_log(f"restored {name}")
        return True

    def load_torch_checkpoint(self, path: str):
        """Ingest a reference .pth.tar ({'gen_model_dict','dis_model_dict'})."""
        from ..convert import torch_ckpt

        blob = torch_ckpt.load_pth_tar(path)
        gen_vars, dis_vars = torch_ckpt.convert_s2ag_checkpoint(blob)
        self.state = self.state.replace(
            gen_params=gen_vars["params"], gen_stats=gen_vars["batch_stats"],
            dis_params=dis_vars["params"], dis_stats=dis_vars["batch_stats"],
        )
        self.logger.print_log(f"converted torch checkpoint {path}")

    def load_trimodal_torch_checkpoint(self, path: str):
        """Ingest the frozen TriModal baseline weights
        (outputs/trimodal_gen.pth.tar, key 'trimodal_gen_dict';
        ref processor_v2.py:1033-1034)."""
        from ..convert import torch_ckpt

        blob = torch_ckpt.load_pth_tar(path)
        params, stats = torch_ckpt.pose_generator_trimodal(
            blob["trimodal_gen_dict"]
        )
        self.state = self.state.replace(tri_params=params, tri_stats=stats)
        self.logger.print_log(f"converted trimodal checkpoint {path}")

    # ------------------------------------------------------------- eval
    def generate_gestures(self, batch_size: int = 2048, randomized: bool = True,
                          seed: int = 0, full_test: bool = False) -> dict[str, Any]:
        """Batch evaluation on the test split: L1 / FGD / joint MAE / accel
        (ref generate_gestures, processor_v2.py:1071-1142).

        The reference scores one random draw of <= 2048 samples; with
        full_test=True the WHOLE test split is scored in batch_size chunks
        (FGD Gaussians fitted over every sample) — a framework improvement
        over the reference's single-draw estimate."""
        ds = self.test_data
        rng = np.random.default_rng(seed)
        if full_test:
            idx_all = np.arange(ds.n_samples)
        else:
            n = min(batch_size, ds.n_samples)
            idx_all = (rng.choice(ds.n_samples, n, replace=False) if randomized
                       else np.arange(n))
        from ..data.ted_db import decode_rows

        speaker_pool = sorted(ds.speaker_model.word2index.values())
        n_dev = 1
        if self.mesh is not None:
            # batch must divide the data axis (mesh >= 2 devices)
            n_dev = self.mesh.shape.get("data", len(self.mesh.devices))

        losses_all = AverageMeter("loss")
        joint_mae = AverageMeter("mae")
        accel = AverageMeter("accel")
        n_scored = 0
        n_dropped = 0
        for start in range(0, len(idx_all), batch_size):
            idx = idx_all[start:start + batch_size]
            if n_dev > 1:
                keep = (len(idx) // n_dev) * n_dev
                n_dropped += len(idx) - keep
                idx = idx[:keep]
                if len(idx) == 0:
                    break
            n_scored += len(idx)
            batch = decode_rows(ds, idx)
            # eval uses uniformly random speakers (ref processor_v2.py:724-726)
            batch["vid_indices"] = rng.choice(
                speaker_pool, len(idx)
            ).astype(np.int32)
            out, _metrics = self.eval_step(
                self.state, self._put(batch), self._next_rng(),
                gan_on=self.epoch > self.gan_cfg.loss_warmup,
            )
            push_sample_metrics(
                batch["vec_seq"], np.asarray(out), self.cfg.mean_dir_vec_array,
                losses_all, joint_mae, accel, self.cfg.n_pre_poses,
                self.evaluator,
            )
        if n_dropped:
            # mesh evaluation rounds each chunk down to a multiple of the
            # data-axis size; never let that silently hide test samples
            logging.warning(
                "eval dropped %d of %d samples to align with the %d-device "
                "data axis", n_dropped, len(idx_all), n_dev,
            )
        if n_scored == 0:
            raise RuntimeError(
                f"eval scored 0 samples ({len(idx_all)} available, "
                f"{n_dev}-device data axis) — metrics would be meaningless"
            )
        result = {
            "l1": losses_all.avg,
            "joint_mae": joint_mae.avg,
            "accel": accel.avg,
        }
        if self.evaluator is not None and self.evaluator.get_no_of_samples() > 0:
            fgd, feat_dist = self.evaluator.get_scores()
            result["FGD"] = fgd
            result["feat_dist"] = feat_dist
            self.evaluator.reset()
        self.logger.print_log(
            "eval: " + " | ".join(f"{k}: {v:.4f}" for k, v in result.items())
        )
        return result
