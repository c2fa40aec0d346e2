"""Trainers: one jit-compiled, mesh-sharded train step per mode + host
control loop.

The reference's four near-identical trainers (ref: trainer/trainer_asr.py,
trainer_mt.py, trainer_st.py, trainer_asr_st.py) collapse into one Trainer
parameterised by mode; thin subclasses keep the reference class names.

Distributed execution (new component — the reference is strictly
single-device, ref: utils/misc.py:124-133): when more than one device is
visible (or ``n_model`` > 1 is requested) the trainer builds a
(data, model) `jax.sharding.Mesh`, places params with the Megatron-style
NamedShardings from `parallel/mesh.py`, shards each macro-batch's minibatch
axis over 'data', and lets GSPMD insert the grad all-reduce and TP
collectives onto ICI. On a single chip the path is plain `jax.jit`.

What moved on-device: the whole grad-accumulation loop (the reference's
host-side minibatch partition, ref: trainer_asr.py:219-275) runs as a
lax.scan inside a single jitted step — per-minibatch forward, masked NLL,
grad accumulation, global-norm clip, Adam update, LR write. The host keeps
what must stay host-side: epoch shuffling, checkpoint-on-improve, rollback +
LR-halving + early stop (ref: trainer_asr.py:288-513).
"""

from __future__ import annotations

import logging
import os
import sys
import time
from functools import partial
from typing import Dict, List, Optional

import numpy as np

import jax
import jax.numpy as jnp
import optax

from stjep_tpu.config import PAD, ModelConfig
from stjep_tpu.models.seq2seq import forward_eval, forward_train
from stjep_tpu.ops.losses import nll_loss_masked, normalise
from stjep_tpu.ops.masks import round_up8
from stjep_tpu.train.checkpoint import Checkpoint
from stjep_tpu.train.optim import make_optimizer, reference_lr, set_lr
from stjep_tpu.train.policies import apply_load_mode, trainable_mask
from stjep_tpu.utils.metrics import corpus_bleu
from stjep_tpu.utils.misc import add2corpus, get_memory_alloc
from stjep_tpu.utils import misc as _misc

logging.basicConfig(level=logging.INFO)


class _ScalarWriter:
    """TensorBoard writer when torch is importable, JSONL always."""

    def __init__(self, log_dir: str):
        os.makedirs(log_dir, exist_ok=True)
        self._jsonl = open(os.path.join(log_dir, "scalars.jsonl"), "a")
        self._tb = None
        try:
            from torch.utils.tensorboard import SummaryWriter

            self._tb = SummaryWriter(log_dir=log_dir)
        except Exception:
            pass

    def add_scalar(self, tag: str, value, global_step: int = 0):
        import json

        self._jsonl.write(
            json.dumps({"tag": tag, "value": float(value), "step": int(global_step)})
            + "\n"
        )
        self._jsonl.flush()
        if self._tb is not None:
            self._tb.add_scalar(tag, value, global_step=global_step)


class Trainer:
    """Base trainer (ref: trainer/trainer_base.py:23-443)."""

    MODE = "ASR"  # overridden by subclasses
    DATA_KEY = "asr"

    def __init__(
        self,
        expt_dir="experiment",
        load_dir=None,
        load_mode="null",
        load_freeze=False,
        checkpoint_every=100,
        print_every=100,
        batch_size=256,
        use_gpu=False,
        gpu_id=0,
        learning_rate=0.00001,
        learning_rate_init=0.0005,
        lr_warmup_steps=16000,
        max_grad_norm=1.0,
        eval_with_mask=True,
        max_count_no_improve=2,
        max_count_num_rollback=2,
        keep_num=1,
        normalise_loss=True,
        loss_coeff=None,
        minibatch_partition=1,
        seed=333,
        acous_bucket=256,
        n_model=1,
        feat_dtype=None,
        device_cache="auto",
        train_window=1,
    ):
        self.checkpoint_every = checkpoint_every
        self.print_every = print_every
        self.loss_coeff = loss_coeff or {"nll_asr": 1.0, "nll_mt": 1.0, "nll_st": 1.0}
        self.learning_rate = learning_rate
        self.learning_rate_init = learning_rate_init
        self.lr_warmup_steps = lr_warmup_steps
        if self.lr_warmup_steps <= 0:
            assert self.learning_rate == self.learning_rate_init
        self.max_grad_norm = max_grad_norm
        self.eval_with_mask = eval_with_mask
        self.max_count_no_improve = max_count_no_improve
        self.max_count_num_rollback = max_count_num_rollback
        self.keep_num = keep_num
        self.normalise_loss = normalise_loss
        if not os.path.isabs(expt_dir):
            expt_dir = os.path.join(os.getcwd(), expt_dir)
        self.expt_dir = expt_dir
        os.makedirs(self.expt_dir, exist_ok=True)
        self.load_dir = load_dir
        self.load_mode = load_mode or "null"
        self.load_freeze = bool(load_freeze)
        self.logger = logging.getLogger(__name__)
        self.writer = _ScalarWriter(self.expt_dir)
        self.minibatch_partition = max(1, minibatch_partition)
        self.batch_size = batch_size
        self.minibatch_size = max(1, int(self.batch_size / self.minibatch_partition))
        self.seed = seed
        self.acous_bucket = acous_bucket  # shape-bucketing granularity
        # hardware RNG on TPU: threefry dropout-mask generation costs real
        # VPU time at flagship shapes (see utils/misc.root_key)
        self._root_rng = _misc.root_key(seed)
        # one jitted step per static acoustic time-bucket (None = the
        # bucket lives in the staged array's shape, not a static arg)
        self._step_fns: Dict = {}
        self._eval_fn_cache: Dict = {}
        self._lr_curr = learning_rate_init
        self.n_model = max(1, int(n_model))
        # host-side staging dtype for acoustic features (None = keep the
        # loader's float32). bf16 halves the H2D bytes of the dominant
        # tensor; numerically free in bf16-param mode since the first
        # consumer is an MXU matmul that reads bf16 operands regardless.
        # int8 quarters them: per-utterance symmetric quantization on host,
        # dequantized at the top of the jitted step (data/device_cache.py).
        if feat_dtype in ("bfloat16", jnp.bfloat16):
            import ml_dtypes

            feat_dtype = ml_dtypes.bfloat16
        elif feat_dtype == "int8":
            feat_dtype = np.int8
        self.feat_dtype = np.dtype(feat_dtype) if feat_dtype else None
        # epoch-persistent on-device feature cache (data/device_cache.py):
        # upload the whole corpus once (int8 when feat_dtype is int8) and
        # assemble minibatches inside the step with a gather — steady-state
        # feature H2D drops to the row indices. "auto" (default) enables it
        # when the estimated corpus footprint fits the free-HBM budget
        # (measured 2.9x e2e win when it does, ROADMAP #18); True forces,
        # False disables. Both auto and True fall back to per-step staging
        # if the upload itself fails.
        if isinstance(device_cache, str):
            dc = device_cache.strip().lower()
            assert dc in ("auto", "true", "false"), device_cache
            device_cache = "auto" if dc == "auto" else dc == "true"
        self.device_cache = device_cache
        # multi-step window executor: with the device cache active, run K
        # consecutive steps as one jitted lax.scan (see _build_window_step);
        # 1 (the default) disables. Only effective on the device-cache path —
        # elsewhere the per-step feature H2D dominates and windows buy
        # nothing — and measured flat vs single-step on this tunnel
        # (ROADMAP #20) while compiling ~3.7x slower, hence default-off.
        self.train_window = max(1, int(train_window))
        self._feat_caches: Dict = {}
        self._feat_cache = None
        self._feat_dequant = np.dtype(np.float32)  # set from params in train()
        self._mesh = None

    # ----------------------------------------------------------- batches

    def _device_batch(self, item: Dict[str, np.ndarray], pad_to: int):
        """Pad the macro batch to a fixed row count (static shapes) and
        reshape to [n_mini, mini, ...]. Padded rows are all-PAD -> masked out
        of every loss."""
        B = item["srcid"].shape[0]
        mini = self.minibatch_size
        # pad up to a multiple of the minibatch size: the reference runs a
        # ragged final minibatch when mini doesn't divide the batch
        # (ref: trainer_asr.py:215-216, e.g. the CLI defaults 64/20 -> 3);
        # here the extra rows are all-PAD and masked out of every loss
        n_rows = ((max(pad_to, B) + mini - 1) // mini) * mini
        out = {}
        for k, v in item.items():
            pad_width = [(0, n_rows - B)] + [(0, 0)] * (v.ndim - 1)
            out[k] = np.pad(v, pad_width) if B < n_rows else v
        if "acous_feat" in out:
            # bucket the time axis so XLA compiles one train step per bucket
            # instead of one per distinct batch length
            from stjep_tpu.ops.masks import bucket_length

            v = out["acous_feat"]
            T = bucket_length(v.shape[1], self.acous_bucket)
            if T > v.shape[1]:
                out["acous_feat"] = np.pad(
                    v, [(0, 0), (0, T - v.shape[1]), (0, 0)])
        n_mini = n_rows // mini
        for k, v in out.items():
            out[k] = v.reshape((n_mini, mini) + v.shape[1:])
        # reference divisor: ceil(real_B / mini) (ref: trainer_asr.py:215-216)
        n_real = B // mini + int(B % mini > 0)
        return out, float(n_real)

    # -------------------------------------------------------- train step

    def _head_losses(self, cfg: ModelConfig, out, mb, inv_n):
        """Per-head masked NLL with the reference's normalise/coeff/n_mini
        scaling. Returns (total, report_dict)."""
        losses = {"nll_loss_en": 0.0, "nll_loss_de": 0.0}
        total = 0.0
        mode = self.MODE

        def head(logps, targets, coeff):
            V = logps.shape[-1]
            mask = targets != PAD
            s, norm = nll_loss_masked(
                logps.reshape(-1, V), targets.reshape(-1), mask.reshape(-1)
            )
            if not self.eval_with_mask:
                s = -jnp.sum(
                    jnp.take_along_axis(
                        logps.reshape(-1, V), targets.reshape(-1)[:, None], axis=1
                    )
                )
                norm = jnp.asarray(targets.size, jnp.float32)
            loss = normalise(s, norm) if self.normalise_loss else s
            return loss * coeff * inv_n

        def head_picked(picked, targets, coeff):
            # identical NLL math over pre-gathered log-softmax values
            # (forward_train ref_pick): picked[i] == logps[i, targets[i]]
            mask = (targets != PAD).astype(picked.dtype)
            if self.eval_with_mask:
                s = -jnp.sum(picked * mask)
                norm = jnp.sum(mask)
            else:
                s = -jnp.sum(picked)
                norm = jnp.asarray(targets.size, jnp.float32)
            loss = normalise(s, norm) if self.normalise_loss else s
            return loss * coeff * inv_n

        if "ASR" in mode:
            coeff = self.loss_coeff["nll_asr"] if mode == "ASR_ST" else 1.0
            if "picked_asr" in out:
                l_en = head_picked(out["picked_asr"], mb["srcid"][:, 1:],
                                   coeff)
            else:
                l_en = head(out["logps_asr"], mb["srcid"][:, 1:], coeff)
            losses["nll_loss_en"] = l_en
            total = total + l_en
        if mode == "MT":
            if "picked_mt" in out:
                l_de = head_picked(out["picked_mt"], mb["tgtid"][:, 1:],
                                   self.loss_coeff["nll_mt"])
            else:
                l_de = head(
                    out["logps_mt"][:, :-1, :], mb["tgtid"][:, 1:],
                    self.loss_coeff["nll_mt"],
                )
            losses["nll_loss_de"] = l_de
            total = total + l_de
        if "ST" in mode:
            if "picked_st" in out:
                l_de = head_picked(out["picked_st"], mb["tgtid"][:, 1:],
                                   self.loss_coeff["nll_st"])
            else:
                l_de = head(
                    out["logps_st"][:, :-1, :], mb["tgtid"][:, 1:],
                    self.loss_coeff["nll_st"],
                )
            losses["nll_loss_de"] = l_de
            total = total + l_de
        return total, losses

    def _step_core(self, cfg: ModelConfig, tx, t_bucket: Optional[int] = None):
        """The un-jitted single train step (grad-accum scan + Adam update).
        `cache`/`t_bucket` serve the device-resident feature path: the
        minibatch's features are gathered by row index from the resident
        corpus INSIDE the step (data/device_cache.py), with the batch's
        bucketed time length baked in as a static slice. Shared by the
        per-batch jit (`_build_step`) and the multi-step window executor
        (`_build_window_step`)."""
        mode = self.MODE

        def minibatch_feats(mb, cache):
            from stjep_tpu.data.device_cache import dequantize, gather_features

            if "acous_idx" in mb:  # device-cache path: on-device assembly
                return gather_features(cache, mb["acous_idx"], t_bucket)
            fa = mb["acous_feat"]
            if "acous_scale" in mb:  # int8-staged path: on-device dequant
                fa = dequantize(fa, mb["acous_scale"])
            return fa

        def loss_fn(params, mb, cache, rng, inv_n):
            kwargs = dict(src=mb["srcid"])
            if "tgtid" in mb:
                kwargs["tgt"] = mb["tgtid"]
            if "acous_feat" in mb or "acous_idx" in mb:
                kwargs["acous_feats"] = minibatch_feats(mb, cache)
                kwargs["acous_lens"] = mb["acouslen"]
            out = forward_train(params, cfg, mode, rng=rng, is_training=True,
                                ref_pick=True, **kwargs)
            return self._head_losses(cfg, out, mb, inv_n)

        def train_step(params, opt_state, macro, cache, rng, lr, inv_n):
            n_mini = jax.tree_util.tree_leaves(macro)[0].shape[0]
            rngs = jax.random.split(rng, n_mini)

            def body(carry, xs):
                grads_acc, losses_acc = carry
                mb, k = xs
                (_, losses), grads = jax.value_and_grad(
                    loss_fn, has_aux=True
                )(params, mb, cache, k, inv_n)
                grads_acc = jax.tree_util.tree_map(jnp.add, grads_acc, grads)
                losses_acc = jax.tree_util.tree_map(jnp.add, losses_acc, losses)
                return (grads_acc, losses_acc), None

            zero_g = jax.tree_util.tree_map(jnp.zeros_like, params)
            zero_l = {"nll_loss_en": jnp.float32(0), "nll_loss_de": jnp.float32(0)}
            (grads, losses), _ = jax.lax.scan(body, (zero_g, zero_l), (macro, rngs))

            opt_state = set_lr(opt_state, lr)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, losses

        return train_step

    def _build_step(self, cfg: ModelConfig, tx, t_bucket: Optional[int] = None):
        """One jitted train step (see _step_core)."""
        return jax.jit(self._step_core(cfg, tx, t_bucket),
                       donate_argnums=(0, 1))

    def _build_window_step(self, cfg: ModelConfig, tx,
                           t_bucket: Optional[int], k_steps: int):
        """K consecutive train steps as ONE jitted program (outer lax.scan
        over steps, params/opt_state as carry). Only reachable on the
        device-cache path, where the per-step xs are small index/id arrays —
        this removes the per-step dispatch + host-loop overhead, which on a
        remote-attached chip (~2 ms/call tunnel floor) is a large slice of
        the steady-state step. The scan body compiles once, so compile time
        matches the single-step program.

        Per-step inputs ride the scan xs: macros (leaves [K, n_mini, ...]),
        rngs [K] keys, lrs [K], inv_ns [K]. Losses return summed over the
        window (the print path only ever reads window sums)."""
        one_step = self._step_core(cfg, tx, t_bucket)

        def window_step(params, opt_state, macros, cache, rngs, lrs, inv_ns):
            def body(carry, xs):
                p, o = carry
                macro, rng, lr, inv_n = xs
                p, o, losses = one_step(p, o, macro, cache, rng, lr, inv_n)
                return (p, o), losses

            (params, opt_state), losses = jax.lax.scan(
                body, (params, opt_state), (macros, rngs, lrs, inv_ns))
            return params, opt_state, {
                k: jnp.sum(v) for k, v in losses.items()}

        return jax.jit(window_step, donate_argnums=(0, 1))

    # ------------------------------------------------------------- sharding

    def _setup_mesh(self):
        """Build the (data, model) mesh when >1 device is visible (or TP is
        requested). Single chip -> no mesh, plain jit."""
        if self._mesh is not None:
            return
        n_dev = len(jax.devices())
        if n_dev > 1 or self.n_model > 1:
            from stjep_tpu.parallel.mesh import make_mesh

            self._mesh = make_mesh(n_model=self.n_model)
            self.logger.info("device mesh: %s", dict(self._mesh.shape))
            # the LAS kernels dispatch through shard_map over 'data' when a
            # kernel mesh is installed (parallel/spmd.py); the transformer
            # decode kernels gate themselves off and use the sharding-aware
            # dense XLA path
            from stjep_tpu.parallel.spmd import set_kernel_mesh

            set_kernel_mesh(self._mesh)
            self.logger.info(
                "multi-device mesh: LAS kernels via shard_map over 'data'")

    def _place(self, params):
        """Commit params to the mesh's TP/replicated layout (no-op without
        a mesh). Called once after init/load/rollback so every subsequent
        step reuses the committed layout."""
        if self._mesh is None:
            return params
        from stjep_tpu.parallel.mesh import shard_params

        return shard_params(params, self._mesh)

    def _init_opt(self, params):
        """Fresh opt state, on the mesh when one is active (TP-sharded
        weights get TP-sharded Adam moments)."""
        if self._mesh is None:
            return self._tx.init(params)
        from stjep_tpu.parallel.mesh import opt_state_shardings

        sh = opt_state_shardings(self._tx, params, self._mesh)
        return jax.jit(self._tx.init, out_shardings=sh)(params)

    def _place_opt(self, opt_state, params):
        """Commit a loaded opt_state to the layout a fresh init on the
        (already placed) params would produce, so TP-sharded weights resume
        with TP-sharded Adam moments."""
        if self._mesh is None or opt_state is None:
            return opt_state
        from stjep_tpu.parallel.mesh import opt_state_shardings

        sh = opt_state_shardings(self._tx, params, self._mesh)
        return jax.tree_util.tree_map(jax.device_put, opt_state, sh)

    def _resolve_device_cache(self, train_set, log) -> bool:
        """Decide whether this dataset's features live device-resident.

        False -> never; True -> always (user forced it); "auto" (default)
        -> enable iff the estimated cache footprint fits the free-HBM
        budget (data/device_cache.estimate_corpus_bytes / hbm_cache_budget).
        The decision is logged loudly either way so a user can tell which
        staging mode a run actually used."""
        has_acous = (bool(getattr(train_set, "train_acous_flis", []))
                     and any(train_set.train_acous_flis))
        if not has_acous or self.device_cache is False:
            return False
        if self.device_cache is True:
            return True
        key = ("auto", id(train_set))
        if key in self._feat_caches:
            return self._feat_caches[key]
        from stjep_tpu.data.device_cache import (estimate_corpus_bytes,
                                                 hbm_cache_budget)

        need = estimate_corpus_bytes(train_set, self.acous_bucket,
                                     self.feat_dtype or np.float32)
        budget = hbm_cache_budget()
        fits = 0 < need <= budget
        log.info(
            "device cache AUTO: corpus needs %.1f MB, HBM budget %.1f MB "
            "-> %s (override with --device_cache True/False)",
            need / 2 ** 20, budget / 2 ** 20,
            "ENABLED (features stay device-resident across epochs)"
            if fits else "DISABLED (per-step feature staging)")
        self._feat_caches[key] = fits  # decide once per dataset
        return fits

    def _host_macro(self, item):
        """Host half of batch staging: pad/reshape the macro batch, resolve
        cache rows, quantize features — everything except device placement.

        Returns (macro, n_real, t_bucket): t_bucket is None except on the
        device-cache path, where features never cross the link — the macro
        carries row indices and the step gathers/slices to t_bucket."""
        t_bucket = None
        if "_flis" in item:  # device-cache path (iter_batches(with_acous=False))
            from stjep_tpu.ops.masks import bucket_length

            flis = item.pop("_flis")
            item["acous_idx"] = self._feat_cache.rows(flis)
            t_bucket = bucket_length(
                int(round_up8(max(1, int(item["acouslen"].max())))),
                self.acous_bucket)
        macro, n_real = self._device_batch(item, self.batch_size)
        if self.feat_dtype is not None and "acous_feat" in macro:
            if self.feat_dtype == np.int8:
                from stjep_tpu.data.device_cache import quantize_batch

                qd = quantize_batch(macro["acous_feat"], self._feat_dequant)
                macro["acous_feat"] = qd["q"]
                macro["acous_scale"] = qd["scale"]
            else:
                macro["acous_feat"] = macro["acous_feat"].astype(self.feat_dtype)
        return macro, n_real, t_bucket

    def _place_macro(self, staged, batch_axis: int = 1):
        """Device half of batch staging (device_put / mesh shard)."""
        macro, n_real, t_bucket = staged
        if self._mesh is not None:
            from stjep_tpu.parallel.mesh import shard_batch

            macro = shard_batch(macro, self._mesh, batch_axis=batch_axis)
        else:
            macro = {k: jax.device_put(v) for k, v in macro.items()}
        return macro, n_real, t_bucket

    def _stage_batch(self, item):
        """Pad/reshape the macro batch and place it on device. Called from
        the prefetch thread (see _train_epoches) so the host->device
        transfer (~8 MB/step at flagship shapes) overlaps the previous
        step's compute instead of serialising with dispatch."""
        return self._place_macro(self._host_macro(item))

    def _stage_window(self, staged_list):
        """Stack K host-staged macros (equal t_bucket) for the multi-step
        window executor and place them in ONE transfer. Leaves become
        [K, n_mini, mini, ...] (scan xs layout), so the sharded minibatch
        axis moves to 2. Returns (macros, inv_ns, t_bucket, K)."""
        t_bucket = staged_list[0][2]
        macros = {k: np.stack([s[0][k] for s in staged_list])
                  for k in staged_list[0][0]}
        inv_ns = np.asarray([1.0 / s[1] for s in staged_list], np.float32)
        macros, _, _ = self._place_macro((macros, None, t_bucket),
                                         batch_axis=2)
        return macros, inv_ns, t_bucket, len(staged_list)

    def _train_batch(self, cfg, params, opt_state, item, step):
        # item: raw host batch dict, or an already-staged
        # (macro, n_real, t_bucket) triple from the prefetch pipeline
        if isinstance(item, tuple):
            macro, n_real, t_bucket = item
        else:
            macro, n_real, t_bucket = self._stage_batch(item)
        if t_bucket not in self._step_fns:
            self._step_fns[t_bucket] = self._build_step(
                cfg, self._tx, t_bucket=t_bucket)
        cache = self._feat_cache.arrays if t_bucket is not None else {}
        self._root_rng, k = jax.random.split(self._root_rng)
        lr = self._current_lr(step)
        params, opt_state, losses = self._step_fns[t_bucket](
            params, opt_state, macro, cache, k, jnp.float32(lr),
            jnp.float32(1.0 / n_real)
        )
        # losses stay DEVICE scalars: a float() here would block on the step
        # and pay a host readback every iteration, serialising the dispatch
        # pipeline (on the axon tunnel that is ~28 ms/step — more than the
        # step itself). The epoch loop drains them once per print window.
        self._last_losses_dev = losses
        return params, opt_state, losses

    def _train_window(self, cfg, params, opt_state, witem, step):
        """Run K consecutive steps as one jitted program. `step` is the
        number of COMPLETED steps: the window covers step+1 .. step+K, and
        the per-step LR schedule / RNG stream match the single-step path
        exactly (K successive root splits, lr(step+i) per step)."""
        macros, inv_ns, t_bucket, k_steps = witem
        key = ("window", t_bucket, k_steps)
        if key not in self._step_fns:
            self._step_fns[key] = self._build_window_step(
                cfg, self._tx, t_bucket, k_steps)
        cache = self._feat_cache.arrays if t_bucket is not None else {}
        ks = []
        for _ in range(k_steps):
            self._root_rng, k = jax.random.split(self._root_rng)
            ks.append(k)
        rngs = jnp.stack(ks)
        lrs = np.asarray([self._current_lr(step + i)
                          for i in range(1, k_steps + 1)], np.float32)
        params, opt_state, losses = self._step_fns[key](
            params, opt_state, macros, cache, rngs, jnp.asarray(lrs),
            jnp.asarray(inv_ns))
        self._last_losses_dev = losses  # window sums (device scalars)
        return params, opt_state, losses

    def _window_stream(self, raw_iter, step0, total_steps, window):
        """Group the epoch's raw batches into K-step windows for the
        multi-step executor, yielding from the prefetch thread either
        staged single triples (macro, n_real, t_bucket) or window 4-tuples
        (macros, inv_ns, t_bucket, K).

        A window may only cover steps with no print/checkpoint boundary
        strictly inside it (the LAST step may sit on one — the epoch loop
        regains control right after), so the trainer's logging, eval,
        rollback and early-stop fire at exactly the reference's steps.
        Batches whose acoustic time bucket differs from the pending
        window's flush as singles (one program per (bucket, K))."""
        bounds = [b for b in (self.print_every, self.checkpoint_every)
                  if b and b > 0]

        def boundary_dist(s):
            # steps s+1, s+2, ...: how many may run before the loop must
            # regain control (inclusive of the boundary step itself)
            d = min((b - (s % b)) for b in bounds) if bounds else window
            if total_steps > s:
                d = min(d, total_steps - s)
            return d

        step = step0
        pending: List = []
        for it in raw_iter:
            pending.append(self._host_macro(it))
            if pending[0][2] != pending[-1][2]:  # bucket changed: drain
                while len(pending) > 1:
                    step += 1
                    yield self._place_macro(pending.pop(0))
            while len(pending) >= window:
                if boundary_dist(step) >= window:
                    step += window
                    yield self._stage_window(pending[:window])
                    pending = pending[window:]
                else:
                    step += 1
                    yield self._place_macro(pending.pop(0))
        for s in pending:
            step += 1
            yield self._place_macro(s)

    def _last_losses(self) -> Dict:
        """Most recent train step's loss dict (device scalars); test hook."""
        return getattr(self, "_last_losses_dev", {})

    def _current_lr(self, step: int) -> float:
        # warmup_steps <= 0 deactivates the scheduler entirely — the
        # rollback LR-halving then persists (ref: trainer_base.py:141-143)
        if self.lr_warmup_steps > 0:
            lr = float(
                reference_lr(step, self.learning_rate_init, self.learning_rate,
                             self.lr_warmup_steps)
            )
        else:
            lr = self._lr_curr
        self._lr_curr = lr
        return lr

    # --------------------------------------------------------------- eval

    def _eval_forward(self, cfg: ModelConfig, kind: str):
        if kind not in self._eval_fn_cache:
            base = partial(forward_eval, cfg=cfg, mode=kind)

            def fwd(params, **kw):
                out = base(params, **kw)
                # only preds + per-token picked logps leave the device: the
                # dense [B, L, V] logp buffers and [B, L, D] embeddings are
                # a ~30000x larger transfer over the axon tunnel
                return {k: v for k, v in out.items()
                        if k.startswith(("preds_", "picked_"))}

            self._eval_fn_cache[kind] = jax.jit(fwd)
        return self._eval_fn_cache[kind]

    def _nll_picked_np(self, picked, mask, coeff=1.0):
        """Masked NLL from per-token reference logps (picked on device)."""
        p = np.asarray(picked).reshape(-1)
        m = np.asarray(mask).reshape(-1)
        s = -(p * m).sum()
        if self.normalise_loss:
            s = s / max(m.sum(), 1)
        return coeff * s

    def _evaluate_batches(self, cfg, params, dataset):
        """Free-running dev evaluation (ref: trainer_*.py:_evaluate_batches)."""
        mode = self.MODE
        resloss_en = resloss_de = 0.0
        resnorm = 0
        match_en = total_en = match_de = total_de = 0
        hyp_en, ref_en, hyp_de, ref_de = [], [], [], []
        out_count = 0
        fwd = self._eval_forward(cfg, mode)

        for item in dataset.iter_batches():
            B = item["srcid"].shape[0]
            for st in range(0, B, self.minibatch_size):
                ed = min(st + self.minibatch_size, B)
                kwargs = {}
                if "acous_feat" in item:
                    from stjep_tpu.ops.masks import bucket_length

                    alen = int(round_up8(max(1, int(max(item["acouslen"][st:ed])))))
                    alen = bucket_length(alen, self.acous_bucket)
                    v = item["acous_feat"][st:ed]
                    if alen > v.shape[1]:
                        v = np.pad(v, [(0, 0), (0, alen - v.shape[1]), (0, 0)])
                    kwargs["acous_feats"] = jnp.asarray(v[:, :alen])
                    kwargs["acous_lens"] = jnp.asarray(item["acouslen"][st:ed])
                if mode in ("MT",):
                    kwargs["src"] = jnp.asarray(item["srcid"][st:ed])
                src_ids = item["srcid"][st:ed]
                if "ASR" in mode:
                    kwargs["ref_src"] = jnp.asarray(src_ids)
                if mode == "MT" or "ST" in mode:
                    kwargs["ref_tgt"] = jnp.asarray(item["tgtid"][st:ed])
                out = fwd(params, **kwargs)
                out = jax.device_get(out)

                npm_src = src_ids != PAD
                if "ASR" in mode:
                    preds = out["preds_asr"]
                    resloss_en += self._nll_picked_np(
                        out["picked_asr"], npm_src[:, 1:]
                    )
                    m = npm_src[:, 1:]
                    match_en += int(((preds == src_ids[:, 1:]) & m).sum())
                    total_en += int(m.sum())
                    out_count = self._print_sample(
                        out_count, src_ids, dataset.src_id2word, preds, "-asr")
                    hyp_en, ref_en = add2corpus(
                        preds, src_ids, dataset.src_id2word, hyp_en, ref_en,
                        use_type="word",
                    )
                if mode == "MT" or "ST" in mode:
                    key = "mt" if mode == "MT" else "st"
                    coeff = self.loss_coeff[f"nll_{key}"]
                    tgt_ids = item["tgtid"][st:ed]
                    npm_tgt = tgt_ids != PAD
                    preds = out[f"preds_{key}"][:, 1:]
                    L = tgt_ids.shape[1] - 1
                    resloss_de += self._nll_picked_np(
                        out[f"picked_{key}"], npm_tgt[:, 1:], coeff=coeff
                    )
                    m = npm_tgt[:, 1:]
                    match_de += int(((preds[:, :L] == tgt_ids[:, 1:]) & m).sum())
                    total_de += int(m.sum())
                    out_count = self._print_sample(
                        out_count, tgt_ids, dataset.tgt_id2word, preds,
                        f"-{key}")
                    hyp_de, ref_de = add2corpus(
                        preds, tgt_ids, dataset.tgt_id2word, hyp_de, ref_de,
                        use_type=dataset.use_type,
                    )
                resnorm += 1

        losses = {
            "nll_loss_en": resloss_en / max(resnorm, 1),
            "nll_loss_de": resloss_de / max(resnorm, 1),
        }
        metrics = {
            "accuracy_en": match_en / total_en if total_en else 0.0,
            "bleu_en": corpus_bleu(hyp_en, ref_en) if hyp_en else 0.0,
            "accuracy_de": match_de / total_de if total_de else 0.0,
            "bleu_de": corpus_bleu(hyp_de, ref_de) if hyp_de else 0.0,
        }
        return losses, metrics

    def _print_sample(self, out_count, ids, id2word, seqlist, tail=""):
        """First-3 REF/HYP printing (ref: trainer_base.py:108-118)."""
        if out_count < 3 and len(ids) > 0:
            ref_words = _misc._convert_to_words_batchfirst(ids[:, 1:], id2word)
            hyp_words = _misc._convert_to_words_batchfirst(seqlist, id2word)
            sys.stdout.write("REF{}: {}\n".format(tail, " ".join(ref_words[0])))
            sys.stdout.write("HYP{}: {}\n".format(tail, " ".join(hyp_words[0])))
            out_count += 1
        return out_count

    # ------------------------------------------------------------- train

    def train(self, train_sets, model, num_epochs=5, optimizer=None,
              dev_sets=None, grab_memory=False):
        """Main entry (ref: trainer_base.py:169-443).

        model: (cfg: ModelConfig, params) tuple. Returns (cfg, params)."""
        cfg, params = model
        start_epoch, step = 1, 0
        opt_state = None
        self._setup_mesh()
        # int8 staging dequantizes into the compute dtype (the scale array
        # carries it — data/device_cache.quantize_batch)
        leaf = jax.tree_util.tree_leaves(params)[0]
        self._feat_dequant = (np.dtype(leaf.dtype)
                              if jnp.issubdtype(leaf.dtype, jnp.floating)
                              else np.dtype(np.float32))

        if "resume" in self.load_mode or "restart" in self.load_mode:
            self.logger.info("resuming %s ...", self.load_dir)
            mask = trainable_mask(params, lambda n: False)
            if self.load_mode == "ASR-resume" and self.load_freeze:
                mask = trainable_mask(params, lambda n: n.startswith("las."))
            self._tx = make_optimizer(self.max_grad_norm, mask)
            opt_template = self._tx.init(params)
            ckpt = Checkpoint.load(self.load_dir, params_template=params,
                                   opt_state_template=opt_template)
            params = self._place(ckpt.params)
            opt_state = self._place_opt(ckpt.opt_state, params)
            if "resume" in self.load_mode:
                start_epoch, step = ckpt.epoch, ckpt.step
        else:
            loaded = None
            if self.load_dir is not None:
                self.logger.info("loading %s (mode=%s) ...", self.load_dir,
                                 self.load_mode)
                loaded = Checkpoint.load(self.load_dir).params
            params, mask = apply_load_mode(
                params, loaded, self.load_mode, self.load_freeze, self.logger
            )
            self._tx = make_optimizer(self.max_grad_norm, mask)
            params = self._place(params)
        if opt_state is None:
            opt_state = self._init_opt(params)

        self._train_epoches(train_sets, cfg, params, opt_state, num_epochs,
                            start_epoch, step, dev_sets=dev_sets)
        return cfg, self._final_params

    def _train_epoches(self, train_sets, cfg, params, opt_state, n_epochs,
                       start_epoch, start_step, dev_sets=None):
        train_set = train_sets[self.DATA_KEY]
        dev_set = (dev_sets or {}).get(self.DATA_KEY)
        log = self.logger

        loss_window: List[Dict] = []  # device scalars, drained at print time
        step, step_elapsed = start_step, 0
        prev_acc = prev_bleu = 0.0
        count_no_improve = count_num_rollback = 0
        ckpt = None
        early_stop = False

        for epoch in range(start_epoch, n_epochs + 1):
            if early_stop:
                break
            lr = self._current_lr(max(step, 1))
            log.info("epoch:%d lr: %s", epoch, lr)
            log.info("--- construct train set ---")
            train_set.construct_batches(is_train=True)
            if dev_set is not None:
                dev_set.construct_batches(is_train=False)

            steps_per_epoch = len(train_set)
            total_steps = steps_per_epoch * n_epochs
            log.info("steps_per_epoch %d", steps_per_epoch)
            mem_kb, mem_mb, _ = get_memory_alloc()
            log.info("Memory used: %.2f MB", mem_mb)
            self.writer.add_scalar("Memory_MB", round(mem_mb, 2), global_step=step)

            from stjep_tpu.data.loader import host_prefetch

            use_cache = self._resolve_device_cache(train_set, log)
            if use_cache and id(train_set) not in self._feat_caches:
                from stjep_tpu.data.device_cache import DeviceFeatureCache

                try:
                    self._feat_caches[id(train_set)] = (
                        DeviceFeatureCache.build(
                            train_set, self.acous_bucket,
                            self.feat_dtype or np.float32,
                            dequant_dtype=self._feat_dequant,
                            mesh=self._mesh, logger=log))
                except (RuntimeError, MemoryError) as e:
                    # upload failed (HBM pressure the estimate missed):
                    # fall back to per-step staging rather than crash
                    log.warning(
                        "device cache: upload FAILED (%s) — falling back "
                        "to per-step feature staging", e)
                    self._feat_caches[id(train_set)] = None
            self._feat_cache = (
                self._feat_caches.get(id(train_set)) if use_cache else None)
            use_cache = self._feat_cache is not None

            # staging (pad + device_put / shard) runs INSIDE the prefetch
            # thread: host I/O and the H2D transfer both overlap compute.
            # With the device cache active the iterator skips the per-epoch
            # np.load/CMVN entirely and stages row indices instead — and the
            # multi-step window executor groups K steps into one jitted
            # program (per-step xs are just ids/indices at that point).
            win = self.train_window if use_cache else 1
            raw_iter = train_set.iter_batches(with_acous=not use_cache)
            if win > 1:
                staged_iter = self._window_stream(
                    raw_iter, step, total_steps, win)
            else:
                staged_iter = (self._stage_batch(it) for it in raw_iter)
            batch_stream = host_prefetch(staged_iter, size=2)
            for item in batch_stream:
                k_steps = item[3] if len(item) == 4 else 1
                if k_steps > 1:
                    params, opt_state, losses = self._train_window(
                        cfg, params, opt_state, item, step
                    )
                    step += k_steps
                    step_elapsed += k_steps
                else:
                    step += 1
                    step_elapsed += 1
                    if step_elapsed <= 2:
                        log.info(
                            "step %d (first steps include compilation)", step)
                    params, opt_state, losses = self._train_batch(
                        cfg, params, opt_state, item, step
                    )
                loss_window.append(losses)
                if len(loss_window) >= 1024:
                    # bound the window: with print_every > total steps (or a
                    # silenced log) the list would otherwise retain two live
                    # device scalars per step for the whole run. Summing is
                    # associative, so pre-reducing on device (no readback)
                    # leaves the printed average unchanged.
                    loss_window = [{
                        k: jnp.sum(jnp.stack([l[k] for l in loss_window]))
                        for k in loss_window[0]
                    }]

                if step % self.print_every == 0 and step_elapsed > self.print_every:
                    # one batched drain per window: two stacked sums + two
                    # scalar readbacks, instead of a blocking readback per
                    # step (ref divides by print_every regardless of how
                    # many steps accumulated — trainer_asr.py:367-373)
                    avg_en = float(jnp.sum(jnp.stack(
                        [l["nll_loss_en"] for l in loss_window]
                    ))) / self.print_every
                    avg_de = float(jnp.sum(jnp.stack(
                        [l["nll_loss_de"] for l in loss_window]
                    ))) / self.print_every
                    loss_window = []
                    log.info(
                        "Progress: %d%%, Train nlll_de: %.4f, nlll_en: %.4f",
                        step / total_steps * 100, avg_de, avg_en,
                    )
                    self.writer.add_scalar("train_loss_de", avg_de, global_step=step)
                    self.writer.add_scalar("train_loss_en", avg_en, global_step=step)

                if step % self.checkpoint_every == 0 or step == total_steps:
                    if dev_set is None:
                        continue
                    log.info("evaluating at step %d ...", step)
                    losses_d, metrics = self._evaluate_batches(cfg, params, dev_set)
                    for tag in ("nll_loss_en", "nll_loss_de"):
                        self.writer.add_scalar(
                            "dev_" + tag, losses_d[tag], global_step=step)
                    for tag, v in metrics.items():
                        self.writer.add_scalar("dev_" + tag, v, global_step=step)
                    acc, bleu = self._ckpt_criterion(losses_d, metrics)
                    log.info(
                        "Progress: %d%%, Dev loss en: %.4f de: %.4f, "
                        "acc: %.4f, bleu: %.4f",
                        step / total_steps * 100, losses_d["nll_loss_en"],
                        losses_d["nll_loss_de"], acc, bleu,
                    )

                    # save criterion (ref: trainer_asr.py:409)
                    if ((prev_acc < acc) and (bleu < 0.1)) or prev_bleu < bleu:
                        import dataclasses as _dc

                        ckpt = Checkpoint(
                            params=params, opt_state=opt_state, epoch=epoch,
                            step=step, input_vocab=train_set.vocab_src,
                            output_vocab=train_set.vocab_tgt,
                            model_config=_dc.asdict(cfg),
                        )
                        saved = ckpt.save(self.expt_dir)
                        log.info("saving at %s ...", saved)
                        prev_acc, prev_bleu = acc, bleu
                        count_no_improve = count_num_rollback = 0
                    else:
                        count_no_improve += 1

                    if count_no_improve > self.max_count_no_improve:
                        if self.max_count_num_rollback == 0:
                            early_stop = True
                            break
                        params, opt_state = self._rollback(params, opt_state, log,
                                                           epoch, step)
                        count_no_improve = 0
                        count_num_rollback += 1

                    if count_num_rollback > self.max_count_num_rollback:
                        params, opt_state = self._rollback(params, opt_state, log,
                                                           epoch, step)
                        # halve LR (ref: trainer_asr.py:472-477); with an
                        # active warmup schedule the next step recomputes the
                        # LR from the formula, exactly like the reference.
                        self._lr_curr *= 0.5
                        log.info("reducing lr ... step:%d - lr: %s", step,
                                 self._lr_curr)
                        if self._lr_curr <= 0.125 * self.learning_rate:
                            log.info("early stop ...")
                            early_stop = True
                            break
                        count_no_improve = count_num_rollback = 0

                    if ckpt is not None:
                        ckpt.rm_old(self.expt_dir, keep_num=self.keep_num)
                    log.info("n_no_improve %d, num_rollback %d",
                             count_no_improve, count_num_rollback)
            else:
                if dev_set is None:
                    import dataclasses as _dc

                    ckpt = Checkpoint(
                        params=params, opt_state=opt_state, epoch=epoch,
                        step=step, input_vocab=train_set.vocab_src,
                        output_vocab=train_set.vocab_tgt,
                        model_config=_dc.asdict(cfg),
                    )
                    saved = ckpt.save_epoch(self.expt_dir, epoch)
                    log.info("saving at %s ...", saved)
                continue

        self._final_params = params
        self._final_opt_state = opt_state

    def _ckpt_criterion(self, losses, metrics):
        """ASR judges on EN stats; every other mode on DE
        (ref: trainer_asr.py:406-409 vs trainer_asr_st.py:486)."""
        if self.MODE == "ASR":
            return metrics["accuracy_en"], metrics["bleu_en"]
        return metrics["accuracy_de"], metrics["bleu_de"]

    def _rollback(self, params, opt_state, log, epoch, step):
        latest = Checkpoint.get_latest_checkpoint(self.expt_dir)
        if latest is None:
            return params, opt_state
        log.info("epoch:%d step: %d - rolling back %s ...", epoch, step, latest)
        ckpt = Checkpoint.load(latest, params_template=params,
                               opt_state_template=opt_state)
        params = self._place(ckpt.params)
        return params, (
            self._place_opt(ckpt.opt_state, params)
            if ckpt.opt_state is not None else opt_state
        )


class Trainer_ASR(Trainer):
    MODE = "ASR"
    DATA_KEY = "asr"


class Trainer_MT(Trainer):
    MODE = "MT"
    DATA_KEY = "mt"


class Trainer_ST(Trainer):
    MODE = "ST"
    DATA_KEY = "st"


class Trainer_ASR_ST(Trainer):
    MODE = "ASR_ST"
    DATA_KEY = "st"
